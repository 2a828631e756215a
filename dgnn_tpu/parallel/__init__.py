from .partition import GraphShards, partition_graph
from .spmd import (
    ShardedGAT,
    ShardedGATConv,
    ShardedGMMConv,
    ShardedMoNet,
    halo_exchange,
    local_view,
    merge_binned,
    shard_edge_data,
)

__all__ = ["GraphShards", "partition_graph", "ShardedGAT", "ShardedGATConv",
           "ShardedGMMConv", "ShardedMoNet", "halo_exchange", "local_view",
           "merge_binned", "shard_edge_data"]
