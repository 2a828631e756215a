from .partition import GraphShards, partition_graph
from .spmd import (
    ShardedGAT,
    ShardedGATConv,
    halo_exchange,
    local_view,
    merge_binned,
)

__all__ = ["GraphShards", "partition_graph", "ShardedGAT", "ShardedGATConv",
           "halo_exchange", "local_view", "merge_binned"]
