"""Multi-host process-group entry and scaling-efficiency estimation.

The reference is strictly single-GPU (SURVEY.md §2.6); this supplies the
missing distributed runtime axis the TPU-native way: one JAX process per
host, `jax.distributed.initialize` to form the process group, a global
`Mesh` over every chip in the slice, and the same `shard_map`ped layers
(parallel/spmd.py) — XLA lowers the halo `all_to_all` onto ICI within a
slice and DCN across slices.  No hand-written transport exists anywhere
(the design rule: collectives are compiler-scheduled, reference SURVEY.md
§5 "Distributed communication backend").
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

__all__ = ["initialize_cluster", "graph_mesh", "scaling_report",
           "ScalingReport"]


def initialize_cluster(coordinator_address: str | None = None,
                       num_processes: int | None = None,
                       process_id: int | None = None) -> None:
    """Join (or form) the multi-host process group.

    On TPU pods the three arguments auto-detect from the environment
    (`jax.distributed.initialize()` with no args); pass them explicitly for
    CPU/GPU clusters or manual launches.  Call once, before any jax array
    op, on every host (SURVEY.md §7 step 6).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def graph_mesh(axis_name: str = "graph"):
    """1-D mesh over every addressable device in the process group (all
    chips of all hosts).  Shards from partition_graph(num_shards=mesh.size)
    drop into shard_map over this mesh unchanged — single-host multi-chip
    and multi-host execution share one code path."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))


@dataclasses.dataclass(frozen=True)
class ScalingReport:
    """Analytic per-layer scaling estimate from a static halo plan."""

    num_shards: int
    halo_rows_per_shard: int          # max rows any shard sends per layer
    halo_bytes_per_shard: float       # at the given feature width
    comm_seconds: float               # halo all_to_all over ICI
    local_seconds: float              # gather-path aggregation per shard
    dense_seconds: float              # dense hub-block work per shard
    efficiency: float                 # T(1) / (P * T(P))

    def __str__(self):
        return (f"shards={self.num_shards} halo_rows={self.halo_rows_per_shard}"
                f" halo_mb={self.halo_bytes_per_shard/1e6:.1f}"
                f" comm={self.comm_seconds*1e3:.2f}ms"
                f" local={self.local_seconds*1e3:.2f}ms"
                f" dense={self.dense_seconds*1e3:.2f}ms"
                f" efficiency={self.efficiency*100:.0f}%")


def scaling_report(shards, row_bytes: int, *,
                   ici_gbps: float = 45.0,
                   rows_per_s: float | None = None,
                   dense_pairs_per_s: float | None = None,
                   single_rows: int | None = None,
                   single_dense_pairs: int | None = None) -> ScalingReport:
    """Estimate multi-chip scaling efficiency from a static partition.

    Everything is derivable without hardware: the halo plan fixes the bytes
    each shard exchanges per layer (one all_to_all, parallel/spmd.py), the
    binned tables fix each shard's rate-bound row accesses, and the measured
    machine constants (docs/PERF_NOTES.md) convert both to seconds.

    Args:
      shards: GraphShards (parallel/partition.py).
      row_bytes: bytes per exchanged feature row (e.g. H*F*4 + H*4).
      ici_gbps: per-direction ICI bandwidth per chip (v5e ~45 GB/s/link).
      rows_per_s: measured EFFECTIVE slot rate of the production binned
        pass (default: graph.hub.GATHER_ROWS_PER_S, the calibrated 45e6 —
        not the 140e6 bare-gather figure, which under-weights the binned
        path ~3x; docs/PERF_NOTES.md).
      dense_pairs_per_s: dense hub-kernel rate (default hub.DENSE_PAIRS_PER_S).
      single_rows: single-chip BINNED row accesses for the same graph
        (defaults to the sum over shards — exact when partitioning adds no
        slots).  Pass the single-chip hub-dense plan's residual rows so
        efficiency is measured against the FAST single-chip formulation.
      single_dense_pairs: single-chip dense-block candidate pairs (tiles *
        RT * CT); defaults to the sum over shards.
    """
    from ..graph import hub as _hub

    if rows_per_s is None:
        rows_per_s = _hub.GATHER_ROWS_PER_S
    if dense_pairs_per_s is None:
        dense_pairs_per_s = _hub.DENSE_PAIRS_PER_S
    p = shards.num_shards
    halo_rows = int(shards.halo_max) * (p - 1)
    halo_bytes = float(halo_rows * row_bytes)
    comm_s = halo_bytes / (ici_gbps * 1e9)

    def adj_rows(adj):
        slots = sum(int(np.prod(n.shape[1:])) for n in adj.nbr)
        segs = sum(int(n.shape[1]) for n in adj.row)
        return slots + segs

    def adj_pairs(adj):
        d = getattr(adj, "dense", None)
        if d is None:
            return 0
        # schedule entries * RT * CT candidate pairs per pass
        return int(d.rc.shape[1] if d.rc.ndim > 1 else d.rc.shape[0]) \
            * int(d.mask.shape[-2]) * int(d.mask.shape[-1]) * 8

    local_rows = (adj_rows(shards.fwd_local) + adj_rows(shards.fwd_halo)
                  + adj_rows(shards.bwd))
    dense_pairs = (adj_pairs(shards.fwd_local) + adj_pairs(shards.fwd_halo)
                   + adj_pairs(shards.bwd))
    local_s = local_rows / rows_per_s
    dense_s = dense_pairs / dense_pairs_per_s
    if single_rows is None:
        single_rows = local_rows * p
    if single_dense_pairs is None:
        single_dense_pairs = dense_pairs * p
    t1 = single_rows / rows_per_s + single_dense_pairs / dense_pairs_per_s
    tp = max(local_s, comm_s) + dense_s  # overlap: local hides the exchange
    eff = t1 / (p * tp) if tp > 0 else 1.0
    return ScalingReport(num_shards=p, halo_rows_per_shard=halo_rows,
                         halo_bytes_per_shard=halo_bytes, comm_seconds=comm_s,
                         local_seconds=local_s, dense_seconds=dense_s,
                         efficiency=min(eff, 1.0))
