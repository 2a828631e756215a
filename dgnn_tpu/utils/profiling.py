"""Profiling & roofline accounting.

Reference analogue: the `ind` nvprof-marker module and commented cudaEvent
timing (SURVEY.md §5).  TPU-native: `jax.profiler` trace capture plus an
analytic HBM-roofline model for the fused aggregation ops, so benchmarks can
report achieved fraction of speed-of-light (BASELINE.md north star: >=80%).
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

__all__ = ["trace", "gat_epoch_hbm_bytes", "gat_epoch_row_accesses",
           "expected_epoch_seconds", "Roofline", "TPU_HBM_GBPS",
           "TPU_GATHER_ROWS_PER_S"]

# Peak HBM bandwidth per chip (GB/s). v5e ~= 819; override per platform.
TPU_HBM_GBPS = {
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6e": 1640.0,
}

# Measured row-gather rate wall (rows/s) — the binding resource for GNN
# aggregation on TPU (docs/PERF_NOTES.md; scripts/microbench_gather.py).
# Rate is nearly independent of row size up to ~1KB.  Round-2 value for
# fused (gather -> reduce) pipelines over HBM-resident tables; tables
# under ~64MB reach ~265e6, and materializing the gathered rows to HBM
# halves it (the round-1 75e6 figure did exactly that).
TPU_GATHER_ROWS_PER_S = 140e6


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a block (view with xprof/TB)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Roofline:
    bytes_moved: float
    seconds: float
    peak_gbps: float

    @property
    def achieved_gbps(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def fraction_of_peak(self) -> float:
        return self.achieved_gbps / self.peak_gbps


def gat_epoch_hbm_bytes(num_edges: int, num_nodes: int, heads: int,
                        feat: int, in_dim: int, classes: int,
                        dtype_bytes: int = 4) -> float:
    """Lower-bound HBM traffic for one fused-GAT train epoch (fwd+bwd) of the
    reference model shape (1 hidden layer heads*feat + 1 output layer), at
    the 2-pass design: each layer gathers edge-feature rows once forward
    (CSR) and once backward (CSC).  NOTE: on TPU the binding resource is the
    gather ROW RATE, not bytes — use `gat_epoch_row_accesses` /
    `expected_epoch_seconds` for the real model; this byte count is kept for
    cross-hardware comparison with the reference GPU.
    """
    hf = heads * feat * dtype_bytes
    hidden = 2 * num_edges * hf
    out_layer = 2 * num_edges * classes * dtype_bytes
    dense = 2 * 3 * num_nodes * (in_dim * heads * feat +
                                 heads * feat * classes) * dtype_bytes
    return float(hidden + out_layer + dense)


def _adj_rows(adj) -> int:
    """Rate-bound row accesses for one pass over a binned adjacency:
    every padded slot is a gathered row, every segment a resident row."""
    slots = sum(int(n.size) for n in adj.nbr)
    segs = sum(int(r.shape[0]) for r in adj.row)
    return slots + segs


def gat_epoch_row_accesses(graph, num_layers: int = 2) -> int:
    """Row accesses for one train epoch at the 2-pass design: per layer, one
    pass over the forward bins + one over the transposed bins."""
    return num_layers * (_adj_rows(graph.fwd) + _adj_rows(graph.bwd))


def expected_epoch_seconds(graph, num_layers: int = 2,
                           rows_per_s: float = TPU_GATHER_ROWS_PER_S) -> float:
    """Speed-of-light epoch time under the measured gather rate wall."""
    return gat_epoch_row_accesses(graph, num_layers) / rows_per_s
