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

__all__ = ["trace", "gat_epoch_hbm_bytes", "Roofline", "TPU_HBM_GBPS"]

# Peak HBM bandwidth per chip (GB/s). v5e ~= 819; override per platform.
TPU_HBM_GBPS = {
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6e": 1640.0,
}


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
    reference model shape (1 hidden layer heads*feat + 1 output layer).

    Dominant term: neighbor-feature reads, `heads*feat*dtype` per edge per
    pass.  Passes touching edge features: forward SpMM, backward dX (SpMM on
    G^T), backward SDDMM (reads feat + grad_out per edge) => ~4 edge-feature
    sweeps for the hidden layer plus ~3 for the output layer at `classes`
    width (its SDDMM reads grad at classes width).
    """
    hf = heads * feat * dtype_bytes
    hidden = 4 * num_edges * hf
    out_hf = classes * dtype_bytes
    out_layer = 4 * num_edges * out_hf
    dense = 2 * 3 * num_nodes * (in_dim * heads * feat +
                                 heads * feat * classes) * dtype_bytes / 1e9
    return hidden + out_layer + dense
