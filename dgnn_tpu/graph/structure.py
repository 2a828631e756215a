"""Device-side graph containers (JAX pytrees).

The reference passes five raw index tensors positionally through every layer
(`GATConv.forward(row_ptr, col_ind, col_ptr, row_ind, permute, feat)`,
reference layers/gatconv_layer.py:69).  Here the graph is a single immutable
pytree that jits/shards cleanly: raw CSR/CSC for generic use plus the binned
layouts (see binning.py) that every fused op consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import binning as _binning
from . import build as _build

__all__ = ["BinnedAdj", "Graph", "build_graph", "from_binned"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BinnedAdj:
    """Degree-binned adjacency on device. See binning.BinnedCSR.

    ``cmb``: optional [num_rows, K] combine table (binning.combine_table) —
    per row, the positions of its segment partials in the concatenated
    per-bin order (-1 padded).  When present, ops merge per-segment partials
    with an [N, K] gather instead of segment_sum/segment_max (scatter-free;
    XLA's segment ops are ~100x off the streaming rate on TPU)."""

    nbr: tuple  # per bin: [S_b, W_b] int32
    edge: tuple  # per bin: [S_b, W_b] int32 (global CSR edge id)
    row: tuple  # per bin: [S_b] int32
    count: tuple  # per bin: [S_b] int32
    cmb: object  # [num_rows, K] int32 combine table, or None
    widths: tuple = dataclasses.field(metadata=dict(static=True))
    num_rows: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_bins(self) -> int:
        return len(self.widths)

    def bins(self):
        """Iterate (width, nbr, edge, row, count) per bin."""
        for b in range(self.num_bins):
            yield self.widths[b], self.nbr[b], self.edge[b], self.row[b], self.count[b]


def from_binned(b: _binning.BinnedCSR, with_cmb: bool = True) -> BinnedAdj:
    cmb = None
    if with_cmb:
        rows_concat = np.concatenate([np.asarray(r) for r in b.row])
        valid = np.concatenate([np.asarray(c) for c in b.count]) > 0
        cmb = jnp.asarray(
            _binning.combine_table(rows_concat, b.num_rows, valid))
    return BinnedAdj(
        nbr=tuple(jnp.asarray(x) for x in b.nbr),
        edge=tuple(jnp.asarray(x) for x in b.edge),
        row=tuple(jnp.asarray(x) for x in b.row),
        count=tuple(jnp.asarray(x) for x in b.count),
        cmb=cmb,
        widths=b.widths,
        num_rows=b.num_rows,
        num_edges=b.num_edges,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Graph:
    """Static-topology graph: CSR over destination rows (aggregation reads
    row i's in-neighbors), CSC transpose, the CSR->CSC edge permutation, and
    both binned layouts.  All indices int32 (reference asserts the same,
    fused_gatconv.cpp:146-160)."""

    row_ptr: jax.Array  # [N+1] int32
    col_ind: jax.Array  # [E]   int32 — source node of CSR edge e
    col_ptr: jax.Array  # [N+1] int32
    row_ind: jax.Array  # [E]   int32 — destination node of CSC slot j
    permute: jax.Array  # [E]   int32 — CSR edge id stored at CSC slot j
    fwd: BinnedAdj  # binned CSR: rows = destinations, slots = sources
    bwd: BinnedAdj  # binned CSC: rows = sources, slots = destinations
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    def in_degrees(self) -> jax.Array:
        return jnp.diff(self.row_ptr)

    def out_degrees(self) -> jax.Array:
        return jnp.diff(self.col_ptr)

    def slim(self) -> "Graph":
        """Graph with the raw CSR/CSC/permute arrays dropped (zero-length).

        The fused ops consume only the binned layouts; the raw arrays (~12
        bytes/edge — 1.4 GB at Reddit scale) are preprocessing outputs that
        should not ride along into jit arguments / device memory.  Use the
        full graph for setup (degrees, pseudo binning), then pass
        ``graph.slim()`` into training steps."""
        empty = jnp.zeros((0,), jnp.int32)
        return dataclasses.replace(self, row_ptr=empty, col_ind=empty,
                                   col_ptr=empty, row_ind=empty,
                                   permute=empty)


def build_graph(
    src,
    dst,
    num_nodes: int,
    *,
    widths: Sequence[int] | None = None,
    self_loops: bool = True,
) -> Graph:
    """Host-side one-time preprocessing from a COO edge list (edge u->v means
    v aggregates u), mirroring the reference pipeline
    (train_gatconv.py:75-94) with degree binning added.

    ``widths=None`` picks bin widths per direction from the degree histogram
    (binning.auto_widths) — padding in the slot tables is directly wasted
    gather time, so the widths minimize total padded slots."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    if self_loops:
        src, dst = _build.remove_self_loops(src, dst)
        src, dst = _build.add_self_loops(src, dst, num_nodes)
    row_ptr, col_ind = _build.coo_to_csr(src, dst, num_nodes)
    col_ptr, row_ind, permute = _build.csr_to_csc_permute(row_ptr, col_ind)
    w_fwd = widths if widths is not None else _binning.auto_widths(
        np.diff(row_ptr))
    w_bwd = widths if widths is not None else _binning.auto_widths(
        np.diff(col_ptr))
    fwd = _binning.bin_csr(row_ptr, col_ind, widths=w_fwd)
    bwd = _binning.bin_csr(col_ptr, row_ind, edge_ids=permute, widths=w_bwd)
    return Graph(
        row_ptr=jnp.asarray(row_ptr, dtype=jnp.int32),
        col_ind=jnp.asarray(col_ind),
        col_ptr=jnp.asarray(col_ptr, dtype=jnp.int32),
        row_ind=jnp.asarray(row_ind),
        permute=jnp.asarray(permute),
        fwd=from_binned(fwd),
        bwd=from_binned(bwd),
        num_nodes=int(num_nodes),
        num_edges=int(col_ind.shape[0]),
    )
