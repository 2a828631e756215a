"""Shared machinery for the fused graph ops.

- slot masking for padded degree-binned tables,
- memory-bounded chunked execution (gathers of [segments, width, H, F]
  neighbor-feature tiles are processed in fixed-size chunks under `lax.scan`
  so peak HBM stays bounded regardless of graph size — this is how the build
  achieves the reference's recompute-based memory win, SURVEY.md §2.2 inv. 1),
- a counter-based stateless PRNG for edge dropout: the reference materializes
  a curand uniform mask over [nnz, heads] (fused_gatconv_kernel.cu:333-341)
  and re-reads it in backward through `permute`; we instead *re-derive* the
  mask from (seed, dst id, src id, head) with an integer hash (pair_keep),
  so forward (CSR bins), backward (CSC bins) and the dense hub-block path
  agree bit-for-bit with zero per-edge storage.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "combine_sum",
    "combine_lse",
    "lane_mask",
    "edge_keep",
    "pair_keep",
    "float0_like",
    "scan_chunked",
    "chunk_rows_for_budget",
    "NEG_INF",
]

NEG_INF = float("-inf")

# Default per-chunk gather budget (bytes) for neighbor-feature tiles.
# Larger budgets mean fewer scan iterations over wide bins (per-iteration
# overhead) at the cost of peak HBM; override via DGNN_TPU_GATHER_BUDGET_MB.
import os as _os

GATHER_BUDGET_BYTES = int(_os.environ.get("DGNN_TPU_GATHER_BUDGET_MB",
                                          "256")) * 1024 * 1024


def lane_mask(count: jax.Array, width: int) -> jax.Array:
    """[S] counts -> [S, width] bool validity mask."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    return lane < count[:, None]


def _mix32(x: jax.Array) -> jax.Array:
    """murmur3 finalizer (public-domain bit mixer) on uint32."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def edge_keep(seed: jax.Array, edge: jax.Array, num_heads: int, p: float) -> jax.Array:
    """Deterministic per-(edge, head) inverted-dropout keep mask.

    Returns float mask of shape edge.shape + (num_heads,) with values in
    {0, 1/(1-p)}.  Keep rule `u > p` matches the reference's
    `edge_mask[...] > attn_drop` (fused_gatconv_kernel.cu:95-104).
    """
    e = edge.astype(jnp.uint32)[..., None]
    h = jax.lax.broadcasted_iota(jnp.uint32, e.shape[:-1] + (num_heads,), e.ndim - 1)
    z = e * np.uint32(num_heads) + h
    z = _mix32(z ^ (seed.astype(jnp.uint32) * np.uint32(0x9E3779B9)))
    u = (z >> 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
    return jnp.where(u > p, np.float32(1.0 / (1.0 - p)), 0.0)


def pair_keep(seed: jax.Array, dst: jax.Array, src: jax.Array,
              num_heads: int, p: float) -> jax.Array:
    """Deterministic per-(dst, src, head) inverted-dropout keep mask.

    ``dst``/``src`` are broadcastable integer node-id arrays; the result has
    shape broadcast(dst, src) + (num_heads,) with values in {0, 1/(1-p)}.

    Keyed on the edge's ENDPOINTS rather than its edge id, so every layout
    (CSR bins, transposed CSC bins, dense hub blocks — which never
    materialize per-pair edge ids) re-derives bit-identical masks.  The
    reference materializes a curand [nnz, h] mask and re-indexes it through
    `permute` instead (fused_gatconv_kernel.cu:333-341, :738).  The only
    semantic difference: parallel duplicate edges share one mask draw
    (benchmark graphs are simple graphs, so none exist after dedup).
    """
    d = dst.astype(jnp.uint32)
    s = src.astype(jnp.uint32)
    base = _mix32(d * np.uint32(0x9E3779B9)
                  ^ _mix32(s ^ seed.astype(jnp.uint32) * np.uint32(0x85EBCA6B)))
    z = base[..., None] * np.uint32(num_heads) + jax.lax.broadcasted_iota(
        jnp.uint32, base.shape + (num_heads,), base.ndim)
    z = _mix32(z)
    u = (z >> 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
    return jnp.where(u > p, np.float32(1.0 / (1.0 - p)), 0.0)


def float0_like(tree):
    """Cotangents for non-differentiable (integer) pytree leaves."""
    return jax.tree.map(lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0), tree)


def chunk_rows_for_budget(width: int, elems_per_slot: int, itemsize: int = 4,
                          budget: int | None = None) -> int:
    """Segments per chunk so a [chunk, width, elems] gather fits the budget."""
    if budget is None:
        budget = GATHER_BUDGET_BYTES
    rows = budget // max(1, width * elems_per_slot * itemsize)
    # floor of 1: very wide bins (unsplit hub rows, width up to 128K) must
    # shrink the chunk below 8 segments or a "chunk" alone exceeds the budget
    rows = max(1, int(rows))
    return int(min(rows, 1 << 30))


def scan_chunked(fn, args, num_rows: int, chunk: int, accum_init):
    """Run ``fn(*row_slices) -> (stacked, accum)`` over leading-axis chunks.

    ``stacked`` outputs (leading dim == chunk) are concatenated back to the
    original row count; ``accum`` outputs are tree-summed across chunks.

    Chunks are sliced from the ORIGINAL arrays inside the loop
    (dynamic_slice), never pad+reshape-copied — at Reddit scale the stacked
    copies of the bin tables cost gigabytes of extra live HBM per op
    instance.  The remainder rows run as one static tail call.
    """
    if num_rows <= chunk:
        return fn(*args)

    n_full = num_rows // chunk
    tail = num_rows - n_full * chunk

    def body(acc, i):
        sliced = tuple(
            jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=0)
            for x in args)
        stacked, upd = fn(*sliced)
        acc = jax.tree.map(jnp.add, acc, upd)
        return acc, stacked

    accum, stacked = jax.lax.scan(body, accum_init,
                                  jnp.arange(n_full, dtype=jnp.int32))
    stacked = jax.tree.map(
        lambda x: x.reshape((n_full * chunk,) + x.shape[2:]), stacked)
    if tail:
        t_stacked, t_upd = fn(*(x[n_full * chunk:] for x in args))
        accum = jax.tree.map(jnp.add, accum, t_upd)
        stacked = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                               stacked, t_stacked)
    return stacked, accum


def combine_sum(cmb: jax.Array, vals: jax.Array) -> jax.Array:
    """Scatter-free segment merge: out[r] = sum over row r's K partials.

    cmb: [N, K] positions into the concatenated per-segment ``vals``
    (-1 padded; binning.combine_table); an [N, K] gather + masked reduce —
    never a segment_sum (XLA's segment ops are ~100x off streaming rate).
    """
    mask = cmb >= 0
    g = vals[jnp.maximum(cmb, 0)]  # [N, K, ...]
    mshape = mask.shape + (1,) * (g.ndim - 2)
    return jnp.sum(jnp.where(mask.reshape(mshape), g, 0), axis=1)


def combine_lse(cmb: jax.Array, m: jax.Array, parts) -> jax.Array:
    """Log-sum-exp segment merge over combine-table positions.

    m: [S, H] per-segment maxima (NEG_INF for empty).  ``parts``: list of
    per-segment arrays ([S, H] or [S, H, F]) to be rescaled by
    exp(m - M_row) and summed.  Returns (M [N, H], merged parts...).
    """
    mask = cmb >= 0
    idx = jnp.maximum(cmb, 0)
    m_g = jnp.where(mask[..., None], m[idx], NEG_INF)  # [N, K, H]
    M = jnp.max(m_g, axis=1)  # [N, H]
    M0 = jnp.where(jnp.isneginf(M), 0.0, M)
    scale = jnp.where(jnp.isneginf(m_g), 0.0, jnp.exp(m_g - M0[:, None, :]))
    outs = []
    for p in parts:
        g = p[idx]  # [N, K, H(, F)]
        s = scale if g.ndim == 3 else scale[..., None]
        outs.append(jnp.sum(g * s, axis=1))
    return M0, outs


def leaky_relu(x: jax.Array, slope: float) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def leaky_relu_grad(x: jax.Array, slope: float) -> jax.Array:
    return jnp.where(x >= 0, jnp.float32(1.0), jnp.float32(slope))
