"""Shared machinery for the fused graph ops.

- slot masking for padded degree-binned tables,
- memory-bounded chunked execution (gathers of [segments, width, H, F]
  neighbor-feature tiles are processed in fixed-size chunks under `lax.scan`
  so peak HBM stays bounded regardless of graph size — this is how the build
  achieves the reference's recompute-based memory win, SURVEY.md §2.2 inv. 1),
- a counter-based stateless PRNG for edge dropout: the reference materializes
  a curand uniform mask over [nnz, heads] (fused_gatconv_kernel.cu:333-341)
  and re-reads it in backward through `permute`; we instead *re-derive* the
  mask from (seed, global edge id, head) with an integer hash, so forward
  (CSR layout) and backward (CSC layout) agree bit-for-bit with zero storage.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "lane_mask",
    "edge_keep",
    "float0_like",
    "scan_chunked",
    "chunk_rows_for_budget",
    "NEG_INF",
]

NEG_INF = float("-inf")

# Default per-chunk gather budget (bytes) for neighbor-feature tiles.
GATHER_BUDGET_BYTES = 256 * 1024 * 1024


def use_pallas(heads: int, feat: int, width: int, num_segments: int) -> bool:
    """Dispatch to the fused Pallas kernels when the tile shape maps cleanly
    onto TPU (feature row a multiple of 128 lanes, enough slots to amortize
    the DMA wave); overridable via DGNN_TPU_PALLAS=0/1 (1 forces interpret
    mode off-TPU, for tests)."""
    import os

    flag = os.environ.get("DGNN_TPU_PALLAS", "0")
    if flag != "1":
        # opt-in: the DMA-gather kernels require the [N, SUB, 128] layout
        # below; the XLA gather path is the default everywhere else
        return False
    return (feat % 128 == 0 and (heads * feat // 128) % 8 == 0
            and width >= 8 and num_segments % 8 == 0)


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


def float0_like(tree):
    """Cotangents for non-differentiable (integer) pytree leaves."""
    return jax.tree.map(lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0), tree)


def chunk_rows_for_budget(width: int, elems_per_slot: int, itemsize: int = 4,
                          budget: int | None = None) -> int:
    """Segments per chunk so a [chunk, width, elems] gather fits the budget."""
    if budget is None:
        budget = GATHER_BUDGET_BYTES
    rows = budget // max(1, width * elems_per_slot * itemsize)
    rows = max(8, int(rows))
    return int(min(rows, 1 << 30))


def scan_chunked(fn, args, num_rows: int, chunk: int, accum_init):
    """Run ``fn(*row_slices) -> (stacked, accum)`` over leading-axis chunks.

    ``stacked`` outputs (leading dim == chunk) are concatenated back to the
    original row count; ``accum`` outputs are tree-summed across chunks.
    Rows are padded with zeros — fn must be zero-safe for count==0 segments
    (all ops here are: empty segments contribute nothing).
    """
    if num_rows <= chunk:
        return fn(*args)

    n_chunks = math.ceil(num_rows / chunk)
    padded = n_chunks * chunk

    def pad(x):
        if x.shape[0] == padded:
            return x
        pad_width = [(0, padded - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    xs = tuple(pad(x).reshape((n_chunks, chunk) + x.shape[1:]) for x in args)

    def body(acc, chunk_args):
        stacked, upd = fn(*chunk_args)
        acc = jax.tree.map(jnp.add, acc, upd)
        return acc, stacked

    accum, stacked = jax.lax.scan(body, accum_init, xs)
    stacked = jax.tree.map(
        lambda x: x.reshape((padded,) + x.shape[2:])[:num_rows], stacked
    )
    return stacked, accum


def leaky_relu(x: jax.Array, slope: float) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def leaky_relu_grad(x: jax.Array, slope: float) -> jax.Array:
    return jnp.where(x >= 0, jnp.float32(1.0), jnp.float32(slope))
