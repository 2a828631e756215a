"""Batched k-NN graph construction in JAX.

Replaces the reference's host-side DGL ``KNNGraph`` (rebuilt from features
inside the training loop every layer, train_edgeconv.py:49) with an on-device
pairwise-distance + top-k — an MXU-friendly batched matmul, so the dynamic
graph never leaves the chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["knn_graph", "knn_mask_neg"]


def knn_graph(x: jax.Array, k: int) -> jax.Array:
    """k nearest neighbors (by squared euclidean distance, self included).

    Args:
      x: [B, P, D] batched point features.
      k: neighbors per point (k <= P).
    Returns:
      [B * P, k] int32 global neighbor ids into the flattened [B * P] point
      set (block-diagonal batching, matching how the reference batches point
      clouds into one graph, train_edgeconv.py:50-52).
    """
    b, p, _ = x.shape
    sq = jnp.sum(x * x, axis=-1)  # [B, P]
    # d2[i, j] = |xi|^2 + |xj|^2 - 2 xi.xj ; constant |xi|^2 dropped (row-wise
    # top-k is invariant to it)
    inner = jnp.einsum("bpd,bqd->bpq", x, x, preferred_element_type=jnp.float32)
    d2 = sq[:, None, :] - 2.0 * inner  # [B, P, P]
    _, idx = jax.lax.top_k(-d2, k)  # [B, P, k]
    offs = (jnp.arange(b, dtype=jnp.int32) * p)[:, None, None]
    return (idx.astype(jnp.int32) + offs).reshape(b * p, k)


def knn_mask_neg(x: jax.Array, k: int, *, neg: float = -1e30) -> jax.Array:
    """Dense k-NN adjacency as an additive max-mask (TPU-native form).

    Returns [B, P, P] f32 with 0 where j is among i's k nearest neighbors
    (self included) and ``neg`` elsewhere, so neighbor-max aggregation is a
    dense, fully-vectorized ``max_j (vals + mask)`` — no per-edge gathers,
    which on TPU are rate-bound and far slower than the 1/(P/k) "wasted"
    dense compute (see ops/edgeconv.py).  Membership is by distance
    threshold at the k-th smallest, so exact ties at the boundary may admit
    more than k neighbors (measure-zero for real point clouds).
    """
    sq = jnp.sum(x * x, axis=-1)  # [B, P]
    inner = jnp.einsum("bpd,bqd->bpq", x, x, preferred_element_type=jnp.float32)
    d2 = sq[:, None, :] - 2.0 * inner  # [B, P, P] (row-constant |xi|^2 dropped)
    kth, _ = jax.lax.top_k(-d2, k)  # [B, P, k] negated distances, descending
    thresh = -kth[..., -1]  # [B, P] k-th smallest distance
    return jnp.where(d2 <= thresh[..., None], 0.0, neg).astype(jnp.float32)
