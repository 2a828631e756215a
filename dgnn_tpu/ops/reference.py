"""Dense pure-JAX oracle implementations.

These are the correctness oracles every fused op is tested against (the role
DGL/PyG hybrid modules play in the reference's func_test tier,
test/func_test/func_gat_pyg.py:88-114), and a fallback for tiny graphs.
They materialize dense [N, N] adjacency, so tests keep N small.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .common import leaky_relu, pair_keep

__all__ = ["dense_adj", "dense_edge_ids", "gat_dense", "gmm_dense", "edgeconv_dense"]


def dense_adj(row_ptr, col_ind, num_nodes: int) -> np.ndarray:
    """bool [N, N]: adj[i, j] = edge j -> i exists (i aggregates j)."""
    row_ptr = np.asarray(row_ptr)
    col_ind = np.asarray(col_ind)
    adj = np.zeros((num_nodes, num_nodes), dtype=bool)
    rows = np.repeat(np.arange(num_nodes), np.diff(row_ptr))
    adj[rows, col_ind] = True
    return adj


def dense_edge_ids(row_ptr, col_ind, num_nodes: int) -> np.ndarray:
    """int32 [N, N]: CSR edge id at (dst, src), -1 where no edge."""
    row_ptr = np.asarray(row_ptr)
    col_ind = np.asarray(col_ind)
    eid = np.full((num_nodes, num_nodes), -1, dtype=np.int64)
    rows = np.repeat(np.arange(num_nodes), np.diff(row_ptr))
    eid[rows, col_ind] = np.arange(col_ind.shape[0])
    return eid


def gat_dense(adj, attn_row, attn_col, feat, negative_slope=0.2,
              attn_drop=0.0, seed=None, dst_ids=None, src_ids=None):
    """Dense multi-head GAT aggregation.

    adj: [N, N] bool (dst, src). attn_row/col: [N, H]. feat: [N, H, F].
    ``dst_ids``/``src_ids`` override the global node ids used for the
    dropout pair hash (defaults: positional 0..N-1) — used by sharding
    tests where local row indices differ from global ids.
    Returns (out [N, H, F], edge_max [N, H], edge_sum [N, H]).
    """
    adj = jnp.asarray(adj)
    s = leaky_relu(attn_row[:, None, :] + attn_col[None, :, :], negative_slope)
    s = jnp.where(adj[..., None], s, -jnp.inf)  # [N, N, H]
    m = jnp.max(s, axis=1)  # [N, H]
    msafe = jnp.where(jnp.isneginf(m), 0.0, m)
    w = jnp.where(adj[..., None], jnp.exp(s - msafe[:, None, :]), 0.0)
    l = jnp.sum(w, axis=1)  # [N, H]
    a = w / jnp.maximum(l, 1e-20)[:, None, :]
    if attn_drop > 0.0:
        nd, ns = adj.shape
        d = (jnp.arange(nd, dtype=jnp.int32) if dst_ids is None
             else jnp.asarray(dst_ids))
        sidx = (jnp.arange(ns, dtype=jnp.int32) if src_ids is None
                else jnp.asarray(src_ids))
        keep = pair_keep(seed, d[:, None], sidx[None, :], attn_row.shape[1],
                         attn_drop)
        a = a * jnp.where(adj[..., None], keep, 0.0)
    out = jnp.einsum("dsh,shf->dhf", a, feat)
    return out, m, l


def gmm_dense(adj_edge_ids, feat, pseudo, mu, inv_sigma):
    """Dense MoNet aggregation. adj_edge_ids: [N, N] int (-1 = no edge),
    feat: [N, K, F], pseudo: [E, D], mu/inv_sigma: [K, D].
    out[n, k, f] = sum_{j: e=(j->n)} w[e, k] * feat[j, k, f]."""
    eid = jnp.asarray(adj_edge_ids)
    has = eid >= 0
    ps = pseudo[jnp.maximum(eid, 0)]  # [N, N, D]
    t = (ps[:, :, None, :] - mu[None, None]) * inv_sigma[None, None]  # [N,N,K,D]
    w = jnp.exp(-0.5 * jnp.sum(t * t, axis=-1))  # [N, N, K]
    w = jnp.where(has[..., None], w, 0.0)
    return jnp.einsum("dsk,skf->dkf", w, feat)


def edgeconv_dense(nbr, h_src, h_dst):
    """nbr: [N, k] neighbor ids; out[i, f] = max_j (h_dst[i,f] + h_src[nbr[i,j],f])."""
    vals = h_dst[:, None, :] + h_src[nbr]  # [N, k, F]
    return jnp.max(vals, axis=1)
