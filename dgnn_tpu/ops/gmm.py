"""Fused MoNet/GMMConv aggregation: Gaussian edge weights fused with SpMM.

TPU-native re-design of the reference's `fused_gmmconv` module
(fused_gmmconv_kernel.cu:24-55 `fuseGmm`, :57-87 `gaussian_bp`;
operators/fused_gmmconv.py:12-27).  Per edge e=(u -> v) with pseudo-coords
``pseudo[e]`` and K Gaussian kernels:

    w[e, k] = exp(-0.5 * sum_d ((pseudo[e,d] - mu[k,d]) * inv_sigma[k,d])^2)
    out[v, k, :] = sum_{e into v} w[e, k] * feat[u, k, :]

Backward mirrors the reference's composition — grad_feat is the forward
kernel re-run on the transposed graph; grad wrt the Gaussian parameters goes
through an exact VJP of the closed-form weight (the reference's hand-written
`gaussian_bp` has known bugs — garbage accumulation base and a wrong running
sum across dims, SURVEY.md §2.4 — which this derivation does not replicate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..graph.structure import BinnedAdj, Graph
from .common import (chunk_rows_for_budget, float0_like, lane_mask,
                     scan_chunked, use_pallas)

__all__ = ["gmm_aggregate", "gaussian_weights"]


def gaussian_weights(pseudo, mu, inv_sigma):
    """[E, D], [K, D], [K, D] -> [E, K] Gaussian kernel weights."""
    t = (pseudo[:, None, :] - mu[None]) * inv_sigma[None]  # [E, K, D]
    return jnp.exp(-0.5 * jnp.sum(t * t, axis=-1))


def _segment_sum(x, ids, n):
    return jax.ops.segment_sum(x, ids, num_segments=n)


def _spmm_bins(adj: BinnedAdj, w_flat, feat):
    """out[row, k, f] = sum_slots w_flat[edge, k] * feat[nbr, k, f]."""
    n = adj.num_rows
    K = w_flat.shape[-1]
    F = feat.shape[-1]
    accs, rows = [], []
    for width, nbr, edge, row, count in adj.bins():
        if use_pallas(K, F, width, nbr.shape[0]):
            from .pallas.gather_ops import weighted_gather_accumulate

            mask = lane_mask(count, width)
            w = jnp.where(mask[..., None], w_flat[edge], 0.0)
            acc = weighted_gather_accumulate(
                nbr, w, feat.astype(jnp.float32).reshape(-1, K * F // 128, 128),
                interpret=jax.default_backend() != "tpu")
            accs.append(acc.reshape(-1, K, F))
            rows.append(row)
            continue
        chunk = chunk_rows_for_budget(width, K * F)

        def fn(nbr_c, edge_c, count_c):
            mask = lane_mask(count_c, width)  # [S, W]
            w = jnp.where(mask[..., None], w_flat[edge_c], 0.0)  # [S, W, K]
            x = feat[nbr_c]  # [S, W, K, F]
            acc = jnp.einsum("swk,swkf->skf", w, x,
                             preferred_element_type=jnp.float32)
            return (acc,), ()

        (acc,), _ = scan_chunked(fn, (nbr, edge, count), nbr.shape[0], chunk, ())
        accs.append(acc)
        rows.append(row)
    return _segment_sum(jnp.concatenate(accs), jnp.concatenate(rows), n)


def _sddmm_bins(adj: BinnedAdj, grad_out, feat, num_edges):
    """grad_w[e, k] = <grad_out[row(e), k, :], feat[col(e), k, :]> scattered to
    flat CSR edge order (reference analogue: mhsddmm, mhsddmm_kernel.cu)."""
    K = grad_out.shape[1]
    F = grad_out.shape[-1]
    gw = jnp.zeros((num_edges, K), jnp.float32)
    for width, nbr, edge, row, count in adj.bins():
        if use_pallas(K, F, width, nbr.shape[0]):
            from .pallas.gather_ops import gather_dot

            sub = K * F // 128
            g = gather_dot(nbr,
                           grad_out[row].astype(jnp.float32).reshape(-1, sub, 128),
                           feat.astype(jnp.float32).reshape(-1, sub, 128), K,
                           interpret=jax.default_backend() != "tpu")
            mask = lane_mask(count, width)
            g = jnp.where(mask[..., None], g, 0.0)
            gw = gw + _segment_sum(g.reshape(-1, K), edge.reshape(-1),
                                   num_edges)
            continue
        chunk = chunk_rows_for_budget(width, 2 * K * F)

        def fn(nbr_c, edge_c, row_c, count_c):
            mask = lane_mask(count_c, width)
            g = jnp.einsum("skf,swkf->swk", grad_out[row_c], feat[nbr_c],
                           preferred_element_type=jnp.float32)
            g = jnp.where(mask[..., None], g, 0.0)
            upd = _segment_sum(g.reshape(-1, K), edge_c.reshape(-1), num_edges)
            return (), (upd,)

        _, (upd,) = scan_chunked(fn, (nbr, edge, row, count), nbr.shape[0],
                                 chunk, (jnp.zeros((num_edges, K), jnp.float32),))
        gw = gw + upd
    return gw


@jax.custom_vjp
def _gmm_fused(adj_fwd, adj_bwd, feat, pseudo, mu, inv_sigma):
    w_flat = gaussian_weights(pseudo, mu, inv_sigma)
    return _spmm_bins(adj_fwd, w_flat, feat)


def _gmm_fused_fwd(adj_fwd, adj_bwd, feat, pseudo, mu, inv_sigma):
    out = _gmm_fused(adj_fwd, adj_bwd, feat, pseudo, mu, inv_sigma)
    return out, (adj_fwd, adj_bwd, feat, pseudo, mu, inv_sigma)


def _gmm_fused_bwd(res, g_out):
    adj_fwd, adj_bwd, feat, pseudo, mu, inv_sigma = res
    w_flat, gauss_vjp = jax.vjp(gaussian_weights, pseudo, mu, inv_sigma)
    # dX: forward SpMM on the transposed graph (bwd bins carry CSR edge ids,
    # so the same flat weights index correctly).
    d_feat = _spmm_bins(adj_bwd, w_flat, g_out).astype(feat.dtype)
    # dW: per-edge SDDMM, then exact VJP through the Gaussian closed form.
    gw = _sddmm_bins(adj_fwd, g_out, feat, adj_fwd.num_edges)
    d_pseudo, d_mu, d_inv_sigma = gauss_vjp(gw)
    return (float0_like(adj_fwd), float0_like(adj_bwd), d_feat,
            d_pseudo.astype(pseudo.dtype), d_mu.astype(mu.dtype),
            d_inv_sigma.astype(inv_sigma.dtype))


_gmm_fused.defvjp(_gmm_fused_fwd, _gmm_fused_bwd)


def gmm_aggregate(graph: Graph, feat, pseudo, mu, inv_sigma):
    """Fused MoNet aggregation.

    Args:
      graph: Graph pytree.
      feat: [N, K, F] node features (K = number of Gaussian kernels).
      pseudo: [E, D] per-edge pseudo-coordinates in CSR edge order.
      mu: [K, D] kernel means.
      inv_sigma: [K, D] kernel inverse widths.
    Returns:
      [N, K, F] aggregated features (caller sums over K, as the reference
      layer does: layers/gmmconv_layer.py:58).
    """
    return _gmm_fused(graph.fwd, graph.bwd, feat, pseudo, mu, inv_sigma)
