"""Fused multi-head GAT aggregation: SDDMM-score -> edge-softmax -> SpMM.

TPU-native re-design of the reference's `fused_gatconv` kernel family
(fused_gatconv_kernel.cu:24-118 forward, :712-1038 backward).  Shape of the
design:

- The graph is pre-binned by degree into dense [segments, width] slot tables
  (graph/binning.py); each bin is processed as statically-shaped gathers +
  einsums that XLA fuses, chunked under `lax.scan` to bound peak memory.
- Softmax is computed online per segment (max, sum-exp, weighted acc) and
  segments of split mega-rows are merged with a log-sum-exp combine — the
  same streaming-softmax structure as the reference's 3-pass warp kernel and
  its tile-balanced variant, but deterministic and atomics-free.
- Backward is a `jax.custom_vjp` that saves only the per-row softmax stats
  (edge_max, edge_sum) [N, H] and *recomputes* per-edge attention, exactly
  the reference's memory-saving trade (SURVEY.md §2.2 invariant 1):
    dX      : SpMM over the transposed (CSC-binned) graph,
    d(attn) : softmax backward via two segment passes (no atomics; the
              reference uses atomicAdd for grad_attn_col, :957).
- Attention dropout is re-derived from (seed, edge id, head) with a stateless
  hash (ops/common.py), identical in both layouts via global CSR edge ids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..graph.structure import BinnedAdj, Graph
from .common import (
    NEG_INF,
    chunk_rows_for_budget,
    edge_keep,
    float0_like,
    lane_mask,
    leaky_relu,
    leaky_relu_grad,
    scan_chunked,
)

__all__ = ["gat_aggregate"]


def _segment_sum(x, ids, n):
    return jax.ops.segment_sum(x, ids, num_segments=n)


from .common import use_pallas as _use_pallas


def _recompute_attn(mask, s_raw, M_rows, L_rows):
    """Per-slot softmax weight a_e = exp(s - M_row) / L_row, masked."""
    a = jnp.exp(s_raw - M_rows) / jnp.maximum(L_rows, 1e-20)
    return jnp.where(mask[..., None], a, 0.0)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _forward_bin_pallas(width, nbr, edge, row, count, ar, ac, feat, slope, p,
                        seed, training):
    """Fused-kernel path: scores in XLA (negligible traffic), neighbor-row
    DMA gather + online softmax + weighted accumulation in VMEM."""
    from .pallas.gat_forward import gat_forward_bin_pallas

    H = ar.shape[-1]
    F = feat.shape[-1]
    s = leaky_relu(ar[row][:, None, :] + ac[nbr], slope)  # [S, W, H]
    wmult = (edge_keep(seed, edge, H, p)
             if (training and p > 0) else None)
    feat3d = feat.astype(jnp.float32).reshape(feat.shape[0], H * F // 128, 128)
    interpret = jax.default_backend() != "tpu"
    m, l, acc = gat_forward_bin_pallas(nbr, count, s, wmult, feat3d,
                                       interpret=interpret)
    return m, l, acc.reshape(-1, H, F)


def _forward_bin(width, nbr, edge, row, count, ar, ac, feat, slope, p, seed, training):
    """Per-bin streaming pass: per-segment (max, sumexp, weighted acc)."""
    H = ar.shape[-1]
    F = feat.shape[-1]
    if _use_pallas(H, F, width, nbr.shape[0]):
        return _forward_bin_pallas(width, nbr, edge, row, count, ar, ac, feat,
                                   slope, p, seed, training)
    chunk = chunk_rows_for_budget(width, H * F)

    def fn(nbr_c, edge_c, row_c, count_c):
        mask = lane_mask(count_c, width)  # [S, W]
        s = leaky_relu(ar[row_c][:, None, :] + ac[nbr_c], slope)  # [S, W, H]
        s = jnp.where(mask[..., None], s, NEG_INF)
        m = jnp.max(s, axis=1)  # [S, H]; -inf for empty segments
        w = jnp.where(mask[..., None], jnp.exp(s - m[:, None, :]), 0.0)
        l = jnp.sum(w, axis=1)  # [S, H]
        w_agg = w * edge_keep(seed, edge_c, H, p) if (training and p > 0) else w
        x = feat[nbr_c]  # [S, W, H, F] — the bandwidth-dominant gather
        acc = jnp.einsum("swh,swhf->shf", w_agg, x,
                         preferred_element_type=jnp.float32)
        return (m, l, acc), ()

    (m, l, acc), _ = scan_chunked(fn, (nbr, edge, row, count), nbr.shape[0], chunk, ())
    return m, l, acc


def _gat_forward(adj: BinnedAdj, ar, ac, feat, slope, p, seed, training):
    n = adj.num_rows
    ms, ls, accs, rows = [], [], [], []
    for width, nbr, edge, row, count in adj.bins():
        m, l, acc = _forward_bin(width, nbr, edge, row, count, ar, ac, feat,
                                 slope, p, seed, training)
        ms.append(m)
        ls.append(l)
        accs.append(acc)
        rows.append(row)
    m_all = jnp.concatenate(ms)
    l_all = jnp.concatenate(ls)
    acc_all = jnp.concatenate(accs)
    row_all = jnp.concatenate(rows)

    # log-sum-exp merge of row segments (flash-attention-style block combine)
    M = jax.ops.segment_max(m_all, row_all, num_segments=n)  # [N, H]
    M = jnp.where(jnp.isneginf(M), 0.0, M)
    scale = jnp.where(jnp.isneginf(m_all), 0.0, jnp.exp(m_all - M[row_all]))
    L = _segment_sum(l_all * scale, row_all, n)  # [N, H]
    out = _segment_sum(acc_all * scale[..., None], row_all, n)
    out = out / jnp.maximum(L, 1e-20)[..., None]
    return out, M, L


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _dx_bin_pallas(width, nbr, edge, row, count, ar, ac, M, L, g_out, slope,
                   p, seed, training):
    """Fused-kernel dX: attention recomputed in XLA (edge-scalar traffic),
    grad_out rows streamed once by the weighted-gather kernel."""
    from .pallas.gather_ops import weighted_gather_accumulate

    H = ar.shape[-1]
    F = g_out.shape[-1]
    mask = lane_mask(count, width)
    s_raw = ar[nbr] + ac[row][:, None, :]
    a = _recompute_attn(mask, leaky_relu(s_raw, slope), M[nbr], L[nbr])
    if training and p > 0:
        a = a * edge_keep(seed, edge, H, p)
    interpret = jax.default_backend() != "tpu"
    g3d = g_out.astype(jnp.float32).reshape(-1, H * F // 128, 128)
    dx = weighted_gather_accumulate(nbr, a, g3d, interpret=interpret)
    return dx.reshape(-1, H, F)


def _dx_bin(width, nbr, edge, row, count, ar, ac, M, L, g_out, slope, p, seed, training):
    """Transposed SpMM: per-source-segment dX partial (reference analogue:
    mhspmm_backward_kernel, fused_gatconv_kernel.cu:712-763).
    Here row = source node, nbr = destination rows."""
    H = ar.shape[-1]
    F = g_out.shape[-1]
    if _use_pallas(H, F, width, nbr.shape[0]):
        return _dx_bin_pallas(width, nbr, edge, row, count, ar, ac, M, L,
                              g_out, slope, p, seed, training)
    chunk = chunk_rows_for_budget(width, H * F)

    def fn(nbr_c, edge_c, row_c, count_c):
        mask = lane_mask(count_c, width)
        s_raw = ar[nbr_c] + ac[row_c][:, None, :]  # [S, W, H]
        a = _recompute_attn(mask, leaky_relu(s_raw, slope), M[nbr_c], L[nbr_c])
        if training and p > 0:
            a = a * edge_keep(seed, edge_c, H, p)
        g = g_out[nbr_c]  # [S, W, H, F]
        dx = jnp.einsum("swh,swhf->shf", a, g,
                        preferred_element_type=jnp.float32)
        return (dx,), ()

    (dx,), _ = scan_chunked(fn, (nbr, edge, row, count), nbr.shape[0], chunk, ())
    return dx


def _attn_pass1_pallas(width, nbr, edge, row, count, ar, ac, M, L, feat,
                       g_out, slope, p, seed, training, n_src):
    """Fused-kernel SDDMM (reference analogue: mhsddmm) + XLA epilogue for
    the softmax-backward edge scalars."""
    from .pallas.gather_ops import gather_dot

    H = ar.shape[-1]
    F = feat.shape[-1]
    interpret = jax.default_backend() != "tpu"
    sub = H * F // 128
    q3d = g_out[row].astype(jnp.float32).reshape(-1, sub, 128)
    g = gather_dot(nbr, q3d,
                   feat.astype(jnp.float32).reshape(-1, sub, 128), H,
                   interpret=interpret)  # [S, W, H]
    mask = lane_mask(count, width)
    s_raw = ar[row][:, None, :] + ac[nbr]
    a = _recompute_attn(mask, leaky_relu(s_raw, slope), M[row][:, None, :],
                        L[row][:, None, :])
    if training and p > 0:
        g = g * edge_keep(seed, edge, H, p)
    d = leaky_relu_grad(s_raw, slope)
    q = a * g  # a==0 on padded slots masks gather_dot garbage
    qd = q * d
    u1 = _segment_sum(qd.reshape(-1, H), nbr.reshape(-1), n_src)
    return jnp.sum(q, axis=1), jnp.sum(qd, axis=1), u1


def _attn_pass1_bin(width, nbr, edge, row, count, ar, ac, M, L, feat, g_out,
                    slope, p, seed, training, n_src):
    """SDDMM + first softmax-backward pass over the forward (CSR) bins
    (reference analogue: mhsddmm + fused_backward_kernel pass 1,
    fused_gatconv_kernel.cu:814-931).  Emits per-segment
    ws_part  = sum_w a * g~           (-> weightSum rows)
    t1_part  = sum_w a * g~ * d       (-> grad_attn_row term 1)
    and scatters u1 = a * g~ * d over source columns."""
    H = ar.shape[-1]
    F = feat.shape[-1]
    if _use_pallas(H, F, width, nbr.shape[0]):
        return _attn_pass1_pallas(width, nbr, edge, row, count, ar, ac, M, L,
                                  feat, g_out, slope, p, seed, training, n_src)
    chunk = chunk_rows_for_budget(width, 2 * H * F)

    def fn(nbr_c, edge_c, row_c, count_c):
        mask = lane_mask(count_c, width)
        s_raw = ar[row_c][:, None, :] + ac[nbr_c]
        a = _recompute_attn(mask, leaky_relu(s_raw, slope), M[row_c][:, None, :],
                            L[row_c][:, None, :])
        g = jnp.einsum("shf,swhf->swh", g_out[row_c], feat[nbr_c],
                       preferred_element_type=jnp.float32)
        if training and p > 0:
            g = g * edge_keep(seed, edge_c, H, p)
        d = leaky_relu_grad(s_raw, slope)
        q = a * g  # [S, W, H]
        qd = q * d
        u1 = _segment_sum(qd.reshape(-1, H), nbr_c.reshape(-1), n_src)
        return (jnp.sum(q, axis=1), jnp.sum(qd, axis=1)), (u1,)

    (ws_part, t1_part), (u1,) = scan_chunked(
        fn, (nbr, edge, row, count), nbr.shape[0], chunk,
        (jnp.zeros((n_src, H), jnp.float32),),
    )
    return ws_part, t1_part, u1


def _attn_pass2_bin(width, nbr, edge, row, count, ar, ac, M, L, ws,
                    slope, n_src):
    """Second softmax-backward pass (no feature gathers): per-segment
    t2_part = sum_w a * d and scatter u2 = a * d * ws[row] over columns
    (reference analogue: fused_backward_kernel pass 2 with its
    grad_attn_col atomicAdd replaced by a segment scatter, :952-967)."""
    H = ar.shape[-1]
    chunk = chunk_rows_for_budget(width, 4 * H)

    def fn(nbr_c, edge_c, row_c, count_c):
        mask = lane_mask(count_c, width)
        s_raw = ar[row_c][:, None, :] + ac[nbr_c]
        a = _recompute_attn(mask, leaky_relu(s_raw, slope), M[row_c][:, None, :],
                            L[row_c][:, None, :])
        ad = a * leaky_relu_grad(s_raw, slope)  # [S, W, H]
        u2 = _segment_sum((ad * ws[row_c][:, None, :]).reshape(-1, H),
                          nbr_c.reshape(-1), n_src)
        return (jnp.sum(ad, axis=1),), (u2,)

    (t2_part,), (u2,) = scan_chunked(
        fn, (nbr, edge, row, count), nbr.shape[0], chunk,
        (jnp.zeros((n_src, H), jnp.float32),),
    )
    return t2_part, u2


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gat_fused(slope, p, training, adj_fwd, adj_bwd, ar, ac, feat, seed):
    out, _, _ = _gat_forward(adj_fwd, ar, ac, feat, slope, p, seed, training)
    return out


def _gat_fused_fwd(slope, p, training, adj_fwd, adj_bwd, ar, ac, feat, seed):
    out, M, L = _gat_forward(adj_fwd, ar, ac, feat, slope, p, seed, training)
    # Residuals: softmax stats only — per-edge attention is recomputed.
    return out, (adj_fwd, adj_bwd, ar, ac, feat, M, L, seed)


def _gat_fused_bwd(slope, p, training, res, g_out):
    adj_fwd, adj_bwd, ar, ac, feat, M, L, seed = res
    g_out = g_out.astype(feat.dtype)
    # Bipartite-general: destination rows (adj_fwd) and source rows (adj_bwd)
    # may be different index spaces (graph shards with halo sources).
    n = adj_fwd.num_rows
    n_src = adj_bwd.num_rows
    H = ar.shape[-1]

    # dX over transposed bins (recomputed attention already includes 1/L)
    dxs, rows_b = [], []
    for width, nbr, edge, row, count in adj_bwd.bins():
        dxs.append(_dx_bin(width, nbr, edge, row, count, ar, ac, M, L, g_out,
                           slope, p, seed, training))
        rows_b.append(row)
    d_feat = _segment_sum(jnp.concatenate(dxs), jnp.concatenate(rows_b), n_src)
    d_feat = d_feat.astype(feat.dtype)

    # attention grads over forward bins: two segment passes
    ws_parts, t1_parts, rows_f = [], [], []
    u1 = jnp.zeros((n_src, H), jnp.float32)
    for width, nbr, edge, row, count in adj_fwd.bins():
        wsp, t1p, u1b = _attn_pass1_bin(width, nbr, edge, row, count, ar, ac,
                                        M, L, feat, g_out, slope, p, seed,
                                        training, n_src)
        ws_parts.append(wsp)
        t1_parts.append(t1p)
        rows_f.append(row)
        u1 = u1 + u1b
    row_all = jnp.concatenate(rows_f)
    ws = _segment_sum(jnp.concatenate(ws_parts), row_all, n)  # [N, H]
    t1 = _segment_sum(jnp.concatenate(t1_parts), row_all, n)

    t2_parts = []
    u2 = jnp.zeros((n_src, H), jnp.float32)
    for width, nbr, edge, row, count in adj_fwd.bins():
        t2p, u2b = _attn_pass2_bin(width, nbr, edge, row, count, ar, ac, M, L,
                                   ws, slope, n_src)
        t2_parts.append(t2p)
        u2 = u2 + u2b
    t2 = _segment_sum(jnp.concatenate(t2_parts), row_all, n)

    d_ar = (t1 - ws * t2).astype(ar.dtype)
    d_ac = (u1 - u2).astype(ac.dtype)
    return (float0_like(adj_fwd), float0_like(adj_bwd), d_ar, d_ac, d_feat,
            float0_like(seed))


_gat_fused.defvjp(_gat_fused_fwd, _gat_fused_bwd)


def gat_aggregate(graph: Graph, attn_row, attn_col, feat, *,
                  negative_slope: float = 0.2, attn_drop: float = 0.0,
                  key=None, training: bool = False, gather_dtype=None):
    """Fused GAT neighborhood aggregation.

    out[i, h] = sum_j softmax_j(LeakyReLU(attn_row[i,h] + attn_col[j,h]))
                * feat[j, h, :]        over in-neighbors j of i.

    Reference API analogue: GATConvFuse / GATConvFuse_inference
    (operators/fused_gatconv.py:6-10).

    Args:
      graph: Graph pytree (build_graph).
      attn_row: [N, H] destination attention coefficients.
      attn_col: [N, H] source attention coefficients.
      feat: [N, H, F] node features.
      negative_slope: LeakyReLU slope for edge scores.
      attn_drop: attention dropout probability (training only).
      key: jax PRNG key (required if training and attn_drop > 0).
      training: enables dropout.
      gather_dtype: optional storage dtype (e.g. jnp.bfloat16) for the
        neighbor-feature gathers; accumulation is always f32.
    Returns:
      [N, H, F] aggregated features.
    """
    if training and attn_drop > 0.0:
        if key is None:
            raise ValueError("attn_drop > 0 requires a PRNG key in training")
        seed = jax.random.bits(key, dtype=jnp.uint32)
    else:
        seed = jnp.uint32(0)
    if gather_dtype is not None:
        # halve the bandwidth-dominant neighbor-feature traffic: gathers read
        # bf16 rows, accumulation stays f32 (preferred_element_type); the
        # cast's own VJP restores f32 parameter gradients outside.
        feat = feat.astype(gather_dtype)
    out = _gat_fused(float(negative_slope), float(attn_drop), bool(training),
                     graph.fwd, graph.bwd, attn_row, attn_col, feat, seed)
    return out.astype(jnp.float32)
