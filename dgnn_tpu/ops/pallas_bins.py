"""Pallas TPU kernels for the binned (gather-residual) passes.

The binned path's per-slot work — score, mask, exp, dropout hash, weighted
accumulation — is elementwise over [segments, width] slot tables.  Left to
XLA it materializes several [S, W, H(F)] intermediates in HBM and runs the
narrow-minor-dim ops at poor lane utilization: the measured compound rate is
~45-50M slots/s while the bare neighbor gather streams at ~210-265M rows/s
(scripts/exp_overhead.py, docs/PERF_NOTES.md).  These kernels fuse everything
after the gather into ONE VMEM-resident pass, so a bin pass costs the gather
plus a single streaming read of the gathered block.

Layout contract: the caller gathers with TRANSPOSED slot indices, producing
``[W, S, C]`` (a random row gather is rate-bound per row — order is free) —
inside the kernel ``g_ref[w]`` is then a leading-dim slice, which Mosaic
serves from the (segments, C)-tiled VMEM block with no relayout.  Per-column
scalars never appear (everything is per-segment rows); there are no matmuls
(the weighted accumulation is a [Sb, F] broadcast-madd per (w, h), bounded by
the HBM read of the gathered block, not the VPU).

Softmax is EXACT two-phase over the VMEM-resident block: a per-segment max
pass then a normalized sum pass (m feeds the log-sum-exp combine).  An
earlier bound-based variant (normalize by a precomputed global score bound,
no max pass) underflowed once trained attention scores spread and collapsed
accuracy — see _bin_gat_fwd_kernel.  Dropout
re-derives pair_keep's stateless hash from the (dst, src, head) GLOBAL ids,
bit-identical to the XLA path and the dense kernels.

Reference analogue: fused_gatconv_kernel.cu:24-118 (forward warp kernels),
:712-763 (backward) — the same fusion boundary, re-designed for a machine
whose per-edge cost is the gather, not FLOPs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dense import _PARAMS, _pair_base, _pair_u, _vma_of

__all__ = ["bin_gat_fwd", "bin_gat_bwd", "bin_gmm_node_fwd",
           "bin_gmm_node_bwd", "PALLAS_MAX_W", "seg_block", "pad_segs"]

# Bins wider than this stay on the XLA path.  The fori_loop kernels compile
# fast at any W, but a wide bin forces a tiny segment block (seg_block:
# [512, 8, C]) whose 8-sublane ops + 512-iteration loop run far below the
# XLA formulation — reddit train regressed 2.0x -> 1.34x with W=512 on the
# fused path.  64 keeps blocks >= 60 segments.
PALLAS_MAX_W = 64

# Target VMEM bytes for one gathered block [W, Sb, C] (double-buffered by
# the pipeline; the chip has 128MB, _PARAMS raises the scoped limit).
# Measured: 8MB blocks + dimension_semantics=("parallel",) ran ~15% SLOWER
# than 4MB default-semantics (and coincided with a TPU worker crash) —
# keep the smaller, deeper pipeline.
_BLOCK_BYTES = 4 << 20

_BIN_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def seg_block(width: int, cols: int, itemsize: int = 4,
              num_segs: int | None = None) -> int:
    """Segments per kernel block so [W, Sb, C] stays under _BLOCK_BYTES.

    Clamped to the segment count: a block LARGER than the array dim is an
    out-of-bounds DMA on real hardware (reproducibly crashed the TPU worker
    on a 1800-segment bin with a 2048 block; a partially-overhanging LAST
    block is fine — Mosaic masks it)."""
    # sublane granule: the block's second-minor dim is the segment dim, and
    # bf16 tiles are (16, 128) — a non-multiple block hangs/explodes the
    # Mosaic layout search (observed: bf16 gather_dtype configs never
    # finished compiling with 8-granule blocks)
    gran = 8 * (4 // max(1, itemsize)) if itemsize < 4 else 8
    sb = _BLOCK_BYTES // max(1, width * cols * itemsize)
    sb = max(gran, min(int(sb), 2048))
    if num_segs is not None:
        sb = min(sb, max(gran, -(-int(num_segs) // gran) * gran))
    return (sb // gran) * gran


def _grid_pad(s: int, sb: int) -> int:
    assert s % sb == 0, (
        f"segment count {s} must be padded to a multiple of the kernel "
        f"block {sb} (pad_segs) — a ragged last block reads past the array "
        f"and intermittently faults the TPU depending on buffer layout")
    return s // sb


def pad_segs(sb: int, nbr_c, row_c, count_c):
    """Pad per-chunk segment arrays to a multiple of the kernel block.

    Padding rows point at node 0 with count 0 (all-invalid -> zero
    partials); callers slice kernel outputs back to the original count.
    This moves the ragged-tail handling BEFORE the gather: the padded tail
    gathers a few valid rows instead of the kernel DMA-ing past the end of
    the gathered buffer (observed as nondeterministic TPU worker crashes —
    out-of-bounds reads only fault when the overhang leaves the
    allocation)."""
    s = nbr_c.shape[0]
    pad = (-s) % sb
    if pad:
        nbr_c = jnp.pad(nbr_c, ((0, pad), (0, 0)))
        row_c = jnp.pad(row_c, (0, pad))
        count_c = jnp.pad(count_c, (0, pad))
    return nbr_c, row_c, count_c, s



def _f32_src(g_ref, rest):
    """(f32 slot-row ref, remaining refs).

    For bf16 inputs the per-iteration ``g_ref[w].astype(f32)`` (dynamic
    slice + convert) sent the Mosaic layout search into a non-terminating
    compile, and Mosaic cannot dynamically index a VALUE — so non-f32
    blocks are bulk-converted ONCE into a f32 scratch ref (the last kernel
    arg, added by the wrapper) and the loop slices that ref instead."""
    if g_ref.dtype == jnp.float32:
        return g_ref, rest
    gf_ref = rest[-1]
    gf_ref[...] = g_ref[...].astype(jnp.float32)
    return gf_ref, rest[:-1]


def _gf_scratch(g_t, sb):
    """Scratch list for _f32_src (empty when the input is already f32)."""
    if g_t.dtype == jnp.float32:
        return []
    return [pltpu.VMEM((g_t.shape[0], sb, g_t.shape[2]), jnp.float32)]


def _expander(H, F):
    """[H, H*F] 0/1 block one-hot: row h is 1 on columns [h*F, (h+1)*F).

    ``weights @ E`` broadcasts per-head scalars across their feature block
    ON THE MXU (exact in f32 — one term per output), so the weighted
    accumulation becomes ONE full-lane [Sb, HF] madd instead of H half-lane
    [Sb, F] madds — the VPU was the kernel bottleneck, not HBM."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, H * F), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, H * F), 0)
    return (cols // F == rows).astype(jnp.float32)


_NEGB = -1e30  # finite "-inf" for empty-segment maxima (exp(x-_NEGB) == 0)


def _bin_gat_fwd_kernel(ar_ref, cnt_ref, g_ref, *rest, H, F, W, slope,
                        with_pos, drop_p=0.0):
    """One segment block: ar [Sb, H], cnt [Sb, 1], g [W, Sb, C] gathered
    rows (C = HF + H, layout [x | ac]).  Outputs m/l(/lpos) [Sb, H] and
    acc(/accpos) [Sb, HF].

    Two phases over the VMEM-resident block: an exact per-segment score max
    (a precomputed global bound underflowed exp(s - bound) once TRAINED
    attention scores spread — one outlier ac inflated every row's bound and
    collapsed citeseer accuracy to 0.16), then the sum/accumulate phase
    normalized by that max."""
    g_ref, rest = _f32_src(g_ref, rest)
    if drop_p > 0.0:
        rid_ref, cid_ref, seed_ref = rest[:3]
        rest = rest[3:]
    if with_pos:
        m_ref, l_ref, lp_ref, acc_ref, accp_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    HF = H * F
    ar = ar_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    l_ref[:] = jnp.zeros_like(l_ref)
    if with_pos:
        accp_ref[:] = jnp.zeros_like(accp_ref)
        lp_ref[:] = jnp.zeros_like(lp_ref)
    if drop_p > 0.0:
        seed_u = seed_ref[0].astype(jnp.uint32)
        rid_u = rid_ref[:].astype(jnp.uint32)  # [Sb, 1]
        hh = jax.lax.broadcasted_iota(jnp.uint32, (1, H), 1)
        inv_keep = 1.0 / (1.0 - drop_p)
    E = _expander(H, F)

    # phase 1: exact per-segment max (cheap — slice/add/max per slot)
    def mbody(w, m):
        z = g_ref[w]
        sr = ar + z[:, HF:]
        s = jnp.maximum(sr, sr * slope)
        return jnp.maximum(m, jnp.where(cnt_ref[:] > w, s, _NEGB))

    m = jax.lax.fori_loop(
        0, W, mbody, jnp.full(ar.shape, _NEGB, jnp.float32))
    m_ref[:] = m

    # phase 2 — fori_loop over slots, NOT a python unroll: the unrolled
    # program's Mosaic compile time scales with W and exploded the bench
    # wall (~200-600s per config).  All big accumulators live in REFS,
    # never the loop carry — a large carried value (measured with a
    # [Sb, HF] carry) serializes the loop 2-6x.
    def body(w, carry):
        z = g_ref[w]                           # [Sb, C] leading-dim slice
        sr = ar + z[:, HF:]                    # [Sb, H]
        s = jnp.maximum(sr, sr * slope)
        valid = cnt_ref[:] > w                 # [Sb, 1]
        p = jnp.where(valid, jnp.exp(s - m), 0.0)
        l_ref[:] += p
        if drop_p > 0.0:
            base = _pair_base(seed_u, rid_u,
                              cid_ref[w].astype(jnp.uint32))    # [Sb, 1]
            u = _pair_u(base * np.uint32(H) + hh, 0, 1)         # [Sb, H]
            pd = jnp.where(u > drop_p, p * inv_keep, 0.0)
        else:
            pd = p
        acc_ref[:] += jax.lax.dot(
            pd, E, preferred_element_type=jnp.float32) * z[:, :HF]
        if with_pos:
            lp_ref[:] += jnp.where(sr >= 0, p, 0.0)
            ppd = jnp.where(sr >= 0, pd, 0.0)
            accp_ref[:] += jax.lax.dot(
                ppd, E, preferred_element_type=jnp.float32) * z[:, :HF]
        return carry

    jax.lax.fori_loop(0, W, body, 0)


def bin_gat_fwd(g_t, ar_seg, count, *, H: int, F: int, slope: float,
                with_pos: bool, drop=None, interpret: bool = False):
    """Fused per-bin GAT forward over pre-gathered rows.

    Args:
      g_t: [W, S, C] gathered [x | ac] rows (C = H*F + H), any float dtype.
      ar_seg: [S, H] f32 — attn_row per segment.
      count: [S] int32 valid-slot counts.
      drop: optional (p, seed, rid [S] i32 dst gids, cid_t [W, S] i32 src
        gids) for in-kernel stateless attention dropout.
    Returns (m, l, lpos, acc, accpos) per segment — m is the EXACT
    per-segment score max (-1e30 for empty segments); lpos/accpos are None
    when not ``with_pos``.
    """
    W, S, C = g_t.shape
    HF = H * F
    assert C == HF + H, (C, H, F)
    sb = seg_block(W, C, g_t.dtype.itemsize, num_segs=S)
    grid = (_grid_pad(S, sb),)
    drop_p = float(drop[0]) if drop is not None else 0.0
    kern = functools.partial(_bin_gat_fwd_kernel, H=H, F=F, W=W,
                             slope=float(slope), with_pos=with_pos,
                             drop_p=drop_p)

    def seg_spec(w):
        return pl.BlockSpec((sb, w), lambda i: (i, 0))

    in_specs = [
        seg_spec(H),                                       # attn_row
        seg_spec(1),                                       # count
        pl.BlockSpec((W, sb, C), lambda i: (0, i, 0)),     # gathered rows
    ]
    args = [ar_seg, count.astype(jnp.int32).reshape(S, 1), g_t]
    if drop is not None:
        _, seed, rid, cid_t = drop
        in_specs += [
            seg_spec(1),                                   # dst gids
            pl.BlockSpec((W, sb, 1), lambda i: (0, i, 0)),  # src gids
            pl.BlockSpec(memory_space=pltpu.SMEM),         # seed
        ]
        args += [rid.astype(jnp.int32).reshape(S, 1),
                 cid_t.astype(jnp.int32).reshape(W, S, 1),
                 seed.astype(jnp.uint32).reshape(1)]
    vma = _vma_of(*args)
    out_shape = [jax.ShapeDtypeStruct((S, H), jnp.float32, vma=vma),
                 jax.ShapeDtypeStruct((S, H), jnp.float32, vma=vma)]
    out_specs = [seg_spec(H), seg_spec(H)]
    if with_pos:
        out_shape.append(jax.ShapeDtypeStruct((S, H), jnp.float32, vma=vma))
        out_specs.append(seg_spec(H))
    out_shape.append(jax.ShapeDtypeStruct((S, HF), jnp.float32, vma=vma))
    out_specs.append(seg_spec(HF))
    if with_pos:
        out_shape.append(jax.ShapeDtypeStruct((S, HF), jnp.float32, vma=vma))
        out_specs.append(seg_spec(HF))
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, scratch_shapes=_gf_scratch(g_t, sb),
        compiler_params=_BIN_PARAMS, interpret=interpret,
    )(*args)
    if with_pos:
        m, l, lp, acc, accp = outs
        return m, l, lp, acc, accp
    m, l, acc = outs
    return m, l, None, acc, None


def _bin_gat_bwd_kernel(ac_ref, x_ref, cnt_ref, g_ref, *rest, H, F, W, slope,
                        drop_p=0.0):
    """Transposed (CSC) per-bin GAT backward block: rows = sources.

    ac [Sb, H] source coefficients (resident); x [Sb, HF] source features;
    g [W, Sb, Cz] gathered destination rows, Cz = HF + 4H laid out
    [grad_out | ar | M | Linv | ws].  Outputs dx [Sb, HF], dac [Sb, H]:
      dx  += sum_w a^ g_w
      dac += sum_w (a^ <x, g_w> - a ws_w) * leaky'(s_raw)
    """
    g_ref, rest = _f32_src(g_ref, rest)
    if drop_p > 0.0:
        sid_ref, did_ref, seed_ref = rest[:3]
        rest = rest[3:]
    dx_ref, dac_ref, t_ref, u2_ref = rest
    HF = H * F
    ac = ac_ref[:]
    x = x_ref[:].astype(jnp.float32)
    dx_ref[:] = jnp.zeros_like(dx_ref)
    # dac factorization: sum_w (ah ge - a ws) dprime with ge = <x_h, g_w_h>
    # is linear in g_w, so the ge half collapses to ONE per-head reduction
    # per block:  <x_h, t_h>  with  t = sum_w ((ah dprime) @ E) * g_w,
    # and the ws half to the running sum u2 = sum_w a dprime ws.  Both
    # accumulate in SCRATCH refs — large loop-carried values serialize the
    # fori_loop (see fwd kernel note).
    t_ref[:] = jnp.zeros_like(t_ref)
    u2_ref[:] = jnp.zeros_like(u2_ref)
    if drop_p > 0.0:
        seed_u = seed_ref[0].astype(jnp.uint32)
        sid_u = sid_ref[:].astype(jnp.uint32)
        hh = jax.lax.broadcasted_iota(jnp.uint32, (1, H), 1)
        inv_keep = 1.0 / (1.0 - drop_p)
    E = _expander(H, F)

    def body(w, carry):
        z = g_ref[w]                          # [Sb, Cz]
        ar_i = z[:, HF:HF + H]
        M_i = z[:, HF + H:HF + 2 * H]
        Li_i = z[:, HF + 2 * H:HF + 3 * H]
        ws_i = z[:, HF + 3 * H:]
        sr = ar_i + ac                         # [Sb, H]
        s = jnp.maximum(sr, sr * slope)
        valid = cnt_ref[:] > w
        a = jnp.where(valid, jnp.exp(s - M_i) * Li_i, 0.0)
        if drop_p > 0.0:
            # dst = gathered (nbr), src = resident row
            base = _pair_base(seed_u, did_ref[w].astype(jnp.uint32), sid_u)
            u = _pair_u(base * np.uint32(H) + hh, 0, 1)
            ah = jnp.where(u > drop_p, a * inv_keep, 0.0)
        else:
            ah = a
        dprime = jnp.where(sr >= 0, 1.0, slope)
        u2_ref[:] += a * dprime * ws_i
        gi = z[:, :HF]
        dx_ref[:] += jax.lax.dot(
            ah, E, preferred_element_type=jnp.float32) * gi
        t_ref[:] += jax.lax.dot(
            ah * dprime, E, preferred_element_type=jnp.float32) * gi
        return carry

    jax.lax.fori_loop(0, W, body, 0)
    xt = x * t_ref[:]
    dac_ref[:] = jnp.concatenate(
        [jnp.sum(xt[:, h * F:(h + 1) * F], axis=1, keepdims=True)
         for h in range(H)], axis=1) - u2_ref[:]


def bin_gat_bwd(g_t, ac_res, x_res, count, *, H: int, slope: float,
                drop=None, interpret: bool = False):
    """Fused per-bin GAT backward (pass B) over pre-gathered rows.

    Args:
      g_t: [W, S, Cz] gathered [grad_out | ar | M | Linv | ws] destination
        rows (Cz = H*F + 4H), any float dtype.
      ac_res: [S, H] f32 resident source attention coefficients.
      x_res: [S, H*F] resident source features.
      count: [S] int32 valid-slot counts.
      drop: optional (p, seed, sid [S] i32 src gids, did_t [W, S] i32 dst
        gids).
    Returns (dx [S, H*F], dac [S, H]) per segment.
    """
    W, S, Cz = g_t.shape
    HF = Cz - 4 * H
    F = HF // H
    sb = seg_block(W, Cz, g_t.dtype.itemsize, num_segs=S)
    grid = (_grid_pad(S, sb),)
    drop_p = float(drop[0]) if drop is not None else 0.0
    kern = functools.partial(_bin_gat_bwd_kernel, H=H, F=F, W=W,
                             slope=float(slope), drop_p=drop_p)

    def seg_spec(w):
        return pl.BlockSpec((sb, w), lambda i: (i, 0))

    in_specs = [
        seg_spec(H),                                       # ac resident
        seg_spec(HF),                                      # x resident
        seg_spec(1),                                       # count
        pl.BlockSpec((W, sb, Cz), lambda i: (0, i, 0)),    # gathered rows
    ]
    args = [ac_res, x_res, count.astype(jnp.int32).reshape(S, 1), g_t]
    if drop is not None:
        _, seed, sid, did_t = drop
        in_specs += [
            seg_spec(1),                                   # src gids
            pl.BlockSpec((W, sb, 1), lambda i: (0, i, 0)),  # dst gids
            pl.BlockSpec(memory_space=pltpu.SMEM),         # seed
        ]
        args += [sid.astype(jnp.int32).reshape(S, 1),
                 did_t.astype(jnp.int32).reshape(W, S, 1),
                 seed.astype(jnp.uint32).reshape(1)]
    vma = _vma_of(*args)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        scratch_shapes=([pltpu.VMEM((sb, HF), jnp.float32),   # t
                         pltpu.VMEM((sb, H), jnp.float32)]    # u2
                        + _gf_scratch(g_t, sb)),
        out_specs=[seg_spec(HF), seg_spec(H)],
        out_shape=[jax.ShapeDtypeStruct((S, HF), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((S, H), jnp.float32, vma=vma)],
        compiler_params=_BIN_PARAMS, interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# GMM (MoNet) node-pseudo bin kernels — mirror ops/gmm._node_fwd/_node_bwd
# ---------------------------------------------------------------------------


def _bin_gmm_fwd_kernel(beta_ref, cnt_ref, g_ref, mu_ref, isig_ref, acc_ref,
                        *rest, K, D, F, W, use_tanh):
    """One segment block: beta [Sb, D] resident dst-side projection, g
    [W, Sb, C] gathered [x | alpha] rows (C = K*F + D).  Output acc
    [Sb, K*F] Gaussian-weighted sums (no softmax stats — plain sums)."""
    g_ref, rest = _f32_src(g_ref, rest)
    KF = K * F
    beta = beta_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    E = _expander(K, F)

    def body(w, carry):
        z = g_ref[w]                           # [Sb, C]
        valid = cnt_ref[:] > w                 # [Sb, 1]
        p_d = []
        for d in range(D):
            pre = beta[:, d:d + 1] + z[:, KF + d:KF + d + 1]
            p_d.append(jnp.tanh(pre) if use_tanh else pre)
        wgts = []
        for k in range(K):
            q = 0.0
            for d in range(D):
                t = (p_d[d] - mu_ref[k, d]) * isig_ref[k, d]
                q = q + t * t
            wgts.append(jnp.where(valid, jnp.exp(-0.5 * q), 0.0))  # [Sb, 1]
        acc_ref[:] += jax.lax.dot(
            jnp.concatenate(wgts, axis=1), E,
            preferred_element_type=jnp.float32) * z[:, :KF]
        return carry

    jax.lax.fori_loop(0, W, body, 0)


def bin_gmm_node_fwd(g_t, beta_res, count, mu, isig, *, K: int, D: int,
                     use_tanh: bool, interpret: bool = False):
    """Fused per-bin node-pseudo GMM forward over pre-gathered rows.

    g_t: [W, S, K*F + D] gathered [feat | alpha] rows; beta_res: [S, D] f32
    destination-side projection (bias folded in); mu/isig: [K, D].
    Returns acc [S, K*F].
    """
    W, S, C = g_t.shape
    KF = C - D
    F = KF // K
    sb = seg_block(W, C, g_t.dtype.itemsize, num_segs=S)
    grid = (_grid_pad(S, sb),)
    kern = functools.partial(_bin_gmm_fwd_kernel, K=K, D=D, F=F, W=W,
                             use_tanh=bool(use_tanh))

    def seg_spec(w):
        return pl.BlockSpec((sb, w), lambda i: (i, 0))

    vma = _vma_of(beta_res, count, g_t)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            seg_spec(D),
            seg_spec(1),
            pl.BlockSpec((W, sb, C), lambda i: (0, i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mu
            pl.BlockSpec(memory_space=pltpu.SMEM),   # isig
        ],
        out_specs=seg_spec(KF),
        out_shape=jax.ShapeDtypeStruct((S, KF), jnp.float32, vma=vma),
        scratch_shapes=_gf_scratch(g_t, sb),
        compiler_params=_BIN_PARAMS, interpret=interpret,
    )(beta_res, count.astype(jnp.int32).reshape(S, 1), g_t, mu, isig)


def _bin_gmm_bwd_kernel(alpha_ref, x_ref, sf_ref, cnt_ref, g_ref, mu_ref,
                        isig_ref, dx_ref, st_ref, *rest, K, D, Ds, Dd, F, W,
                        use_tanh):
    """Transposed (CSC) node-pseudo GMM backward block: rows = sources.

    alpha [Sb, D] resident src-side projection; x [Sb, K*F] src features;
    sf [Sb, Ds] raw src pseudo scalars; g [W, Sb, Cz] gathered destination
    rows, Cz = K*F + D + Dd laid out [grad_out | beta | dfeat].  Outputs
    dx [Sb, KF] and per-segment stat rows st [Sb, ns] with the layout of
    ops/pallas_dense._gmm_bwd_kernel extended by the src-scalar block:
      [0:KD)                  sum c_k t_kd              (-> dmu via * isig)
      [KD:2KD)                sum c_k t_kd (p_d - mu)   (-> disg via * -1)
      [2KD:2KD+D)             sum dpre_d                (-> dpb)
      [2KD+D : +D*Dd)         sum dpre_d * dfeat_i      (-> dpw dst block)
      [2KD+D+D*Dd : +D*Ds)    sum dpre_d * sfeat_i      (-> dpw src block)
    """
    g_ref, rest = _f32_src(g_ref, rest)
    KF = K * F
    KD = K * D
    alpha = alpha_ref[:]
    x = x_ref[:].astype(jnp.float32)
    sf = sf_ref[:].astype(jnp.float32)
    dx_ref[:] = jnp.zeros_like(dx_ref)
    st_ref[:] = jnp.zeros_like(st_ref)

    def body(w, carry):
        z = g_ref[w]                           # [Sb, Cz]
        valid = cnt_ref[:] > w
        p_d, dp = [], [0.0] * D
        for d in range(D):
            pre = alpha[:, d:d + 1] + z[:, KF + d:KF + d + 1]
            p_d.append(jnp.tanh(pre) if use_tanh else pre)
        for k in range(K):
            q = 0.0
            t_kd = []
            for d in range(D):
                t = (p_d[d] - mu_ref[k, d]) * isig_ref[k, d]
                t_kd.append(t)
                q = q + t * t
            wgt = jnp.where(valid, jnp.exp(-0.5 * q), 0.0)  # [Sb, 1]
            g_k = z[:, k * F:(k + 1) * F]
            dx_ref[:, k * F:(k + 1) * F] += wgt * g_k
            gw = jnp.sum(x[:, k * F:(k + 1) * F] * g_k, axis=1,
                         keepdims=True)        # [Sb, 1]
            c = gw * wgt
            for d in range(D):
                st_ref[:, k * D + d:k * D + d + 1] += c * t_kd[d]
                st_ref[:, KD + k * D + d:KD + k * D + d + 1] += (
                    c * t_kd[d] * (p_d[d] - mu_ref[k, d]))
                dp[d] = dp[d] - c * t_kd[d] * isig_ref[k, d]
        for d in range(D):
            dpre = dp[d] * (1.0 - p_d[d] * p_d[d]) if use_tanh else dp[d]
            st_ref[:, 2 * KD + d:2 * KD + d + 1] += dpre
            for i in range(Dd):
                st_ref[:, 2 * KD + D + d * Dd + i:
                       2 * KD + D + d * Dd + i + 1] += (
                    dpre * z[:, KF + D + i:KF + D + i + 1])
            for i in range(Ds):
                o = 2 * KD + D + D * Dd + d * Ds + i
                st_ref[:, o:o + 1] += dpre * sf[:, i:i + 1]
        return carry

    jax.lax.fori_loop(0, W, body, 0)


def bin_gmm_node_bwd(g_t, alpha_res, x_res, sf_res, count, mu, isig, *,
                     K: int, D: int, Dd: int, use_tanh: bool,
                     interpret: bool = False):
    """Fused per-bin node-pseudo GMM backward over pre-gathered rows.

    g_t: [W, S, K*F + D + Dd] gathered [grad_out | beta | dfeat] rows;
    alpha_res [S, D]; x_res [S, K*F]; sf_res [S, Ds] raw source scalars.
    Returns (dx [S, K*F], st [S, 2KD + D + D*Dd + D*Ds]) — see kernel for
    the stat layout; the caller reduces st over segments.
    """
    W, S, Cz = g_t.shape
    KF = Cz - D - Dd
    F = KF // K
    Ds = sf_res.shape[-1]
    ns = 2 * K * D + D + D * Dd + D * Ds
    sb = seg_block(W, Cz, g_t.dtype.itemsize, num_segs=S)
    grid = (_grid_pad(S, sb),)
    kern = functools.partial(_bin_gmm_bwd_kernel, K=K, D=D, Ds=Ds, Dd=Dd,
                             F=F, W=W, use_tanh=bool(use_tanh))

    def seg_spec(w):
        return pl.BlockSpec((sb, w), lambda i: (i, 0))

    vma = _vma_of(alpha_res, x_res, count, g_t)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            seg_spec(D),
            seg_spec(KF),
            seg_spec(Ds),
            seg_spec(1),
            pl.BlockSpec((W, sb, Cz), lambda i: (0, i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mu
            pl.BlockSpec(memory_space=pltpu.SMEM),   # isig
        ],
        out_specs=[seg_spec(KF), seg_spec(ns)],
        out_shape=[jax.ShapeDtypeStruct((S, KF), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((S, ns), jnp.float32, vma=vma)],
        scratch_shapes=_gf_scratch(g_t, sb),
        compiler_params=_BIN_PARAMS, interpret=interpret,
    )(alpha_res, x_res, sf_res, count.astype(jnp.int32).reshape(S, 1), g_t,
      mu, isig)
