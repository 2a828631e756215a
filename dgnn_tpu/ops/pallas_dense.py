"""Pallas TPU kernels for the tile-sparse dense hub path.

Reddit-class power-law graphs concentrate most edges near the top-left
corner of the degree-ranked adjacency plane.  Per-edge gathers on this TPU
are rate-bound at ~140M rows/s (docs/PERF_NOTES.md), so the fused ops route
every [DENSE_RT x DENSE_CT] tile of that plane whose edge count beats the
measured break-even (~800 edges, graph/hub.py) through these kernels: a
flash-attention-style masked softmax aggregation over bit-packed per-tile
adjacency, with score/softmax math on the VPU and aggregation matmuls on
the MXU (see scripts/microbench_dense.py for the measured rates).

The tile schedule is data-dependent, so the grid is 1-D over schedule
entries with the (row-chunk, col-tile, mask-tile) coordinates
scalar-prefetched (pltpu.PrefetchScalarGridSpec): entry t processes row
chunk ``rc[t]`` x col tile ``ct[t]`` with adjacency bits ``mask[mt[t]]``.
Entries are sorted by (rc, ct) — consecutive entries share their output
block, which therefore stays resident in VMEM across a row chunk's sweep
(the online-softmax running state); ``first[t]`` marks accumulator
initialization points.  The GMM backward kernel runs at half row height
(VMEM pressure) using the half-granularity schedule that re-indexes the
same mask storage (graph/hub.DensePlan.half_schedule).

Reference analogue: none — dgNN's warp-per-row CSR kernels
(fused_gatconv_kernel.cu:24-118) stream CSR edges at the GPU's random-read
bandwidth; the tile-sparse dense formulation is the same computation
re-designed for a systolic-array machine.

Mask format ("bit-plane" packing, built by graph/hub.py): within a tile,
the adjacency bit of the column at lane j lives in byte j % (CT/8), bit
j // (CT/8) — so the kernel unpack is eight shift-ands concatenated along
lanes, with no lane gather.  The host stores ``col_ids`` in matching
order, making the layout invisible to everything outside the mask packer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # python float: jnp scalars become captured consts in kernels

# Fixed column-tile width baked into the mask packing (graph/hub.py).
DENSE_CT = 2048

# The scalar-prefetched (dynamic) index maps make Mosaic double-buffer every
# block conservatively, which puts the unrolled-head kernels a few MB past
# the default 16MB scoped-VMEM limit; the chip has 128MB, so raise it.
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

__all__ = ["dense_gat_fwd", "dense_gat_bwd", "dense_gmm_fwd",
           "dense_gmm_bwd", "DENSE_CT", "unpack_mask"]


def _vma_of(*arrays):
    """Union of the inputs' varying-mesh-axes, for pallas_call out_shapes.

    pallas_call does not infer output vma; under shard_map with
    check_vma=True (the default) every out ShapeDtypeStruct must state the
    mesh axes it varies over or JAX rejects the call.  Deriving it as the
    union of the input avals' vma keeps the kernels valid both inside
    shard_map (vma = {mesh axes}) and outside (vma = frozenset())."""
    vma = frozenset()
    for a in arrays:
        vma = vma | jax.typeof(a).vma
    return vma


def unpack_mask(bits_u8):
    """[Rt, Ct//8] uint8 (bit-plane layout) -> [Rt, Ct] int32 in {0, 1}."""
    b = bits_u8.astype(jnp.int32)
    return jnp.concatenate([(b >> k) & 1 for k in range(8)], axis=1)


def _kmix32(x):
    """murmur3 finalizer — MUST match ops/common.py:_mix32 bit-for-bit (the
    binned gather path and these kernels re-derive the same dropout mask)."""
    import numpy as np

    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _pair_base(seed_u32, dst_u32, src_u32):
    """pair_keep's per-(dst, src) hash base (ops/common.py:pair_keep):
    base = mix32(dst * 0x9E3779B9 ^ mix32(src ^ seed * 0x85EBCA6B)).
    Broadcasts [Rt, 1] x [1, Ct] -> [Rt, Ct] uint32."""
    import numpy as np

    return _kmix32(dst_u32 * np.uint32(0x9E3779B9)
                   ^ _kmix32(src_u32 ^ seed_u32 * np.uint32(0x85EBCA6B)))


def _pair_u(base_u32, h, num_heads):
    """Uniform in [0, 1) for head h from the pair base (pair_keep's tail).

    The cast goes through int32: Mosaic has no uint32 -> float32 lowering
    (NotImplementedError on real TPU — interpret mode accepts it, so CPU
    tests pass; caught by an end-to-end attn_drop>0 CLI run, round 5).
    (z >> 8) < 2^24, so the int32 reinterpretation is exact."""
    import numpy as np

    z = _kmix32(base_u32 * np.uint32(num_heads) + np.uint32(h))
    return ((z >> 8).astype(jnp.int32).astype(jnp.float32)
            * np.float32(1.0 / (1 << 24)))


def _sched(db):
    """Full-granularity schedule: (rc, ct, first, mt) int32 + mask."""
    rc = jnp.asarray(db.rc, jnp.int32)
    return (rc, jnp.asarray(db.ct, jnp.int32),
            jnp.asarray(db.first, jnp.int32),
            jnp.arange(rc.shape[0], dtype=jnp.int32), db.mask)


def _sched_half(db):
    """Half-row-granularity schedule over the same mask bytes (built by
    graph/hub.DensePlan.half_schedule, uploaded in structure.from_binned):
    mask viewed as [2T, RT/2, CT//8]."""
    T, RT, CB = db.mask.shape
    mask = db.mask.reshape(2 * T, RT // 2, CB)
    return (jnp.asarray(db.rc_h, jnp.int32), jnp.asarray(db.ct_h, jnp.int32),
            jnp.asarray(db.first_h, jnp.int32),
            jnp.asarray(db.mt_h, jnp.int32), mask)


# ---------------------------------------------------------------------------
# GAT
# ---------------------------------------------------------------------------


def _gat_fwd_kernel(rc_ref, ct_ref, fi_ref, mt_ref, ar_ref, ac_ref, x_ref,
                    mb_ref, *rest, H, F, slope, with_pos, mat_dtype,
                    drop_p=0.0):
    if drop_p > 0.0:
        rid_ref, cid_ref, seed_ref = rest[:3]
        rest = rest[3:]
    if with_pos:
        m_ref, l_ref, lp_ref, acc_ref, accp_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    # NOTE per-COLUMN scalars (ac) arrive TRANSPOSED as [H, C] and are read
    # by ROW: building [1, Ct] lane vectors from column reads of a [Ct, H]
    # block sends the Mosaic layout search into the weeds (hours-long or
    # non-terminating compiles once several such reads appear).
    #
    # The kernels are VPU-issue-bound (the per-pair elementwise ops dominate
    # the 2HF-FLOP/pair MXU work), so the whole online-softmax machinery is
    # eliminated in favor of an EXACT precomputed per-row score bound:
    # bound_r = leaky(ar_r + max_c ac_c) >= every score in row r (leaky is
    # monotonic), passed in as columns [H:2H) of the ar block.  Partials are
    # plain sums of p = exp(s - bound) — no running max, no rescale chain
    # (whose reduce->exp->multiply dependency also serializes the VPU) —
    # and the emitted per-row stat m = bound feeds the LSE combine as usual.
    # exp(s - bound) underflows only when a row's score SPREAD exceeds ~87
    # (f32 exp range) — far beyond trained GAT scores; the binned residual
    # path keeps exact per-segment maxima regardless.
    #
    # Two more VPU eliminations: leaky = max(s, slope*s) (slope in [0, 1))
    # and an ADDITIVE mask (s + NEG, so exp == 0 on masked slots) replace
    # all per-head selects; the l/lpos row sums ride the aggregation matmul
    # as an appended all-ones feature column ([Ct, F] pads to the 128-wide
    # MXU tile anyway, so the extra column is free MXU work instead of a
    # [Rt, Ct] VPU reduce per head).
    t = pl.program_id(0)

    @pl.when(fi_ref[t] == 1)
    def _():
        m_ref[:] = ar_ref[:, H:]  # emit m = bound (see above)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if with_pos:
            lp_ref[:] = jnp.zeros_like(lp_ref)
            accp_ref[:] = jnp.zeros_like(accp_ref)

    mneg = jnp.where(unpack_mask(mb_ref[0]) > 0, 0.0, NEG)  # [Rt, Ct]
    rt = mneg.shape[0]
    Fa = F + 1  # per-head feature block incl. the ones column
    if drop_p > 0.0:
        # pair_keep hash base from the tile's (dst row, src col) GLOBAL id
        # vectors; l/lpos must sum the UNDROPPED weights (softmax stats), so
        # they leave the matmul's ones column and become VPU row sums while
        # the aggregation matmuls take the dropped weights.
        base = _pair_base(seed_ref[0].astype(jnp.uint32),
                          rid_ref[...].astype(jnp.uint32),
                          cid_ref[...].astype(jnp.uint32))
        inv_keep = 1.0 / (1.0 - drop_p)
    def make_p(h):
        """(undropped ptile, dropped ptile) for head h."""
        ar_h = ar_ref[:, h][:, None]      # [Rt, 1]
        bnd_h = ar_ref[:, H + h][:, None]  # [Rt, 1] per-row score bound
        ac_h = ac_ref[h, :][None, :]      # [1, Ct] (row read of [H, C])
        s_raw = ar_h + ac_h
        s = jnp.maximum(s_raw, s_raw * slope) + mneg
        ptile = jnp.exp(s - bnd_h)  # [Rt, Ct]; 0 on masked slots
        if drop_p > 0.0:
            keep = _pair_u(base, h, H) > drop_p
            return s_raw, ptile, jnp.where(keep, ptile * inv_keep, 0.0)
        return s_raw, ptile, ptile

    if with_pos:
        for h in range(H):
            s_raw, ptile, pd = make_p(h)
            x_h = x_ref[:, h * Fa:(h + 1) * Fa].astype(mat_dtype)
            # ONE [2Rt, Ct] @ [Ct, F+1] matmul for both accumulators AND
            # both row sums (fewer, deeper MXU issues pipeline better)
            both = jnp.concatenate([pd, jnp.where(s_raw >= 0, pd, 0.0)],
                                   axis=0).astype(mat_dtype)
            upd = jax.lax.dot(both, x_h, preferred_element_type=jnp.float32)
            acc_ref[:, h * F:(h + 1) * F] += upd[:rt, :F]
            accp_ref[:, h * F:(h + 1) * F] += upd[rt:, :F]
            if drop_p > 0.0:
                l_ref[:, h] += jnp.sum(ptile, axis=1)
                lp_ref[:, h] += jnp.sum(jnp.where(s_raw >= 0, ptile, 0.0),
                                        axis=1)
            else:
                l_ref[:, h] += upd[:rt, F]
                lp_ref[:, h] += upd[rt:, F]
    else:
        # Inference: no sign-split partner to deepen the matmul with, and a
        # lone [Rt, Ct] @ [Ct, F+1] issue measured ~1.5x SLOWER end-to-end
        # than the train kernel's stacked [2Rt, ...] form (shallow MXU
        # pipeline).  Pair HEADS instead: [2Rt, Ct] of (h, h+1) against
        # their contiguous [Ct, 2(F+1)] feature block — the off-diagonal
        # quarter of the product is discarded (the same 2x MAC overhead the
        # train trick pays) but the issue depth matches training.
        h = 0
        while h < H:
            if h + 1 < H:
                _, p0, d0 = make_p(h)
                _, p1, d1 = make_p(h + 1)
                both = jnp.concatenate([d0, d1], axis=0).astype(mat_dtype)
                x2 = x_ref[:, h * Fa:(h + 2) * Fa].astype(mat_dtype)
                upd = jax.lax.dot(both, x2,
                                  preferred_element_type=jnp.float32)
                acc_ref[:, h * F:(h + 1) * F] += upd[:rt, :F]
                acc_ref[:, (h + 1) * F:(h + 2) * F] += upd[rt:, Fa:Fa + F]
                if drop_p > 0.0:
                    l_ref[:, h] += jnp.sum(p0, axis=1)
                    l_ref[:, h + 1] += jnp.sum(p1, axis=1)
                else:
                    l_ref[:, h] += upd[:rt, F]
                    l_ref[:, h + 1] += upd[rt:, Fa + F]
                h += 2
            else:
                _, p0, d0 = make_p(h)
                x_h = x_ref[:, h * Fa:(h + 1) * Fa].astype(mat_dtype)
                upd = jax.lax.dot(d0.astype(mat_dtype), x_h,
                                  preferred_element_type=jnp.float32)
                acc_ref[:, h * F:(h + 1) * F] += upd[:, :F]
                if drop_p > 0.0:
                    l_ref[:, h] += jnp.sum(p0, axis=1)
                else:
                    l_ref[:, h] += upd[:, F]
                h += 1


def dense_gat_fwd(db, ar_d, ac_d, x_d, *, slope: float,
                  Rt: int = 256, Ct: int = DENSE_CT, with_pos: bool = True,
                  mat_dtype=jnp.bfloat16, drop=None, interpret: bool = False):
    """Masked-softmax aggregation over the tile-sparse dense block.

    Args:
      db: DenseBlock carrying (mask [T, Rt, Ct//8], rc, ct, first).
      ar_d: [R, H] f32 — attn_row of the block's destination rows.
      ac_d: [C, H] f32 — attn_col of the block's source columns.
      x_d:  [C, H*F] features of source columns.
      drop: optional (p, seed, row_ids [R] i32, col_ids [C] i32) — attention
        dropout re-derived in-kernel from pair_keep's stateless hash of the
        GLOBAL (dst, src, head) ids, bit-identical to the binned path
        (reference analogue: fused_gatconv_kernel.cu:95-104).
    Returns (m, l, lpos, acc, accpos): [R, H] stats and [R, H*F] weighted
    sums — the same per-segment partial tuple the binned path produces, fed
    into the log-sum-exp combine.  lpos/accpos are None when not
    ``with_pos`` (the inference kernel emits only 3 outputs and pairs heads
    into deeper MXU issues; see the kernel comment).
    """
    R, H = ar_d.shape
    C = ac_d.shape[0]
    HF = x_d.shape[-1]
    F = HF // H
    assert R % Rt == 0 and C % Ct == 0 and Ct % 8 == 0, (R, C, Rt, Ct)
    assert 0.0 <= slope < 1.0, slope  # leaky = max(s, slope*s) in-kernel
    rc, ct, fi, mt, mask = _sched(db)
    T = rc.shape[0]
    ac_t = ac_d.T  # [H, C]: see kernel note on column reads
    # exact per-row score bound (kernel note): leaky(ar_r + max_c ac_c)
    sb = ar_d + jnp.max(ac_d, axis=0)[None, :]
    ar2 = jnp.concatenate([ar_d, jnp.maximum(sb, sb * slope)], axis=1)
    # ones column appended per head: l rides the aggregation matmul
    x_aug = jnp.concatenate(
        [x_d.reshape(C, H, F),
         jnp.ones((C, H, 1), x_d.dtype)], axis=-1).reshape(C, H * (F + 1))
    drop_p = float(drop[0]) if drop is not None else 0.0
    kern = functools.partial(_gat_fwd_kernel, H=H, F=F, slope=float(slope),
                             with_pos=with_pos, mat_dtype=mat_dtype,
                             drop_p=drop_p)

    def row_spec(w):
        return pl.BlockSpec((Rt, w), lambda t, rc, ct, fi, mt: (rc[t], 0))

    vma = _vma_of(ar_d, ac_d, x_d, mask)
    if with_pos:
        out_shape = [
            jax.ShapeDtypeStruct((R, H), jnp.float32, vma=vma),   # m
            jax.ShapeDtypeStruct((R, H), jnp.float32, vma=vma),   # l
            jax.ShapeDtypeStruct((R, H), jnp.float32, vma=vma),   # lpos
            jax.ShapeDtypeStruct((R, HF), jnp.float32, vma=vma),  # acc
            jax.ShapeDtypeStruct((R, HF), jnp.float32, vma=vma),  # accpos
        ]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((R, H), jnp.float32, vma=vma),   # m
            jax.ShapeDtypeStruct((R, H), jnp.float32, vma=vma),   # l
            jax.ShapeDtypeStruct((R, HF), jnp.float32, vma=vma),  # acc
        ]
    in_specs = [
        row_spec(2 * H),                                    # [ar | bound]
        pl.BlockSpec((H, Ct), lambda t, rc, ct, fi, mt: (0, ct[t])),
        pl.BlockSpec((Ct, H * (F + 1)),
                     lambda t, rc, ct, fi, mt: (ct[t], 0)),
        pl.BlockSpec((1, Rt, Ct // 8),
                     lambda t, rc, ct, fi, mt: (mt[t], 0, 0)),     # mask
    ]
    args = [rc, ct, fi, mt, ar2, ac_t, x_aug, mask]
    if drop is not None:
        _, seed, rid, cid = drop
        in_specs += [
            row_spec(1),                                           # row ids
            pl.BlockSpec((1, Ct), lambda t, rc, ct, fi, mt: (0, ct[t])),
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # seed
        ]
        args += [rid.astype(jnp.int32).reshape(R, 1),
                 cid.astype(jnp.int32).reshape(1, C),
                 seed.astype(jnp.uint32).reshape(1)]
    out_specs = ([row_spec(H), row_spec(H), row_spec(H), row_spec(HF),
                  row_spec(HF)] if with_pos
                 else [row_spec(H), row_spec(H), row_spec(HF)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=_PARAMS, interpret=interpret,
    )(*args)
    if with_pos:
        return outs
    m, l, acc = outs
    return m, l, None, acc, None


def _gat_bwd_kernel(rc_ref, ct_ref, fi_ref, mt_ref, ac_ref, x_ref, g_ref,
                    gt_ref, st_ref, mb_ref, *rest, H, F, slope,
                    mat_dtype, drop_p=0.0):
    if drop_p > 0.0:
        sid_ref, did_ref, seed_ref = rest[:3]
        rest = rest[3:]
    dx_ref, dac_ref = rest
    """Dense-block half of GAT pass B (transposed layout).

    Rows = source nodes of the block, cols = destination nodes.
    g_ref: [Ct, H*F] grad_out of the destinations; st_ref: [4H, Ct] — the
    per-destination scalars [ar | M | Linv | ws] TRANSPOSED so every per-head
    scalar vector is a ROW read (column reads that broadcast to [1, Ct]
    lane vectors make the Mosaic compile non-terminating; see fwd kernel).
      dx[r]  += sum_c a_rc g_c          (a from recomputed softmax)
      dac[r] += sum_c (a ge - a ws_c) * leaky'(s_raw)
    with ge_rc = <x_r, g_c> per head (MXU), s_raw = ar_c + ac_r.
    (Reference analogue: mhspmm_backward_kernel + the grad_attn_col
    atomicAdd, fused_gatconv_kernel.cu:712-763, :957.)
    """
    t = pl.program_id(0)

    @pl.when(fi_ref[t] == 1)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        dac_ref[:] = jnp.zeros_like(dac_ref)

    # Additive mask + reciprocal-L stats (see fwd kernel note): a is exactly
    # 0 on masked slots via exp(s + NEG - M), which also masks u (every u
    # term is proportional to a) — zero per-head selects for masking, and
    # the per-pair divide becomes a multiply (Linv is precomputed per
    # destination by the caller).
    mneg = jnp.where(unpack_mask(mb_ref[0]) > 0, 0.0, NEG)
    if drop_p > 0.0:
        # transposed block: dst = cols, src = rows (see dense_gat_fwd drop)
        base = _pair_base(seed_ref[0].astype(jnp.uint32),
                          did_ref[...].astype(jnp.uint32),
                          sid_ref[...].astype(jnp.uint32))
        inv_keep = 1.0 / (1.0 - drop_p)
    for h in range(H):
        g_h = g_ref[:, h * F:(h + 1) * F]          # [Ct, F]
        ar_c = st_ref[h, :][None, :]               # [1, Ct] (row reads)
        M_c = st_ref[H + h, :][None, :]
        Li_c = st_ref[2 * H + h, :][None, :]       # 1 / max(L, eps)
        ws_c = st_ref[3 * H + h, :][None, :]
        ac_r = ac_ref[:, h][:, None]               # [Rt, 1]
        s_raw = ar_c + ac_r                        # [Rt, Ct]
        s = jnp.maximum(s_raw, s_raw * slope) + mneg
        a = jnp.exp(s - M_c) * Li_c
        if drop_p > 0.0:
            keep = _pair_u(base, h, H) > drop_p
            ah = jnp.where(keep, a * inv_keep, 0.0)
        else:
            ah = a
        dx_ref[:, h * F:(h + 1) * F] += jax.lax.dot(
            ah.astype(mat_dtype), g_h.astype(mat_dtype),
            preferred_element_type=jnp.float32)
        x_h = x_ref[:, h * F:(h + 1) * F]          # [Rt, F]
        # ge = <x_r, g_c> via a NORMAL matmul against the pre-transposed
        # grad block (a contracted-on-dim-1 dot_general hangs Mosaic)
        ge = jax.lax.dot(
            x_h.astype(mat_dtype), gt_ref[h * F:(h + 1) * F, :],
            preferred_element_type=jnp.float32)    # [Rt, Ct]
        dprime = jnp.where(s_raw >= 0, 1.0, slope)
        u = (ah * ge - a * ws_c) * dprime
        dac_ref[:, h] += jnp.sum(u, axis=1)


def dense_gat_bwd(db, ac_d, x_d, g_d, st_d, *,
                  slope: float, H: int, Rt: int = 256, Ct: int = DENSE_CT,
                  mat_dtype=jnp.bfloat16, drop=None, interpret: bool = False):
    """Dense-block dX / d attn_col partials over the transposed block.

    db: the BACKWARD direction's DenseBlock (tile schedule + masks);
    ac_d: [R, H] attn_col of source rows; x_d: [R, H*F] source features;
    g_d: [C, H*F] grad_out per destination; st_d: [C, 4H] packed
    per-destination softmax scalars [ar | M | Linv | ws].
    drop: optional (p, seed, src_ids [R] i32, dst_ids [C] i32) — must carry
    the same GLOBAL ids as the forward pass so the re-derived mask matches.
    Returns (dx [R, H*F], dac [R, H]).
    """
    R = ac_d.shape[0]
    C = g_d.shape[0]
    HF = x_d.shape[-1]
    F = HF // H
    assert R % Rt == 0 and C % Ct == 0, (R, C, Rt, Ct)
    rc, ct, fi, mt, mask = _sched(db)
    T = rc.shape[0]
    g_t = g_d.T.astype(mat_dtype)  # [HF, C] once per pass (see kernel note)
    st_t = st_d.T.astype(jnp.float32)  # [4H, C] (see kernel note)
    drop_p = float(drop[0]) if drop is not None else 0.0
    kern = functools.partial(_gat_bwd_kernel, H=H, F=F, slope=float(slope),
                             mat_dtype=mat_dtype, drop_p=drop_p)

    def row_spec(w):
        return pl.BlockSpec((Rt, w), lambda t, rc, ct, fi, mt: (rc[t], 0))

    def col_spec(w):
        return pl.BlockSpec((Ct, w), lambda t, rc, ct, fi, mt: (ct[t], 0))

    in_specs = [
        row_spec(H),                                               # ac
        row_spec(HF),                                              # x
        col_spec(HF),                                              # g
        pl.BlockSpec((HF, Ct), lambda t, rc, ct, fi, mt: (0, ct[t])),
        pl.BlockSpec((4 * H, Ct),
                     lambda t, rc, ct, fi, mt: (0, ct[t])),   # stats^T
        pl.BlockSpec((1, Rt, Ct // 8),
                     lambda t, rc, ct, fi, mt: (mt[t], 0, 0)),     # mask
    ]
    args = [rc, ct, fi, mt, ac_d, x_d, g_d, g_t, st_t, mask]
    if drop is not None:
        _, seed, sid, did = drop
        in_specs += [
            row_spec(1),                                           # src ids
            pl.BlockSpec((1, Ct), lambda t, rc, ct, fi, mt: (0, ct[t])),
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # seed
        ]
        args += [sid.astype(jnp.int32).reshape(R, 1),
                 did.astype(jnp.int32).reshape(1, C),
                 seed.astype(jnp.uint32).reshape(1)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=in_specs,
        out_specs=[row_spec(HF), row_spec(H)],
    )
    vma = _vma_of(ac_d, x_d, g_d, st_d, mask)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R, HF), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((R, H), jnp.float32, vma=vma)],
        compiler_params=_PARAMS, interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# GMM (MoNet) dense-block kernels — node-derived pseudo coordinates
# ---------------------------------------------------------------------------
#
# In node-pseudo mode (ops/gmm.py gmm_aggregate_node) the projected pseudo
# coordinate of edge (u -> v) is separable: pre_d = alpha_d[u] + beta_d[v]
# (+ bias folded into beta), optionally tanh'd, so a dense tile derives every
# edge weight from two rank-1 broadcasts — the same structure as the GAT
# score.  Reference analogue: fuseGmm (fused_gmmconv_kernel.cu:24-55), which
# streams materialized per-edge pseudo instead.


def _gmm_fwd_kernel(rc_ref, ct_ref, fi_ref, mt_ref, beta_ref, alpha_ref,
                    x_ref, mb_ref, mu_ref, isig_ref, acc_ref, *, K, D, F,
                    use_tanh, mat_dtype):
    t = pl.program_id(0)

    @pl.when(fi_ref[t] == 1)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # additive mask: exp(-q/2 + NEG) == 0 on masked slots — one [Rt, Ct]
    # add per kernel instead of a select per k (see GAT kernel notes)
    mneg = jnp.where(unpack_mask(mb_ref[0]) > 0, 0.0, NEG)
    p_d = []
    for d in range(D):
        # alpha arrives transposed [D, C]: row reads only (see GAT kernels)
        pre = beta_ref[:, d][:, None] + alpha_ref[d, :][None, :]  # [Rt, Ct]
        p_d.append(jnp.tanh(pre) if use_tanh else pre)
    for k in range(K):
        q = 0.0
        for d in range(D):
            tkd = (p_d[d] - mu_ref[k, d]) * isig_ref[k, d]
            q = q + tkd * tkd
        w = jnp.exp(mneg - 0.5 * q)  # [Rt, Ct]; 0 on masked slots
        x_k = x_ref[:, k * F:(k + 1) * F]
        acc_ref[:, k * F:(k + 1) * F] += jax.lax.dot(
            w.astype(mat_dtype), x_k.astype(mat_dtype),
            preferred_element_type=jnp.float32)


def dense_gmm_fwd(db, beta_r, alpha_c, x_c, mu, isig, *,
                  use_tanh: bool, Rt: int = 256, Ct: int = DENSE_CT,
                  mat_dtype=jnp.bfloat16, interpret: bool = False):
    """Gaussian-weighted aggregation over the tile-sparse dense block.

    beta_r: [R, D] destination-side projected pseudo (bias folded in);
    alpha_c: [C, D] source-side projected pseudo; x_c: [C, K*F] features;
    mu/isig: [K, D].  Returns acc [R, K*F].
    """
    R, D = beta_r.shape
    C = alpha_c.shape[0]
    KF = x_c.shape[-1]
    K = mu.shape[0]
    F = KF // K
    assert R % Rt == 0 and C % Ct == 0
    rc, ct, fi, mt, mask = _sched(db)
    T = rc.shape[0]
    alpha_t = alpha_c.T.astype(jnp.float32)  # [D, C]
    kern = functools.partial(_gmm_fwd_kernel, K=K, D=D, F=F,
                             use_tanh=bool(use_tanh), mat_dtype=mat_dtype)

    def row_spec(w):
        return pl.BlockSpec((Rt, w), lambda t, rc, ct, fi, mt: (rc[t], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            row_spec(D),                                        # beta (dst)
            pl.BlockSpec((D, Ct), lambda t, rc, ct, fi, mt: (0, ct[t])),
            pl.BlockSpec((Ct, KF), lambda t, rc, ct, fi, mt: (ct[t], 0)),
            pl.BlockSpec((1, Rt, Ct // 8),
                         lambda t, rc, ct, fi, mt: (mt[t], 0, 0)),  # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),              # mu
            pl.BlockSpec(memory_space=pltpu.SMEM),              # isig
        ],
        out_specs=row_spec(KF),
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (R, KF), jnp.float32, vma=_vma_of(beta_r, alpha_t, x_c, mask)),
        compiler_params=_PARAMS, interpret=interpret,
    )(rc, ct, fi, mt, beta_r, alpha_t, x_c, mask, mu, isig)


def _gmm_bwd_kernel(rc_ref, ct_ref, fi_ref, mt_ref, alpha_ref, beta_ref,
                    x_ref, g_ref, gt_ref, df_ref, mb_ref, mu_ref, isig_ref,
                    dx_ref, st_ref, *, K, D, Dd, F, use_tanh, mat_dtype):
    """Transposed-block GMM backward: rows = sources, cols = destinations.

    g_ref: [Ct, K*F] grad_out; df_ref: [Dd, Ct] dst-side raw pseudo
    TRANSPOSED (row reads only).  st_ref row-stat layout (per source row,
    summed over its dense edges):
      [0:KD)        sum c_k t_kd                  (-> dmu via * isig)
      [KD:2KD)      sum c_k t_kd (p_d - mu_kd)    (-> disg via * -1)
      [2KD:2KD+D)   sum dpre_d                    (-> dpb; dpw src part)
      [2KD+D:2KD+D+D*Dd) sum dpre_d * dfeat_i     (-> dpw dst part)
    with c_k = w_k <x_r, g_c>, dpre the grad wrt the pre-tanh projection.
    """
    t = pl.program_id(0)
    KD = K * D

    @pl.when(fi_ref[t] == 1)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)
        st_ref[:] = jnp.zeros_like(st_ref)

    # additive mask (see _gmm_fwd_kernel): w == 0 on masked slots, and every
    # downstream term (c, st sums, dp) is proportional to w
    mneg = jnp.where(unpack_mask(mb_ref[0]) > 0, 0.0, NEG)
    p_d = []
    for d in range(D):
        # beta arrives transposed [D, C]: row reads only (see GAT kernels)
        pre = alpha_ref[:, d][:, None] + beta_ref[d, :][None, :]  # [Rt, Ct]
        p_d.append(jnp.tanh(pre) if use_tanh else pre)
    dp = [0.0] * D
    for k in range(K):
        q = 0.0
        t_kd = []
        for d in range(D):
            tt = (p_d[d] - mu_ref[k, d]) * isig_ref[k, d]
            t_kd.append(tt)
            q = q + tt * tt
        w = jnp.exp(mneg - 0.5 * q)
        g_k = g_ref[:, k * F:(k + 1) * F]  # [Ct, F]
        dx_ref[:, k * F:(k + 1) * F] += jax.lax.dot(
            w.astype(mat_dtype), g_k.astype(mat_dtype),
            preferred_element_type=jnp.float32)
        x_k = x_ref[:, k * F:(k + 1) * F]  # [Rt, F]
        # <x_r, g_c> via the pre-transposed grad block (dot_general with a
        # dim-1 contraction hangs Mosaic)
        gw = jax.lax.dot(
            x_k.astype(mat_dtype), gt_ref[k * F:(k + 1) * F, :],
            preferred_element_type=jnp.float32)  # [Rt, Ct]
        c = gw * w
        for d in range(D):
            st_ref[:, k * D + d] += jnp.sum(c * t_kd[d], axis=1)
            st_ref[:, KD + k * D + d] += jnp.sum(
                c * t_kd[d] * (p_d[d] - mu_ref[k, d]), axis=1)
            dp[d] = dp[d] - c * t_kd[d] * isig_ref[k, d]
    for d in range(D):
        dpre = dp[d] * (1.0 - p_d[d] * p_d[d]) if use_tanh else dp[d]
        st_ref[:, 2 * KD + d] += jnp.sum(dpre, axis=1)
        for i in range(Dd):
            df_i = df_ref[i, :][None, :]  # [1, Ct] (row read of [Dd, C])
            st_ref[:, 2 * KD + D + d * Dd + i] += jnp.sum(dpre * df_i, axis=1)


def dense_gmm_bwd(db, alpha_r, beta_c, x_r, g_c, df_c, mu, isig, *,
                  use_tanh: bool, Rt: int = 128, Ct: int = DENSE_CT,
                  mat_dtype=jnp.bfloat16, interpret: bool = False):
    # default Rt=128: the K*D unrolled temporaries ([Rt, Ct] f32 each) put
    # Rt=256 just past the 16MB VMEM scoped limit at K=D=2, hence the
    # half-granularity schedule (_sched_half)
    """Tile-sparse dense GMM backward partials (see _gmm_bwd_kernel).

    db: the BACKWARD direction's DenseBlock.
    alpha_r: [R, D] source-side projection; beta_c: [C, D] dest-side;
    x_r: [R, K*F] source features; g_c: [C, K*F] grad_out;
    df_c: [C, Dd] dst-side raw pseudo; mu/isig: [K, D].
    Returns (dx [R, K*F], rowstats [R, 2KD + D + D*Dd]).
    """
    R, D = alpha_r.shape
    C = beta_c.shape[0]
    K = mu.shape[0]
    KF = x_r.shape[-1]
    F = KF // K
    Dd = df_c.shape[-1]
    ns = 2 * K * D + D + D * Dd
    if Rt < db.mask.shape[1]:
        rc, ct, fi, mt, mask = _sched_half(db)
        Rt = db.mask.shape[1] // 2
    else:
        rc, ct, fi, mt, mask = _sched(db)
        Rt = db.mask.shape[1]
    T = rc.shape[0]
    g_t = g_c.T.astype(mat_dtype)  # [KF, C] once per pass (see kernel note)
    beta_t = beta_c.T.astype(jnp.float32)  # [D, C]
    df_t = df_c.T.astype(jnp.float32)  # [Dd, C]
    kern = functools.partial(_gmm_bwd_kernel, K=K, D=D, Dd=Dd, F=F,
                             use_tanh=bool(use_tanh), mat_dtype=mat_dtype)

    def row_spec(w):
        return pl.BlockSpec((Rt, w), lambda t, rc, ct, fi, mt: (rc[t], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            row_spec(D),                                        # alpha (src)
            pl.BlockSpec((D, Ct), lambda t, rc, ct, fi, mt: (0, ct[t])),
            row_spec(KF),                                       # x (src)
            pl.BlockSpec((Ct, KF), lambda t, rc, ct, fi, mt: (ct[t], 0)),
            pl.BlockSpec((KF, Ct), lambda t, rc, ct, fi, mt: (0, ct[t])),
            pl.BlockSpec((Dd, Ct), lambda t, rc, ct, fi, mt: (0, ct[t])),
            pl.BlockSpec((1, Rt, Ct // 8),
                         lambda t, rc, ct, fi, mt: (mt[t], 0, 0)),  # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),              # mu
            pl.BlockSpec(memory_space=pltpu.SMEM),              # isig
        ],
        out_specs=[row_spec(KF), row_spec(ns)],
    )
    vma = _vma_of(alpha_r, beta_t, x_r, g_c, mask)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((R, KF), jnp.float32, vma=vma),
                   jax.ShapeDtypeStruct((R, ns), jnp.float32, vma=vma)],
        compiler_params=_PARAMS, interpret=interpret,
    )(rc, ct, fi, mt, alpha_r, beta_t, x_r, g_c, g_t, df_t, mask, mu, isig)
