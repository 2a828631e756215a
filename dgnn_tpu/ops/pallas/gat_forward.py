"""Pallas TPU kernel: fused GAT forward over one degree bin.

The XLA path (ops/gat.py) expresses the neighbor-feature access as an HLO
gather, which materializes the [chunk, W, H, F] tile in HBM before the
weighted reduction reads it back — ~3x the optimal edge-feature traffic.
This kernel streams each segment's neighbor rows HBM->VMEM with direct DMAs
and performs the masked online softmax + weighted accumulation entirely in
VMEM, touching each neighbor row once (the role of the reference's
`fused_forward_kernel`'s shmem staging, fused_gatconv_kernel.cu:91-117).

TPU layout constraints shape the design (same pattern as the paged-attention
kernel shipped with JAX): HBM DMAs move whole (8, 128)-tiled trailing blocks,
so node features are viewed as ``feat3d [N, SUB, 128]`` with ``SUB = H*F/128``
and dynamic indexing only on the leading (untiled) node axis.  This requires
``F % 128 == 0`` and ``SUB % 8 == 0`` — i.e. H*F in {1024, 2048, ...} with
lane-aligned heads; smaller shapes (like the reference's 4x64 config) stay on
the XLA gather path (ops.common.use_pallas gates dispatch).

Per-head softmax weights [W, H] spread onto each head's F/128 sublanes with a
constant 0/1 ownership matmul ``R [H, SUB]`` then a lane broadcast — no
lane-splitting reshapes, which Mosaic cannot lower.

Per grid step (BS segments x W slots): neighbor ids are read from an SMEM
block and W row-DMAs per segment land in a double-buffered VMEM scratch, so
segment i+1's gather overlaps segment i's compute.  Per-segment (max,
sumexp, weighted-acc) partials are written out and merged across bins by the
caller's segment log-sum-exp combine.

Dropout: the caller passes `wmult` ([S, W, H] keep/(1-p) multipliers derived
from the stateless edge hash) or None.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gat_forward_bin_pallas", "head_sublane_map", "pallas_shape_ok"]

NEG_INF = float("-inf")
BS = 8  # segments per grid step
LANE = 128


def pallas_shape_ok(heads: int, feat: int) -> bool:
    hf = heads * feat
    return feat % LANE == 0 and (hf // LANE) % 8 == 0


def head_sublane_map(heads: int, feat: int) -> np.ndarray:
    """[H, SUB] 0/1: head h owns sublanes [h*F/128, (h+1)*F/128)."""
    sub = heads * feat // LANE
    per = feat // LANE
    r = np.zeros((heads, sub), np.float32)
    for h in range(heads):
        r[h, h * per:(h + 1) * per] = 1.0
    return r


def _kernel(count_ref, nbr_ref, s_ref, wmult_ref, r_ref, feat_hbm,
            m_ref, l_ref, lpos_ref, acc_ref, accpos_ref, xbuf, sem, *,
            bs, width, use_wmult):
    def gather_segment(seg, buf):
        def issue(j, _):
            pltpu.make_async_copy(
                feat_hbm.at[nbr_ref[seg, j]], xbuf.at[buf, j], sem.at[buf]
            ).start()
            return 0
        jax.lax.fori_loop(0, width, issue, 0)

    def wait_segment(buf):
        def waitj(j, _):
            pltpu.make_async_copy(
                feat_hbm.at[0], xbuf.at[buf, j], sem.at[buf]
            ).wait()
            return 0
        jax.lax.fori_loop(0, width, waitj, 0)

    gather_segment(0, 0)

    def body(seg, _):
        buf = jax.lax.rem(seg, 2)

        @pl.when(seg + 1 < bs)
        def _():
            gather_segment(seg + 1, 1 - buf)

        wait_segment(buf)

        cnt = count_ref[seg, 0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0)
        mask = lane < cnt  # [W, 1]
        s = jnp.where(mask, s_ref[seg], NEG_INF)  # [W, H]
        m = jnp.max(s, axis=0, keepdims=True)  # [1, H]
        w = jnp.where(mask, jnp.exp(s - m), 0.0)  # [W, H]
        l = jnp.sum(w, axis=0, keepdims=True)  # [1, H]
        pos = s >= 0  # LeakyReLU' == 1 (False on padded: s == -inf)
        lpos = jnp.sum(jnp.where(pos, w, 0.0), axis=0, keepdims=True)
        w_agg = w * wmult_ref[seg] if use_wmult else w
        # head weights -> owning sublanes: [W, H] @ [H, SUB] -> [W, SUB]
        wsub = jnp.dot(w_agg, r_ref[:], preferred_element_type=jnp.float32)
        acc = jnp.sum(wsub[:, :, None] * xbuf[buf], axis=0)  # [SUB, 128]
        wposs = jnp.dot(jnp.where(pos, w_agg, 0.0), r_ref[:],
                        preferred_element_type=jnp.float32)
        accpos = jnp.sum(wposs[:, :, None] * xbuf[buf], axis=0)
        m_ref[pl.ds(seg, 1), :] = m
        l_ref[pl.ds(seg, 1), :] = l
        lpos_ref[pl.ds(seg, 1), :] = lpos
        acc_ref[seg] = acc
        accpos_ref[seg] = accpos
        return 0

    jax.lax.fori_loop(0, bs, body, 0)


def gat_forward_bin_pallas(nbr, count, s, wmult, feat3d, *, interpret=False):
    """Run the fused forward over one bin.

    Args:
      nbr: [S, W] int32 neighbor ids.
      count: [S] int32 valid slots per segment.
      s: [S, W, H] f32 edge scores (LeakyReLU applied, unmasked).
      wmult: [S, W, H] f32 dropout multipliers, or None.
      feat3d: [N, SUB, 128] f32 node features (SUB = H*F/128; see
        pallas_shape_ok for the layout requirements).
    Returns:
      (m [S, H], l [S, H], lpos [S, H], acc [S, SUB, 128],
      accpos [S, SUB, 128]) per-segment partials; the pos variants restrict
      to slots with score >= 0 (lpos without dropout multipliers).
    """
    seg, width = nbr.shape
    heads = s.shape[-1]
    sub = feat3d.shape[1]
    feat = sub * LANE // heads
    assert seg % BS == 0, (seg, BS)
    use_wmult = wmult is not None
    if wmult is None:
        wmult = jnp.zeros((seg, 1, heads), jnp.float32)  # placeholder
    wblock = wmult.shape[1]
    rmat = jnp.asarray(head_sublane_map(heads, feat))

    kernel = functools.partial(_kernel, bs=BS, width=width,
                               use_wmult=use_wmult)
    m, l, lpos, acc, accpos = pl.pallas_call(
        kernel,
        grid=(seg // BS,),
        in_specs=[
            pl.BlockSpec((BS, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BS, width), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BS, width, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, wblock, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, sub), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # feat stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((BS, heads), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, heads), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, heads), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seg, heads), jnp.float32),
            jax.ShapeDtypeStruct((seg, heads), jnp.float32),
            jax.ShapeDtypeStruct((seg, heads), jnp.float32),
            jax.ShapeDtypeStruct((seg, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((seg, sub, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, width, sub, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * seg * width * sub * LANE,
            bytes_accessed=seg * width * (sub * LANE * 4 + heads * 8)
            + seg * sub * LANE * 4,
            transcendentals=seg * width * heads),
        interpret=interpret,
    )(count.reshape(-1, 1), nbr, s, wmult, rmat, feat3d)
    return m, l, lpos, acc, accpos
