"""Pallas TPU kernels shared by the GAT/GMM backward passes (and GMM
forward): both stream neighbor feature rows HBM->VMEM once, like
ops/pallas/gat_forward.py, instead of the XLA gather's materialize-then-read.

- weighted_gather_accumulate: acc[s] = sum_w wgt[s,w,:] * feat[nbr[s,w]]
  (transposed SpMM dX / GMM fused SpMM; reference analogues:
  mhspmm_backward_kernel fused_gatconv_kernel.cu:712-763, fuseGmm
  fused_gmmconv_kernel.cu:24-55).  Weights arrive fully precomputed
  (recomputed attention / Gaussian, dropout and padding masks applied).

- gather_dot: g[s,w,h] = <q[s,h,:], feat[nbr[s,w]][h,:]>
  (multi-head SDDMM; reference analogue: mhsddmm, mhsddmm_kernel.cu:11-99).

Layout contract (see gat_forward.py): features as [N, SUB, 128] with SUB =
H*F/128, F % 128 == 0, SUB % 8 == 0; per-head scalars map to/from their
owning sublanes via the constant 0/1 matrix `head_sublane_map`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gat_forward import LANE, head_sublane_map

__all__ = ["weighted_gather_accumulate", "gather_dot"]

_BS = 8  # segments per grid step


def _gather_loop(nbr_ref, feat_hbm, xbuf, sem, width, bs, compute_segment):
    """Double-buffered per-segment row gather driving `compute_segment`."""

    def gather(seg, buf):
        def issue(j, _):
            pltpu.make_async_copy(
                feat_hbm.at[nbr_ref[seg, j]], xbuf.at[buf, j], sem.at[buf]
            ).start()
            return 0
        jax.lax.fori_loop(0, width, issue, 0)

    def wait(buf):
        def waitj(j, _):
            pltpu.make_async_copy(
                feat_hbm.at[0], xbuf.at[buf, j], sem.at[buf]
            ).wait()
            return 0
        jax.lax.fori_loop(0, width, waitj, 0)

    gather(0, 0)

    def body(seg, _):
        buf = jax.lax.rem(seg, 2)

        @pl.when(seg + 1 < bs)
        def _():
            gather(seg + 1, 1 - buf)

        wait(buf)
        compute_segment(seg, xbuf[buf])
        return 0

    jax.lax.fori_loop(0, bs, body, 0)


def _wga_kernel(nbr_ref, wgt_ref, r_ref, feat_hbm, acc_ref, xbuf, sem, *,
                bs, width):
    def compute(seg, x):
        wsub = jnp.dot(wgt_ref[seg], r_ref[:],
                       preferred_element_type=jnp.float32)  # [W, SUB]
        acc_ref[seg] = jnp.sum(wsub[:, :, None] * x, axis=0)  # [SUB, 128]

    _gather_loop(nbr_ref, feat_hbm, xbuf, sem, width, bs, compute)


def weighted_gather_accumulate(nbr, wgt, feat3d, *, interpret=False):
    """acc[s] = sum_w wgt[s, w, h(sublane)] * feat3d[nbr[s, w]].

    nbr: [S, W] int32; wgt: [S, W, H] f32 (invalid slots must be zero);
    feat3d: [N, SUB, 128] f32.  Returns acc [S, SUB, 128] f32.
    """
    seg, width = nbr.shape
    heads = wgt.shape[-1]
    sub = feat3d.shape[1]
    feat = sub * LANE // heads
    assert seg % _BS == 0
    rmat = jnp.asarray(head_sublane_map(heads, feat))
    kernel = functools.partial(_wga_kernel, bs=_BS, width=width)
    return pl.pallas_call(
        kernel,
        grid=(seg // _BS,),
        in_specs=[
            pl.BlockSpec((_BS, width), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BS, width, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, sub), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_BS, sub, LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((seg, sub, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, width, sub, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * seg * width * sub * LANE,
            bytes_accessed=seg * width * (sub * LANE + heads) * 4
            + seg * sub * LANE * 4,
            transcendentals=0),
        interpret=interpret,
    )(nbr, wgt, rmat, feat3d)


def _gdot_kernel(nbr_ref, q_ref, rt_ref, feat_hbm, g_ref, xbuf, sem, *,
                 bs, width):
    def compute(seg, x):
        q = q_ref[seg]  # [SUB, 128]
        t = jnp.sum(x * q[None], axis=2)  # [W, SUB] lane reduction
        # collapse each head's sublanes: [W, SUB] @ [SUB, H]
        g_ref[seg] = jnp.dot(t, rt_ref[:], preferred_element_type=jnp.float32)

    _gather_loop(nbr_ref, feat_hbm, xbuf, sem, width, bs, compute)


def gather_dot(nbr, q3d, feat3d, heads, *, interpret=False):
    """g[s, w, h] = <q3d[s], feat3d[nbr[s,w]]> restricted to head h's lanes.

    nbr: [S, W] int32; q3d: [S, SUB, 128] f32 (e.g. grad_out rows gathered by
    segment); feat3d: [N, SUB, 128] f32.  Returns g [S, W, H] f32 (padded
    slots contain garbage — caller masks).
    """
    seg, width = nbr.shape
    sub = feat3d.shape[1]
    feat = sub * LANE // heads
    assert seg % _BS == 0
    rmat_t = jnp.asarray(head_sublane_map(heads, feat).T)
    kernel = functools.partial(_gdot_kernel, bs=_BS, width=width)
    return pl.pallas_call(
        kernel,
        grid=(seg // _BS,),
        in_specs=[
            pl.BlockSpec((_BS, width), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BS, sub, LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, heads), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_BS, width, heads), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((seg, width, heads), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, width, sub, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * seg * width * sub * LANE,
            bytes_accessed=seg * width * (sub * LANE + heads) * 4
            + seg * sub * LANE * 4,
            transcendentals=0),
        interpret=interpret,
    )(nbr, q3d, rmat_t, feat3d)
