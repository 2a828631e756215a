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

Both use the 2-D "expander" formulation (see gat_forward.py) so Mosaic never
sees a lane-splitting reshape: per-head scalars [W, H] map to/from feature
lanes [W, H*F] through a constant 0/1 [H, H*F] matrix on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gat_forward import head_expander

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


def _wga_kernel(nbr_ref, wgt_ref, exp_ref, feat_hbm, acc_ref, xbuf, sem, *,
                bs, width):
    def compute(seg, x):
        wexp = jnp.dot(wgt_ref[seg], exp_ref[:],
                       preferred_element_type=jnp.float32)  # [W, HF]
        acc = jnp.sum(wexp * x, axis=0, keepdims=True)  # [1, HF]
        acc_ref[pl.ds(seg, 1), :] = acc

    _gather_loop(nbr_ref, feat_hbm, xbuf, sem, width, bs, compute)


def weighted_gather_accumulate(nbr, wgt, feat2d, *, interpret=False):
    """acc[s, :] = sum_w expand(wgt[s, w, :]) * feat2d[nbr[s, w]].

    nbr: [S, W] int32; wgt: [S, W, H] f32 (invalid slots must be zero);
    feat2d: [N, H*F] f32.  Returns acc [S, H*F] f32.
    """
    seg, width = nbr.shape
    heads = wgt.shape[-1]
    hf = feat2d.shape[-1]
    assert seg % _BS == 0
    expander = jnp.asarray(head_expander(heads, hf // heads))
    kernel = functools.partial(_wga_kernel, bs=_BS, width=width)
    return pl.pallas_call(
        kernel,
        grid=(seg // _BS,),
        in_specs=[
            pl.BlockSpec((_BS, width), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BS, width, heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, hf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_BS, hf), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((seg, hf), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, width, hf), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * seg * width * hf,
            bytes_accessed=seg * width * (hf + heads) * 4 + seg * hf * 4,
            transcendentals=0),
        interpret=interpret,
    )(nbr, wgt, expander, feat2d)


def _gdot_kernel(nbr_ref, q_ref, expt_ref, feat_hbm, g_ref, xbuf, sem, *,
                 bs, width):
    def compute(seg, x):
        q = q_ref[pl.ds(seg, 1), :]  # [1, HF]
        xq = x * q  # [W, HF]
        # sum feature lanes back per head: [W, HF] @ [HF, H]
        g = jnp.dot(xq, expt_ref[:], preferred_element_type=jnp.float32)
        g_ref[seg] = g

    _gather_loop(nbr_ref, feat_hbm, xbuf, sem, width, bs, compute)


def gather_dot(nbr, q2d, feat2d, heads, *, interpret=False):
    """g[s, w, h] = <q2d[s].reshape(H,F)[h], feat2d[nbr[s,w]].reshape(H,F)[h]>.

    nbr: [S, W] int32; q2d: [S, H*F] f32 (e.g. grad_out rows gathered by
    segment); feat2d: [N, H*F] f32.  Returns g [S, W, H] f32 (padded slots
    contain garbage — caller masks).
    """
    seg, width = nbr.shape
    hf = feat2d.shape[-1]
    assert seg % _BS == 0
    expander_t = jnp.asarray(head_expander(heads, hf // heads).T)
    kernel = functools.partial(_gdot_kernel, bs=_BS, width=width)
    return pl.pallas_call(
        kernel,
        grid=(seg // _BS,),
        in_specs=[
            pl.BlockSpec((_BS, width), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BS, hf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hf, heads), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_BS, width, heads), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((seg, width, heads), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, width, hf), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * seg * width * hf,
            bytes_accessed=seg * width * (hf + heads) * 4 + seg * hf * 4,
            transcendentals=0),
        interpret=interpret,
    )(nbr, q2d, expander_t, feat2d)
