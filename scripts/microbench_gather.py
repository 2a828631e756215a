#!/usr/bin/env python
"""Microbenchmarks for the three candidate neighbor-gather strategies on TPU.

1. XLA row gather feat[idx] for [E] indices into [N, D] (the current default
   path inside the binned einsum).
2. Pallas per-row DMA gather (measured 26M rows/s — why the framework uses
   dense hub blocks instead of DMA gathers; the kernels here are standalone).
3. Pallas in-VMEM tpu.dynamic_gather (jnp.take_along_axis on a VMEM-resident
   [C, 128] table) — candidate for a column-blocked SpMM.

Prints GB/s of *useful* gathered bytes for each.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def bench_xla_gather(n=65536, d=256, e=1 << 22):
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))

    @jax.jit
    def f(feat, idx):
        return feat[idx].sum(0)

    dt = timeit(f, feat, idx)
    gb = e * d * 4 / 1e9
    print(f"xla_row_gather: E={e} D={d}: {dt*1e3:.2f} ms -> {gb/dt:.1f} GB/s useful")


def bench_xla_gather_takealong(n=65536, d=256, e=1 << 22):
    # gather expressed as one-hot-free take along leading axis, summed by
    # segment of 128 (mimics the einsum reduction shape)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (e // 128, 128)).astype(np.int32))

    @jax.jit
    def f(feat, idx):
        return feat[idx].sum(1).sum(0)

    dt = timeit(f, feat, idx)
    gb = e * d * 4 / 1e9
    print(f"xla_row_gather_2d: E={e} D={d}: {dt*1e3:.2f} ms -> {gb/dt:.1f} GB/s useful")


# ---------------------------------------------------------------------------
# Pallas per-row DMA
# ---------------------------------------------------------------------------

def _dma_kernel(nbr_ref, feat_hbm, out_ref, xbuf, sem, *, bs, width, sub):
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
        out_ref[seg] = jnp.sum(xbuf[buf], axis=0)
        return 0

    jax.lax.fori_loop(0, bs, body, 0)


def bench_dma_gather(n=65536, sub=8, e=1 << 20, width=64):
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(n, sub, 128)).astype(np.float32))
    seg = e // width
    bs = 8
    nbr = jnp.asarray(rng.integers(0, n, (seg, width)).astype(np.int32))

    kern = functools.partial(_dma_kernel, bs=bs, width=width, sub=sub)

    @jax.jit
    def f(nbr, feat):
        return pl.pallas_call(
            kern,
            grid=(seg // bs,),
            in_specs=[
                pl.BlockSpec((bs, width), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((bs, sub, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((seg, sub, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, width, sub, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(nbr, feat)

    dt = timeit(f, nbr, feat)
    gb = e * sub * 128 * 4 / 1e9
    print(f"pallas_row_dma: E={e} D={sub*128} W={width}: {dt*1e3:.2f} ms -> "
          f"{gb/dt:.1f} GB/s useful ({e/dt/1e6:.1f} M DMAs/s)")


# ---------------------------------------------------------------------------
# Pallas in-VMEM dynamic_gather
# ---------------------------------------------------------------------------

def _dg_kernel(idx_ref, tab_ref, out_ref, *, nlane):
    # idx [C, 128] broadcast indices; tab [C, 128*k] table; gather rows
    idx = idx_ref[...]
    acc = jnp.zeros_like(out_ref)
    for k in range(nlane):
        t = tab_ref[:, k * 128:(k + 1) * 128]
        g = jnp.take_along_axis(t, idx, axis=0)
        acc = acc.at[:, k * 128:(k + 1) * 128].set(g) if False else acc
        out_ref[:, k * 128:(k + 1) * 128] = g


def bench_vmem_dynamic_gather(c=2048, nlane=2, iters_inner=16):
    # table [c, nlane*128] resident in VMEM; gather c rows per call,
    # repeated iters_inner times per kernel launch via grid.
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(c, nlane * 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, c, (iters_inner * c, 128)).astype(np.int32))

    kern = functools.partial(_dg_kernel, nlane=nlane)

    @jax.jit
    def f(idx, tab):
        return pl.pallas_call(
            kern,
            grid=(iters_inner,),
            in_specs=[
                pl.BlockSpec((c, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, nlane * 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((c, nlane * 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((iters_inner * c, nlane * 128),
                                           jnp.float32),
        )(idx, tab)

    try:
        dt = timeit(f, idx, tab)
    except Exception as ex:
        print(f"vmem_dynamic_gather C={c}: FAILED: {type(ex).__name__}: {str(ex)[:200]}")
        return
    e = iters_inner * c
    gb = e * nlane * 128 * 4 / 1e9
    print(f"vmem_dynamic_gather: E={e} D={nlane*128} C={c}: {dt*1e3:.3f} ms -> "
          f"{gb/dt:.1f} GB/s useful ({e/dt/1e6:.1f} M rows/s)")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    bench_xla_gather()
    bench_xla_gather_takealong()
    for width in (32, 64, 256):
        bench_dma_gather(width=width)
    bench_dma_gather(sub=2, width=64)   # the H*F=256 shape (padded tiles)
    for c in (512, 1024, 2048, 4096):
        bench_vmem_dynamic_gather(c=c)
