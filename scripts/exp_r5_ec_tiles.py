"""Round-5 prototype: Pallas tiled masked-max kernel for EdgeConv.

The dense broadcast-max runs at ~1.9e12 cand-ch/s (VPU envelope) but
wastes 96% of candidates (k=40 valid of P=1024 per row).  If points are
sorted by a spatial key, the kNN mask concentrates in ~20 of 64
128x128 tiles per cloud — a tile-scheduled kernel with a comparable
per-candidate rate would win ~3x.  This prototype measures the kernel's
per-candidate rate on a FULL tile grid (no schedule yet): if it lands
well under the XLA rate, the design is dead; if comparable, the
schedule supplies the 3x.

Run: python scripts/exp_r5_ec_tiles.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from dgnn_tpu.utils.timing import time_op

B, P, F = 64, 1024, 256
PT = 128  # tile edge
NEG = -1e9


def _kern(mask_ref, hs_ref, out_ref, *, nj):
    """out[i, f] = max(out, max_jj (mask[i, jj] + hs[jj, f])).

    Grid (b, rc, cc); cc==0 initializes out.  Inner loop over jj with a
    lane slice of the mask block + a sublane row of hs."""
    cc = pl.program_id(2)

    @pl.when(cc == 0)
    def _():
        out_ref[0] = jnp.full((out_ref.shape[1], out_ref.shape[2]), NEG,
                              out_ref.dtype)

    def body(jj, m):
        cand = mask_ref[0, :, jj][:, None] + hs_ref[0, jj, :][None, :]
        return jnp.maximum(m, cand)

    m = jax.lax.fori_loop(0, nj, body, out_ref[0])
    out_ref[0] = m


def pallas_tiles(mask, hs):
    grid = (B, P // PT, P // PT)
    return pl.pallas_call(
        functools.partial(_kern, nj=PT),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, PT, PT), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, PT, F), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, PT, F), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, P, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(mask, hs)


def _kern2(mask_ref, hs_ref, out_ref, *, nj):
    """Variant: 8-wide jj steps — slice [PT, 8] of mask, [8, F] of hs,
    unrolled inner 8 to amortize slice overhead."""
    cc = pl.program_id(2)

    @pl.when(cc == 0)
    def _():
        out_ref[0] = jnp.full((out_ref.shape[1], out_ref.shape[2]), NEG,
                              out_ref.dtype)

    def body(js, m):
        mk = mask_ref[0, :, pl.dslice(js * 8, 8)]   # [PT, 8]
        hsb = hs_ref[0, pl.dslice(js * 8, 8), :]    # [8, F]
        for u in range(8):
            cand = mk[:, u][:, None] + hsb[u, :][None, :]
            m = jnp.maximum(m, cand)
        return m

    m = jax.lax.fori_loop(0, nj // 8, body, out_ref[0])
    out_ref[0] = m


def pallas_tiles2(mask, hs):
    grid = (B, P // PT, P // PT)
    return pl.pallas_call(
        functools.partial(_kern2, nj=PT),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, PT, PT), lambda b, i, j: (b, i, j)),
            pl.BlockSpec((1, PT, F), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, PT, F), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, P, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(mask, hs)


def xla_ref(mask, hs):
    outs = []
    for i in range(0, F, 64):
        s = hs[..., i:i + 64]
        outs.append(jnp.max(s[:, None, :, :] + mask[:, :, :, None], axis=2))
    return jnp.concatenate(outs, -1)


def main():
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
    mk = rng.random((B, P, P)) < 40 / P
    mask = jnp.asarray(np.where(mk, 0.0, NEG).astype(np.float32))

    r_ref = jax.jit(xla_ref)(hs=hs, mask=mask)
    for tag, fn in [("xla", xla_ref), ("pallas jj-loop", pallas_tiles),
                    ("pallas 8-wide", pallas_tiles2)]:
        try:
            r = jax.jit(fn)(mask, hs) if tag != "xla" else r_ref
            err = float(jnp.max(jnp.abs(r - r_ref)))
            dt = time_op(lambda m, h, f=fn: f(m, h), mask, hs)
            print(f"{tag:16s}: {dt*1e3:7.2f} ms  "
                  f"{B*P*P*F/dt/1e9:6.0f} G cand/s  maxerr {err:.2e}",
                  flush=True)
        except Exception as ex:
            print(f"{tag:16s}: FAILED {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
