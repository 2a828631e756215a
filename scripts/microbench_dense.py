"""Microbenchmark: the tile-sparse dense hub Pallas kernels
(ops/pallas_dense.py).

Measures masked-pairs/s of the GAT forward/backward and GMM forward/backward
kernels on a synthetic 65536^2 block at Reddit-hub density (~3%), processed
through the scalar-prefetched tile schedule exactly as production does
(full-rectangle schedule: 8192 tiles of [256, 2048]).  The measured rate
calibrates graph/hub.py's cost model (DENSE_PAIRS_PER_S).
Run on TPU:  python scripts/microbench_dense.py

Context: XLA row gathers are rate-bound at ~140M rows/s on this chip, so the
kernel's measured ~43G pairs/s means any subgraph denser than ~0.2% is
faster dense than gathered (docs/PERF_NOTES.md).  An equivalent XLA
scan-of-tiles implementation measured 5.6G pairs/s and took 210s to trace.
"""
import os
import sys
import time
import typing

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".bench_cache",
                      "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dgnn_tpu.graph.hub import DENSE_RT, DensePlan
from dgnn_tpu.ops.pallas_dense import (DENSE_CT, dense_gat_bwd,
                                       dense_gat_fwd, dense_gmm_bwd,
                                       dense_gmm_fwd)
from dgnn_tpu.utils.timing import fetch_scalar


class _DB(typing.NamedTuple):
    """Minimal DenseBlock stand-in (a pytree: jit ARGUMENT, never a closure
    — a closed-over mask becomes a 0.5 GB compile-time constant that the
    tunnelled compile service rejects)."""

    mask: jax.Array
    rc: jax.Array
    ct: jax.Array
    first: jax.Array
    rc_h: jax.Array
    ct_h: jax.Array
    first_h: jax.Array
    mt_h: jax.Array


def make_db(bits_rows_by_cols, R, C):
    nrc, nct = R // DENSE_RT, C // DENSE_CT
    mask = np.ascontiguousarray(
        bits_rows_by_cols.reshape(nrc, DENSE_RT, nct, DENSE_CT // 8)
        .transpose(0, 2, 1, 3)
        .reshape(nrc * nct, DENSE_RT, DENSE_CT // 8))
    rc = np.repeat(np.arange(nrc), nct).astype(np.int32)
    ct = np.tile(np.arange(nct), nrc).astype(np.int32)
    first = np.ones(nrc * nct, np.int32)
    first[1:] = (rc[1:] != rc[:-1]).astype(np.int32)
    plan = DensePlan(row_ids=None, col_ids=None, mask=mask,
                     rc=rc, ct=ct, first=first, num_rows=R)
    rc_h, ct_h, first_h, mt_h = plan.half_schedule()
    return _DB(jnp.asarray(mask), jnp.asarray(rc), jnp.asarray(ct),
               jnp.asarray(first), jnp.asarray(rc_h), jnp.asarray(ct_h),
               jnp.asarray(first_h), jnp.asarray(mt_h))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    fetch_scalar(out)  # first call: upload + warm
    out = fn(*args)
    fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_scalar(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    R = C = 65536
    H, F = 4, 64
    # ~3% density cheaply: AND of 5 random byte planes
    b = rng.integers(0, 256, (R, C // 8), dtype=np.uint8)
    for _ in range(4):
        b &= rng.integers(0, 256, (R, C // 8), dtype=np.uint8)
    density = np.unpackbits(b[:256]).mean()
    db = make_db(b, R, C)
    E = R * C * density

    def report(tag, dt):
        print(f"{tag}: {dt*1e3:7.1f} ms  {R*C/dt/1e9:5.0f} Gpair/s  "
              f"{E/dt/1e6:5.0f} Medge/s (x{E/dt/75e6:.0f} vs gather wall)",
              flush=True)

    ar = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32))
    ac = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(C, H * F)).astype(np.float32))
    fn = jax.jit(lambda db, *a: dense_gat_fwd(db, *a, slope=0.2))
    report("gat fwd (train, sign-split)", timeit(fn, db, ar, ac, x))
    fni = jax.jit(lambda db, *a: dense_gat_fwd(db, *a, slope=0.2,
                                               with_pos=False))
    report("gat fwd (inference)       ", timeit(fni, db, ar, ac, x))

    g = jnp.asarray(rng.normal(size=(C, H * F)).astype(np.float32))
    st = jnp.asarray(np.abs(rng.normal(size=(C, 4 * H))).astype(np.float32)
                     + 0.5)
    fnb = jax.jit(lambda db, *a: dense_gat_bwd(db, *a, slope=0.2, H=H))
    report("gat bwd (dX + d attn_col) ", timeit(fnb, db, ac, x, g, st))

    K, D = 2, 2
    beta = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32))
    alpha = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    xg = jnp.asarray(rng.normal(size=(C, K * F)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))
    isig = jnp.ones((K, D), jnp.float32)
    fg = jax.jit(lambda db, *a: dense_gmm_fwd(db, *a, use_tanh=True))
    report("gmm fwd                   ", timeit(fg, db, beta, alpha, xg,
                                                mu, isig))
    gg = jnp.asarray(rng.normal(size=(C, K * F)).astype(np.float32))
    df = jnp.asarray(rng.normal(size=(C, 1)).astype(np.float32))
    fb = jax.jit(lambda db, *a: dense_gmm_bwd(db, *a, use_tanh=True))
    report("gmm bwd (+param stats)    ", timeit(fb, db, alpha, beta, xg,
                                                gg, df, mu, isig))


if __name__ == "__main__":
    main()
