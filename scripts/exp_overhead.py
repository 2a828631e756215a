"""Measure the fixed op-overhead floor of gat_aggregate: time it on a tiny
graph (negligible data) while varying structure — with/without scan chunking,
with/without combine, then time primitive op sequences to find the per-kernel
launch cost on this device."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "xla_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    x = jnp.ones((128, 128))
    print("health:", float(jnp.sum(x @ x)))

    from dgnn_tpu.graph import structure
    from dgnn_tpu.ops.gat import gat_aggregate
    from dgnn_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)

    # tiny graph: 64 nodes, 256 edges
    n, e = 64, 256
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = structure.build_graph(src, dst, n, widths=(8,), edge_tables=False)
    H, F = 4, 64
    ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    xf = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
    dt = time_op(lambda a, b, c_, g_: gat_aggregate(g_, a, b, c_),
                 ar, ac, xf, g.slim(), max_wall=25)
    print(f"aggregate tiny(64n/256e) 1 bin: {dt*1e6:.1f} us   <- fixed floor")

    g2 = structure.build_graph(src, dst, n, widths=(4, 8), edge_tables=False)
    dt = time_op(lambda a, b, c_, g_: gat_aggregate(g_, a, b, c_),
                 ar, ac, xf, g2.slim(), max_wall=25)
    print(f"aggregate tiny 2 bins: {dt*1e6:.1f} us")

    # primitive sequences: k dependent gathers of 16k rows x 260 cols
    tbl = jnp.asarray(rng.normal(size=(4096, 260)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 4096, 17280), jnp.int32)

    def chain(k):
        def f(t, i):
            acc = t
            for _ in range(k):
                acc = acc + t[i[:4096] % 4096].sum(0) * 1e-30
            return acc[0, 0]
        return f

    for k in (1, 2, 4, 8):
        dt = time_op(chain(k), tbl, idx, max_wall=20)
        print(f"{k} dependent 4k-row gathers: {dt*1e6:.1f} us "
              f"({dt*1e6/k:.1f} us each)")

    # a lax.scan of 1 iteration over a gather
    def with_scan(t, i):
        def body(c, _):
            return c + t[i[:4096] % 4096].sum(0) * 1e-30, ()
        out, _ = jax.lax.scan(body, t, None, length=1)
        return out[0, 0]

    dt = time_op(with_scan, tbl, idx, max_wall=20)
    print(f"1-iter scan gather: {dt*1e6:.1f} us")

    def no_scan(t, i):
        return (t + t[i[:4096] % 4096].sum(0) * 1e-30)[0, 0]

    dt = time_op(no_scan, tbl, idx, max_wall=20)
    print(f"same, no scan: {dt*1e6:.1f} us")


if __name__ == "__main__":
    main()
