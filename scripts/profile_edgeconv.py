"""Per-component timing of the DGCNN training step at the benchmark config
(B=64, P=1024, k=40) — finds where the 165 ms/step goes.

Run on TPU: python scripts/profile_edgeconv.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".bench_cache",
                      "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dgnn_tpu.graph.knn import knn_mask_neg
from dgnn_tpu.ops.edgeconv import edge_conv_max_dense
from dgnn_tpu.utils.timing import fetch_scalar


def timeit(fn, *args, iters=20):
    out = fn(*args)
    fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_scalar(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    B, P, k = 64, 1024, 40
    x3 = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))

    for F in (64, 128, 256):
        h = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        mask = jax.jit(lambda h: knn_mask_neg(h, k))(h)

        t_knn = timeit(jax.jit(lambda h: knn_mask_neg(h, k)), h)
        t_knn_exact = timeit(jax.jit(lambda h: knn_mask_neg(h, k, exact=True)),
                             h)
        t_fwd = timeit(jax.jit(lambda m, a, b: edge_conv_max_dense(m, a, b)),
                       mask, h, h)

        def train(m, a, b, g):
            out, vjp = jax.vjp(lambda a, b: edge_conv_max_dense(m, a, b), a, b)
            return vjp(g)

        t_full = timeit(jax.jit(train), mask, h, h, g)
        print(f"F={F}: knn_bisect={t_knn*1e3:6.1f}ms knn_exact="
              f"{t_knn_exact*1e3:6.1f}ms fwd={t_fwd*1e3:6.1f}ms "
              f"fwd+bwd={t_full*1e3:6.1f}ms", flush=True)


if __name__ == "__main__":
    main()
