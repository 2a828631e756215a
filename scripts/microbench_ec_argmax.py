"""Isolate the true cost of the EdgeConv forward's argmax.

profile_edgeconv.py showed vjp_total >> fwd+argmax + bwd because its
"fwd+argmax" timing consumed only the max — XLA dead-code-eliminated the
argmax, hiding that the variadic (value, index) reduce is several times
slower than a plain max.  This measures every real formulation with ALL
outputs consumed:

  A. plain max only                          (the DCE'd baseline)
  B. variadic max+argmax, both consumed      (what the vjp forward runs)
  C. two plain passes: max, then first-winner index as a min-reduce of
     j + BIG * (vals < m)                    (no variadic reduce)
  D. B and C with the broadcast in bfloat16  (2x VPU throughput)

Run on TPU: python scripts/microbench_ec_argmax.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from dgnn_tpu.graph.knn import knn_mask_neg
from dgnn_tpu.utils.timing import time_op

B, P, k = 64, 1024, 40


def max_only(mask, h, fc):
    outs = []
    for i in range(0, h.shape[-1], fc):
        s = h[..., i:i + fc]
        outs.append(jnp.max(s[:, None, :, :] + mask[:, :, :, None], axis=2))
    return jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def variadic(mask, h, fc):
    ms, ks = [], []
    for i in range(0, h.shape[-1], fc):
        s = h[..., i:i + fc]
        vals = s[:, None, :, :] + mask[:, :, :, None]
        ms.append(jnp.max(vals, axis=2))
        ks.append(jnp.argmax(vals, axis=2).astype(jnp.int32))
    cat = lambda x: jnp.concatenate(x, -1) if len(x) > 1 else x[0]
    return cat(ms), cat(ks)


def twopass(mask, h, fc):
    p = mask.shape[1]
    jbig = jax.lax.broadcasted_iota(jnp.int32, (1, 1, p, 1), 2)
    ms, ks = [], []
    for i in range(0, h.shape[-1], fc):
        s = h[..., i:i + fc]
        vals = s[:, None, :, :] + mask[:, :, :, None]
        m = jnp.max(vals, axis=2)
        # first winner: min index among vals == m (recomputed vals are
        # bitwise identical, so equality is exact)
        idx = jnp.where(vals >= m[:, :, None, :], jbig, jnp.int32(1 << 20))
        ks.append(jnp.min(idx, axis=2).astype(jnp.int32))
        ms.append(m)
    cat = lambda x: jnp.concatenate(x, -1) if len(x) > 1 else x[0]
    return cat(ms), cat(ks)


def main():
    rng = np.random.default_rng(0)
    ms_ = 1e3
    h64 = jnp.asarray(rng.normal(size=(B, P, 64)).astype(np.float32))
    mask = jax.jit(lambda h: knn_mask_neg(h, k))(h64)  # bf16
    maskf = mask.astype(jnp.float32)

    for F in (64, 256):
        h = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        hb = h.astype(jnp.bfloat16)
        fc = 64
        a = time_op(lambda m, x: max_only(m, x, fc), maskf, h)
        b = time_op(lambda m, x: variadic(m, x, fc), maskf, h)
        c = time_op(lambda m, x: twopass(m, x, fc), maskf, h)
        ab = time_op(lambda m, x: max_only(m, x, fc), mask, hb)
        bb = time_op(lambda m, x: variadic(m, x, fc), mask, hb)
        cb = time_op(lambda m, x: twopass(m, x, fc), mask, hb)
        print(f"F={F}: f32 max={a*ms_:6.2f} variadic={b*ms_:6.2f} "
              f"twopass={c*ms_:6.2f} | bf16 max={ab*ms_:6.2f} "
              f"variadic={bb*ms_:6.2f} twopass={cb*ms_:6.2f}", flush=True)


if __name__ == "__main__":
    main()
