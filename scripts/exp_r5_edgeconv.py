"""Round-5 paired A/B on the EdgeConv dense masked-max pass.

The broadcast+reduce is pure VPU work (no MXU path exists for max), so the
levers are lane utilization and element width:
  A. current: f32 candidates, F-chunked at 64 (half the 128 lanes)
  B. bf16 candidates (h_src + mask both bf16): 2x lane throughput; max is
     order-exact in bf16, but the candidate SUM rounds to bf16 (~0.4%).
  C. f32 with j-axis blocking instead of F-chunking (full 128+ lanes on F,
     running max across j blocks).
  D. B + C combined.
Measures one fwd pass and one fwd+bwd (tie_sum) at DGCNN layer shapes.

Run: python scripts/exp_r5_edgeconv.py
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

from dgnn_tpu.utils.timing import time_op

B, P = 64, 1024
NEG = jnp.float32(-1e9)


def variants(F):
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
    # ~k/P density mask
    mk = (rng.random((B, P, P)) < 40 / P)
    mask = jnp.where(jnp.asarray(mk), 0.0, NEG).astype(jnp.float32)
    mask_bf = mask.astype(jnp.bfloat16)
    hs_bf = hs.astype(jnp.bfloat16)

    def a_current(hs, mask):
        outs = []
        for i in range(0, F, 64):
            s = hs[..., i:i + 64]
            outs.append(jnp.max(s[:, None, :, :] + mask[:, :, :, None],
                                axis=2))
        return jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]

    def b_bf16(hs32, mask):
        hs = hs32.astype(jnp.bfloat16)
        outs = []
        for i in range(0, F, 128):
            s = hs[..., i:i + 128]
            outs.append(jnp.max(s[:, None, :, :]
                                + mask_bf[:, :, :, None], axis=2))
        o = jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]
        return o.astype(jnp.float32)

    def c_jblock(hs, mask):
        JB = 256
        m = jnp.full((B, P, F), -jnp.inf, jnp.float32)
        for j in range(0, P, JB):
            cand = jnp.max(hs[:, None, j:j + JB, :]
                           + mask[:, :, j:j + JB, None], axis=2)
            m = jnp.maximum(m, cand)
        return m

    def d_bf16_jblock(hs32, mask):
        hs = hs32.astype(jnp.bfloat16)
        JB = 256
        m = jnp.full((B, P, F), jnp.bfloat16(-jnp.inf), jnp.bfloat16)
        for j in range(0, P, JB):
            cand = jnp.max(hs[:, None, j:j + JB, :]
                           + mask_bf[:, :, j:j + JB, None], axis=2)
            m = jnp.maximum(m, cand)
        return m.astype(jnp.float32)

    return hs, mask, dict(a_current=a_current, b_bf16=b_bf16,
                          c_jblock=c_jblock, d_bf16_jblock=d_bf16_jblock)


def main():
    for F in (64, 256):
        hs, mask, vs = variants(F)
        print(f"--- F={F} (fwd only) ---", flush=True)
        for tag, fn in vs.items():
            dt = time_op(fn, hs, mask)
            gops = B * P * P * F / dt / 1e9
            print(f"  {tag:14s}: {dt*1e3:7.2f} ms  {gops:6.0f} G cand/s",
                  flush=True)


if __name__ == "__main__":
    main()
