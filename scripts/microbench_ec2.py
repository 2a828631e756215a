"""Final-variant check: transposed-multiply bwd with f32 accumulation, and
bf16-d2 knn bisection.  Run on TPU."""
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


def bwd_dot(kstar, g, fc, mdtype, acc32):
    p = kstar.shape[1]
    jidx = jax.lax.broadcasted_iota(jnp.int32, (1, p, 1, 1), 1)
    outs = []
    for i in range(0, kstar.shape[-1], fc):
        kc = kstar[..., i:i + fc]
        gc = g[..., i:i + fc].astype(mdtype)
        ind = (kc[:, None, :, :] == jidx).astype(mdtype)
        prod = ind * gc[:, None, :, :]
        outs.append(jnp.sum(prod, axis=2, dtype=jnp.float32) if acc32
                    else jnp.sum(prod, axis=2))
    return jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def knn_bf16(x, kk, iters=8):
    sq = jnp.sum(x * x, axis=-1)
    inner = jnp.einsum("bpd,bqd->bpq", x, x,
                       preferred_element_type=jnp.float32)
    d2 = (sq[:, None, :] - 2.0 * inner).astype(jnp.bfloat16)
    lo = jnp.min(d2, axis=-1).astype(jnp.float32)
    hi = jnp.max(d2, axis=-1).astype(jnp.float32)

    def body(_, loh):
        lo, hi = loh
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(d2 <= mid[..., None].astype(jnp.bfloat16), axis=-1)
        small = cnt < kk
        return jnp.where(small, mid, lo), jnp.where(small, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return jnp.where(d2 <= hi[..., None].astype(jnp.bfloat16), 0.0,
                     -1e30).astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    ms = 1e3
    h64 = jnp.asarray(rng.normal(size=(B, P, 64)).astype(np.float32))
    mask = jax.jit(lambda h: knn_mask_neg(h, k))(h64)

    for F in (64, 128, 256):
        g = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        h = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        from dgnn_tpu.ops.edgeconv import _masked_max_argmax
        kstar = jax.jit(_masked_max_argmax)(mask, h)[1]
        for fc in (32, 64):
            ta = time_op(lambda ks, gg: bwd_dot(ks, gg, fc, jnp.bfloat16,
                                                True), kstar, g)
            tb = time_op(lambda ks, gg: bwd_dot(ks, gg, fc, jnp.float32,
                                                True), kstar, g)
            print(f"F={F} fc={fc}: dotT bf16+f32acc={ta*ms:6.2f} "
                  f"f32={tb*ms:6.2f}", flush=True)

    for Fin in (3, 64, 128):
        h = jnp.asarray(rng.normal(size=(B, P, Fin)).astype(np.float32))
        t1 = time_op(lambda x: knn_mask_neg(x, k), h)
        t2 = time_op(lambda x: knn_bf16(x, k), h)
        print(f"knn Fin={Fin}: f32={t1*ms:6.2f} bf16d2={t2*ms:6.2f}",
              flush=True)


if __name__ == "__main__":
    main()
