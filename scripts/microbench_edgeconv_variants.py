"""Variant sweep for the dense masked-max conv: dtype, chunking, and
backward formulations.  Run on TPU.
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


def masked_max(mask, h, fc):
    outs = []
    for i in range(0, h.shape[-1], fc):
        s = h[..., i:i + fc]
        outs.append(jnp.max(s[:, None, :, :] + mask[:, :, :, None], axis=2))
    return jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def masked_max_argmax(mask, h, fc):
    ms, ks = [], []
    for i in range(0, h.shape[-1], fc):
        s = h[..., i:i + fc]
        vals = s[:, None, :, :] + mask[:, :, :, None]
        ms.append(jnp.max(vals, axis=2))
        ks.append(jnp.argmax(vals, axis=2).astype(jnp.int32))
    cat = lambda x: jnp.concatenate(x, -1) if len(x) > 1 else x[0]
    return cat(ms), cat(ks)


def bwd_ind(kstar, g, fc):
    p = kstar.shape[1]
    jidx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, p, 1), 2)
    outs = []
    for i in range(0, kstar.shape[-1], fc):
        kc = kstar[..., i:i + fc]
        gc = g[..., i:i + fc]
        ind = kc[:, :, None, :] == jidx
        outs.append(jnp.sum(jnp.where(ind, gc[:, :, None, :], 0.0), axis=1))
    return jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def bwd_ind_T(kstar, g, fc):
    """Transpose so the reduction is over axis 2 like the forward:
    d_src[b,j,f] = sum_i ...; build [B, P_j, P_i, Fc] with j in axis 1."""
    p = kstar.shape[1]
    jidx = jax.lax.broadcasted_iota(jnp.int32, (1, p, 1, 1), 1)
    outs = []
    for i in range(0, kstar.shape[-1], fc):
        kc = kstar[..., i:i + fc]          # [B, P_i, Fc]
        gc = g[..., i:i + fc]
        ind = kc[:, None, :, :] == jidx    # [B, P_j, P_i, Fc]
        outs.append(jnp.sum(jnp.where(ind, gc[:, None, :, :], 0.0), axis=2))
    return jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def bwd_dot(kstar, g, fc):
    """ind * g summed via multiply instead of where."""
    p = kstar.shape[1]
    jidx = jax.lax.broadcasted_iota(jnp.int32, (1, p, 1, 1), 1)
    outs = []
    for i in range(0, kstar.shape[-1], fc):
        kc = kstar[..., i:i + fc]
        gc = g[..., i:i + fc]
        ind = (kc[:, None, :, :] == jidx).astype(g.dtype)
        outs.append(jnp.sum(ind * gc[:, None, :, :], axis=2))
    return jnp.concatenate(outs, -1) if len(outs) > 1 else outs[0]


def main():
    rng = np.random.default_rng(0)
    ms = 1e3
    h64 = jnp.asarray(rng.normal(size=(B, P, 64)).astype(np.float32))
    mask = jax.jit(lambda h: knn_mask_neg(h, k))(h64)  # bf16
    mask_f32 = mask.astype(jnp.float32)

    for F in (64, 256):
        h = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        hb = h.astype(jnp.bfloat16)
        gb = g.astype(jnp.bfloat16)
        kstar = jax.jit(lambda m, a: masked_max_argmax(m, a, 64))(mask, h)[1]

        print(f"--- F={F} ---", flush=True)
        for fc in (32, 64, 128):
            if fc > F:
                continue
            t1 = time_op(lambda m, a: masked_max(m, a, fc), mask, h)
            t1b = time_op(lambda m, a: masked_max(m, a, fc), mask, hb)
            t2 = time_op(lambda m, a: masked_max_argmax(m, a, fc)[0], mask, h)
            t2b = time_op(lambda m, a: masked_max_argmax(m, a, fc)[0], mask, hb)
            print(f"fc={fc}: fwd f32={t1*ms:6.2f} bf16={t1b*ms:6.2f} | "
                  f"fwd+arg f32={t2*ms:6.2f} bf16={t2b*ms:6.2f}", flush=True)
        for fc in (32, 64, 128):
            if fc > F:
                continue
            t3 = time_op(lambda ks, gg: bwd_ind(ks, gg, fc), kstar, g)
            t4 = time_op(lambda ks, gg: bwd_ind_T(ks, gg, fc), kstar, g)
            t5 = time_op(lambda ks, gg: bwd_dot(ks, gg, fc), kstar, g)
            t5b = time_op(lambda ks, gg: bwd_dot(ks, gg, fc), kstar, gb)
            print(f"fc={fc}: bwd ind={t3*ms:6.2f} indT={t4*ms:6.2f} "
                  f"dot={t5*ms:6.2f} dot_bf16={t5b*ms:6.2f}", flush=True)
        # f32 mask variant (is the bf16 mask broadcast hurting?)
        t6 = time_op(lambda m, a: masked_max(m, a, 64), mask_f32, h)
        print(f"fwd f32mask={t6*ms:6.2f}", flush=True)


if __name__ == "__main__":
    main()
