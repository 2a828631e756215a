"""Microbenchmark: dense hub-block masked-softmax aggregation (prototype).

Sizes the dense/MXU path for Reddit-scale hub rows before building it into
ops/: a [R, C] bit-masked block processed flash-attention style (per-head
[Rt, Ct] score tiles on the VPU, [Rt, Ct] @ [Ct, F] aggregation on the MXU)
should replace rate-bound per-edge gathers (~13ns/row) for high-degree rows.

Run on TPU: python scripts/microbench_dense.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dgnn_tpu.utils.timing import time_fn

NEG = jnp.float32(-1e30)


def make_inputs(R, C, H, F, density, seed=0, mat_dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    ar = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32))
    ac = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(C, H, F)).astype(np.float32)).astype(mat_dtype)
    bits = rng.random((R, C)) < density
    mask = jnp.asarray(np.packbits(bits, axis=1))  # [R, C//8] uint8
    return ar, ac, x, mask


def dense_fwd(ar, ac, x, mask_bits, Rt, Ct, slope=0.2, mat_dtype=jnp.bfloat16):
    R, H = ar.shape
    C = ac.shape[0]
    F = x.shape[-1]
    n_rt = R // Rt
    n_ct = C // Ct
    x2 = x.reshape(C, H * F)

    def row_chunk(_, r):
        ar_c = jax.lax.dynamic_slice_in_dim(ar, r * Rt, Rt, 0)  # [Rt, H]
        mb_c = jax.lax.dynamic_slice_in_dim(mask_bits, r * Rt, Rt, 0)

        def col_tile(carry, t):
            m, l, lpos, acc, accpos = carry
            ac_t = jax.lax.dynamic_slice_in_dim(ac, t * Ct, Ct, 0)  # [Ct, H]
            x_t = jax.lax.dynamic_slice_in_dim(x2, t * Ct, Ct, 0)  # [Ct, HF]
            mb_t = jax.lax.dynamic_slice_in_dim(mb_c, t * (Ct // 8), Ct // 8, 1)
            # unpack bits -> [Rt, Ct] bool
            shifts = jnp.arange(8, dtype=jnp.uint8)[None, None, :]
            m_u = ((mb_t[:, :, None] >> (7 - shifts)) & 1).astype(jnp.bool_)
            mask = m_u.reshape(Rt, Ct)
            p_h, ppos_h, m_new_h, l_h, lpos_h = [], [], [], [], []
            for h in range(H):
                s = ar_c[:, h][:, None] + ac_t[:, h][None, :]  # [Rt, Ct]
                s = jnp.where(s >= 0, s, s * slope)
                s = jnp.where(mask, s, NEG)
                m_new = jnp.maximum(m[:, h], jnp.max(s, axis=1))
                p = jnp.exp(s - m_new[:, None])
                p = jnp.where(mask, p, 0.0)
                ppos = jnp.where(s >= 0, p, 0.0)
                p_h.append(p)
                ppos_h.append(ppos)
                m_new_h.append(m_new)
                l_h.append(jnp.sum(p, axis=1))
                lpos_h.append(jnp.sum(ppos, axis=1))
            m_new = jnp.stack(m_new_h, 1)  # [Rt, H]
            resc = jnp.exp(m - m_new)
            l = l * resc + jnp.stack(l_h, 1)
            lpos = lpos * resc + jnp.stack(lpos_h, 1)
            # aggregation on MXU: per head [Rt, Ct] @ [Ct, F]
            upd = jnp.stack(
                [jnp.dot(p_h[h].astype(mat_dtype),
                         x_t[:, h * F:(h + 1) * F],
                         preferred_element_type=jnp.float32)
                 for h in range(H)], 1)  # [Rt, H, F]
            updpos = jnp.stack(
                [jnp.dot(ppos_h[h].astype(mat_dtype),
                         x_t[:, h * F:(h + 1) * F],
                         preferred_element_type=jnp.float32)
                 for h in range(H)], 1)
            acc = acc * resc[..., None] + upd
            accpos = accpos * resc[..., None] + updpos
            return (m_new, l, lpos, acc, accpos), None

        init = (jnp.full((Rt, H), NEG), jnp.zeros((Rt, H)),
                jnp.zeros((Rt, H)), jnp.zeros((Rt, H, F)),
                jnp.zeros((Rt, H, F)))
        (m, l, lpos, acc, accpos), _ = jax.lax.scan(
            col_tile, init, jnp.arange(n_ct))
        return None, (m, l, lpos, acc, accpos)

    _, outs = jax.lax.scan(row_chunk, None, jnp.arange(n_rt))
    return jax.tree.map(lambda o: o.reshape((R,) + o.shape[2:]), outs)


def main():
    H, F = 4, 64
    R = C = 32768
    density = 0.025
    for mat_dtype in (jnp.bfloat16,):
        ar, ac, x, mask = make_inputs(R, C, H, F, density, mat_dtype=mat_dtype)
        for (Rt, Ct) in ((256, 2048), (512, 4096)):
            fn = jax.jit(lambda a, b, c, d, Rt=Rt, Ct=Ct,
                         md=mat_dtype: dense_fwd(a, b, c, d, Rt, Ct,
                                                 mat_dtype=md))
            t0 = time.time()
            out = fn(ar, ac, x, mask)
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            dt = time_fn(fn, ar, ac, x, mask, iters=5, warmup=2)
            pairs = R * C
            edges = pairs * density
            print(f"dtype={mat_dtype.__name__} Rt={Rt} Ct={Ct}: {dt*1e3:.1f} ms "
                  f"({pairs/dt/1e9:.1f} Gpair/s, {edges/dt/1e6:.0f} Medge/s, "
                  f"equiv-gather-rate x{edges/dt/75e6:.1f}) compile {compile_s:.0f}s",
                  flush=True)


if __name__ == "__main__":
    main()
