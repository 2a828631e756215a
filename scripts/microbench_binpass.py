"""Dissect the binned residual pass's effective slot rate.

profile_reddit_gat.py shows the production forward bin pass runs at
~45M slots/s while a bare fused gather does ~140M rows/s — this isolates
which component eats the difference at a Reddit-like shape:

  A. pure gather+sum over the same xcat table        (the 140M reference)
  B. gather -> einsum aggregation only               (no softmax)
  C. gather -> full online softmax + einsum          (the production pass)
  D. C with SPLIT gathers (ac from [N,H], x from [N,HF]) instead of one
     wide xcat row
  E. C without the sign-split (inference forward)

Run on TPU: python scripts/microbench_binpass.py
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

from dgnn_tpu.ops.common import NEG_INF, lane_mask, leaky_relu
from dgnn_tpu.utils.timing import time_op

N = 232_965
H, F = 4, 64
HF = H * F
W = 48
S = 100_000  # segments -> 4.8M slots


def main():
    rng = np.random.default_rng(0)
    ms = 1e3
    slots = S * W
    xcat = jnp.asarray(rng.normal(size=(N, HF + H)).astype(np.float32))
    x_tab = jnp.asarray(rng.normal(size=(N, HF)).astype(np.float32))
    ac_tab = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    ar = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, N, (S, W)).astype(np.int32))
    row = jnp.asarray(rng.integers(0, N, S).astype(np.int32))
    count = jnp.asarray(np.full(S, W - 2, np.int32))

    def a_gather_sum(xc, nb):
        return xc[nb].sum(axis=(0, 1))

    def b_gather_einsum(xc, nb, rw):
        g = xc[nb]
        x = g[..., :HF].reshape(S, W, H, F)
        w = g[..., HF:]
        return jnp.einsum("swh,swhf->shf", w, x,
                          preferred_element_type=jnp.float32)

    def c_full(xc, nb, rw, cnt):
        mask = lane_mask(cnt, W)
        g = xc[nb]
        x = g[..., :HF].reshape(S, W, H, F)
        ac_j = g[..., HF:]
        s = leaky_relu(ar[rw][:, None, :] + ac_j, 0.2)
        s = jnp.where(mask[..., None], s, NEG_INF)
        m = jnp.max(s, axis=1)
        w = jnp.where(mask[..., None], jnp.exp(s - m[:, None, :]), 0.0)
        l = jnp.sum(w, axis=1)
        acc = jnp.einsum("swh,swhf->shf", w, x,
                         preferred_element_type=jnp.float32)
        return m, l, acc

    def d_split(xt, at, nb, rw, cnt):
        mask = lane_mask(cnt, W)
        ac_j = at[nb]
        s = leaky_relu(ar[rw][:, None, :] + ac_j, 0.2)
        s = jnp.where(mask[..., None], s, NEG_INF)
        m = jnp.max(s, axis=1)
        w = jnp.where(mask[..., None], jnp.exp(s - m[:, None, :]), 0.0)
        l = jnp.sum(w, axis=1)
        x = xt[nb].reshape(S, W, H, F)
        acc = jnp.einsum("swh,swhf->shf", w, x,
                         preferred_element_type=jnp.float32)
        return m, l, acc

    def e_train(xc, nb, rw, cnt):
        m, l, acc = c_full(xc, nb, rw, cnt)
        mask = lane_mask(cnt, W)
        g = xc[nb]
        ac_j = g[..., HF:]
        s = leaky_relu(ar[rw][:, None, :] + ac_j, 0.2)
        s = jnp.where(mask[..., None], s, NEG_INF)
        pos = s >= 0
        w = jnp.where(mask[..., None], jnp.exp(s - m[:, None, :]), 0.0)
        x = g[..., :HF].reshape(S, W, H, F)
        lpos = jnp.sum(jnp.where(pos, w, 0.0), axis=1)
        accpos = jnp.einsum("swh,swhf->shf", jnp.where(pos, w, 0.0), x,
                            preferred_element_type=jnp.float32)
        return m, l, acc, lpos, accpos

    for tag, fn, args in (
            ("A gather+sum      ", a_gather_sum, (xcat, nbr)),
            ("B gather+einsum   ", b_gather_einsum, (xcat, nbr, row)),
            ("C full fwd pass   ", c_full, (xcat, nbr, row, count)),
            ("D split gathers   ", d_split, (x_tab, ac_tab, nbr, row, count)),
            ("E with sign-split ", e_train, (xcat, nbr, row, count)),
    ):
        t = time_op(fn, *args)
        print(f"{tag}: {t*ms:7.2f}ms  {slots/t/1e6:6.1f} M slots/s",
              flush=True)


if __name__ == "__main__":
    main()


def variants():
    """Follow-up: can the aggregation fuse with the gather?"""
    rng = np.random.default_rng(0)
    ms = 1e3
    slots = S * W
    xcat = jnp.asarray(rng.normal(size=(N, HF + H)).astype(np.float32))
    xcat16 = xcat.astype(jnp.bfloat16)
    nbr = jnp.asarray(rng.integers(0, N, (S, W)).astype(np.int32))
    row = jnp.asarray(rng.integers(0, N, S).astype(np.int32))
    ar = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))

    def b1_mulsum(xc, nb, rw):
        g = xc[nb]
        x = g[..., :HF].reshape(S, W, H, F).astype(jnp.float32)
        w = g[..., HF:].astype(jnp.float32)
        return jnp.sum(w[..., None] * x, axis=1)

    def b2_einsum16(xc, nb, rw):
        g = xc[nb]
        x = g[..., :HF].reshape(S, W, H, F)
        w = g[..., HF:]
        return jnp.einsum("swh,swhf->shf", w, x,
                          preferred_element_type=jnp.float32)

    def b3_mulsum16(xc, nb, rw):
        g = xc[nb]
        x = g[..., :HF].reshape(S, W, H, F)
        w = g[..., HF:]
        return jnp.sum((w[..., None] * x).astype(jnp.float32), axis=1)

    for tag, fn, args in (
            ("B1 mul+sum f32    ", b1_mulsum, (xcat, nbr, row)),
            ("B2 einsum bf16    ", b2_einsum16, (xcat16, nbr, row)),
            ("B3 mul+sum bf16   ", b3_mulsum16, (xcat16, nbr, row)),
    ):
        t = time_op(fn, *args)
        print(f"{tag}: {t*ms:7.2f}ms  {slots/t/1e6:6.1f} M slots/s",
              flush=True)
