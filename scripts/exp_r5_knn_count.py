"""Round-5: cheaper kNN threshold search.

The bisection count pass (sum(d2 <= mid)) measures ~415 GB/s — 4x under
stream — and each pass buys ONE interval halving.  A 16-ary search pass
compares d2 against 15 per-row thresholds in one read (4 halvings per
pass).  Measures plain vs 16-ary pass cost and the resulting drift.

Run: python scripts/exp_r5_knn_count.py
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
NARY = 16


def plain_pass(d2, lo, hi):
    mid = 0.5 * (lo + hi)
    cnt = jnp.sum(d2 <= mid[..., None], axis=-1)
    small = cnt < 40
    return jnp.where(small, mid, lo), jnp.where(small, hi, mid)


def nary_pass(d2, lo, hi, k=40):
    """One pass over d2 refines [lo, hi] by NARY (log2(NARY) halvings)."""
    t = jnp.arange(1, NARY, dtype=jnp.float32) / NARY          # [NARY-1]
    mids = lo[..., None] + (hi - lo)[..., None] * t            # [B, P, 15]
    cnt = jnp.sum(d2[:, :, :, None] <= mids[:, :, None, :],
                  axis=2)                                      # [B, P, 15]
    # bracket: largest mid with cnt < k -> new lo; smallest with cnt >= k
    ge = cnt >= k                                              # [B, P, 15]
    # first index where ge (or NARY-1 if none)
    first = jnp.argmax(ge, axis=-1)
    any_ge = jnp.any(ge, axis=-1)
    idx_hi = jnp.where(any_ge, first, NARY - 2)
    new_hi = jnp.where(any_ge,
                       jnp.take_along_axis(mids, idx_hi[..., None],
                                           -1)[..., 0], hi)
    idx_lo = idx_hi - 1
    new_lo = jnp.where(idx_lo >= 0,
                       jnp.take_along_axis(mids,
                                           jnp.maximum(idx_lo, 0)[..., None],
                                           -1)[..., 0], lo)
    return new_lo, new_hi


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, P, 64)).astype(np.float32))
    sq = jnp.sum(x * x, axis=-1)
    inner = jnp.einsum("bpd,bqd->bpq", x, x,
                       preferred_element_type=jnp.float32)
    d2 = sq[:, None, :] - 2.0 * inner
    d2b = d2.astype(jnp.bfloat16)
    lo = jnp.min(d2, axis=-1)
    hi = jnp.max(d2, axis=-1)

    dt = time_op(lambda d, l, h: plain_pass(d, l, h)[1], d2, lo, hi)
    print(f"plain f32 pass : {dt*1e3:7.3f} ms", flush=True)
    dt = time_op(lambda d, l, h: plain_pass(d, l, h)[1],
                 d2b, lo, hi)
    print(f"plain bf16 pass: {dt*1e3:7.3f} ms", flush=True)
    dt = time_op(lambda d, l, h: nary_pass(d, l, h)[1], d2, lo, hi)
    print(f"16-ary f32 pass: {dt*1e3:7.3f} ms", flush=True)
    dt = time_op(lambda d, l, h: nary_pass(d.astype(jnp.float32), l, h)[1],
                 d2b, lo, hi)
    print(f"16-ary bf16 in : {dt*1e3:7.3f} ms", flush=True)

    # drift check vs exact on CPU-equivalent logic (device fine too)
    def thresh_nary(d2f, passes):
        l, h = jnp.min(d2f, -1), jnp.max(d2f, -1)
        for _ in range(passes):
            l, h = nary_pass(d2f, l, h)
        return h

    from jax.lax import top_k
    kth = -top_k(-d2, 40)[0][..., -1]
    for passes in (2, 3):
        h = jax.jit(thresh_nary, static_argnums=1)(d2, passes)
        m = d2 <= h[..., None]
        extra = np.asarray(m.sum(-1)) - 40
        m_ex = np.asarray(d2 <= kth[..., None])
        sup = bool(np.all(np.asarray(m) | m_ex == np.asarray(m)))
        print(f"16-ary x{passes} f32: mean extra {extra.mean():.2f} "
              f"max {extra.max()} superset={sup}", flush=True)


if __name__ == "__main__":
    main()
