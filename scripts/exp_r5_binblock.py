"""Round-5: bin-kernel block-size + layout sweep on the pubmed W=8 pass.

The fused bin kernel re-reads its gathered [W, S, C] block at ~450 GB/s
effective (single-trace profile) vs the chip's ~1.7 TB/s stream — suspects
are the 4MB block depth (tuned on the previous chip) and the [W, S, C]
middle-dim stride.  Paired in one run: the production pass at several
_BLOCK_BYTES settings, the bare gather floor, and a kernel-only re-read
of a pre-gathered block.

Run: python scripts/exp_r5_binblock.py
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
from dgnn_tpu.ops import pallas_bins as pb


def main():
    rng = np.random.default_rng(0)
    n = 19717
    H, F = 4, 64
    C = H * F + H
    W = 8
    S = 92736  # pubmed W=8 bin, padded
    xcat = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, n, (S, W)).astype(np.int32))
    ar = jnp.asarray(rng.normal(size=(S, H)).astype(np.float32))
    count = jnp.asarray(np.full(S, W - 1, np.int32))

    dt = time_op(lambda xc, nb: jnp.sum(xc[nb.T]), xcat, nbr)
    print(f"bare gather+reduce    : {dt*1e3:7.3f} ms "
          f"({S*W/dt/1e6:.0f} M rows/s)", flush=True)
    dt = time_op(lambda xc, nb: xc[nb.T], xcat, nbr)
    print(f"bare gather materialzd: {dt*1e3:7.3f} ms "
          f"({S*W/dt/1e6:.0f} M rows/s)", flush=True)

    g_t = jax.jit(lambda xc, nb: xc[nb.T])(xcat, nbr)

    for bb in (2 << 20, 4 << 20, 8 << 20, 16 << 20, 32 << 20):
        pb._BLOCK_BYTES = bb
        sb = pb.seg_block(W, C, 4, num_segs=S)
        pad = (-S) % sb
        g_p = jnp.pad(g_t, ((0, 0), (0, pad), (0, 0)))
        ar_p = jnp.pad(ar, ((0, pad), (0, 0)))
        cnt_p = jnp.pad(count, (0, pad))

        def kern_only(g_p, ar_p, cnt_p):
            m, l, lp, acc, accp = pb.bin_gat_fwd(
                g_p, ar_p, cnt_p, H=H, F=F, slope=0.2, with_pos=False)
            return acc

        dt = time_op(kern_only, g_p, ar_p, cnt_p)
        mb = (S + pad) * W * C * 4 / 1e6
        print(f"kernel-only bb={bb>>20:3d}MB sb={sb:5d}: {dt*1e3:7.3f} ms "
              f"({mb/1e3/dt:5.2f} TB/s read)", flush=True)

        def full_pass(xc, nb, ar_p, cnt_p):
            g = xc[nb.T]
            g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
            m, l, lp, acc, accp = pb.bin_gat_fwd(
                g, ar_p, cnt_p, H=H, F=F, slope=0.2, with_pos=False)
            return acc

        dt = time_op(full_pass, xcat, nbr, ar_p, cnt_p)
        print(f"   full pass            : {dt*1e3:7.3f} ms", flush=True)
    pb._BLOCK_BYTES = 4 << 20


if __name__ == "__main__":
    main()
