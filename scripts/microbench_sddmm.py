"""Microbench: standalone sddmm (slot-order emit + epos gather) vs the
segment_sum-over-edge-ids formulation it replaced, at Reddit-ish scale.

VERDICT r3 item 9 deliverable: the scatter-free sddmm must be >=10x the
segment_sum version (reference anchor: mhsddmm_kernel.cu:11-99).
"""

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
    print("health:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))))

    from dgnn_tpu.data.synthetic import rmat_edges
    from dgnn_tpu.graph import structure
    from dgnn_tpu.ops.common import chunk_rows_for_budget, lane_mask, \
        scan_chunked
    from dgnn_tpu.ops.primitives import _sddmm_adj
    from dgnn_tpu.utils.timing import time_op

    scale = float(os.environ.get("SDDMM_SCALE", "0.25"))
    n = int(232_965 * scale)
    e = int(114_615_892 * scale)
    rng = np.random.default_rng(0)
    src, dst = rmat_edges(n, e, seed=1)
    g = structure.build_graph(src, dst, n, edge_tables=True)
    E = g.num_edges
    H, F = 4, 16
    lhs = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
    adj = g.fwd
    print(f"n={n} E={E} widths={adj.widths}")

    dt_new = time_op(lambda a, b: _sddmm_adj(adj, a, b, E), lhs, rhs,
                     max_wall=40)
    print(f"sddmm (slot emit + epos gather): {dt_new*1e3:.2f} ms "
          f"({E/dt_new/1e6:.0f}M edges/s)")

    def sddmm_segsum(lhs, rhs):
        out = jnp.zeros((E, H), jnp.float32)
        for width, nbr, edge, row, count in adj.bins():
            chunk = chunk_rows_for_budget(width, 2 * H * F)

            def fn(nbr_c, edge_c, row_c, count_c):
                m = lane_mask(count_c, width)
                gg = jnp.einsum("shf,swhf->swh", lhs[row_c], rhs[nbr_c],
                                preferred_element_type=jnp.float32)
                gg = jnp.where(m[..., None], gg, 0.0)
                upd = jax.ops.segment_sum(gg.reshape(-1, H),
                                          edge_c.reshape(-1),
                                          num_segments=E)
                return (), (upd,)

            _, (upd,) = scan_chunked(fn, (nbr, edge, row, count),
                                     nbr.shape[0], chunk,
                                     (jnp.zeros((E, H), jnp.float32),))
            out = out + upd
        return out

    dt_old = time_op(sddmm_segsum, lhs, rhs, max_wall=60)
    print(f"sddmm (segment_sum over edge ids): {dt_old*1e3:.2f} ms "
          f"({E/dt_old/1e6:.0f}M edges/s)")
    print(f"speedup: {dt_old/dt_new:.1f}x")


if __name__ == "__main__":
    main()
