"""Clean A/B of the GAT backward pass alone: pallas bin kernels vs the XLA
formulation, cora + pubmed, interleaved in ONE process so multi-tenant
noise hits both sides equally."""

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
    print("health:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))),
          flush=True)

    import dgnn_tpu.ops.gat as gat_mod
    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    for name in ("cora", "pubmed"):
        data = load_citation_dataset(name, seed=0)
        n = data.num_nodes
        g = structure.build_graph(data.src, data.dst, n, dense="auto",
                                  edge_tables=False).slim()
        H, F = 4, 64
        ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        xf = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
        ct = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)

        def bwd_only(a, b, c_, cot):
            _, vjp = jax.vjp(lambda aa, bb, cc: gat_mod.gat_aggregate(
                g, aa, bb, cc), a, b, c_)
            outs = vjp(cot)
            return outs

        for tag, flag in (("pallas", False), ("xla", True)):
            gat_mod._NO_PALLAS_BINS = flag
            dt = time_op(bwd_only, ar, ac, xf, ct, max_wall=30)
            print(f"{name} fwd+bwd {tag}: {dt*1e6:.1f} us", flush=True)
        # second round to expose drift
        for tag, flag in (("pallas", False), ("xla", True)):
            gat_mod._NO_PALLAS_BINS = flag
            dt = time_op(bwd_only, ar, ac, xf, ct, max_wall=30)
            print(f"{name} fwd+bwd {tag} (2nd): {dt*1e6:.1f} us", flush=True)


if __name__ == "__main__":
    main()
