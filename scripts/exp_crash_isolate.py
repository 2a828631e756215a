"""Isolate the TPU worker crash seen on pubmed full fwd: run each suspect
piece standalone with flushed progress prints so the crash point is exact.
Select steps via CRASH_STEPS=comma list (default all)."""

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

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.ops.gat import gat_aggregate

    steps = os.environ.get("CRASH_STEPS")
    steps = set(steps.split(",")) if steps else None

    rng = np.random.default_rng(0)
    data = load_citation_dataset("pubmed", seed=0)
    n = data.num_nodes
    g = structure.build_graph(data.src, data.dst, n, dense="auto",
                              edge_tables=False).slim()
    print("widths", g.fwd.widths, "bwd", g.bwd.widths, flush=True)

    def agg(tag, H, F, widths=None):
        gg = g
        if widths is not None:
            gg = structure.build_graph(data.src, data.dst, n, widths=widths,
                                       edge_tables=False).slim()
        ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        xf = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
        out = jax.jit(lambda a, b, c: gat_aggregate(gg, a, b, c))(ar, ac, xf)
        jax.block_until_ready(out)
        print(f"{tag}: OK sum={float(jnp.sum(out)):.3f}", flush=True)

    if steps is None or "h4" in steps:
        agg("agg H=4 F=64 (auto widths)", 4, 64)
    if steps is None or "h1" in steps:
        agg("agg H=1 F=7 (auto widths)", 1, 7)
    if steps is None or "h1w4" in steps:
        agg("agg H=1 F=7 widths=(4,)", 1, 7, widths=(4,))
    if steps is None or "h1w8" in steps:
        agg("agg H=1 F=7 widths=(8,)", 1, 7, widths=(8,))
    if steps is None or "h1w12" in steps:
        agg("agg H=1 F=7 widths=(12,)", 1, 7, widths=(12,))
    if steps is None or "model" in steps:
        from dgnn_tpu.models import GAT
        feat = jnp.asarray(data.features)
        model = GAT(num_layers=1, n_hidden=64, n_classes=data.n_classes,
                    heads=(4, 1), feat_drop=0.5, attn_drop=0.0)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), g, feat)
        out = jax.jit(lambda p, f: model.apply(p, g, f))(params, feat)
        jax.block_until_ready(out)
        print(f"full model fwd: OK sum={float(jnp.sum(out)):.3f}", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
