"""Experiment: where does small-graph (cora) GAT inference time go?

Times on the real TPU: full 2-layer forward, the dense projections alone,
and single gat_aggregate passes at each layer's shape, plus binned-layout
variants (different widths) to locate fixed per-pass overhead vs slot cost.
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

    # health check
    x = jnp.ones((128, 128))
    print("health:", float(jnp.sum(x @ x)), "backend:", jax.default_backend())

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.models import GAT
    from dgnn_tpu.ops.gat import gat_aggregate
    from dgnn_tpu.utils import time_epoch_loop
    from dgnn_tpu.utils.timing import time_op

    data = load_citation_dataset("cora", seed=0)
    feat = jnp.asarray(data.features)
    n = data.num_nodes
    ncls = data.n_classes

    def build(widths=None, dense="auto"):
        kw = {}
        if widths is not None:
            kw["widths"] = widths
        return structure.build_graph(data.src, data.dst, n, dense=dense,
                                     edge_tables=False, **kw)

    g_auto = build()
    print("auto widths:", g_auto.fwd.widths,
          "slots:", [x.size for x in g_auto.fwd.nbr],
          "segs:", [x.size for x in g_auto.fwd.row])

    model = GAT(num_layers=1, n_hidden=64, n_classes=ncls, heads=(4, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), g_auto.slim(), feat)

    def time_model(graph):
        graph = graph.slim()

        def infer_step(c, _k, cs):
            graph, feat = cs
            return model.apply(params, graph, feat + c * 1e-30)[0, 0]

        dt, _ = time_epoch_loop(infer_step, jnp.float32(0), jax.random.PRNGKey(0),
                                200, warmup=2, consts=(graph, feat),
                                max_wall=40)
        return dt

    print(f"full fwd (auto): {time_model(g_auto)*1e6:.1f} us")

    # dense projections only (both layers' matmuls, no aggregation)
    import flax.linen as nn

    class ProjOnly(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(4 * 64, use_bias=False, name="W1")(x)
            h = jax.nn.elu(h)
            return nn.Dense(7, use_bias=False, name="W2")(h)

    pm = ProjOnly()
    pp = jax.jit(pm.init)(jax.random.PRNGKey(0), feat)

    def proj_step(c, _k, cs):
        (feat,) = cs
        return pm.apply(pp, feat + c * 1e-30)[0, 0]

    dt, _ = time_epoch_loop(proj_step, jnp.float32(0), jax.random.PRNGKey(0),
                            200, warmup=2, consts=(feat,), max_wall=30)
    print(f"projections only: {dt*1e6:.1f} us")

    # single aggregate pass at each layer's shape
    rng = np.random.default_rng(0)
    for (H, F) in [(4, 64), (1, 7)]:
        ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
        gs = g_auto.slim()
        dt = time_op(lambda a, b, c_, g_: gat_aggregate(g_, a, b, c_),
                     ar, ac, x, gs, max_wall=30)
        print(f"gat_aggregate H={H} F={F} (auto): {dt*1e6:.1f} us")

    # width variants, layer-1 shape
    H, F = 4, 64
    ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
    for widths in [(4,), (8,), (16,), (32,), (4, 16)]:
        g = build(widths=widths).slim()
        slots = sum(t.size for t in g.fwd.nbr)
        dt = time_op(lambda a, b, c_, g_: gat_aggregate(g_, a, b, c_),
                     ar, ac, x, g, max_wall=30)
        print(f"gat_aggregate H=4 widths={widths} slots={slots}: "
              f"{dt*1e6:.1f} us")

    # full model with width variants
    for widths in [(8,), (16,), (32,)]:
        g = build(widths=widths)
        print(f"full fwd widths={widths}: {time_model(g)*1e6:.1f} us")


if __name__ == "__main__":
    main()
