"""Experiment: does the tile-sparse dense hub pay off on SMALL graphs
(cora/citeseer/pubmed) once MIN_SAVE_S is lowered to the measured op floor?

Times gat_aggregate and the full 2-layer forward with the auto plan at
several MIN_SAVE_S values, on the real TPU.
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
    x = jnp.ones((128, 128))
    print("health:", float(jnp.sum(x @ x)))

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import hub, structure
    from dgnn_tpu.models import GAT
    from dgnn_tpu.ops.gat import gat_aggregate
    from dgnn_tpu.utils import time_epoch_loop
    from dgnn_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)

    for name in ("cora", "pubmed"):
        data = load_citation_dataset(name, seed=0)
        n = data.num_nodes
        feat = jnp.asarray(data.features)
        ncls = data.n_classes
        H, F = 4, 64
        ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        xf = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)

        for min_save in (300e-6, 50e-6, 0.0):
            hub.MIN_SAVE_S = min_save
            g = structure.build_graph(data.src, data.dst, n, dense="auto",
                                      edge_tables=False)
            db = g.fwd.dense
            if db is None:
                desc = "no dense"
            else:
                desc = (f"dense T={len(db.rc)} rows={len(db.row_ids)} "
                        f"cols={len(db.col_ids)}")
            slots = sum(t.size for t in g.fwd.nbr)
            gs = g.slim()
            dt = time_op(lambda a, b, c_, g_: gat_aggregate(g_, a, b, c_),
                         ar, ac, xf, gs, max_wall=25)

            model = GAT(num_layers=1, n_hidden=64, n_classes=ncls,
                        heads=(4, 1))
            params = jax.jit(model.init)(jax.random.PRNGKey(0), gs, feat)

            def infer_step(c, _k, cs):
                gg, ff = cs
                return model.apply(params, gg, ff + c * 1e-30)[0, 0]

            dt2, _ = time_epoch_loop(infer_step, jnp.float32(0),
                                     jax.random.PRNGKey(0), 200, warmup=2,
                                     consts=(gs, feat), max_wall=30)
            print(f"{name} min_save={min_save*1e6:.0f}us: {desc}, "
                  f"residual_slots={slots}, agg={dt*1e6:.1f}us, "
                  f"fullfwd={dt2*1e6:.1f}us")


if __name__ == "__main__":
    main()
