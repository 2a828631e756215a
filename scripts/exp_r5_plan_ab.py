"""Round-5 paired A/B: binning widths x dense-hub on small-graph train steps.

The tunnelled device's throughput drifts ~2x with multi-tenancy (measured:
the same 1M-row gather probe 445 <-> 204 M rows/s half an hour apart), so
plan comparisons are only valid PAIRED within one run.  This script builds
each dataset's graph under several plans and times the bench-identical
train + infer step for each, interleaved, printing a table.

Run: python scripts/exp_r5_plan_ab.py [cora|citeseer|pubmed ...]
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


def build_variants(dataset):
    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import build as gbuild
    from dgnn_tpu.graph import structure

    data = load_citation_dataset(dataset, seed=0)
    src, dst = gbuild.remove_self_loops(data.src, data.dst)
    src, dst = gbuild.add_self_loops(src, dst, data.num_nodes)
    n = data.num_nodes

    variants = {}
    variants["auto+dense"] = structure.build_graph(
        src, dst, n, self_loops=False, dense="auto", edge_tables=False)
    variants["auto_nodense"] = structure.build_graph(
        src, dst, n, self_loops=False, dense=None, edge_tables=False)
    variants["w8_nodense"] = structure.build_graph(
        src, dst, n, self_loops=False, dense=None, widths=(8,),
        edge_tables=False)
    variants["w8+dense"] = structure.build_graph(
        src, dst, n, self_loops=False, dense="auto", widths=(8,),
        edge_tables=False)
    variants["w16_nodense"] = structure.build_graph(
        src, dst, n, self_loops=False, dense=None, widths=(16,),
        edge_tables=False)
    return data, variants


def time_cases(dataset, model_kind="gat"):
    import optax

    from dgnn_tpu.models import GAT, MoNet
    from dgnn_tpu.ops.gmm import NodePseudo
    from dgnn_tpu.utils.timing import time_epoch_loop

    data, variants = build_variants(dataset)
    feat_in = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    ncls = data.n_classes
    key = jax.random.PRNGKey(0)

    results = {}
    for tag, g in variants.items():
        slots = sum(int(nb.shape[0]) * w
                    for w, nb, e, r, c in g.fwd.bins())
        dense_edges = 0
        if g.fwd.dense is not None:
            dense_edges = int(np.asarray(
                jax.device_get(g.fwd.dense.mask)).view(np.uint8).sum())
        if model_kind == "gat":
            model = GAT(num_layers=1, n_hidden=64, n_classes=ncls,
                        heads=(4, 1), feat_drop=0.5, attn_drop=0.0)
            pseudo = None
        else:
            model = MoNet(n_hidden=64, out_feats=ncls, n_layers=1, dim=2,
                          n_kernels=3, dropout=0.5)
            deg = jnp.maximum(g.in_degrees().astype(jnp.float32), 1.0)
            rsq = jax.lax.rsqrt(deg)[:, None]
            pseudo = NodePseudo(src=rsq, dst=rsq)
        gs = g.slim()
        if model_kind == "gat":
            params = jax.jit(model.init)(key, gs, feat_in)
            consts = (gs, feat_in, labels)
            tx = optax.chain(optax.add_decayed_weights(5e-4),
                             optax.adam(1e-3))
        else:
            params = jax.jit(model.init)(key, gs, feat_in, pseudo)
            consts = (gs, feat_in, labels, pseudo)
            tx = optax.adam(1e-2)
        opt_state = tx.init(params)

        def train_step(carry, sub, cs):
            params, opt_state, _ = carry

            def loss_fn(p):
                if model_kind == "gat":
                    graph, feat, labels = cs
                    logits = model.apply(p, graph, feat, training=True,
                                         rngs={"dropout": sub})
                else:
                    graph, feat, labels, pseudo = cs
                    logits = model.apply(p, graph, feat, pseudo,
                                         training=True,
                                         rngs={"dropout": sub})
                import optax as _o
                return _o.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax as _o
            return _o.apply_updates(params, updates), opt_state, loss

        def infer_step(c, _k, cs):
            if model_kind == "gat":
                graph, feat, _ = cs
                return model.apply(params, graph, feat + c * 1e-30)[0, 0]
            graph, feat, _, pseudo = cs
            return model.apply(params, graph, feat + c * 1e-30,
                               pseudo)[0, 0]

        carry = (params, opt_state, jnp.float32(0))
        dt_tr, _ = time_epoch_loop(train_step, carry, key, 100, warmup=2,
                                   consts=consts, max_wall=45)
        dt_in, _ = time_epoch_loop(infer_step, jnp.float32(0), key, 100,
                                   warmup=2, consts=consts, max_wall=45)
        results[tag] = (dt_tr, dt_in, slots, dense_edges)
        print(f"[{dataset} {model_kind}] {tag:14s}: train {dt_tr*1e3:7.3f} ms"
              f"  infer {dt_in*1e3:7.3f} ms  (slots={slots}"
              f" dense_e={dense_edges})", flush=True)
    return results


if __name__ == "__main__":
    args = sys.argv[1:] or ["cora", "citeseer", "pubmed"]
    kinds = ["gat", "gmm"]
    if args and args[-1] in ("gat", "gmm"):
        kinds = [args.pop()]
        args = args or ["cora", "citeseer", "pubmed"]
    for ds in args:
        for kind in kinds:
            time_cases(ds, kind)
