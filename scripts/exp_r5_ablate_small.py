"""Round-5: attribute small-graph epoch time on the CURRENT machine.

The machine changed between rounds (432 TF/s bf16 matmul vs 124 recorded;
small-table gathers ~450M rows/s vs 265M) and small-graph configs got
SLOWER in absolute terms (gat_pubmed_train 3.4 -> 5.9 ms with identical
code paths).  This script splits a bench-identical pubmed GAT / cora GMM
train step into: full step, fwd-only, aggregate-stubbed step, and the bare
fused aggregate fwd, to find where the time went.

Run: python scripts/exp_r5_ablate_small.py [pubmed_gat|cora_gmm|...]
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


def gat_case(dataset="pubmed"):
    import optax

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.ops.gat import gat_aggregate
    from dgnn_tpu.utils.timing import time_epoch_loop, time_op

    data = load_citation_dataset(dataset, seed=0)
    g = structure.build_graph(data.src, data.dst, data.num_nodes,
                              dense="auto", edge_tables=False)
    n, ncls = g.num_nodes, data.n_classes
    feat_in = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    key = jax.random.PRNGKey(0)
    H, F = 4, 64

    rng = np.random.default_rng(0)
    ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
    gs = g.slim()

    # bare aggregate: fwd primal-only, fwd training, fwd+bwd
    dt = time_op(lambda x, *c: gat_aggregate(gs, ar, ac, x), x)
    print(f"[{dataset} gat] aggregate fwd primal: {dt*1e3:.3f} ms")
    dt = time_op(lambda x, *c: gat_aggregate(gs, ar, ac, x, training=True,
                                             attn_drop=0.0), x)
    print(f"[{dataset} gat] aggregate fwd train : {dt*1e3:.3f} ms")

    def agg_loss(x):
        return jnp.sum(gat_aggregate(gs, ar, ac, x, training=True))

    dt = time_op(lambda x, *c: jax.grad(agg_loss)(x), x)
    print(f"[{dataset} gat] aggregate fwd+bwd  : {dt*1e3:.3f} ms")

    # the bare gathers (pass A analogue): xcat[nbr] per bin + combine gather
    from dgnn_tpu.ops.gat import _concat_rows
    xcat = _concat_rows(x, ac)

    def gathers(xc, *c):
        tot = 0.0
        for b in range(g.fwd.num_bins):
            tot = tot + jnp.sum(xc[g.fwd.nbr[b]])
        return tot

    dt = time_op(gathers, xcat)
    print(f"[{dataset} gat] bare bin gathers   : {dt*1e3:.3f} ms")

    # full bench-identical step
    from dgnn_tpu.models import GAT
    model = GAT(num_layers=1, n_hidden=64, n_classes=ncls, heads=(H, 1),
                feat_drop=0.5, attn_drop=0.0)
    params = jax.jit(model.init)(key, gs, feat_in)
    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-3))
    opt_state = tx.init(params)
    consts = (gs, feat_in, labels)

    def train_step(carry, sub, cs):
        graph, feat, labels = cs
        params, opt_state, _ = carry

        def loss_fn(p):
            logits = model.apply(p, graph, feat, training=True,
                                 rngs={"dropout": sub})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _o
        return _o.apply_updates(params, updates), opt_state, loss

    carry = (params, opt_state, jnp.float32(0))
    dt, _ = time_epoch_loop(train_step, carry, key, 50, warmup=2,
                            consts=consts, max_wall=60)
    print(f"[{dataset} gat] full train step    : {dt*1e3:.3f} ms")

    # fwd-only apply (training=True, with value_and_grad ablated)
    def fwd_step(c, sub, cs):
        graph, feat, labels = cs
        logits = model.apply(params, graph, feat + c * 1e-30, training=True,
                             rngs={"dropout": sub})
        return jnp.sum(logits) * 1e-30

    dt, _ = time_epoch_loop(fwd_step, jnp.float32(0), key, 50, warmup=2,
                            consts=consts, max_wall=60)
    print(f"[{dataset} gat] fwd-only apply     : {dt*1e3:.3f} ms")

    # infer path (training=False)
    def inf_step(c, sub, cs):
        graph, feat, labels = cs
        logits = model.apply(params, graph, feat + c * 1e-30)
        return jnp.sum(logits) * 1e-30

    dt, _ = time_epoch_loop(inf_step, jnp.float32(0), key, 50, warmup=2,
                            consts=consts, max_wall=60)
    print(f"[{dataset} gat] infer apply        : {dt*1e3:.3f} ms")


def gmm_case(dataset="cora", K=3):
    import optax

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.models import MoNet
    from dgnn_tpu.ops.gmm import NodePseudo
    from dgnn_tpu.utils.timing import time_epoch_loop

    data = load_citation_dataset(dataset, seed=0)
    g = structure.build_graph(data.src, data.dst, data.num_nodes,
                              dense="auto", edge_tables=False)
    n, ncls = g.num_nodes, data.n_classes
    feat_in = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    deg = jnp.maximum(g.in_degrees().astype(jnp.float32), 1.0)
    rsq = jax.lax.rsqrt(deg)[:, None]
    pseudo = NodePseudo(src=rsq, dst=rsq)
    gs = g.slim()
    key = jax.random.PRNGKey(0)

    model = MoNet(n_hidden=64, out_feats=ncls, n_layers=1, dim=2,
                  n_kernels=K, dropout=0.5)
    params = jax.jit(model.init)(key, gs, feat_in, pseudo)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    consts = (gs, feat_in, labels, pseudo)

    def train_step(carry, sub, cs):
        graph, feat, labels, pseudo = cs
        params, opt_state, _ = carry

        def loss_fn(p):
            logits = model.apply(p, graph, feat, pseudo, training=True,
                                 rngs={"dropout": sub})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    carry = (params, opt_state, jnp.float32(0))
    dt, _ = time_epoch_loop(train_step, carry, key, 100, warmup=2,
                            consts=consts, max_wall=60)
    print(f"[{dataset} gmm] full train step    : {dt*1e3:.3f} ms")

    def fwd_step(c, sub, cs):
        graph, feat, labels, pseudo = cs
        logits = model.apply(params, graph, feat + c * 1e-30, pseudo,
                             training=True, rngs={"dropout": sub})
        return jnp.sum(logits) * 1e-30

    dt, _ = time_epoch_loop(fwd_step, jnp.float32(0), key, 100, warmup=2,
                            consts=consts, max_wall=60)
    print(f"[{dataset} gmm] fwd-only apply     : {dt*1e3:.3f} ms")

    # optimizer-only: grads precomputed once outside
    def loss_fn(p):
        logits = model.apply(p, gs, feat_in, pseudo, training=True,
                             rngs={"dropout": key})
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    grads0 = jax.jit(jax.grad(loss_fn))(params)

    def opt_step(carry, sub, cs):
        grads0, = cs
        params, opt_state, s = carry
        updates, opt_state = tx.update(grads0, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, s

    dt, _ = time_epoch_loop(opt_step, carry, key, 100, warmup=2,
                            consts=(grads0,), max_wall=60)
    print(f"[{dataset} gmm] optimizer only     : {dt*1e3:.3f} ms")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "pubmed_gat"):
        gat_case("pubmed")
    if which in ("all", "cora_gmm"):
        gmm_case("cora", 3)
    if which in ("all", "cora_gat"):
        gat_case("cora")
