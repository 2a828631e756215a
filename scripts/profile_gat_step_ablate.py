"""Attribute the Reddit GAT full-step time outside the aggregates.

profile_reddit_gat.py measured L1+L2 aggregate fwd+bwd at ~514 ms while the
bench full step is ~964 ms — this script isolates the remaining ~450 ms by
running bench-identical steps (time_epoch_loop, graph as a jit ARGUMENT)
with pieces ablated:

  A. full train step (bench-identical)         -> baseline
  B. forward-only apply (training=True)        -> fwd vs bwd split
  C. full step, aggregates stubbed to identity -> transforms+loss+adam alone
  D. value_and_grad without optimizer update   -> optax cost

Run on TPU: python scripts/profile_gat_step_ablate.py
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


def main():
    import optax

    from dgnn_tpu.graph import cache as gcache
    from dgnn_tpu.utils.timing import time_epoch_loop

    path = os.path.join(REPO, ".bench_cache",
                        "rmat_graph_232965_114615892_d6.npz")
    g = gcache.load_graph(path).slim()
    n = g.num_nodes
    din, ncls = 602, 41
    rng = np.random.default_rng(0)
    feat_in = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, ncls, n).astype(np.int32))
    key = jax.random.PRNGKey(0)

    def build(stub_agg: bool):
        # NOTE: models/gat.py looks up `gat_aggregate` as a module global at
        # TRACE time, so the stub must stay installed through run_case (the
        # jit trace), not just init — restore_stub() undoes it afterwards.
        import dgnn_tpu.models.gat as mgat
        from dgnn_tpu.models import GAT

        orig = mgat.gat_aggregate
        if stub_agg:
            def ident(graph, ar, ac, feat, **kw):
                # keep ar/ac/feat in the graph of the computation so the
                # transform/attn params still get gradients
                return feat + (ar * 0.0)[..., None] + (ac * 0.0)[..., None]

            mgat.gat_aggregate = ident
        model = GAT(num_layers=1, n_hidden=64, n_classes=ncls, heads=(4, 1),
                    feat_drop=0.5, attn_drop=0.0)
        params = jax.jit(model.init)(key, g, feat_in)
        return model, params, (lambda: setattr(mgat, "gat_aggregate", orig))

    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-3))

    def run_case(tag, model, params, mode):
        opt_state = tx.init(params)

        def train_step(carry, sub, cs):
            graph, feat, labels = cs
            params, opt_state, _ = carry

            def loss_fn(p):
                logits = model.apply(p, graph, feat, training=True,
                                     rngs={"dropout": sub})
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels).mean()

            if mode == "fwd":
                return params, opt_state, loss_fn(params)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            if mode == "grad":
                leaves = jax.tree.leaves(grads)
                s = sum(jnp.sum(l) for l in leaves)
                return params, opt_state, loss + s * 1e-30
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        carry = (params, opt_state, jnp.float32(0))
        dt, _ = time_epoch_loop(train_step, carry, key, 3, warmup=2,
                                consts=(g, feat_in, labels), max_wall=60.0)
        print(f"{tag}: {dt*1e3:8.1f} ms/step", flush=True)
        return dt

    model, params, restore = build(stub_agg=False)
    a = run_case("A full step (bench-identical) ", model, params, "full")
    b = run_case("B forward-only apply          ", model, params, "fwd")
    d = run_case("D fwd+bwd, no optimizer       ", model, params, "grad")

    smodel, sparams, restore = build(stub_agg=True)
    c = run_case("C aggregates stubbed out      ", smodel, sparams, "full")
    restore()

    print(f"\nbwd = {1e3*(d-b):.1f} ms;  optimizer = {1e3*(a-d):.1f} ms;  "
          f"non-aggregate step = {1e3*c:.1f} ms;  "
          f"implied aggregates = {1e3*(a-c):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
