"""Peak-memory comparison at Reddit scale: fused (recompute-based) vs naive
(DGL-style edge-materializing) GAT training step (VERDICT r1 item 6 —
reference headline: dgNN 8.3 GB vs DGL 22.5 GB, test/gat_result.csv:10-11).

Both numbers come from XLA's static memory analysis of the COMPILED step
(argument + temp + output - aliased); the naive step is never executed (it
would exceed the 16 GB chip).  Writes docs/MEMORY.md.

Run on TPU: python scripts/memory_report.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def step_memory_mb(model_kwargs, graph, feat, labels, ncls):
    import jax
    import jax.numpy as jnp
    import optax

    from dgnn_tpu.models import GAT

    model = GAT(num_layers=1, n_hidden=64, n_classes=ncls, heads=(4, 1),
                feat_drop=0.5, attn_drop=0.0, **model_kwargs)
    key = jax.random.PRNGKey(0)
    params = jax.eval_shape(model.init, key, graph, feat)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-3))
    opt_state = tx.init(params)

    def train_step(params, opt_state, sub, graph, feat, labels):
        def loss_fn(p):
            logits = model.apply(p, graph, feat, training=True,
                                 rngs={"dropout": sub})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    lowered = jax.jit(train_step).lower(params, opt_state, key, graph, feat,
                                        labels)
    ma = lowered.compile().memory_analysis()
    peak = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
            + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    return peak / (1024 * 1024), ma.temp_size_in_bytes / (1024 * 1024)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, ".bench_cache", "xla_cache"))

    from dgnn_tpu.graph import cache as gcache

    path = os.path.join(REPO, ".bench_cache",
                        "rmat_graph_232965_114615892_d6.npz")
    g = gcache.load_graph(path)
    n, din, ncls = g.num_nodes, 602, 41
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, ncls, n).astype(np.int32))

    fused_mb, fused_tmp = step_memory_mb({}, g.slim(), feat, labels, ncls)
    print(f"fused: peak {fused_mb:.0f} MB (temp {fused_tmp:.0f})", flush=True)
    naive_mb, naive_tmp = step_memory_mb({"impl": "naive"}, g, feat, labels,
                                         ncls)
    print(f"naive: peak {naive_mb:.0f} MB (temp {naive_tmp:.0f})", flush=True)

    lines = [
        "# Peak memory at Reddit scale — fused vs naive GAT training step",
        "",
        "XLA static memory analysis (argument + temp + output - aliased) of "
        "the compiled",
        "train step on the benchmark's Reddit-scale R-MAT (N=233k, "
        "E=114.8M, 4 heads,",
        "hidden 64).  The naive step is the DGL-style edge-materializing "
        "strategy",
        "(ops/naive.py) and is compile-analyzed only — it does not fit the "
        "16 GB chip.",
        "",
        "| implementation | peak MB | vs 16 GB chip |",
        "|---|---|---|",
        f"| fused (recompute-based custom VJP + dense hub block) | "
        f"{fused_mb:,.0f} | fits |",
        f"| naive (materialized [E,H] softmax + [E,H,F] messages) | "
        f"{naive_mb:,.0f} | {'fits' if naive_mb < 16000 else 'DOES NOT FIT'}"
        " |",
        "",
        f"Reduction: {naive_mb / fused_mb:.1f}x.  Reference analogue: dgNN "
        "8,283 MB vs",
        "DGL 22,467 MB on real Reddit (test/gat_result.csv:10-11) — the same "
        "recompute-",
        "based trade, plus the bit-packed dense hub block replacing ~92% of "
        "the slot",
        "tables.  The benchmark records per-config peaks in "
        "BENCH_DETAILS.json.",
    ]
    out = os.path.join(REPO, "docs", "MEMORY.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
