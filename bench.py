#!/usr/bin/env python
"""Headline benchmark: GAT training epoch on a Reddit-scale graph.

Mirrors the reference's flagship measurement — full-graph GAT training
(fwd + bwd + Adam) per-epoch seconds on Reddit with 4 heads, hidden 64
(dgNN: 0.6518 s/epoch on its sm_70-era GPU, test/gat_result.csv:10; see
BASELINE.md).  The graph here is a synthetic R-MAT at Reddit's exact scale
(232,965 nodes / ~114.6M directed edges + self loops) since real Reddit
cannot be downloaded in this environment; the compute/traffic profile is the
same power-law CSR workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_seconds / our_seconds (>1 means faster than dgNN).

Env knobs: BENCH_SCALE (float, default 1.0) scales node/edge counts;
BENCH_EPOCHS (default 10).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DGNN_REDDIT_TRAIN_S = 0.6518  # test/gat_result.csv:10 (4 heads, hidden 64)

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


def _build_graph(scale: float):
    """Reddit-scale R-MAT, preprocessed + binned, cached on disk."""
    from dgnn_tpu.data.synthetic import rmat_edges
    from dgnn_tpu.graph import cache as gcache
    from dgnn_tpu.graph import structure

    n = int(232965 * scale)
    e = int(114615892 * scale)
    os.makedirs(CACHE_DIR, exist_ok=True)
    cache = os.path.join(CACHE_DIR, f"rmat_graph_{n}_{e}.npz")
    if os.path.exists(cache):
        return gcache.load_graph(cache), n
    src, dst = rmat_edges(n, e, seed=0)
    g = structure.build_graph(src, dst, n)
    gcache.save_graph(cache, g)
    return g, n


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dgnn_tpu.models import GAT

    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    epochs = int(os.environ.get("BENCH_EPOCHS", "10"))

    t0 = time.time()
    graph, n = _build_graph(scale)
    print(f"# graph built in {time.time() - t0:.1f}s: {n} nodes, "
          f"{graph.num_edges} edges", file=sys.stderr)

    rng = np.random.default_rng(0)
    din, ncls = 602, 41
    features = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, ncls, n).astype(np.int32))

    model = GAT(num_layers=1, n_hidden=64, n_classes=ncls, heads=(4, 1))
    key = jax.random.PRNGKey(0)
    params = model.init(key, graph, features)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, graph, features, training=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup (compile + steady state)
    for _ in range(3):
        params, opt_state, loss = train_step(params, opt_state)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(epochs):
        params, opt_state, loss = train_step(params, opt_state)
    jax.block_until_ready(loss)
    per_epoch = (time.perf_counter() - t0) / epochs
    print(f"# loss={float(loss):.4f}", file=sys.stderr)

    baseline = DGNN_REDDIT_TRAIN_S * scale  # traffic scales ~linearly
    print(json.dumps({
        "metric": "gat_reddit4h_train_epoch",
        "value": round(per_epoch, 5),
        "unit": "s/epoch",
        "vs_baseline": round(baseline / per_epoch, 3),
    }))


if __name__ == "__main__":
    main()
