"""Round-5: op-level trace of the pubmed GAT train step (0.78x config).

Captures a jax.profiler trace of the bench-identical train step and
prints the per-op time table with HLO shape mapping, to find any
remaining layout pathologies after the K-way merge rewrite.

Run: python scripts/exp_r5_pubmed_profile.py
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

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

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.models import GAT

    data = load_citation_dataset("pubmed", seed=0)
    g = structure.build_graph(data.src, data.dst, data.num_nodes,
                              dense="auto", edge_tables=False).slim()
    feat = jnp.asarray(data.features)
    labels = jnp.asarray(data.labels)
    key = jax.random.PRNGKey(0)
    model = GAT(num_layers=1, n_hidden=64, n_classes=data.n_classes,
                heads=(4, 1), feat_drop=0.5, attn_drop=0.0)
    params = jax.jit(model.init)(key, g, feat)
    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-3))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, sub, g, feat, labels):
        def loss_fn(p):
            logits = model.apply(p, g, feat, training=True,
                                 rngs={"dropout": sub})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    r = train_step(params, opt_state, key, g, feat, labels)
    jax.block_until_ready(r)
    r = train_step(params, opt_state, key, g, feat, labels)
    jax.block_until_ready(r)
    with jax.profiler.trace("/tmp/tr_pm"):
        for _ in range(30):
            params, opt_state, loss = train_step(params, opt_state, key, g,
                                                 feat, labels)
        jax.block_until_ready(loss)
        time.sleep(0.3)

    d = sorted(glob.glob("/tmp/tr_pm/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(d) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(
                e.get("pid"), ""):
            durs[e["name"]] += e["dur"]
            cnt[e["name"]] += 1

    txt = train_step.lower(params, opt_state, key, g, feat,
                           labels).compile().as_text()
    shapes = {}
    for m_ in re.finditer(
            r"^\s*(?:ROOT )?%?([\w.\-]+) = (\(?[^ ]+?) (?:fusion|while|"
            r"custom-call)\(", txt, re.M):
        shapes[m_.group(1)] = m_.group(2)

    for name, dtot in sorted(durs.items(), key=lambda kv: -kv[1])[:28]:
        sh = shapes.get(name, "")[:60]
        print(f"{dtot/30/1e3:8.4f} ms/iter n={cnt[name]//30:3d} "
              f"{name[:28]:28s} {sh}")


if __name__ == "__main__":
    main()
