#!/usr/bin/env python
"""Headline benchmark: the reference's own published benchmark table.

dgSPARSE/dgNN's record is its committed CSVs (test/gat_result.csv,
gmm_result.csv, edgeconv_result.csv; reproduced in BASELINE.md): per-epoch
full-graph training seconds and inference seconds on an sm_70-era GPU for
GAT (Cora/Pubmed/Citeseer/Reddit, 4 heads, hidden 64), MoNet
(Cora/Pubmed K=3, Reddit K=2, dim 2, hidden 64) and EdgeConv/DGCNN
(ModelNet40, B=64, k=40, 1024 points).

This suite runs the same configs on TPU (synthetic data at identical scales
— no egress; Reddit is an R-MAT at Reddit's exact node/edge counts) with the
same semantics per epoch (full fwd+bwd+optimizer; reference protocol
train_gatconv.py:125-161) measured device-resident (utils/timing.py).

Prints ONE JSON line:
  {"metric": "dgnn_suite_geomean_speedup", "value": G, "unit": "x",
   "vs_baseline": G}
where each config's speedup = reference_seconds / ours and G is the
geometric mean.  Per-config details go to stderr and BENCH_DETAILS.json.

Env knobs: BENCH_CONFIGS (comma list to subset), BENCH_SCALE (float, scales
reddit-size graphs), BENCH_EPOCHS (small-graph epoch floor),
BENCH_TOTAL_WALL (global wall budget, s — the suite ALWAYS finishes and
prints its JSON line inside this; remaining configs are recorded as skipped),
BENCH_MEASURE_WALL (per-config measurement cap, s), BENCH_CONFIG_TIMEOUT
(per-config subprocess cap, s).

Subset runs MERGE into BENCH_DETAILS.json (configs not re-run keep their
previous record) so a debugging subset can never clobber the full table.
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


def _enable_compile_cache():
    """Persistent XLA compilation cache under .bench_cache — subprocess
    re-compiles of identical configs become disk hits, which is the
    difference between the suite fitting the driver budget or timing out
    (round-1 failure mode: rc=124 with compile walls of 300-900s/config)."""
    import jax

    d = os.path.join(CACHE_DIR, "xla_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


_enable_compile_cache()

# Per-config measurement wall cap (seconds) for time_epoch_loop doubling.
MEASURE_WALL = float(os.environ.get("BENCH_MEASURE_WALL", "90"))

# reference numbers: BASELINE.md — every dgNN row of test/gat_result.csv,
# gmm_result.csv, edgeconv_result.csv (train s/epoch and inference s)
REF = {
    "gat_cora_train": 0.00398,        # gat_result.csv:3
    "gat_cora_infer": 0.00036,
    "gat_pubmed_train": 0.00470,      # gat_result.csv:6
    "gat_pubmed_infer": 0.000812,
    "gat_citeseer_train": 0.00501,    # gat_result.csv:9
    "gat_citeseer_infer": 0.000590,
    "gat_reddit_train": 0.6518,       # gat_result.csv:11
    "gat_reddit_infer": 0.138770,
    "gat_reddit_h1_train": 0.247250,  # gat_result.csv:19 (heads=1)
    "gat_reddit_h1_infer": 0.062236,
    "gmm_cora_train": 0.00386,        # gmm_result.csv:3 (K=3 dim=2)
    "gmm_cora_infer": 0.000332,
    "gmm_pubmed_train": 0.00375,      # gmm_result.csv:6
    "gmm_pubmed_infer": 0.000625,
    "gmm_citeseer_train": 0.003927,   # gmm_result.csv:9
    "gmm_citeseer_infer": 0.000458,
    "gmm_reddit_train": 0.6340,       # gmm_result.csv:15 (K=2 dim=2)
    "gmm_reddit_infer": 0.127434,
    "edgeconv_modelnet_train": 17.39,  # edgeconv_result.csv:2
    "edgeconv_modelnet_infer": 1.895,
}

# reddit-sized configs whose reference seconds scale with BENCH_SCALE
_SCALED = {"gat_reddit_train", "gat_reddit_infer", "gat_reddit_h1_train",
           "gat_reddit_h1_infer", "gmm_reddit_train", "gmm_reddit_infer"}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


_GRAPH_MEMO = {}


def _citation_graph(name, scale=1.0):
    """Graph + features at the dataset's scale (cached for reddit; memoized
    in-process so grouped configs — e.g. both reddit ones — share one
    multi-GB npz load)."""
    if (name, scale) in _GRAPH_MEMO:
        return _GRAPH_MEMO[(name, scale)]
    out = _citation_graph_uncached(name, scale)
    _GRAPH_MEMO[(name, scale)] = out
    return out


def _citation_graph_uncached(name, scale=1.0):
    import jax.numpy as jnp

    from dgnn_tpu.data.synthetic import CITATION_SHAPES, rmat_edges
    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import cache as gcache
    from dgnn_tpu.graph import structure

    if name == "reddit":
        n_full, e_full, din, ncls = CITATION_SHAPES["reddit"]
        n, e = int(n_full * scale), int(e_full * scale)
        os.makedirs(CACHE_DIR, exist_ok=True)
        # cache key: binning/dense-format version (d6: merge-aware
        # auto_widths + epos slot table; kept in round 5 -- the re-planned
        # d7 decomposition measured strictly worse, see graph/hub.py)
        path = os.path.join(CACHE_DIR, f"rmat_graph_{n}_{e}_d6.npz")
        if os.path.exists(path):
            g = gcache.load_graph(path)
        else:
            # two-level cache: the raw CSR/CSC/permute arrays are
            # format-independent (a layout change only re-pays binning +
            # dense planning, ~2 min, not the R-MAT + sorts)
            raw = os.path.join(CACHE_DIR, f"rmat_raw_{n}_{e}.npz")
            if not os.path.exists(raw):
                sys.path.insert(0, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "scripts"))
                from build_reddit_raw import build_raw
                build_raw(n, e, raw)
            z = np.load(raw)
            g = structure.build_graph_from_csr(
                z["row_ptr"], z["col_ind"], z["col_ptr"], z["row_ind"],
                z["permute"], dense="auto", edge_tables=False)
            gcache.save_graph(path, g)
        rng = np.random.default_rng(0)
        feat = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, ncls, n).astype(np.int32))
        return g, feat, labels, ncls
    data = load_citation_dataset(name, seed=0)
    g = structure.build_graph(data.src, data.dst, data.num_nodes,
                              dense="auto", edge_tables=False)
    return (g, jnp.asarray(data.features), jnp.asarray(data.labels),
            data.n_classes)


def _node_pseudo(graph):
    """Reference citation protocol: pseudo = [1/sqrt(deg_u), 1/sqrt(deg_v)]
    (train_gmmconv.py:120-122) as per-node scalars — derived in-pass by
    gmm_aggregate_node, so no per-edge pseudo is ever materialized."""
    import jax
    import jax.numpy as jnp

    from dgnn_tpu.ops.gmm import NodePseudo

    deg = jnp.maximum(graph.in_degrees().astype(jnp.float32), 1.0)
    rsq = jax.lax.rsqrt(deg)[:, None]
    return NodePseudo(src=rsq, dst=rsq)


def _reddit_env():
    """Halve the gather chunk budget for reddit configs: the [W, chunk, C]
    gathered blocks are the dominant temporaries, and 128MB chunks cut the
    measured peak at ~no speed cost (more scan steps, same streaming)."""
    os.environ.setdefault("DGNN_TPU_GATHER_BUDGET_MB", "128")


def bench_gat(dataset, scale, epochs, infer=False, heads=4,
              gather_dtype=None):
    if dataset == "reddit":
        _reddit_env()
    import jax
    import jax.numpy as jnp
    import optax

    from dgnn_tpu.models import GAT
    from dgnn_tpu.utils import time_epoch_loop

    graph, feat, labels, ncls = _citation_graph(dataset, scale)
    graph = graph.slim()  # bins only on device
    model = GAT(num_layers=1, n_hidden=64, n_classes=ncls, heads=(heads, 1),
                feat_drop=0.5, attn_drop=0.0, gather_dtype=gather_dtype)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, graph, feat)
    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-3))
    opt_state = tx.init(params)

    consts = (graph, feat, labels)
    if infer:
        def infer_step(c, _k, cs):
            graph, feat, _ = cs
            return model.apply(params, graph, feat + c * 1e-30)[0, 0]

        dt, _ = time_epoch_loop(infer_step, jnp.float32(0), key, epochs,
                                warmup=2, consts=consts,
                                max_wall=MEASURE_WALL)
        return dt

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
        return optax.apply_updates(params, updates), opt_state, loss

    carry = (params, opt_state, jnp.float32(0))
    dt, _ = time_epoch_loop(train_step, carry, key, epochs, warmup=2,
                            consts=consts, max_wall=MEASURE_WALL)
    return dt


def bench_gmm(dataset, scale, epochs, n_kernels, infer=False,
              gather_dtype=None):
    if dataset == "reddit":
        _reddit_env()
    import jax
    import jax.numpy as jnp
    import optax

    from dgnn_tpu.models import MoNet
    from dgnn_tpu.utils import time_epoch_loop

    graph, feat, labels, ncls = _citation_graph(dataset, scale)
    pseudo = _node_pseudo(graph)
    graph = graph.slim()  # bins only on device

    model = MoNet(n_hidden=64, out_feats=ncls, n_layers=1, dim=2,
                  n_kernels=n_kernels, dropout=0.5,
                  gather_dtype=gather_dtype)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, graph, feat, pseudo)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    consts = (graph, feat, labels, pseudo)
    if infer:
        def infer_step(c, _k, cs):
            graph, feat, _, pseudo = cs
            return model.apply(params, graph, feat + c * 1e-30, pseudo)[0, 0]

        dt, _ = time_epoch_loop(infer_step, jnp.float32(0), key, epochs,
                                warmup=2, consts=consts,
                                max_wall=MEASURE_WALL)
        return dt

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
    dt, _ = time_epoch_loop(train_step, carry, key, epochs, warmup=2,
                            consts=consts, max_wall=MEASURE_WALL)
    return dt


def bench_edgeconv(infer=False):
    """DGCNN at the reference's ModelNet40 protocol: 9840 train / 2468 test
    samples, B=64, k=40, 1024 points -> 153 train / 38 eval steps per epoch."""
    import jax
    import jax.numpy as jnp
    import optax

    from dgnn_tpu.data import load_modelnet
    from dgnn_tpu.models import DGCNN
    from dgnn_tpu.utils import time_epoch_loop

    bs, k, pts = 64, 40, 1024
    xtr, ytr, xte, yte = load_modelnet(num_points=pts, train_samples=9840,
                                       test_samples=2468)
    steps = len(xtr) // bs
    n_eval = len(xte) // bs
    ncls = int(max(ytr.max(), yte.max())) + 1
    model = DGCNN(k=k, output_classes=ncls, dropout=0.5)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.asarray(xtr[:bs]))
    params, batch_stats = variables["params"], variables["batch_stats"]

    if infer:
        xd = jnp.asarray(xte[: n_eval * bs]).reshape(n_eval, bs, pts, 3)
        yd = jnp.asarray(yte[: n_eval * bs]).reshape(n_eval, bs)

        def infer_epoch(c, _k, cs):
            def body(cc, batch):
                x, y = batch
                logits = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x + cc * 1e-30)
                return cc + jnp.sum(jnp.argmax(logits, 1) == y), None

            total, _ = jax.lax.scan(body, c * 1e-30, cs)
            return total

        dt, _ = time_epoch_loop(infer_epoch, jnp.float32(0), key, 1, warmup=1,
                                min_signal=2.0, consts=(xd, yd),
                                max_wall=MEASURE_WALL)
        return dt

    sched = optax.cosine_decay_schedule(0.1, 50 * steps, alpha=0.01)
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(sched, momentum=0.9))
    opt_state = tx.init(params)
    xd = jnp.asarray(xtr[: steps * bs])
    yd = jnp.asarray(ytr[: steps * bs])

    def epoch_step(carry, key, cs):
        xd, yd = cs
        params, batch_stats, opt_state = carry
        kperm, ks, kt, kd = jax.random.split(key, 4)
        order = jax.random.permutation(kperm, xd.shape[0])
        xs = xd[order].reshape(steps, bs, pts, 3)
        ys = yd[order].reshape(steps, bs)
        xs = (xs * jax.random.uniform(ks, (steps, bs, 1, 3), minval=2 / 3,
                                      maxval=3 / 2)
              + jax.random.uniform(kt, (steps, bs, 1, 3), minval=-0.2,
                                   maxval=0.2))

        def body(c, batch):
            params, batch_stats, opt_state, kk = c
            x, y = batch
            kk, sub = jax.random.split(kk)

            def loss_fn(p):
                logits, upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, x,
                    training=True, rngs={"dropout": sub},
                    mutable=["batch_stats"])
                oh = jax.nn.one_hot(y, ncls)
                sm = oh * 0.8 + (1 - oh) * 0.2 / (ncls - 1)
                loss = -(sm * jax.nn.log_softmax(logits, 1)).sum(1).mean()
                return loss, upd["batch_stats"]

            (loss, batch_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, batch_stats, opt_state, kk), loss

        (params, batch_stats, opt_state, _), _ = jax.lax.scan(
            body, (params, batch_stats, opt_state, kd), (xs, ys))
        return params, batch_stats, opt_state

    carry = (params, batch_stats, opt_state)
    dt, _ = time_epoch_loop(epoch_step, carry, key, 1, warmup=1,
                            min_signal=2.0, consts=(xd, yd),
                            max_wall=MEASURE_WALL)
    return dt


# Config groups: one subprocess per GROUP (isolation against OOM poisoning)
# but grouped configs share one process — per-dataset groups share one graph
# build/memoized load (the reddit groups share one ~3 GB cache load), the
# two edgeconv ones share data gen.  Cheap configs run first so a
# wall-budget cutoff loses the least signal.
GROUPS = [
    ["gat_cora_train", "gat_cora_infer"],
    ["gat_citeseer_train", "gat_citeseer_infer"],
    ["gmm_cora_train", "gmm_cora_infer"],
    ["gmm_citeseer_train", "gmm_citeseer_infer"],
    ["gat_pubmed_train", "gat_pubmed_infer"],
    ["gmm_pubmed_train", "gmm_pubmed_infer"],
    ["edgeconv_modelnet_infer"],
    ["edgeconv_modelnet_train"],
    ["gat_reddit_train", "gat_reddit_infer", "gmm_reddit_train",
     "gmm_reddit_infer"],
    ["gat_reddit_h1_train", "gat_reddit_h1_infer"],
]


def _runners(scale, epochs):
    # Gather dtype by TABLE SIZE (round-5 paired measurements): bf16 on the
    # small graphs measured SLOWER through the bin kernels (the scratch
    # conversion pass eats the bandwidth win; gmm_pubmed_train 0.59x bf16
    # vs 1.69x f32 — their ~20MB tables already gather at the fast
    # small-table rate), but at REDDIT scale the f32 tables are 242MB and
    # bf16 measured strictly faster paired (infer 0.228 -> 0.196 s, train
    # 0.485 -> 0.470 s) plus the peak-memory win.
    bf16 = "bfloat16"
    return {
        "gat_cora_train": lambda: bench_gat("cora", 1.0, epochs * 10),
        "gat_cora_infer": lambda: bench_gat("cora", 1.0, epochs * 10,
                                            infer=True),
        "gat_pubmed_train": lambda: bench_gat("pubmed", 1.0, epochs * 5),
        "gat_pubmed_infer": lambda: bench_gat("pubmed", 1.0, epochs * 5,
                                              infer=True),
        "gat_citeseer_train": lambda: bench_gat("citeseer", 1.0, epochs * 10),
        "gat_citeseer_infer": lambda: bench_gat("citeseer", 1.0, epochs * 10,
                                                infer=True),
        "gat_reddit_train": lambda: bench_gat("reddit", scale, 2,
                                              gather_dtype=bf16),
        "gat_reddit_infer": lambda: bench_gat("reddit", scale, 2, infer=True,
                                              gather_dtype=bf16),
        "gat_reddit_h1_train": lambda: bench_gat("reddit", scale, 2, heads=1,
                                                 gather_dtype=bf16),
        "gat_reddit_h1_infer": lambda: bench_gat("reddit", scale, 2,
                                                 infer=True, heads=1,
                                                 gather_dtype=bf16),
        "gmm_cora_train": lambda: bench_gmm("cora", 1.0, epochs * 10, 3),
        "gmm_cora_infer": lambda: bench_gmm("cora", 1.0, epochs * 10, 3,
                                            infer=True),
        "gmm_pubmed_train": lambda: bench_gmm("pubmed", 1.0, epochs * 5, 3),
        "gmm_pubmed_infer": lambda: bench_gmm("pubmed", 1.0, epochs * 5, 3,
                                              infer=True),
        "gmm_citeseer_train": lambda: bench_gmm("citeseer", 1.0,
                                                epochs * 10, 3),
        "gmm_citeseer_infer": lambda: bench_gmm("citeseer", 1.0, epochs * 10,
                                                3, infer=True),
        "gmm_reddit_train": lambda: bench_gmm("reddit", scale, 2, 2,
                                              gather_dtype=bf16),
        "gmm_reddit_infer": lambda: bench_gmm("reddit", scale, 2, 2,
                                              infer=True, gather_dtype=bf16),
        "edgeconv_modelnet_train": lambda: bench_edgeconv(),
        "edgeconv_modelnet_infer": lambda: bench_edgeconv(infer=True),
    }


def _run_child(names, runners):
    """Child mode: run each named config in-process, one JSON line each."""
    for name in names:
        try:
            dt = runners[name]()
            from dgnn_tpu.utils import timing
            peak_mb = round(timing.device_peak_memory_mb(), 1)
            if peak_mb < 0:  # backend exposes no runtime stats: use the
                peak_mb = timing.LAST_MEMORY_MB["value"]  # static analysis
            print(json.dumps({"_config": name, "_seconds": dt,
                              "_peak_mb": peak_mb}), flush=True)
        except Exception as ex:
            log(f"# {name}: FAILED {type(ex).__name__}: {ex}")
            print(json.dumps({"_config": name,
                              "_error": f"{type(ex).__name__}: {ex}"[:500]}),
                  flush=True)


def _merge_details(path, details, geomean):
    """Merge this run's configs into BENCH_DETAILS.json (a subset run must
    never clobber configs it did not execute — round-2 failure mode)."""
    merged = {}
    try:
        with open(path) as f:
            merged = json.load(f).get("configs", {})
    except Exception:
        pass
    merged = {k: v for k, v in merged.items() if k in REF}
    merged.update(details)
    sps = [v.get("speedup", 0.01) for v in merged.values()]
    g_all = (math.exp(sum(math.log(max(s, 1e-9)) for s in sps) / len(sps))
             if sps else 0.0)
    with open(path, "w") as f:
        json.dump({"geomean_speedup": g_all,
                   "geomean_this_run": geomean,
                   "n_configs": len(merged),
                   "configs": merged}, f, indent=2)
    return g_all, len(merged)


def main():
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    epochs = int(os.environ.get("BENCH_EPOCHS", "20"))
    total_wall = float(os.environ.get("BENCH_TOTAL_WALL", "2200"))
    cfg_timeout = float(os.environ.get("BENCH_CONFIG_TIMEOUT", "900"))
    deadline = time.time() + total_wall
    only = os.environ.get("BENCH_CONFIGS")
    only = set(only.split(",")) if only else None

    runners = _runners(scale, epochs)
    if os.environ.get("BENCH_CHILD") == "1":
        names = [n for n in runners if (not only or n in only)]
        _run_child(names, runners)
        return

    groups = [[n for n in g if (not only or n in only)] for g in GROUPS]
    groups = [g for g in groups if g]

    def ref_eff(name):
        r = REF[name]
        return r * scale if name in _SCALED else r

    details = {}
    speedups = []
    import subprocess
    for group in groups:
        remaining = deadline - time.time()
        if remaining < 45.0 * len(group):
            for name in group:
                log(f"# {name}: SKIPPED (wall budget exhausted)")
                details[name] = {"error": "skipped: wall budget exhausted",
                                 "speedup": 0.01}
                speedups.append(0.01)
            continue
        t0 = time.time()
        # shrink the measurement cap when the remaining budget is tight
        mw = min(MEASURE_WALL, max(15.0, remaining / (2.0 * len(group))))
        env = dict(os.environ, BENCH_CONFIGS=",".join(group), BENCH_CHILD="1",
                   BENCH_MEASURE_WALL=str(mw))
        timeout_s = min(remaining - 5.0, cfg_timeout * len(group))
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, capture_output=True, text=True,
                               timeout=timeout_s)
            stdout, stderr, rc = r.stdout, r.stderr, r.returncode
        except subprocess.TimeoutExpired as te:
            stdout = (te.stdout or b"").decode("utf-8", "replace") \
                if isinstance(te.stdout, bytes) else (te.stdout or "")
            stderr, rc = "subprocess timeout", 124
        got = {}
        for line in stdout.splitlines():
            try:
                rec = json.loads(line)
            except Exception:
                continue
            if isinstance(rec, dict) and "_config" in rec:
                got[rec["_config"]] = rec
        wall = round(time.time() - t0, 1)
        for name in group:
            rec = got.get(name)
            if rec is None or rec.get("_seconds") is None:
                err = (rec or {}).get("_error") or \
                    f"subprocess rc={rc}: {(stderr or '')[-300:]}"
                log(f"# {name}: FAILED {err}")
                details[name] = {"error": err, "speedup": 0.01}
                speedups.append(0.01)
                continue
            dt, peak_mb = rec["_seconds"], rec.get("_peak_mb")
            sp = ref_eff(name) / dt
            details[name] = {"seconds": dt, "reference": ref_eff(name),
                             "speedup": sp, "peak_device_mb": peak_mb,
                             "bench_wall_s": wall}
            speedups.append(sp)
            log(f"# {name}: {dt:.6f}s ref={ref_eff(name):.6f}s "
                f"speedup={sp:.2f}x peak={peak_mb}MB (group wall {wall:.0f}s)")

    g = math.exp(sum(math.log(max(s, 1e-9)) for s in speedups)
                 / max(len(speedups), 1)) if speedups else 0.0
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DETAILS.json")
    g_all, n_all = _merge_details(path, details, g)
    print(json.dumps({"metric": "dgnn_suite_geomean_speedup",
                      "value": round(g_all, 4), "unit": "x",
                      "vs_baseline": round(g_all, 4)}))


if __name__ == "__main__":
    main()
