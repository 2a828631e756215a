#!/usr/bin/env python
"""Roofline compliance report: measured per-config epoch time vs a
speed-of-light bound, written to docs/ROOFLINE.md.

BASELINE.json's north star is ">=80% of per-chip roofline"; this script is
the committed artifact stating the achieved fraction per benchmark config.
Reference analogue: dgNN reports raw epoch seconds only
(test/gat_result.csv); the bound model here is ours.

ROUND-5 REWRITE — the bound is now a BOUND.  The previous model charged
gathered slots at the 45e6/s *compound production rate* (a calibration,
not a limit), and measured times beat it by up to 2.4x, which certifies
nothing.  The bound constants below are the FASTEST sustained rates each
primitive has measured on this device (fast tenancy window,
docs/PERF_NOTES.md round-5 re-profile) — by construction bound <= any
achievable time, so fraction = bound/measured <= 100%; a row above 100%
is flagged as a MODEL ERROR, not a PASS.  The device's ~2x multi-tenancy
drift means measured times from a slow window legitimately sit near 40-50%
even for wall-bound passes; fractions are therefore comparable WITHIN one
bench run, and the >=80% north star is evaluated against the best window.

Bound model:
- binned residual pass: (slots + segments + merge rows) / 450e6 rows/s
  (best measured fused row-gather rate, small tables, fast window).
- dense hub pass: candidate pair-heads (tiles x RT x CT x H_or_K) /
  350e9/s (best measured per-pair-head kernel rate: the H=1 layer-2
  kernel at 302e9, rounded up — per-pair-head work is ~4 VPU ops + exp).
- GAT/GMM train epoch = sum over the model's 2 layers x (fwd pass over
  graph.fwd + bwd pass over graph.bwd); infer = the 2 fwd passes.
  Exact for the shipped 2-pass design (ops/gat.py, ops/gmm.py).
- EdgeConv/DGCNN: per step, 4 knn layers x B x P^2 x F candidate-channels
  for fwd (+2x for bwd in training) at 2.5e12 cand/s (best measured VPU
  broadcast-max rate ~1.9-2.0e12, fast window, rounded up) + knn distance
  matmuls at 400 TFLOP/s.

Run on CPU (host-side graph structure only; measured times come from
BENCH_DETAILS.json):  python scripts/roofline_report.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # structure-only, keep TPU free

from dgnn_tpu.graph.hub import DENSE_RT
from dgnn_tpu.ops.pallas_dense import DENSE_CT

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NORTH_STAR = 0.80

# Speed-of-light constants (fastest sustained measured rates, fast window;
# docs/PERF_NOTES.md round-5 re-profile).  These BOUND every pass.
ROWS_PER_S = 450e6          # fused row gather, small-table fast window
PAIR_HEADS_PER_S = 350e9    # dense masked-softmax kernels, per pair-head
EC_CAND_PER_S = 2.5e12      # EdgeConv broadcast-max, per candidate-channel
MXU_FLOPS = 4.0e14          # bf16 matmul


def adj_pass_seconds(adj, ph):
    """Bound for ONE pass over a binned adjacency + optional dense block.

    ``ph``: per-pair head/kernel multiplicity of the dense kernels (H for
    GAT, K for GMM).  Merge rows: the combine gather reads Km rows per
    graph row per pass (0 when no combine table)."""
    slots = sum(int(n.size) for n in adj.nbr)
    segs = sum(int(r.shape[0]) for r in adj.row)
    merge_rows = 0
    if adj.cmb is not None:
        merge_rows = int(adj.cmb.main.shape[0]) * int(adj.cmb.main.shape[1])
    t = (slots + segs + merge_rows) / ROWS_PER_S
    if adj.dense is not None:
        tiles = int(adj.dense.rc.shape[0])
        t += tiles * DENSE_RT * DENSE_CT * ph / PAIR_HEADS_PER_S
    return t


def citation_bound(name, ph_layers, train=True):
    """``ph_layers``: per-layer dense pair-head multiplicity, e.g. (4, 1)
    for GAT heads or (3, 3) for GMM kernels."""
    import bench

    graph, _, _, _ = bench._citation_graph(name)
    t = 0.0
    for ph in ph_layers:
        t += adj_pass_seconds(graph.fwd, ph)
        if train:
            t += adj_pass_seconds(graph.bwd, ph)
    return t


def edgeconv_bound(train=True):
    steps, b, p, k = (153, 64, 1024, 40) if train else (38, 64, 1024, 40)
    layer_f = (64, 64, 128, 256)  # per-layer broadcast channel widths
    cand = sum(b * p * p * f for f in layer_f)
    passes = 3.0 if train else 1.0  # fwd + ~2x bwd (tie re-check + dsrc)
    knn_flops = 4 * 2 * b * p * p * 64  # 4 layers' distance matmuls (~F=64)
    return steps * (cand * passes / EC_CAND_PER_S + knn_flops / MXU_FLOPS)


def main():
    details = json.load(open(os.path.join(ROOT, "BENCH_DETAILS.json")))
    cfgs = details["configs"]

    GAT2, GAT1 = (4, 1), (1, 1)
    GMM3, GMM2 = (3, 3), (2, 2)
    bounds = {
        "gat_cora_train": lambda: citation_bound("cora", GAT2),
        "gat_cora_infer": lambda: citation_bound("cora", GAT2, train=False),
        "gat_citeseer_train": lambda: citation_bound("citeseer", GAT2),
        "gat_citeseer_infer": lambda: citation_bound("citeseer", GAT2,
                                                     train=False),
        "gat_pubmed_train": lambda: citation_bound("pubmed", GAT2),
        "gat_pubmed_infer": lambda: citation_bound("pubmed", GAT2,
                                                   train=False),
        "gat_reddit_train": lambda: citation_bound("reddit", GAT2),
        "gat_reddit_infer": lambda: citation_bound("reddit", GAT2,
                                                   train=False),
        "gat_reddit_h1_train": lambda: citation_bound("reddit", GAT1),
        "gat_reddit_h1_infer": lambda: citation_bound("reddit", GAT1,
                                                      train=False),
        "gmm_cora_train": lambda: citation_bound("cora", GMM3),
        "gmm_cora_infer": lambda: citation_bound("cora", GMM3, train=False),
        "gmm_citeseer_train": lambda: citation_bound("citeseer", GMM3),
        "gmm_citeseer_infer": lambda: citation_bound("citeseer", GMM3,
                                                     train=False),
        "gmm_pubmed_train": lambda: citation_bound("pubmed", GMM3),
        "gmm_pubmed_infer": lambda: citation_bound("pubmed", GMM3,
                                                   train=False),
        "gmm_reddit_train": lambda: citation_bound("reddit", GMM2),
        "gmm_reddit_infer": lambda: citation_bound("reddit", GMM2,
                                                   train=False),
        "edgeconv_modelnet_train": lambda: edgeconv_bound(True),
        "edgeconv_modelnet_infer": lambda: edgeconv_bound(False),
    }

    rows = []
    for name, fn in bounds.items():
        rec = cfgs.get(name)
        if rec is None or rec.get("seconds") is None:
            rows.append((name, None, None))
            continue
        rows.append((name, rec["seconds"], fn()))

    lines = [
        "# Roofline compliance (north star: >=80% of speed-of-light)",
        "",
        "Measured epoch seconds (BENCH_DETAILS.json, real TPU) vs the",
        "speed-of-light bound built from the FASTEST sustained primitive",
        "rates this device has measured (fast tenancy window — see",
        "scripts/roofline_report.py for the bound model).  By construction",
        "fraction = bound/measured <= 100%; a row above 100% is a model",
        "error, not a PASS.  The device's ~2x multi-tenancy drift means a",
        "slow-window bench run legitimately reads ~40-50% on wall-bound",
        "configs.",
        "",
        "| config | measured s | bound s | fraction | >=80%? |",
        "|---|---|---|---|---|",
    ]
    worst_err = 0.0
    for name, meas, bound in rows:
        if meas is None:
            lines.append(f"| {name} | (not in BENCH_DETAILS) |  |  |  |")
            continue
        frac = bound / meas
        if frac > 1.0:
            flag = "MODEL ERROR (beats bound)"
            worst_err = max(worst_err, frac)
        else:
            flag = "PASS" if frac >= NORTH_STAR else "below"
        lines.append(f"| {name} | {meas:.6g} | {bound:.6g} "
                     f"| {frac:.0%} | {flag} |")
    lines += [
        "",
        "Notes:",
        "- Small-graph configs are dominated by fixed per-op overhead",
        "  (~12us fused-op floor x ~15-25 ops per step) that the",
        "  rate-model bound excludes, so their fraction understates",
        "  kernel quality; the bound is tight on the reddit-scale rows.",
        "- The >=80% north star holds only where a fast window, the",
        "  dense-hub path, and amortized fixed costs coincide; the honest",
        "  per-run summary is the table above, re-generated with each",
        "  bench refresh.",
    ]
    out = os.path.join(ROOT, "docs", "ROOFLINE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")
    if worst_err:
        print(f"WARNING: {worst_err:.2f}x bound violation — recalibrate")


if __name__ == "__main__":
    main()
