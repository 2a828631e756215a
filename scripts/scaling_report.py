"""Analytic multi-chip scaling report for the Reddit-scale R-MAT (VERDICT
round-1 item 9): partitions the graph into N shards with the vectorized
partitioner and derives per-layer halo volume, comm time over ICI, local
aggregation time at the measured gather rate, and scaling efficiency — all
from the static plan, no multi-chip hardware needed.

Writes docs/SCALING_REPORT.md.  Run: python scripts/scaling_report.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side analysis only

    from dgnn_tpu.parallel.distributed import scaling_report
    from dgnn_tpu.parallel.partition import partition_graph

    cache = os.path.join(REPO, ".bench_cache",
                         "rmat_graph_232965_114615892_d6.npz")
    z = np.load(cache)
    meta = json.loads(bytes(z["meta_json"]).decode())
    row_ptr = z["row_ptr"].astype(np.int64)
    col_ind = z["col_ind"].astype(np.int64)
    n = meta["num_nodes"]
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))

    h, f = 4, 64
    row_bytes = (h * f + h) * 4  # features ++ attn_col per halo row
    lines = [
        "# Analytic multi-chip scaling — Reddit-scale R-MAT, 3-layer GAT "
        "halo design",
        "",
        f"Graph: N={n:,} nodes, E={len(col_ind):,} edges (the benchmark's "
        "Reddit-scale R-MAT).",
        "Model row: H=4 heads, F=64 — one halo row = features ++ attn_col = "
        f"{row_bytes} B.",
        "",
        "Derivation: `parallel/partition.py` fixes the exact boundary rows "
        "each shard",
        "exchanges per layer (one all_to_all, `parallel/spmd.py`); "
        "`parallel/distributed.py`",
        "converts the plan to seconds with the measured machine constants "
        "(docs/PERF_NOTES.md:",
        "gathers 140M rows/s, ICI ~45 GB/s/direction/chip).  Local "
        "aggregation overlaps the",
        "exchange (the local bin set has no data dependency on the halo), so "
        "per-layer time",
        "is max(local, comm).",
        "",
        "| shards | halo rows/shard | halo MB/shard | comm ms | local ms | "
        "efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for p in (2, 4, 8, 16):
        t0 = time.time()
        shards = partition_graph(col_ind, rows, n, p, widths=(16, 64, 256))
        rep = scaling_report(shards, row_bytes)
        lines.append(
            f"| {p} | {rep.halo_rows_per_shard:,} | "
            f"{rep.halo_bytes_per_shard/1e6:.0f} | "
            f"{rep.comm_seconds*1e3:.1f} | {rep.local_seconds*1e3:.1f} | "
            f"{rep.efficiency*100:.0f}% |")
        print(lines[-1], f"(partition wall {time.time()-t0:.0f}s)",
              flush=True)
    lines += [
        "",
        "Notes:",
        "- Efficiency = T(1) / (P * T(P)) with T(P) = max(local, comm): the ",
        "  all_to_all rides ICI while local-source bins aggregate.",
        "- Reddit's hub structure makes halo sets large (most nodes border "
        "every shard),",
        "  so comm approaches the full feature volume — the known "
        "full-graph-GNN limit;",
        "  the dense hub-block path (graph/hub.py) does not yet partition, "
        "so these",
        "  numbers describe the all-binned sharded path.",
        "- Partitioning the full 114.8M-edge graph into 8 shards takes "
        "under two minutes",
        "  host-side (vectorized halo plan; round-1's O(P^2) pair loop is "
        "gone).",
    ]
    out = os.path.join(REPO, "docs", "SCALING_REPORT.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
