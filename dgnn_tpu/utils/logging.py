"""CSV result logging with the reference's schema
(`name,config,train_s,infer_s,maxMB,acc` — test/gat_result.csv)."""

from __future__ import annotations

__all__ = ["append_csv_row"]


def append_csv_row(path: str, name: str, config: str, train_s: float,
                   infer_s: float, max_mb: float, acc: float) -> None:
    with open(path, "a") as f:
        print(f"{name},{config},{train_s:f}s,{infer_s:f}s,{max_mb:.0f}MB,{acc}",
              file=f)
