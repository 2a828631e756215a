#!/usr/bin/env bash
# Performance-regression driver (reference analogue: test/gat_result.sh,
# gmm_result.sh, edgeconv_result.sh): one CSV row per run with the schema
# name,config,train_s,infer_s,maxMB,acc
set -e
cd "$(dirname "$0")/.."
OUT=${1:-results.csv}
EPOCHS=${EPOCHS:-100}

for ds in cora citeseer pubmed; do
  python scripts/train_gat.py --dataset "$ds" --n-heads 4 --n-hidden 64 \
    --n-epochs "$EPOCHS" --output "$OUT"
  python scripts/train_gmm.py --dataset "$ds" --n-kernels 3 --pseudo-dim 2 \
    --n-hidden 64 --n-epochs "$EPOCHS" --output "$OUT"
done
# large-graph configs (synthetic Reddit scale): fewer epochs
python scripts/train_gat.py --dataset reddit --n-heads 4 --n-hidden 64 \
  --n-epochs 3 --output "$OUT"
python scripts/train_edgeconv.py --num-epochs 12 --batch-size 64 --k 40 \
  --output "$OUT"
cat "$OUT"
