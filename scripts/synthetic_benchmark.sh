#!/usr/bin/env bash
# Full synthetic-phantom benchmark through the shipped CLI configs — the
# judge-reproducible quality pipeline (BASELINE configs 1-5 on the synthetic
# stand-in; see examples/mmwhs_benchmark.sh for the real-data recipe).
# Regenerates results/synthetic_{mri2ct,ct2mri}_{no_adapt,adapted}.json.
# Adapted evals resolve through selection.json (unsupervised class-ratio
# checkpoint selection, docs/design.md section 5c).
set -euo pipefail
cd "$(dirname "$0")/.."
RUNS=${RUNS:-runs/synthetic}

for DIR in mri2ct ct2mri; do
  OUT="$RUNS/$DIR"
  python -m mcmda_tpu train-source --config "configs/$DIR.json" \
      --direction "$DIR" --synthetic --out "$OUT/src"
  python -m mcmda_tpu evaluate --config "configs/$DIR.json" \
      --direction "$DIR" --synthetic --ckpt "$OUT/src" --source-only \
      --json-out "results/synthetic_${DIR}_no_adapt.json"
  python -m mcmda_tpu adapt --config "configs/$DIR.json" \
      --direction "$DIR" --synthetic --source-ckpt "$OUT/src" \
      --out "$OUT/adapt"
  python -m mcmda_tpu evaluate --config "configs/$DIR.json" \
      --direction "$DIR" --synthetic --ckpt "$OUT/adapt" \
      --json-out "results/synthetic_${DIR}_adapted.json"
done
echo "== synthetic benchmark tables =="
python - <<'EOF'
import json
for d in ("mri2ct", "ct2mri"):
    for kind in ("no_adapt", "adapted"):
        t = json.load(open(f"results/synthetic_{d}_{kind}.json"))
        print(f"{d} {kind:9s} mean dice {t['mean']['dice']:.3f}")
EOF
