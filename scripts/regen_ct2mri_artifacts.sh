#!/usr/bin/env bash
# ct2mri leg of the synthetic artifact regeneration (mri2ct leg landed
# earlier this round; this restarts the interrupted half on the pinned
# r4 recipe: select_every=100, d_acc_cap=0.9).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=runs/synthetic/ct2mri
rm -rf "$OUT"
python -m mcmda_tpu train-source --config configs/ct2mri.json \
    --direction ct2mri --synthetic --out "$OUT/src"
python -m mcmda_tpu evaluate --config configs/ct2mri.json \
    --direction ct2mri --synthetic --ckpt "$OUT/src" --source-only \
    --json-out results/synthetic_ct2mri_no_adapt.json
python -m mcmda_tpu adapt --config configs/ct2mri.json \
    --direction ct2mri --synthetic --source-ckpt "$OUT/src" \
    --out "$OUT/adapt"
python -m mcmda_tpu evaluate --config configs/ct2mri.json \
    --direction ct2mri --synthetic --ckpt "$OUT/adapt" \
    --json-out results/synthetic_ct2mri_adapted.json
echo "== ct2mri artifact tables =="
python - <<'PYEOF'
import json
for kind in ("no_adapt", "adapted"):
    t = json.load(open(f"results/synthetic_ct2mri_{kind}.json"))
    print(f"ct2mri {kind:9s} mean dice {t['mean']['dice']:.3f} assd {t['mean']['assd']:.2f} hd95 {t['mean'].get('hd95', float('nan')):.2f}")
PYEOF
