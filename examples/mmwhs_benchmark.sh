#!/usr/bin/env bash
# Full MMWHS MRI->CT benchmark recipe (BASELINE configs 1-5).
# Prereq: raw MMWHS 2017 volumes (mr_train_*_image/label.nii.gz,
# ct_train_*_image/label.nii.gz) under $RAW.
set -euo pipefail
RAW=${RAW:-/data/mmwhs_raw}
DATA=${DATA:-/data/mmwhs}
OUT=${OUT:-runs/mri2ct}
cd "$(dirname "$0")/.."

# D2/D4: normalize + remap labels + benchmark layout
python scripts/preprocess_mmwhs.py --raw "$RAW" --out "$DATA"

# config 2: supervised source training (20 labeled MRI volumes)
python -m mcmda_tpu train-source --config configs/mri2ct.json \
    --data-root "$DATA" --out "$OUT/src"

# config 1: source-only lower bound on the 4 held-out CT volumes
python -m mcmda_tpu evaluate --config configs/mri2ct.json \
    --data-root "$DATA" --ckpt "$OUT/src/step_00020000" --source-only \
    --json-out "$OUT/no_adapt.json"

# configs 3+4: critic pretrain + PnP-AdaNet adaptation (16 unlabeled CT)
python -m mcmda_tpu adapt --config configs/mri2ct.json \
    --data-root "$DATA" --source-ckpt "$OUT/src/step_00020000" \
    --out "$OUT/adapt"

# adapted eval: the headline table (target: mean Dice ~63.9, BASELINE.md).
# Passing the RUN DIR resolves through selection.json — the unsupervised
# class-ratio-selected checkpoint (near-oracle; docs/design.md section 5c)
python -m mcmda_tpu evaluate --config configs/mri2ct.json \
    --data-root "$DATA" --ckpt "$OUT/adapt" \
    --json-out "$OUT/adapted.json"

# config 5: reverse direction with multi-level critics
python -m mcmda_tpu train-source --config configs/ct2mri.json \
    --direction ct2mri --data-root "$DATA" --out "$OUT/../ct2mri/src"
python -m mcmda_tpu adapt --config configs/ct2mri.json --direction ct2mri \
    --data-root "$DATA" --source-ckpt "$OUT/../ct2mri/src/step_00020000" \
    --out "$OUT/../ct2mri/adapt"
python -m mcmda_tpu evaluate --config configs/ct2mri.json --direction ct2mri \
    --data-root "$DATA" --ckpt "$OUT/../ct2mri/adapt" \
    --json-out "$OUT/../ct2mri/adapted.json"
