#!/bin/bash
# Round-4 session queue v3 — the src_feats_bf16 hypothesis takes priority.
#
# Finding so far (results/ct2mri_{seed_sweep_r3,cap_1.0_sweep}.json): the
# ct2mri regression (r2 selected_cr 0.78/oracle 0.83 -> r3 0.62/0.70) is
# NOT restored by removing the d_acc_cap throttle (cap=1.0: 0.68/0.68).
# Git archaeology: the r2 headline ct2mri sweep (91c0d85, 08-17 04:22)
# PREDATES adapt.src_feats_bf16 (07fe6b6, 08-17 06:02) — the flag shipped
# on a step-speed number plus the "carries no gradient" argument, which
# the r4 tgt_feats_bf16 sweep has since shown is insufficient: bf16 noise
# in the critic's view destabilizes the minimax.  These stages price that
# flag on ct2mri (and sanity-check mri2ct, whose r3 revalidation WITH the
# flag stayed good: 0.831/0.849).
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_runs

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: (timeout ${tmo}s) $* ==="
  timeout "$tmo" "$@" 2>&1 | tee "results/r4_runs/${name}.log"
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

# 1. isolate src_feats_bf16 at the shipped cap
run srcf32 4200 python scripts/seed_sweep.py --direction ct2mri \
    --seeds 3 --merge --set adapt.src_feats_bf16=false \
    --out results/ct2mri_srcf32_sweep.json

# 2. joint: src f32 + no throttle (the full r2 training semantics,
#    modulo the exact s2d thin-stage execution)
run srcf32_cap1 4200 python scripts/seed_sweep.py --direction ct2mri \
    --seeds 3 --merge --set adapt.src_feats_bf16=false \
    --set adapt.d_acc_cap=1.0 \
    --out results/ct2mri_srcf32_cap1_sweep.json

# 3. mri2ct cap cross-check (from queue v2)
run cap_mri_1.0 4200 python scripts/seed_sweep.py --direction mri2ct \
    --seeds 3 --merge --set adapt.d_acc_cap=1.0 \
    --out results/mri2ct_cap_1.0_sweep.json

echo "=== QUEUE3 COMPLETE ==="
