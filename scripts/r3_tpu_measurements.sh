#!/bin/bash
# Round-3 TPU measurement queue — everything that was blocked on the dead
# axon tunnel (docs/roadmap.md r3 notes).  Run ONE instance on the real
# chip; each step is an independent process (never two TPU processes at
# once).  Logs land in results/r3_runs/.
#
#   bash scripts/r3_tpu_measurements.sh [stage ...]
#
# Stages (default: all, in this order):
#   fused    bench_train_fused.py — train_fused=pallas vs none step delta
#   bf16     2-seed ct2mri quality sweep with adapt.tgt_feats_bf16=true
#   sweep    5-seed revalidation sweeps, both directions (LSGAN boundary +
#            dual-variant live/EMA selection now in the recipe)
#   artifacts  full-CLI synthetic benchmark → regenerate results/*.json
#            (now incl. HD95 + deferred selection probe in the recipe)
#   bench    bench.py smoke (same JSON the driver records as BENCH_r03)
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r3_runs
STAGES=${@:-fused bf16 sweep artifacts bench}

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ==="
  "$@" 2>&1 | tee "results/r3_runs/${name}.log"
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

for s in $STAGES; do case $s in
  fused)
    run fused python scripts/bench_train_fused.py ;;
  bf16)
    run bf16 python scripts/seed_sweep.py --direction ct2mri --seeds 2 \
        --set adapt.tgt_feats_bf16=true \
        --out results/ct2mri_tgt_bf16_sweep.json ;;
  sweep)
    run sweep_mri2ct python scripts/seed_sweep.py --direction mri2ct \
        --seeds 5 --out results/mri2ct_seed_sweep_r3.json
    run sweep_ct2mri python scripts/seed_sweep.py --direction ct2mri \
        --seeds 5 --out results/ct2mri_seed_sweep_r3.json
    # finer selection cadence (VERDICT r2 item 5): the deferred probe makes
    # select_every=100 nearly free on the hot path — if this sweep's
    # "selected" mean closes on its oracle vs the 250-cadence run above,
    # re-pin adapt.select_every in config.py/configs and docs/design.md 5c
    run sweep_ct2mri_fine python scripts/seed_sweep.py --direction ct2mri \
        --seeds 5 --eval-every 100 \
        --out results/ct2mri_seed_sweep_r3_ev100.json ;;
  lac)
    # NOT in the default list (exploratory): LAC is the weakest reverse-
    # direction structure (docs/roadmap.md quality) — price a higher-
    # capacity critic: 3 taps incl. the mid-level rm3, per-tap critics.
    run lac python scripts/seed_sweep.py --direction ct2mri --seeds 2 \
        --set 'critic.taps=["rm3","rm4","rm6"]' --set critic.mode=multi \
        --out results/ct2mri_lac_critic_sweep.json ;;
  artifacts)
    run artifacts bash scripts/synthetic_benchmark.sh ;;
  bench)
    run bench python bench.py ;;
  *) echo "unknown stage: $s" >&2; exit 2 ;;
esac; done
