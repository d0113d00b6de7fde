#!/bin/bash
# Round-4 session queue 5 — remaining measurement stages after the
# single-knob regression hunt (docs/roadmap.md "ct2mri REGRESSION HUNT"):
#
#   hbm2        retry the profiler-measured HBM traffic stage (the first
#               attempt died on a transient TPU FailedPrecondition readback;
#               VERDICT r3 item 5: utilization must land < 1.0)
#   cap_0.9_ext power the best-cap comparison: extend the 3-seed
#               d_acc_cap=0.9 sweep to 5 seeds via --merge
#   lac         critic-capacity sweep (3 taps incl. rm3, per-tap critics) —
#               VERDICT r3 item 7
#   fine        candidate re-pin recipe: cap=0.9 + 100-step selection
#               cadence, 5 seeds (VERDICT r3 weak-5)
#
# One instance on the real chip; logs land in results/r4_runs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_runs

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 4200 "$@" 2>&1 | tee "results/r4_runs/${name}.log"
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

run hbm2 python scripts/profile_hbm.py

run cap_0.9_ext python scripts/seed_sweep.py --direction ct2mri \
    --seeds 2 --first-seed 3 --merge --set adapt.d_acc_cap=0.9 \
    --out results/ct2mri_cap_0.9_sweep.json

run lac python scripts/seed_sweep.py --direction ct2mri --seeds 2 \
    --set 'critic.taps=["rm3","rm4","rm6"]' --set critic.mode=multi \
    --out results/ct2mri_lac_critic_sweep.json

run fine python scripts/seed_sweep.py --direction ct2mri --seeds 5 \
    --eval-every 100 --set adapt.d_acc_cap=0.9 \
    --out results/ct2mri_cap0.9_ev100_sweep.json

echo "=== queue5 complete ==="
