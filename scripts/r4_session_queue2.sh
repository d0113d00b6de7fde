#!/bin/bash
# Round-4 session queue v2 — remaining stages after the first queue's
# ct2mri control sweep stalled (host CPU contention; now each stage is
# timeout-bounded and seed_sweep writes incrementally + resumes with
# --merge --first-seed).  ONE instance on the real chip; keep the host
# otherwise idle.  Logs in results/r4_runs/.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_runs

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: (timeout ${tmo}s) $* ==="
  timeout "$tmo" "$@" 2>&1 | tee "results/r4_runs/${name}.log"
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

# 0. price the r4 shared-target-forward step change (also warms the new
#    adapt-step compile cache for every sweep below)
run share 2400 python scripts/bench_share_fwd.py

# 1. ct2mri 5-seed control (cap=0.75, shipped recipe) — fresh full run
run sweep_ct2mri 5400 python scripts/seed_sweep.py --direction ct2mri \
    --seeds 5 --merge --out results/ct2mri_seed_sweep_r3.json

# 2. cap sweeps (throttle-regression hypothesis)
run cap_1.0 4200 python scripts/seed_sweep.py --direction ct2mri \
    --seeds 3 --merge --set adapt.d_acc_cap=1.0 \
    --out results/ct2mri_cap_1.0_sweep.json
run cap_0.9 4200 python scripts/seed_sweep.py --direction ct2mri \
    --seeds 3 --merge --set adapt.d_acc_cap=0.9 \
    --out results/ct2mri_cap_0.9_sweep.json
run cap_mri_1.0 4200 python scripts/seed_sweep.py --direction mri2ct \
    --seeds 3 --merge --set adapt.d_acc_cap=1.0 \
    --out results/mri2ct_cap_1.0_sweep.json

# 3. fine-cadence selection (VERDICT r2 item 5)
run sweep_ct2mri_fine 7200 python scripts/seed_sweep.py --direction ct2mri \
    --seeds 5 --eval-every 100 --merge \
    --out results/ct2mri_seed_sweep_r3_ev100.json

# 4. LAC critic-capacity (exploratory)
run lac 3600 python scripts/seed_sweep.py --direction ct2mri --seeds 2 \
    --merge --set 'critic.taps=["rm3","rm4","rm6"]' --set critic.mode=multi \
    --out results/ct2mri_lac_critic_sweep.json

echo "=== QUEUE2 COMPLETE ==="
