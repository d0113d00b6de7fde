#!/bin/bash
# Round-4 session queue — everything still outstanding from
# scripts/r3_tpu_measurements.sh + scripts/r4_tpu_measurements.sh, in
# dependency order (fast diagnostics first, then quality sweeps, then
# artifact regeneration + bench).  ONE instance on the real chip; logs in
# results/r4_runs/.  The mri2ct 5-seed revalidation + fused + bf16 stages
# already ran (results/r3_runs/) and are not repeated.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_runs

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ==="
  "$@" 2>&1 | tee "results/r4_runs/${name}.log"
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

# 1. VERDICT r3 item 5: profiler-measured HBM traffic (fast)
run hbm python scripts/profile_hbm.py

# 2. VERDICT r3 item 6: serving-path decision data (fast)
run serving python scripts/bench_serving_paths.py

# 3. r3 queue: interrupted ct2mri 5-seed revalidation (control, cap=0.75)
run sweep_ct2mri python scripts/seed_sweep.py --direction ct2mri \
    --seeds 5 --out results/ct2mri_seed_sweep_r3.json

# 4. r4 cap stage: throttle-regression hypothesis
for cap in 1.0 0.9; do
  run "cap_${cap}" python scripts/seed_sweep.py --direction ct2mri \
      --seeds 3 --set adapt.d_acc_cap=$cap \
      --out "results/ct2mri_cap_${cap}_sweep.json"
done
run cap_mri_1.0 python scripts/seed_sweep.py --direction mri2ct \
    --seeds 3 --set adapt.d_acc_cap=1.0 \
    --out results/mri2ct_cap_1.0_sweep.json

# 5. r3 queue: fine-cadence selection sweep (VERDICT r2 item 5)
run sweep_ct2mri_fine python scripts/seed_sweep.py --direction ct2mri \
    --seeds 5 --eval-every 100 \
    --out results/ct2mri_seed_sweep_r3_ev100.json

# 6. r3 queue (exploratory): LAC critic-capacity sweep
run lac python scripts/seed_sweep.py --direction ct2mri --seeds 2 \
    --set 'critic.taps=["rm3","rm4","rm6"]' --set critic.mode=multi \
    --out results/ct2mri_lac_critic_sweep.json

echo "=== QUEUE COMPLETE ==="
