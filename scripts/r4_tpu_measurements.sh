#!/bin/bash
# Round-4 TPU measurement queue — the NEW measurements this round adds on
# top of scripts/r3_tpu_measurements.sh (which must run first; r4 re-runs
# it unchanged for the recipe/quality evidence).  One instance on the real
# chip; logs land in results/r4_runs/.
#
#   bash scripts/r4_tpu_measurements.sh [stage ...]
#
# Stages (default: all, in this order):
#   hbm      profile_hbm.py — profiler-MEASURED per-step HBM traffic of the
#            adapt step (VERDICT r3 item 5: utilization must land < 1.0)
#   serving  bench_serving_paths.py — s2d vs fused-eval (pallas/xla) at
#            production geometry, f32 + bf16 (VERDICT r3 item 6)
#   cap      d_acc_cap sweep at the post-boundary-fix LSGAN recipe
#            (VERDICT r3 weak-4: the 0.75 pin was argued, not swept)
#   bench    bench.py — the round's artifact of record (now carries
#            adapt_hbm_bytes_measured)
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_runs
STAGES=${@:-hbm serving cap bench}

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ==="
  "$@" 2>&1 | tee "results/r4_runs/${name}.log"
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

for s in $STAGES; do case $s in
  hbm)     run hbm python scripts/profile_hbm.py ;;
  serving) run serving python scripts/bench_serving_paths.py ;;
  cap)
    # the r3-recipe revalidation REGRESSED ct2mri (selected_cr 0.62 vs r2's
    # 0.78, oracle 0.70 vs 0.83): with the r3 LSGAN boundary fix the
    # d_acc_cap=0.75 throttle actually engages (under the r2 biased-low
    # d_acc it never did for LSGAN).  cap=1.0 reproduces the r2 training
    # semantics exactly; 0.9 is the intermediate.  0.75 control = the
    # 5-seed sweep_ct2mri run.
    for cap in 1.0 0.9; do
      run "cap_${cap}" python scripts/seed_sweep.py --direction ct2mri \
          --seeds 3 --set adapt.d_acc_cap=$cap \
          --out "results/ct2mri_cap_${cap}_sweep.json"
    done
    # cross-check the forward direction: did 0.75 (vs no throttle) cause
    # the mri2ct improvement, or is 1.0 better there too?
    run cap_mri_1.0 python scripts/seed_sweep.py --direction mri2ct \
        --seeds 3 --set adapt.d_acc_cap=1.0 \
        --out "results/mri2ct_cap_1.0_sweep.json" ;;
  bench)   run bench python bench.py ;;
  *) echo "unknown stage: $s" >&2; exit 2 ;;
esac; done
