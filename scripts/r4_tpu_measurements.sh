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
    for cap in 0.6 0.9 1.0; do   # 0.75 is the shipped pin (r3 5-seed sweep)
      run "cap_${cap}" python scripts/seed_sweep.py --direction ct2mri \
          --seeds 2 --set adapt.d_acc_cap=$cap \
          --out "results/ct2mri_cap_${cap}_sweep.json"
    done ;;
  bench)   run bench python bench.py ;;
  *) echo "unknown stage: $s" >&2; exit 2 ;;
esac; done
