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
#   bench    bench.py — the round's artifact of record (now carries
#            adapt_hbm_bytes_measured)
set -u
cd "$(dirname "$0")/.."
mkdir -p results/r4_runs
STAGES=${@:-hbm serving bench}

run() {  # run <name> <cmd...>
  local name=$1; shift
  echo "=== $name: $* ==="
  "$@" 2>&1 | tee "results/r4_runs/${name}.log"
  echo "=== $name done (rc=${PIPESTATUS[0]}) ==="
}

for s in $STAGES; do case $s in
  hbm)     run hbm python scripts/profile_hbm.py ;;
  serving) run serving python scripts/bench_serving_paths.py ;;
  bench)   run bench python bench.py ;;
  *) echo "unknown stage: $s" >&2; exit 2 ;;
esac; done
