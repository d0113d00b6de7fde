"""Per-op device-time breakdown of the adaptation train step.

The r4 measured-HBM result (results/hbm_profile.json) put the adapt step at
~11% of the profiler's HBM peak and ~36% MFU — NEITHER roofline binds, so
the remaining time must sit in op-granularity/occupancy effects the
aggregate numbers can't see.  This script traces the production chained
adapt step (same setup as scripts/profile_hbm.py) and reports the top HLO
ops by total device self-time from the xprof ``roofline_model`` tool,
plus the idle/total split.

Usage (real TPU):  python scripts/profile_topops.py [--steps 20] [--top 40]
Writes results/adapt_topops.json.
"""

import argparse
import dataclasses
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def top_ops_from_trace(logdir: str, top: int):
    """Top rows of the xprof roofline_model per-op table by self-time.

    Returns (rows, meta): rows = list of dicts (whole-window "Total"-step
    per-op aggregates, including the synthetic Total/IDLE rows flagged),
    meta = {cols: [...]}.  None if no device data.
    """
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        return None
    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not paths:
        return None
    data, _fmt = raw_to_tool_data.xspace_to_tool_data(
        paths, "roofline_model", {})
    tables = json.loads(data if isinstance(data, str) else data.decode())
    if not isinstance(tables, list):
        tables = [tables]
    for tbl in tables:
        rows = tbl.get("rows") or []
        if not rows:
            continue
        cols = [c["id"] for c in tbl["cols"]]
        idx = {c: i for i, c in enumerate(cols)}
        if "total_self_time" not in idx or "operation" not in idx:
            continue

        def val(row, key, default=None):
            if key not in idx:
                return default
            cell = row["c"][idx[key]]
            v = cell.get("v") if isinstance(cell, dict) else cell
            return default if v is None else v

        steps = {str(val(r, "step", "")) for r in rows}
        want = "Total" if "Total" in steps else None
        out = {}
        for r in rows:
            if want is not None and str(val(r, "step", "")) != want:
                continue
            rec = {k: val(r, k) for k in (
                "operation", "category", "total_self_time", "occurrences",
                "hbm_bw", "flop_rate", "measured_flop_rate", "bound_by",
                "operation_intensity", "total_time_per_core")
                if k in idx}
            # the roofline table repeats each op row (per-core duplicate of
            # a single-core trace) — keep one row per op name, else every
            # percentage doubles and the table truncates at half depth
            # (the r4 adapt_topops.json artifact had exactly this defect)
            out[str(rec.get("operation"))] = rec
        out = sorted(out.values(),
                     key=lambda r: -(r.get("total_self_time") or 0.0))
        return out, {"cols": cols}
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default="results/adapt_topops.json")
    p.add_argument("--batch", type=int, default=0,
                   help="override data.batch_size (0 = config default); "
                        "used to diagnose the super-linear batch-curve "
                        "slowdown (results/batching_bench.json)")
    args = p.parse_args()

    from mcmda_tpu.config import ExperimentConfig
    from mcmda_tpu.models import segmenter
    from mcmda_tpu.train import adapt
    from mcmda_tpu.utils import jax_cache, profiling
    jax_cache.enable()

    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, warp="pallas",
            **({"batch_size": args.batch} if args.batch else {})),
        adapt=dataclasses.replace(cfg.adapt, src_feats_bf16=True))
    b = cfg.data.batch_size
    src_params, src_bn = segmenter.init(jax.random.key(0), cfg.segmenter)
    a_state = adapt.init_state(jax.random.key(1), cfg, src_params, src_bn)
    a_batch = {
        "src_image": jax.random.normal(jax.random.key(2), (b, 256, 256, 3)),
        "tgt_image": jax.random.normal(jax.random.key(3), (b, 256, 256, 3)),
    }
    step_fn = adapt.make_adapt_step(cfg)

    def run_k(state, batch, rng):
        def body(st, k):
            st, m = step_fn(st, batch, jax.random.fold_in(rng, k))
            return st, m["g_loss"]
        return jax.lax.scan(body, state, jnp.arange(args.steps))

    run_j = jax.jit(run_k)
    st, out = run_j(a_state, a_batch, jax.random.key(4))
    _ = float(out[-1])
    logdir = tempfile.mkdtemp(prefix="topops_trace_")
    try:
        with profiling.trace(logdir):
            st, out = run_j(st, a_batch, jax.random.key(5))
            _ = float(out[-1])
        got = top_ops_from_trace(logdir, args.top)
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    if got is None:
        print(json.dumps({"error": "no device roofline data in trace"}))
        return 1
    rows, meta = got

    total = next((r for r in rows
                  if str(r.get("operation", "")).lower() == "total"), None)
    tot_us = (total or {}).get("total_self_time") or sum(
        r.get("total_self_time") or 0.0 for r in rows)
    print(f"# columns: {meta['cols']}")
    print(f"# total self-time in window: {tot_us/1e3:.2f} ms "
          f"({tot_us/1e3/args.steps:.3f} ms/step)")
    cum = 0.0
    shown = []
    for r in rows:
        op = str(r.get("operation", ""))
        t = r.get("total_self_time") or 0.0
        if op.lower() == "total":
            continue
        cum += t if op.lower() != "idle" else 0.0
        line = {**r, "pct": round(100.0 * t / tot_us, 2)}
        shown.append(line)
        print(f"{line['pct']:6.2f}%  {t/args.steps:9.1f} us/step  "
              f"occ={r.get('occurrences')}  bw={r.get('hbm_bw')}  "
              f"bound={r.get('bound_by')}  {op[:110]}")
        if len(shown) >= args.top:
            break
    by_cat = {}
    for r in rows:
        op = str(r.get("operation", "")).lower()
        if op in ("total", "idle"):
            continue
        c = str(r.get("category", "?"))
        by_cat[c] = by_cat.get(c, 0.0) + (r.get("total_self_time") or 0.0)
    print("# by category:")
    for c, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {100.0 * t / tot_us:6.2f}%  {t / args.steps:9.1f} us/step  {c}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"steps": args.steps, "total_self_time_us": tot_us,
                   "by_category_us": by_cat, "rows": shown}, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
