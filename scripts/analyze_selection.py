"""Offline selection-policy analysis over seed-sweep curves.

The shipped selection machinery (cli.py/api.py via adapt.SelectionProbe)
scores the live DAM and — when ``adapt.dam_ema > 0`` — ONE EMA-averaged
variant with the class-ratio prior, picking (step, variant) jointly.  The
sweep harness (scripts/seed_sweep.py) records per-block predicted class
fractions for the live weights and EIGHT EMA variants, so any restricted
policy can be re-scored offline without re-running adaptation: this script
replays ClassRatioSelector over each seed's curve for every candidate
variant subset and reports the Dice the policy would have shipped.

Usage:
    python scripts/analyze_selection.py results/mri2ct_seed_sweep_r3.json \
        [more_sweep.json ...]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 500  # select_warmup default: pretrain 0 + min(500, steps//5)


def replay(curve, src_fracs, variants):
    """ClassRatioSelector restricted to ``variants``: L1(pred fracs, source
    fracs), min over (eligible step, variant); returns the shipped Dice."""
    best = (None, float("inf"), None)
    for rec in curve:
        if rec["step"] < WARMUP:
            continue
        for v in variants:
            key = "fracs" if v == "live" else f"fracs_{v}"
            score = float(np.abs(np.asarray(rec[key], np.float64)
                                 - src_fracs).sum())
            if score < best[1]:
                dice = rec["dice" if v == "live" else f"dice_{v}"]
                best = (rec["step"], score, (v, dice))
    return best[2]


def replay_cr_ent(curve, src_fracs, topk: int = 16):
    """The shipped "cr_ent" reservoir policy (config.AdaptConfig
    .select_policy): keep the topk lowest-cr (live-variant) candidates,
    pick by 2*rank(cr) + rank(ent) within the reservoir.

    Scope: this replay covers the SHIPPED single-variant configuration
    (dam_ema=0, live weights only).  The online ClassRatioSelector mixes
    live and avg variants into one ranked pool when dam_ema>0; that dual-
    variant mode is not validated here (the logged curves carry no
    per-EMA-variant entropies)."""
    recs = [r for r in curve if r["step"] >= WARMUP]
    cr = np.array([float(np.abs(np.asarray(r["fracs"], np.float64)
                                - src_fracs).sum()) for r in recs])
    ent = np.array([r["ent"] for r in recs])
    dice = np.array([r["dice"] for r in recs])
    idx = np.argsort(cr)[:topk]
    s = 2.0 * cr[idx].argsort().argsort() + ent[idx].argsort().argsort()
    return dice[idx[np.argmin(s)]]


def main():
    policies = {
        "live": ("live",),
        "dual_ema0.9": ("live", "ema0.9"),
        "dual_ema0.95": ("live", "ema0.95"),
        "dual_ema0.9g0.25": ("live", "ema0.9g0.25"),
        "dual_ema0.95g0.25": ("live", "ema0.95g0.25"),
        "all9": ("live", "ema0.9", "ema0.95", "ema0.9g0.25", "ema0.95g0.25",
                 "ema0.9g0.2", "ema0.95g0.2", "ema0.9g0.15", "ema0.95g0.15"),
    }
    for path in sys.argv[1:]:
        d = json.load(open(path))
        src_fracs = np.asarray(d["src_fracs"], np.float64)
        print(f"\n== {path} ({d['direction']}, {d['seeds']} seeds, "
              f"oracle {d['oracle']['mean']:.3f}±{d['oracle']['std']:.3f}) ==")
        rows = {}
        for name, variants in policies.items():
            picks = []
            for seed, curve in d["curves"].items():
                pick = replay(curve, src_fracs, variants)
                picks.append(pick[1] if pick else
                             d["per_seed"][int(seed)]["final"])
            v = np.asarray(picks, np.float64)
            rows[name] = v
            print(f"  {name:18s} mean {v.mean():.4f} ± {v.std():.4f}  "
                  f"min {v.min():.4f}  per-seed "
                  + " ".join(f"{x:.3f}" for x in v))
        if "ent" in next(iter(d["curves"].values()))[0]:
            v = np.asarray([replay_cr_ent(c, src_fracs)
                            for c in d["curves"].values()], np.float64)
            print(f"  {'cr_ent (shipped)':18s} mean {v.mean():.4f} ± "
                  f"{v.std():.4f}  min {v.min():.4f}  per-seed "
                  + " ".join(f"{x:.3f}" for x in v))
    return 0


if __name__ == "__main__":
    sys.exit(main())
