"""Offline selection-policy SEARCH over logged seed-sweep probe curves.

VERDICT r4 item 4: the ct2mri selector tracking gap (cr_ent 0.701 vs oracle
0.766 live r5; hard seeds mis-picked by one noisy probe tick).  Every sweep
artifact logs, per selection tick, the live probe's predicted class
fractions and mean prediction entropy alongside the (oracle-only) probe
Dice — so ANY policy over (fracs, ent) streams can be re-scored offline
against ~50 logged ct2mri seeds and ~13 mri2ct seeds without re-running
adaptation.  This script replays the shipped policies plus denoised /
re-weighted candidates:

  cr            argmin L1(fracs, src_fracs)                       (r2 ship)
  cr_ent        topk by cr, argmin 2*rank(cr)+rank(ent)           (r4 ship)
  cr_sN         cr on fracs smoothed with a centered N-tick boxcar
  cr_ent_sN     cr_ent with BOTH signals boxcar-smoothed (N ticks)
  cr_entW_sN    smoothed, rank weights cr:ent = W (e.g. 1 -> 1:1)
  ent_in_crK    pure entropy rank within the cr top-K reservoir

Replays mirror the ONLINE reservoir semantics: the streaming topk-by-cr
reservoir's final content equals the global topk, and a centered smoothing
window is realizable online with an N//2-tick resolution delay (selection
is already resolved retrospectively at stash time).  Usage:

    python scripts/policy_search.py results/*.json
"""

import json
import sys

import numpy as np

WARMUP = 500


def smooth(x, w, kind="box"):
    """Centered window; edges use the available (shorter) window."""
    if w <= 1:
        return np.asarray(x, np.float64)
    x = np.asarray(x, np.float64)
    out = np.empty_like(x)
    h = w // 2
    for i in range(len(x)):
        lo, hi = max(0, i - h), min(len(x), i + h + 1)
        win = x[lo:hi]
        if kind == "med":
            out[i] = np.median(win, axis=0)
        elif kind == "tri":
            ww = (h + 1 - np.abs(np.arange(lo, hi) - i)).astype(np.float64)
            out[i] = (win * (ww[:, None] if x.ndim > 1 else ww)).sum(axis=0) \
                / ww.sum()
        else:
            out[i] = win.mean(axis=0)
    return out


def make_policies():
    pol = {}

    def cr_pick(cr, ent, dice):
        return dice[int(np.argmin(cr))]

    def cr_ent_pick(cr, ent, dice, topk=16, w_cr=2.0):
        idx = np.argsort(cr)[:topk]
        s = w_cr * cr[idx].argsort().argsort() + ent[idx].argsort().argsort()
        return dice[idx[int(np.argmin(s))]]

    def ent_in_cr(cr, ent, dice, topk=16):
        idx = np.argsort(cr)[:topk]
        return dice[idx[int(np.argmin(ent[idx]))]]

    pol["cr"] = (cr_pick, 1)
    pol["cr_ent"] = (cr_ent_pick, 1)          # shipped r4
    for w in (3, 5, 7, 9):
        pol[f"cr_s{w}"] = (cr_pick, w)
        pol[f"cr_ent_s{w}"] = (cr_ent_pick, w)
        pol[f"cr_ent1_s{w}"] = (lambda c, e, d: cr_ent_pick(c, e, d,
                                                            w_cr=1.0), w)
    pol["cr_ent1"] = (lambda c, e, d: cr_ent_pick(c, e, d, w_cr=1.0), 1)
    pol["cr_ent3"] = (lambda c, e, d: cr_ent_pick(c, e, d, w_cr=3.0), 1)
    pol["cr_ent_k8"] = (lambda c, e, d: cr_ent_pick(c, e, d, topk=8), 1)
    pol["cr_ent_k32"] = (lambda c, e, d: cr_ent_pick(c, e, d, topk=32), 1)
    pol["ent_in_cr16"] = (ent_in_cr, 1)
    pol["ent_in_cr16_s5"] = (ent_in_cr, 5)
    for w in (3, 5):
        pol[f"cr_m{w}"] = (cr_pick, (w, "med"))
        pol[f"cr_t{w}"] = (cr_pick, (w, "tri"))
        pol[f"cr_ent_m{w}"] = (cr_ent_pick, (w, "med"))
    return pol


def replay_curve(curve, src_fracs, fn, w):
    recs = [r for r in curve if r["step"] >= WARMUP and "ent" in r]
    if not recs:
        return None
    w, kind = w if isinstance(w, tuple) else (w, "box")
    fr = np.asarray([r["fracs"] for r in recs], np.float64)
    ent = np.asarray([r["ent"] for r in recs], np.float64)
    dice = np.asarray([r["dice"] for r in recs], np.float64)
    fr_s = smooth(fr, w, kind)
    ent_s = smooth(ent, w, kind)
    cr = np.abs(fr_s - src_fracs).sum(axis=1)
    return float(fn(cr, ent_s, dice))


def main():
    pol = make_policies()
    groups = {}  # direction -> list of (artifact, seed, oracle, {policy: dice})
    for path in sys.argv[1:]:
        try:
            d = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        if "curves" not in d or "src_fracs" not in d:
            continue
        src = np.asarray(d["src_fracs"], np.float64)
        for seed, curve in d["curves"].items():
            if not curve or "ent" not in curve[0]:
                continue
            oracle = max(r["dice"] for r in curve)
            row = {}
            for name, (fn, w) in pol.items():
                v = replay_curve(curve, src, fn, w)
                if v is None:
                    row = None
                    break
                row[name] = v
            if row is None:
                continue
            groups.setdefault(d["direction"], []).append(
                (path, seed, oracle, row))
    for direction, rows in sorted(groups.items()):
        oracles = np.array([r[2] for r in rows])
        print(f"\n== {direction}: {len(rows)} seeds, oracle "
              f"{oracles.mean():.4f}±{oracles.std():.4f} "
              f"min {oracles.min():.4f} ==")
        stats = []
        for name in pol:
            v = np.array([r[3][name] for r in rows])
            gap = oracles - v
            stats.append((v.mean(), name, v.std(), v.min(), gap.mean(),
                          gap.max()))
        stats.sort(reverse=True)
        print(f"{'policy':<16}{'mean':>8}{'std':>8}{'min':>8}"
              f"{'gap_mu':>8}{'gap_max':>9}")
        for mean, name, std, vmin, gmu, gmx in stats:
            print(f"{name:<16}{mean:8.4f}{std:8.4f}{vmin:8.4f}"
                  f"{gmu:8.4f}{gmx:9.4f}")


if __name__ == "__main__":
    main()
