"""Benchmark evaluation report (the reference's final Dice/ASD table,
SURVEY section 3.3 tail): per-structure Dice and ASSD averaged over the test
volumes, printed in the paper's format and returned as a dict."""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from mcmda_tpu.data.splits import STRUCTURES
from mcmda_tpu.evaluation import inference, metrics3d


def evaluate_volumes(forward: Callable, volumes: Sequence[np.ndarray],
                     labels: Sequence[np.ndarray], *, context: int = 3,
                     batch_size: int = 8, spacing=None,
                     structures: dict = STRUCTURES,
                     single_dispatch: bool = True) -> dict:
    """Evaluate a forward fn over test volumes -> aggregated metric table.

    ``spacing``: None (voxel units), one [3] spacing for all volumes, or a
    per-volume sequence of spacings (mm-correct ASD, E2)."""
    per_vol = []
    for i, (vol, lab) in enumerate(zip(volumes, labels)):
        sp = spacing
        if sp is not None and np.ndim(sp) > 1:
            sp = spacing[i]
        pred = inference.predict_volume(forward, vol, context=context,
                                        batch_size=batch_size,
                                        single_dispatch=single_dispatch)
        per_vol.append(metrics3d.per_structure(pred, lab, structures, sp))
    agg = {}
    for name in structures.values():
        dices = [pv[name]["dice"] for pv in per_vol]
        assds = [pv[name]["assd"] for pv in per_vol
                 if np.isfinite(pv[name]["assd"])]
        agg[name] = {"dice": float(np.mean(dices)),
                     "assd": float(np.mean(assds)) if assds else float("nan")}
    agg["mean"] = {
        "dice": float(np.mean([agg[n]["dice"] for n in structures.values()])),
        "assd": float(np.nanmean([agg[n]["assd"]
                                  for n in structures.values()])),
    }
    return agg


def format_table(agg: dict) -> str:
    names = [n for n in agg if n != "mean"] + ["mean"]
    lines = [f"{'structure':>10} {'Dice':>8} {'ASSD':>8}"]
    for n in names:
        lines.append(f"{n:>10} {agg[n]['dice'] * 100:8.1f} "
                     f"{agg[n]['assd']:8.2f}")
    return "\n".join(lines)
