"""Evaluation layer (SURVEY L5): per-slice jitted inference (E1), 3D volume
stitching + per-structure Dice/ASD metrics (E2), and the benchmark report
table."""

from mcmda_tpu.evaluation import (inference, metrics3d,  # noqa: F401
                                  report, snapshots)
