"""Data pipeline (SURVEY L1, D1-D4): volume decode (npz/NIfTI), per-volume
intensity normalization, 3-adjacent-slice stacking, on-device jittable
augmentation, host sampler + double-buffered device feeds, benchmark splits,
and a synthetic MMWHS-like dataset for tests."""

from mcmda_tpu.data import pipeline, splits, synthetic, volumes  # noqa: F401
