"""Models layer (SURVEY L3): the dilated-residual segmenter (M1), the
plug-and-play DAM split (M2), multi-level feature taps (M4), and the
feature-space PatchGAN domain critic (M3)."""

from mcmda_tpu.models import critic, segmenter  # noqa: F401
