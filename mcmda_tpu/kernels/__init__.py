"""Pallas TPU kernels (rebuild-added; SURVEY native-code inventory: the
reference has no native ops, so the TPU-native work is Pallas fusion of the
hot blocks).  Every kernel has an XLA fallback that doubles as its test
oracle; `use_pallas` in RunConfig (or explicit calls) selects the path."""

from mcmda_tpu.kernels import fused_conv  # noqa: F401
