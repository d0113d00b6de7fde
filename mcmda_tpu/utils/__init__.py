"""Cross-cutting utilities: checkpointing (SURVEY K1), structured metric
logging (O1), PRNG discipline, profiling helpers."""

from mcmda_tpu.utils import checkpoint, logging, prng  # noqa: F401
