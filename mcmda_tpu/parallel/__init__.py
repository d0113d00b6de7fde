"""Parallelism layer (rebuild-added; SURVEY section 2 parallelism table).

The reference is single-GPU; the TPU rebuild scales data-parallel over an ICI
mesh: batches sharded on the "data" axis, params replicated, gradients
psum-averaged inside the jitted step (XLA lowers the collective to ICI
all-reduce).  Tensor/pipeline/expert parallelism are documented out of scope
for this ~20M-param model (SURVEY section 2)."""

from mcmda_tpu.parallel import dp, mesh  # noqa: F401
