"""Functional ops layer (SURVEY L2): conv / dilated conv / BN / residual
blocks / losses / device-side metrics.  Everything is init/apply-style pure
functions over plain dict pytrees, so freezing a submodule (the PnP-AdaNet
DAM/HLM split) is a pytree filter, not graph surgery.
"""

from mcmda_tpu.ops import blocks, layers, losses, metrics  # noqa: F401
