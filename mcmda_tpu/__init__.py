"""mcmda_tpu — TPU-native PnP-AdaNet cross-modality domain adaptation framework.

A brand-new JAX/XLA/Pallas rebuild of the capabilities of
carrenD/Medical-Cross-Modality-Domain-Adaptation (PnP-AdaNet, arXiv:1812.07907):
unsupervised cross-modality domain adaptation for cardiac segmentation on
MMWHS (MRI<->CT).

Spec of record: /root/repo/SURVEY.md (the reference mount was empty; all
parity targets come from the published papers — see SURVEY.md section 0).

Layout
------
- ``config``    : dataclass config system (SURVEY C1c)
- ``ops``       : functional layers, residual blocks, losses, device metrics (L2)
- ``models``    : segmenter M1, DAM split M2, critic M3, feature taps M4 (L3)
- ``data``      : volume IO, normalization, on-device augmentation, feeds (L1, D1-D4)
- ``train``     : source trainer T1, adaptation trainer T2/T3 (L4)
- ``evaluation``: per-slice inference E1, 3D stitch + Dice/ASD E2 (L5)
- ``parallel``  : mesh + shard_map data-parallel wrappers (rebuild-added)
- ``kernels``   : Pallas TPU kernels with XLA fallbacks (rebuild-added)
- ``utils``     : checkpointing (K1), metric logging (O1), PRNG discipline
"""

__version__ = "0.1.0"

from mcmda_tpu import config  # noqa: F401
