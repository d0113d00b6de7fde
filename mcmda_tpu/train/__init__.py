"""Training drivers (SURVEY L4): supervised source-segmenter training (T1),
discriminator pretrain (T3), and the PnP-AdaNet alternating G/D adaptation
loop as a single jitted step (T2)."""

from mcmda_tpu.train import adapt, loop, optim, source  # noqa: F401
