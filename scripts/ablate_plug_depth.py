"""Plug-depth ablation (the paper's SV study: WHERE to plug the DAM —
early vs middle; middle was best [P1 SV]).

Trains one source segmenter on the synthetic cross-modality set, then runs
the adversarial adaptation at each requested plug depth and reports adapted
target Dice per depth.

Usage: python scripts/ablate_plug_depth.py [--cpu] [--depths rm1,rm2,rm3]
"""

import argparse
import os.path
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--depths", default="rm1,rm2,rm3")
p.add_argument("--source-steps", type=int, default=400)
p.add_argument("--adapt-steps", type=int, default=300)
p.add_argument("--pretrain-steps", type=int, default=60)
args = p.parse_args()

import os  # noqa: E402
if args.cpu:
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=8"
import jax  # noqa: E402
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

from mcmda_tpu import config as cm  # noqa: E402
from mcmda_tpu.data import pipeline, synthetic, volumes as vio  # noqa: E402
from mcmda_tpu.evaluation import report  # noqa: E402
from mcmda_tpu.train import adapt, loop, source  # noqa: E402

SIZE, DEPTH = 64, 16
with open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "smoke.json")) as f:
    base = cm.ExperimentConfig.from_json(f.read())
base = dataclasses.replace(
    base,
    source=dataclasses.replace(base.source, steps=args.source_steps),
    adapt=dataclasses.replace(base.adapt, steps=args.adapt_steps,
                              pretrain_steps=args.pretrain_steps))

mri_v, mri_l = synthetic.make_dataset(0, "mri", 4, DEPTH, SIZE)
ct_v, ct_l = synthetic.make_dataset(0, "ct", 4, DEPTH, SIZE)
mri_ds = vio.volumes_to_slices(mri_v[:3], mri_l[:3])
ct_ds = vio.volumes_to_slices(ct_v[:3])

# phase 1 once
state = source.init_state(jax.random.key(0), base)
step = jax.jit(source.make_train_step(base))
feed = pipeline.prefetch_to_device(iter(pipeline.BatchSampler(
    mri_ds, base.data.batch_size, seed=1, num_classes=5)))
state, _ = loop.run(step, state, feed, base.source.steps, log_every=0)
fwd = jax.jit(lambda img: source.make_eval_forward(base)(
    state.params, state.bn_state, img))
no_adapt = report.evaluate_volumes(fwd, ct_v[3:], ct_l[3:],
                                   batch_size=8)["mean"]["dice"]
print(f"no-adapt CT mean Dice: {no_adapt:.3f}", flush=True)

results = {}
for depth in args.depths.split(","):
    cfg = dataclasses.replace(base, adapt=dataclasses.replace(
        base.adapt, plug_depth=depth))
    a_state = adapt.init_state(jax.random.key(2), cfg, state.params,
                               state.bn_state)
    src_s = iter(pipeline.BatchSampler(mri_ds, cfg.data.batch_size, seed=3))
    tgt_s = iter(pipeline.BatchSampler(ct_ds, cfg.data.batch_size, seed=4))
    pairs = ({"src_image": a["image"], "tgt_image": b["image"]}
             for a, b in zip(src_s, tgt_s))
    feed_a = pipeline.prefetch_to_device(pairs)
    pre = jax.jit(adapt.make_adapt_step(cfg, train_g=False))
    a_state, _ = loop.run(pre, a_state, feed_a, cfg.adapt.pretrain_steps,
                          log_every=0)
    stp = jax.jit(adapt.make_adapt_step(cfg))
    a_state, _ = loop.run(stp, a_state, feed_a, cfg.adapt.steps, log_every=0)
    afwd = jax.jit(lambda img, s=a_state, c=cfg: adapt.adapted_forward(c)(s, img))
    d = report.evaluate_volumes(afwd, ct_v[3:], ct_l[3:],
                                batch_size=8)["mean"]["dice"]
    results[depth] = d
    print(f"plug_depth={depth}: adapted CT mean Dice {d:.3f} "
          f"(gain {d - no_adapt:+.3f})", flush=True)

best = max(results, key=results.get)
print(f"\nbest depth: {best} ({results[best]:.3f})")
