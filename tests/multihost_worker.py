"""Multi-host DP worker (launched by tests/test_multihost.py).

A REAL ``jax.distributed`` process: 2 processes x 2 virtual CPU devices with
gloo cross-process collectives form a 4-device global mesh.  Each host loads
only its shard of the batch (per-host input sharding), trains 3 DP source
steps, and checks the result against a local single-device reference on the
full batch — the SURVEY §4 distributed tier, extended to multi-process.
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_dir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from mcmda_tpu.parallel import dp, multihost

    assert multihost.initialize(f"127.0.0.1:{port}", nproc, pid,
                                cpu_gloo=True), "did not join a >1 world"
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np
    from mcmda_tpu import config as cm
    from mcmda_tpu.data import synthetic, volumes
    from mcmda_tpu.train import source
    from mcmda_tpu.utils import checkpoint

    stages = (
        cm.StageSpec("stem", 8, 1, 1, 1),
        cm.StageSpec("rm1", 8, 2, 1, 1),
        cm.StageSpec("rm2", 16, 2, 1, 1),
        cm.StageSpec("rm3", 16, 1, 2, 1),
    )
    cfg = cm.ExperimentConfig(
        segmenter=cm.SegmenterConfig(stages=stages),
        data=cm.DataConfig(slice_size=32, batch_size=16, shift_pixels=2.0),
    )

    vols, labs = synthetic.make_dataset(0, "mri", 2, depth=8, size=32)
    ds = volumes.volumes_to_slices(vols, labs)
    n = 16
    images = ds.images[:n]
    onehot = np.eye(5, dtype=np.float32)[ds.labels[:n]]

    mesh = multihost.global_mesh()
    # per-host INPUT sharding: this process materializes ONLY its rows
    lo, hi = multihost.host_shard_range(n)
    gbatch = multihost.global_batch(
        {"image": images[lo:hi], "label": onehot[lo:hi]}, mesh)

    state0 = source.init_state(jax.random.key(0), cfg)
    gstate = multihost.replicate(state0, mesh)
    gkey = multihost.replicate(jax.random.key(9), mesh)
    step = dp.data_parallel_step(
        source.make_train_step(cfg, axis_name="data", augment=False), mesh,
        donate=False)
    for _ in range(3):
        gstate, gmetrics = step(gstate, gbatch, gkey)

    # local single-device reference on the FULL batch
    ref = source.init_state(jax.random.key(0), cfg)
    single = jax.jit(source.make_train_step(cfg, augment=False))
    full = {"image": jax.numpy.asarray(images),
            "label": jax.numpy.asarray(onehot)}
    for _ in range(3):
        ref, rmetrics = single(ref, full, jax.random.key(9))

    got = multihost.fetch_replicated(gstate.params)
    want = jax.device_get(ref.params)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    loss_dp = float(np.asarray(multihost.fetch_replicated(gmetrics["loss"])))
    loss_ref = float(rmetrics["loss"])
    assert abs(loss_dp - loss_ref) < 1e-3 * max(1.0, abs(loss_ref))

    # artifact gating: both processes call save; only process 0 may write.
    # Probe the gate race-free with a per-process scratch dir first (a shared
    # dir can't distinguish "I wrote" from "the peer already wrote").
    probe_dir = os.path.join(out_dir, f"probe_{pid}")
    host_state = multihost.fetch_replicated(gstate)
    checkpoint.save(probe_dir, host_state, step=3, block=True)
    probe = os.path.join(probe_dir, "step_00000003")
    wrote = os.path.exists(probe) or os.path.exists(probe + ".npz")
    assert wrote == multihost.is_primary(), (wrote, pid)
    # the real shared-dir save all processes will restore from
    ckpt_dir = os.path.join(out_dir, "ckpt")
    checkpoint.save(ckpt_dir, host_state, step=3, block=True)
    base = os.path.join(ckpt_dir, "step_00000003")
    # and the single-writer checkpoint restores on EVERY process.  Wait for
    # process 0 via a filesystem poll, NOT a collective: by this point the
    # processes have skewed by their independent single-device compiles, and
    # gloo context creation for a fresh cross-process collective has a
    # hardcoded 30 s key-value timeout that loses to compile skew under load
    # (the one observed flake in this test).
    import time
    deadline = time.time() + 300
    while not (os.path.exists(base) or os.path.exists(base + ".npz")):
        assert time.time() < deadline, "process 0 never wrote the checkpoint"
        time.sleep(0.2)
    restored = checkpoint.restore(base, host_state)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(host_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as f:
        json.dump({"ok": True, "pid": pid, "loss_dp": loss_dp,
                   "loss_ref": loss_ref,
                   "primary": multihost.is_primary()}, f)
    print(f"[{pid}] MULTIHOST OK loss={loss_dp:.5f}", flush=True)


if __name__ == "__main__":
    main()
