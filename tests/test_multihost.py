"""Multi-host (pod) DP readiness tests: REAL multi-process jax.distributed
runs on the virtual CPU platform (2 processes x 2 devices, gloo collectives).
SURVEY §1 re-layering "per-host input sharding" + §4 distributed tier.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_device(tmp_path):
    """2-process x 2-device DP train == single-device full-batch train;
    checkpoint writes gated to process 0."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))
    assert all(r["ok"] for r in results)
    assert results[0]["primary"] and not results[1]["primary"]
    # both processes computed the identical replicated loss
    assert results[0]["loss_dp"] == results[1]["loss_dp"]


_CLI_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from mcmda_tpu import cli
pid, port, out = sys.argv[1], sys.argv[2], sys.argv[3]
sys.exit(cli.main([
    "train-source", "--synthetic", "--synthetic-volumes", "2",
    "--config", "configs/smoke.json", "--out", out,
    "--multihost", "--coordinator", "127.0.0.1:" + port,
    "--num-processes", "2", "--process-id", pid, "--mh-cpu-gloo",
    "--set", "data.slice_size=32", "--set", "data.batch_size=2",
    "--set", "source.steps=4", "--set", "run.log_every=2",
    "--set", "run.ckpt_every=0", "--set", "run.donate=false",
]))
"""


def test_cli_train_source_multihost(tmp_path):
    """Full CLI train-source across 2 processes: per-host sampling + global
    batch assembly + process-0-only artifacts."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    out = str(tmp_path / "run")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _CLI_WORKER, str(pid), str(port), out],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"CLI worker failed:\n{o[-3000:]}"
        # the small synthetic set must ride the per-host-sharded
        # device-resident path (each host feeds only its dataset shard)
        assert "feed path: device-resident (per-host sharded)" in o, o[-2000:]
    # final checkpoint written exactly once (npz single-writer path)
    import glob
    ckpts = glob.glob(os.path.join(out, "step_*"))
    assert any(c.endswith("step_00000004.npz") for c in ckpts), ckpts
    # metrics written by process 0 only -> single coherent JSONL
    with open(os.path.join(out, "metrics.jsonl")) as f:
        lines = f.readlines()
    steps = [json.loads(ln)["step"] for ln in lines]
    assert steps == sorted(set(steps)), "duplicate/multi-writer metrics"


_ADAPT_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
from mcmda_tpu import cli
pid, port, src, out = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sys.exit(cli.main([
    "adapt", "--synthetic", "--synthetic-volumes", "2",
    "--config", "configs/smoke.json", "--source-ckpt", src, "--out", out,
    "--multihost", "--coordinator", "127.0.0.1:" + port,
    "--num-processes", "2", "--process-id", pid, "--mh-cpu-gloo",
    "--set", "data.slice_size=32", "--set", "data.batch_size=2",
    "--set", "adapt.steps=4", "--set", "adapt.pretrain_steps=0",
    "--set", "run.log_every=2", "--set", "run.ckpt_every=2",
    "--set", "run.donate=false",
]))
"""


def test_cli_adapt_multihost_selection(tmp_path):
    """Full CLI adaptation across 2 real processes: the alternating G/D
    step under multi-host DP, the deferred selection probe advancing
    identically on every process with artifact writes (selection.json,
    metrics, npz checkpoints) gated to process 0."""
    from mcmda_tpu import cli

    src = str(tmp_path / "src")
    rc = cli.main([
        "train-source", "--synthetic", "--synthetic-volumes", "2",
        "--config", "configs/smoke.json", "--out", src,
        "--set", "data.slice_size=32", "--set", "data.batch_size=2",
        "--set", "source.steps=4", "--set", "run.log_every=0",
        "--set", "run.ckpt_every=0", "--set", "run.donate=false"])
    assert rc in (0, None)

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    out = str(tmp_path / "adapt")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _ADAPT_WORKER, str(pid), str(port), src, out],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"adapt worker failed:\n{o[-3000:]}"

    # unsupervised selection ran and was published by process 0
    with open(os.path.join(out, "selection.json")) as f:
        rec = json.load(f)
    assert rec["signal"] == "class_ratio"
    assert 0 < rec["best_step"] <= 4
    # its checkpoint exists (multi-host single-writer npz publish)
    base = os.path.join(out, f"step_{rec['best_step']:08d}")
    assert os.path.isdir(base) or os.path.exists(base + ".npz"), \
        os.listdir(out)
    # metrics: the loop logger and the probe logger interleave by design
    # (distinct key sets per line, steps may repeat across the two), but a
    # multi-process double-writer would repeat the SAME (step, keys) line
    with open(os.path.join(out, "metrics.jsonl")) as f:
        lines = [json.loads(ln) for ln in f]
    sigs = [(ln["step"], frozenset(ln)) for ln in lines]
    assert len(sigs) == len(set(sigs)), "multi-writer duplicate lines"
    assert any("class_ratio_dist" in ln for ln in lines)
