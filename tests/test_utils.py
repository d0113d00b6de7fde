"""Utils tests: TensorBoard event framing round-trip, snapshots, logging,
prng discipline, profiling timer."""

import json
import struct

import numpy as np

from mcmda_tpu.utils import logging as mlog, prng, profiling, tensorboard as tb


def _read_records(path):
    out = []
    with open(path, "rb") as f:
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                return out
            (length,) = struct.unpack("<Q", hdr)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == tb._masked_crc(hdr), "header crc mismatch"
            rec = f.read(length)
            (rcrc,) = struct.unpack("<I", f.read(4))
            assert rcrc == tb._masked_crc(rec), "record crc mismatch"
            out.append(rec)


def _parse_scalars(rec):
    """Minimal proto walk: find Event.summary(5) -> Value(1) ->
    {tag(1), simple_value(2)}."""
    def walk(buf):
        i, fields = 0, []
        while i < len(buf):
            key, n = _uvarint(buf, i)
            i = n
            field, wire = key >> 3, key & 7
            if wire == 0:
                val, i = _uvarint(buf, i)
            elif wire == 1:
                val, i = buf[i:i + 8], i + 8
            elif wire == 5:
                val, i = buf[i:i + 4], i + 4
            elif wire == 2:
                ln, i = _uvarint(buf, i)
                val, i = buf[i:i + ln], i + ln
            else:
                raise ValueError(wire)
            fields.append((field, wire, val))
        return fields

    def _uvarint(buf, i):
        shift = val = 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val, i
            shift += 7

    scalars = {}
    for field, wire, val in walk(rec):
        if field == 5 and wire == 2:  # summary
            for f2, w2, v2 in walk(val):
                if f2 == 1 and w2 == 2:  # value
                    tag = sv = None
                    for f3, w3, v3 in walk(v2):
                        if f3 == 1 and w3 == 2:
                            tag = v3.decode()
                        if f3 == 2 and w3 == 5:
                            (sv,) = struct.unpack("<f", v3)
                    scalars[tag] = sv
    return scalars


def test_event_writer_roundtrip(tmp_path):
    w = tb.EventWriter(str(tmp_path))
    w.scalars(7, {"loss": 1.25, "d_acc": 0.5})
    w.scalars(8, {"loss": 1.0})
    w.close()
    records = _read_records(w.path)
    assert len(records) == 3  # header + 2
    s = _parse_scalars(records[1])
    assert abs(s["loss"] - 1.25) < 1e-6 and abs(s["d_acc"] - 0.5) < 1e-6


def test_crc32c_known_value():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert tb.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_metrics_logger_jsonl_and_tb(tmp_path):
    lg = mlog.MetricsLogger(str(tmp_path / "m.jsonl"), echo=False,
                            tensorboard_dir=str(tmp_path / "tb"))
    lg.log(1, {"loss": 2.0})
    lg.close()
    rec = json.loads((tmp_path / "m.jsonl").read_text().splitlines()[0])
    assert rec["step"] == 1 and rec["loss"] == 2.0
    assert list((tmp_path / "tb").glob("events.out.tfevents.*"))


def test_snapshot_png(tmp_path):
    from mcmda_tpu.evaluation import snapshots
    imgs = np.random.default_rng(0).normal(size=(2, 16, 16, 3))
    preds = np.zeros((2, 16, 16), np.int32)
    preds[:, 4:8, 4:8] = 3
    path = snapshots.save_snapshot(str(tmp_path / "snap.png"), imgs, preds,
                                   truths=preds)
    from PIL import Image
    im = Image.open(path)
    assert im.size == (16 * 3, 16 * 2)  # 3 panels x 2 rows


def test_prng_step_keys_distinct():
    import jax
    root = prng.root_key(0)
    k1 = prng.step_key(root, 5)
    k2 = prng.step_key(root, 6)
    k3 = prng.step_key(root, 5, purpose=1)
    a = [float(jax.random.uniform(k)) for k in (k1, k2, k3)]
    assert len(set(a)) == 3
    assert float(jax.random.uniform(prng.step_key(root, 5))) == a[0]


def test_step_timer():
    t = profiling.StepTimer(batch_size=4, num_devices=2)
    import time
    t.tick()
    time.sleep(0.01)
    t.tick()
    assert 0 < t.slices_per_sec_per_chip < 4 / 0.01


def test_jax_cache_enable(tmp_path):
    """jax_cache.enable points the persistent compilation cache at a durable
    dir, idempotently (never overrides an existing setting)."""
    import jax
    from mcmda_tpu.utils import jax_cache
    prior = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        target = str(tmp_path / "xla")
        jax_cache.enable(target)
        assert jax.config.jax_compilation_cache_dir == target
        # a second call must not override an existing setting
        jax_cache.enable(str(tmp_path / "other"))
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)


def _roofline_table(rows, cols=("step", "operation", "total_self_time",
                                "hbm_bw", "include_infeed_outfeed"),
                    props=None):
    """Minimal gviz DataTable in xprof roofline_model shape."""
    return {
        "cols": [{"id": c} for c in cols],
        "rows": [{"c": [{"v": v} for v in r]} for r in rows],
        "p": props or {},
    }


def test_aggregate_roofline_traffic():
    """Per-op HBM bytes = hbm_bw (GB/s) x self time (us) over the 'Total'
    step rows only, skipping synthetic Total/IDLE aggregates and
    infeed/outfeed rows; GB/s * us = 1e3 bytes."""
    tbl = _roofline_table([
        # per-step duplicates that must NOT be double-counted
        ("1", "fusion.1", 100.0, 10.0, "0"),
        ("2", "fusion.1", 100.0, 10.0, "0"),
        # whole-window aggregates (the rows that count)
        ("Total", "fusion.1", 200.0, 10.0, "0"),   # 10 GB/s * 200 us = 2 MB
        ("Total", "fusion.2", 50.0, 400.0, "0"),   # 400 GB/s * 50 us = 20 MB
        # synthetic aggregate + idle + infeed rows: skipped
        ("Total", "Total", 250.0, 88.0, "0"),
        ("Total", "IDLE", 1000.0, 0.0, "0"),
        ("Total", "fusion.3", 10.0, 10.0, "1"),
    ], props={"peak_hbm_bw": "819"})
    out = profiling.aggregate_roofline_traffic([tbl])
    assert out["n_ops"] == 2
    assert out["hbm_bytes"] == (10.0 * 200 + 400.0 * 50) * 1e3
    assert abs(out["device_time_s"] - 250e-6) < 1e-12
    assert out["peak_hbm_gbps"] == 819.0
    expected_gbps = out["hbm_bytes"] / 250e-6 / 1e9
    assert abs(out["hbm_gbps"] - expected_gbps) < 1e-6


def test_aggregate_roofline_traffic_no_total_step():
    """Without 'Total' step rows every per-op row counts once."""
    tbl = _roofline_table([
        ("1", "op.a", 100.0, 5.0, "0"),
        ("1", "op.b", 100.0, 5.0, "0"),
    ])
    out = profiling.aggregate_roofline_traffic([tbl])
    assert out["n_ops"] == 2
    assert out["hbm_bytes"] == 2 * 5.0 * 100 * 1e3
    assert out["peak_hbm_gbps"] is None


def test_aggregate_roofline_traffic_empty():
    assert profiling.aggregate_roofline_traffic([]) is None
    assert profiling.aggregate_roofline_traffic(
        [_roofline_table([])]) is None
    # tables missing the needed columns are skipped, not fatal
    bad = {"cols": [{"id": "x"}], "rows": [{"c": [{"v": 1}]}]}
    assert profiling.aggregate_roofline_traffic([bad]) is None
