"""Native async telemetry ring: build, round-trip, overflow accounting."""

import shutil

import numpy as np
import pytest

from dart_tpu.io.ringlog import RingLogger, native_available

REC = np.dtype([("t", np.float64), ("x", np.float32, (4,)),
                ("step", np.int64)])


@pytest.mark.skipif(shutil.which("g++") is None and not native_available(),
                    reason="no C++ toolchain")
def test_native_roundtrip(tmp_path):
    path = str(tmp_path / "telemetry.bin")
    log = RingLogger(path, REC, capacity_records=4096)
    assert log.is_native, "native library should build and load"
    n = 1000
    for i in range(n):
        rec = np.zeros((), REC)
        rec["t"] = i * 0.002
        rec["x"] = [i, 2 * i, 3 * i, 4 * i]
        rec["step"] = i
        log.push(rec)
    log.flush()
    stats = log.stats()
    assert stats["pushed"] == n
    assert stats["dropped"] == 0
    log.close()

    arr = RingLogger.read(path, REC)
    assert arr.shape == (n,)
    assert np.allclose(arr["t"], np.arange(n) * 0.002)
    assert np.all(arr["step"] == np.arange(n))
    assert np.allclose(arr["x"][:, 1], 2.0 * np.arange(n))


@pytest.mark.skipif(shutil.which("g++") is None and not native_available(),
                    reason="no C++ toolchain")
def test_overflow_drops_and_counts(tmp_path):
    """A tiny ring with a slow consumer must drop (never block) and count."""
    path = str(tmp_path / "overflow.bin")
    log = RingLogger(path, REC, capacity_records=8)
    burst = 100000
    rec = np.zeros((), REC)
    for i in range(burst):
        rec["step"] = i
        log.push(rec)
    log.flush()
    stats = log.stats()
    assert stats["pushed"] + stats["dropped"] == burst
    log.close()
    arr = RingLogger.read(path, REC)
    assert arr.shape[0] == stats["pushed"] == stats["written"]
    # The surviving records are in order.
    assert np.all(np.diff(arr["step"]) > 0)


def test_fallback_writer(tmp_path, monkeypatch):
    """Without the native library the logger still works (pure Python)."""
    import dart_tpu.io.ringlog as rl
    monkeypatch.setattr(rl, "_load", lambda *a, **k: None)
    path = str(tmp_path / "fb.bin")
    log = rl.RingLogger(path, REC)
    assert not log.is_native
    rec = np.zeros((), REC)
    rec["t"] = 1.5
    log.push(rec)
    log.close()
    arr = rl.RingLogger.read(path, REC)
    assert arr.shape == (1,) and arr["t"][0] == 1.5
