"""Unit tests for the live-viewer helpers (`cli/watch.py`) and the
cross-process TPU tunnel lock (`utils/tpu_lock.py`)."""

import os
import subprocess
import sys
import tempfile

import numpy as np

from dart_tpu.cli import watch as watch_mod
from dart_tpu.io.streaming import EPISODE_STREAM_DTYPE


def test_read_new_tails_incrementally():
    dtype = EPISODE_STREAM_DTYPE
    recs = np.zeros(5, dtype)
    recs["k"] = np.arange(5)
    recs["err"] = np.linspace(0.1, 0.02, 5)
    with tempfile.NamedTemporaryFile(suffix=".ring", delete=False) as f:
        path = f.name
        recs[:3].tofile(f)
    try:
        first = watch_mod.read_new(path, dtype, 0)
        assert first.size == 3 and first["k"].tolist() == [0, 1, 2]
        # nothing new yet
        assert watch_mod.read_new(path, dtype, 3).size == 0
        with open(path, "ab") as f:
            recs[3:].tofile(f)
        more = watch_mod.read_new(path, dtype, 3)
        assert more.size == 2 and more["k"].tolist() == [3, 4]
    finally:
        os.unlink(path)


def test_sparkline_and_tray_map_render():
    s = watch_mod.sparkline([0.0, 0.5, 1.0])
    assert len(s) == 3 and s[-1] == watch_mod.SPARK[-1]
    assert watch_mod.sparkline([]) == ""
    m = watch_mod.tray_map(0.0, 0.0, 0.1, 0.05)
    lines = m.splitlines()
    assert lines[0].startswith("+") and lines[-1].startswith("+")
    assert any("o" in ln for ln in lines)       # object marker
    assert any("x" in ln for ln in lines)       # target marker
    # off-tray coordinates must not crash (clipped out of the grid)
    watch_mod.tray_map(5.0, -5.0)


def test_tpu_lock_excludes_across_processes():
    """A child process holding the lock blocks our non-blocking acquire;
    once it exits, the lock is free. Reentrancy within a process works."""
    from dart_tpu.utils import tpu_lock as tl

    code = ("import sys, time; sys.path.insert(0, {repo!r}); "
            "from dart_tpu.utils.tpu_lock import tpu_lock\n"
            "with tpu_lock(timeout_s=5) as got:\n"
            "    assert got\n"
            "    print('LOCKED', flush=True)\n"
            "    time.sleep(3)\n").format(
                repo=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
    try:
        assert p.stdout.readline().strip() == "LOCKED"
        with tl.tpu_lock(timeout_s=0.2, poll_s=0.05) as got:
            assert not got            # child holds it
    finally:
        p.wait(timeout=20)
    with tl.tpu_lock(timeout_s=5) as got:
        assert got                    # free again
        with tl.tpu_lock(timeout_s=1) as got2:
            assert got2               # reentrant within the process
