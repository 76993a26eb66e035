"""End-to-end smoke test of the bench orchestrator's CPU-fallback path.

The driver's round artifact is whatever `python bench.py` prints; r4
shipped a CPU fallback because the acquisition path failed, so the
orchestrator (bank a CPU line, chase the TPU, emit exactly one JSON
line) is itself production code and gets a CI guard: run it in SMOKE
mode (tiny shapes, `smoke: true` marks the line unquotable) with the
TPU path disabled, and assert the contract — one parseable JSON line,
the headline keys, an honest backend label, and a nonzero value.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_cpu_fallback_emits_one_json_line():
    env = dict(os.environ)
    env.update({"DART_BENCH_SMOKE": "1", "DART_BENCH_FORCE_CPU": "1",
                "DART_BENCH_DEADLINE": "420"})
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=460,
                       cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, lines          # exactly ONE JSON line
    d = json.loads(lines[0])
    assert d["metric"] == "pmpc_solves_per_sec_per_chip"
    assert d["backend"] == "cpu"           # honest fallback label
    assert d["smoke"] is True              # never quotable
    assert d["value"] > 0
    assert "vs_baseline" in d and "unit" in d
    # the TPU chase must have been skipped, not failed silently
    assert d.get("tpu_attempted") is False
