"""One-command, segfault-proof test suite runner (VERDICT r4 next-4).

`pytest tests/` in a single process can die with an XLA:CPU fatal error
mid-compile when many very large programs JIT in one process (observed in
`test_full_stack.py`; environment flakiness, not a code bug — the same
compiles pass in a fresh process). Green status assembled from hand-split
chunks is not CI. This runner makes one command reproduce green:

  python tools/run_tests.py [-j N] [--out artifacts/pytest_r5]

Each test MODULE runs in its own pytest subprocess — a crash (signal) in
one module cannot poison another, and every module starts with a cold XLA
compile cache. Per-module logs + a summary land in `<out>/`; the exit
code is nonzero iff any module fails, crashes, or times out. A module
that exits on a signal is retried once in isolation (the segfault is
environment-flaky); a retry pass is recorded as such in the summary.
"""

import argparse
import concurrent.futures as cf
import glob
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Heaviest modules first so a parallel run packs well.
HEAVY = ["test_full_stack.py", "test_constrained_parity.py",
         "test_mujoco_closed_loop.py", "test_lmpc_fullstack.py",
         "test_sweep.py", "test_mujoco_oracle.py"]
MODULE_TIMEOUT_S = 3600


def run_module(mod: str, outdir: str, attempt: int = 0):
    name = os.path.basename(mod).replace(".py", "")
    log = os.path.join(outdir, f"{name}.log" if attempt == 0
                       else f"{name}.retry.log")
    t0 = time.time()
    with open(log, "w") as f:
        try:
            p = subprocess.run(
                [sys.executable, "-m", "pytest", mod, "-q", "--no-header",
                 "-p", "no:cacheprovider"],
                cwd=REPO, stdout=f, stderr=subprocess.STDOUT,
                timeout=MODULE_TIMEOUT_S)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            rc = -1000
    wall = time.time() - t0
    tail = open(log).read()[-4000:]
    m = re.search(r"(\d+) passed", tail)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", tail)
    failed = int(m.group(1)) if m else 0
    crashed = rc < 0 and rc != -1000 or "Fatal Python error" in tail
    if crashed and attempt == 0:
        # One isolated retry: the XLA:CPU abort is flaky, a genuine test
        # failure is not (it would fail again and be reported as failed).
        sig = -rc if rc < 0 else 0
        print(f"  {name}: crashed (signal {sig}), retrying once...",
              flush=True)
        return run_module(mod, outdir, attempt=1)
    status = ("TIMEOUT" if rc == -1000 else
              "CRASH" if crashed else
              "FAIL" if rc != 0 or failed else "ok")
    return {"module": name, "status": status, "rc": rc, "passed": passed,
            "failed": failed, "wall_s": round(wall, 1), "log": log,
            "retried": attempt > 0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-j", "--jobs", type=int, default=1,
                    help="parallel module processes (2 cores here; >1 "
                         "halves wall time but doubles peak memory)")
    ap.add_argument("--out", default="artifacts/pytest_r5")
    ap.add_argument("-k", default=None, help="only modules matching substring")
    args = ap.parse_args()

    outdir = os.path.join(REPO, args.out)
    os.makedirs(outdir, exist_ok=True)
    mods = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    if args.k:
        mods = [m for m in mods if args.k in os.path.basename(m)]
    # heavy-first ordering
    mods.sort(key=lambda m: (os.path.basename(m) not in HEAVY,
                             HEAVY.index(os.path.basename(m))
                             if os.path.basename(m) in HEAVY else 0))

    t0 = time.time()
    results = []
    with cf.ThreadPoolExecutor(max_workers=args.jobs) as ex:
        futs = {ex.submit(run_module, m, outdir): m for m in mods}
        for fut in cf.as_completed(futs):
            r = fut.result()
            results.append(r)
            print(f"  {r['module']}: {r['status']} "
                  f"({r['passed']} passed, {r['failed']} failed, "
                  f"{r['wall_s']}s{', retried' if r['retried'] else ''})",
                  flush=True)

    results.sort(key=lambda r: r["module"])
    total_pass = sum(r["passed"] for r in results)
    total_fail = sum(r["failed"] for r in results)
    bad = [r for r in results if r["status"] != "ok"]
    wall = time.time() - t0
    summary = os.path.join(outdir, "summary.txt")
    with open(summary, "w") as f:
        for r in results:
            f.write(f"{r['module']:32s} {r['status']:8s} "
                    f"passed={r['passed']:<4d} failed={r['failed']:<3d} "
                    f"wall={r['wall_s']}s"
                    f"{' (retried)' if r['retried'] else ''}\n")
        f.write(f"\nTOTAL: {total_pass} passed, {total_fail} failed, "
                f"{len(bad)} bad modules, wall {wall:.0f}s\n")
    print(open(summary).read())
    print(f"logs: {outdir}")
    return 1 if bad else 0


if __name__ == "__main__":
    signal.signal(signal.SIGINT, signal.SIG_DFL)
    sys.exit(main())
