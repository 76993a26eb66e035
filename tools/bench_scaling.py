"""Mesh scaling benchmark: sweep throughput vs number of devices.

On a pod slice this measures real scaling efficiency (solves/s at n chips
vs n * single-chip); on one chip or the CPU host platform it validates the
sharded execution path and prints the single-device baseline.

    python tools/bench_scaling.py            # all local devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py        # virtual mesh plumbing check
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (env vars are too late here); pair with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dart_tpu.io import scenes
    from dart_tpu.parallel import sweep as sweep_mod
    from dart_tpu.rollout.evaluate import make_pmpc_evaluator

    n_total = len(jax.devices())
    per_dev = 32            # scenarios per device
    ev = make_pmpc_evaluator(n_steps=500, dt=0.002, control_every=5,
                             warmup_steps=100, max_iters=4)
    rng = np.random.default_rng(0)
    results = []
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    base_rate = None
    for n in sizes:
        batch = scenes.random_scenarios(rng, per_dev * n, dtype=jnp.float32)
        mesh = sweep_mod.make_mesh(n)
        # compile + measure
        res, agg = sweep_mod.run_sweep(ev, batch, mesh)
        t0 = time.time()
        res, agg = sweep_mod.run_sweep(ev, batch, mesh)
        el = time.time() - t0
        episodes_per_s = batch.size / el
        if base_rate is None:
            base_rate = episodes_per_s
        eff = episodes_per_s / (base_rate * n)
        results.append({"devices": n, "episodes": batch.size,
                        "episodes_per_s": round(episodes_per_s, 1),
                        "efficiency_vs_1dev": round(eff, 3)})
        print(json.dumps(results[-1]))
    print(json.dumps({"platform": jax.default_backend(),
                      "note": "efficiency meaningful only with real chips"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
