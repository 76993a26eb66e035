"""Dedup-proof whole-solve kernel benchmarks (slope methodology).

Timing through the remote-dispatch tunnel is treacherous: dispatch results
can be cached (identical re-dispatches return without running) and
`block_until_ready` is not a trustworthy sync point. This harness:

- runs R solves CHAINED inside one jitted scan (each solve's initial state
  derives from the previous solution — nothing can be elided),
- synchronises every timed dispatch with a HOST FETCH of the result,
- measures wall time at R and 4R solves per dispatch and reports the
  SLOPE, cancelling the ~25-30 ms round trip and any constant overhead
  (gross non-linearity would expose residual caching).

Usage: python tools/bench_kernel.py [--kernel pmpc|rmpc|lmpc]
       [--batch 4096] [--reps 40] [--n N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="rmpc",
                    choices=["pmpc", "rmpc", "lmpc"])
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=20,
                    help="solves per dispatch (inside one jitted scan)")
    ap.add_argument("--chain", type=int, default=3,
                    help="chained dispatches (outputs feed inputs)")
    ap.add_argument("--n", type=int, default=0, help="horizon (0 = default)")
    ap.add_argument("--iters", type=int, default=2, help="kernel iterations")
    ap.add_argument("--alphas", type=int, default=3)
    ap.add_argument("--al_rounds", type=int, default=2, help="rmpc only")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/dart_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    Bt = args.batch
    rng = np.random.default_rng(3)

    if args.kernel == "rmpc":
        from dart_tpu.ops.pallas.rmpc_solve import rmpc_solve_pallas
        N = args.n or 10
        theta = jnp.asarray(rng.normal(size=(14, Bt)) * 0.3, jnp.float32)
        ref = jnp.asarray(rng.normal(size=(N + 1, 4, Bt)) * 0.05, jnp.float32)
        w = jnp.tile(jnp.asarray([100.0, 1.0, 0.05, 1.0],
                                 jnp.float32)[:, None], (1, Bt))
        z0 = jnp.asarray(rng.normal(size=(6, Bt)) * 0.03, jnp.float32)

        def solve(z):
            """z (6, Bt) -> per-lane signature (Bt,)."""
            V, cost, _, _ = rmpc_solve_pallas(
                theta, ref, w, z, jnp.zeros((N, 2, Bt), jnp.float32),
                dt=0.02, n_iters=args.iters, n_alphas=args.alphas,
                al_rounds=args.al_rounds)
            return jnp.sum(V, axis=(0, 1)) + cost

        def perturb(z, sig):
            return 0.999 * z + 1e-5 * jnp.tanh(sig)[None, :]

    elif args.kernel == "lmpc":
        from dart_tpu.ops.pallas.lmpc_solve import lmpc_solve_pallas
        N = args.n or 8
        pvec = jnp.asarray(rng.uniform(0.05, 0.3, (34, Bt)), jnp.float32)
        Q = jnp.tile(jnp.asarray([200., 2., 200., 2., 0, 0, 0, 0],
                                 jnp.float32)[:, None], (1, Bt))
        Rw = jnp.tile(jnp.asarray([0.1, 0.1, 1., 1.],
                                  jnp.float32)[:, None], (1, Bt))
        targ = jnp.asarray(
            rng.uniform(-0.08, 0.08, (8, Bt)) *
            np.array([1, 0, 1, 0, 0, 0, 0, 0])[:, None], jnp.float32)
        z0 = jnp.asarray(rng.normal(size=(10, Bt)) * 0.03, jnp.float32)

        def solve(z):
            """z (10, Bt) -> per-lane signature (Bt,)."""
            V, cost, _ = lmpc_solve_pallas(
                pvec, Q, Rw, Q, targ, z,
                jnp.zeros((N, 2, Bt), jnp.float32),
                dt=0.002, n_iters=args.iters, n_alphas=args.alphas)
            return jnp.sum(V, axis=(0, 1)) + cost

        def perturb(z, sig):
            return 0.999 * z + 1e-5 * jnp.tanh(sig)[None, :]

    else:
        from dart_tpu.solver import pmpc_fast
        from dart_tpu.solver.ocp import PMPCAux
        N = args.n or 15
        targets = jnp.asarray(
            rng.uniform(-0.1, 0.1, size=(Bt, 6)) *
            np.array([1, 0, 1, 0, 0, 0]), jnp.float32)
        mus = jnp.asarray(rng.uniform(0.05, 0.2, size=(Bt,)), jnp.float32)
        aux = PMPCAux(target=targets, Qp=jnp.full(Bt, 300.0, jnp.float32),
                      Qv=jnp.full(Bt, 2.0, jnp.float32),
                      R=jnp.full(Bt, 0.2, jnp.float32))
        z0 = jnp.asarray(rng.normal(size=(Bt, 6)) * 0.03, jnp.float32)

        def solve(z):
            """z (Bt, 6) -> per-lane signature (Bt,)."""
            V, cost, _ = pmpc_fast.solve_batch_kernel(
                mus, aux, z, jnp.zeros((Bt, N, 2), jnp.float32),
                dt=0.002, n_iters=args.iters, n_alphas=args.alphas)
            return jnp.sum(V, axis=(1, 2)) + cost

        def perturb(z, sig):
            return 0.999 * z + 1e-5 * jnp.tanh(sig)[:, None]

    def make(n_reps):
        def many(z):
            def f(zc, _):
                sig = solve(zc)
                return perturb(zc, sig), None
            zf, _ = jax.lax.scan(f, z, None, length=n_reps)
            return jnp.sum(zf)
        return jax.jit(many)

    # Slope methodology: one dispatch runs R chained solves inside a scan
    # (each solve's input derived from the previous solution, so nothing
    # can be elided); the dispatch is synchronised by a HOST FETCH of the
    # result (`block_until_ready` through the tunnel is not trustworthy).
    # The R -> 4R slope cancels the ~25-30 ms dispatch round trip and any
    # other constant overhead; non-linearity would expose result caching.
    R = args.reps
    walls = {}
    compile_s = {}
    for reps in (R, 4 * R):
        fn = make(reps)
        t0 = time.time()
        float(fn(z0))
        compile_s[reps] = time.time() - t0
        times = []
        for r in range(3):
            zr = z0 + 1e-3 * (r + 1)
            float(jnp.sum(zr))              # pre-transfer the input
            t0 = time.time()
            float(fn(zr))                   # dispatch + fetch sync
            times.append(time.time() - t0)
        walls[reps] = min(times)
    slope = (walls[4 * R] - walls[R]) / (3 * R)
    print(json.dumps({
        "kernel": args.kernel, "batch": Bt, "N": N, "reps": [R, 4 * R],
        "budget": f"{args.iters}it x {args.alphas}a" + (f" x {args.al_rounds}al" if args.kernel == "rmpc" else ""),
        "compile_s": round(sum(compile_s.values()), 1),
        "wall_s": {str(k): round(v, 4) for k, v in walls.items()},
        "ms_per_batch_solve": round(slope * 1e3, 4),
        "solves_per_s": round(Bt / slope, 0),
        "dispatch_overhead_s": round(walls[R] - R * slope, 4),
    }))


if __name__ == "__main__":
    main()
