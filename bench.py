"""Headline benchmark: batched warm-started tray-MPC solves per second per chip.

Reference baseline: the parallel PMPC implementation sustains ~80-100 Hz of
IPOPT solves on a desktop CPU core (`PMPC/README.md:266`, BASELINE.md). We
measure the same work — receding-horizon PMPC solves (nx=6, nu=2, N=15,
Ts=2 ms) inside a closed loop against the analytic plant — on one TPU chip,
using the whole-solve Pallas kernel (`ops.pallas.pmpc_solve`): the PMPC
dynamics are affine in state, so the COMPLETE box-DDP solve — rollout,
closed-form linearisation, Riccati backward with exact box QPs, line
search — runs inside one kernel launch per 128-scenario tile. Falls back
to the XLA structure-exploiting path if the kernel is unavailable.

Prints ONE JSON line:
  {"metric": "pmpc_solves_per_sec_per_chip", "value": ..., "unit": "solves/s",
   "vs_baseline": value / 100.0}
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    # Persistent compile cache: repeated bench runs skip the large first
    # compile of the fused closed-loop program.
    try:
        import os
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from dart_tpu.models import dynamics as dyn
    from dart_tpu.solver import pmpc_fast
    from dart_tpu.solver.ocp import PMPCAux

    DT = 0.002     # reference control period (2 ms)
    N = 15         # reference horizon (`PMPC/main_parallel.py:108`)
    B = 4096       # scenario batch per chip
    T = 50         # closed-loop steps (solves) per scenario

    rng = np.random.default_rng(0)
    targets = jnp.asarray(
        rng.uniform(-0.1, 0.1, size=(B, 6)) * np.array([1, 0, 1, 0, 0, 0]),
        jnp.float32)
    mus = jnp.asarray(rng.uniform(0.05, 0.2, size=(B,)), jnp.float32)
    aux = PMPCAux(target=targets, Qp=jnp.full(B, 300.0, jnp.float32),
                  Qv=jnp.full(B, 2.0, jnp.float32),
                  R=jnp.full(B, 0.2, jnp.float32))
    plant = dyn.discretize(dyn.pmpc_dynamics, DT)
    plant_v = jax.vmap(lambda x, u, mu: plant(x, u, dyn.PMPCParams(mu=mu,
                                                                   dt=DT)))

    def make_loop(solver, n_steps):
        @jax.jit
        def closed_loop(x0, V0):
            def f(c, _):
                x, V = c
                Vs = solver(x, V)
                u = Vs[:, 0]
                Vn = jnp.concatenate([Vs[:, 1:], Vs[:, -1:]], axis=1)
                return (plant_v(x, u, mus), Vn), u

            (xf, Vf), us = jax.lax.scan(f, (x0, V0), None, length=n_steps)
            return xf, Vf, us

        return closed_loop

    def kernel_solver(x, V):
        Vs, _ = pmpc_fast.solve_batch_kernel(mus, aux, x, V, dt=DT,
                                             n_iters=2, n_alphas=3)
        return Vs

    def xla_solver(x, V):
        Vs, _, _ = pmpc_fast.solve_batch_fast(mus, aux, x, V, dt=DT,
                                              max_iters=4)
        return Vs

    # Timing through the remote-dispatch tunnel is treacherous: results of
    # repeated dispatches can be cached, and `block_until_ready` is not a
    # trustworthy sync point. So: (a) fresh (salted) initial states, (b)
    # every timed dispatch ends in a HOST FETCH, (c) the reported number is
    # the SLOPE between a T-step and a 4T-step rollout, cancelling the
    # ~25-30 ms dispatch round trip and any constant overhead.
    salt = float(np.frombuffer(__import__("os").urandom(2),
                               np.uint16)[0]) / 65536.0
    x0 = jnp.zeros((B, 6), jnp.float32) + 1e-3 * salt
    carry0 = jnp.zeros((B, N, 2), jnp.float32)

    def timed(loop, x):
        best = None
        for r in range(2):
            t0 = time.time()
            xf, Vf, U = loop(x + 1e-4 * (r + 1), carry0)
            checksum = float(jnp.sum(xf))        # host fetch = sync
            dt_r = time.time() - t0
            best = dt_r if best is None else min(best, dt_r)
        return best, checksum

    try:
        loop1 = make_loop(kernel_solver, T)
        loop4 = make_loop(kernel_solver, 4 * T)
        xf, Vf, U = loop1(x0, carry0)
        float(jnp.sum(xf))                       # compile + first exec
    except Exception:
        loop1 = make_loop(xla_solver, T)
        loop4 = make_loop(xla_solver, 4 * T)
        xf, Vf, U = loop1(x0, carry0)
        float(jnp.sum(xf))
    if not bool(jnp.all(jnp.isfinite(U))):
        print(json.dumps({"metric": "pmpc_solves_per_sec_per_chip",
                          "value": 0.0, "unit": "solves/s",
                          "vs_baseline": 0.0, "error": "non-finite controls"}))
        return 1

    t1, _ = timed(loop1, x0)
    xf4, Vf4, U4 = loop4(x0, carry0)             # compile 4T variant
    float(jnp.sum(xf4))
    t4, _ = timed(loop4, x0)
    elapsed = max((t4 - t1) / (3 * T), 1e-9)     # per (solve + plant) step
    solves_per_s = B / elapsed

    print(json.dumps({
        "metric": "pmpc_solves_per_sec_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 100.0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
