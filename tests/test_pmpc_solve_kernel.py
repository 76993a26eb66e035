"""Whole-solve PMPC Pallas kernel: parity with the XLA structure-exploiting
solver at a matched iteration budget (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from dart_tpu.ops.pallas.pmpc_solve import pmpc_solve_pallas
from dart_tpu.solver import pmpc_fast
from dart_tpu.solver.ocp import PMPCAux

DT = 0.002


def test_whole_solve_kernel_matches_fast_solver():
    B, N = 128, 8   # small horizon: interpreter mode is slow
    rng = np.random.default_rng(0)
    mus = jnp.asarray(rng.uniform(0.05, 0.2, B), jnp.float32)
    tgts = jnp.asarray(rng.uniform(-0.1, 0.1, (B, 6)) *
                       np.array([1, 0, 1, 0, 0, 0]), jnp.float32)
    z0 = jnp.asarray(rng.normal(size=(B, 6)) * 0.02, jnp.float32)
    V0 = jnp.zeros((B, N, 2), jnp.float32)
    aux = PMPCAux(target=tgts, Qp=jnp.full(B, 300.0, jnp.float32),
                  Qv=jnp.full(B, 2.0, jnp.float32),
                  R=jnp.full(B, 0.2, jnp.float32))
    V_ref, _, cost_ref = pmpc_fast.solve_batch_fast(
        mus, aux, z0, V0, dt=DT, max_iters=1, n_alphas=2, use_pallas=False)

    Ad, Sd = pmpc_fast._affine_discretization(mus, -9.81, DT)
    wdiag = (np.asarray(aux.Qp)[:, None] * np.array([1, 0, 1, 0, 0, 0]) +
             np.asarray(aux.Qv)[:, None] * np.array([0, 1, 0, 1, 0, 0])
             ).astype(np.float32)
    tl = lambda x: jnp.moveaxis(jnp.asarray(x), 0, -1)
    V_p, cost_p = pmpc_solve_pallas(
        tl(Ad), tl(Sd), tl(wdiag), aux.R, tl(tgts), tl(z0), tl(V0),
        dt=DT, n_iters=1, n_alphas=2, interpret=True)
    V_p = jnp.moveaxis(V_p, -1, 0)

    # Same iteration budget, same problem: costs agree tightly and the
    # kernel never does worse than the XLA path.
    assert np.allclose(np.asarray(cost_p), np.asarray(cost_ref),
                       rtol=5e-3, atol=1e-4)
    d = np.abs(np.asarray(V_p[:, 0] - V_ref[:, 0]))
    assert np.percentile(d, 99) < 5e-3, np.percentile(d, 99)
    assert np.all(np.abs(np.asarray(V_p)) <= 0.6 + 1e-6)
