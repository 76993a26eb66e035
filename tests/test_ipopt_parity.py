"""BASELINE north-star gate: first-control agreement with golden NLP
solutions on the 18-config evaluation grid (`README.md:101-105`).

The reference's IPOPT is not installable here; scipy SLSQP with exact JAX
gradients on the identical single-shooting NLP is the golden oracle (both
are convergent NLP methods; at these tolerances their optima coincide).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from dart_tpu.io import scenes
from dart_tpu.models import dynamics as dyn
from dart_tpu.rollout.evaluate import _select_weights
from dart_tpu.solver import ilqr
from dart_tpu.solver.ocp import PMPCAux, make_pmpc_ocp

N = 15
DT = 0.01


def _golden(ocp, params, aux, z0):
    def rollout_cost(Uflat):
        U = Uflat.reshape(N, 2)

        def f(z, inp):
            k, u = inp
            return ocp.step(z, u, params), ocp.stage_cost(z, u, k, aux)

        zT, cs = jax.lax.scan(f, z0, (jnp.arange(N), U))
        return jnp.sum(cs) + ocp.term_cost(zT, aux)

    vg = jax.jit(jax.value_and_grad(rollout_cost))

    def fun(U):
        v, g = vg(jnp.asarray(U))
        return float(v), np.asarray(g)

    bounds = [(-0.6, 0.6)] * (N * 2)
    res = minimize(fun, np.zeros(N * 2), jac=True, method="SLSQP",
                   bounds=bounds, options={"maxiter": 300, "ftol": 1e-14})
    return res.x.reshape(N, 2)


@pytest.mark.parametrize("idx", range(18))
def test_first_control_matches_golden_on_grid(idx):
    ocp = make_pmpc_ocp(dt=DT, u_bound=0.6)
    grid = scenes.sweep_grid(targets=((0.06, -0.05),), dtype=jnp.float64)
    mu = grid.mu[idx]
    shape_id = int(grid.shape_id[idx])
    w = _select_weights(jnp.asarray(shape_id), jnp.float64)
    aux = PMPCAux(
        target=jnp.asarray([0.06, 0.0, -0.05, 0.0, 0.0, 0.0], jnp.float64),
        Qp=w.Qp, Qv=w.Qv, R=w.R)
    params = dyn.PMPCParams(mu=mu, dt=DT)
    # A mid-flight state so the solution is non-trivial (moving object).
    z0 = jnp.asarray([0.01, 0.05, -0.02, -0.03, 0.0, 0.0], jnp.float64)

    sol = ilqr.solve(ocp, ilqr.ILQRConfig(), params, aux, z0,
                     jnp.zeros((N, 2), jnp.float64))
    U_star = _golden(ocp, params, aux, z0)
    # The receding-horizon contract: the applied (first) control agrees.
    err = np.abs(np.asarray(sol.V[0]) - U_star[0])
    assert np.all(err < 3e-4), (idx, np.asarray(sol.V[0]), U_star[0])
