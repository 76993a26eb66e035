"""Closed-loop integration tests: jitted MPC loops must drive the object to
the commanded tray target within tolerance (the reference's acceptance
criterion: 1 cm — `PMPC/main_parallel.py:64`, `rob_ctrl.py:324`)."""

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.control import mpc as mpc_mod
from dart_tpu.models import dynamics as dyn
from dart_tpu.rollout.loop import run_closed_loop
from dart_tpu.rollout.metrics import compute_metrics

DT = 0.02  # test-scale control period (10x the 2 ms sim step, for CPU speed)


def test_pmpc_closed_loop_converges():
    ctlr = mpc_mod.PMPC(N=15, dt=DT, u_bound=0.6,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=25))
    params = dyn.PMPCParams(mu=0.1, dt=DT)
    weights = mpc_mod.PMPC_WEIGHTS["cube"]
    target = jnp.asarray([0.08, 0.0, -0.05, 0.0, 0.0, 0.0], jnp.float64)

    def solve_fn(carry, obs, t):
        return ctlr.solve(carry, obs, t, params, weights)

    x0 = jnp.zeros(6, jnp.float64)
    res = run_closed_loop(solve_fn, dyn.discretize(dyn.pmpc_dynamics, DT),
                          ctlr.init_carry(jnp.float64), x0, target, params,
                          n_steps=400)
    m = compute_metrics(res.X, res.U, target[jnp.asarray([0, 2])], DT)
    assert bool(m.converged), f"min_error={float(m.min_error)}"
    assert float(m.steady_state_error) < 0.01
    assert float(m.convergence_time) < 8.0
    assert np.all(np.abs(np.asarray(res.U)) <= 0.6 + 1e-9)


def test_pmpc_control_every_latency_emulation():
    """Solving every 5th step (emulated solver lag) must still converge."""
    ctlr = mpc_mod.PMPC(N=15, dt=DT, u_bound=0.6,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=25))
    params = dyn.PMPCParams(mu=0.1, dt=DT)
    weights = mpc_mod.PMPC_WEIGHTS["general"]
    target = jnp.asarray([0.05, 0.0, 0.05, 0.0, 0.0, 0.0], jnp.float64)

    def solve_fn(carry, obs, t):
        return ctlr.solve(carry, obs, t, params, weights)

    res = run_closed_loop(solve_fn, dyn.discretize(dyn.pmpc_dynamics, DT),
                          ctlr.init_carry(jnp.float64), jnp.zeros(6, jnp.float64),
                          target, params, n_steps=500, control_every=5)
    m = compute_metrics(res.X, res.U, target[jnp.asarray([0, 2])], DT)
    assert bool(m.converged)
    # With a 100 ms emulated solver period a small limit cycle around the
    # target is physically expected; require convergence plus a bounded
    # residual oscillation.
    assert float(m.min_error) < 0.002
    assert float(m.steady_state_error) < 0.02


def test_rmpc_closed_loop_adapts_to_model_mismatch():
    """Plant has friction the model doesn't know; RLS must absorb it."""
    ctlr = mpc_mod.RMPC(N=20, dt=DT, cfg=mpc_mod.ilqr.ILQRConfig(
        max_iters=20, al_iters=3))
    target = jnp.asarray([0.08, 0.0, -0.06, 0.0], jnp.float64)

    # Plant: 4-state tilt dynamics with Coulomb-ish + viscous friction that
    # the nominal (theta=0) model lacks entirely.
    def plant_dyn(x, u, p):
        vx, vy = x[1], x[3]
        ax = -9.81 * jnp.sin(u[0]) * 1.1 - 0.4 * vx - 0.3 * jnp.tanh(vx / 0.01)
        ay = -9.81 * jnp.sin(u[1]) * 1.1 - 0.4 * vy - 0.3 * jnp.tanh(vy / 0.01)
        return jnp.stack([vx, ax, vy, ay])

    plant_step = dyn.discretize(plant_dyn, DT)

    def solve_fn(carry, obs, t):
        return ctlr.solve(carry, obs, t)

    x0 = jnp.zeros(4, jnp.float64)
    res = run_closed_loop(solve_fn, plant_step, ctlr.init_carry(x0, jnp.float64),
                          x0, target, None, n_steps=600)
    m = compute_metrics(res.X, res.U, target[jnp.asarray([0, 2])], DT)
    assert bool(m.converged), f"min_error={float(m.min_error)}"
    # Slew-rate limit must hold over the whole closed loop.
    dU = np.diff(np.asarray(res.U), axis=0)
    assert np.all(np.abs(dU) <= 0.05 + 1e-4)


def test_lmpc_closed_loop_with_plan_shift():
    """LMPC with solver running at 1/4 rate and plan-shifting in between."""
    ctlr = mpc_mod.LMPC(N=20, dt=DT, cfg=mpc_mod.ilqr.ILQRConfig(max_iters=20))
    rng = np.random.default_rng(0)
    pvec_true = jnp.asarray(rng.uniform(0.05, 0.3, size=34))
    # Controller believes slightly perturbed parameters (as PPO would output).
    pvec_model = pvec_true * jnp.asarray(rng.uniform(0.8, 1.2, size=34))
    target = jnp.asarray([0.05, 0, 0.05, 0, 0, 0, 0, 0], jnp.float64)

    def solve_fn(carry, obs, t):
        return ctlr.solve(carry, obs, t, pvec_model)

    def hold_fn(carry, obs, t):
        nc, u = ctlr.shift_plan(carry)
        z = jnp.zeros(())
        return nc, u, mpc_mod.SolveDiag(z, z, jnp.zeros((), jnp.int32), z)

    def observe(x):
        return x  # plant state is the 8-state itself

    plant_step = dyn.discretize(dyn.lmpc_dynamics, DT)
    x0 = jnp.zeros(8, jnp.float64)
    res = run_closed_loop(solve_fn, plant_step, ctlr.init_carry(jnp.float64),
                          x0, target, pvec_true, n_steps=500,
                          control_every=4, hold_fn=hold_fn, observe=observe)
    m = compute_metrics(res.X, res.U, target[jnp.asarray([0, 2])], DT)
    assert np.all(np.isfinite(np.asarray(res.X)))
    assert float(m.min_error) < 0.02, f"min_error={float(m.min_error)}"


def test_closed_loop_batched_sweep():
    """vmap the whole closed loop across a scenario batch (friction sweep)."""
    ctlr = mpc_mod.PMPC(N=10, dt=DT, cfg=mpc_mod.ilqr.ILQRConfig(max_iters=15))
    weights = mpc_mod.PMPC_WEIGHTS["general"]
    target = jnp.asarray([0.06, 0.0, 0.04, 0.0, 0.0, 0.0], jnp.float64)
    mus = jnp.asarray([0.05, 0.1, 0.2])

    def run_one(mu):
        params = dyn.PMPCParams(mu=mu, dt=DT)

        def solve_fn(carry, obs, t):
            return ctlr.solve(carry, obs, t, params, weights)

        res = run_closed_loop(solve_fn, dyn.discretize(dyn.pmpc_dynamics, DT),
                              ctlr.init_carry(jnp.float64),
                              jnp.zeros(6, jnp.float64), target, params,
                              n_steps=300)
        return compute_metrics(res.X, res.U, target[jnp.asarray([0, 2])], DT)

    ms = jax.vmap(run_one)(mus)
    assert np.all(np.asarray(ms.converged))
    assert np.all(np.asarray(ms.steady_state_error) < 0.012)
