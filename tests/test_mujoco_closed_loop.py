"""Closed-loop regression on the REAL MuJoCo reference world (CI-sized).

The full grids live in `tools/mujoco_sweep.py` (artifacts/mujoco/); this
gate keeps the bridge honest in CI with one fast episode per controller
family: dart_tpu's full stack (MPC -> DACTL -> impedance QPs -> data.ctrl)
must still converge the canonical cube scenario on `mj_step`, and the
rolling-aware PMPC must still handle the rolling sphere the strict analytic
model drops.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax.numpy as jnp

from dart_tpu.physics import mujoco_bridge as MB


@pytest.fixture(scope="module")
def torque_fn():
    return MB.make_torque_fn(dt=0.002)


def test_pmpc_cube_converges_on_mujoco(torque_fn):
    model, data = MB.make_world("cube", mass=1.0, mu=0.1)
    solve, carry, obs = MB.pmpc_solve_fn(shape="cube", mu=0.1, dt=0.01)
    out = MB.run_closed_loop(model, data, solve, carry, obs, (0.10, 0.05),
                             n_steps=2000, control_every=5,
                             torque_fn=torque_fn)
    m = out["metrics"]
    assert m["converged"], m
    assert m["convergence_time"] < 2.5, m
    # the tray must still be held (object on it, not on the floor)
    assert out["ps"][-1, 2] > 0.3, out["ps"][-1]


def test_rolling_sphere_pmpc_on_mujoco(torque_fn):
    """The reference's analytic slide model drops this config; the
    rolling-aware reduction (mu_eff=0, g*5/7) converges it."""
    model, data = MB.make_world("sphere", mass=2.0, mu=0.2)
    solve, carry, obs = MB.pmpc_solve_fn(shape="sphere", mu=0.2, dt=0.01,
                                         rolling_aware=True)
    out = MB.run_closed_loop(model, data, solve, carry, obs, (0.10, 0.05),
                             n_steps=3000, control_every=5,
                             torque_fn=torque_fn)
    assert out["metrics"]["converged"], out["metrics"]
