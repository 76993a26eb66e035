"""Arm stack tests: ADMM QP vs scipy oracle; impedance controller behavior;
DACTL grasp transforms vs scipy Rotation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import minimize
from scipy.spatial.transform import Rotation as Rot

from dart_tpu.control import arm as arm_mod
from dart_tpu.control.dualarm import resolve_ee_targets
from dart_tpu.ops.qp import solve_qp_admm


def _scipy_qp(P, q, A, l, u):
    n = q.shape[0]

    def f(x):
        return 0.5 * x @ P @ x + q @ x

    def grad(x):
        return P @ x + q

    cons = [
        {"type": "ineq", "fun": lambda x: A @ x - l, "jac": lambda x: A},
        {"type": "ineq", "fun": lambda x: u - A @ x, "jac": lambda x: -A},
    ]
    res = minimize(f, np.zeros(n), jac=grad, method="SLSQP", constraints=cons,
                   options={"maxiter": 500, "ftol": 1e-14})
    return res.x


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_admm_qp_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    n, m = 7, 21
    L = rng.normal(size=(n, n))
    P = L @ L.T + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    center = A @ rng.normal(size=n) * 0.1
    width = rng.uniform(0.5, 2.0, size=m)
    l, u = center - width, center + width

    sol = solve_qp_admm(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                        jnp.asarray(l), jnp.asarray(u), iters=400)
    x_star = _scipy_qp(P, q, A, l, u)
    assert float(sol.pri_res) < 1e-6
    obj_admm = 0.5 * np.asarray(sol.x) @ P @ np.asarray(sol.x) + q @ np.asarray(sol.x)
    obj_star = 0.5 * x_star @ P @ x_star + q @ x_star
    assert obj_admm <= obj_star + 1e-5 * (1 + abs(obj_star))
    assert np.allclose(np.asarray(sol.x), x_star, atol=5e-4)


def test_admm_qp_active_bounds():
    """Unconstrained optimum far outside the box must land on constraints."""
    P = jnp.eye(3) * 2.0
    q = jnp.asarray([-10.0, 0.0, 10.0])
    A = jnp.eye(3)
    l = -jnp.ones(3)
    u = jnp.ones(3)
    sol = solve_qp_admm(P, q, A, l, u, iters=200)
    assert np.allclose(np.asarray(sol.x), [1.0, 0.0, -1.0], atol=1e-6)


def _toy_dynamics(rng, dtype=jnp.float64):
    """A synthetic but physically-plausible 7-DoF snapshot."""
    q = rng.normal(size=7) * 0.3
    qd = rng.normal(size=7) * 0.1
    J = rng.normal(size=(6, 7)) * 0.5
    Jd = rng.normal(size=(6, 7)) * 0.05
    L = rng.normal(size=(7, 7)) * 0.3
    M = L @ L.T + np.eye(7) * 2.0
    h = rng.normal(size=7) * 5.0
    Minv = np.linalg.inv(M)
    Mx_inv = J @ Minv @ J.T
    ee_pos = rng.normal(size=3) * 0.3
    ee_quat = rng.normal(size=4)
    ee_quat /= np.linalg.norm(ee_quat)
    return arm_mod.ArmDynamics(
        q=jnp.asarray(q, dtype), qd=jnp.asarray(qd, dtype),
        jac=jnp.asarray(J, dtype), jac_dot=jnp.asarray(Jd, dtype),
        M=jnp.asarray(M, dtype), h=jnp.asarray(h, dtype),
        Mx_inv=jnp.asarray(Mx_inv, dtype),
        ee_pos=jnp.asarray(ee_pos, dtype), ee_quat=jnp.asarray(ee_quat, dtype))


def test_impedance_torque_within_limits_and_tracks():
    rng = np.random.default_rng(7)
    params = arm_mod.default_arm_params(dt=0.002, dtype=jnp.float64)
    dyn = _toy_dynamics(rng)
    carry = arm_mod.arm_init_carry(jnp.float64)
    target_pos = np.asarray(dyn.ee_pos) + np.array([0.02, -0.01, 0.03])
    carry2, tau, loss = arm_mod.compute_torque(
        carry, dyn, jnp.asarray(target_pos), dyn.ee_quat, params)
    tau = np.asarray(tau)
    assert np.all(tau >= np.asarray(params.taumin) - 1e-5)
    assert np.all(tau <= np.asarray(params.taumax) + 1e-5)
    assert np.isfinite(float(loss))
    # The accelerated EE motion must point toward the target: the task-space
    # acceleration J qdd should positively align with the position error.
    qdd = np.asarray(carry2.qdd_prev)
    a_task = np.asarray(dyn.jac) @ qdd
    err = target_pos - np.asarray(dyn.ee_pos)
    assert float(a_task[:3] @ err) > 0.0


def test_impedance_qp_matches_scipy_oracle():
    """The full assembled QP must agree with an SLSQP solve of the same
    objective/constraints built independently from the reference formulas."""
    rng = np.random.default_rng(11)
    params = arm_mod.default_arm_params(dt=0.002, dtype=jnp.float64)
    dyn = _toy_dynamics(rng)
    carry = arm_mod.arm_init_carry(jnp.float64)
    target_pos = np.asarray(dyn.ee_pos) + np.array([0.01, 0.02, -0.01])
    q_t = Rot.from_quat(np.array(dyn.ee_quat), scalar_first=True) * \
        Rot.from_rotvec([0.05, -0.02, 0.01])
    target_quat = jnp.asarray(q_t.as_quat(scalar_first=True))

    _, tau, _ = arm_mod.compute_torque(carry, dyn, jnp.asarray(target_pos),
                                       target_quat, params, qp_iters=400)

    # Independent numpy assembly (transcribing arm.py:338-424).
    J = np.asarray(dyn.jac); Jd = np.asarray(dyn.jac_dot)
    M = np.asarray(dyn.M); h = np.asarray(dyn.h)
    q = np.asarray(dyn.q); qd = np.asarray(dyn.qd)
    Mx_inv = np.asarray(dyn.Mx_inv)
    K = np.asarray(params.K); K_null = np.asarray(params.K_null)
    Wimp = np.asarray(params.Wimp); Wpos = np.asarray(params.Wpos)
    dt = 0.002
    dx = target_pos - np.asarray(dyn.ee_pos)
    rot_err = (Rot.from_quat(np.array(target_quat), scalar_first=True) *
               Rot.from_quat(np.array(dyn.ee_quat), scalar_first=True).inv())
    twist = np.concatenate([dx, rot_err.as_rotvec()])
    Minv = np.linalg.pinv(M, rcond=1e-6)
    Mx = np.linalg.inv(Mx_inv)
    mu = Mx @ (J @ (Minv @ h) + Jd @ qd)
    w, v = np.linalg.eigh(Mx)
    sqrt_Mx = (v * np.sqrt(np.abs(w))) @ v.T
    D = sqrt_Mx @ np.sqrt(K) + np.sqrt(K) @ sqrt_Mx
    F = -D @ (J @ qd) + K @ twist + mu
    beta = 2 * np.sqrt(np.diag(K_null)) * (-qd) + K_null @ (-q)

    def cost(x):
        e_imp = J @ x + Jd @ qd - Mx_inv @ F
        e_pos = x - beta
        return e_imp @ Wimp @ e_imp + e_pos @ Wpos @ e_pos

    A = np.vstack([0.5 * dt**2 * np.eye(7), dt * np.eye(7), M])
    l = np.concatenate([np.asarray(params.Qmin) - q - qd * dt,
                        np.asarray(params.Qdotmin) - qd,
                        np.asarray(params.taumin) - h])
    u = np.concatenate([np.asarray(params.Qmax) - q - qd * dt,
                        np.asarray(params.Qdotmax) - qd,
                        np.asarray(params.taumax) - h])
    cons = [{"type": "ineq", "fun": lambda x: A @ x - l},
            {"type": "ineq", "fun": lambda x: u - A @ x}]
    res = minimize(cost, np.zeros(7), method="SLSQP", constraints=cons,
                   options={"maxiter": 500, "ftol": 1e-14})
    tau_star = M @ res.x + h
    assert np.allclose(np.asarray(tau), tau_star, atol=1e-2), \
        (np.asarray(tau), tau_star)


def test_dactl_matches_scipy_composition():
    rng = np.random.default_rng(3)
    pos = rng.normal(size=3)
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    left, right = resolve_ee_targets(jnp.asarray(pos), jnp.asarray(quat))
    R_obj = Rot.from_quat(quat, scalar_first=True)
    for got, gpos, gquat in [
        (left, [-0.175, 0, 0], [0.5, 0.5, 0.5, 0.5]),
        (right, [0.175, 0, 0], [0.5, -0.5, -0.5, 0.5]),
    ]:
        want_pos = pos + R_obj.as_matrix() @ np.asarray(gpos)
        want_quat = (R_obj * Rot.from_quat(gquat, scalar_first=True)
                     ).as_quat(scalar_first=True)
        assert np.allclose(np.asarray(got.pos), want_pos, atol=1e-12)
        g = np.asarray(got.quat)
        assert np.allclose(g, want_quat, atol=1e-12) or \
            np.allclose(g, -want_quat, atol=1e-12)


def test_arm_batched_two_arms():
    """Both arms (and more) solve in one vmapped call — the execution model
    that replaces the reference's 2 worker processes."""
    rng = np.random.default_rng(5)
    params = arm_mod.default_arm_params(dt=0.002, dtype=jnp.float64)
    dyns = [_toy_dynamics(rng) for _ in range(4)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *dyns)
    carries = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[arm_mod.arm_init_carry(jnp.float64)] * 4)
    targets = jnp.asarray(rng.normal(size=(4, 3)) * 0.1)

    f = jax.vmap(lambda c, d, tp: arm_mod.compute_torque(
        c, d, tp, d.ee_quat, params))
    carries2, taus, losses = f(carries, batch, targets)
    assert taus.shape == (4, 7)
    for i in range(4):
        _, tau_i, _ = arm_mod.compute_torque(
            jax.tree.map(lambda x: x[i], carries), jax.tree.map(lambda x: x[i], batch),
            targets[i], batch.ee_quat[i], params)
        assert np.allclose(np.asarray(taus[i]), np.asarray(tau_i), atol=1e-10)
