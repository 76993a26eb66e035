"""Impedance-QP arm controller (the ARMCONTROL replacement), pure JAX.

Re-implements the per-arm torque optimisation of
`PMPC/src/controller/arm.py:338-447` — identical math, radically different
execution model: instead of a worker process that rebuilds a CasADi NLP
every 2 ms and calls IPOPT, the QP data is assembled with dense linear
algebra and solved by a fixed-iteration ADMM kernel (`dart_tpu.ops.qp`),
warm-started from the previous step. Both arms (and whole scenario batches)
solve in one vmapped dispatch.

The QP over qdd in R^7:

  min  E_imp' Wimp E_imp + E_pos' Wpos E_pos + qddd' Wsmooth qddd
  s.t. Qmin    <= q + qd dt + 0.5 qdd dt^2 <= Qmax      (integrated position)
       Qdotmin <= qd + qdd dt              <= Qdotmax   (integrated velocity)
       taumin  <= M qdd + h                <= taumax    (actuator torque)

with E_imp = J qdd + Jdot qd - Mx_inv F,
     F     = -D (J qd) + K twist + mu          (`arm.py:384-385`)
     mu    = Mx (J M^-1 h + Jdot qd)           (`arm.py:361`)
     D     = sqrt(Mx) sqrt(K) + sqrt(K) sqrt(Mx)  (`arm.py:363-370`)
     E_pos = qdd - beta,
     beta  = 2 sqrt(diag(K_null)) (-qd) + K_null (-q)  (`arm.py:387-389`)
     qddd  = (qdd - qdd_prev)/dt.

Returned torque: tau = M qdd* + h (`arm.py:432`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dart_tpu.ops.qp import solve_qp_admm
from dart_tpu.utils.quat import quat_error_rotvec


class ArmParams(NamedTuple):
    """Static controller gains/limits (the reference's L_params/R_params
    dicts, e.g. `LMPC/src/run.py:68-116`)."""

    Wimp: jnp.ndarray       # (6, 6)
    Wpos: jnp.ndarray       # (7, 7)
    Wsmooth: jnp.ndarray    # (7, 7)
    Qmin: jnp.ndarray       # (7,)
    Qmax: jnp.ndarray
    Qdotmin: jnp.ndarray
    Qdotmax: jnp.ndarray
    taumin: jnp.ndarray
    taumax: jnp.ndarray
    K: jnp.ndarray          # (6, 6) task stiffness
    K_null: jnp.ndarray     # (7, 7) null-space stiffness
    dt: float | jnp.ndarray


def default_arm_params(dt: float = 0.002, dtype=jnp.float32) -> ArmParams:
    """The xArm7 gains used by every reference driver (`run.py:68-116`)."""
    a = lambda x: jnp.asarray(x, dtype)
    return ArmParams(
        Wimp=jnp.diag(a([10.0, 10.0, 10.0, 1.0, 1.0, 1.0])),
        Wpos=jnp.eye(7, dtype=dtype) * 0.1,
        Wsmooth=jnp.zeros((7, 7), dtype),
        Qmin=a([-6.28319, -2.059, -6.28319, -0.19198, -6.28319, -1.69297,
                -6.28319]),
        Qmax=a([6.28319, 2.0944, 6.28319, 3.927, 6.28319, 3.14159, 6.28319]),
        Qdotmin=-jnp.ones(7, dtype) * 20.0,
        Qdotmax=jnp.ones(7, dtype) * 20.0,
        taumin=a([-50, -50, -30, -30, -30, -20, -20]),
        taumax=a([50, 50, 30, 30, 30, 20, 20]),
        K=jnp.diag(a([5000.0, 5000.0, 5000.0, 50.0, 50.0, 50.0])) * 0.1 * 10,
        K_null=jnp.eye(7, dtype=dtype),
        dt=dt,
    )


class ArmDynamics(NamedTuple):
    """Per-step dynamics snapshot (the 15-field shm schema of
    `arm.py:67-83`, minus the outputs), produced by the physics layer."""

    q: jnp.ndarray          # (7,)
    qd: jnp.ndarray         # (7,)
    jac: jnp.ndarray        # (6, 7)
    jac_dot: jnp.ndarray    # (6, 7)
    M: jnp.ndarray          # (7, 7)
    h: jnp.ndarray          # (7,) bias forces
    Mx_inv: jnp.ndarray     # (6, 6) task-space inertia inverse J M^-1 J'
    ee_pos: jnp.ndarray     # (3,)
    ee_quat: jnp.ndarray    # (4,) scalar-first


class ArmCarry(NamedTuple):
    qdd_prev: jnp.ndarray   # (7,)
    y: jnp.ndarray          # (21,) ADMM dual warm start


def arm_init_carry(dtype=jnp.float32) -> ArmCarry:
    return ArmCarry(qdd_prev=jnp.zeros(7, dtype), y=jnp.zeros(21, dtype))


def _safe_matrix_sqrt(mat: jnp.ndarray) -> jnp.ndarray:
    """eigh-based sqrt of |eigenvalues| (`arm.py:234-244`)."""
    w, v = jnp.linalg.eigh(mat)
    return (v * jnp.sqrt(jnp.abs(w))) @ v.T


def compute_torque(carry: ArmCarry, dynamics: ArmDynamics,
                   target_pos: jnp.ndarray, target_quat: jnp.ndarray,
                   params: ArmParams, qp_iters: int = 200):
    """One impedance control step. Returns (carry', tau, loss)."""
    q, qd = dynamics.q, dynamics.qd
    J, Jd = dynamics.jac, dynamics.jac_dot
    M, h, Mx_inv = dynamics.M, dynamics.h, dynamics.Mx_inv
    dt = jnp.asarray(params.dt, q.dtype)

    # Task-space error twist (`arm.py:341-344` + `arm.py:176-183`).
    dx = target_pos - dynamics.ee_pos
    rotvec = quat_error_rotvec(target_quat, dynamics.ee_quat)
    twist = jnp.concatenate([dx, rotvec])

    # Dynamics quantities (`arm.py:347-370`).
    Minv = jnp.linalg.pinv(M, rcond=1e-6)
    det = jnp.linalg.det(Mx_inv)
    Mx_direct = jnp.linalg.inv(
        Mx_inv + 1e-30 * jnp.eye(6, dtype=q.dtype))
    Mx_pinv = jnp.linalg.pinv(Mx_inv, rcond=1e-3)
    Mx = jnp.where(jnp.abs(det) > 1e-8, Mx_direct, Mx_pinv)

    mu = Mx @ (J @ (Minv @ h) + Jd @ qd)
    sqrt_Mx = _safe_matrix_sqrt(Mx)
    sqrt_K = jnp.sqrt(params.K)  # K diagonal, elementwise == matrix sqrt
    D = sqrt_Mx @ sqrt_K + sqrt_K @ sqrt_Mx

    F = -D @ (J @ qd) + params.K @ twist + mu
    b_imp = Jd @ qd - Mx_inv @ F          # E_imp = J qdd + b_imp
    beta = 2.0 * jnp.sqrt(jnp.diag(params.K_null)) * (-qd) + params.K_null @ (-q)

    # Quadratic form: cost = qdd' P/2 qdd + g' qdd + const.
    Ws = params.Wsmooth / (dt * dt)
    P = 2.0 * (J.T @ params.Wimp @ J + params.Wpos + Ws)
    P = 0.5 * (P + P.T)
    g = 2.0 * (J.T @ (params.Wimp @ b_imp) - params.Wpos @ beta
               - Ws @ carry.qdd_prev)

    # Two-sided constraints (`arm.py:399-405`).
    eye7 = jnp.eye(7, dtype=q.dtype)
    A = jnp.concatenate([0.5 * dt * dt * eye7, dt * eye7, M], axis=0)
    l = jnp.concatenate([params.Qmin - q - qd * dt, params.Qdotmin - qd,
                         params.taumin - h])
    u = jnp.concatenate([params.Qmax - q - qd * dt, params.Qdotmax - qd,
                         params.taumax - h])

    sol = solve_qp_admm(P, g, A, l, u, x0=carry.qdd_prev, y0=carry.y,
                        iters=qp_iters)
    qdd = sol.x
    # Final clamp to actuator limits: the plant's actuators saturate at
    # forcerange anyway (xarm7 MJCF actuator classes, world_general.xml:18-29),
    # so residual ADMM constraint slack never reaches the joints.
    tau = jnp.clip(M @ qdd + h, params.taumin, params.taumax)
    e_imp = J @ qdd + b_imp
    e_pos = qdd - beta
    qddd = (qdd - carry.qdd_prev) / dt
    loss = (e_imp @ params.Wimp @ e_imp + e_pos @ params.Wpos @ e_pos
            + qddd @ params.Wsmooth @ qddd)
    return ArmCarry(qdd_prev=qdd, y=sol.y), tau, loss
