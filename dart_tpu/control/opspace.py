"""Closed-form operational-space controller (the legacy OPSPACE/CONVIMP
lineage of the reference, `RMPC/dev_dual/controller/opspace.py:5-147`).

Not on the main control path (the impedance QP of `dart_tpu.control.arm`
is), but part of the reference's API surface: a cheap no-optimization
fallback torque law, useful as a baseline and for debugging the physics
layer. Pure jnp over the same `ArmDynamics` snapshot.

tau = J' Mx (K twist - D (J qd) + mu)
      + (I - J' Jbar') (K_null (q0 - q) - 2 zeta sqrt(K_null) qd)
      + h                                     (gravity compensation)
with Jbar = M^-1 J' Mx (dynamically-consistent pseudoinverse), then
actuator clipping and a one-pole low-pass (alpha = 0.001).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dart_tpu.control.arm import ArmDynamics
from dart_tpu.utils.quat import quat_error_rotvec


class OpspaceParams(NamedTuple):
    K: jnp.ndarray           # (6,) task stiffness (diagonal)
    K_null: jnp.ndarray      # (7,) null-space stiffness (diagonal)
    q0: jnp.ndarray          # (7,) posture target (home keyframe)
    taumin: jnp.ndarray      # (7,)
    taumax: jnp.ndarray
    damping_ratio: float = 1.0
    gravity_compensation: bool = True
    lowpass_alpha: float = 0.001


class OpspaceCarry(NamedTuple):
    prev_tau: jnp.ndarray    # (7,) low-pass state


def opspace_init(dtype=jnp.float32) -> OpspaceCarry:
    return OpspaceCarry(prev_tau=jnp.zeros(7, dtype))


def opspace_torque(carry: OpspaceCarry, dyn: ArmDynamics,
                   target_pos: jnp.ndarray, target_quat: jnp.ndarray,
                   p: OpspaceParams):
    """One control step. Returns (carry', tau, twist_norm)."""
    J = dyn.jac
    qd = dyn.qd
    dx = target_pos - dyn.ee_pos
    twist = jnp.concatenate([dx, quat_error_rotvec(target_quat, dyn.ee_quat)])

    Minv = jnp.linalg.inv(dyn.M)
    Mx_inv = dyn.Mx_inv
    det = jnp.linalg.det(Mx_inv)
    Mx = jnp.where(jnp.abs(det) >= 1e-2,
                   jnp.linalg.inv(Mx_inv + 1e-30 * jnp.eye(6, dtype=J.dtype)),
                   jnp.linalg.pinv(Mx_inv, rcond=1e-2))

    D = 2.0 * p.damping_ratio * jnp.sqrt(p.K)
    mu = Mx @ (J @ Minv @ dyn.h - dyn.jac_dot @ qd)
    tau = J.T @ (Mx @ (p.K * twist - D * (J @ qd) + mu))

    Jbar = Minv @ J.T @ Mx
    ddq = p.K_null * (p.q0 - dyn.q) \
        - 2.0 * p.damping_ratio * jnp.sqrt(p.K_null) * qd
    tau = tau + (jnp.eye(7, dtype=J.dtype) - J.T @ Jbar.T) @ ddq
    if p.gravity_compensation:
        tau = tau + dyn.h

    tau = jnp.clip(tau, p.taumin, p.taumax)
    tau_f = p.lowpass_alpha * tau + (1.0 - p.lowpass_alpha) * carry.prev_tau
    return OpspaceCarry(prev_tau=tau_f), tau_f, jnp.linalg.norm(twist)
