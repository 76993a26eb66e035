"""Quaternion / rotation utilities (scalar-first [w, x, y, z] convention).

Implements exactly once the rotation math that the reference duplicates in six
places (SURVEY.md section 2.8): the Euler->quaternion tray-tilt conversion
(reference `PMPC/main_parallel.py:210-219`, `RMPC/dev_dual/rob_ctrl.py:355`),
the grasp-transform composition of DACTL (`PMPC/src/dualctl.py:22-56`), and
the quaternion-error -> rotation-vector used by the arm impedance controller
(`PMPC/src/controller/arm.py:176-183`).

All functions are pure jnp and batch transparently under `vmap`.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_mul(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q * r, scalar-first."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rw, rx, ry, rz = r[..., 0], r[..., 1], r[..., 2], r[..., 3]
    return jnp.stack(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions). Mirrors mju_negQuat."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by unit quaternion q (w,x,y,z)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def matrix_to_quat(R: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation matrix -> scalar-first unit quaternion (trace method with a
    positive-trace guard; adequate away from pi rotations, which the tray
    and EE frames never reach)."""
    t = jnp.trace(R)
    w = jnp.sqrt(jnp.maximum(1.0 + t, eps)) / 2.0
    d = jnp.maximum(4.0 * w, eps)
    x = (R[2, 1] - R[1, 2]) / d
    y = (R[0, 2] - R[2, 0]) / d
    z = (R[1, 0] - R[0, 1]) / d
    return quat_normalize(jnp.stack([w, x, y, z]))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix from unit quaternion (scalar-first)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(*q.shape[:-1], 3, 3)


def quat_from_euler_xyz(angles: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic x-y-z Euler angles -> scalar-first quaternion.

    Matches `scipy.spatial.transform.Rotation.from_euler('xyz', angles)`
    (reordered to scalar-first) and the hand-rolled formula of the reference
    drivers (`PMPC/main_parallel.py:210-219`): R = Rz(c) @ Ry(b) @ Rx(a).
    """
    half = angles * 0.5
    cx, cy, cz = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sx, sy, sz = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            cx * cy * cz + sx * sy * sz,
            sx * cy * cz - cx * sy * sz,
            cx * sy * cz + sx * cy * sz,
            cx * cy * sz - sx * sy * cz,
        ],
        axis=-1,
    )


def quat_to_euler_xyz(q: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic x-y-z Euler angles from a unit quaternion.

    Inverse of :func:`quat_from_euler_xyz`; matches scipy's
    `Rotation.as_euler('xyz')`. Used to read roll/pitch of the object for the
    LMPC 8-state (`LMPC/src/controller/rlmpc2.py:1034-1042`).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # R = Rz Ry Rx;  standard xyz (roll-pitch-yaw) extraction
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - x * z), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rotvec(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation vector (axis * angle) from a unit quaternion.

    Matches scipy `Rotation.as_rotvec()`; used for the orientation error of
    the impedance controller (`PMPC/src/controller/arm.py:180-183`).
    """
    # Make scalar part non-negative for the shortest rotation.
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    sin_half = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    # angle/sin(angle/2) with series expansion near zero: 2 + angle^2/12
    scale = jnp.where(sin_half > eps, angle / jnp.maximum(sin_half, eps),
                      2.0 + angle * angle / 12.0)
    return scale * v


def rotvec_to_quat(rv: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit quaternion from a rotation vector."""
    angle = jnp.linalg.norm(rv, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle with series expansion near zero: 0.5 - angle^2/48
    k = jnp.where(angle > eps, jnp.sin(half) / jnp.maximum(angle, eps),
                  0.5 - angle * angle / 48.0)
    return jnp.concatenate([jnp.cos(half), k * rv], axis=-1)


def tilt_to_quat(u: jnp.ndarray) -> jnp.ndarray:
    """Tray tilt command u = [theta_x, theta_y] -> tray target quaternion.

    The single canonical implementation of the conversion every reference
    driver hand-rolls: `Rot.from_euler('xyz', [u1, -u0, 0])` re-ordered to
    scalar-first (`PMPC/main.py:107-116`, `RMPC/dev_dual/rob_ctrl.py:355`,
    `LMPC/src/run.py:259-261`).
    """
    angles = jnp.stack([u[..., 1], -u[..., 0], jnp.zeros_like(u[..., 0])], axis=-1)
    return quat_from_euler_xyz(angles)


def quat_error_rotvec(target_quat: jnp.ndarray, current_quat: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector taking current orientation to target.

    Mirrors the reference sequence mju_negQuat -> mju_mulQuat -> as_rotvec
    (`PMPC/src/controller/arm.py:176-183`).
    """
    return quat_to_rotvec(quat_mul(target_quat, quat_conj(current_quat)))
