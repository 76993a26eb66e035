"""Dual-arm coordination (DACTL): tray pose -> end-effector targets.

Pure-function re-implementation of `PMPC/src/dualctl.py:7-66` /
`LMPC/src/dualctl.py` (the reference keeps three copies; SURVEY.md 2.8).
The two grasp transforms are the rigid tray-grasp offsets fixed at grasp
time: +-0.175 m along the tray x-axis with fixed relative orientations.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dart_tpu.utils.quat import quat_mul, quat_rotate

# Grasp transforms (`dualctl.py:32-33`), scalar-first quaternions.
L_GRASP_POS = (-0.175, 0.0, 0.0)
L_GRASP_QUAT = (0.5, 0.5, 0.5, 0.5)
R_GRASP_POS = (0.175, 0.0, 0.0)
R_GRASP_QUAT = (0.5, -0.5, -0.5, 0.5)


class EEPose(NamedTuple):
    pos: jnp.ndarray    # (..., 3)
    quat: jnp.ndarray   # (..., 4) scalar-first


def resolve_ee_targets(obj_pos: jnp.ndarray, obj_quat: jnp.ndarray):
    """Desired tray pose -> (left EE target, right EE target).

    EE = T_obj * T_grasp: position obj_pos + R(obj_quat) @ grasp_pos,
    orientation obj_quat * grasp_quat (`dualctl.py:43-49`).
    """
    dtype = obj_pos.dtype
    lp = jnp.asarray(L_GRASP_POS, dtype)
    rp = jnp.asarray(R_GRASP_POS, dtype)
    lq = jnp.asarray(L_GRASP_QUAT, dtype)
    rq = jnp.asarray(R_GRASP_QUAT, dtype)
    left = EEPose(pos=obj_pos + quat_rotate(obj_quat, lp),
                  quat=quat_mul(obj_quat, lq))
    right = EEPose(pos=obj_pos + quat_rotate(obj_quat, rp),
                   quat=quat_mul(obj_quat, rq))
    return left, right
