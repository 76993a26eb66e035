"""Full-fidelity end-to-end stack, entirely inside one `lax.scan`:

    MPC solve -> tilt -> DACTL EE targets -> 2x impedance QP -> torques
      -> 2x 7-DoF arm forward dynamics -> tray pose from the rigid grasp
      -> object contact step -> observation back to the MPC

This is the jit-compiled replacement for the reference's 5-process topology
(SURVEY.md section 3.4): main sim + 2 arm-QP workers + MPC worker (+ RL
worker), MuJoCo `mj_step` and all `mj_*` dynamics queries included.

Grasp coupling model: the tray is welded to both end-effectors (the
reference's rigid-grasp assumption, `dualctl.py:30-33`); its pose is the
average of the two grasp-implied poses, and each arm feels half the
tray+object weight as an external end-effector force.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from dart_tpu.control import arm as arm_mod
from dart_tpu.control.dualarm import (L_GRASP_QUAT, R_GRASP_QUAT,
                                      resolve_ee_targets)
from dart_tpu.physics import chain as chain_mod
from dart_tpu.physics import tray_object as to_mod
from dart_tpu.utils.quat import (matrix_to_quat, quat_conj, quat_mul,
                                 quat_rotate, quat_to_euler_xyz,
                                 tilt_to_quat)

EE_OFFSET = (0.0, 0.0, 0.125)   # tool offset along EE z (`run.py:73`)
HOME_QL = (2.0, -0.15, -0.38, 0.49, 0.11, -0.93, 1.4)     # keyframe `home`
HOME_QR = (-1.1, -0.12, -0.47, 0.5, -0.018, -0.97, -1.6)  # world_general.xml:205
TRAY_MASS = 1.0                  # world_general.xml:136


class DualArmScene(NamedTuple):
    """Static scene: the two chains + controller gains."""

    left: chain_mod.ChainParams
    right: chain_mod.ChainParams
    arm_params: arm_mod.ArmParams


def make_scene(dt: float = 0.002, dtype=jnp.float32) -> DualArmScene:
    return DualArmScene(
        left=chain_mod.make_xarm7_chain((-0.7, 0, -0.12),
                                        (0.707, 0, 0, -0.707), dtype),
        right=chain_mod.make_xarm7_chain((0.7, 0, -0.12),
                                         (0.707, 0, 0, -0.707), dtype),
        arm_params=arm_mod.default_arm_params(dt=dt, dtype=dtype),
    )


class FullState(NamedTuple):
    qL: jnp.ndarray
    qdL: jnp.ndarray
    qR: jnp.ndarray
    qdR: jnp.ndarray
    armL: arm_mod.ArmCarry
    armR: arm_mod.ArmCarry
    obj: to_mod.TrayObjectState


def init_full_state(dtype=jnp.float32, p0=(0.0, 0.0)) -> FullState:
    return FullState(
        qL=jnp.asarray(HOME_QL, dtype), qdL=jnp.zeros(7, dtype),
        qR=jnp.asarray(HOME_QR, dtype), qdR=jnp.zeros(7, dtype),
        armL=arm_mod.arm_init_carry(dtype), armR=arm_mod.arm_init_carry(dtype),
        obj=to_mod.init_state(p0, dtype))


def _ee_pose(params: chain_mod.ChainParams, q: jnp.ndarray):
    f = chain_mod.fk(params, q)
    R = f.R[7]
    pos = f.p[7] + R @ jnp.asarray(EE_OFFSET, q.dtype)
    return pos, matrix_to_quat(R), f


def _arm_dynamics(params: chain_mod.ChainParams, q, qd, ee_pos, ee_quat):
    """Assemble the controller's dynamics snapshot (== compute_dynamics,
    `arm.py:111-199`: body-origin Jacobian for Mx, offset-point Jdot)."""
    M = chain_mod.mass_matrix(params, q)
    h = chain_mod.bias_forces(params, q, qd)
    J_body = chain_mod.body_jacobian(params, q, 7)
    Minv = jnp.linalg.inv(M)
    Mx_inv = J_body @ Minv @ J_body.T
    _, Jdot = chain_mod.jac_and_jacdot(params, q, qd, 7, EE_OFFSET)
    return arm_mod.ArmDynamics(q=q, qd=qd, jac=J_body, jac_dot=Jdot, M=M,
                               h=h, Mx_inv=Mx_inv, ee_pos=ee_pos,
                               ee_quat=ee_quat)


def _tray_pose_from_arms(posL, quatL, posR, quatR):
    """Rigid-grasp pose fit: the EE points ARE the tray-frame (+-0.175,0,0)
    grasp points, so the tray x-axis is fixed by the two positions (this is
    what makes theta_x tilts structurally stiff — height difference of the
    grasp points); only the roll about that grasp line comes from the wrist
    orientations (structurally limited by the rotational impedance
    stiffness, exactly as in the reference's finger-clamped tray)."""
    dtype = posL.dtype
    lq = jnp.asarray(L_GRASP_QUAT, dtype)
    rq = jnp.asarray(R_GRASP_QUAT, dtype)
    x_axis = posR - posL
    x_axis = x_axis / jnp.maximum(jnp.linalg.norm(x_axis), 1e-9)
    # Tray z-axes implied by each wrist orientation, averaged.
    qL_tray = quat_mul(quatL, quat_conj(lq))
    qR_tray = quat_mul(quatR, quat_conj(rq))
    zhat = jnp.asarray([0.0, 0.0, 1.0], dtype)
    z_avg = 0.5 * (quat_rotate(qL_tray, zhat) + quat_rotate(qR_tray, zhat))
    z_axis = z_avg - (z_avg @ x_axis) * x_axis
    z_axis = z_axis / jnp.maximum(jnp.linalg.norm(z_axis), 1e-9)
    y_axis = jnp.cross(z_axis, x_axis)
    R = jnp.stack([x_axis, y_axis, z_axis], axis=-1)
    pos = 0.5 * (posL + posR)
    return pos, matrix_to_quat(R)


def tray_tilt_from_quat(quat: jnp.ndarray) -> jnp.ndarray:
    """Invert the tilt convention: quat = from_euler('xyz', [u1, -u0, 0])
    =>  theta = [-(euler_y), euler_x]."""
    e = quat_to_euler_xyz(quat)
    return jnp.stack([-e[1], e[0]])


def compute_arm_torques(scene: DualArmScene, state: FullState,
                        u_cmd: jnp.ndarray,
                        obj_params: to_mod.TrayObjectParams,
                        qp_iters: int = 60):
    """DACTL + both impedance QPs at the current state: tray tilt command ->
    (armL', armR', tauL, tauR). Factored out of `full_step` so the QP rate
    can differ from the world rate (stale-torque replay, `arm.py:221-229`).
    """
    dtype = state.qL.dtype
    tray_target_pos = obj_params.tray_pos
    tray_target_quat = tilt_to_quat(u_cmd).astype(dtype)

    # DACTL: tray target -> EE mocap targets (`dualctl.py:22-56`).
    tgtL, tgtR = resolve_ee_targets(tray_target_pos, tray_target_quat)

    posL, quatL, _ = _ee_pose(scene.left, state.qL)
    posR, quatR, _ = _ee_pose(scene.right, state.qR)

    dynL = _arm_dynamics(scene.left, state.qL, state.qdL, posL, quatL)
    dynR = _arm_dynamics(scene.right, state.qR, state.qdR, posR, quatR)

    armL, tauL, _ = arm_mod.compute_torque(state.armL, dynL, tgtL.pos,
                                           tgtL.quat, scene.arm_params,
                                           qp_iters=qp_iters)
    armR, tauR, _ = arm_mod.compute_torque(state.armR, dynR, tgtR.pos,
                                           tgtR.quat, scene.arm_params,
                                           qp_iters=qp_iters)
    return armL, armR, tauL, tauR


def advance_world(scene: DualArmScene, state: FullState,
                  armL, armR, tauL, tauR,
                  obj_params: to_mod.TrayObjectParams,
                  dt: float) -> FullState:
    """Apply given torques and advance arms + tray + object by one dt."""
    dtype = state.qL.dtype
    # Each arm carries half the tray+object weight at the EE.
    load = -(TRAY_MASS + obj_params.mass) * chain_mod.GRAVITY / 2.0
    f_ext = jnp.concatenate([jnp.stack([0.0, 0.0, load]).astype(dtype),
                             jnp.zeros(3, dtype)])
    qL, qdL = chain_mod.step(scene.left, state.qL, state.qdL, tauL, dt,
                             f_ext=f_ext)
    qR, qdR = chain_mod.step(scene.right, state.qR, state.qdR, tauR, dt,
                             f_ext=f_ext)

    # Tray pose from the rigid grasp; tilt drives the object contact step.
    posL2, quatL2, _ = _ee_pose(scene.left, qL)
    posR2, quatR2, _ = _ee_pose(scene.right, qR)
    _, tray_quat = _tray_pose_from_arms(posL2, quatL2, posR2, quatR2)
    theta = tray_tilt_from_quat(tray_quat)
    theta_dot = (theta - state.obj.theta) / dt
    obj = to_mod.step_object(state.obj, theta, theta_dot, obj_params, dt)

    return FullState(qL=qL, qdL=qdL, qR=qR, qdR=qdR, armL=armL, armR=armR,
                     obj=obj)


def full_step(scene: DualArmScene, state: FullState, u_cmd: jnp.ndarray,
              obj_params: to_mod.TrayObjectParams, dt: float,
              qp_iters: int = 60) -> FullState:
    """One 2 ms step of the complete dual-arm + tray + object world."""
    armL, armR, tauL, tauR = compute_arm_torques(scene, state, u_cmd,
                                                 obj_params, qp_iters)
    return advance_world(scene, state, armL, armR, tauL, tauR, obj_params,
                         dt)


def observe_object(state: FullState, obj_params: to_mod.TrayObjectParams):
    """6-state observation [px, vx, py, vy, pz, vz] for the PMPC front-end."""
    pos, vel = to_mod.observe_world(state.obj, obj_params)
    return jnp.stack([pos[0], vel[0], pos[1], vel[1], pos[2], vel[2]])


def observe_object_4(state: FullState, obj_params: to_mod.TrayObjectParams):
    """[px, vx, py, vy] for the RMPC front-end (`np_mpc...py:195-198`)."""
    pos, vel = to_mod.observe_world(state.obj, obj_params)
    return jnp.stack([pos[0], vel[0], pos[1], vel[1]])


def observe_object_8(state: FullState, obj_params: to_mod.TrayObjectParams):
    """8-state [px,vx,py,vy,th_x,om_x,th_y,om_y] for the LMPC front-end
    (`rlmpc2.py:1034-1042`): the object rides the tray, so its roll/pitch are
    the tray's euler angles (e_x = tilt about x = theta[1], e_y = -theta[0])."""
    pos, vel = to_mod.observe_world(state.obj, obj_params)
    th = state.obj.theta
    thd = state.obj.theta_dot
    return jnp.stack([pos[0], vel[0], pos[1], vel[1],
                      th[1], thd[1], -th[0], -thd[0]])


@partial(jax.jit, static_argnames=("solve_fn", "n_steps", "control_every",
                                   "warmup_steps", "qp_iters", "observe",
                                   "qp_every", "record_joints"))
def run_full_stack(scene: DualArmScene, solve_fn: Callable, ctrl_carry0: Any,
                   state0: FullState, target: jnp.ndarray,
                   obj_params: to_mod.TrayObjectParams, n_steps: int,
                   dt: float = 0.002, control_every: int = 1,
                   warmup_steps: int = 0, qp_iters: int = 60,
                   observe: Callable = observe_object, qp_every: int = 1,
                   record_joints: bool = False):
    """Closed loop over the full stack. solve_fn(carry, obs, target) ->
    (carry, u, diag). Returns stacked (obj states, controls, final state);
    with ``record_joints`` the tuple gains per-step (qL, qR) joint
    trajectories for scene-true rendering (`io.video.render_scene`).

    `qp_every` replays the reference's arm-QP deadline semantics
    (`PMPC/src/controller/arm.py:221-229`): the per-arm impedance QP waits
    up to 5 ms for its worker and falls back to the STALE torque on a miss.
    With qp_every=k the QPs re-solve every k-th 2 ms world step and the
    last torques are held in between — qp_every=3 reproduces a persistent
    ~5 ms deadline miss; 1 (default) is the deadline-met case.
    """

    def stepf(carry, k):
        ctrl_carry, st, u_held, tau_held = carry
        obs = observe(st, obj_params)
        do_solve = (k >= warmup_steps) & ((k - warmup_steps) % control_every == 0)

        def s_branch(c):
            c2, u, _ = solve_fn(c, obs, target)
            return c2, u

        def h_branch(c):
            return c, u_held

        ctrl_carry, u = jax.lax.cond(do_solve, s_branch, h_branch, ctrl_carry)
        u_apply = jnp.where(k >= warmup_steps, u, jnp.zeros_like(u))

        if qp_every == 1:
            st = full_step(scene, st, u_apply, obj_params, dt,
                           qp_iters=qp_iters)
            tau_new = tau_held
        else:
            def qp_branch(st):
                armL, armR, tL, tR = compute_arm_torques(
                    scene, st, u_apply, obj_params, qp_iters)
                return st._replace(armL=armL, armR=armR), \
                    jnp.concatenate([tL, tR])

            def stale_branch(st):
                return st, tau_held

            st, tau_new = jax.lax.cond(k % qp_every == 0, qp_branch,
                                       stale_branch, st)
            st = advance_world(scene, st, st.armL, st.armR, tau_new[:7],
                               tau_new[7:], obj_params, dt)
        out = (st.obj.p, st.obj.theta, u_apply)
        if record_joints:
            out = out + (st.qL, st.qR)
        return (ctrl_carry, st, u, tau_new), out

    (ctrl_carry, st, _, _), outs = jax.lax.scan(
        stepf, (ctrl_carry0, state0, jnp.zeros(2, state0.qL.dtype),
                jnp.zeros(14, state0.qL.dtype)),
        jnp.arange(n_steps))
    if record_joints:
        ps, thetas, us, qLs, qRs = outs
        return ps, thetas, us, qLs, qRs, st
    ps, thetas, us = outs
    return ps, thetas, us, st
