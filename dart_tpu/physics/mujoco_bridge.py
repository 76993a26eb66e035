"""MuJoCo-in-the-loop ground-truth harness.

The reference's verification strategy is "the simulator is the oracle"
(SURVEY.md section 4.3): every headline number is measured on `mj_step` over
the world MJCFs. This module closes that loop for dart_tpu — it drives the
*reference's own world* (`LMPC/models/xarm7/world_general.xml`, rewritten per
scenario exactly like `RMPC/dev_dual/rob_ctrl.py:88-179`) with dart_tpu's
controllers:

    dart_tpu MPC (PMPC/RMPC/LMPC) -> tilt u
      -> dart_tpu DACTL grasp transforms -> EE targets
      -> dart_tpu impedance QP (chain.py dynamics == mj queries, see
         tests/test_mujoco_oracle.py) -> torques
      -> data.ctrl  -> mujoco.mj_step    (fingers physically clamp the tray)

mirroring the reference drivers step-for-step (`PMPC/main.py:90-125`,
`rob_ctrl.py:330-416`): MPC every sim step by default, tray position target
frozen at its initial pose, tilt from the MPC command, gripper actuators at
255, world-frame object state from body xpos/cvel.

This is host-loop code by design (MuJoCo is a C library): the per-step torque
computation and the MPC solves are jitted; `mj_step` runs between dispatches.
Use it for fidelity measurement and calibration, not throughput — the
pure-JAX `rollout.full_stack` / `rollout.evaluate` paths are the production
evaluators.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import numpy as np

try:
    import mujoco
    HAVE_MUJOCO = True
except ImportError:  # pragma: no cover - baked into this environment
    mujoco = None
    HAVE_MUJOCO = False

import jax
import jax.numpy as jnp

from dart_tpu.control import arm as arm_mod
from dart_tpu.control import mpc as mpc_mod
from dart_tpu.control.dualarm import resolve_ee_targets
from dart_tpu.models import dynamics as dyn
from dart_tpu.physics import chain as chain_mod
from dart_tpu.rollout import full_stack as fs
from dart_tpu.rollout.metrics import compute_metrics
from dart_tpu.utils.quat import tilt_to_quat

WORLD_XML = "/root/reference/LMPC/models/xarm7/world_general.xml"
OBJECT_BODY = "cube2"           # the LMPC world's placeholder object body
TRAY_TOP_Z = 0.405              # tray box top: pos 0.4 + half-height 0.005


# --------------------------------------------------------------------------
# World construction (the rob_ctrl.py:88-179 object rewrite, via MjSpec —
# no files are written; the reference tree stays read-only)
# --------------------------------------------------------------------------

def make_world(shape: str = "cube", mass: float = 1.0, mu: float = 0.1,
               edge: float = 0.05, radius: float = 0.025,
               height: float = 0.05, obj_xy=(0.0, 0.0), drop: float = 0.005,
               xml: str = WORLD_XML):
    """Compile the reference world with the scenario's object geometry.

    Mirrors `rewrite_xml_object_block` (`rob_ctrl.py:124-179`): replaces the
    placeholder object geom with the commanded shape/mass/friction AND sets
    the world's unclassed default-geom friction to mu (the reference's
    "UPDATE FRICTION HERE" default governs the tray surface; MuJoCo combines
    contact friction as the max of the two geoms, so both must move).
    """
    assert HAVE_MUJOCO, "mujoco not available"
    spec = mujoco.MjSpec.from_file(xml)
    body = spec.body(OBJECT_BODY)
    geom = body.geoms[0]
    # Friction triple [sliding, torsional, rolling]: the reference's
    # randomiser writes mu * [1, 1, 0.01] (`LMPC/src/run.py:221-223`; the
    # committed XML example is 0.2 0.2 0.002, `world_general.xml:159`) —
    # the rolling coefficient is mu-resolved, not the flat 0.001 r1-r4
    # wrote here. Physically inert either way: every geom in this world
    # is condim 3, so only the sliding entry reaches the contact solver
    # (measured — tools/measure_roll_stiction.py); matched for spec
    # parity.
    fric = [mu, mu, mu / 100.0]
    quat0 = [1.0, 0.0, 0.0, 0.0]
    if shape == "cube":
        geom.type = mujoco.mjtGeom.mjGEOM_BOX
        h = 0.5 * edge
        geom.size = [h, h, h]
        rest_h = h
    elif shape == "cylinder":
        # The reference's cylinders lie ON THEIR SIDE and roll: the PMPC
        # cylinder worlds' home keyframe rotates the free body 90 deg
        # (`world_cylinder_*.xml` keyframe quat 0.5 0 0.5 0) and the LMPC
        # randomiser selects keyframe `home2` (object quat 0.707 0.707 0 0)
        # for cylinders (`run.py:213-218`, `world_general.xml:174`).
        geom.type = mujoco.mjtGeom.mjGEOM_CYLINDER
        geom.size = [radius, 0.5 * height, 0.0]
        rest_h = radius
        quat0 = [0.7071068, 0.7071068, 0.0, 0.0]
    elif shape == "sphere":
        geom.type = mujoco.mjtGeom.mjGEOM_SPHERE
        geom.size = [radius, 0.0, 0.0]
        rest_h = radius
    else:
        raise ValueError(shape)
    geom.mass = mass
    geom.friction = fric
    # The reference rewrites the anonymous top-level <default> geom friction
    # ("UPDATE FRICTION HERE", `rob_ctrl.py:140-143`), which governs the tray
    # and floor. MjSpec resolves default attributes onto geoms at parse time,
    # so mutating spec.default post-load is a no-op — set every class-"main"
    # geom explicitly instead (same set the reference's rewrite touches).
    # Without this the tray stays at 0.1 and the effective contact friction
    # (elementwise max of the pair) floors at 0.1, silently turning the
    # mu=0.05 column into a second mu=0.1 column.
    spec.default.geom.friction = fric
    for g in spec.geoms:
        if g.classname is not None and g.classname.name == "main":
            g.friction = fric

    # Object start pose in the home keyframe (keyframe layout:
    # `world_general.xml:173` — object free joint is the last 7 qpos).
    key = spec.key("home")
    qpos = np.array(key.qpos)
    qpos[-7:] = [obj_xy[0], obj_xy[1], TRAY_TOP_Z + rest_h + drop] + quat0
    key.qpos = qpos

    model = spec.compile()
    data = mujoco.MjData(model)
    mujoco.mj_resetDataKeyframe(model, data, 0)
    mujoco.mj_forward(model, data)
    return model, data


@dataclass
class MjIndex:
    """Cached id tables for the dual-arm world."""

    qposL: np.ndarray
    dofL: np.ndarray
    qposR: np.ndarray
    dofR: np.ndarray
    act: np.ndarray          # 14 arm motor actuators, L then R
    grip_act: np.ndarray     # 2 gripper actuators
    tray_bid: int
    obj_bid: int


def index_world(model) -> MjIndex:
    def jadr(prefix):
        js = [mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_JOINT,
                                f"{prefix}_joint{i}") for i in range(1, 8)]
        return (np.array([model.jnt_qposadr[j] for j in js]),
                np.array([model.jnt_dofadr[j] for j in js]))

    qposL, dofL = jadr("L")
    qposR, dofR = jadr("R")
    act = np.array([mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_ACTUATOR,
                                      f"{s}_act{i}")
                    for s in ("L", "R") for i in range(1, 8)])
    grip = np.array([mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_ACTUATOR,
                                       f"{s}_gripper") for s in ("L", "R")])
    return MjIndex(
        qposL=qposL, dofL=dofL, qposR=qposR, dofR=dofR, act=act,
        grip_act=grip,
        tray_bid=mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, "tray"),
        obj_bid=mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY,
                                  OBJECT_BODY))


def observe6(data, idx: MjIndex) -> np.ndarray:
    """World-frame [px, vx, py, vy, pz, vz] (`PMPC/main.py:98-101`)."""
    p = data.xpos[idx.obj_bid]
    v = data.cvel[idx.obj_bid][3:6]
    return np.array([p[0], v[0], p[1], v[1], p[2], v[2]])


def observe4(data, idx: MjIndex) -> np.ndarray:
    """World-frame [px, vx, py, vy] (`np_mpc...py:195-198`)."""
    p = data.xpos[idx.obj_bid]
    v = data.cvel[idx.obj_bid][3:6]
    return np.array([p[0], v[0], p[1], v[1]])


# --------------------------------------------------------------------------
# Jitted low-level stack: tray target -> both arm torques
# --------------------------------------------------------------------------

def make_torque_fn(dt: float = 0.002, qp_iters: int = 60,
                   dtype=jnp.float64) -> Callable:
    """Jitted (armL, armR, qL, qdL, qR, qdR, tray_pos, tray_quat) ->
    (armL', armR', tau (14,)) using dart_tpu's chains + impedance QP —
    the in-dataflow DACTL + 2x ARMCONTROL of `rollout.full_stack`, exposed
    for the MuJoCo host loop."""
    scene = fs.make_scene(dt=dt, dtype=dtype)

    @jax.jit
    def torque(armL, armR, qL, qdL, qR, qdR, tray_pos, u):
        tray_quat = tilt_to_quat(u).astype(dtype)
        tgtL, tgtR = resolve_ee_targets(tray_pos, tray_quat)
        posL, quatL, _ = fs._ee_pose(scene.left, qL)
        posR, quatR, _ = fs._ee_pose(scene.right, qR)
        dynL = fs._arm_dynamics(scene.left, qL, qdL, posL, quatL)
        dynR = fs._arm_dynamics(scene.right, qR, qdR, posR, quatR)
        armL, tauL, _ = arm_mod.compute_torque(
            armL, dynL, tgtL.pos, tgtL.quat, scene.arm_params,
            qp_iters=qp_iters)
        armR, tauR, _ = arm_mod.compute_torque(
            armR, dynR, tgtR.pos, tgtR.quat, scene.arm_params,
            qp_iters=qp_iters)
        return armL, armR, jnp.concatenate([tauL, tauR])

    return torque


# --------------------------------------------------------------------------
# Closed loop
# --------------------------------------------------------------------------

def run_closed_loop(model, data, solve_fn: Callable, ctrl_carry,
                    observe: Callable, target_xy, n_steps: int = 2500,
                    control_every: int = 1, tol: float = 0.01,
                    qp_iters: int = 60, stop_on_converge: bool = True,
                    torque_fn: Callable | None = None):
    """Drive the MuJoCo world with a dart_tpu controller.

    `solve_fn(carry, obs, target_xy_world) -> (carry, u)` is called every
    `control_every` sim steps (reference drivers: every step); between
    solves the last tilt is held. Mirrors `rob_ctrl.py:330-416`: tray
    position target frozen at its initial pose, tilt from u, gripper at 255,
    loop breaks when the world-frame XY error first crosses `tol`.

    Returns a dict with metrics + per-step logs.
    """
    idx = index_world(model)
    dt = float(model.opt.timestep)
    if torque_fn is None:
        torque_fn = make_torque_fn(dt=dt, qp_iters=qp_iters)

    tray_pos0 = jnp.asarray(data.xpos[idx.tray_bid].copy(), jnp.float64)
    target_w = np.array([tray_pos0[0] + target_xy[0],
                         tray_pos0[1] + target_xy[1]])

    armL = arm_mod.arm_init_carry(jnp.float64)
    armR = arm_mod.arm_init_carry(jnp.float64)
    u = np.zeros(2)
    ps, us, errs = [], [], []
    converged_at = None

    for k in range(n_steps):
        if k % control_every == 0:
            obs = observe(data, idx)
            ctrl_carry, u_j = solve_fn(ctrl_carry, jnp.asarray(obs),
                                       jnp.asarray(target_w))
            u = np.asarray(u_j)
        qL = jnp.asarray(data.qpos[idx.qposL])
        qdL = jnp.asarray(data.qvel[idx.dofL])
        qR = jnp.asarray(data.qpos[idx.qposR])
        qdR = jnp.asarray(data.qvel[idx.dofR])
        armL, armR, tau = torque_fn(armL, armR, qL, qdL, qR, qdR,
                                    tray_pos0, jnp.asarray(u, jnp.float64))
        data.ctrl[idx.act] = np.asarray(tau)
        data.ctrl[idx.grip_act] = 255.0
        mujoco.mj_step(model, data)

        p = data.xpos[idx.obj_bid]
        ps.append([p[0], p[1], p[2]])
        us.append(u.copy())
        err = float(np.hypot(p[0] - target_w[0], p[1] - target_w[1]))
        errs.append(err)
        if converged_at is None and err < tol:
            converged_at = k
            if stop_on_converge:
                break

    ps = np.asarray(ps)
    us = np.asarray(us)
    T = ps.shape[0]
    X = np.stack([ps[:, 0], np.zeros(T), ps[:, 1], np.zeros(T)], axis=-1)
    m = compute_metrics(jnp.asarray(X), jnp.asarray(us),
                        jnp.asarray(target_w), dt, tol=tol)
    return {
        "metrics": jax.tree.map(lambda x: np.asarray(x).item(), m._asdict()),
        "ps": ps, "us": us, "errs": np.asarray(errs),
        "converged_at": converged_at, "target_w": target_w, "dt": dt,
    }


# --------------------------------------------------------------------------
# Controller adapters (close dart_tpu controllers over their params so the
# loop sees a uniform solve_fn(carry, obs, target_xy) -> (carry, u))
# --------------------------------------------------------------------------

def pmpc_solve_fn(shape: str = "cube", mu: float = 0.1, N: int = 15,
                  dt: float = 0.002, max_iters: int = 10,
                  rolling_aware: bool = True):
    """PMPC adapter: per-object weight table + analytic model, world-frame
    6-state obs (`PMPC/main.py:98-118`).

    `rolling_aware` (an improvement over the reference, which loses the
    high-friction sphere with its analytic slide model): a sphere with
    mu >= (2/7) tan(theta) rolls without slipping, which reduces EXACTLY to
    the same point-mass model with mu_eff = 0 and g scaled by 5/7
    (a = (5/7) g sin(theta), no stiction threshold) — plus a heavier
    velocity weight since rolling has no frictional dissipation to brake
    against. Turns the reference grid's PMPC sphere/mu=0.2 failure into a
    0.7 s convergence; pass False for strict reference behaviour.
    """
    ctlr = mpc_mod.PMPC(N=N, dt=dt,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=max_iters))
    weights = mpc_mod.PMPC_WEIGHTS.get(shape, mpc_mod.PMPC_WEIGHTS["general"])
    # High-friction schedule for sliding objects (see
    # `mpc.pmpc_schedule_weights`): without it the mu=0.2 cube/cylinder
    # lanes of the MuJoCo grid park 10-13 mm short of the 1 cm gate.
    weights = jax.tree.map(
        jnp.asarray,
        mpc_mod.pmpc_schedule_weights(weights, mu, shape != "sphere"))
    if rolling_aware and shape == "sphere" and mu >= 0.15:
        params = dyn.PMPCParams(mu=jnp.asarray(0.0, jnp.float64),
                                g=(5.0 / 7.0) * dyn.GRAVITY_Z, dt=dt)
        weights = mpc_mod.PMPCWeights(Qp=jnp.asarray(200.0),
                                      Qv=jnp.asarray(8.0),
                                      R=jnp.asarray(0.2))
    else:
        params = dyn.PMPCParams(mu=jnp.asarray(mu, jnp.float64), dt=dt)

    @jax.jit
    def solve(carry, obs, target_w):
        target6 = jnp.stack([target_w[0], 0.0, target_w[1], 0.0,
                             jnp.asarray(0.43, jnp.float64), 0.0])
        carry, u, _ = ctlr.solve(carry, obs, target6, params, weights)
        return carry, u

    return solve, ctlr.init_carry(jnp.float64), observe6


def observe8(data, idx: MjIndex) -> np.ndarray:
    """World-frame LMPC 8-state [px, vx, py, vy, th_x, om_x, th_y, om_y]
    from the OBJECT body's pose (`rlmpc2.py:1034-1042`: xpos/cvel + the
    body's own roll/pitch — which tracks the tray's while resting on it)."""
    from scipy.spatial.transform import Rotation as Rot

    p = data.xpos[idx.obj_bid]
    v = data.cvel[idx.obj_bid][3:5]
    om = data.cvel[idx.obj_bid][:2]
    th = Rot.from_matrix(data.xmat[idx.obj_bid].reshape(3, 3)).as_euler(
        "xyz")[:2]
    return np.array([p[0], v[0], p[1], v[1], th[0], om[0], th[1], om[1]])


def lmpc_solve_fn(policy_params, policy_model, N: int = 12, dt: float = 0.01,
                  max_iters: int = 4, param_update_every: int = 8,
                  freeze_tol: float = 0.01, reengage_tol: float = None):
    """LMPC adapter: trained policy tunes the 34 model params online while
    the LMPC solves over them — `run.py:243-311` semantics (Welford+history
    observation, param action every 8 control periods, u *= -1 sign flip,
    `run.py:256`). The controller carry packs (LMPCCarry, current_k,
    welford, history, u_prev, step, frozen).

    Adaptation clutch (r4): once the tracking error first drops below
    ``freeze_tol`` the 34-param vector is FROZEN while the MPC keeps
    solving. At zero tracking error the tuner has no excitation and
    its continued parameter drift can destabilise marginal lanes (the
    near-frictionless sphere rolled off the tray tens of seconds AFTER
    converging). This is the same zero-excitation guard the RMPC path
    applies to its RLS at convergence, and is strictly more demanding
    than the reference, which breaks the whole episode at first crossing
    (`run.py:300-306`) and never demonstrates post-convergence control.

    r5: the clutch is HYSTERETIC, not sticky — if the error re-exceeds
    ``reengage_tol`` (default 1.2 x freeze_tol; a reengage sensitivity
    probe on the worst MuJoCo sphere lanes measured monotone improvement
    toward tighter bands — 20.2 -> 16.6 mm settled at 1.2x vs 4x — and
    cube lanes hold millimetres inside the band either way) adaptation
    resumes: a
    wandering post-convergence object is precisely the excitation regime
    the tuner was trained for, and locking it out forever left the r4
    settled rolling lanes with no recovery path (see
    `rollout.evaluate.make_lmpc_evaluator`)."""
    from dart_tpu.adapt import lmpc_trainer as trainer
    from dart_tpu.adapt import ppo as ppo_mod

    ctlr = mpc_mod.LMPC(N=N, dt=dt,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=max_iters))
    act_cfg = ppo_mod.ParamActionConfig()
    if reengage_tol is None:
        reengage_tol = 1.2 * freeze_tol

    @jax.jit
    def solve(carry, obs, target_w):
        cc, current_k, welford, history, u_prev, k, frozen = carry
        target8 = jnp.zeros(8, jnp.float64).at[0].set(target_w[0]).at[2].set(
            target_w[1])
        base = jnp.concatenate([obs, target8, u_prev, current_k])
        welford = ppo_mod.welford_update(welford, base)
        norm = ppo_mod.welford_normalize(welford, base)
        history = jnp.concatenate([history[1:], norm[None]], axis=0)
        mean, _, _ = policy_model.apply(policy_params, history.reshape(-1))
        k_new = ppo_mod.apply_param_action(current_k, mean, act_cfg)
        # Freeze BEFORE the current-step gating (ADVICE r4): if the error
        # has already crossed freeze_tol by this solve, no further param
        # update lands — "frozen at first crossing" exactly, mirroring
        # evaluate.py's stopped-gating order.
        err = jnp.hypot(obs[0] - target8[0], obs[2] - target8[2])
        # Freeze only when genuinely settled (slow), not on a swing-
        # through crossing — see rollout.evaluate.make_lmpc_evaluator.
        speed = jnp.hypot(obs[1], obs[3])
        frozen = (frozen | ((err < freeze_tol) & (speed < 0.02))) \
            & (err < reengage_tol)
        current_k = jnp.where(((k % param_update_every) == 0) & (~frozen),
                              k_new, current_k)
        cc, u, _ = ctlr.solve(cc, obs, target8, current_k)
        # (A flatten-the-tray hysteresis hold was tried here in r4 and
        # REJECTED: rolling objects leave the hold band still moving and
        # the re-engaging frozen-model control kicks them — measured
        # strictly worse than continuous control on both plants.)
        return (cc, current_k, welford, history, u, k + 1, frozen), -u

    def init_carry(rng=None):
        d = jnp.float64
        init_k = jax.random.uniform(
            rng if rng is not None else jax.random.PRNGKey(0),
            (trainer.N_PARAMS,), d, minval=act_cfg.min_k,
            maxval=act_cfg.k_max / 2)
        return (ctlr.init_carry(d), init_k,
                ppo_mod.welford_init(trainer.BASE_OBS_DIM, d),
                jnp.zeros((trainer.HISTORY_LEN, trainer.BASE_OBS_DIM), d),
                jnp.zeros(2, d), jnp.zeros((), jnp.int32),
                jnp.zeros((), bool))

    return solve, init_carry(), observe8


def rmpc_solve_fn(N: int = 20, dt: float = 0.002, max_iters: int = 10,
                  state0=None):
    """RMPC adapter: RLS + governor + staged ref inside `RMPC.solve`,
    world-frame 4-state obs (`rob_ctrl.py:330-361`)."""
    ctlr = mpc_mod.RMPC(N=N, dt=dt,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=max_iters,
                                                    al_iters=3))

    @jax.jit
    def solve(carry, obs, target_w):
        target4 = jnp.stack([target_w[0], 0.0, target_w[1], 0.0])
        carry, u, _ = ctlr.solve(carry, obs, target4)
        return carry, u

    s0 = jnp.zeros(4, jnp.float64) if state0 is None else jnp.asarray(
        state0, jnp.float64)
    return solve, ctlr.init_carry(s0, jnp.float64), observe4
