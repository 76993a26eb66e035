"""Tray-object contact plant: the ground-truth simulator for evaluation.

Replaces the role of MuJoCo's `mj_step` for the tray-tilt task
(`PMPC/main_parallel.py:227`, `rob_ctrl.py:364`, `run.py:268`): an object
(cube / cylinder / sphere; mass x friction from the 18-config grid,
`README.md:101-105`) rests on a tray whose tilt tracks the commanded
[theta_x, theta_y] through a second-order lag (modelling the dual-arm
impedance tracking); the object slides/rolls under regularised Coulomb
friction.

Model notes:
- Tray-frame tangential gravity: g_t = [-g sin(tx), -g cos(tx) sin(ty)],
  normal g_n = g cos(tx) cos(ty) — exact for the reference tilt-quaternion
  convention Rot.from_euler('xyz', [u1, -u0, 0]) (verified in tests against
  the PMPC analytic model's g*sin(theta) small-tilt form).
- Slip-based friction with rolling coupling: slip s = v - v_roll; kinetic
  friction a_f = -mu g_n tanh(s/eps); the rolling state integrates
  v_roll' = -a_f * kappa_inv with per-axis inverse rolling inertia factors
  kappa_inv = (0,0) cube, (2,0) cylinder (rolls along x only), (2.5,2.5)
  sphere. In the stiction/rolling limit this recovers a = g_t/(1+kappa)
  (5/7 g for spheres, 2/3 g for cylinders) and Coulomb stick for cubes
  without mode switching — the same regularisation philosophy as MuJoCo's
  `noslip_iterations` solver the reference relies on.
- Toppling IS modelled, as per-axis rocking about the downhill support edge
  (the failure mode the LMPC reward penalises via its contact-loss event,
  `rlmpc2.py:734-736`, and whose restoring torque -m g h_com sin(theta) the
  LMPC transition model carries, `rlmpc2.py:389-398`). A flat-bottomed
  object with support half-width w and COM height h starts rocking when the
  tangential gravity lever exceeds the restoring one (|g_t| h > w g_n,
  i.e. tilt > atan(w/h): ~0.785 rad for the 5 cm cube, outside the 0.6 rad
  static bound but reachable dynamically through tray-lag overshoot);
  it topples once the COM passes over the edge (|q| > atan(w/h)). Contact
  at q=0 is inelastic (rocking energy is absorbed, as in MuJoCo's hard
  contacts). Rolling axes (cylinder x, sphere both) do not rock.

Pure jnp; a scenario batch is a vmap axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

G0 = 9.81

# Tray half-extents (`world_general.xml:135`: box size 0.2 0.15 0.005).
TRAY_LIMIT_X = 0.2
TRAY_LIMIT_Y = 0.15

SHAPES = ("cube", "cylinder", "sphere")

# Tray-tracking lag measured against the REAL MuJoCo reference world
# (tools/calibrate_tray_object.py: step-response fit of the realised tray
# tilt when the full dart_tpu arm stack drives mj_step; artifact
# artifacts/mujoco/tray_object_calibration.npz). Heavily overdamped and
# per-axis asymmetric — the theta_x axis is structurally stiff (grasp-line
# height difference) but slow, theta_y faster. The r1 default (40, 1.0)
# is optimistic: with the calibrated lag the contact-plant PMPC
# convergence time lands within 5% of the MuJoCo closed loop (0.97 s vs
# 1.03 s on cube/1kg/mu=0.1). Pass via make_params(..., calibrated=True)
# or the evaluators' tray_lag argument.
CALIBRATED_TRAY_LAG = ((46.4, 99.8), (10.7, 4.9))   # (omega_n_xy, zeta_xy)
# Per-axis inverse rolling factors kappa_inv = 1/kappa (see module docstring).
_KAPPA_INV = {
    "cube": (0.0, 0.0),
    "cylinder": (2.0, 0.0),
    "sphere": (2.5, 2.5),
}
# Per-axis rocking enable: only flat-bottomed, non-rolling axes can tip
# (cube both axes; a side-lying cylinder tips over its flat ends along its
# axis but rolls across it; a sphere never tips).
_TOPPLE_ON = {
    "cube": (1.0, 1.0),
    "cylinder": (0.0, 1.0),
    "sphere": (0.0, 0.0),
}


class TrayObjectParams(NamedTuple):
    mass: jnp.ndarray            # kg (does not affect slide/roll kinematics
    #                              but is kept for effort/wrench accounting)
    mu: jnp.ndarray              # sliding friction coefficient
    kappa_inv: jnp.ndarray       # (2,) per-axis inverse rolling factor
    slip_eps: jnp.ndarray        # friction regularisation velocity (m/s)
    omega_n: jnp.ndarray         # tray tracking bandwidth (rad/s)
    zeta: jnp.ndarray            # tray tracking damping ratio
    tray_pos: jnp.ndarray        # (3,) world tray centre
    half_w: jnp.ndarray          # (2,) support half-extent per tip axis (m)
    h_com: jnp.ndarray           # COM height above the contact plane (m)
    topple_on: jnp.ndarray       # (2,) 1.0 where rocking is modelled


def make_params(shape: str = "cube", mass: float = 1.0, mu: float = 0.1,
                slip_eps: float = 2e-3, omega_n=40.0,
                zeta=1.0, tray_height: float = 0.4,
                size: float = 0.05, dtype=jnp.float32,
                calibrated: bool = False) -> TrayObjectParams:
    """`size` is the characteristic dimension (cube edge / cylinder diameter
    / sphere diameter), matching the 5 cm default of `cube_geom`
    (`LMPC/models/xarm7/world_general.xml:152-163`). omega_n/zeta may be
    scalars or per-axis (2,) pairs; ``calibrated=True`` uses the
    MuJoCo-measured CALIBRATED_TRAY_LAG instead."""
    a = lambda x: jnp.asarray(x, dtype)
    if calibrated:
        omega_n, zeta = CALIBRATED_TRAY_LAG
    half = size / 2.0
    return TrayObjectParams(
        mass=a(mass), mu=a(mu), kappa_inv=a(_KAPPA_INV[shape]),
        slip_eps=a(slip_eps), omega_n=a(omega_n), zeta=a(zeta),
        tray_pos=a([0.0, 0.0, tray_height]),
        half_w=a([half, half]), h_com=a(half),
        topple_on=a(_TOPPLE_ON[shape]))


def topple_on_from_kappa(kappa_inv: jnp.ndarray) -> jnp.ndarray:
    """Rocking-enable mask from the rolling signature: an axis that rolls
    (kappa_inv > 0) cannot rock; flat axes of the cube/cylinder can. Works
    on traced per-scenario kappa rows (cube (0,0)->(1,1), cylinder
    (2,0)->(0,1), sphere (2.5,2.5)->(0,0); the sphere's second axis is also
    rolling, so every flat-axis flag is correct)."""
    on = (kappa_inv == 0).astype(kappa_inv.dtype)
    # A sphere has no flat face at all: if BOTH axes roll, disable both
    # (already implied by the mask); if one axis rolls (cylinder), the other
    # tips over the flat ends.
    return on


class TrayObjectState(NamedTuple):
    theta: jnp.ndarray       # (2,) actual tray tilt [tx, ty]
    theta_dot: jnp.ndarray   # (2,)
    p: jnp.ndarray           # (2,) object position in tray frame
    v: jnp.ndarray           # (2,) object velocity in tray frame
    v_roll: jnp.ndarray      # (2,) rolling-equivalent contact velocity
    q_rock: jnp.ndarray      # (2,) signed rocking angle about support edges
    w_rock: jnp.ndarray      # (2,) rocking rate
    toppled: jnp.ndarray     # () sticky failure flag (COM passed the edge)


def init_state(p0=(0.0, 0.0), dtype=jnp.float32) -> TrayObjectState:
    z2 = jnp.zeros(2, dtype)
    return TrayObjectState(theta=z2, theta_dot=z2,
                           p=jnp.asarray(p0, dtype), v=z2, v_roll=z2,
                           q_rock=z2, w_rock=z2,
                           toppled=jnp.zeros((), bool))


def tray_gravity(theta: jnp.ndarray):
    """(tangential (2,), normal scalar) gravity in the tray frame."""
    tx, ty = theta[..., 0], theta[..., 1]
    gt = jnp.stack([-G0 * jnp.sin(tx), -G0 * jnp.cos(tx) * jnp.sin(ty)], -1)
    gn = G0 * jnp.cos(tx) * jnp.cos(ty)
    return gt, gn


def step_object(s: TrayObjectState, theta: jnp.ndarray,
                theta_dot: jnp.ndarray, params: TrayObjectParams,
                dt: float) -> TrayObjectState:
    """Object friction/rolling update given the actual tray tilt (used both
    by the lag-model tray below and by the full arm-driven stack, where the
    tilt comes from the simulated dual-arm grasp)."""
    gt, gn = tray_gravity(theta)
    slip = s.v - s.v_roll
    a_f = -params.mu * gn * jnp.tanh(slip / params.slip_eps)
    a = gt + a_f
    v = s.v + dt * a
    v_roll = s.v_roll + dt * (-a_f * params.kappa_inv)
    # Non-rolling axes carry no rolling state.
    v_roll = jnp.where(params.kappa_inv > 0, v_roll, jnp.zeros_like(v_roll))
    p = s.p + dt * v

    # Rocking about the downhill support edge (see module docstring).
    # Torque per unit mass about the active edge at rocking angle q':
    #   tau = (h cos q' + w sin q') * g_t,toward-edge
    #       + (h sin q' - w cos q') * g_n
    # (at q'=0 this is h g_t - w g_n: lifts off exactly when the classic
    # static criterion |g_t| h > w g_n is violated); the edge moment of
    # inertia per unit mass is k = h^2 + w^2 + r_g^2 with r_g^2 = (h^2+w^2)/3
    # for a homogeneous box.
    w_sup, h = params.half_w, params.h_com
    k_rock = (h * h + w_sup * w_sup) * (4.0 / 3.0)
    s_dir = jnp.where(s.q_rock != 0, jnp.sign(s.q_rock), jnp.sign(gt))
    qp = jnp.abs(s.q_rock)
    tau = (h * jnp.cos(qp) + w_sup * jnp.sin(qp)) * (s_dir * gt) \
        + (h * jnp.sin(qp) - w_sup * jnp.cos(qp)) * gn
    alpha = s_dir * tau / k_rock * params.topple_on
    w_rock = s.w_rock + dt * alpha
    q_rock = s.q_rock + dt * w_rock
    # Inelastic landing on the flat face: crossing q=0 against the active
    # edge absorbs the rocking energy.
    landed = q_rock * s_dir < 0
    q_rock = jnp.where(landed, 0.0, q_rock)
    w_rock = jnp.where(landed, 0.0, w_rock)
    q_crit = jnp.arctan2(w_sup, h)
    toppled = s.toppled | jnp.any((jnp.abs(q_rock) > q_crit)
                                  & (params.topple_on > 0))
    q_rock = jnp.clip(q_rock, -2.0 * q_crit, 2.0 * q_crit)
    return TrayObjectState(theta=theta, theta_dot=theta_dot, p=p, v=v,
                           v_roll=v_roll, q_rock=q_rock, w_rock=w_rock,
                           toppled=toppled)


def step(s: TrayObjectState, u_cmd: jnp.ndarray, params: TrayObjectParams,
         dt: float) -> TrayObjectState:
    """One semi-implicit Euler step at the 2 ms sim cadence."""
    # Tray tilt tracks the command through a critically-damped 2nd-order lag
    # (the closed-loop arm-impedance response).
    th_dd = params.omega_n ** 2 * (u_cmd - s.theta) \
        - 2.0 * params.zeta * params.omega_n * s.theta_dot
    theta_dot = s.theta_dot + dt * th_dd
    theta = s.theta + dt * theta_dot
    return step_object(s, theta, theta_dot, params, dt)


def observe_world(s: TrayObjectState, params: TrayObjectParams,
                  surface_offset: float = 0.03):
    """World-frame object kinematics, as the MPC observes them
    (`mpc_3d.py:106-113` reads body xpos / cvel from MuJoCo).

    Returns (pos_xyz, vel_xyz) with the tray rotation applied exactly.
    """
    tx, ty = s.theta[0], s.theta[1]
    # R = Rz(0) Ry(-tx) Rx(ty) for the tilt quaternion convention.
    cx, sx = jnp.cos(-tx), jnp.sin(-tx)
    cy, sy = jnp.cos(ty), jnp.sin(ty)
    Ry = jnp.asarray([[cx, 0, sx], [0, 1, 0], [-sx, 0, cx]], s.p.dtype)
    Rx = jnp.asarray([[1, 0, 0], [0, cy, -sy], [0, sy, cy]], s.p.dtype)
    R = Ry @ Rx
    local = jnp.concatenate([s.p, jnp.asarray([surface_offset], s.p.dtype)])
    vel_local = jnp.concatenate([s.v, jnp.zeros(1, s.p.dtype)])
    pos = params.tray_pos + R @ local
    vel = R @ vel_local  # tray rotation rate contribution neglected (small)
    return pos, vel


def off_tray(s: TrayObjectState) -> jnp.ndarray:
    """Out-of-bounds flag (`rlmpc2.py:726-731` tray_limit check)."""
    return (jnp.abs(s.p[0]) > TRAY_LIMIT_X) | (jnp.abs(s.p[1]) > TRAY_LIMIT_Y)


def contact_lost(s: TrayObjectState) -> jnp.ndarray:
    """Failure flag: object left the tray OR tipped over its support edge
    (the reference's contact-loss event, `rlmpc2.py:734-736`)."""
    return off_tray(s) | s.toppled
