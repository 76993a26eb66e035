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
- Toppling is not modelled (5 cm cube tips only beyond ~0.78 rad > the
  0.6 rad tilt bound).

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
# Per-axis inverse rolling factors kappa_inv = 1/kappa (see module docstring).
_KAPPA_INV = {
    "cube": (0.0, 0.0),
    "cylinder": (2.0, 0.0),
    "sphere": (2.5, 2.5),
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


def make_params(shape: str = "cube", mass: float = 1.0, mu: float = 0.1,
                slip_eps: float = 2e-3, omega_n: float = 40.0,
                zeta: float = 1.0, tray_height: float = 0.4,
                dtype=jnp.float32) -> TrayObjectParams:
    a = lambda x: jnp.asarray(x, dtype)
    return TrayObjectParams(
        mass=a(mass), mu=a(mu), kappa_inv=a(_KAPPA_INV[shape]),
        slip_eps=a(slip_eps), omega_n=a(omega_n), zeta=a(zeta),
        tray_pos=a([0.0, 0.0, tray_height]))


class TrayObjectState(NamedTuple):
    theta: jnp.ndarray       # (2,) actual tray tilt [tx, ty]
    theta_dot: jnp.ndarray   # (2,)
    p: jnp.ndarray           # (2,) object position in tray frame
    v: jnp.ndarray           # (2,) object velocity in tray frame
    v_roll: jnp.ndarray      # (2,) rolling-equivalent contact velocity


def init_state(p0=(0.0, 0.0), dtype=jnp.float32) -> TrayObjectState:
    z2 = jnp.zeros(2, dtype)
    return TrayObjectState(theta=z2, theta_dot=z2,
                           p=jnp.asarray(p0, dtype), v=z2, v_roll=z2)


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
    return TrayObjectState(theta=theta, theta_dot=theta_dot, p=p, v=v,
                           v_roll=v_roll)


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
