"""Pure-JAX transition models for the three tray-tilt MPC variants.

Re-implements (as data-flow functions, not symbolic CasADi graphs) the
dynamics of:

- PMPC analytic point-mass-on-tilted-plane  (`PMPC/src/controller/mpc_3d.py:87-104`)
- RMPC gravity + 7-feature linear regressor (`RMPC/dev_dual/controller/
  np_mpc_adaptive_with_linear_regressor.py:171-193`)
- LMPC 34-parameter Stribeck / rolling-slip / toppling model
  (`LMPC/src/controller/rlmpc2.py:260-436`)

Every function has signature ``f(x, u, params) -> xdot`` with pytree params,
is jit/vmap/grad-safe, and shares one RK4 integrator. Jacobians for the
trajectory optimiser come from `jax.jacfwd` — this replaces CasADi symbolic
autodiff entirely.

State and parameter layouts follow the reference exactly so that solver
outputs are comparable trajectory-for-trajectory.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp

Dynamics = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]

# Default gravity: the reference reads model.opt.gravity[2] = -9.81 for
# PMPC/RMPC (signed) and hard-codes g = 9.81 (positive) inside the LMPC model.
GRAVITY_Z = -9.81


# --------------------------------------------------------------------------
# PMPC: 6-state analytic model
# --------------------------------------------------------------------------

class PMPCParams(NamedTuple):
    """Parameters of the analytic model (`mpc_3d.py:12-26`)."""

    mu: jnp.ndarray | float = 0.4        # friction coefficient
    g: jnp.ndarray | float = GRAVITY_Z   # signed gravity (negative)
    dt: jnp.ndarray | float = 0.002      # Ts, used by the az finite-difference


def pmpc_dynamics(x: jnp.ndarray, u: jnp.ndarray, p: PMPCParams) -> jnp.ndarray:
    """xdot for state [px, vx, py, vy, pz, vz], control [theta_x, theta_y].

    Faithful to `mpc_3d.py:87-97` including its quirks: the vertical channel
    uses the *algebraic* value ``vz_new = -g (tx^2 + ty^2)`` as pz-rate and a
    finite-difference az, so the model needs dt as a parameter.
    """
    vx, vy, vz = x[..., 1], x[..., 3], x[..., 5]
    tx, ty = u[..., 0], u[..., 1]
    g = jnp.asarray(p.g, dtype=x.dtype)
    mu = jnp.asarray(p.mu, dtype=x.dtype)
    ax = g * jnp.sin(tx) - mu * vx
    ay = g * jnp.sin(ty) - mu * vy
    vz_new = -g * (tx * tx + ty * ty)
    az = (vz_new - vz) / jnp.asarray(p.dt, dtype=x.dtype)
    return jnp.stack([vx, ax, vy, ay, vz_new, az], axis=-1)


# --------------------------------------------------------------------------
# RMPC: 4-state gravity + learned residual regressor
# --------------------------------------------------------------------------

class RMPCParams(NamedTuple):
    """theta = 14-vector [theta_x(7), theta_y(7)] learned online by RLS."""

    theta: jnp.ndarray                    # (..., 14)
    g: jnp.ndarray | float = GRAVITY_Z    # signed gravity (negative)
    v_eps: jnp.ndarray | float = 0.1      # tanh feature sharpness


def rmpc_features(x: jnp.ndarray, v_eps) -> jnp.ndarray:
    """7-feature vector phi = [px, vx, py, vy, tanh(vx/eps), tanh(vy/eps), 1].

    Shared by the MPC model and the RLS estimator (`np_mpc...py:171-176`,
    `rob_ctrl.py:334-341`).
    """
    px, vx, py, vy = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    v_eps = jnp.asarray(v_eps, dtype=x.dtype)
    one = jnp.ones_like(px)
    return jnp.stack(
        [px, vx, py, vy, jnp.tanh(vx / v_eps), jnp.tanh(vy / v_eps), one], axis=-1
    )


def rmpc_dynamics(x: jnp.ndarray, u: jnp.ndarray, p: RMPCParams) -> jnp.ndarray:
    """xdot for state [px, vx, py, vy] (`np_mpc...py:178-186`)."""
    vx, vy = x[..., 1], x[..., 3]
    alpha, beta = u[..., 0], u[..., 1]
    g = jnp.asarray(p.g, dtype=x.dtype)
    phi = rmpc_features(x, p.v_eps)
    th = jnp.asarray(p.theta, dtype=x.dtype)
    thx, thy = th[..., 0:7], th[..., 7:14]
    ax = g * jnp.sin(alpha) + jnp.sum(phi * thx, axis=-1)
    ay = g * jnp.sin(beta) + jnp.sum(phi * thy, axis=-1)
    return jnp.stack([vx, ax, vy, ay], axis=-1)


# --------------------------------------------------------------------------
# LMPC: 8-state, 34-parameter Stribeck / rolling / toppling model
# --------------------------------------------------------------------------

# Index map of the 34-entry parameter vector, as implemented by
# `rlmpc2.py:300-334` (NOT the stale docstring above it):
#   0 m_x*   1 m_y*   2 c_x*   3 c_y*   4 k_x*   5 k_y*
#   6 F_s_x  7 F_c_x  8 B_x    9 v_s_x* 10 eps_x*
#   11 F_s_y 12 F_c_y 13 B_y   14 v_s_y* 15 eps_y*
#   16 I_x*  17 I_y*  18 r_x*  19 r_y*  20 c_rot_x* 21 c_rot_y*
#   22 F_s_rot_x 23 F_c_rot_x 24 B_rot_x 25 v_s_rot_x* 26 eps_rot_x*
#   27 F_s_rot_y 28 F_c_rot_y 29 B_rot_y 30 v_s_rot_y* 31 eps_rot_y*
#   32 h_com_x* 33 h_com_y*
# Entries marked * pass through squash(p) = |p| + 1e-6 before use.
LMPC_N_PARAMS = 34
LMPC_G = 9.81  # positive, hard-coded inside safe_dynamics (`rlmpc2.py:342`)

_SQUASHED = jnp.zeros(LMPC_N_PARAMS).at[
    jnp.array([0, 1, 2, 3, 4, 5, 9, 10, 14, 15, 16, 17, 18, 19, 20, 21,
               25, 26, 30, 31, 32, 33])
].set(1.0)


def _squash(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(p) + 1e-6


def smooth_sign(v: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(v / eps)


def stribeck_friction(v, f_s, f_c, b, v_s, eps):
    """sign_smooth(v) * (Fc + (Fs-Fc) e^{-|v|/vs}) + B v (`rlmpc2.py:355-359`)."""
    static_to_coulomb = f_c + (f_s - f_c) * jnp.exp(-jnp.abs(v) / (v_s + 1e-12))
    return smooth_sign(v, eps) * static_to_coulomb + b * v


def lmpc_squash_params(p: jnp.ndarray) -> jnp.ndarray:
    """Apply |.|+1e-6 to the positivity-constrained entries of the 34-vector."""
    m = _SQUASHED.astype(p.dtype)
    return jnp.where(m > 0, _squash(p), p)


def lmpc_dynamics(x: jnp.ndarray, u: jnp.ndarray, pvec: jnp.ndarray) -> jnp.ndarray:
    """xdot for state [px,vx,py,vy, th_x,om_x, th_y,om_y] (`rlmpc2.py:260-429`).

    pvec is the raw 34-vector (squashing applied internally, exactly like the
    reference's `squash_param`).
    """
    px, vx, py, vy = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    th_x, om_x, th_y, om_y = x[..., 4], x[..., 5], x[..., 6], x[..., 7]
    a, b = u[..., 0], u[..., 1]
    pvec = jnp.asarray(pvec, dtype=x.dtype)

    def sq(i):
        return _squash(pvec[..., i])

    m_x, m_y = sq(0), sq(1)
    c_x, c_y = sq(2), sq(3)
    k_x, k_y = sq(4), sq(5)
    f_s_x, f_c_x, b_x = pvec[..., 6], pvec[..., 7], pvec[..., 8]
    v_s_x, eps_x = sq(9), sq(10)
    f_s_y, f_c_y, b_y = pvec[..., 11], pvec[..., 12], pvec[..., 13]
    v_s_y, eps_y = sq(14), sq(15)
    i_x, i_y = sq(16), sq(17)
    r_x, r_y = sq(18), sq(19)
    c_rot_x, c_rot_y = sq(20), sq(21)
    f_s_rx, f_c_rx, b_rx = pvec[..., 22], pvec[..., 23], pvec[..., 24]
    v_s_rx, eps_rx = sq(25), sq(26)
    f_s_ry, f_c_ry, b_ry = pvec[..., 27], pvec[..., 28], pvec[..., 29]
    v_s_ry, eps_ry = sq(30), sq(31)
    h_com_x, h_com_y = sq(32), sq(33)

    g = jnp.asarray(LMPC_G, dtype=x.dtype)

    # gravity / tilt forcing (translational)
    g_x = m_x * g * jnp.sin(a)
    g_y = m_y * g * jnp.sin(b)

    # translational sliding friction
    ff_x = stribeck_friction(vx, f_s_x, f_c_x, b_x, v_s_x, eps_x)
    ff_y = stribeck_friction(vy, f_s_y, f_c_y, b_y, v_s_y, eps_y)

    # rolling slip: omega_y drives x, -omega_x drives y (`rlmpc2.py:366-381`)
    v_slip_x = vx - r_x * om_y
    v_slip_y = vy - (-r_y * om_x)
    f_roll_x = stribeck_friction(v_slip_x, f_s_x, f_c_x, b_x, v_s_x, eps_x)
    f_roll_y = stribeck_friction(v_slip_y, f_s_y, f_c_y, b_y, v_s_y, eps_y)

    # rotational torques (`rlmpc2.py:383-402`)
    tau_slip_x = -r_y * f_roll_y
    tau_slip_y = -r_x * f_roll_x
    t_noslip_x = stribeck_friction(om_x, f_s_rx, f_c_rx, b_rx, v_s_rx, eps_rx)
    t_noslip_y = stribeck_friction(om_y, f_s_ry, f_c_ry, b_ry, v_s_ry, eps_ry)
    tau_topple_x = -m_y * g * h_com_x * jnp.sin(th_x)
    tau_topple_y = -m_x * g * h_com_y * jnp.sin(th_y)
    tau_x = tau_slip_x - t_noslip_x - c_rot_x * om_x + tau_topple_x
    tau_y = tau_slip_y - t_noslip_y - c_rot_y * om_y + tau_topple_y
    al_x = tau_x / (i_x + 1e-12)
    al_y = tau_y / (i_y + 1e-12)

    # translational EoM: M qdd = G - C qd - K q - F_fric - F_roll
    qdd_x = (g_x - c_x * vx - k_x * px - ff_x - f_roll_x) / m_x
    qdd_y = (g_y - c_y * vy - k_y * py - ff_y - f_roll_y) / m_y

    return jnp.stack([vx, qdd_x, vy, qdd_y, om_x, al_x, om_y, al_y], axis=-1)


# --------------------------------------------------------------------------
# Closed-form Jacobians (structure-exploiting solver paths)
#
# The generic solver linearises dynamics with jacfwd through the full RK4
# step: nz+nu tangents x 4 dynamics evaluations per stage, which dominates
# each iLQR iteration for the transcendental-heavy RMPC/LMPC models. The
# continuous-time Jacobians below are hand-derived (verified against jacfwd
# to machine precision in tests/test_structure.py) and composed through RK4
# by the exact chain rule in `rk4_jac` — ~2 extra dynamics-evaluation
# equivalents instead of ~(nz+nu) x 4.
# --------------------------------------------------------------------------

def pmpc_jac(x: jnp.ndarray, u: jnp.ndarray, p: PMPCParams):
    """Continuous-time (A (...,6,6), B (...,6,2)) of `pmpc_dynamics`.

    The model is affine in the state, so A is constant (a function of mu and
    dt only); B carries the g cos(tilt) forcing rows plus the algebraic
    vertical channel's -2 g tilt terms.
    """
    dtype = x.dtype
    tx, ty = u[..., 0], u[..., 1]
    g = jnp.asarray(p.g, dtype)
    mu = jnp.asarray(p.mu, dtype) * jnp.ones_like(tx)
    inv_dt = 1.0 / jnp.asarray(p.dt, dtype) * jnp.ones_like(tx)
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    A = jnp.stack([
        jnp.stack([z, o, z, z, z, z], -1),
        jnp.stack([z, -mu, z, z, z, z], -1),
        jnp.stack([z, z, z, o, z, z], -1),
        jnp.stack([z, z, z, -mu, z, z], -1),
        jnp.stack([z, z, z, z, z, z], -1),
        jnp.stack([z, z, z, z, z, -inv_dt], -1),
    ], -2)
    ca, cb = g * jnp.cos(tx), g * jnp.cos(ty)
    wx, wy = -2.0 * g * tx, -2.0 * g * ty
    z2 = jnp.stack([z, z], -1)
    B = jnp.stack([z2, jnp.stack([ca, z], -1), z2, jnp.stack([z, cb], -1),
                   jnp.stack([wx, wy], -1),
                   jnp.stack([wx * inv_dt, wy * inv_dt], -1)], -2)
    return A, B


def rmpc_jac(x: jnp.ndarray, u: jnp.ndarray, p: RMPCParams):
    """Continuous-time (A, B) of `rmpc_dynamics` at one point.

    d(phi.theta)/dx is closed form: phi is linear in [px,vx,py,vy] except
    the two tanh features, whose derivative is (1 - tanh^2)/v_eps.
    """
    dtype = x.dtype
    vx, vy = x[..., 1], x[..., 3]
    g = jnp.asarray(p.g, dtype)
    ve = jnp.asarray(p.v_eps, dtype)
    th = jnp.asarray(p.theta, dtype)
    thx, thy = th[..., 0:7], th[..., 7:14]
    tx = jnp.tanh(vx / ve)
    ty = jnp.tanh(vy / ve)
    dtx = (1.0 - tx * tx) / ve
    dty = (1.0 - ty * ty) / ve
    z = jnp.zeros_like(vx)
    o = jnp.ones_like(vx)
    row_ax = jnp.stack([thx[..., 0], thx[..., 1] + thx[..., 4] * dtx,
                        thx[..., 2], thx[..., 3] + thx[..., 5] * dty], -1)
    row_ay = jnp.stack([thy[..., 0], thy[..., 1] + thy[..., 4] * dtx,
                        thy[..., 2], thy[..., 3] + thy[..., 5] * dty], -1)
    A = jnp.stack([jnp.stack([z, o, z, z], -1), row_ax,
                   jnp.stack([z, z, z, o], -1), row_ay], -2)
    ca = g * jnp.cos(u[..., 0])
    cb = g * jnp.cos(u[..., 1])
    B = jnp.stack([jnp.stack([z, z], -1), jnp.stack([ca, z], -1),
                   jnp.stack([z, z], -1), jnp.stack([z, cb], -1)], -2)
    return A, B


def stribeck_friction_deriv(v, f_s, f_c, b, v_s, eps):
    """d/dv of `stribeck_friction` (sign(0)=0 convention matches jnp.abs)."""
    vs = v_s + 1e-12
    ex = jnp.exp(-jnp.abs(v) / vs)
    stc = f_c + (f_s - f_c) * ex
    t = jnp.tanh(v / eps)
    return (1.0 - t * t) / eps * stc + t * (f_s - f_c) * ex * \
        (-jnp.sign(v) / vs) + b


def lmpc_jac(x: jnp.ndarray, u: jnp.ndarray, pvec: jnp.ndarray):
    """Continuous-time (A (...,8,8), B (...,8,2)) of `lmpc_dynamics`.

    Sparsity: qdd_x couples to {px, vx, om_y} (rolling slip), al_x to
    {vy, om_x, th_x}, and symmetrically for the y axis; tilt controls enter
    only the translational accelerations (g cos tilt).
    """
    vx, vy = x[..., 1], x[..., 3]
    th_x, om_x, th_y, om_y = x[..., 4], x[..., 5], x[..., 6], x[..., 7]
    a, b_u = u[..., 0], u[..., 1]
    pvec = jnp.asarray(pvec, dtype=x.dtype)

    def sq(i):
        return _squash(pvec[..., i])

    m_x, m_y = sq(0), sq(1)
    c_x, c_y = sq(2), sq(3)
    k_x, k_y = sq(4), sq(5)
    f_s_x, f_c_x, b_x = pvec[..., 6], pvec[..., 7], pvec[..., 8]
    v_s_x, eps_x = sq(9), sq(10)
    f_s_y, f_c_y, b_y = pvec[..., 11], pvec[..., 12], pvec[..., 13]
    v_s_y, eps_y = sq(14), sq(15)
    i_x, i_y = sq(16), sq(17)
    r_x, r_y = sq(18), sq(19)
    c_rot_x, c_rot_y = sq(20), sq(21)
    f_s_rx, f_c_rx, b_rx = pvec[..., 22], pvec[..., 23], pvec[..., 24]
    v_s_rx, eps_rx = sq(25), sq(26)
    f_s_ry, f_c_ry, b_ry = pvec[..., 27], pvec[..., 28], pvec[..., 29]
    v_s_ry, eps_ry = sq(30), sq(31)
    h_com_x, h_com_y = sq(32), sq(33)
    g = jnp.asarray(LMPC_G, dtype=x.dtype)

    # Friction slopes at the evaluation point.
    Dff_x = stribeck_friction_deriv(vx, f_s_x, f_c_x, b_x, v_s_x, eps_x)
    Dff_y = stribeck_friction_deriv(vy, f_s_y, f_c_y, b_y, v_s_y, eps_y)
    v_slip_x = vx - r_x * om_y
    v_slip_y = vy + r_y * om_x
    Dfr_x = stribeck_friction_deriv(v_slip_x, f_s_x, f_c_x, b_x, v_s_x, eps_x)
    Dfr_y = stribeck_friction_deriv(v_slip_y, f_s_y, f_c_y, b_y, v_s_y, eps_y)
    Dtn_x = stribeck_friction_deriv(om_x, f_s_rx, f_c_rx, b_rx, v_s_rx,
                                    eps_rx)
    Dtn_y = stribeck_friction_deriv(om_y, f_s_ry, f_c_ry, b_ry, v_s_ry,
                                    eps_ry)

    ix = i_x + 1e-12
    iy = i_y + 1e-12
    z = jnp.zeros_like(vx)
    o = jnp.ones_like(vx)

    # State order [px, vx, py, vy, th_x, om_x, th_y, om_y].
    r_vx = jnp.stack([-k_x / m_x, (-c_x - Dff_x - Dfr_x) / m_x, z, z,
                      z, z, z, r_x * Dfr_x / m_x], -1)
    r_vy = jnp.stack([z, z, -k_y / m_y, (-c_y - Dff_y - Dfr_y) / m_y,
                      z, -r_y * Dfr_y / m_y, z, z], -1)
    r_alx = jnp.stack([z, z, z, -r_y * Dfr_y / ix,
                       -m_y * g * h_com_x * jnp.cos(th_x) / ix,
                       (-r_y * r_y * Dfr_y - Dtn_x - c_rot_x) / ix, z, z], -1)
    r_aly = jnp.stack([z, -r_x * Dfr_x / iy, z, z, z, z,
                       -m_x * g * h_com_y * jnp.cos(th_y) / iy,
                       (r_x * r_x * Dfr_x - Dtn_y - c_rot_y) / iy], -1)

    def e(i):
        rows = [z] * 8
        rows[i] = o
        return jnp.stack(rows, -1)

    A = jnp.stack([e(1), r_vx, e(3), r_vy, e(5), r_alx, e(7), r_aly], -2)
    ca = g * jnp.cos(a)
    cb = g * jnp.cos(b_u)
    z2 = jnp.stack([z, z], -1)
    B = jnp.stack([z2, jnp.stack([ca, z], -1), z2, jnp.stack([z, cb], -1),
                   z2, z2, z2, z2], -2)
    return A, B


def rk4_jac(f: Dynamics, f_jac, x: jnp.ndarray, u: jnp.ndarray, p: Any,
            dt: float | jnp.ndarray):
    """Exact (Ad, Bd) of `rk4_step` from continuous-time stage Jacobians.

    Chain rule through the four RK4 stages: dk_i/dx = A(x_i) dx_i/dx with
    dx_{i+1}/dx = I + c_i dt dk_i/dx (and the matching du recursions).
    Identical to jacfwd of the discrete step, at ~2 dynamics-evaluation cost
    instead of (nz+nu) tangent propagations.
    """
    dt = jnp.asarray(dt, x.dtype)
    k1 = f(x, u, p)
    x2 = x + 0.5 * dt * k1
    k2 = f(x2, u, p)
    x3 = x + 0.5 * dt * k2
    x4 = x + dt * f(x3, u, p)
    A1, B1 = f_jac(x, u, p)
    A2, B2 = f_jac(x2, u, p)
    A3, B3 = f_jac(x3, u, p)
    A4, B4 = f_jac(x4, u, p)
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    dk1x, dk1u = A1, B1
    dk2x = A2 @ (eye + 0.5 * dt * dk1x)
    dk2u = A2 @ (0.5 * dt * dk1u) + B2
    dk3x = A3 @ (eye + 0.5 * dt * dk2x)
    dk3u = A3 @ (0.5 * dt * dk2u) + B3
    dk4x = A4 @ (eye + dt * dk3x)
    dk4u = A4 @ (dt * dk3u) + B4
    Ad = eye + dt / 6.0 * (dk1x + 2.0 * dk2x + 2.0 * dk3x + dk4x)
    Bd = dt / 6.0 * (dk1u + 2.0 * dk2u + 2.0 * dk3u + dk4u)
    return Ad, Bd


# --------------------------------------------------------------------------
# Shared RK4 integrator
# --------------------------------------------------------------------------

def rk4_step(f: Dynamics, x: jnp.ndarray, u: jnp.ndarray, p: Any,
             dt: float | jnp.ndarray) -> jnp.ndarray:
    """Classic RK4 with zero-order-held control, shared by all variants
    (`mpc_3d.py:99-104`, `np_mpc...py:188-193`, `rlmpc2.py:431-436`)."""
    dt = jnp.asarray(dt)
    k1 = f(x, u, p)
    k2 = f(x + 0.5 * dt * k1, u, p)
    k3 = f(x + 0.5 * dt * k2, u, p)
    k4 = f(x + dt * k3, u, p)
    return x + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def discretize(f: Dynamics, dt: float) -> Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]:
    """Return the discrete-time transition x_{k+1} = F(x_k, u_k, p)."""

    def step(x, u, p):
        return rk4_step(f, x, u, p, dt)

    return step
