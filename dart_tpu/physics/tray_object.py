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
# (tools/calibrate_tray_object.py: least-squares fit of the realised tray
# tilt when the full dart_tpu arm stack drives mj_step, over both the
# 0.1 rad pulse episode and four closed-loop PMPC episodes; artifact
# artifacts/mujoco/tray_object_calibration.npz). r3 model: 2 real poles +
# a transfer ZERO (`lag_step(fast_frac=...)`) — the arm stack realises
# ~30-60% of a command at ~10-25 rad/s and crawls the rest at ~1-2 rad/s.
# A no-zero 2nd-order fit of the same traces (r2: (46.4, 99.8) /
# (10.7, 4.9), for the then-current marginally-stable Euler update)
# matches the step trace but buries the fast fraction, and in closed loop
# the MPC winds up to the tilt bound and ejects the object where mj_step
# settles. Layout: ((omega_n_x, omega_n_y), (zeta_x, zeta_y),
# (fast_frac_x, fast_frac_y)).
CALIBRATED_TRAY_LAG = ((4.694, 3.871), (2.25, 1.331), (0.3144, 0.5994))
# r4 payload-mass-resolved lag (VERDICT r3 next-3): the arms carry
# tray + payload, so the realised tilt response depends on the payload
# mass — MuJoCo realises ~15% less tilt over a 0.7 s pulse at 2 kg than
# at 1 kg (tools/calibrate_tray_object.py --by_mass: 3 pulse + 3
# closed-loop episodes per mass; artifact
# artifacts/mujoco/tray_object_calibration_by_mass.npz). The m=1 x-axis
# fit reproduces the r3 mass-agnostic fit (omega 4.75 vs 4.69) — the
# r3 calibration was effectively the 1 kg point. `calibrated_lag(mass)`
# interpolates; evaluators' default plant is mass-sensitive through it.
CALIBRATED_TRAY_LAG_BY_MASS = {
    1.0: ((4.752, 2.674), (2.171, 1.499), (0.3235, 0.9482)),
    2.0: ((4.023, 1.549), (2.509, 2.406), (0.3075, 0.9316)),
}


def calibrated_lag(mass, dtype=jnp.float32):
    """Payload-mass-interpolated tray lag -> (omega_n (2,), zeta (2,),
    fast_frac (2,)). Linear between the two measured grid masses (1, 2 kg),
    clamped outside; `mass` may be a traced scalar or batched."""
    lo = CALIBRATED_TRAY_LAG_BY_MASS[1.0]
    hi = CALIBRATED_TRAY_LAG_BY_MASS[2.0]
    t = jnp.clip(jnp.asarray(mass, dtype) - 1.0, 0.0, 1.0)[..., None]
    return tuple(
        (1.0 - t) * jnp.asarray(a, dtype) + t * jnp.asarray(b, dtype)
        for a, b in zip(lo, hi))


# The r1/r2 default tray lag, kept ONLY to reproduce historical artifacts:
# optimistic on convergence time vs the measured response above.
# r3 evaluators default to CALIBRATED_TRAY_LAG.
LEGACY_TRAY_LAG = (40.0, 1.0)
# Per-shape contact dissipation fitted against the same closed-loop
# mj_step traces by replaying the RECORDED realised tilt through
# `step_object` (isolating the object model from the lag model):
# MuJoCo's implicitfast + noslip contact dissipates tangential energy far
# beyond pure Coulomb slide friction. Without these the closed loop
# limit-cycles on rolling objects and low-mu cubes where mj_step settles.
# cylinder rr: replay rms 144 mm -> 16 mm; cube mu=0.05 slide damping:
# 203 mm -> 27 mm; sphere rr: 36 mm -> 34 mm (already near-faithful).
CALIBRATED_ROLL_RESIST = {"cube": 0.0, "cylinder": 0.0118, "sphere": 0.0089}
CALIBRATED_SLIDE_DAMP = {"cube": 2.736, "cylinder": 0.0, "sphere": 0.0}
# r4: the cube tangential damping is a LOW-friction phenomenon. The r3
# value was fitted on the mu=0.05 closed-loop episode and applied flat;
# a replay refit on recorded cube mu=0.2 episodes (tools/
# calibrate_tray_object.py --cube_mu, both grid masses, artifact
# tray_object_calibration_cube_mu02.npz) lands at slide_damp ~ 0.002 —
# at mu=0.2 Coulomb friction already supplies the dissipation MuJoCo
# shows, and keeping the flat 2.736 makes the plant far stickier than
# mj_step (PMPC converges in 0.7 s on MuJoCo, parks 16-18 mm out on the
# r3 plant). `calibrated_slide_damp` fades linearly between the two
# fitted anchors.
CALIBRATED_SLIDE_DAMP_MU_ANCHORS = (0.05, 0.2)


def calibrated_slide_damp(base, mu, dtype=jnp.float32):
    """mu-resolved tangential damping: `base` (the mu=0.05 fit) faded
    linearly to ~0 at mu=0.2 (the refit anchor), clamped outside."""
    lo, hi = CALIBRATED_SLIDE_DAMP_MU_ANCHORS
    fade = jnp.clip((hi - jnp.asarray(mu, dtype)) / (hi - lo), 0.0, 1.0)
    return jnp.asarray(base, dtype) * fade


# r5 rolling-stiction breakaway slope: tan(theta_break) = ROLL_STICK_PER_MU
# x mu for rolling axes. MEASURED ZERO against the reference contact
# model (tools/measure_roll_stiction.py static-incline bisection,
# artifacts/mujoco/roll_stiction.json): although the reference randomiser
# writes a rolling-friction coefficient c_r = mu/100
# (`LMPC/src/run.py:221-223`, predicting a tan(theta) = c_r/r = 0.4 mu
# cone), every geom in the reference world is condim 3, so the torsional
# and rolling entries of the friction triple are INERT — a sphere on a
# static incline at 1e-4 rad already creeps, while a cube holds at
# tan(theta) ~ 0.83 mu (the sliding cone, slightly inside mu from
# soft-contact creep). Bounded post-convergence rolling holds on MuJoCo
# ground truth are therefore the CONTROLLER's doing, not contact
# stiction; the `roll_stick` plant mechanism below is kept as a
# capability (e.g. for condim-6 worlds) but the calibrated plant runs
# with the measured cone: none.
ROLL_STICK_PER_MU = 0.0

# r5 small-signal arm-stack friction, fitted per axis against the
# square-wave realised-tilt measurement (tools/measure_tilt_smallsignal.py
# -> tools/fit_backlash.py; artifacts/mujoco/{tilt_smallsignal*.json,
# backlash_fit.json}). The measured realised/commanded gain collapses from
# ~0.76 (0.1 rad) to 0.004-0.08 (<= 0.01 rad): xArm7 joint frictionloss
# swallows micro-commands. The y axis carries ~2.6x the play of x (its
# tilt is realised through differently-loaded joints; it also sags more
# at rest, -0.022 rad vs 0.008). Mass-independence verified: the 2 kg
# y-axis curve matches the 1 kg fit within measurement noise
# (tilt_smallsignal_y_m2.json: ratios 0.01/0.13/0.63/0.77 at
# 0.005/0.02/0.05/0.1 rad vs 0.009/0.06/0.59/0.80 at 1 kg), so one
# backlash calibration serves both grid masses — unlike the lag poles,
# which ARE mass-resolved. This regime is load-bearing for
# post-convergence fidelity: on a backlash-free lag the MPC's micro
# -corrections all act, letting a marginal hold loop pump energy that the
# real plant swallows (the r4 rolling-lane ejections).
CALIBRATED_BACK_W = (0.007, 0.0185)
CALIBRATED_BACK_GSS = (0.095, 0.0212)


def calibrated_roll_stick(kappa_inv, mu, dtype=jnp.float32):
    """Per-axis breakaway cone (x gn) for the calibrated plant. Measured
    against the reference world: ~0 for rolling axes (condim 3 makes the
    rolling-friction coefficient inert — see ROLL_STICK_PER_MU);
    non-rolling axes 0 (Coulomb stick already emerges from the mu tanh
    slide term)."""
    base = ROLL_STICK_PER_MU * jnp.asarray(mu, dtype)
    return jnp.where(jnp.asarray(kappa_inv, dtype) > 0, base,
                     jnp.zeros_like(base))
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
    # r3 dissipation terms, fitted against the recorded MuJoCo pulse
    # traces (tools/calibrate_tray_object.py step 3). MuJoCo's contact
    # model (implicitfast + noslip_iterations=100 + condim torsional/
    # rolling friction) dissipates tangential energy far beyond the pure
    # Coulomb-tanh slide model: without these the closed loop limit-cycles
    # on rolling objects where mj_step settles (a cylinder on the real
    # plant needs a SUSTAINED ~0.08 rad tilt just to creep).
    roll_resist: jnp.ndarray = 0.0   # rolling-resistance coeff (x gn)
    slide_damp: jnp.ndarray = 0.0    # viscous tangential damping (1/s)
    # Fraction of a command step realised at the FAST lag pole (the
    # transfer zero of the arm stack's tilt response; see `lag_step`).
    lag_fast: jnp.ndarray = 0.0
    # r5 rolling STICTION capability: per-axis breakaway tangential
    # acceleration (x gn) below which a slow-enough rolling contact
    # HOLDS (the rolling-friction cone tan(tilt) <= c_r/r of a condim-6
    # contact: an object of contact radius r with rolling coefficient
    # c_r stays at rest while |g_t| <= (c_r/r) gn). NOTE the CALIBRATED
    # value for the reference world is 0: its geoms are condim 3, which
    # makes the rolling entry of the friction triple inert — measured by
    # static-incline bisection, see ROLL_STICK_PER_MU and
    # artifacts/mujoco/roll_stiction.json.
    roll_stick: jnp.ndarray = 0.0    # (2,) or scalar, x gn
    stick_vel: jnp.ndarray = 5e-3    # hold only below this speed (m/s)
    # r5 small-signal friction of the ARM STACK (measured:
    # tools/measure_tilt_smallsignal.py — every xArm7 joint carries
    # frictionloss=1, `world_general.xml:17`, and the realised tilt gain
    # collapses from ~0.76 at 0.1 rad square waves to ~0.06-0.08 below
    # 0.01 rad). Modelled as BACKLASH-WITH-COMPLIANCE on the lag output:
    # a play state b trails theta_lin within +-back_w; inside the play
    # only the presliding compliance back_gss of the motion is realised.
    # back_w = 0 disables (exact r4 behaviour).
    back_w: jnp.ndarray = 0.0        # (2,) play half-width (rad)
    back_gss: jnp.ndarray = 1.0      # presliding gain inside the play


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
    lag_fast, roll_resist, slide_damp = 0.0, 0.0, 0.0
    roll_stick, back_w, back_gss = 0.0, 0.0, 1.0
    if calibrated:
        omega_n, zeta, lag_fast = calibrated_lag(mass, dtype)
        roll_resist = CALIBRATED_ROLL_RESIST[shape]
        slide_damp = calibrated_slide_damp(CALIBRATED_SLIDE_DAMP[shape],
                                           mu, dtype)
        roll_stick = calibrated_roll_stick(_KAPPA_INV[shape], mu, dtype)
        back_w, back_gss = CALIBRATED_BACK_W, CALIBRATED_BACK_GSS
    half = size / 2.0
    return TrayObjectParams(
        mass=a(mass), mu=a(mu), kappa_inv=a(_KAPPA_INV[shape]),
        slip_eps=a(slip_eps), omega_n=a(omega_n), zeta=a(zeta),
        tray_pos=a([0.0, 0.0, tray_height]),
        half_w=a([half, half]), h_com=a(half),
        topple_on=a(_TOPPLE_ON[shape]),
        roll_resist=a(roll_resist), slide_damp=a(slide_damp),
        lag_fast=a(lag_fast), roll_stick=a(roll_stick),
        stick_vel=a(5e-3), back_w=a(back_w), back_gss=a(back_gss))


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
    # Internal per-pole states of the tray lag (`lag_step`): theta =
    # lag_x1 + lag_x2. Carried explicitly — reconstructing them from
    # (theta, theta_dot) is ill-posed at command switches and erases the
    # transfer zero's fast response. Pass-through in `step_object` (which
    # is driven by an externally-supplied tilt, e.g. the arm stack).
    lag_x1: jnp.ndarray = None
    lag_x2: jnp.ndarray = None
    # Backlash play state (r5 small-signal arm friction; see
    # TrayObjectParams.back_w). Pass-through in `step_object`.
    lag_b: jnp.ndarray = None


def init_state(p0=(0.0, 0.0), dtype=jnp.float32) -> TrayObjectState:
    z2 = jnp.zeros(2, dtype)
    return TrayObjectState(theta=z2, theta_dot=z2,
                           p=jnp.asarray(p0, dtype), v=z2, v_roll=z2,
                           q_rock=z2, w_rock=z2,
                           toppled=jnp.zeros((), bool),
                           lag_x1=z2, lag_x2=z2, lag_b=z2)


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
    a = gt + a_f - params.slide_damp * s.v
    v = s.v + dt * a
    # Rolling resistance decelerates the rolling contact; the body then
    # slows through the slip-friction coupling (slip > 0 -> a_f < 0).
    rr = params.roll_resist * gn * jnp.tanh(s.v_roll / params.slip_eps)
    v_roll = s.v_roll + dt * (-a_f * params.kappa_inv - rr)
    # Non-rolling axes carry no rolling state.
    v_roll = jnp.where(params.kappa_inv > 0, v_roll, jnp.zeros_like(v_roll))
    # Rolling stiction (r5 capability, off for the calibrated reference
    # plant — see TrayObjectParams.roll_stick): a slow-enough rolling
    # contact whose tangential drive is inside the breakaway cone
    # |g_t| <= roll_stick*gn HOLDS — velocity and rolling state snap to
    # rest and the position freezes. Sticking is not sticky state: the
    # instant the drive leaves the cone (or an impulse makes the object
    # fast), the normal kinetic update resumes.
    stick = ((params.kappa_inv > 0)
             & (jnp.abs(v) <= params.stick_vel)
             & (jnp.abs(v_roll) <= params.stick_vel)
             & (jnp.abs(gt) <= params.roll_stick * gn))
    v = jnp.where(stick, 0.0, v)
    v_roll = jnp.where(stick, 0.0, v_roll)
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
                           toppled=toppled, lag_x1=s.lag_x1, lag_x2=s.lag_x2,
                           lag_b=s.lag_b)


def lag_poles(omega_n, zeta):
    """Real pole rates (lam_slow, lam_fast) of the tray lag. Overdamped /
    critically damped only (zeta is clamped to >= 1 + 1e-6: the arm-stack
    tray response is heavily overdamped, and the residue-mix realization
    below needs distinct real poles — at the clamp the split is 0.2% and
    the response error vs the confluent critical case is O(1e-3))."""
    z = jnp.maximum(zeta, 1.0 + 1e-6)
    s = omega_n * jnp.sqrt(z * z - 1.0)
    a = z * omega_n
    return a - s, a + s


def lag_step(x1, x2, u_cmd, omega_n, zeta, dt: float, fast_frac=0.0):
    """EXACT (ZOH) step of the tray-tracking lag as a parallel mix of its
    two real poles:

        theta(s)/u(s) = (1 - f) * l1/(s + l1) + f * l2/(s + l2)

    i.e. a 2-pole-1-zero transfer with unit DC gain where a fraction `f`
    (``fast_frac``) of a command step is realised at the FAST pole rate.
    f = 0 approximates the classic no-zero 2nd-order lag by its dominant
    pole. The MuJoCo arm stack measurably has this shape: a command step
    realises 30-60% of the tilt within tens of ms, then crawls to the
    commanded value over seconds — a no-zero lag fitted to the same
    traces buries the fast fraction (residue l1/(l2-l1) ~ 0.1%) and
    makes the closed loop limit-cycle where mj_step settles (the MPC
    never sees its commands act, winds up to the tilt bound, and the
    slow pole integrates the bang-bang into ejection).

    Takes and returns the per-pole states (x1, x2); the physical outputs
    are theta = x1 + x2 and theta_dot = l1((1-f)u - x1) + l2(f u - x2).
    Each pole is an exact contraction — unconditionally stable for any
    dt (the r1/r2 semi-implicit Euler update was marginally stable at
    the calibrated lag and chaotically amplified FP-reassociation noise,
    breaking cross-device-count determinism).

    Returns (x1', x2', theta', theta_dot')."""
    l1, l2 = lag_poles(omega_n, zeta)
    kf = fast_frac
    E1 = jnp.exp(-l1 * dt)
    E2 = jnp.exp(-l2 * dt)
    x1n = E1 * x1 + (1.0 - kf) * (1.0 - E1) * u_cmd
    x2n = E2 * x2 + kf * (1.0 - E2) * u_cmd
    theta_n = x1n + x2n
    td_n = l1 * ((1.0 - kf) * u_cmd - x1n) + l2 * (kf * u_cmd - x2n)
    return x1n, x2n, theta_n, td_n


def step(s: TrayObjectState, u_cmd: jnp.ndarray, params: TrayObjectParams,
         dt: float) -> TrayObjectState:
    """One plant step at the 2 ms sim cadence: exact linear-lag tray update
    (the closed-loop arm-impedance response) through the small-signal
    friction backlash, then semi-implicit Euler object
    friction/rolling/rocking update."""
    x1, x2, th_lin, _ = lag_step(s.lag_x1, s.lag_x2, u_cmd,
                                 params.omega_n, params.zeta, dt,
                                 params.lag_fast)
    # Backlash-with-compliance (see TrayObjectParams.back_w): the play
    # state trails theta_lin within +-back_w; inside the play only the
    # presliding fraction back_gss of the motion reaches the tray.
    # back_w = 0 collapses to theta = theta_lin exactly.
    b = jnp.clip(s.lag_b, th_lin - params.back_w, th_lin + params.back_w)
    theta = b + params.back_gss * (th_lin - b)
    # Discrete derivative keeps theta_dot consistent with the realised
    # trajectory through the nonlinearity (observe_world's omega x r term
    # is the MPC's rate feedback — it must see the post-backlash motion).
    theta_dot = (theta - s.theta) / dt
    s2 = step_object(s, theta, theta_dot, params, dt)
    return s2._replace(lag_x1=x1, lag_x2=x2, lag_b=b)


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
    pos_rel = R @ local
    pos = params.tray_pos + pos_rel
    # World velocity INCLUDES the tray rotation-rate term omega x r, as
    # MuJoCo's cvel does (`mpc_3d.py:106-113` reads it): omega ~ 1-4 rad/s
    # during transients with a 3-10 cm lever is 0.1-0.4 m/s — the same
    # order as the object velocity itself. This term is load-bearing for
    # closed-loop stability: it is the MPC's immediate (rate-feedback)
    # view of its own tilt actions through the lagged tray, without which
    # the loop winds up to the tilt bound on the calibrated slow lag.
    # omega_world for R = Ry(a)Rx(b): a_dot * ey + Ry(a) @ (b_dot * ex).
    a_dot, b_dot = -s.theta_dot[0], s.theta_dot[1]
    omega_w = jnp.asarray([cx * b_dot, a_dot, -sx * b_dot], s.p.dtype)
    vel = R @ vel_local + jnp.cross(omega_w, pos_rel)
    return pos, vel


def off_tray(s: TrayObjectState) -> jnp.ndarray:
    """Out-of-bounds flag (`rlmpc2.py:726-731` tray_limit check)."""
    return (jnp.abs(s.p[0]) > TRAY_LIMIT_X) | (jnp.abs(s.p[1]) > TRAY_LIMIT_Y)


def contact_lost(s: TrayObjectState) -> jnp.ndarray:
    """Failure flag: object left the tray OR tipped over its support edge
    (the reference's contact-loss event, `rlmpc2.py:734-736`)."""
    return off_tray(s) | s.toppled
