"""Physics layer tests: finite-difference validation of the chain dynamics
(the MuJoCo-replacement contract) and behavioural checks of the tray-object
contact plant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dart_tpu.physics import chain as chain_mod
from dart_tpu.physics import tray_object as to_mod


@pytest.fixture(scope="module")
def params():
    return chain_mod.make_xarm7_chain(
        world_pos=(-0.7, 0, -0.12),
        world_quat=(0.707, 0, 0, -0.707), dtype=jnp.float64)


HOME_Q = np.array([2, -0.15, -0.38, 0.49, 0.11, -0.93, 1.4])  # keyframe home


def test_fk_reasonable_workspace(params):
    f = chain_mod.fk(params, jnp.asarray(HOME_Q))
    ee = np.asarray(f.p[7])
    # EE must be in front of the left base, in the tray workspace vicinity
    # (tray at (0, 0, 0.4), grasp points at x = -/+0.175).
    assert -0.7 < ee[0] < 0.3
    assert 0.0 < ee[2] < 1.2
    assert np.all(np.isfinite(np.asarray(f.R)))


def test_jacobian_matches_finite_difference(params):
    q = jnp.asarray(HOME_Q)
    f = chain_mod.fk(params, q)
    J = np.asarray(chain_mod.point_jacobian(f, f.p[7], 7))
    eps = 1e-7

    def pos(qn):
        return np.asarray(chain_mod.fk(params, jnp.asarray(qn)).p[7])

    for j in range(7):
        dq = np.zeros(7)
        dq[j] = eps
        fd = (pos(HOME_Q + dq) - pos(HOME_Q - dq)) / (2 * eps)
        assert np.allclose(J[:3, j], fd, atol=1e-6), j


def test_rotational_jacobian_matches_finite_difference(params):
    q = jnp.asarray(HOME_Q)
    f = chain_mod.fk(params, q)
    J = np.asarray(chain_mod.point_jacobian(f, f.p[7], 7))
    eps = 1e-7
    R0 = np.asarray(f.R[7])
    for j in range(7):
        dq = np.zeros(7)
        dq[j] = eps
        R1 = np.asarray(chain_mod.fk(params, jnp.asarray(HOME_Q + dq)).R[7])
        # dR R^T = skew(omega) * eps
        W = (R1 - R0) @ R0.T / eps
        w_fd = np.array([W[2, 1], W[0, 2], W[1, 0]])
        assert np.allclose(J[3:, j], w_fd, atol=1e-5), j


def test_mass_matrix_pd_and_symmetric(params):
    M = np.asarray(chain_mod.mass_matrix(params, jnp.asarray(HOME_Q)))
    assert np.allclose(M, M.T, atol=1e-12)
    w = np.linalg.eigvalsh(M)
    assert w.min() >= 0.1  # armature floor
    assert w.max() < 50.0


def test_bias_forces_match_lagrangian_finite_difference(params):
    """h = d/dt(dT/dqd) - dT/dq + dV/dq via numeric differentiation."""
    rng = np.random.default_rng(0)
    q = HOME_Q + rng.normal(size=7) * 0.1
    qd = rng.normal(size=7) * 0.5
    h = np.asarray(chain_mod.bias_forces(params, jnp.asarray(q), jnp.asarray(qd)))

    eps = 1e-6

    def M_of(qn):
        return np.asarray(chain_mod.mass_matrix(params, jnp.asarray(qn)))

    def V_of(qn):
        return float(chain_mod.potential_energy(params, jnp.asarray(qn)))

    # Mdot qd by finite difference along qd
    Mdot = (M_of(q + eps * qd) - M_of(q - eps * qd)) / (2 * eps)
    dTdq = np.zeros(7)
    dVdq = np.zeros(7)
    for j in range(7):
        dq = np.zeros(7)
        dq[j] = eps
        dTdq[j] = (0.5 * qd @ M_of(q + dq) @ qd -
                   0.5 * qd @ M_of(q - dq) @ qd) / (2 * eps)
        dVdq[j] = (V_of(q + dq) - V_of(q - dq)) / (2 * eps)
    h_fd = Mdot @ qd - dTdq + dVdq
    assert np.allclose(h, h_fd, atol=1e-5), (h, h_fd)


def test_gravity_compensation_holds_arm(params):
    """tau = h(q, 0) must produce (near-)zero acceleration at rest."""
    q = jnp.asarray(HOME_Q)
    qd = jnp.zeros(7)
    h = chain_mod.bias_forces(params, q, qd)
    qdd = chain_mod.forward_dynamics(params, q, qd, h)
    assert float(jnp.max(jnp.abs(qdd))) < 1e-8


def test_energy_conservation_undamped(params):
    """With passive losses zeroed, total energy drifts only at O(dt)."""
    p = params._replace(damping=jnp.zeros(7), frictionloss=jnp.zeros(7))
    dt = 1e-4
    q = jnp.asarray(HOME_Q)
    qd = jnp.asarray(np.random.default_rng(1).normal(size=7) * 0.3)

    def energy(q, qd):
        M = chain_mod.mass_matrix(p, q)
        return float(0.5 * qd @ M @ qd + chain_mod.potential_energy(p, q))

    e0 = energy(q, qd)
    stepf = jax.jit(lambda q, qd: chain_mod.step(p, q, qd, jnp.zeros(7), dt))
    for _ in range(200):
        q, qd = stepf(q, qd)
    e1 = energy(q, qd)
    assert abs(e1 - e0) < 0.05 * max(abs(e0), 1.0), (e0, e1)


def test_jacdot_matches_finite_difference(params):
    rng = np.random.default_rng(2)
    q = HOME_Q + rng.normal(size=7) * 0.05
    qd = rng.normal(size=7) * 0.4
    offset = [0.0, 0.0, 0.125]
    J, Jdot = chain_mod.jac_and_jacdot(params, jnp.asarray(q), jnp.asarray(qd),
                                       body=7, local_offset=offset)
    eps = 1e-6
    J1, _ = chain_mod.jac_and_jacdot(params, jnp.asarray(q + eps * qd),
                                     jnp.asarray(qd), body=7,
                                     local_offset=offset)
    J0, _ = chain_mod.jac_and_jacdot(params, jnp.asarray(q - eps * qd),
                                     jnp.asarray(qd), body=7,
                                     local_offset=offset)
    fd = (np.asarray(J1) - np.asarray(J0)) / (2 * eps)
    assert np.allclose(np.asarray(Jdot), fd, atol=1e-5)


# ----------------------------- tray-object plant --------------------------


def test_tray_gravity_matches_pmpc_small_tilt():
    """Tangential gravity must reduce to the PMPC g*sin(theta) form."""
    theta = jnp.asarray([0.1, -0.15])
    gt, gn = to_mod.tray_gravity(theta)
    assert float(gt[0]) == pytest.approx(-9.81 * np.sin(0.1), abs=1e-9)
    assert float(gt[1]) == pytest.approx(-9.81 * np.cos(0.1) * np.sin(-0.15),
                                         abs=1e-9)
    assert float(gn) == pytest.approx(9.81 * np.cos(0.1) * np.cos(-0.15),
                                      abs=1e-9)


def _rollout(shape, mu, tilt, T=2000, dt=0.002):
    params = to_mod.make_params(shape=shape, mu=mu, dtype=jnp.float64)
    s = to_mod.init_state(dtype=jnp.float64)
    u = jnp.asarray(tilt, jnp.float64)
    stepf = jax.jit(lambda s: to_mod.step(s, u, params, dt))
    for _ in range(T):
        s = stepf(s)
    return s


def test_cube_sticks_below_friction_cone():
    """tan(tilt) < mu  ->  static friction holds the cube."""
    s = _rollout("cube", mu=0.2, tilt=[0.1, 0.0])  # tan(0.1)=0.10 < 0.2
    assert abs(float(s.v[0])) < 5e-3
    assert abs(float(s.p[0])) < 5e-3


def test_cube_slides_above_friction_cone():
    """tan(tilt) > mu -> terminal acceleration a = g(sin t - mu cos t)."""
    dt = 0.002
    params = to_mod.make_params(shape="cube", mu=0.05, dtype=jnp.float64)
    s = to_mod.init_state(dtype=jnp.float64)
    u = jnp.asarray([0.3, 0.0], jnp.float64)
    s = s._replace(theta=u)  # start at the tilt, measure pure sliding
    stepf = jax.jit(lambda s: to_mod.step(s, u, params, dt))
    for _ in range(500):
        s = stepf(s)
    a_expect = -9.81 * np.sin(0.3) + 0.05 * 9.81 * np.cos(0.3)
    # velocity after 1 s of nearly constant acceleration
    assert float(s.v[0]) == pytest.approx(a_expect * 1.0, rel=0.05)


def test_sphere_rolls_at_five_sevenths():
    """Rolling sphere: a = (5/7) g sin(t) regardless of mu (if mu enough)."""
    dt = 0.002
    params = to_mod.make_params(shape="sphere", mu=0.2, dtype=jnp.float64)
    s = to_mod.init_state(dtype=jnp.float64)
    u = jnp.asarray([0.2, 0.0], jnp.float64)
    s = s._replace(theta=u)
    stepf = jax.jit(lambda s: to_mod.step(s, u, params, dt))
    for _ in range(500):
        s = stepf(s)
    a_expect = -(5.0 / 7.0) * 9.81 * np.sin(0.2)
    assert float(s.v[0]) == pytest.approx(a_expect * 1.0, rel=0.05)


def test_cylinder_rolls_x_slides_y():
    dt = 0.002
    params = to_mod.make_params(shape="cylinder", mu=0.2, dtype=jnp.float64)
    u = jnp.asarray([0.2, 0.2], jnp.float64)
    s = to_mod.init_state(dtype=jnp.float64)._replace(theta=u)
    stepf = jax.jit(lambda s: to_mod.step(s, u, params, dt))
    for _ in range(500):
        s = stepf(s)
    a_roll = -(2.0 / 3.0) * 9.81 * np.sin(0.2)  # kappa=1/2 -> 2/3 g
    assert float(s.v[0]) == pytest.approx(a_roll * 1.0, rel=0.05)
    # y-axis: tan(0.2)=0.2 ~ mu -> slides slowly or creeps; just check it
    # moved less than the rolling axis.
    assert abs(float(s.v[1])) < abs(float(s.v[0]))


def test_observe_world_round_trip():
    params = to_mod.make_params(dtype=jnp.float64)
    s = to_mod.init_state(p0=(0.05, -0.03), dtype=jnp.float64)
    pos, vel = to_mod.observe_world(s, params)
    assert np.allclose(np.asarray(pos), [0.05, -0.03, 0.43], atol=1e-9)
    assert np.allclose(np.asarray(vel), 0.0)


def test_tray_tracking_converges_to_command():
    params = to_mod.make_params(dtype=jnp.float64)
    s = to_mod.init_state(dtype=jnp.float64)
    u = jnp.asarray([0.3, -0.2], jnp.float64)
    stepf = jax.jit(lambda s: to_mod.step(s, u, params, 0.002))
    for _ in range(500):
        s = stepf(s)
    assert np.allclose(np.asarray(s.theta), np.asarray(u), atol=1e-3)


# --------------------------------------------------------------------------
# Rocking / toppling (the LMPC contact-loss failure mode)
# --------------------------------------------------------------------------

def _hold_tilt(shape, tilt_x, T=1500, dt=0.002):
    params = to_mod.make_params(shape=shape, mu=0.2, dtype=jnp.float64)
    u = jnp.asarray([tilt_x, 0.0], jnp.float64)
    s = to_mod.init_state(dtype=jnp.float64)._replace(theta=u)
    stepf = jax.jit(lambda s: to_mod.step_object(s, u, jnp.zeros(2), params,
                                                 dt))
    for _ in range(T):
        s = stepf(s)
    return s


def test_cube_stable_within_tilt_bounds():
    """At the 0.6 rad tilt bound the 5 cm cube must NOT rock or topple
    (critical static angle atan(w/h) = atan(1) = 0.785 rad)."""
    s = _hold_tilt("cube", 0.6)
    assert float(jnp.max(jnp.abs(s.q_rock))) == 0.0
    assert not bool(s.toppled)


def test_cube_topples_beyond_critical_tilt():
    """Holding tilt > atan(w/h): the edge torque is overturning from q=0 and
    the cube must go over (sticky toppled flag)."""
    s = _hold_tilt("cube", 1.0)
    assert bool(s.toppled)


def test_sphere_and_rolling_axes_never_topple():
    s = _hold_tilt("sphere", 1.2)
    assert not bool(s.toppled)
    assert float(jnp.max(jnp.abs(s.q_rock))) == 0.0
    # cylinder rolls along x: no rocking on that axis even at huge tilt
    s = _hold_tilt("cylinder", 1.2)
    assert not bool(s.toppled)


def test_rocking_lands_inelastically():
    """A super-critical pulse followed by levelling the tray: the cube must
    land back on its face (q -> 0, rocking energy absorbed), not chatter."""
    dt = 0.002
    params = to_mod.make_params(shape="cube", mu=0.2, dtype=jnp.float64)
    s = to_mod.init_state(dtype=jnp.float64)
    u_hi = jnp.asarray([0.9, 0.0], jnp.float64)
    u_lo = jnp.zeros(2, jnp.float64)
    step_hi = jax.jit(lambda s: to_mod.step_object(s, u_hi, jnp.zeros(2),
                                                   params, dt))
    step_lo = jax.jit(lambda s: to_mod.step_object(s, u_lo, jnp.zeros(2),
                                                   params, dt))
    for _ in range(60):           # 120 ms pulse: lifts the edge
        s = step_hi(s)
    assert float(jnp.abs(s.q_rock[0])) > 0.0
    assert not bool(s.toppled)
    for _ in range(2000):
        s = step_lo(s)
    assert float(jnp.abs(s.q_rock[0])) == 0.0
    assert float(jnp.abs(s.w_rock[0])) == 0.0
    assert not bool(s.toppled)
    # (it did slide off the tray during the pulse -- tan 0.9 >> mu -- so
    # contact_lost is still true via off_tray; toppling alone must be false)
    assert bool(to_mod.off_tray(s))


def test_liftoff_threshold_matches_static_criterion():
    """q lifts off iff |g_t| h > w g_n, i.e. tilt > atan(w/h)."""
    below = _hold_tilt("cube", 0.75, T=400)   # below atan(1)=0.7854
    above = _hold_tilt("cube", 0.82, T=400)
    assert float(jnp.abs(below.q_rock[0])) == 0.0
    assert float(jnp.abs(above.q_rock[0])) > 0.0


def test_rolling_stiction_cone_capability():
    """roll_stick > 0 (a condim-6-style rolling friction cone): a slow
    roller inside the cone holds exactly; outside the cone it rolls. The
    CALIBRATED plant runs with the cone at 0 (measured: the reference
    world is condim 3, artifacts/mujoco/roll_stiction.json)."""
    dt = 0.002
    base = to_mod.make_params(shape="sphere", mu=0.1, dtype=jnp.float64)
    params = base._replace(roll_stick=jnp.asarray([0.04, 0.04], jnp.float64))
    stepj = jax.jit(lambda s, th: to_mod.step_object(
        s, th, jnp.zeros(2), params, dt))
    inside = jnp.asarray([0.02, 0.0], jnp.float64)    # tan < 0.04
    outside = jnp.asarray([0.08, 0.0], jnp.float64)   # tan > 0.04
    s = to_mod.init_state(dtype=jnp.float64)
    for _ in range(1000):
        s = stepj(s, inside)
    assert float(jnp.abs(s.p[0])) < 1e-6, float(s.p[0])   # held exactly
    s2 = to_mod.init_state(dtype=jnp.float64)
    for _ in range(1000):
        s2 = stepj(s2, outside)
    assert float(jnp.abs(s2.p[0])) > 0.01                 # rolls away
    # calibrated cone is zero: the same inside-tilt creeps (reference
    # contact model has no rolling stiction)
    s3 = to_mod.init_state(dtype=jnp.float64)
    stepb = jax.jit(lambda s, th: to_mod.step_object(
        s, th, jnp.zeros(2), base, dt))
    for _ in range(1000):
        s3 = stepb(s3, inside)
    assert float(jnp.abs(s3.p[0])) > 1e-4


def test_backlash_swallows_micro_commands():
    """The calibrated plant's small-signal backlash (measured arm-stack
    friction): commands inside the play realise only the presliding
    fraction; large commands realise fully minus the play droop; the
    uncalibrated plant (back_w = 0) is exactly linear."""
    dt = 0.002
    cal = to_mod.make_params(shape="cube", mu=0.1, calibrated=True,
                             dtype=jnp.float64)
    stepj = jax.jit(lambda s, u: to_mod.step(s, u, cal, dt))
    s = to_mod.init_state(dtype=jnp.float64)
    for _ in range(1500):                       # 3 s at a 4 mrad command
        s = stepj(s, jnp.asarray([0.004, 0.0], jnp.float64))
    # inside the 7 mrad x-play: only ~gss (9.5%) realised
    assert float(s.theta[0]) < 0.001, float(s.theta[0])
    s2 = to_mod.init_state(dtype=jnp.float64)
    for _ in range(3000):                       # 6 s at 0.1 rad
        s2 = stepj(s2, jnp.asarray([0.1, 0.0], jnp.float64))
    th = float(s2.theta[0])
    assert 0.085 < th < 0.097, th               # full minus play droop
    # uncalibrated: linear lag reaches the command exactly
    lin = to_mod.make_params(shape="cube", mu=0.1, omega_n=40.0, zeta=1.0,
                             dtype=jnp.float64)
    s3 = to_mod.init_state(dtype=jnp.float64)
    stepl = jax.jit(lambda s, u: to_mod.step(s, u, lin, dt))
    for _ in range(1500):
        s3 = stepl(s3, jnp.asarray([0.004, 0.0], jnp.float64))
    assert abs(float(s3.theta[0]) - 0.004) < 1e-4
