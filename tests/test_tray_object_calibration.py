"""Contact-plant fidelity gate against recorded MuJoCo ground truth.

`tools/calibrate_tray_object.py` drives the reference's MuJoCo world with
the dart_tpu arm stack and records (commanded tilt, realised tray tilt,
tray-frame object displacement) into
`artifacts/mujoco/tray_object_calibration.npz`. This gate replays the SAME
commanded tilt through the pure-JAX `tray_object` plant (with the
MuJoCo-calibrated tray lag) and asserts regime-level agreement — the
contact plant is an intentional reduced-order model, so the criteria are
physical-regime ones, not trajectory-exactness:

- tray tilt tracking within 0.03 rad RMS of the measured response;
- stiction: cube 2 kg / mu 0.2 stays put on both plants (< 3 mm);
- marginal slip: cube 1 kg / mu 0.1 moves < 1 cm on both, same direction;
- rolling: side-lying cylinder and sphere both roll downhill, with
  displacement within a factor of ~2 (the plant has no MuJoCo-style
  rolling-resistance contact pair).
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dart_tpu.physics import tray_object as to_mod

NPZ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "artifacts", "mujoco", "tray_object_calibration.npz")

CASES = [("cube_1.0_0.1", "cube", 1.0, 0.1),
         ("cube_2.0_0.2", "cube", 2.0, 0.2),
         ("cylinder_1.0_0.1", "cylinder", 1.0, 0.1),
         ("sphere_1.0_0.05", "sphere", 1.0, 0.05)]


@pytest.fixture(scope="module")
def traces():
    if not os.path.exists(NPZ):
        pytest.skip("calibration artifact missing; run "
                    "tools/calibrate_tray_object.py")
    return np.load(NPZ)


def _replay(shape, mass, mu, u_cmd):
    d = jnp.float64
    params = to_mod.make_params(shape, mass, mu, dtype=d, calibrated=True)

    def run():
        def f(s, u):
            s = to_mod.step(s, u, params, 0.002)
            return s, (s.p, s.theta)

        _, (ps, ths) = jax.lax.scan(f, to_mod.init_state(dtype=d),
                                    jnp.asarray(u_cmd, d))
        return ps, ths

    ps, ths = jax.jit(run)()
    return np.asarray(ps), np.asarray(ths)


def test_tray_tilt_tracking(traces):
    u_cmd = traces["u_cmd"]
    for key, shape, mass, mu in CASES:
        _, ths = _replay(shape, mass, mu, u_cmd)
        rms = float(np.sqrt(np.mean((ths - traces[f"{key}_theta"]) ** 2)))
        assert rms < 0.03, (key, rms)


def test_slide_regimes_match_mujoco(traces):
    u_cmd = traces["u_cmd"]
    disp = {}
    for key, shape, mass, mu in CASES:
        ps, _ = _replay(shape, mass, mu, u_cmd)
        disp[key] = (float(ps[-1, 0] - ps[0, 0]),
                     float(traces[f"{key}_p"][-1, 0]))

    ours, mj = disp["cube_2.0_0.2"]
    assert abs(ours) < 3e-3 and abs(mj) < 3e-3, disp   # stiction holds

    ours, mj = disp["cube_1.0_0.1"]
    assert abs(ours) < 1e-2 and abs(mj) < 1e-2, disp   # marginal slip
    # same direction when either moved measurably
    if min(abs(ours), abs(mj)) > 1e-3:
        assert np.sign(ours) == np.sign(mj), disp

    for key in ("cylinder_1.0_0.1", "sphere_1.0_0.05"):
        ours, mj = disp[key]
        assert np.sign(ours) == np.sign(mj), (key, disp)
        assert abs(mj) > 0.05, (key, disp)             # MuJoCo rolled far
        ratio = abs(ours) / abs(mj)
        assert 0.5 < ratio < 2.0, (key, disp)


def test_calibration_fit_recorded(traces):
    """The shipped constants match the recorded fit (lag incl. the
    transfer-zero fast fraction, and the per-shape dissipation)."""
    fit = json.loads(str(traces["fit"]))
    cal = to_mod.CALIBRATED_TRAY_LAG
    assert abs(fit["omega_n_x"] - cal[0][0]) < 0.5
    assert abs(fit["zeta_x"] - cal[1][0]) < 0.3
    assert abs(fit["fast_x"] - cal[2][0]) < 0.1
    assert abs(fit["omega_n_y"] - cal[0][1]) < 0.5
    assert abs(fit["fast_y"] - cal[2][1]) < 0.1
    for shape in ("cube", "cylinder", "sphere"):
        assert abs(fit[f"roll_resist_{shape}"]
                   - to_mod.CALIBRATED_ROLL_RESIST[shape]) < 5e-3
        assert abs(fit[f"slide_damp_{shape}"]
                   - to_mod.CALIBRATED_SLIDE_DAMP[shape]) < 0.1


CL_KEYS = [("cl_cylinder_0.1", "cylinder", 0.1),
           ("cl_sphere_0.05", "sphere", 0.05),
           ("cl_sphere_0.1", "sphere", 0.1),
           ("cl_cube_0.05", "cube", 0.05)]


def test_lag_tracks_closed_loop_commands(traces):
    """Replaying the recorded closed-loop COMMANDS through the calibrated
    lag reproduces the recorded realised tilt (the regime that matters
    for closed-loop stability; the pulse-only r2 fit missed the transfer
    zero's fast fraction here)."""
    d = jnp.float64
    cal_w, cal_z, cal_f = to_mod.CALIBRATED_TRAY_LAG
    for key, shape, mu in CL_KEYS:
        u = jnp.asarray(traces[f"{key}_u"], d)
        th_mj = np.asarray(traces[f"{key}_theta"])
        w = jnp.asarray(cal_w, d)
        z = jnp.asarray(cal_z, d)
        f_ = jnp.asarray(cal_f, d)

        def run():
            def f(c, uu):
                x1, x2, th, _ = to_mod.lag_step(c[0], c[1], uu, w, z,
                                                0.002, f_)
                return (x1, x2), th

            _, ths = jax.lax.scan(f, (jnp.zeros(2, d), jnp.zeros(2, d)), u)
            return ths

        ths = np.asarray(jax.jit(run)())
        rms = float(np.sqrt(np.mean((ths - th_mj) ** 2)))
        assert rms < 0.025, (key, rms)


def test_object_model_tracks_recorded_tilt(traces):
    """Replaying the RECORDED realised tilt through `step_object` (with
    the calibrated per-shape dissipation) reproduces the recorded object
    paths — isolates the object model from the lag model. Without the
    dissipation terms the cylinder replay drifts 144 mm rms and the
    low-mu cube 203 mm where mj_step stays on the tray."""
    d = jnp.float64
    bounds = {"cl_cylinder_0.1": 0.025, "cl_sphere_0.05": 0.040,
              "cl_sphere_0.1": 0.040, "cl_cube_0.05": 0.035}
    for key, shape, mu in CL_KEYS:
        th = np.asarray(traces[f"{key}_theta"])
        thd = np.gradient(th, 0.002, axis=0)
        p_mj = np.asarray(traces[f"{key}_p"])
        params = to_mod.make_params(shape, 1.0, mu, dtype=d,
                                    calibrated=True)

        def run():
            def f(s, x):
                t, td = x
                s = to_mod.step_object(s, t, td, params, 0.002)
                return s, s.p

            _, ps = jax.lax.scan(f, to_mod.init_state(dtype=d),
                                 (jnp.asarray(th, d), jnp.asarray(thd, d)))
            return ps

        ps = np.asarray(jax.jit(run)())
        rms = float(np.sqrt(np.mean((ps - p_mj) ** 2)))
        assert rms < bounds[key], (key, rms)


def test_closed_loop_metrics_match_mujoco(traces):
    """The calibrated plant under its OWN closed loop (the production
    evaluator controller: reference discretization Ts = 2 ms) reproduces
    the MuJoCo episodes at METRIC level: converges to the same target,
    settles (no limit cycle / ejection — the r2 failure mode), and its
    final error is within 15 mm of the recorded mj endpoint error."""
    from dart_tpu.control import mpc as mpc_mod
    from dart_tpu.models import dynamics as dyn

    d = jnp.float64
    dt, control_every = 0.002, 5
    target = np.array([0.05, -0.04])
    for key, shape, mu in CL_KEYS:
        p_mj = np.asarray(traces[f"{key}_p"])
        mj_final_err = float(np.linalg.norm(p_mj[-1] - target))
        ctlr = mpc_mod.PMPC(N=15, dt=dt,
                            cfg=mpc_mod.ilqr.ILQRConfig(max_iters=8))
        params = dyn.PMPCParams(mu=jnp.asarray(mu, d), dt=dt)
        w = mpc_mod.PMPC_WEIGHTS[shape]
        w = mpc_mod.PMPCWeights(*[jnp.asarray(x, d) for x in w])
        obj = to_mod.make_params(shape, 1.0, mu, dtype=d, calibrated=True)
        target6 = jnp.asarray([0.05, 0, -0.04, 0, 0.43, 0], d)

        def run():
            def f(carry, k):
                cc, s, u = carry
                pos, vel = to_mod.observe_world(s, obj)
                obs = jnp.stack([pos[0], vel[0], pos[1], vel[1],
                                 pos[2], vel[2]])
                cc, u = jax.lax.cond(
                    k % control_every == 0,
                    lambda c: ctlr.solve(c[0], obs, target6, params, w)[:2],
                    lambda c: (c[0], c[1]), (cc, u))
                s = to_mod.step(s, u, obj, dt)
                return (cc, s, u), s.p

            init = (ctlr.init_carry(d), to_mod.init_state(dtype=d),
                    jnp.zeros(2, d))
            _, ps = jax.lax.scan(f, init, jnp.arange(5000))
            return ps

        ps = np.asarray(jax.jit(run)())
        err = np.linalg.norm(ps - target, axis=1)
        assert err.min() < 0.01, (key, err.min())            # converges
        assert err[2500:].max() < 0.06, (key, err[2500:].max())  # settles
        final_err = err[-1]
        assert abs(final_err - mj_final_err) < 0.015, \
            (key, final_err, mj_final_err)


# ---------------------------------------------------------------------------
# r4 payload-mass-resolved lag (VERDICT r3 next-3)
# ---------------------------------------------------------------------------

NPZ_BY_MASS = os.path.join(os.path.dirname(NPZ),
                           "tray_object_calibration_by_mass.npz")


@pytest.fixture(scope="module")
def mass_traces():
    if not os.path.exists(NPZ_BY_MASS):
        pytest.skip("by-mass calibration artifact missing; run "
                    "tools/calibrate_tray_object.py --by_mass")
    return np.load(NPZ_BY_MASS)


def test_calibrated_lag_interpolates_mass():
    """The plant's default lag is payload-mass-resolved: endpoint masses
    reproduce the fitted tables, midpoints interpolate, out-of-range
    clamps, and the 1 kg vs 2 kg responses genuinely differ (the MuJoCo
    arm stack realises ~15% less tilt at 2 kg)."""
    lo = to_mod.CALIBRATED_TRAY_LAG_BY_MASS[1.0]
    hi = to_mod.CALIBRATED_TRAY_LAG_BY_MASS[2.0]
    for m, ref in ((1.0, lo), (2.0, hi), (0.5, lo), (3.0, hi)):
        got = to_mod.calibrated_lag(m, jnp.float64)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), r, rtol=1e-6)
    mid = to_mod.calibrated_lag(1.5, jnp.float64)
    for g, a, b in zip(mid, lo, hi):
        np.testing.assert_allclose(np.asarray(g),
                                   0.5 * (np.asarray(a) + np.asarray(b)),
                                   rtol=1e-6)
    # the masses must not collapse to one response
    assert abs(lo[0][0] - hi[0][0]) / lo[0][0] > 0.05


def test_lag_by_mass_replay(mass_traces):
    """Replaying the recorded 0.1 rad pulse through the mass-resolved lag
    matches each mass's OWN recorded tray tilt, and each mass's fit is at
    least as good on its own traces as the other mass's fit (the split
    captures real signal, not noise)."""
    u = jnp.asarray(mass_traces["u_cmd"], jnp.float64)

    def sim_x(mass_for_lag):
        w, z, f = to_mod.calibrated_lag(mass_for_lag, jnp.float64)

        def step(c, uk):
            x1, x2, th, _ = to_mod.lag_step(c[0], c[1], uk[0], w[0], z[0],
                                            0.002, f[0])
            return (x1, x2), th

        _, th = jax.lax.scan(step, (jnp.float64(0), jnp.float64(0)), u)
        return np.asarray(th)

    for mass in (1.0, 2.0):
        th_own = sim_x(mass)
        th_other = sim_x(3.0 - mass)
        own = other = 0.0
        for shape in ("cube", "cylinder", "sphere"):
            rec = np.asarray(mass_traces[f"m{mass}_pulse_{shape}_theta"])
            own += np.mean((th_own - rec[:, 0]) ** 2)
            other += np.mean((th_other - rec[:, 0]) ** 2)
        own = np.sqrt(own / 3)
        other = np.sqrt(other / 3)
        assert own < 0.02, (mass, own)
        assert own < other * 1.05, (mass, own, other)


def test_evaluator_rows_differ_by_mass():
    """The '18-config' calibrated sweep is 18 real configs again: the
    default-plant params for a 1 kg and a 2 kg scenario differ in their
    tray response (VERDICT r3: 9/9 mass-pairs were byte-identical)."""
    from dart_tpu.rollout.evaluate import _tray_params
    k = jnp.zeros(2, jnp.float32)
    p1 = _tray_params(k, jnp.float32(1.0), jnp.float32(0.1), jnp.float32)
    p2 = _tray_params(k, jnp.float32(2.0), jnp.float32(0.1), jnp.float32)
    assert not np.allclose(np.asarray(p1.omega_n), np.asarray(p2.omega_n))
    assert not np.allclose(np.asarray(p1.zeta), np.asarray(p2.zeta))


NPZ_CUBE_MU = os.path.join(os.path.dirname(NPZ),
                           "tray_object_calibration_cube_mu02.npz")


def test_cube_slide_damp_fades_with_mu():
    """r4: the fitted cube tangential damping is a low-friction
    phenomenon — full at the mu=0.05 anchor, ~zero at the mu=0.2 refit
    anchor (replaying the recorded cube mu=0.2 closed-loop episodes shows
    the r3 flat 2.736 adds nothing over ~0 there), linear between."""
    base = to_mod.CALIBRATED_SLIDE_DAMP["cube"]
    sd = lambda mu: float(to_mod.calibrated_slide_damp(base, mu,
                                                       jnp.float64))
    assert abs(sd(0.05) - base) < 1e-9
    assert sd(0.2) == 0.0
    assert abs(sd(0.125) - base / 2) < 1e-6
    assert abs(sd(0.01) - base) < 1e-9      # clamped
    # the calibrated plant picks it up end to end
    p_lo = to_mod.make_params("cube", 1.0, 0.05, calibrated=True,
                              dtype=jnp.float64)
    p_hi = to_mod.make_params("cube", 1.0, 0.2, calibrated=True,
                              dtype=jnp.float64)
    assert float(p_lo.slide_damp) > 2.0 and float(p_hi.slide_damp) == 0.0


def test_cube_mu02_replay_not_stickier_than_mujoco():
    """Replaying the recorded mu=0.2 realised tilt through the calibrated
    cube model must track the recorded MuJoCo object path at least as
    well as the r3 flat-damping model did (the flat damping made the
    plant stickier than mj_step at high friction)."""
    if not os.path.exists(NPZ_CUBE_MU):
        pytest.skip("cube mu=0.2 calibration artifact missing; run "
                    "tools/calibrate_tray_object.py --cube_mu")
    d = np.load(NPZ_CUBE_MU)
    for mass in (1.0, 2.0):
        th = np.asarray(d[f"m{mass}_cl_cube_mu02_theta"])
        p_mj = np.asarray(d[f"m{mass}_cl_cube_mu02_p"])
        thd = np.gradient(th, 0.002, axis=0)
        params = to_mod.make_params("cube", mass, 0.2, calibrated=True,
                                    dtype=jnp.float64)

        def replay(pp):
            def f(s, x):
                t, td = x
                s = to_mod.step_object(s, t, td, pp, 0.002)
                return s, s.p

            _, ps = jax.lax.scan(f, to_mod.init_state(dtype=jnp.float64),
                                 (jnp.asarray(th), jnp.asarray(thd)))
            return np.asarray(ps)

        rms = np.sqrt(np.mean((replay(params) - p_mj) ** 2))
        flat = params._replace(slide_damp=jnp.float64(
            to_mod.CALIBRATED_SLIDE_DAMP["cube"]))
        rms_flat = np.sqrt(np.mean((replay(flat) - p_mj) ** 2))
        assert rms <= rms_flat * 1.05, (mass, rms, rms_flat)
        assert rms < 0.06, (mass, rms)
