"""Calibrate the tray_object contact plant against the REAL MuJoCo world.

The pure-JAX plant is the production evaluator; this tool measures its two
reduced-order models from `mj_step` ground truth (r3 pipeline):

1. TRAY LAG (2 poles + zero, `tray_object.lag_step`): record the realised
   tray tilt when the full dart_tpu arm stack drives mj_step, under BOTH a
   held 0.1 rad pulse and four closed-loop PMPC episodes, and least-squares
   fit (lam_slow, lam_fast, fast_frac) per axis on the realised-tilt
   traces. The closed-loop episodes are essential: the arm stack realises
   30-60% of a command within tens of ms (the transfer zero) and a
   pulse-only no-zero fit buries that fraction, which makes the MPC loop
   on the plant wind up and eject the object where mj_step settles.
   The y axis is fitted on the closed-loop traces only (the pulse
   commands u_y = 0 but the arms cross-couple a th_y response that a
   diagonal lag cannot represent).
2. CONTACT DISSIPATION (`roll_resist`, `slide_damp`): replay the RECORDED
   realised tilt through `step_object` (isolating the object model from
   the lag model) and fit the per-shape dissipation that matches the
   recorded tray-frame object paths. MuJoCo's implicitfast + noslip
   contact dissipates tangential energy far beyond pure Coulomb slide
   friction.

All traces are saved to artifacts/mujoco/tray_object_calibration.npz so
the CI gate (tests/test_tray_object_calibration.py) replays the
comparisons without the MuJoCo closed loop. Paste the printed constants
into `dart_tpu/physics/tray_object.py` (CALIBRATED_TRAY_LAG,
CALIBRATED_ROLL_RESIST, CALIBRATED_SLIDE_DAMP).

Usage: python tools/calibrate_tray_object.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from scipy.optimize import minimize, minimize_scalar  # noqa: E402

from dart_tpu.control import arm as arm_mod  # noqa: E402
from dart_tpu.physics import mujoco_bridge as MB  # noqa: E402
from dart_tpu.physics import tray_object as to_mod  # noqa: E402

DT = 0.002

# Closed-loop calibration episodes: the configs whose closed loops the
# r2 plant mispredicted worst (rolling objects, low-mu cube).
CL_CASES = [("cylinder", 1.0, 0.1), ("sphere", 1.0, 0.05),
            ("sphere", 1.0, 0.1), ("cube", 1.0, 0.05)]
PULSE_CASES = [("cube", 1.0, 0.1), ("cube", 2.0, 0.2),
               ("cylinder", 1.0, 0.1), ("sphere", 1.0, 0.05)]


def _tray_tilt(data, idx):
    """Realised tray tilt [tx, ty] from the tray quaternion (convention
    quat = from_euler('xyz', [u1, -u0, 0]) -> theta = [-e_y, e_x])."""
    w, x, y, z = data.xquat[idx.tray_bid]
    e_x = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    e_y = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    return np.array([-e_y, e_x])


def _obj_trayframe(data, idx):
    R = data.xmat[idx.tray_bid].reshape(3, 3)
    rel = R.T @ (data.xpos[idx.obj_bid] - data.xpos[idx.tray_bid])
    return rel[:2].copy()


def mj_episode(shape, mass, mu, u_fn, n_steps):
    """Drive the MuJoCo world with commanded tilt u_fn(k) through the arm
    stack; record realised tray tilt and object tray-frame position."""
    import mujoco

    model, data = MB.make_world(shape, mass=mass, mu=mu)
    idx = MB.index_world(model)
    torque_fn = MB.make_torque_fn(dt=DT)
    tray_pos0 = jnp.asarray(data.xpos[idx.tray_bid].copy(), jnp.float64)
    armL = arm_mod.arm_init_carry(jnp.float64)
    armR = arm_mod.arm_init_carry(jnp.float64)
    thetas, ps = [], []
    for k in range(n_steps):
        u = np.asarray(u_fn(k), float)
        qL = jnp.asarray(data.qpos[idx.qposL])
        qdL = jnp.asarray(data.qvel[idx.dofL])
        qR = jnp.asarray(data.qpos[idx.qposR])
        qdR = jnp.asarray(data.qvel[idx.dofR])
        armL, armR, tau = torque_fn(armL, armR, qL, qdL, qR, qdR,
                                    tray_pos0, jnp.asarray(u))
        data.ctrl[idx.act] = np.asarray(tau)
        data.ctrl[idx.grip_act] = 255.0
        mujoco.mj_step(model, data)
        thetas.append(_tray_tilt(data, idx))
        ps.append(_obj_trayframe(data, idx))
    return np.asarray(thetas), np.asarray(ps)


def mj_closed_loop_episode(shape, mu, n_steps=5000, control_every=5,
                           target=(0.05, -0.04), mass=1.0):
    """PMPC closed loop on the MuJoCo world (as `mujoco_bridge.
    run_closed_loop` but recording commanded u, realised tilt, object
    tray-frame path every step, never stopping early)."""
    import mujoco

    model, data = MB.make_world(shape, mass=mass, mu=mu)
    solve, carry, obs_fn = MB.pmpc_solve_fn(shape=shape, mu=mu)
    idx = MB.index_world(model)
    torque_fn = MB.make_torque_fn(dt=DT)
    tray_pos0 = jnp.asarray(data.xpos[idx.tray_bid].copy(), jnp.float64)
    target_w = np.array([tray_pos0[0] + target[0], tray_pos0[1] + target[1]])
    armL = arm_mod.arm_init_carry(jnp.float64)
    armR = arm_mod.arm_init_carry(jnp.float64)
    u = np.zeros(2)
    us, ths, ps = [], [], []
    for k in range(n_steps):
        if k % control_every == 0:
            o = obs_fn(data, idx)
            carry, uj = solve(carry, jnp.asarray(o), jnp.asarray(target_w))
            u = np.asarray(uj)
        qL = jnp.asarray(data.qpos[idx.qposL])
        qdL = jnp.asarray(data.qvel[idx.dofL])
        qR = jnp.asarray(data.qpos[idx.qposR])
        qdR = jnp.asarray(data.qvel[idx.dofR])
        armL, armR, tau = torque_fn(armL, armR, qL, qdL, qR, qdR,
                                    tray_pos0, jnp.asarray(u))
        data.ctrl[idx.act] = np.asarray(tau)
        data.ctrl[idx.grip_act] = 255.0
        mujoco.mj_step(model, data)
        us.append(u.copy())
        ths.append(_tray_tilt(data, idx))
        ps.append(_obj_trayframe(data, idx))
    return np.asarray(us), np.asarray(ths), np.asarray(ps)


# ---------------------------------------------------------------------------
# fits
# ---------------------------------------------------------------------------

@jax.jit
def _sim_lag_axis(u_seq, l1, l2, kf):
    E1 = jnp.exp(-l1 * DT)
    E2 = jnp.exp(-l2 * DT)

    def f(c, u):
        x1, x2 = c
        x1 = E1 * x1 + (1 - kf) * (1 - E1) * u
        x2 = E2 * x2 + kf * (1 - E2) * u
        return (x1, x2), x1 + x2

    _, th = jax.lax.scan(f, (jnp.float64(0), jnp.float64(0)), u_seq)
    return th


def fit_lag_axis(pairs, ax):
    """Least-squares (omega_n, zeta, fast_frac) on (u, realised-theta)
    trace pairs for one axis. Pole rates are optimized in log space with
    fast_frac through a sigmoid."""

    def loss(x):
        l1, l2 = np.exp(x[0]), np.exp(x[1])
        kf = 1 / (1 + np.exp(-x[2]))
        if not (0.2 <= l1 <= 2400 and 0.2 <= l2 <= 2400 and l2 > l1):
            return 1e6
        tot = 0.0
        for u, th in pairs:
            sim = np.asarray(_sim_lag_axis(jnp.asarray(u[:, ax]), l1, l2, kf))
            tot += np.mean((sim - th[:, ax]) ** 2)
        return tot * 1e4

    best = None
    for x0 in ([np.log(2.2), np.log(100.0), 0.0],
               [np.log(5.0), np.log(400.0), -1.0],
               [np.log(1.0), np.log(50.0), 1.0]):
        r = minimize(loss, x0, method="Nelder-Mead",
                     options={"xatol": 1e-4, "fatol": 1e-12, "maxiter": 800})
        if best is None or r.fun < best.fun:
            best = r
    l1, l2 = np.exp(best.x[0]), np.exp(best.x[1])
    kf = 1 / (1 + np.exp(-best.x[2]))
    omega_n = np.sqrt(l1 * l2)
    zeta = (l1 + l2) / (2 * omega_n)
    rms = np.sqrt(best.fun / 1e4 / len(pairs))
    return omega_n, zeta, kf, rms


@jax.jit
def _replay_object(params, th, thd):
    def f(s, x):
        t, td = x
        s = to_mod.step_object(s, t, td, params, DT)
        return s, s.p

    _, ps = jax.lax.scan(f, to_mod.init_state(dtype=jnp.float64), (th, thd))
    return ps


def fit_dissipation(cl_traces):
    """Per-shape (roll_resist, slide_damp) from the closed-loop traces:
    replay the RECORDED realised tilt through step_object and match the
    recorded object path (lag model out of the loop)."""
    out = {}
    for shape in ("cylinder", "sphere", "cube"):
        runs = [(k, v) for k, v in cl_traces.items() if k[0] == shape]
        if not runs:
            continue

        def rms_for(rr, bd):
            tot = 0.0
            for (shp, mass, mu), (u, th, p) in runs:
                thd = np.gradient(th, DT, axis=0)
                params = to_mod.make_params(shp, mass, mu,
                                            dtype=jnp.float64)._replace(
                    roll_resist=jnp.float64(rr), slide_damp=jnp.float64(bd))
                ps = np.asarray(_replay_object(params, jnp.asarray(th),
                                               jnp.asarray(thd)))
                tot += np.mean((ps - p) ** 2)
            return np.sqrt(tot / len(runs))

        if shape == "cube":
            r = minimize_scalar(lambda x: rms_for(0.0, np.exp(x)),
                                bounds=(-6, 3), method="bounded")
            out[shape] = (0.0, float(np.exp(r.x)), r.fun, rms_for(0, 0))
        else:
            r = minimize_scalar(lambda x: rms_for(np.exp(x), 0.0),
                                bounds=(-8, 0), method="bounded")
            out[shape] = (float(np.exp(r.x)), 0.0, r.fun, rms_for(0, 0))
    return out


def main_by_mass():
    """r4 payload-mass sweep (VERDICT r3 next-3): the arm stack's tilt
    response measurably depends on the payload mass (the impedance arms
    carry tray + object; a 2 kg payload realises ~10% less tilt over a
    0.7 s pulse than 1 kg). Record pulse + closed-loop episodes at BOTH
    grid masses and fit the 2-pole+zero lag per mass; the plant
    interpolates (`tray_object.calibrated_lag(mass)`)."""
    MASSES = (1.0, 2.0)
    PULSES = [("cube", 0.1), ("cylinder", 0.1), ("sphere", 0.05)]
    CLS = [("cylinder", 0.1), ("sphere", 0.05), ("cube", 0.05)]
    pulse = lambda k: np.array([0.10, 0.0]) if 50 <= k < 400 else np.zeros(2)
    u_pulse = np.stack([pulse(k) for k in range(700)])
    traces, fits = {}, {}
    for mass in MASSES:
        pulse_pairs, cl_pairs = [], []
        for shape, mu in PULSES:
            th, ps = mj_episode(shape, mass, mu, pulse, 700)
            traces[f"m{mass}_pulse_{shape}_theta"] = th
            pulse_pairs.append((u_pulse, th))
            print(f"[calibrate/by-mass] pulse {shape} m={mass}: "
                  f"mean tilt {th[50:400, 0].mean():.5f}", flush=True)
        for shape, mu in CLS:
            u, th, p = mj_closed_loop_episode(shape, mu, mass=mass)
            traces[f"m{mass}_cl_{shape}_u"] = u
            traces[f"m{mass}_cl_{shape}_theta"] = th
            traces[f"m{mass}_cl_{shape}_p"] = p
            cl_pairs.append((u, th))
            print(f"[calibrate/by-mass] closed-loop {shape} m={mass}: "
                  f"final p=({p[-1, 0]:+.4f},{p[-1, 1]:+.4f})", flush=True)
        wx, zx, fx, rx = fit_lag_axis(cl_pairs + pulse_pairs, 0)
        wy, zy, fy, ry = fit_lag_axis(cl_pairs, 1)
        fits[mass] = {"omega_n": (round(wx, 3), round(wy, 3)),
                      "zeta": (round(zx, 3), round(zy, 3)),
                      "fast": (round(fx, 4), round(fy, 4)),
                      "rms": (round(rx, 5), round(ry, 5))}
        print(f"[calibrate/by-mass] m={mass}: {json.dumps(fits[mass])}",
              flush=True)
    np.savez("artifacts/mujoco/tray_object_calibration_by_mass.npz",
             u_cmd=u_pulse, fit=json.dumps({str(m): fits[m] for m in MASSES}),
             **traces)
    print("[calibrate/by-mass] paste into tray_object.py "
          "CALIBRATED_TRAY_LAG_BY_MASS:")
    for m in MASSES:
        f = fits[m]
        print(f"  {m}: ({f['omega_n']}, {f['zeta']}, {f['fast']}),")


def main_cube_mu():
    """r4: mu-resolved cube tangential damping. The r3 slide_damp was
    fitted on the single mu=0.05 closed-loop episode and applied to every
    cube lane; at mu=0.2 Coulomb friction already supplies most of the
    dissipation MuJoCo exhibits, and the flat extra damping makes the
    calibrated plant far stickier than mj_step (PMPC converges there in
    0.7 s on MuJoCo but parks 16-18 mm out on the plant). Record cube
    mu=0.2 closed-loop episodes (both grid masses, with the production
    high-mu weight schedule in the loop) and replay-fit slide_damp on
    those traces alone."""
    cl, pairs = {}, []
    for mass in (1.0, 2.0):
        u, th, p = mj_closed_loop_episode("cube", 0.2, mass=mass)
        cl[("cube", mass, 0.2)] = (u, th, p)
        print(f"[calibrate/cube-mu] cl cube m={mass} mu=0.2: final "
              f"p=({p[-1, 0]:+.4f},{p[-1, 1]:+.4f})", flush=True)

    def rms_for(bd):
        tot = 0.0
        for (shp, mass, mu), (u, th, p) in cl.items():
            thd = np.gradient(th, DT, axis=0)
            params = to_mod.make_params(shp, mass, mu,
                                        dtype=jnp.float64)._replace(
                slide_damp=jnp.float64(bd))
            ps = np.asarray(_replay_object(params, jnp.asarray(th),
                                           jnp.asarray(thd)))
            tot += np.mean((ps - p) ** 2)
        return np.sqrt(tot / len(cl))

    r = minimize_scalar(lambda x: rms_for(np.exp(x)), bounds=(-6, 3),
                        method="bounded")
    bd = float(np.exp(r.x))
    print(f"[calibrate/cube-mu] cube mu=0.2 slide_damp={bd:.4f} "
          f"(replay rms {rms_for(0.0) * 1e3:.1f} -> {r.fun * 1e3:.1f} mm; "
          f"r3 flat value {to_mod.CALIBRATED_SLIDE_DAMP['cube']} gives "
          f"{rms_for(to_mod.CALIBRATED_SLIDE_DAMP['cube']) * 1e3:.1f} mm)")
    np.savez("artifacts/mujoco/tray_object_calibration_cube_mu02.npz",
             **{f"m{m}_cl_cube_mu02_{n}": v
                for (s, m, mu), tr in cl.items()
                for n, v in zip(("u", "theta", "p"), tr)},
             slide_damp_mu02=bd)
    print("[calibrate/cube-mu] wrote "
          "artifacts/mujoco/tray_object_calibration_cube_mu02.npz")


def main():
    traces = {}

    # --- 1. pulse episodes (regime gates + x-axis lag data)
    pulse = lambda k: np.array([0.10, 0.0]) if 50 <= k < 400 else np.zeros(2)
    u_pulse = np.stack([pulse(k) for k in range(700)])
    pulse_pairs = []
    for shape, mass, mu in PULSE_CASES:
        th, ps = mj_episode(shape, mass, mu, pulse, 700)
        key = f"{shape}_{mass}_{mu}"
        traces[f"{key}_theta"] = th
        traces[f"{key}_p"] = ps - ps[0]
        pulse_pairs.append((u_pulse, th))
        print(f"[calibrate] pulse {key}: final dx={ps[-1, 0] - ps[0, 0]:.4f}")

    # --- 2. closed-loop episodes (lag zero + dissipation data)
    cl_traces = {}
    cl_pairs = []
    for shape, mass, mu in CL_CASES:
        u, th, p = mj_closed_loop_episode(shape, mu)
        cl_traces[(shape, mass, mu)] = (u, th, p)
        cl_pairs.append((u, th))
        key = f"cl_{shape}_{mu}"
        traces[f"{key}_u"] = u
        traces[f"{key}_theta"] = th
        traces[f"{key}_p"] = p
        print(f"[calibrate] closed-loop {key}: final p=({p[-1, 0]:+.4f},"
              f"{p[-1, 1]:+.4f})")

    # --- 3. lag fit (x: all traces; y: closed-loop only, see docstring)
    wx, zx, fx, rx = fit_lag_axis(cl_pairs + pulse_pairs, 0)
    wy, zy, fy, ry = fit_lag_axis(cl_pairs, 1)
    fit = {"omega_n_x": round(wx, 3), "zeta_x": round(zx, 3),
           "fast_x": round(fx, 4), "rms_x_rad": round(rx, 5),
           "omega_n_y": round(wy, 3), "zeta_y": round(zy, 3),
           "fast_y": round(fy, 4), "rms_y_rad": round(ry, 5)}
    print("[calibrate] tray lag fit:", json.dumps(fit))

    # --- 4. dissipation fit
    dis = fit_dissipation(cl_traces)
    for shape, (rr, bd, rms, rms0) in dis.items():
        fit[f"roll_resist_{shape}"] = round(rr, 4)
        fit[f"slide_damp_{shape}"] = round(bd, 4)
        print(f"[calibrate] {shape}: roll_resist={rr:.4f} "
              f"slide_damp={bd:.4f} replay rms {rms0 * 1e3:.1f} -> "
              f"{rms * 1e3:.1f} mm")

    np.savez("artifacts/mujoco/tray_object_calibration.npz",
             u_cmd=u_pulse, fit=json.dumps(fit), **traces)
    print("[calibrate] wrote artifacts/mujoco/tray_object_calibration.npz")
    print("[calibrate] paste into tray_object.py:")
    print(f"  CALIBRATED_TRAY_LAG = (({fit['omega_n_x']}, "
          f"{fit['omega_n_y']}), ({fit['zeta_x']}, {fit['zeta_y']}), "
          f"({fit['fast_x']}, {fit['fast_y']}))")


if __name__ == "__main__":
    if "--by_mass" in sys.argv:
        main_by_mass()
    elif "--cube_mu" in sys.argv:
        main_cube_mu()
    else:
        main()
