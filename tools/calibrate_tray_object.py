"""Calibrate the tray_object contact plant against the REAL MuJoCo world.

VERDICT r1 item 1b: the pure-JAX plant's tray-tracking lag (omega_n, zeta)
and slide behaviour were hand-derived; this tool measures them from
`mj_step` ground truth:

1. STEP RESPONSE: command a held tilt through the full dart_tpu arm stack
   on the MuJoCo world, record the realised tray tilt theta(t), and fit the
   plant's second-order lag (`tray_object.step`:
   th_dd = omega_n^2 (u - th) - 2 zeta omega_n th_d) by least squares.
2. SLIDE TRACES: for a few (shape, mass, mu) configs, record the object's
   tray-frame XY under a tilt pulse, and compare the tray_object plant
   driven by the SAME commanded u. Traces are saved to
   artifacts/mujoco/tray_object_calibration.npz so the CI gate
   (tests/test_tray_object_calibration.py) replays the comparison without
   needing the MuJoCo closed loop.

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
from scipy.optimize import minimize_scalar, minimize  # noqa: E402

from dart_tpu.control import arm as arm_mod  # noqa: E402
from dart_tpu.physics import mujoco_bridge as MB  # noqa: E402
from dart_tpu.physics import tray_object as to_mod  # noqa: E402

DT = 0.002


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
        # realised tray tilt from the tray quaternion (tilt convention
        # quat = from_euler('xyz', [u1, -u0, 0]) -> theta = [-e_y, e_x])
        q = data.xquat[idx.tray_bid]
        w, x, y, z = q
        e_x = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
        e_y = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
        thetas.append([-e_y, e_x])
        # object tray-frame xy
        R = data.xmat[idx.tray_bid].reshape(3, 3)
        rel = R.T @ (data.xpos[idx.obj_bid] - data.xpos[idx.tray_bid])
        ps.append(rel[:2])
    return np.asarray(thetas), np.asarray(ps)


def fit_second_order(u_cmd, theta_meas):
    """Least-squares (omega_n, zeta) of the plant's tray lag on one axis."""

    def sim(omega_n, zeta):
        th, thd = 0.0, 0.0
        out = np.empty(len(u_cmd))
        for k, u in enumerate(u_cmd):
            thdd = omega_n ** 2 * (u - th) - 2 * zeta * omega_n * thd
            thd += DT * thdd
            th += DT * thd
            out[k] = th
        return out

    def loss(x):
        w, z = x
        if w <= 1.0 or z <= 0.05:
            return 1e6
        return float(np.mean((sim(w, z) - theta_meas) ** 2)) * 1e6

    res = minimize(loss, [40.0, 1.0], method="Nelder-Mead",
                   options={"xatol": 1e-3, "fatol": 1e-9, "maxiter": 400})
    return res.x, np.sqrt(res.fun / 1e6)


def main():
    # --- 1. tray step response (both axes; heavy payload for realism)
    step_u = np.array([0.10, -0.06])
    n = 600
    thetas, _ = mj_episode("cube", 1.0, 0.1,
                           lambda k: step_u if k >= 50 else np.zeros(2), n)
    u_cmd = np.where(np.arange(n)[:, None] >= 50, step_u[None], 0.0)
    (w0, z0), rms0 = fit_second_order(u_cmd[:, 0], thetas[:, 0])
    (w1, z1), rms1 = fit_second_order(u_cmd[:, 1], thetas[:, 1])
    fit = {"omega_n_x": round(w0, 2), "zeta_x": round(z0, 3),
           "rms_x_rad": round(rms0, 5),
           "omega_n_y": round(w1, 2), "zeta_y": round(z1, 3),
           "rms_y_rad": round(rms1, 5)}
    print("[calibrate] tray lag fit:", json.dumps(fit))

    # --- 2. slide traces for the CI gate
    pulse = lambda k: np.array([0.10, 0.0]) if 50 <= k < 400 else np.zeros(2)
    traces = {}
    for shape, mass, mu in [("cube", 1.0, 0.1), ("cube", 2.0, 0.2),
                            ("cylinder", 1.0, 0.1), ("sphere", 1.0, 0.05)]:
        th, ps = mj_episode(shape, mass, mu, pulse, 700)
        key = f"{shape}_{mass}_{mu}"
        traces[f"{key}_theta"] = th
        traces[f"{key}_p"] = ps - ps[0]    # tray-frame displacement
        print(f"[calibrate] recorded {key}: final dx={ps[-1,0]-ps[0,0]:.4f}")
    u_cmds = np.stack([pulse(k) for k in range(700)])
    np.savez("artifacts/mujoco/tray_object_calibration.npz",
             u_cmd=u_cmds, fit=json.dumps(fit), **traces)
    print("[calibrate] wrote artifacts/mujoco/tray_object_calibration.npz")


if __name__ == "__main__":
    main()
