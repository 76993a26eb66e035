"""Small-signal realised-tilt response of the arm stack (r5).

The calibrated tray lag (`tray_object.CALIBRATED_TRAY_LAG*`) was fitted on
0.1 rad pulses and closed-loop episodes — LARGE commands. Post-convergence
control lives in the +-0.002..0.02 rad regime, where the real arm stack is
NOT linear: every xArm7 joint carries `frictionloss="1"`
(`world_general.xml:17`), so tilt commands below the joint-stiction scale
produce little or no realised motion. The pure-JAX lag realises every
micro-command faithfully, which lets a marginal post-convergence loop pump
energy that the real plant would swallow — a candidate mechanism for the
r4 rolling-lane ejections (the same controller holds 9-26 mm wobble on
MuJoCo ground truth).

This tool measures that regime directly: square-wave tilt commands of
amplitude A through the full dart_tpu arm stack driving the reference
world (no object), recording the realised tilt amplitude about the rest
sag. The output calibrates a small-signal attenuation/deadband for the
lag model.

    PYTHONPATH=/root/repo python tools/measure_tilt_smallsignal.py \
        --out artifacts/mujoco/tilt_smallsignal.json
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def measure(amps, half_period_s=1.0, cycles=3, settle_s=2.0, axis=0,
            mass=1.0):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import mujoco

    from dart_tpu.control import arm as arm_mod
    from dart_tpu.physics import mujoco_bridge as mb

    model, data = mb.make_world(shape="cube", mass=mass, mu=0.1,
                                obj_xy=(0.15, 0.1))   # object parked clear
    idx = mb.index_world(model)
    dt = float(model.opt.timestep)
    torque_fn = mb.make_torque_fn(dt=dt)
    tray_pos0 = jnp.asarray(data.xpos[idx.tray_bid].copy(), jnp.float64)

    def tilt_xy(data):
        """Small-angle tray tilt vector from the tray normal (world)."""
        R = data.xmat[idx.tray_bid].reshape(3, 3)
        n = R[:, 2]
        # theta convention: observe_world uses R = Ry(-tx) Rx(ty); the
        # normal tips to n = (sin tx, -cos tx sin ty, ...) for small
        # angles -> tx ~ n[0], ty ~ -n[1].
        return np.array([n[0], -n[1]])

    armL = arm_mod.arm_init_carry(jnp.float64)
    armR = arm_mod.arm_init_carry(jnp.float64)

    def run(u_of_t, n_steps, armL, armR):
        tilts = []
        for k in range(n_steps):
            u = u_of_t(k * dt)
            qL = jnp.asarray(data.qpos[idx.qposL])
            qdL = jnp.asarray(data.qvel[idx.dofL])
            qR = jnp.asarray(data.qpos[idx.qposR])
            qdR = jnp.asarray(data.qvel[idx.dofR])
            armL, armR, tau = torque_fn(armL, armR, qL, qdL, qR, qdR,
                                        tray_pos0,
                                        jnp.asarray(u, jnp.float64))
            data.ctrl[idx.act] = np.asarray(tau)
            data.ctrl[idx.grip_act] = 255.0
            mujoco.mj_step(model, data)
            tilts.append(tilt_xy(data))
        return np.asarray(tilts), armL, armR

    # settle to the rest sag
    _, armL, armR = run(lambda t: np.zeros(2), int(settle_s / dt),
                        armL, armR)
    sag = tilt_xy(data).copy()

    rows = []
    for A in amps:
        hp = half_period_s
        T = 2 * hp * cycles

        def u_of_t(t, A=A):
            u = np.zeros(2)
            u[axis] = A if int(t / hp) % 2 == 0 else -A
            return u

        tilts, armL, armR = run(u_of_t, int(T / dt), armL, armR)
        # realised amplitude about the running mean, excited component,
        # using the last 2 cycles (first cycle carries the transient)
        x = tilts[int(2 * hp / dt):, axis]
        amp_real = 0.5 * (np.percentile(x, 98) - np.percentile(x, 2))
        rows.append({"amp_cmd": A,
                     "amp_realised": round(float(amp_real), 6),
                     "ratio": round(float(amp_real / A), 4),
                     "sag_at_start": [round(float(s), 5) for s in sag]})
        print(json.dumps(rows[-1]), flush=True)
        # re-settle between amplitudes
        _, armL, armR = run(lambda t: np.zeros(2), int(1.0 / dt),
                            armL, armR)
    return rows, sag


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/mujoco/tilt_smallsignal.json")
    ap.add_argument("--amps", nargs="+", type=float,
                    default=[0.001, 0.002, 0.005, 0.01, 0.02, 0.05, 0.1])
    ap.add_argument("--axis", type=int, default=0, choices=[0, 1])
    ap.add_argument("--mass", type=float, default=1.0)
    args = ap.parse_args()
    rows, sag = measure(args.amps, axis=args.axis, mass=args.mass)
    out = {"method": "square-wave tilt commands through the full arm "
                     "stack, 1 s half-period, realised amplitude from the "
                     "last 2 of 3 cycles (98-2 percentile band /2)",
           "axis": args.axis, "mass": args.mass,
           "rest_sag_tilt": [round(float(s), 5) for s in sag],
           "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
