"""Fit the small-signal backlash of the tray lag to the measured arm-stack
response (r5; see tools/measure_tilt_smallsignal.py).

Replays the exact measurement protocol (square-wave commands, 1 s
half-period, 3 cycles, amplitude from the last 2 cycles) through
`lag_step` + the backlash-with-compliance element of `tray_object.step`,
and grid-searches (back_w, back_gss) per axis to match the measured
realised-amplitude curve in log space.

    PYTHONPATH=/root/repo python tools/fit_backlash.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

DT = 0.002
HP = 1.0          # half period (s)
CYCLES = 3


_LAG_CACHE = {}


def _lin_trace(A, axis, mass=1.0):
    """theta_lin trace for the square-wave protocol — pure numpy replica
    of `tray_object.lag_step` (exact ZOH two-pole mix), cached per A."""
    key = (A, axis, mass)
    if key in _LAG_CACHE:
        return _LAG_CACHE[key]
    from dart_tpu.physics import tray_object as to_mod

    omega_n, zeta, fast = (float(np.asarray(v)[axis])
                           for v in to_mod.calibrated_lag(mass, np.float64))
    z = max(zeta, 1.0 + 1e-6)
    sdisc = omega_n * np.sqrt(z * z - 1.0)
    l1, l2 = z * omega_n - sdisc, z * omega_n + sdisc
    E1, E2 = np.exp(-l1 * DT), np.exp(-l2 * DT)
    n = int(2 * HP * CYCLES / DT)
    x1 = x2 = 0.0
    th = np.zeros(n)
    for k in range(n):
        u = A if int(k * DT / HP) % 2 == 0 else -A
        x1 = E1 * x1 + (1.0 - fast) * (1.0 - E1) * u
        x2 = E2 * x2 + fast * (1.0 - E2) * u
        th[k] = x1 + x2
    _LAG_CACHE[key] = th
    return th


def sim_amp(A, axis, w, gss, mass=1.0):
    th_lin = _lin_trace(A, axis, mass)
    b = 0.0
    th = np.empty_like(th_lin)
    for k, tl in enumerate(th_lin):
        b = min(max(b, tl - w), tl + w)
        th[k] = b + gss * (tl - b)
    tail = th[int(2 * HP / DT):]
    return 0.5 * (np.percentile(tail, 98) - np.percentile(tail, 2))


def fit_axis(rows, axis, mass=1.0):
    amps = np.array([r["amp_cmd"] for r in rows])
    meas = np.array([r["amp_realised"] for r in rows])

    def loss(w, gss):
        sim = np.array([sim_amp(A, axis, w, gss, mass) for A in amps])
        return float(np.sum((np.log(sim + 1e-7) - np.log(meas + 1e-7)) ** 2))

    best = (None, None, np.inf)
    for w in np.linspace(0.002, 0.03, 15):
        for gss in np.linspace(0.02, 0.3, 15):
            l = loss(w, gss)
            if l < best[2]:
                best = (w, gss, l)
    w0, g0, _ = best
    # local refine
    for w in np.linspace(max(1e-4, w0 - 0.002), w0 + 0.002, 9):
        for gss in np.linspace(max(0.01, g0 - 0.02), g0 + 0.02, 9):
            l = loss(w, gss)
            if l < best[2]:
                best = (w, gss, l)
    w, gss, l = best
    sim = [round(float(sim_amp(A, axis, w, gss, mass)), 6) for A in amps]
    return {"axis": axis, "back_w": round(float(w), 5),
            "back_gss": round(float(gss), 4), "log_loss": round(l, 4),
            "amps": amps.tolist(), "measured": meas.tolist(),
            "fitted": sim}


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    art = os.path.join(REPO, "artifacts", "mujoco")
    out = {"fits": []}
    for axis, fname in ((0, "tilt_smallsignal.json"),
                        (1, "tilt_smallsignal_y.json")):
        path = os.path.join(art, fname)
        if not os.path.exists(path):
            print(f"skip axis {axis}: {path} missing")
            continue
        with open(path) as f:
            rows = json.load(f)["rows"]
        fit = fit_axis(rows, axis)
        out["fits"].append(fit)
        print(json.dumps(fit), flush=True)
    with open(os.path.join(art, "backlash_fit.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/mujoco/backlash_fit.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
