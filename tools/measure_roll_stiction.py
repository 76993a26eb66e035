"""Measure the rolling-stiction breakaway cone of the reference contact model.

VERDICT r4 next-3: the pure-JAX `tray_object` plant had no static regime
for rolling objects — any nonzero tilt made cylinders/spheres creep, and
the settled LMPC sweeps recorded meters of "drift" where mj_step holds the
object. MuJoCo's contact model holds a resting roller while the gravity
torque stays inside the rolling-friction cone: tan(tilt) <= c_r / r, with
the reference's rolling coefficient c_r = mu/100 (`LMPC/src/run.py:221-223`)
and contact radius r = 0.025, predicting tan(theta_break) = 0.4 mu.

Measurement: a STATIC incline replicating the reference world's exact
contact spec — same <option> line (implicitfast, noslip_iterations=100,
2 ms timestep), same default solref/solimp (`world_general.xml:83-84`),
same object geoms/masses/friction triples as `mujoco_bridge.make_world` —
with the tray welded at tilt theta. The object is dropped on, settles 1 s,
and the lane counts as HOLDING if it moves <1 mm over the next 2 s.
Bisection over theta gives the breakaway angle per (shape, mu). A first
ramp-through-the-arm-stack attempt was rejected: the impedance-held tray
sags ~0.02 rad at rest and the drop transient trips any displacement
detector, contaminating exactly the small-cone lanes being measured.

    PYTHONPATH=/root/repo python tools/measure_roll_stiction.py \
        --out artifacts/mujoco/roll_stiction.json

The fitted slope calibrates `tray_object.ROLL_STICK_PER_MU`.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

INCLINE_XML = """
<mujoco model="incline">
  <option gravity="0 0 -9.81" integrator="implicitfast"
          noslip_iterations="100" timestep="0.002"/>
  <default>
    <geom rgba="0.7 0.7 0.7 1" solref="0.002 1"
          friction="{mu:.9g} {mu:.9g} {mur:.9g}"
          solimp="0.9 0.95 0.001" contype="1" conaffinity="1"/>
  </default>
  <worldbody>
    <body name="tray" pos="0 0 0.4" quat="{qw:.9g} 0 {qy:.9g} 0">
      <geom name="tray_bottom" type="box" size="0.2 0.15 0.005" mass="1"/>
    </body>
    <body name="obj" pos="{px:.9g} 0 {pz:.9g}" quat="{oq}">
      <freejoint/>
      <geom name="obj_geom" type="{gtype}" size="{gsize}" mass="{mass:.9g}"
            friction="{mu:.9g} {mu:.9g} {mur:.9g}" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""

GEOM = {
    # gtype, size string, rest height above surface, object quat
    "cube": ("box", "0.025 0.025 0.025", 0.025, "1 0 0 0"),
    "cylinder": ("cylinder", "0.025 0.025", 0.025, "0.7071068 0.7071068 0 0"),
    "sphere": ("sphere", "0.025", 0.025, "1 0 0 0"),
}


def lane_holds(shape, mu, theta, mass=1.0, settle_s=1.0, watch_s=2.0,
               hold_tol=0.001):
    """True if the object, placed at rest on a static incline at `theta`,
    moves less than `hold_tol` m (slope frame) over `watch_s` seconds."""
    import mujoco

    gtype, gsize, rest_h, oq = GEOM[shape]
    # object center on the tilted surface, at the tray-frame origin:
    # world pos = tray_pos + R_y(theta) @ [0, 0, 0.005 + rest_h + drop]
    drop = 0.002
    h = 0.005 + rest_h + drop
    px = h * np.sin(theta)
    pz = 0.4 + h * np.cos(theta)
    xml = INCLINE_XML.format(mu=mu, mur=mu / 100.0,
                             qw=np.cos(theta / 2), qy=np.sin(theta / 2),
                             px=px, pz=pz, oq=oq, gtype=gtype, gsize=gsize,
                             mass=mass)
    model = mujoco.MjModel.from_xml_string(xml)
    data = mujoco.MjData(model)
    mujoco.mj_forward(model, data)
    bid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, "obj")
    dt = float(model.opt.timestep)
    for _ in range(int(settle_s / dt)):
        mujoco.mj_step(model, data)
    p0 = data.xpos[bid].copy()
    for _ in range(int(watch_s / dt)):
        mujoco.mj_step(model, data)
    disp = np.linalg.norm(data.xpos[bid] - p0)
    return disp < hold_tol, float(disp)


def breakaway(shape, mu, lo=0.0, hi=0.35, iters=9):
    """Bisect the smallest tilt at which the lane moves."""
    ok_hold, _ = lane_holds(shape, mu, lo if lo > 0 else 1e-4)
    if not ok_hold:
        return 0.0, 0.0
    moved, _ = lane_holds(shape, mu, hi)
    if moved:   # holds even at hi
        return hi, hi
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        holds, _ = lane_holds(shape, mu, mid)
        if holds:
            lo = mid
        else:
            hi = mid
    return lo, hi   # last holding, first moving


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/mujoco/roll_stiction.json")
    ap.add_argument("--shapes", nargs="+",
                    default=["sphere", "cylinder", "cube"])
    ap.add_argument("--mus", nargs="+", type=float,
                    default=[0.05, 0.1, 0.2])
    args = ap.parse_args()

    rows = []
    for shape in args.shapes:
        for mu in args.mus:
            lo, hi = breakaway(shape, mu)
            th = 0.5 * (lo + hi)
            rows.append({"shape": shape, "mu": mu,
                         "theta_hold_rad": round(lo, 5),
                         "theta_move_rad": round(hi, 5),
                         "tan_theta_break": round(float(np.tan(th)), 5),
                         "ratio_tan_to_mu": round(float(np.tan(th)) / mu, 4)})
            print(json.dumps(rows[-1]), flush=True)

    rolling = [r for r in rows if r["shape"] in ("sphere", "cylinder")]
    slope = None
    if rolling:
        # least-squares through origin: tan(theta_break) = slope * mu
        x = np.array([r["mu"] for r in rolling])
        y = np.array([r["tan_theta_break"] for r in rolling])
        slope = float((x @ y) / (x @ x))
    out = {"theory": "tan(theta_break) = (c_r/r) = 0.4 mu "
                     "(c_r = mu/100, r = 0.025)",
           "fitted_slope_rolling": round(slope, 4) if slope else None,
           "method": "static incline bisection, settle 1 s, watch 2 s, "
                     "hold tolerance 1 mm",
           "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}; fitted rolling slope = {slope}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
