"""Probe the failing mu=0.2 lanes at the reference's 30 s envelope."""
import sys; sys.path.insert(0, "/root/repo")
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from dart_tpu.physics import mujoco_bridge as MB

LANES = [
    ("pmpc", "cube", 2.0), ("pmpc", "cylinder", 1.0), ("pmpc", "cylinder", 2.0),
    ("rmpc", "cube", 1.0), ("rmpc", "cylinder", 1.0), ("rmpc", "cylinder", 2.0),
]
RUNTIME = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
TARGET = (0.10, 0.05)
torque_fn = MB.make_torque_fn(dt=0.002)
rows = []
for ctl, shape, mass in LANES:
    model, data = MB.make_world(shape, mass=mass, mu=0.2)
    if ctl == "pmpc":
        solve, carry, obs = MB.pmpc_solve_fn(shape=shape, mu=0.2, dt=0.002)
    else:
        idx = MB.index_world(model)
        solve, carry, obs = MB.rmpc_solve_fn(dt=0.002, state0=MB.observe4(data, idx))
    t0 = time.time()
    out = MB.run_closed_loop(model, data, solve, carry, obs, TARGET,
                             n_steps=int(RUNTIME / 0.002), control_every=5,
                             torque_fn=torque_fn, stop_on_converge=False)
    errs = out["errs"]
    row = dict(ctl=ctl, shape=shape, mass=mass, runtime=RUNTIME,
               converged=out["metrics"]["converged"],
               conv_t=out["metrics"]["convergence_time"],
               final_mm=round(1e3 * float(errs[-1]), 2),
               min_mm=round(1e3 * float(errs.min()), 2),
               err_5s=round(1e3 * float(errs[int(5/0.002)-1]), 2),
               err_15s=round(1e3 * float(errs[int(15/0.002)-1]), 2),
               wall=round(time.time()-t0, 1))
    rows.append(row)
    print(json.dumps(row), flush=True)
json.dump(rows, open("artifacts/probe/mu02_30s.json", "w"), indent=1)
