"""Validate the high-mu PMPC weight schedule + RMPC anti-stiction integrator
against MuJoCo."""
import sys; sys.path.insert(0, "/root/repo")
import json, time
import jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np
from dart_tpu.physics import mujoco_bridge as MB

LANES = [
    ("pmpc", "cylinder", 1.0, 0.2),
    ("pmpc", "cylinder", 2.0, 0.2),
    ("pmpc", "cube", 1.0, 0.05),      # low-mu regression check (schedule off)
    ("rmpc", "cylinder", 1.0, 0.2),
    ("rmpc", "cylinder", 2.0, 0.2),
    ("rmpc", "cube", 2.0, 0.2),       # was converging at 14s — must not break
    ("rmpc", "sphere", 1.0, 0.2),     # wobbly lane — integrator must not hunt
    ("rmpc", "cube", 1.0, 0.05),      # low-mu regression check
]
TARGET = (0.10, 0.05)
torque_fn = MB.make_torque_fn(dt=0.002)
rows = []
for ctl, shape, mass, mu in LANES:
    model, data = MB.make_world(shape, mass=mass, mu=mu)
    if ctl == "pmpc":
        solve, carry, obs = MB.pmpc_solve_fn(shape=shape, mu=mu, dt=0.002)
    else:
        idx = MB.index_world(model)
        solve, carry, obs = MB.rmpc_solve_fn(dt=0.002, state0=MB.observe4(data, idx))
    t0 = time.time()
    out = MB.run_closed_loop(model, data, solve, carry, obs, TARGET,
                             n_steps=int(30/0.002), control_every=5,
                             torque_fn=torque_fn, stop_on_converge=False)
    errs = out["errs"]
    ca = out["converged_at"]
    post_max = float(errs[ca:].max()) if ca is not None else None
    row = dict(ctl=ctl, shape=shape, mass=mass, mu=mu,
               converged=out["metrics"]["converged"],
               conv_t=out["metrics"]["convergence_time"],
               final_mm=round(1e3*float(errs[-1]),2),
               post_conv_max_mm=round(1e3*post_max,2) if post_max is not None else None,
               effort=round(out["metrics"]["control_effort"],2),
               wall=round(time.time()-t0,1))
    rows.append(row); print(json.dumps(row), flush=True)
json.dump(rows, open("artifacts/probe/probe_fixes.json","w"), indent=1)
