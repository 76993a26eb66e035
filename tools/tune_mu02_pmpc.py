"""Weight-schedule experiment for the PMPC high-friction cube lanes."""
import sys; sys.path.insert(0, "/root/repo")
import json, time
import jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from dart_tpu.control import mpc as mpc_mod
from dart_tpu.models import dynamics as dyn
from dart_tpu.physics import mujoco_bridge as MB

TARGET = (0.10, 0.05)
torque_fn = MB.make_torque_fn(dt=0.002)

def pmpc_fn_weights(mu, Qp, Qv, R):
    ctlr = mpc_mod.PMPC(N=15, dt=0.002, cfg=mpc_mod.ilqr.ILQRConfig(max_iters=10))
    params = dyn.PMPCParams(mu=jnp.asarray(mu, jnp.float64), dt=0.002)
    weights = mpc_mod.PMPCWeights(jnp.asarray(Qp), jnp.asarray(Qv), jnp.asarray(R))
    @jax.jit
    def solve(carry, obs, target_w):
        target6 = jnp.stack([target_w[0], 0.0, target_w[1], 0.0,
                             jnp.asarray(0.43, jnp.float64), 0.0])
        carry, u, _ = ctlr.solve(carry, obs, target6, params, weights)
        return carry, u
    return solve, ctlr.init_carry(jnp.float64), MB.observe6

CASES = [
    # (mass, Qp, Qv, R)
    (2.0, 900.0, 5.0, 0.05),
    (2.0, 1200.0, 5.0, 0.05),
    (2.0, 600.0, 5.0, 0.033),
    (1.0, 900.0, 5.0, 0.05),   # regression check on the converging lane
]
rows = []
for mass, Qp, Qv, R in CASES:
    model, data = MB.make_world("cube", mass=mass, mu=0.2)
    solve, carry, obs = pmpc_fn_weights(0.2, Qp, Qv, R)
    t0 = time.time()
    out = MB.run_closed_loop(model, data, solve, carry, obs, TARGET,
                             n_steps=int(30/0.002), control_every=5,
                             torque_fn=torque_fn, stop_on_converge=False)
    errs = out["errs"]
    row = dict(mass=mass, Qp=Qp, Qv=Qv, R=R,
               converged=out["metrics"]["converged"],
               conv_t=out["metrics"]["convergence_time"],
               final_mm=round(1e3*float(errs[-1]),2),
               min_mm=round(1e3*float(errs.min()),2),
               effort=round(out["metrics"]["control_effort"],2),
               wall=round(time.time()-t0,1))
    rows.append(row); print(json.dumps(row), flush=True)
json.dump(rows, open("artifacts/probe/tune_mu02_pmpc.json","w"), indent=1)
