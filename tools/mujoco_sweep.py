"""18-config grid on the REAL MuJoCo reference world.

The ground-truth metric table (VERDICT r1 item 1b): run dart_tpu's PMPC /
RMPC closed loop against `mj_step` on the reference's own world XML over the
evaluation grid {cube, cylinder, sphere} x {1, 2 kg} x {mu 0.05, 0.1, 0.2}
(`README.md:101-105`), recording steady-state error / convergence time /
control effort (`PMPC/src/logger.py:154-176` definitions).

Runs on CPU (MuJoCo is host-side; the jitted controllers are small). Writes
artifacts/mujoco/<controller>_grid.json.

Usage: python tools/mujoco_sweep.py --controller pmpc [--runtime 10]
"""

import argparse
import json
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from dart_tpu.physics import mujoco_bridge as MB  # noqa: E402

SHAPES = ["cube", "cylinder", "sphere"]
MASSES = [1.0, 2.0]
MUS = [0.05, 0.1, 0.2]
TARGET = (0.10, 0.05)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--controller", choices=["pmpc", "rmpc", "lmpc"],
                    default="pmpc")
    ap.add_argument("--checkpoint_dir", default="artifacts/lmpc/fullstack",
                    help="lmpc only: trained 34-param tuner policy")
    ap.add_argument("--mpc_horizon", type=int, default=8,
                    help="lmpc only: must match the checkpoint's training "
                         "horizon")
    ap.add_argument("--runtime", type=float, default=15.0,
                    help="sim seconds per episode; episodes run PAST first "
                         "convergence (VERDICT r2 next-4) so the recorded "
                         "SSE is SETTLED, not stop-at-first-crossing")
    ap.add_argument("--control_every", type=int, default=5,
                    help="MPC period in 2 ms steps (5 = the reference's "
                         "~100 Hz parallel solve rate)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    runtime = args.runtime
    n_steps = int(runtime / 0.002)
    ctrl_dt = 0.002 * args.control_every

    policy = None
    if args.controller == "lmpc":
        import jax.numpy as jnp

        from dart_tpu.adapt import lmpc_trainer as trainer
        from dart_tpu.adapt import ppo as ppo_mod
        from dart_tpu.io import checkpoint as ckpt
        import numpy as _np

        net = ppo_mod.ActorCritic(act_dim=trainer.N_PARAMS)
        tx = ppo_mod.make_optimizer(ppo_mod.PPOConfig())
        ts = trainer.init_train_state(jax.random.PRNGKey(0), net, tx)
        restored = ckpt.load_agent(
            args.checkpoint_dir, "best_agent",
            template={"params": ts.params, "opt_state": ts.opt_state,
                      "episode": _np.asarray(0), "return": _np.asarray(0.0)})
        assert restored is not None, args.checkpoint_dir
        policy = (jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                               restored["params"]), net)

    torque_fn = MB.make_torque_fn(dt=0.002)
    rows = []
    t_all = time.time()
    for shape in SHAPES:
        for mass in MASSES:
            for mu in MUS:
                model, data = MB.make_world(shape, mass=mass, mu=mu)
                # Controller discretization: the REFERENCE's Ts = sim
                # timestep for PMPC/RMPC (`main_parallel.py:108`,
                # `rob_ctrl.py:280`); LMPC keeps the checkpoint's training
                # discretization (10 ms, N=8-12 — compile-budget trade).
                if args.controller == "pmpc":
                    solve, carry, obs = MB.pmpc_solve_fn(shape=shape, mu=mu,
                                                         dt=0.002)
                elif args.controller == "lmpc":
                    solve, carry, obs = MB.lmpc_solve_fn(
                        policy[0], policy[1], N=args.mpc_horizon, dt=ctrl_dt)
                else:
                    idx = MB.index_world(model)
                    solve, carry, obs = MB.rmpc_solve_fn(
                        dt=0.002, state0=MB.observe4(data, idx))
                t0 = time.time()
                out = MB.run_closed_loop(
                    model, data, solve, carry, obs, TARGET,
                    n_steps=n_steps, control_every=args.control_every,
                    torque_fn=torque_fn, stop_on_converge=False)
                m = out["metrics"]
                errs = out["errs"]
                ca = out["converged_at"]
                post_max = float(errs[ca:].max()) if ca is not None else None
                row = {"shape": shape, "mass": mass, "mu": mu, **m,
                       "settled_sse_mm": round(1e3 * float(errs[-1]), 2),
                       "post_conv_max_mm": (round(1e3 * post_max, 2)
                                            if post_max is not None else None),
                       "wall_s": round(time.time() - t0, 1)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    n_conv = sum(r["converged"] for r in rows)
    summary = {
        "controller": args.controller,
        "plant": "mujoco (reference world_general.xml, rewritten per config)",
        "target": TARGET, "tol": 0.01, "control_every": args.control_every,
        "runtime_s": runtime, "stop_on_converge": False,
        "success": f"{n_conv}/{len(rows)}",
        "mean_sse_mm": round(1e3 * float(np.mean(
            [r["steady_state_error"] for r in rows])), 2),
        "mean_settled_sse_mm": round(float(np.mean(
            [r["settled_sse_mm"] for r in rows])), 2),
        "mean_conv_time_s": round(float(np.mean(
            [r["convergence_time"] for r in rows if r["converged"]])), 2)
        if n_conv else None,
        "mean_effort": round(float(np.mean(
            [r["control_effort"] for r in rows])), 3),
        "wall_total_s": round(time.time() - t_all, 1),
        "rows": rows,
    }
    out_path = Path(args.out or
                    f"artifacts/mujoco/{args.controller}_grid.json")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(summary, indent=1))
    print(f"[mujoco_sweep] {args.controller}: {summary['success']} success, "
          f"mean SSE {summary['mean_sse_mm']} mm -> {out_path}")


if __name__ == "__main__":
    main()
