"""Render top-down videos of MuJoCo-in-the-loop episodes (one per
controller) to artifacts/videos/mujoco_{pmpc,rmpc,lmpc}.mp4.

No GL backend exists in this environment (MuJoCo's own renderer needs
EGL/OSMesa), so the logged trajectories are rasterised with the same
top-down tray view the preview CLI uses — object path, commanded tilt,
target ring.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dart_tpu.io.video import save_episode_video  # noqa: E402
from dart_tpu.physics import mujoco_bridge as MB  # noqa: E402

TARGET = (0.10, 0.05)


def episode(controller):
    if controller == "pmpc":
        model, data = MB.make_world("cube", mass=1.0, mu=0.1)
        solve, carry, obs = MB.pmpc_solve_fn(shape="cube", mu=0.1, dt=0.01)
    elif controller == "rmpc":
        model, data = MB.make_world("cylinder", mass=2.0, mu=0.2)
        idx = MB.index_world(model)
        solve, carry, obs = MB.rmpc_solve_fn(dt=0.01,
                                             state0=MB.observe4(data, idx))
    else:
        from dart_tpu.adapt import lmpc_trainer as trainer
        from dart_tpu.adapt import ppo as ppo_mod
        from dart_tpu.io import checkpoint as ckpt

        net = ppo_mod.ActorCritic(act_dim=trainer.N_PARAMS)
        tx = ppo_mod.make_optimizer(ppo_mod.PPOConfig())
        ts = trainer.init_train_state(jax.random.PRNGKey(0), net, tx)
        restored = ckpt.load_agent(
            "artifacts/lmpc/fullstack", "best_agent",
            template={"params": ts.params, "opt_state": ts.opt_state,
                      "episode": np.asarray(0), "return": np.asarray(0.0)})
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                              restored["params"])
        model, data = MB.make_world("cube", mass=2.0, mu=0.05)
        solve, carry, obs = MB.lmpc_solve_fn(params, net, N=8, dt=0.01)
    out = MB.run_closed_loop(model, data, solve, carry, obs, TARGET,
                             n_steps=7500, control_every=5,
                             stop_on_converge=False)
    return out


def main():
    for ctrl in ("pmpc", "rmpc", "lmpc"):
        out = episode(ctrl)
        # tray-frame-ish positions for the top-down view
        ps = out["ps"][:, :2] - np.array([0.0, 0.0])
        n = save_episode_video(f"artifacts/videos/mujoco_{ctrl}.mp4",
                               ps, out["us"], out["target_w"], every=25)
        m = out["metrics"]
        print(f"{ctrl}: {n} frames, converged={m['converged']}, "
              f"t={m['convergence_time']:.2f}s, "
              f"sse={m['steady_state_error']*1e3:.1f}mm", flush=True)


if __name__ == "__main__":
    main()
