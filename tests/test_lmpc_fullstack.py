"""PPO training against the full physics stack compiles and runs: MPC solve
and the complete dual-arm world (impedance QPs + chain dynamics + contact)
inside every env step of the jitted collect->GAE->update program."""

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.adapt import lmpc_fullstack as fst
from dart_tpu.adapt import lmpc_trainer as trainer
from dart_tpu.adapt import ppo as ppo_mod
from dart_tpu.control import mpc as mpc_mod
from dart_tpu.rollout import full_stack as fs


def test_fullstack_train_step_smoke():
    ctlr = mpc_mod.LMPC(N=4, dt=0.01,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=2, n_alphas=4))
    scene = fs.make_scene(dt=0.002, dtype=jnp.float64)
    env_cfg = fst.FSEnvConfig(substeps=2, qp_iters=8, max_episode_steps=32)
    ppo_cfg = ppo_mod.PPOConfig(epochs=1, minibatch_size=4)
    model = ppo_mod.ActorCritic(act_dim=fst.N_PARAMS, hidden_size=16,
                                hidden_layers=1)
    train_step, tx = fst.make_train_step(model, ctlr, scene, env_cfg,
                                         ppo_cfg, rollout_len=4)
    ts = trainer.init_train_state(jax.random.PRNGKey(0), model, tx)
    env_states = jax.vmap(lambda r: fst.env_init(r, ctlr, env_cfg))(
        jax.random.split(jax.random.PRNGKey(1), 2))
    ts2, env2, stats = jax.jit(train_step)(ts, env_states)
    assert np.isfinite(float(stats["mean_reward"]))
    assert bool(jnp.all(jnp.isfinite(env2.world.qL)))
    assert bool(jnp.all(jnp.isfinite(env2.world.obj.p)))
    # params moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     ts.params, ts2.params))
    assert delta > 0.0
