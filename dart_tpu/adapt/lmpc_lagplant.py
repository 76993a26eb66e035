"""LMPC PPO training on the CALIBRATED tray-lag plant (r5).

`adapt.lmpc_fullstack` trains the 34-parameter tuner on the full dual-arm
world; this module trains it on `physics.tray_object`'s calibrated lag
plant — the EXACT plant the batched evaluators measure on
(`rollout.evaluate.make_lmpc_evaluator`), including the r5 small-signal
arm-stack backlash. Motivation (r5): the full-stack-trained policy holds
rolling objects in a bounded limit cycle on the full stack, but the
reduced plant's harsher backlash nonlinearity ejects the marginal y-axis
loop — a policy must experience the deployment plant's small-signal
regime to stabilise it, exactly as the reference's policy is trained in
the same MuJoCo world it is evaluated in (`run.py:160-311`).

One env step = one MPC control period = `substeps` x 2 ms plant steps.
Everything is jit/vmap-safe; PPO machinery reused from `adapt.ppo`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dart_tpu.adapt import ppo as ppo_mod
from dart_tpu.adapt.lmpc_trainer import (BASE_OBS_DIM, HISTORY_LEN, N_PARAMS,
                                         Transition, sample_target)
from dart_tpu.control import mpc as mpc_mod
from dart_tpu.physics import tray_object as to_mod


class LagEnvConfig(NamedTuple):
    dt: float = 0.002               # plant step (2 ms)
    substeps: int = 5               # plant steps per control period
    max_episode_steps: int = 768    # control periods (hold curriculum)
    param_update_every: int = 8
    act_cfg: ppo_mod.ParamActionConfig = ppo_mod.ParamActionConfig()
    rew_cfg: ppo_mod.RewardConfig = ppo_mod.RewardConfig()


class LagEnvState(NamedTuple):
    plant: to_mod.TrayObjectState
    ctrl_carry: object
    current_k: jnp.ndarray
    welford: ppo_mod.WelfordState
    history: jnp.ndarray
    prev_control: jnp.ndarray
    time_penalty: jnp.ndarray
    episode_step: jnp.ndarray
    target: jnp.ndarray             # (8,)
    obj_params: to_mod.TrayObjectParams
    rng: jnp.ndarray


def sample_obj_params(rng, dtype=jnp.float32) -> to_mod.TrayObjectParams:
    """Randomise shape/mass/friction over the 18-config envelope on the
    FULLY CALIBRATED plant (mass-resolved lag, per-shape dissipation,
    mu-resolved damping, small-signal backlash) — identical to what
    `rollout.evaluate._tray_params` builds for the sweeps."""
    from dart_tpu.rollout.evaluate import _tray_params

    k1, k2, k3 = jax.random.split(rng, 3)
    kappa_table = jnp.asarray([[0.0, 0.0], [2.0, 0.0], [2.5, 2.5]], dtype)
    shape = jax.random.randint(k1, (), 0, 3)
    mass = jax.random.choice(k2, jnp.asarray([1.0, 2.0, 3.0], dtype))
    mu = jax.random.choice(k3, jnp.asarray([0.05, 0.1, 0.2], dtype))
    return _tray_params(kappa_table[shape], mass, mu, dtype)


def observe8(plant: to_mod.TrayObjectState,
             obj_params: to_mod.TrayObjectParams) -> jnp.ndarray:
    """World-frame LMPC 8-state, same layout/signs as the evaluator."""
    pos, vel = to_mod.observe_world(plant, obj_params)
    th, thd = plant.theta, plant.theta_dot
    return jnp.stack([pos[0], vel[0], pos[1], vel[1],
                      th[1], thd[1], -th[0], -thd[0]])


def env_init(rng, ctlr: mpc_mod.LMPC, cfg: LagEnvConfig) -> LagEnvState:
    dtype = jnp.result_type(float)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    init_k = jax.random.uniform(k3, (N_PARAMS,), minval=cfg.act_cfg.min_k,
                                maxval=cfg.act_cfg.k_max / 2)
    return LagEnvState(
        plant=to_mod.init_state(dtype=dtype),
        ctrl_carry=ctlr.init_carry(dtype),
        current_k=init_k.astype(dtype),
        welford=ppo_mod.welford_init(BASE_OBS_DIM, dtype),
        history=jnp.zeros((HISTORY_LEN, BASE_OBS_DIM), dtype),
        prev_control=jnp.zeros(2, dtype),
        time_penalty=jnp.zeros((), dtype),
        episode_step=jnp.zeros((), jnp.int32),
        target=sample_target(k1).astype(dtype),
        obj_params=sample_obj_params(k2, dtype),
        rng=k4)


def env_step(policy_params, model, ctlr: mpc_mod.LMPC, s: LagEnvState,
             cfg: LagEnvConfig):
    rng, k_act, k_tgt, k_obj = jax.random.split(s.rng, 4)
    x = observe8(s.plant, s.obj_params)

    base = jnp.concatenate([x, s.target, s.prev_control, s.current_k])
    welford = ppo_mod.welford_update(s.welford, base)
    norm = ppo_mod.welford_normalize(welford, base)
    history = jnp.concatenate([s.history[1:], norm[None]], axis=0)
    obs = history.reshape(-1)

    mean, std, value = model.apply(policy_params, obs)
    raw_action = mean + std * jax.random.normal(k_act, mean.shape)
    logp = ppo_mod.normal_logp(raw_action, mean, std)
    delta_z = raw_action * (cfg.act_cfg.max_delta * cfg.act_cfg.action_scale)
    do_update = (s.episode_step % cfg.param_update_every) == 0
    k_new = ppo_mod.apply_param_action(s.current_k, raw_action, cfg.act_cfg)
    current_k = jnp.where(do_update, k_new, s.current_k)

    carry, u, _ = ctlr.solve(s.ctrl_carry, x, s.target, current_k)
    u_applied = -u  # model +g vs tray -g sign convention (run.py:257)

    def plant_sub(p, _):
        return to_mod.step(p, u_applied, s.obj_params, cfg.dt), None

    plant, _ = jax.lax.scan(plant_sub, s.plant, None, length=cfg.substeps)

    x_next = observe8(plant, s.obj_params)
    in_contact = jnp.where(to_mod.contact_lost(plant), 0.0, 1.0)
    reward, oob = ppo_mod.shaped_reward(
        x_next, s.target, u, s.prev_control, jnp.linalg.norm(delta_z),
        s.time_penalty, in_contact, cfg.rew_cfg)
    episode_step = s.episode_step + 1
    done = oob | (episode_step >= cfg.max_episode_steps)

    def reset_state():
        dtype = x.dtype
        return LagEnvState(
            plant=to_mod.init_state(dtype=dtype),
            ctrl_carry=ctlr.init_carry(dtype),
            current_k=current_k, welford=welford,
            history=jnp.zeros_like(history),
            prev_control=jnp.zeros(2, dtype),
            time_penalty=jnp.zeros((), dtype),
            episode_step=jnp.zeros((), jnp.int32),
            target=sample_target(k_tgt).astype(dtype),
            obj_params=sample_obj_params(k_obj, dtype),
            rng=rng)

    def cont_state():
        return LagEnvState(
            plant=plant, ctrl_carry=carry, current_k=current_k,
            welford=welford, history=history, prev_control=u,
            time_penalty=s.time_penalty + cfg.rew_cfg.time_penalty_rate,
            episode_step=episode_step, target=s.target,
            obj_params=s.obj_params, rng=rng)

    s_next = jax.lax.cond(done, reset_state, cont_state)
    return s_next, Transition(obs=obs, action=raw_action, logp=logp,
                              value=value, reward=reward,
                              done=done.astype(jnp.float32))


def make_train_step(model, ctlr: mpc_mod.LMPC, env_cfg: LagEnvConfig,
                    ppo_cfg: ppo_mod.PPOConfig, rollout_len: int,
                    axis_name: str | None = None, replay: bool = False):
    """Same shape as `lmpc_fullstack.make_train_step` (dual-buffer replay
    supported) with the lag-plant env."""
    from dart_tpu.adapt.lmpc_trainer import TrainState
    tx = ppo_mod.make_optimizer(ppo_cfg)

    def collect(params, s):
        def step(s, _):
            s2, tr = env_step(params, model, ctlr, s, env_cfg)
            return s2, tr

        s, traj = jax.lax.scan(step, s, None, length=rollout_len)
        x = observe8(s.plant, s.obj_params)
        base = jnp.concatenate([x, s.target, s.prev_control, s.current_k])
        norm = ppo_mod.welford_normalize(s.welford, base)
        hist = jnp.concatenate([s.history[1:], norm[None]], axis=0)
        _, _, last_value = model.apply(params, hist.reshape(-1))
        return s, traj, last_value

    def train_core(ts, env_states, buf):
        rng, k_up, k_sub, k_glob = jax.random.split(ts.rng, 4)
        env_states, traj, last_values = jax.vmap(
            lambda s: collect(ts.params, s))(env_states)
        adv = jax.vmap(lambda t, lv: ppo_mod.compute_gae(
            t.reward, t.value, t.done, lv, ppo_cfg.gamma,
            ppo_cfg.gae_lambda))(traj, last_values)
        returns = adv + traj.value
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        batch = ppo_mod.Batch(obs=flat(traj.obs), actions=flat(traj.action),
                              logps=flat(traj.logp), advantages=flat(adv),
                              returns=flat(returns))
        params, opt_state, stats = ppo_mod.ppo_update(
            ts.params, ts.opt_state, model, tx, batch, ppo_cfg, k_up,
            axis_name=axis_name)
        stats = {"mean_reward": traj.reward.mean(), **dict(zip(
            ("policy_loss", "value_loss", "entropy"), stats))}
        if buf is not None:
            buf = ppo_mod.replay_add_subsample(
                buf, flat(traj.obs), flat(traj.action), flat(traj.logp),
                flat(traj.reward), flat(traj.value), flat(traj.done), k_sub)
            params, opt_state, buf, did = ppo_mod.replay_maybe_update(
                params, opt_state, model, tx, buf, ppo_cfg, k_glob,
                axis_name=axis_name)
            stats["global_update"] = did.astype(jnp.float32)
        return TrainState(params, opt_state, rng), env_states, buf, stats

    if replay:
        def train_step(ts, env_states, buf):
            return train_core(ts, env_states, buf)
    else:
        def train_step(ts, env_states):
            ts2, env_states, _, stats = train_core(ts, env_states, None)
            return ts2, env_states, stats

    return train_step, tx
