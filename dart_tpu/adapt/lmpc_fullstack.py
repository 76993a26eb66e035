"""LMPC PPO training against the FULL physics stack.

`adapt.lmpc_trainer` trains the 34-parameter tuner against the lmpc-model
plant (fast, the reference's effective setting since its MuJoCo world and
learned model share structure). This module closes the fidelity gap: the
environment plant is the complete dual-arm world of `rollout.full_stack`
(impedance QPs, chain dynamics, rigid-grasp tray, contact object), with
domain randomisation over the *physical* scene parameters (shape rolling
factors, mass, friction — the MjSpec-recompile analog, `run.py:204-241`)
instead of the 34-vector.

One env step = one MPC control period = `substeps` x 2 ms world steps.
Everything stays jit/vmap-safe; the PPO update is reused from `adapt.ppo`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from dart_tpu.adapt import ppo as ppo_mod
from dart_tpu.adapt.lmpc_trainer import (BASE_OBS_DIM, HISTORY_LEN, N_PARAMS,
                                         sample_target)
from dart_tpu.control import mpc as mpc_mod
from dart_tpu.physics import tray_object as to_mod
from dart_tpu.rollout import full_stack as fs


class FSEnvConfig(NamedTuple):
    dt: float = 0.002               # world step (2 ms)
    substeps: int = 5               # world steps per control period
    qp_iters: int = 20              # arm ADMM iterations per world step
    max_episode_steps: int = 256    # control periods per episode
    param_update_every: int = 8
    act_cfg: ppo_mod.ParamActionConfig = ppo_mod.ParamActionConfig()
    rew_cfg: ppo_mod.RewardConfig = ppo_mod.RewardConfig()
    # Domain-randomisation shape distribution (cube, cylinder, sphere).
    # r5 hold curriculum: spheres are the marginal post-convergence lanes
    # (no friction braking on either axis), so the retrain oversamples
    # them — pass e.g. (0.25, 0.25, 0.5).
    shape_probs: tuple = (1 / 3, 1 / 3, 1 / 3)


class FSEnvState(NamedTuple):
    world: Any                      # fs.FullState
    ctrl_carry: Any                 # LMPCCarry
    current_k: jnp.ndarray
    welford: ppo_mod.WelfordState
    history: jnp.ndarray
    prev_control: jnp.ndarray
    time_penalty: jnp.ndarray
    episode_step: jnp.ndarray
    target: jnp.ndarray             # (8,)
    obj_params: to_mod.TrayObjectParams
    rng: jnp.ndarray


def sample_obj_params(rng, dtype=jnp.float32,
                      shape_probs=(1 / 3, 1 / 3, 1 / 3)
                      ) -> to_mod.TrayObjectParams:
    """Randomise shape/mass/friction over the 18-config envelope.

    r4: carries the MuJoCo-calibrated per-shape contact dissipation
    (CALIBRATED_ROLL_RESIST / CALIBRATED_SLIDE_DAMP) so the policy trains
    on the same contact physics the calibrated evaluation plant applies
    (VERDICT r3 next-9: the r3 checkpoint predated the re-baseline and
    evaluated 9.2 mm mean settled SSE on a plant it never saw). The lag
    fields are inert here — the full stack realises tray tilt through the
    simulated arms, `rollout.full_stack.step`."""
    k1, k2, k3 = jax.random.split(rng, 3)
    kappa_table = jnp.asarray([[0.0, 0.0], [2.0, 0.0], [2.5, 2.5]], dtype)
    topple_table = jnp.asarray([[1.0, 1.0], [0.0, 1.0], [0.0, 0.0]], dtype)
    rr_tab = jnp.asarray([to_mod.CALIBRATED_ROLL_RESIST[s]
                          for s in to_mod.SHAPES], dtype)
    sd_tab = jnp.asarray([to_mod.CALIBRATED_SLIDE_DAMP[s]
                          for s in to_mod.SHAPES], dtype)
    shape = jax.random.choice(k1, 3,
                              p=jnp.asarray(shape_probs, jnp.float32))
    mu = jax.random.choice(k3, jnp.asarray([0.05, 0.1, 0.2], dtype))
    return to_mod.TrayObjectParams(
        mass=jax.random.choice(k2, jnp.asarray([1.0, 2.0, 3.0], dtype)),
        mu=mu,
        kappa_inv=kappa_table[shape],
        slip_eps=jnp.asarray(2e-3, dtype),
        omega_n=jnp.asarray(40.0, dtype),
        zeta=jnp.asarray(1.0, dtype),
        tray_pos=jnp.asarray([0.0, 0.0, 0.4], dtype),
        half_w=jnp.asarray([0.025, 0.025], dtype),
        h_com=jnp.asarray(0.025, dtype),
        topple_on=topple_table[shape],
        roll_resist=rr_tab[shape],
        slide_damp=to_mod.calibrated_slide_damp(sd_tab[shape], mu, dtype),
        roll_stick=to_mod.calibrated_roll_stick(kappa_table[shape], mu,
                                                dtype),
        stick_vel=jnp.asarray(5e-3, dtype))


def env_init(rng, ctlr: mpc_mod.LMPC, cfg: FSEnvConfig) -> FSEnvState:
    dtype = jnp.result_type(float)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    init_k = jax.random.uniform(k3, (N_PARAMS,), minval=cfg.act_cfg.min_k,
                                maxval=cfg.act_cfg.k_max / 2)
    return FSEnvState(
        world=fs.init_full_state(dtype),
        ctrl_carry=ctlr.init_carry(dtype),
        current_k=init_k.astype(dtype),
        welford=ppo_mod.welford_init(BASE_OBS_DIM, dtype),
        history=jnp.zeros((HISTORY_LEN, BASE_OBS_DIM), dtype),
        prev_control=jnp.zeros(2, dtype),
        time_penalty=jnp.zeros((), dtype),
        episode_step=jnp.zeros((), jnp.int32),
        target=sample_target(k1).astype(dtype),
        obj_params=sample_obj_params(k2, dtype, cfg.shape_probs),
        rng=k4)


def env_step(policy_params, model, ctlr: mpc_mod.LMPC,
             scene: fs.DualArmScene, s: FSEnvState, cfg: FSEnvConfig):
    rng, k_act, k_tgt, k_obj = jax.random.split(s.rng, 4)
    x = fs.observe_object_8(s.world, s.obj_params)

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

    def world_sub(world, _):
        return fs.full_step(scene, world, u_applied, s.obj_params, cfg.dt,
                            qp_iters=cfg.qp_iters), None

    world, _ = jax.lax.scan(world_sub, s.world, None, length=cfg.substeps)

    x_next = fs.observe_object_8(world, s.obj_params)
    in_contact = jnp.where(to_mod.contact_lost(world.obj), 0.0, 1.0)
    reward, oob = ppo_mod.shaped_reward(
        x_next, s.target, u, s.prev_control, jnp.linalg.norm(delta_z),
        s.time_penalty, in_contact, cfg.rew_cfg)
    episode_step = s.episode_step + 1
    done = oob | (episode_step >= cfg.max_episode_steps)

    def reset_state():
        dtype = x.dtype
        return FSEnvState(
            world=fs.init_full_state(dtype),
            ctrl_carry=ctlr.init_carry(dtype),
            current_k=current_k, welford=welford,
            history=jnp.zeros_like(history),
            prev_control=jnp.zeros(2, dtype),
            time_penalty=jnp.zeros((), dtype),
            episode_step=jnp.zeros((), jnp.int32),
            target=sample_target(k_tgt).astype(dtype),
            obj_params=sample_obj_params(k_obj, dtype,
                                         cfg.shape_probs),
            rng=rng)

    def cont_state():
        return FSEnvState(
            world=world, ctrl_carry=carry, current_k=current_k,
            welford=welford, history=history, prev_control=u,
            time_penalty=s.time_penalty + cfg.rew_cfg.time_penalty_rate,
            episode_step=episode_step, target=s.target,
            obj_params=s.obj_params, rng=rng)

    s_next = jax.lax.cond(done, reset_state, cont_state)
    from dart_tpu.adapt.lmpc_trainer import Transition
    return s_next, Transition(obs=obs, action=raw_action, logp=logp,
                              value=value, reward=reward,
                              done=done.astype(jnp.float32))


def make_train_step(model, ctlr: mpc_mod.LMPC, scene: fs.DualArmScene,
                    env_cfg: FSEnvConfig, ppo_cfg: ppo_mod.PPOConfig,
                    rollout_len: int, axis_name: str | None = None,
                    replay: bool = False):
    """With ``replay=True`` the step implements the reference's dual-buffer
    update (`rlmpc2.py:822-874`) — see `lmpc_trainer.make_train_step`."""
    from dart_tpu.adapt.lmpc_trainer import TrainState
    tx = ppo_mod.make_optimizer(ppo_cfg)

    def collect(params, s):
        def step(s, _):
            return env_step(params, model, ctlr, scene, s, env_cfg)

        s, traj = jax.lax.scan(step, s, None, length=rollout_len)
        x = fs.observe_object_8(s.world, s.obj_params)
        base = jnp.concatenate([x, s.target, s.prev_control, s.current_k])
        norm = ppo_mod.welford_normalize(s.welford, base)
        history = jnp.concatenate([s.history[1:], norm[None]], axis=0)
        _, _, last_value = model.apply(params, history.reshape(-1))
        return s, traj, last_value

    def train_core(ts: TrainState, env_states, buf):
        rng, k_up, k_sub, k_glob = jax.random.split(ts.rng, 4)
        env_states, traj, last_values = jax.vmap(
            lambda s: collect(ts.params, s))(env_states)
        adv = jax.vmap(lambda t, lv: ppo_mod.compute_gae(
            t.reward, t.value, t.done, lv, ppo_cfg.gamma,
            ppo_cfg.gae_lambda))(traj, last_values)
        returns = adv + traj.value
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        batch = ppo_mod.Batch(obs=flat(traj.obs), actions=flat(traj.action),
                              logps=flat(traj.logp), advantages=flat(adv),
                              returns=flat(returns))
        params, opt_state, stats = ppo_mod.ppo_update(
            ts.params, ts.opt_state, model, tx, batch, ppo_cfg, k_up,
            axis_name=axis_name)
        stats = {"mean_reward": traj.reward.mean(),
                 **dict(zip(("policy_loss", "value_loss", "entropy"), stats))}
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
            ts, env_states, _, stats = train_core(ts, env_states, None)
            return ts, env_states, stats

    return train_step, tx
