"""IO layer: log schema round-trips, checkpoint save/load, configs,
legacy OPSPACE controller."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.io import config as cfg_mod
from dart_tpu.io import logging as log_mod
from dart_tpu.io import checkpoint as ckpt_mod


def test_episode_log_npz_roundtrip(tmp_path):
    log = log_mod.EpisodeLog()
    T = 50
    t = np.arange(T) * 0.002
    X = np.zeros((T, 6))
    X[:, 0] = np.linspace(0, 0.05, T)
    X[:, 2] = np.linspace(0, -0.04, T)
    U = np.full((T, 2), 0.1)
    log.log_arrays(t=t, X=X, U_cmd=U)
    path = log.save_npz(str(tmp_path), "cube", 1.0, 0.1, (0.05, -0.04))
    assert "cube" in path and "mass=1.0_friction=0.1" in path
    data = np.load(path)
    assert data["X"].shape == (T, 6)
    assert float(data["steady_state_error"]) < 1e-9
    assert np.isfinite(float(data["control_effort"]))


def test_episodic_npy_accumulates(tmp_path):
    f = str(tmp_path / "gen_test" / "cube_1x0_0x1.npy")
    lg = log_mod.EpisodicNpy(f)
    for ep in range(3):
        for k in range(5):
            lg.log("pos_error", 0.1 * (ep + 1) - 0.01 * k)
        lg.save()
    eps = lg.load("pos_error")
    assert len(eps) == 3
    assert len(eps[0]) == 5


def test_json_sanitizer_and_naming(tmp_path):
    ep = {"pos_err": np.array([0.1, np.nan, np.inf]),
          "u_cmd": np.array([[0.1, -0.2]])}
    name = log_mod.episode_json_name("sphere", 1.0, (0.1, 0.1, 0.001),
                                     (0.05, -0.04))
    assert name == "sphere_m1.0_mu0.1-0.1-0.001_tx0.05_ty-0.04.json"
    path = str(tmp_path / name)
    log_mod.save_episodes_json(path, [ep])
    back = log_mod.load_episodes_json(path)
    assert back[0]["pos_err"] == [0.1, None, None]


def test_checkpoint_best_latest(tmp_path):
    d = str(tmp_path / "ck")
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    opt_state = {"m": jnp.zeros((3, 3))}
    mgr = ckpt_mod.CheckpointManager(d)
    mgr.on_episode_end(params, opt_state, 0, 1.0)
    mgr.on_episode_end(jax.tree.map(lambda x: x + 1, params), opt_state, 1, 0.5)
    template = {"params": params, "opt_state": opt_state,
                "episode": np.asarray(0), "return": np.asarray(0.0)}
    best = ckpt_mod.load_agent(d, "best_agent", template)
    latest = ckpt_mod.load_agent(d, "latest_agent", template)
    # best stayed at episode 0 (return 1.0 > 0.5); latest is episode 1
    assert float(best["return"]) == 1.0
    assert int(latest["episode"]) == 1
    assert np.allclose(np.asarray(latest["params"]["w"]), 2.0)
    assert ckpt_mod.load_agent(str(tmp_path / "nope")) is None


def test_config_presets():
    assert set(cfg_mod.PRESETS) == {"cube_precise", "cylinder_fast",
                                    "sphere_gentle", "heavy_object"}
    c = cfg_mod.PRESETS["cube_precise"]
    assert c.tolerance == 0.003
    assert cfg_mod.RMPCConfig().slew_exact is True


def test_opspace_controller_tracks():
    from dart_tpu.control import opspace as op_mod
    from tests.test_arm import _toy_dynamics
    rng = np.random.default_rng(3)
    dyn = _toy_dynamics(rng)
    p = op_mod.OpspaceParams(
        K=jnp.asarray([500.0] * 3 + [50.0] * 3, jnp.float64),
        K_null=jnp.ones(7, jnp.float64),
        q0=jnp.zeros(7, jnp.float64),
        taumin=jnp.asarray([-50, -50, -30, -30, -30, -20, -20], jnp.float64),
        taumax=jnp.asarray([50, 50, 30, 30, 30, 20, 20], jnp.float64))
    carry = op_mod.opspace_init(jnp.float64)
    target = np.asarray(dyn.ee_pos) + np.array([0.02, 0.0, -0.01])
    carry, tau, twist_norm = op_mod.opspace_torque(
        carry, dyn, jnp.asarray(target), dyn.ee_quat, p)
    assert np.all(np.abs(np.asarray(tau)) <= 50.0 + 1e-9)
    assert np.isfinite(float(twist_norm))
    # low-pass: first output is alpha * tau
    carry2, tau2, _ = op_mod.opspace_torque(
        carry, dyn, jnp.asarray(target), dyn.ee_quat, p)
    assert np.all(np.isfinite(np.asarray(tau2)))
