"""End-to-end integration: the complete jitted dual-arm stack.

MPC -> tilt -> DACTL -> 2x impedance QP -> 2x 7-DoF arm dynamics ->
rigid-grasp tray -> object contact -> observation. Acceptance criterion is
the reference's: steady-state position error within 1 cm
(`PMPC/main_parallel.py:64`), with its published accuracy band 1-5 mm
(`PMPC/README.md:264`)."""

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.control import mpc as mpc_mod
from dart_tpu.models import dynamics as dyn
from dart_tpu.physics import tray_object as to_mod
from dart_tpu.rollout import full_stack as fs

DT = 0.002


def test_full_stack_settles_open_loop():
    """u = 0: arms hold the tray almost level, object stays put."""
    scene = fs.make_scene(dt=DT, dtype=jnp.float64)
    obj_params = to_mod.make_params("cube", mass=1.0, mu=0.1,
                                    dtype=jnp.float64)
    st = fs.init_full_state(jnp.float64)
    stepf = jax.jit(lambda s: fs.full_step(scene, s, jnp.zeros(2, jnp.float64),
                                           obj_params, DT, qp_iters=40))
    for _ in range(800):
        st = stepf(st)
    assert float(jnp.max(jnp.abs(st.obj.theta))) < 0.02
    assert float(jnp.max(jnp.abs(st.obj.p))) < 0.005
    assert float(jnp.max(jnp.abs(st.qdL))) < 0.1


def test_full_stack_tilt_command_tracks():
    """A held tilt command is realised by the arms within ~20%."""
    scene = fs.make_scene(dt=DT, dtype=jnp.float64)
    obj_params = to_mod.make_params("cube", mass=1.0, mu=0.2,
                                    dtype=jnp.float64)
    st = fs.init_full_state(jnp.float64)
    step0 = jax.jit(lambda s: fs.full_step(scene, s, jnp.zeros(2, jnp.float64),
                                           obj_params, DT, qp_iters=40))
    for _ in range(600):
        st = step0(st)
    u = jnp.asarray([0.15, 0.0], jnp.float64)
    step1 = jax.jit(lambda s: fs.full_step(scene, s, u, obj_params, DT,
                                           qp_iters=40))
    for _ in range(600):
        st = step1(st)
    assert float(st.obj.theta[0]) > 0.1  # structural (height-difference) axis


def test_full_stack_rmpc_closed_loop():
    """RMPC (RLS + governor + slew-exact solver) through the arm stack."""
    import numpy as np
    scene = fs.make_scene(dt=DT, dtype=jnp.float64)
    obj_params = to_mod.make_params("cube", mass=2.0, mu=0.2,
                                    dtype=jnp.float64)
    ctlr = mpc_mod.RMPC(N=20, dt=DT * 5,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=8, al_iters=3))
    target4 = jnp.asarray([0.05, 0.0, -0.04, 0.0], jnp.float64)

    def solve_fn(c, obs, t):
        return ctlr.solve(c, obs, t)

    carry0 = ctlr.init_carry(jnp.zeros(4, jnp.float64), jnp.float64)
    ps, thetas, us, _ = fs.run_full_stack(
        scene, solve_fn, carry0, fs.init_full_state(jnp.float64), target4,
        obj_params, n_steps=3500, dt=DT, control_every=5, warmup_steps=250,
        qp_iters=40, observe=fs.observe_object_4)
    err = np.linalg.norm(np.asarray(ps) - np.array([0.05, -0.04]), axis=1)
    # The reference convergence tolerance (rob_ctrl.py:324), not a loosened
    # one: 8.2 mm measured, 1.8 mm margin.
    assert err[-1] < 0.01, f"final error {err[-1]:.4f} m"
    # Slew-rate bound holds exactly through the whole loop.
    dU = np.abs(np.diff(np.asarray(us), axis=0)).max()
    assert dU <= 0.05 + 1e-9


def test_full_stack_lmpc_closed_loop():
    """LMPC (34-param model, sign-flip convention of run.py:257)."""
    import numpy as np
    scene = fs.make_scene(dt=DT, dtype=jnp.float64)
    obj_params = to_mod.make_params("cube", mass=1.0, mu=0.1,
                                    dtype=jnp.float64)
    ctlr = mpc_mod.LMPC(N=20, dt=DT * 5,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=8))
    rng = np.random.default_rng(0)
    pvec = jnp.asarray(rng.uniform(0.05, 0.3, size=34), jnp.float64)
    pvec = pvec.at[0].set(1.0).at[1].set(1.0).at[6].set(0.98).at[7].set(0.8) \
        .at[11].set(0.98).at[12].set(0.8).at[4].set(0.0).at[5].set(0.0) \
        .at[9].set(0.05).at[14].set(0.05).at[10].set(0.01).at[15].set(0.01)
    target8 = jnp.zeros(8, jnp.float64).at[0].set(0.05).at[2].set(-0.04)

    def solve_fn(c, obs, t):
        c2, u, d = ctlr.solve(c, obs, t, pvec)
        return c2, -u, d  # model uses +g, tray convention -g (run.py:257)

    ps, _, _, _ = fs.run_full_stack(
        scene, solve_fn, ctlr.init_carry(jnp.float64),
        fs.init_full_state(jnp.float64), target8, obj_params,
        n_steps=2500, dt=DT, control_every=5, warmup_steps=250,
        qp_iters=40, observe=fs.observe_object_8)
    ps = np.asarray(ps)
    err = np.linalg.norm(ps - np.array([0.05, -0.04]), axis=1)
    assert np.all(np.isfinite(ps))
    assert err[-1] < 0.015, f"final error {err[-1]:.4f} m"


def test_full_stack_pmpc_closed_loop_reaches_target():
    """The flagship end-to-end: PMPC through the full physics stack."""
    scene = fs.make_scene(dt=DT, dtype=jnp.float64)
    obj_params = to_mod.make_params("cube", mass=1.0, mu=0.1,
                                    dtype=jnp.float64)
    ctlr = mpc_mod.PMPC(N=15, dt=DT * 5, u_bound=0.6,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=10))
    weights = mpc_mod.PMPC_WEIGHTS["cube"]
    params = dyn.PMPCParams(mu=0.1, dt=DT * 5)
    target = jnp.asarray([0.05, 0.0, -0.04, 0.0, 0.43, 0.0], jnp.float64)

    def solve_fn(c, obs, t):
        return ctlr.solve(c, obs, t, params, weights)

    ps, thetas, us, _ = fs.run_full_stack(
        scene, solve_fn, ctlr.init_carry(jnp.float64),
        fs.init_full_state(jnp.float64), target, obj_params,
        n_steps=2500, dt=DT, control_every=5, warmup_steps=250, qp_iters=40)
    err = np.linalg.norm(np.asarray(ps) - np.array([0.05, -0.04]), axis=1)
    assert err[-1] < 0.005, f"final error {err[-1]:.4f} m"
    assert np.all(np.abs(np.asarray(us)) <= 0.6 + 1e-9)
    # Tilt commands actually moved the tray.
    assert float(np.abs(np.asarray(thetas)).max()) > 0.02


def test_stale_torque_qp_lag_graceful():
    """P2 stale-torque replay (`arm.py:221-229`): with the arm QPs
    re-solving only every 3rd world step (a persistent ~5 ms deadline
    miss), the held-torque loop degrades gracefully — the PMPC episode
    still converges, with at most a modest accuracy penalty vs the
    deadline-met run — matching the reference's described fallback
    behaviour."""
    import numpy as np

    # The two big run_full_stack variants below compile after everything
    # the suite already JIT'd in this process; without this, XLA-CPU's
    # compiler aborts (resource exhaustion) when this file runs late in
    # the full suite (fine standalone).
    jax.clear_caches()
    scene = fs.make_scene(dt=DT, dtype=jnp.float64)
    obj_params = to_mod.make_params("cube", mass=1.0, mu=0.1,
                                    dtype=jnp.float64)
    ctlr = mpc_mod.PMPC(N=15, dt=DT * 5,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=6))
    params = dyn.PMPCParams(mu=jnp.asarray(0.1, jnp.float64), dt=DT * 5)
    w = mpc_mod.PMPC_WEIGHTS["cube"]
    target6 = jnp.asarray([0.05, 0.0, -0.04, 0.0, 0.43, 0.0], jnp.float64)

    def solve_fn(c, obs, t):
        return ctlr.solve(c, obs, t, params, w)

    finals = {}
    for qp_every in (1, 3):
        ps, thetas, us, _ = fs.run_full_stack(
            scene, solve_fn, ctlr.init_carry(jnp.float64),
            fs.init_full_state(jnp.float64), target6, obj_params,
            n_steps=2000, dt=DT, control_every=5, warmup_steps=250,
            qp_iters=40, qp_every=qp_every)
        err = np.linalg.norm(np.asarray(ps)[:, :2] - np.array([0.05, -0.04]),
                             axis=1)
        assert np.all(np.isfinite(np.asarray(ps))), qp_every
        finals[qp_every] = err[-1]
    # deadline-met run converges; stale-torque run still converges (the
    # reference tolerates 5 ms misses without losing the episode)
    assert finals[1] < 0.01, finals
    assert finals[3] < 0.015, finals
