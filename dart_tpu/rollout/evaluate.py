"""Scenario evaluation: closed-loop MPC vs the contact-plant oracle.

One function = one scenario episode (vmappable); `dart_tpu.parallel.sweep`
shards batches of these over a device mesh. Mirrors the reference's
experiment drivers (`main_parallel_enhanced.py`, `rob_ctrl.py`): settle,
control at the MPC rate, measure steady-state error / convergence time /
control effort (`logger.py:154-176`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dart_tpu.control import mpc as mpc_mod
from dart_tpu.models import dynamics as dyn
from dart_tpu.physics import tray_object as to_mod
from dart_tpu.rollout.metrics import Metrics, compute_metrics


class PMPCScenarioResult(NamedTuple):
    metrics: Metrics
    final_p: jnp.ndarray
    # Sticky contact-loss flag (r5, LMPC evaluator): the episode froze at
    # the first off-tray/topple crossing instead of integrating the
    # tray-frame model past the tray edge (None where not tracked).
    contact_lost: jnp.ndarray = None


def _select_weights(shape_id, dtype, mu=None):
    """Per-object weight tables (`PMPC/main_parallel.py:107-135`), with the
    high-friction schedule for sliding shapes when `mu` is supplied
    (`mpc.pmpc_schedule_weights`; sphere excluded — its high-mu handling is
    the rolling-aware model).

    The schedule is applied on the MUJOCO bridge path only (where it was
    tuned and measured: cube/cylinder mu=0.2 lanes 3.8-22 s -> 0.6-0.8 s,
    `artifacts/mujoco/pmpc_grid.json`). On the calibrated LAG plant the
    same gain-up saws through the slow tray response and parks the cube
    16-18 mm out, while the reference-faithful weights converge in 15-21 s
    — inside the reference's own published 10-30 s high-friction band
    (`PMPC/README.md:265`) — so the plant evaluators pass mu=None here."""
    tab = jnp.asarray([
        [600.0, 5.0, 0.1],    # cube
        [400.0, 2.5, 0.2],    # cylinder
        [200.0, 2.0, 0.2],    # sphere
    ], dtype)
    row = tab[shape_id]
    w = mpc_mod.PMPCWeights(Qp=row[0], Qv=row[1], R=row[2])
    if mu is not None:
        w = mpc_mod.pmpc_schedule_weights(w, mu, shape_id != 2)
    return w


def make_pmpc_evaluator(n_steps: int = 2500, dt: float = 0.002,
                        control_every: int = 5, warmup_steps: int = 250,
                        N: int = 15, u_bound: float = 0.6,
                        max_iters: int = 10, tol: float = 0.01,
                        tray_lag=None, tap=None):
    """Build a jittable (scenario -> metrics) evaluator.

    The MPC runs at dt*control_every (10 ms ~ the reference's ~100 Hz
    parallel solve rate); the plant at the 2 ms sim cadence with the tray
    tracking lag standing in for the dual-arm layer (use
    `rollout.full_stack` for arm-in-the-loop fidelity runs).
    """
    # Controller discretization = the SIM timestep, as the reference's
    # (Ts = model.opt.timestep, `main_parallel.py:107-122`): a 15-stage /
    # 30 ms horizon solved every `control_every` steps. r1/r2 used
    # dt*control_every (150 ms horizon) — a materially more aggressive
    # controller (first tilt command -0.6 vs the reference's -0.18 from
    # rest) whose wind-up the legacy fast tray lag masked; on the
    # MuJoCo-calibrated lag it limit-cycles where mj_step settles.
    ctlr = mpc_mod.PMPC(N=N, dt=dt, u_bound=u_bound,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=max_iters))

    def evaluate(shape_kappa_inv, mass, mu, target_xy,
                 assumed_mu=None) -> PMPCScenarioResult:
        dtype = mass.dtype
        obj_params = _tray_params(shape_kappa_inv, mass, mu, dtype,
                                  tray_lag)
        # The analytic MPC model assumes the commanded friction (the driver
        # passes --friction straight to the model, `main_parallel.py:109`).
        model_mu = mu if assumed_mu is None else assumed_mu
        params = dyn.PMPCParams(mu=model_mu, dt=dt)
        # Shape-dependent weights: blended via the rolling factor is not
        # needed — select by kappa signature (cube (0,0), cyl (2,0), sph).
        shape_id = jnp.where(shape_kappa_inv[1] > 0, 2,
                             jnp.where(shape_kappa_inv[0] > 0, 1, 0))
        weights = _select_weights(shape_id, dtype)   # lag plant: no schedule
        target6 = jnp.asarray(
            [target_xy[0], 0.0, target_xy[1], 0.0, 0.43, 0.0], dtype)

        def stepf(carry, k):
            ctrl_carry, s, u_held = carry
            pos, vel = to_mod.observe_world(s, obj_params)
            obs = jnp.stack([pos[0], vel[0], pos[1], vel[1], pos[2], vel[2]])
            do_solve = (k >= warmup_steps) & \
                ((k - warmup_steps) % control_every == 0)

            def s_branch(c):
                c2, u, _ = ctlr.solve(c, obs, target6, params, weights)
                return c2, u

            def h_branch(c):
                return c, u_held

            ctrl_carry, u = jax.lax.cond(do_solve, s_branch, h_branch,
                                         ctrl_carry)
            u_apply = jnp.where(k >= warmup_steps, u, jnp.zeros_like(u))
            s = to_mod.step(s, u_apply, obj_params, dt)
            if tap is not None:
                # Production telemetry: per-step records from INSIDE the
                # jitted scan through the native C++ ring (`io.streaming.
                # TelemetryTap`) — the reference's async-logger-process
                # semantics (P4) without leaving the device program. Only
                # valid on the single-episode path (io_callback does not
                # vmap); sweeps must pass tap=None.
                tap.emit(k=k, px=s.p[0], py=s.p[1],
                         ux=u_apply[0], uy=u_apply[1],
                         err=jnp.sqrt((s.p[0] - target_xy[0]) ** 2
                                      + (s.p[1] - target_xy[1]) ** 2))
            return (ctrl_carry, s, u), (s.p, u_apply)

        s0 = to_mod.init_state(dtype=dtype)
        (_, s_fin, _), (ps, us) = jax.lax.scan(
            stepf, (ctlr.init_carry(dtype), s0, jnp.zeros(2, dtype)),
            jnp.arange(n_steps))
        # Metrics in tray-frame positions (X layout [px, _, py, _]).
        X = jnp.stack([ps[:, 0], jnp.zeros_like(ps[:, 0]),
                       ps[:, 1], jnp.zeros_like(ps[:, 1])], axis=-1)
        m = compute_metrics(X, us, target_xy, dt, tol=tol)
        return PMPCScenarioResult(metrics=m, final_p=s_fin.p)

    return evaluate


def make_mppi_evaluator(n_steps: int = 2500, dt: float = 0.002,
                        control_every: int = 5, warmup_steps: int = 250,
                        N: int = 15, u_bound: float = 0.6,
                        n_samples: int = 256, n_iters: int = 2,
                        tol: float = 0.01, seed: int = 0, tray_lag=None):
    """Sampling-MPC (MPPI ensemble) scenario evaluator: the same PMPC OCP
    solved by parallel rollout ensembles instead of box-DDP — the
    "MPPI-style rollout ensembles per solve" benchmark mode."""
    from dart_tpu.solver import mppi as mppi_mod
    from dart_tpu.solver.ocp import make_pmpc_ocp

    ocp = make_pmpc_ocp(dt=dt, u_bound=u_bound)   # reference Ts = sim dt
    cfg = mppi_mod.MPPIConfig(n_samples=n_samples, temperature=0.05,
                              sigma=0.08, n_iters=n_iters)

    def evaluate(shape_kappa_inv, mass, mu, target_xy):
        dtype = mass.dtype
        obj_params = _tray_params(shape_kappa_inv, mass, mu, dtype,
                                  tray_lag)
        params = dyn.PMPCParams(mu=mu, dt=dt)
        shape_id = jnp.where(shape_kappa_inv[1] > 0, 2,
                             jnp.where(shape_kappa_inv[0] > 0, 1, 0))
        w = _select_weights(shape_id, dtype)         # lag plant: no schedule
        from dart_tpu.solver.ocp import PMPCAux
        aux = PMPCAux(target=jnp.asarray(
            [target_xy[0], 0.0, target_xy[1], 0.0, 0.43, 0.0], dtype),
            Qp=w.Qp, Qv=w.Qv, R=w.R)

        def stepf(carry, k):
            U, key, s, u_held = carry
            pos, vel = to_mod.observe_world(s, obj_params)
            obs = jnp.stack([pos[0], vel[0], pos[1], vel[1], pos[2], vel[2]])
            do_solve = (k >= warmup_steps) & \
                ((k - warmup_steps) % control_every == 0)

            def s_branch(c):
                U, key = c
                key, sub = jax.random.split(key)
                U_new, _ = mppi_mod.solve(ocp, cfg, params, aux, obs, U, sub)
                return mppi_mod.shift(U_new), key, U_new[0]

            def h_branch(c):
                U, key = c
                return U, key, u_held

            U, key, u = jax.lax.cond(do_solve, s_branch, h_branch, (U, key))
            u_apply = jnp.where(k >= warmup_steps, u, jnp.zeros_like(u))
            s = to_mod.step(s, u_apply, obj_params, dt)
            return (U, key, s, u), (s.p, u_apply)

        s0 = to_mod.init_state(dtype=dtype)
        key0 = jax.random.PRNGKey(seed)
        (_, _, s_fin, _), (ps, us) = jax.lax.scan(
            stepf, (jnp.zeros((N, 2), dtype), key0, s0, jnp.zeros(2, dtype)),
            jnp.arange(n_steps))
        X = jnp.stack([ps[:, 0], jnp.zeros_like(ps[:, 0]),
                       ps[:, 1], jnp.zeros_like(ps[:, 1])], axis=-1)
        m = compute_metrics(X, us, target_xy, dt, tol=tol)
        return PMPCScenarioResult(metrics=m, final_p=s_fin.p)

    return evaluate


def make_rmpc_evaluator(n_steps: int = 2500, dt: float = 0.002,
                        control_every: int = 5, warmup_steps: int = 250,
                        N: int = 20, max_iters: int = 10, tol: float = 0.01,
                        trace: bool = False, tray_lag=None):
    """RMPC (RLS-adaptive) scenario evaluator vs the contact plant — the
    closed-loop analogue of `rob_ctrl.py:331-416` with the RLS update,
    reference governor and staged reference inside the jitted loop.

    With `trace=True` also returns the (T, ...) trajectories of controls,
    positions and the RLS estimate, for the episode-JSON logs.
    """
    # Controller discretization = the SIM timestep, matching the
    # reference (Ts = model.opt.timestep, `rob_ctrl.py:280-284`) and the
    # mj-validated bridge adapter (`mujoco_bridge.rmpc_solve_fn`): a
    # 20-stage / 40 ms horizon solved every `control_every` steps, with
    # the RLS finite difference over the call period divided by Ts —
    # the reference's own convention when solves are throttled.
    ctlr = mpc_mod.RMPC(N=N, dt=dt,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=max_iters,
                                                    al_iters=3))

    def evaluate(shape_kappa_inv, mass, mu, target_xy):
        dtype = mass.dtype
        obj_params = _tray_params(shape_kappa_inv, mass, mu, dtype,
                                  tray_lag)
        target4 = jnp.asarray([target_xy[0], 0.0, target_xy[1], 0.0], dtype)

        def observe(s):
            pos, vel = to_mod.observe_world(s, obj_params)
            return jnp.stack([pos[0], vel[0], pos[1], vel[1]])

        def stepf(carry, k):
            ctrl_carry, s, u_held, stopped = carry
            obs = observe(s)
            do_solve = (k >= warmup_steps) & (~stopped) & \
                ((k - warmup_steps) % control_every == 0)

            def s_branch(c):
                c2, u, _ = ctlr.solve(c, obs, target4)
                return c2, u

            def h_branch(c):
                return c, u_held

            ctrl_carry, u = jax.lax.cond(do_solve, s_branch, h_branch,
                                         ctrl_carry)
            u_apply = jnp.where((k >= warmup_steps) & (~stopped), u,
                                jnp.where(stopped, u_held,
                                          jnp.zeros_like(u)))
            s_next = to_mod.step(s, u_apply, obj_params, dt)
            # Freeze at convergence, as the reference driver breaks its loop
            # when the error first crosses tolerance (rob_ctrl.py:391-414) —
            # also avoiding RLS covariance wind-up under zero excitation.
            err = jnp.linalg.norm(
                jnp.stack([s_next.p[0] - target_xy[0],
                           s_next.p[1] - target_xy[1]]))
            stopped_n = stopped | ((k >= warmup_steps) & (err < tol))
            s_keep = jax.tree.map(
                lambda a, b: jnp.where(stopped, a, b), s, s_next)
            theta = jnp.concatenate([ctrl_carry.rls_x.theta,
                                     ctrl_carry.rls_y.theta])
            return (ctrl_carry, s_keep, u, stopped_n), \
                (s_keep.p, u_apply, theta)

        s0 = to_mod.init_state(dtype=dtype)
        carry0 = ctlr.init_carry(observe(s0), dtype)
        (_, s_fin, _, _), (ps, us, thetas) = jax.lax.scan(
            stepf, (carry0, s0, jnp.zeros(2, dtype),
                    jnp.zeros((), bool)), jnp.arange(n_steps))
        X = jnp.stack([ps[:, 0], jnp.zeros_like(ps[:, 0]),
                       ps[:, 1], jnp.zeros_like(ps[:, 1])], axis=-1)
        m = compute_metrics(X, us, target_xy, dt, tol=tol)
        if trace:
            return PMPCScenarioResult(metrics=m, final_p=s_fin.p), \
                (ps, us, thetas)
        return PMPCScenarioResult(metrics=m, final_p=s_fin.p)

    return evaluate


def _tray_params(shape_kappa_inv, mass, mu, dtype, tray_lag=None):
    """Scenario row -> TrayObjectParams (vmappable). `tray_lag` is an
    optional (omega_n, zeta[, fast_frac]) tuple — scalars or per-axis
    (2,) tuples. Default (None) = the payload-mass-interpolated
    `to_mod.calibrated_lag(mass)` (r4: the arm stack's realised tilt
    response measurably depends on the carried mass) plus the per-shape
    MuJoCo-fitted contact dissipation (r3 re-baseline); pass
    `to_mod.LEGACY_TRAY_LAG` to reproduce r1/r2 artifacts (optimistic
    lag, no dissipation — docs/PERFORMANCE.md)."""
    calibrated = tray_lag is None
    lag = to_mod.calibrated_lag(mass, dtype) if calibrated else tray_lag
    omega_n, zeta = lag[0], lag[1]
    lag_fast = lag[2] if len(lag) > 2 else 0.0
    if calibrated:
        # shape from the kappa signature: cube (0,0), cylinder (k,0),
        # sphere (k,k) — same rule as _select_weights.
        shape_id = jnp.where(shape_kappa_inv[1] > 0, 2,
                             jnp.where(shape_kappa_inv[0] > 0, 1, 0))
        rr_tab = jnp.asarray([to_mod.CALIBRATED_ROLL_RESIST[s]
                              for s in to_mod.SHAPES], dtype)
        sd_tab = jnp.asarray([to_mod.CALIBRATED_SLIDE_DAMP[s]
                              for s in to_mod.SHAPES], dtype)
        roll_resist = rr_tab[shape_id]
        slide_damp = to_mod.calibrated_slide_damp(sd_tab[shape_id], mu,
                                                  dtype)
        roll_stick = to_mod.calibrated_roll_stick(shape_kappa_inv, mu,
                                                  dtype)
        back_w = jnp.asarray(to_mod.CALIBRATED_BACK_W, dtype)
        back_gss = jnp.asarray(to_mod.CALIBRATED_BACK_GSS, dtype)
    else:
        roll_resist = jnp.asarray(0.0, dtype)
        slide_damp = jnp.asarray(0.0, dtype)
        roll_stick = jnp.zeros(2, dtype)
        back_w = jnp.zeros(2, dtype)
        back_gss = jnp.ones(2, dtype)
    return to_mod.TrayObjectParams(
        mass=mass, mu=mu, kappa_inv=shape_kappa_inv,
        slip_eps=jnp.asarray(2e-3, dtype),
        omega_n=jnp.asarray(omega_n, dtype), zeta=jnp.asarray(zeta, dtype),
        tray_pos=jnp.asarray([0.0, 0.0, 0.4], dtype),
        half_w=jnp.asarray([0.025, 0.025], dtype),
        h_com=jnp.asarray(0.025, dtype),
        topple_on=to_mod.topple_on_from_kappa(shape_kappa_inv),
        roll_resist=roll_resist, slide_damp=slide_damp,
        lag_fast=jnp.asarray(lag_fast, dtype),
        roll_stick=roll_stick, stick_vel=jnp.asarray(5e-3, dtype),
        back_w=back_w, back_gss=back_gss)


def make_lmpc_evaluator(policy_params, model, n_steps: int = 2500,
                        dt: float = 0.002, control_every: int = 5,
                        warmup_steps: int = 250, N: int = 12,
                        max_iters: int = 4, tol: float = 0.01,
                        param_update_every: int = 8,
                        u_sign: float = -1.0, trace: bool = False,
                        tray_lag=None, hold_after_convergence: bool = False,
                        reengage_tol: float = None):
    """LMPC scenario evaluator on the CONTACT PLANT with the trained policy
    tuning the 34 model parameters online — the closed-loop analogue of
    `LMPC/src/run.py:243-311` with the plant swapped from MuJoCo to
    `tray_object` (for MuJoCo itself see `physics.mujoco_bridge`).

    Unlike `adapt.lmpc_trainer.eval_rollout` (plant == the lmpc model
    family, i.e. self-referential), here LMPC quality is measured on a
    plant it did not train on: Stribeck/rolling/toppling contact dynamics.
    One env step = one MPC control period = `control_every` x 2 ms plant
    steps; the policy adjusts the parameter vector every
    `param_update_every` control steps (`rlmpc2.py:742`); the learned
    model's tilt sign convention is inverted vs the world (`run.py:257`),
    hence ``u_sign=-1``.

    Returns `evaluate(shape_kappa_inv, mass, mu, target_xy, rng)` —
    vmappable; `rng` seeds the policy's parameter-vector initialisation
    (mid-range jittered, `rlmpc2.py:618-623`).

    ``hold_after_convergence=True`` (r4) switches from the reference's
    stop-at-first-crossing protocol to the SETTLED protocol: only the
    param adaptation freezes at the first tolerance crossing (the
    zero-excitation clutch) while control keeps running, so the recorded
    SSE is the genuine post-convergence hold instead of being clamped at
    the tolerance by the freeze.

    ``reengage_tol`` (r5, settled protocol only; default ``1.2 * tol``):
    the adaptation clutch is HYSTERETIC rather than sticky. The r4 sticky
    freeze had no recovery path: when a rolling object under the frozen
    (now-miscalibrated) 34-param model wandered past the tolerance, the
    tuner — whose whole role is tracking the plant — was locked out
    forever, and the lanes ejected by meters. Re-engaging adaptation once
    the error re-exceeds ``reengage_tol`` restores exactly the regime the
    policy was trained for (nonzero tracking error = excitation), while
    the freeze still guards the zero-excitation band. MuJoCo ground truth
    note: the reference contact model has NO rolling stiction the plant
    could be blamed for missing — every geom is condim 3, so the rolling
    friction coefficient is inert (measured: a sphere on a static incline
    at 1e-4 rad creeps; `tools/measure_roll_stiction.py`,
    `artifacts/mujoco/roll_stiction.json`) — bounded post-convergence
    holds there are the CONTROLLER's doing, which is why the evaluator
    must let the controller keep its tuner.
    """
    from dart_tpu.adapt import lmpc_trainer as trainer
    from dart_tpu.adapt import ppo as ppo_mod

    ctrl_dt = dt * control_every
    ctlr = mpc_mod.LMPC(N=N, dt=ctrl_dt,
                        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=max_iters))
    n_ctrl = n_steps // control_every
    act_cfg = ppo_mod.ParamActionConfig()
    if reengage_tol is None:
        reengage_tol = 1.2 * tol

    def evaluate(shape_kappa_inv, mass, mu, target_xy, rng):
        dtype = mass.dtype
        obj_params = _tray_params(shape_kappa_inv, mass, mu, dtype,
                                  tray_lag)
        target8 = jnp.zeros(8, dtype).at[0].set(target_xy[0]).at[2].set(
            target_xy[1])

        def observe8(s):
            pos, vel = to_mod.observe_world(s, obj_params)
            th, thd = s.theta, s.theta_dot
            return jnp.stack([pos[0], vel[0], pos[1], vel[1],
                              th[1], thd[1], -th[0], -thd[0]])

        def substep(s, u):
            def one(s, _):
                return to_mod.step(s, u, obj_params, dt), None
            s, _ = jax.lax.scan(one, s, None, length=control_every)
            return s

        def stepf(carry, k):
            cc, s, current_k, welford, history, u_prev, stopped, lost = carry
            x = observe8(s)
            base = jnp.concatenate([x, target8, u_prev, current_k])
            welford = ppo_mod.welford_update(welford, base)
            norm = ppo_mod.welford_normalize(welford, base)
            history = jnp.concatenate([history[1:], norm[None]], axis=0)
            mean, _, _ = model.apply(policy_params, history.reshape(-1))
            do_upd = (k % param_update_every) == 0
            # `stopped` (sticky first tolerance crossing) always gates the
            # param-vector updates — the zero-excitation adaptation clutch
            # (see mujoco_bridge.lmpc_solve_fn).
            k_new = ppo_mod.apply_param_action(current_k, mean, act_cfg)
            current_k = jnp.where(do_upd & (~stopped), k_new, current_k)

            cc_new, u, _ = ctlr.solve(cc, x, target8, current_k)
            warm = k * control_every >= warmup_steps
            if hold_after_convergence:
                # SETTLED protocol: control keeps running past the first
                # crossing (only adaptation freezes); metrics measure the
                # genuine post-convergence hold. Measured r4 result on
                # the calibrated plant: cubes hold at 0.16-0.49 mm (well
                # inside the reference's 1-5 mm band), but the frozen
                # 34-param model is uncalibrated in the zero-error
                # ROLLING regime and cylinders/spheres drift off-tray
                # under continued control (PMPC's analytic model holds
                # the same rollers fine; MuJoCo ground truth with the
                # same clutch holds every lane to 9-26 mm — see
                # docs/PARITY.md). A flatten-the-tray hysteresis hold
                # was tried and REJECTED: rollers exit the band still
                # moving and the re-engaging frozen-model control kicks
                # them — strictly worse on both plants.
                cc = cc_new
                u_apply = jnp.where(warm, jnp.asarray(u_sign, dtype) * u,
                                    jnp.zeros_like(u))
                s_keep = substep(s, u_apply)
            else:
                # Reference protocol: freeze everything at first crossing
                # (`run.py:300-306` breaks the episode there).
                cc = jax.tree.map(
                    lambda a, b: jnp.where(stopped, a, b), cc, cc_new)
                u = jnp.where(stopped, u_prev, u)
                u_apply = jnp.where(warm & (~stopped),
                                    jnp.asarray(u_sign, dtype) * u,
                                    jnp.where(stopped, u_sign * u_prev,
                                              jnp.zeros_like(u)))
                s_next = substep(s, u_apply)
                s_keep = jax.tree.map(
                    lambda a, b: jnp.where(stopped, a, b), s, s_next)
            # Terminate at contact loss (VERDICT r4 next-3): once the
            # object crosses the tray edge (or topples), the tray-frame
            # slide model has nothing physical left to integrate — the
            # r4 settled artifact recorded rolling lanes at 1.5-9.5 m
            # because the evaluator integrated straight past +-0.2 m.
            # Freeze the whole lane at the first crossing; the recorded
            # SSE is then the (honest) distance at the tray edge and the
            # `contact_lost` flag marks the lane failed.
            frz = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(lost, x, y), a, b)
            cand = (cc, s_keep, current_k, welford, history, u)
            cc, s_keep, current_k, welford, history, u = frz(
                (carry[0], s, carry[2], carry[3], carry[4], u_prev), cand)
            u_apply = jnp.where(lost, jnp.zeros_like(u_apply), u_apply)
            lost_n = lost | to_mod.contact_lost(s_keep)
            err = jnp.sqrt((s_keep.p[0] - target_xy[0]) ** 2
                           + (s_keep.p[1] - target_xy[1]) ** 2)
            if hold_after_convergence:
                # Hysteretic clutch (see docstring): engage the freeze
                # only when genuinely SETTLED — inside tol AND slow. A
                # rolling object can swing THROUGH the tolerance ball at
                # speed; freezing there locks in mid-transient params
                # and the hold runs on a model tuned for the swing (the
                # r4/r5 rolling-lane ejection mechanism). Release once
                # the error re-exceeds reengage_tol — the tuner gets its
                # excitation back.
                speed = jnp.hypot(s_keep.v[0], s_keep.v[1])
                stopped_n = (stopped
                             | (warm & (err < tol) & (speed < 0.02))) \
                    & (err < reengage_tol)
            else:
                stopped_n = stopped | (warm & (err < tol) & (~lost_n))
            return (cc, s_keep, current_k, welford, history, u, stopped_n,
                    lost_n), (s_keep.p, u_apply)

        s0 = to_mod.init_state(dtype=dtype)
        init_k = jax.random.uniform(
            rng, (trainer.N_PARAMS,), dtype,
            minval=act_cfg.min_k, maxval=act_cfg.k_max / 2)
        carry0 = (ctlr.init_carry(dtype), s0, init_k,
                  ppo_mod.welford_init(trainer.BASE_OBS_DIM, dtype),
                  jnp.zeros((trainer.HISTORY_LEN, trainer.BASE_OBS_DIM),
                            dtype),
                  jnp.zeros(2, dtype), jnp.zeros((), bool),
                  jnp.zeros((), bool))
        (_, s_fin, _, _, _, _, _, lost_fin), (ps, us) = jax.lax.scan(
            stepf, carry0, jnp.arange(n_ctrl))
        X = jnp.stack([ps[:, 0], jnp.zeros_like(ps[:, 0]),
                       ps[:, 1], jnp.zeros_like(ps[:, 1])], axis=-1)
        m = compute_metrics(X, us, target_xy, ctrl_dt, tol=tol)
        if trace:
            return PMPCScenarioResult(metrics=m, final_p=s_fin.p,
                                      contact_lost=lost_fin), (ps, us)
        return PMPCScenarioResult(metrics=m, final_p=s_fin.p,
                                  contact_lost=lost_fin)

    return evaluate


def make_pmpc_batch_evaluator(n_steps: int = 2500, dt: float = 0.002,
                              control_every: int = 5, warmup_steps: int = 250,
                              N: int = 15, u_bound: float = 0.6,
                              max_iters: int = 4, tol: float = 0.01,
                              use_kernel: bool = True, kernel_iters: int = 2,
                              kernel_alphas: int = 3, tray_lag=None):
    """Batch-major PMPC evaluator: B scenarios in ONE jitted scan, one
    `PMPCBatch.solve` per control step — the whole-solve Pallas kernel
    (`ops.pallas.pmpc_solve`) on TPU when B % 128 == 0. Per-object weight
    tables selected per lane, matching `make_pmpc_evaluator`. `max_iters`
    governs the XLA fallback path; `kernel_iters`/`kernel_alphas` the
    kernel budget (under-converged lanes self-escalate, see PMPCBatch)."""
    # Controller Ts = sim dt, as in make_pmpc_evaluator (reference
    # discretization; the r1/r2 150 ms-horizon variant winds up on the
    # calibrated plant).
    ctlr = mpc_mod.PMPCBatch(N=N, dt=dt, u_bound=u_bound,
                             cfg=mpc_mod.ilqr.ILQRConfig(max_iters=max_iters),
                             use_kernel=use_kernel, kernel_iters=kernel_iters,
                             kernel_alphas=kernel_alphas)
    step_plant = jax.vmap(to_mod.step, in_axes=(0, 0, 0, None))

    def evaluate(shape_kappa_inv, mass, mu, target_xy, assumed_mu=None):
        dtype = mass.dtype
        B = mass.shape[0]
        obj_params = jax.vmap(
            lambda k, m, f: _tray_params(k, m, f, dtype, tray_lag))(
                shape_kappa_inv, mass, mu)
        model_mu = mu if assumed_mu is None else assumed_mu
        params = dyn.PMPCParams(mu=model_mu, dt=dt)
        shape_id = jnp.where(shape_kappa_inv[:, 1] > 0, 2,
                             jnp.where(shape_kappa_inv[:, 0] > 0, 1, 0))
        weights = jax.vmap(
            lambda s, m: _select_weights(s, dtype))(shape_id, model_mu)
        zero = jnp.zeros((B,), dtype)
        target6 = jnp.stack([target_xy[:, 0], zero, target_xy[:, 1], zero,
                             jnp.full((B,), 0.43, dtype), zero], axis=-1)

        def observe(s):
            pos, vel = jax.vmap(to_mod.observe_world)(s, obj_params)
            return jnp.stack([pos[:, 0], vel[:, 0], pos[:, 1], vel[:, 1],
                              pos[:, 2], vel[:, 2]], axis=-1)

        def stepf(carry, k):
            ctrl_carry, s, u_held = carry
            obs = observe(s)
            do_solve = (k >= warmup_steps) & \
                ((k - warmup_steps) % control_every == 0)

            def s_branch(c):
                c2, u, _ = ctlr.solve(c, obs, target6, params, weights)
                return c2, u

            def h_branch(c):
                return c, u_held

            ctrl_carry, u = jax.lax.cond(do_solve, s_branch, h_branch,
                                         ctrl_carry)
            u_apply = jnp.where(k >= warmup_steps, u, jnp.zeros_like(u))
            s = step_plant(s, u_apply, obj_params, dt)
            return (ctrl_carry, s, u), (s.p, u_apply)

        s0 = jax.vmap(lambda _: to_mod.init_state(dtype=dtype))(zero)
        (_, s_fin, _), (ps, us) = jax.lax.scan(
            stepf, (ctlr.init_carry(B, dtype), s0, jnp.zeros((B, 2), dtype)),
            jnp.arange(n_steps))
        zt = jnp.zeros_like(ps[:, :, 0])
        X = jnp.stack([ps[:, :, 0], zt, ps[:, :, 1], zt], axis=-1)
        m = jax.vmap(lambda Xi, Ui, ti: compute_metrics(Xi, Ui, ti, dt,
                                                        tol=tol),
                     in_axes=(1, 1, 0))(X, us, target_xy)
        return PMPCScenarioResult(metrics=m, final_p=s_fin.p)

    return evaluate


def make_rmpc_batch_evaluator(n_steps: int = 2500, dt: float = 0.002,
                              control_every: int = 5, warmup_steps: int = 250,
                              N: int = 20, max_iters: int = 10,
                              tol: float = 0.01, use_kernel: bool = True,
                              kernel_iters: int = 6, kernel_alphas: int = 4,
                              kernel_al_rounds: int = 3,
                              kernel_max_extra_rounds: int = 2,
                              kernel_interpret: bool = False,
                              kernel_xla_fallback: bool = True,
                              tray_lag=None):
    """Batch-major RMPC evaluator: B scenarios advance in ONE jitted scan.

    Where `make_rmpc_evaluator` is a per-scenario episode to be vmapped,
    here the whole scenario batch shares one `RMPCBatch.solve_batched` per
    control step — on TPU with B % 128 == 0 that is the whole-solve Pallas
    kernel (`ops.pallas.rmpc_solve`), so a full 18-config x target sweep
    runs its RLS + governor + constrained solves without leaving the
    device. Freeze-at-convergence matches the per-instance evaluator
    (`rob_ctrl.py:391-414` semantics), applied per lane.

    The kernel budget defaults are deliberately HIGHER than RMPCBatch's
    (6 iters x 3 AL rounds x 4 alphas vs 2x2x3): closed-loop RLS
    adaptation can drive the regressor stiff (|theta| ~ 10 on rolling
    objects), where an under-converged solve feeds bad control back into
    the estimator and diverges. 6x3x4 matches the XLA path's 18/18 sweep
    success; 2x2x3 loses the two cylinder/mu=0.2 configs at N=20.

    Returns `evaluate(kappa_inv (B,2), mass (B,), mu (B,), target_xy (B,2))
    -> PMPCScenarioResult` with per-lane Metrics.
    """
    # Controller Ts = sim dt (see make_rmpc_evaluator).
    ctlr = mpc_mod.RMPCBatch(
        N=N, dt=dt,
        cfg=mpc_mod.ilqr.ILQRConfig(max_iters=max_iters, al_iters=3),
        kernel_iters=kernel_iters, kernel_alphas=kernel_alphas,
        kernel_al_rounds=kernel_al_rounds,
        kernel_max_extra_rounds=kernel_max_extra_rounds,
        kernel_interpret=kernel_interpret,
        kernel_xla_fallback=kernel_xla_fallback)
    step_plant = jax.vmap(to_mod.step, in_axes=(0, 0, 0, None))

    def evaluate(shape_kappa_inv, mass, mu, target_xy):
        dtype = mass.dtype
        B = mass.shape[0]
        obj_params = jax.vmap(
            lambda k, m, f: _tray_params(k, m, f, dtype, tray_lag))(
                shape_kappa_inv, mass, mu)
        zero = jnp.zeros((B,), dtype)
        target4 = jnp.stack([target_xy[:, 0], zero, target_xy[:, 1], zero],
                            axis=-1)

        def observe(s):
            pos, vel = jax.vmap(to_mod.observe_world)(s, obj_params)
            return jnp.stack([pos[:, 0], vel[:, 0], pos[:, 1], vel[:, 1]],
                             axis=-1)

        def lane_where(mask, a, b):
            """Per-lane select with leading-B leaves."""
            return jax.tree.map(
                lambda x, y: jnp.where(
                    mask.reshape((B,) + (1,) * (x.ndim - 1)), x, y), a, b)

        def stepf(carry, k):
            ctrl_carry, s, u_held, stopped = carry
            obs = observe(s)
            do_solve = (k >= warmup_steps) & \
                ((k - warmup_steps) % control_every == 0)

            def s_branch(c):
                c2, u, _ = ctlr.solve_batched(c, obs, target4,
                                              use_kernel=use_kernel)
                return c2, u

            def h_branch(c):
                return c, u_held

            cc_new, u_new = jax.lax.cond(do_solve, s_branch, h_branch,
                                         ctrl_carry)
            # Freeze converged lanes: keep their carry and held control.
            ctrl_carry = lane_where(stopped, ctrl_carry, cc_new)
            u = jnp.where(stopped[:, None], u_held, u_new)
            u_apply = jnp.where(k >= warmup_steps, u, jnp.zeros_like(u))
            s_next = step_plant(s, u_apply, obj_params, dt)
            err = jnp.sqrt((s_next.p[:, 0] - target_xy[:, 0]) ** 2
                           + (s_next.p[:, 1] - target_xy[:, 1]) ** 2)
            stopped_n = stopped | ((k >= warmup_steps) & (err < tol))
            s_keep = lane_where(stopped, s, s_next)
            return (ctrl_carry, s_keep, u, stopped_n), (s_keep.p, u_apply)

        s0 = jax.vmap(lambda _: to_mod.init_state(dtype=dtype))(zero)
        carry0 = ctlr.init_carry_batch(observe(s0), dtype)
        (_, s_fin, _, _), (ps, us) = jax.lax.scan(
            stepf, (carry0, s0, jnp.zeros((B, 2), dtype),
                    jnp.zeros((B,), bool)), jnp.arange(n_steps))
        zt = jnp.zeros_like(ps[:, :, 0])
        X = jnp.stack([ps[:, :, 0], zt, ps[:, :, 1], zt], axis=-1)  # (T,B,4)
        m = jax.vmap(lambda Xi, Ui, ti: compute_metrics(Xi, Ui, ti, dt,
                                                        tol=tol),
                     in_axes=(1, 1, 0))(X, us, target_xy)
        return PMPCScenarioResult(metrics=m, final_p=s_fin.p)

    return evaluate
