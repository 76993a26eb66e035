"""Receding-horizon MPC front-ends for the three variants.

Each controller is a thin, *stateless* object holding only static problem
structure (OCP definition, horizon, solver config); all evolving quantities
(warm-start trajectory, previous control, RLS estimate, cached plan) live in
an explicit carry pytree. This is the TPU-native replacement for the
reference's controller objects + worker processes:

- `PMPC`  ~ `PMPC/src/controller/mpc_3d.py:11-158`
- `RMPC`  ~ `AdaptiveNPMPCSmooth` + `RLS` + the reference-governor loop of
  `RMPC/dev_dual/rob_ctrl.py:331-361`
- `LMPC`  ~ `RLMPC` host + CasADi solver worker (`rlmpc2.py:110-533,986-1021`)
  including the plan-shifting semantics for emulated solver lag.

Because carries are pytrees and `solve` is jit/vmap-safe, whole scenario
sweeps batch with `vmap` and shard over device meshes — this subsumes the
reference's process-per-solver topology (SURVEY.md section 2.6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dart_tpu.adapt.rls import RLSState, rls_init, rls_update
from dart_tpu.control.reference import build_ref_traj, reference_governor
from dart_tpu.models import dynamics as dyn
from dart_tpu.solver import ilqr
from dart_tpu.solver.ocp import (LMPCAux, PMPCAux, RMPCAux, make_lmpc_ocp,
                                 make_pmpc_ocp, make_rmpc_ocp,
                                 make_rmpc_ocp_du)


class SolveDiag(NamedTuple):
    cost: jnp.ndarray
    viol: jnp.ndarray
    iters: jnp.ndarray
    grad_norm: jnp.ndarray


def _shift(V: jnp.ndarray) -> jnp.ndarray:
    """Receding-horizon warm start: drop stage 0, repeat the tail."""
    return jnp.concatenate([V[1:], V[-1:]], axis=0)


def _diag(sol: ilqr.ILQRSolution) -> SolveDiag:
    return SolveDiag(sol.cost, sol.viol, sol.iters, sol.grad_norm)


def _escalate(one_round, first, needs_help, max_rounds: int):
    """Shared kernel-escalation loop: re-run `one_round(V)` (a tuple whose
    first element is V) while `needs_help(state)` — a NaN-SAFE per-batch
    predicate — holds, up to `max_rounds` extra rounds. Returns
    (final state tuple, rounds used). NaN safety matters: a numerically
    diverged lane's diagnostics are NaN, and `nan > tol` is False — the
    predicate must be written as ~(x <= tol) so divergence escalates."""
    def cond(c):
        st, r = c
        return (r < max_rounds) & needs_help(st)

    def body(c):
        st, r = c
        # A lane that diverged to NaN would otherwise re-solve from a
        # NaN-poisoned warm start and can never recover; cold-start those
        # lanes (zeros) so escalation can actually rescue them (ADVICE r2).
        V = st[0]
        lane_ok = jnp.all(jnp.isfinite(V.reshape(V.shape[0], -1)), axis=1)
        V = jnp.where(lane_ok[:, None, None], V,
                      jnp.zeros_like(V))
        return one_round(V), r + 1

    return jax.lax.while_loop(
        cond, body, (first, jnp.zeros((), jnp.int32)))


# --------------------------------------------------------------------------
# PMPC
# --------------------------------------------------------------------------

class PMPCWeights(NamedTuple):
    """Per-object tuning table entries (`PMPC/main_parallel.py:107-122`)."""

    Qp: jnp.ndarray
    Qv: jnp.ndarray
    R: jnp.ndarray


# Reference tables: cube(600,5,.1) cylinder(400,2.5,.2) sphere(200,2,.2)
# general(300,2,.2).
PMPC_WEIGHTS = {
    "cube": PMPCWeights(jnp.asarray(600.0), jnp.asarray(5.0), jnp.asarray(0.1)),
    "cylinder": PMPCWeights(jnp.asarray(400.0), jnp.asarray(2.5), jnp.asarray(0.2)),
    "sphere": PMPCWeights(jnp.asarray(200.0), jnp.asarray(2.0), jnp.asarray(0.2)),
    "general": PMPCWeights(jnp.asarray(300.0), jnp.asarray(2.0), jnp.asarray(0.2)),
}


def pmpc_schedule_weights(weights: PMPCWeights, mu, sliding,
                          mu_breakaway: float = 0.15, qp_boost: float = 1.5,
                          r_cut: float = 0.5) -> PMPCWeights:
    """High-friction weight schedule (dart_tpu extension over the static
    `PMPC/main_parallel.py:107-122` table).

    For objects that must SLIDE to move (cube both axes, side-lying
    cylinder across its roll axis) at mu >= `mu_breakaway`, scale Qp up and
    R down: near the target the reference table's cost-optimal tilt stays
    below the stiction breakaway atan(mu) and the closed loop parks
    10-13 mm short (measured on the reference's own MuJoCo world,
    artifacts/mujoco/pmpc_grid.json mu=0.2 lanes; with the schedule the
    cube 2 kg mu=0.2 lane converges in 0.7 s instead of never). The
    schedule deliberately leaves low-friction lanes untouched so the
    reference-tuned behaviour there is preserved. `mu`/`sliding` may be
    traced per-lane values; rolling spheres pass sliding=False (their
    high-mu handling is the rolling-aware model, `mujoco_bridge.
    pmpc_solve_fn`)."""
    boost = jnp.asarray(sliding) & (jnp.asarray(mu) >= mu_breakaway)
    one = jnp.ones_like(weights.Qp)
    return PMPCWeights(Qp=weights.Qp * jnp.where(boost, qp_boost, one),
                       Qv=weights.Qv,
                       R=weights.R * jnp.where(boost, r_cut, one))


class PMPCCarry(NamedTuple):
    V: jnp.ndarray               # (N, 2) warm-start control trajectory


class PMPC:
    """Analytic tray-tilt MPC (nx=6, nu=2)."""

    def __init__(self, N: int = 15, dt: float = 0.002, u_bound: float = 0.6,
                 cfg: ilqr.ILQRConfig = ilqr.ILQRConfig()):
        self.N, self.dt = N, dt
        self.ocp = make_pmpc_ocp(dt=dt, u_bound=u_bound)
        self.cfg = cfg

    def init_carry(self, dtype=jnp.float32) -> PMPCCarry:
        return PMPCCarry(V=jnp.zeros((self.N, 2), dtype))

    def solve(self, carry: PMPCCarry, state: jnp.ndarray, target: jnp.ndarray,
              params: dyn.PMPCParams, weights: PMPCWeights):
        aux = PMPCAux(target=target, Qp=weights.Qp, Qv=weights.Qv, R=weights.R)
        sol = ilqr.solve(self.ocp, self.cfg, params, aux, state, carry.V)
        return PMPCCarry(V=_shift(sol.V)), sol.V[0], _diag(sol)


class PMPCBatch:
    """Batch-major PMPC: one fused solve for a whole scenario batch.

    The production throughput path: the Riccati backward pass runs as a
    single Pallas kernel over all scenarios (`ilqr.solve_batch`), ~3x a
    cold vmapped solve and ~10x warm on TPU (the scan backward is latency
    bound). Semantics identical to `PMPC.solve` per lane.
    """

    def __init__(self, N: int = 15, dt: float = 0.002, u_bound: float = 0.6,
                 cfg: ilqr.ILQRConfig = ilqr.ILQRConfig(max_iters=4),
                 use_pallas: bool = True, fast: bool = True,
                 use_kernel: bool = True, kernel_iters: int = 2,
                 kernel_alphas: int = 3, kernel_tol_grad: float = 5e-3,
                 kernel_max_extra_rounds: int = 2,
                 kernel_interpret: bool = False):
        self.N, self.dt, self.u_bound = N, dt, u_bound
        self.ocp = make_pmpc_ocp(dt=dt, u_bound=u_bound)
        self.cfg = cfg
        self.use_pallas = use_pallas
        # `fast`: exploit the affine-in-state structure of the PMPC dynamics
        # (`solver.pmpc_fast`; identical solutions, ~2.5x throughput).
        self.fast = fast
        # `use_kernel`: whole-solve Pallas kernel (`ops.pallas.pmpc_solve`)
        # when on TPU with B % 128 == 0 — the headline throughput path.
        # NOTE: on this path the iteration budget is kernel_iters x
        # kernel_alphas (NOT cfg.max_iters, which governs the XLA paths);
        # lanes whose post-solve projected-gradient norm exceeds
        # `kernel_tol_grad` trigger up to `kernel_max_extra_rounds` warm
        # kernel re-solves (the anti-silent-divergence escalation).
        # Gravity comes from params.g and must be a static python float on
        # the kernel path (traced values fall back to the XLA paths).
        self.use_kernel = use_kernel
        self.kernel_iters = kernel_iters
        self.kernel_alphas = kernel_alphas
        self.kernel_tol_grad = kernel_tol_grad
        self.kernel_max_extra_rounds = kernel_max_extra_rounds
        # Testing knob: run the whole-solve kernel in Pallas interpreter
        # mode on CPU so CI exercises the real escalation code path.
        self.kernel_interpret = kernel_interpret

    def init_carry(self, B: int, dtype=jnp.float32) -> PMPCCarry:
        return PMPCCarry(V=jnp.zeros((B, self.N, 2), dtype))

    def solve(self, carry: PMPCCarry, states: jnp.ndarray,
              targets: jnp.ndarray, params: dyn.PMPCParams,
              weights: PMPCWeights):
        """states (B, 6), targets (B, 6); params/weights leaves either
        scalar (shared) or batched (B,)."""
        B = states.shape[0]
        bc = lambda x: jnp.broadcast_to(jnp.asarray(x, states.dtype), (B,))
        aux = PMPCAux(target=targets, Qp=bc(weights.Qp), Qv=bc(weights.Qv),
                      R=bc(weights.R))
        # Kernel path requires STATIC gravity (a compile-time kernel
        # constant); a traced/array params.g falls back to the XLA paths,
        # which honor it — never silently solve with the wrong model.
        g_static = params.g if isinstance(params.g, (int, float)) else None
        kernel_ok = (self.use_kernel and self.fast and B % 128 == 0
                     and g_static is not None
                     and (jax.default_backend() == "tpu"
                          or self.kernel_interpret))
        if kernel_ok:
            from dart_tpu.solver import pmpc_fast

            def one_round(V):
                # kernel emits the per-lane max|feedforward| of its last
                # iteration (the XLA path's grad_norm) — diagnostics are
                # free, no XLA-side vjp needed.
                return pmpc_fast.solve_batch_kernel(
                    bc(params.mu), aux, states, V, dt=self.dt,
                    u_bound=self.u_bound, n_iters=self.kernel_iters,
                    n_alphas=self.kernel_alphas, g=float(g_static),
                    interpret=self.kernel_interpret)

            # Escalation: warm kernel re-solves while any lane is
            # non-stationary (the fixed 2-iter budget's failure mode);
            # NaN-safe so diverged lanes escalate too.
            def needs_help(st):
                _, _, gn = st
                return ~(jnp.max(gn) <= self.kernel_tol_grad)

            (V, cost, gnorm), rounds = _escalate(
                one_round, one_round(carry.V), needs_help,
                self.kernel_max_extra_rounds)
            z = jnp.zeros((B,), states.dtype)
            iters = jnp.broadcast_to(
                (1 + rounds) * self.kernel_iters, (B,)).astype(jnp.int32)
            diag = SolveDiag(cost, z, iters, gnorm)
        elif self.fast and g_static is not None:
            # Forward the static gravity — a non-default params.g must not
            # be silently replaced by the module default on the fast path
            # (ADVICE r2); traced/array g routes to the generic batch
            # solver below, which honors it per lane.
            from dart_tpu.solver import pmpc_fast
            V, Z, cost = pmpc_fast.solve_batch_fast(
                bc(params.mu), aux, states, carry.V, dt=self.dt,
                u_bound=self.u_bound, max_iters=self.cfg.max_iters,
                g=float(g_static), use_pallas=self.use_pallas)
            z = jnp.zeros((B,), states.dtype)
            diag = SolveDiag(cost, z, jnp.zeros((B,), jnp.int32), z)
        else:
            sol = ilqr.solve_batch(self.ocp, self.cfg, params, aux, states,
                                   carry.V, use_pallas=self.use_pallas)
            V = sol.V
            diag = _diag(sol)
        V_next = jnp.concatenate([V[:, 1:], V[:, -1:]], axis=1)
        return PMPCCarry(V=V_next), V[:, 0], diag


# --------------------------------------------------------------------------
# RMPC (adaptive, with RLS + reference governor inside the carry)
# --------------------------------------------------------------------------

class RMPCWeights(NamedTuple):
    Qp: jnp.ndarray
    Qv: jnp.ndarray
    Ru: jnp.ndarray
    Rdu: jnp.ndarray


RMPC_DEFAULT_WEIGHTS = RMPCWeights(jnp.asarray(100.0), jnp.asarray(1.0),
                                   jnp.asarray(0.05), jnp.asarray(1.0))


class RMPCCarry(NamedTuple):
    V: jnp.ndarray               # (N, 2) warm start
    u_prev: jnp.ndarray          # (2,) previously applied tilt
    r_v: jnp.ndarray             # (4,) governor virtual reference
    rls_x: RLSState
    rls_y: RLSState
    prev_state: jnp.ndarray      # (4,) for finite-difference acceleration
    err_int: jnp.ndarray = None  # (2,) anti-stiction integral ref offset


class RMPC:
    """Adaptive MPC: RLS update -> governor -> staged ref -> solve.

    One call = one control step of `rob_ctrl.py:331-361`.
    """

    def __init__(self, N: int = 20, dt: float = 0.002, u_bound: float = 0.4,
                 du_bound: float = 0.05, vmax: float = 0.25, v_eps: float = 0.1,
                 rls_lam: float = 0.995, rls_P_max: float = 1e4,
                 dr_max: float = 0.01,
                 rg_alpha: float = 0.5, step_fraction: float = 0.2,
                 slew_exact: bool = True,
                 ki_stiction: float = 0.006, stiction_vstall: float = 0.02,
                 stiction_deadzone: float = 0.004, int_max: float = 0.08,
                 stiction_decay: float = 0.98,
                 cfg: ilqr.ILQRConfig = ilqr.ILQRConfig()):
        self.N, self.dt, self.v_eps = N, dt, v_eps
        self.rls_lam, self.dr_max, self.rg_alpha = rls_lam, dr_max, rg_alpha
        # Covariance-wind-up guard (see adapt.rls.rls_update); None disables
        # for reference-faithful unbounded forgetting.
        self.rls_P_max = rls_P_max
        self.step_fraction = step_fraction
        # Anti-stiction integral reference offset (dart_tpu extension over
        # `rob_ctrl.py:346-348`): per axis, while the object is STALLED
        # (|v| < stiction_vstall) with a residual error beyond the deadzone,
        # integrate a bounded offset into the governed target so the MPC's
        # commanded tilt keeps growing until the breakaway tilt atan(mu) is
        # crossed; the offset leaks away once the object moves or the error
        # enters the deadzone. With the plain governor the mu=0.2 lanes of
        # the MuJoCo evaluation grid park 11-21 mm short: near the target
        # the cost-optimal tilt stays below stiction breakaway, and nothing
        # in the reference formulation escapes that equilibrium
        # (README.md:101-105 grid; measured in artifacts/mujoco/rmpc_grid).
        # ki_stiction = 0.0 recovers the reference-faithful governor
        # exactly (err_int stays identically zero).
        self.ki_stiction = ki_stiction
        self.stiction_vstall = stiction_vstall
        self.stiction_deadzone = stiction_deadzone
        self.int_max = int_max
        self.stiction_decay = stiction_decay
        self.u_bound = u_bound
        self.du_bound = du_bound
        self.vmax = vmax
        self.slew_exact = slew_exact
        if slew_exact:
            # Recommended mode: slew bounds exact in the DDP box QP.
            self.ocp = make_rmpc_ocp_du(dt=dt, u_bound=u_bound,
                                        du_bound=du_bound, vmax=vmax)
        else:
            # Reference-faithful mode: slew as soft (AL) constraints, like
            # IPOPT's treatment of the g-bounds.
            self.ocp = make_rmpc_ocp(dt=dt, u_bound=u_bound,
                                     du_bound=du_bound, vmax=vmax)
        self.cfg = cfg

    def init_carry(self, state0: jnp.ndarray, dtype=jnp.float32) -> RMPCCarry:
        state0 = jnp.asarray(state0, dtype)
        return RMPCCarry(
            V=jnp.zeros((self.N, 2), dtype),
            u_prev=jnp.zeros(2, dtype),
            r_v=state0 * jnp.asarray([1, 0, 1, 0], dtype),
            rls_x=rls_init(7, dtype=dtype),
            rls_y=rls_init(7, dtype=dtype),
            prev_state=state0,
            err_int=jnp.zeros(2, dtype),
        )

    def _stiction_update(self, err_int, state, target):
        """One anti-stiction integrator step; returns (err_int', target')
        with the offset target on the position channels (see __init__)."""
        pos = jnp.stack([state[0], state[2]])
        vel = jnp.stack([state[1], state[3]])
        err = jnp.stack([target[0], target[2]]) - pos
        stalled = (jnp.abs(vel) < self.stiction_vstall) & \
            (jnp.abs(err) > self.stiction_deadzone)
        err_int = jnp.where(stalled, err_int + self.ki_stiction * err,
                            self.stiction_decay * err_int)
        err_int = jnp.clip(err_int, -self.int_max, self.int_max)
        target_aug = target + jnp.stack(
            [err_int[0], jnp.zeros_like(err_int[0]),
             err_int[1], jnp.zeros_like(err_int[1])])
        return err_int, target_aug

    def solve(self, carry: RMPCCarry, state: jnp.ndarray, target: jnp.ndarray,
              weights: RMPCWeights = RMPC_DEFAULT_WEIGHTS):
        # 1. RLS from finite-difference acceleration, features at prev state
        #    (gravity term deliberately NOT subtracted — rob_ctrl.py:341-343).
        ax_meas = (state[1] - carry.prev_state[1]) / self.dt
        ay_meas = (state[3] - carry.prev_state[3]) / self.dt
        phi = dyn.rmpc_features(carry.prev_state, self.v_eps)
        rls_x = rls_update(carry.rls_x, phi, ax_meas, self.rls_lam,
                           self.rls_P_max)
        rls_y = rls_update(carry.rls_y, phi, ay_meas, self.rls_lam,
                           self.rls_P_max)
        theta = jnp.concatenate([rls_x.theta, rls_y.theta])

        # 2. Anti-stiction offset -> reference governor -> staged reference.
        err_int, target_aug = self._stiction_update(carry.err_int, state,
                                                    target)
        r_v = reference_governor(carry.r_v, target_aug, self.dr_max,
                                 self.rg_alpha)
        ref = build_ref_traj(r_v, target_aug, self.N, self.step_fraction)

        # 3. Solve with u_prev in the augmented initial state.
        params = dyn.RMPCParams(theta=theta, v_eps=self.v_eps)
        aux = RMPCAux(ref=ref, Qp=weights.Qp, Qv=weights.Qv, Ru=weights.Ru,
                      Rdu=weights.Rdu)
        z0 = jnp.concatenate([state, carry.u_prev])
        sol = ilqr.solve(self.ocp, self.cfg, params, aux, z0, carry.V)
        if self.slew_exact:
            u = jnp.clip(carry.u_prev + sol.V[0], -self.u_bound, self.u_bound)
        else:
            u = sol.V[0]
        new_carry = RMPCCarry(V=_shift(sol.V), u_prev=u, r_v=r_v, rls_x=rls_x,
                              rls_y=rls_y, prev_state=state, err_int=err_int)
        return new_carry, u, _diag(sol)


class RMPCBatch(RMPC):
    """Batch-major RMPC: vectorised RLS/governor/reference + one constrained
    `solve_batch` (fused Pallas backward on TPU) for the whole scenario
    batch. Carry leaves all gain a leading batch dimension. With
    ``use_kernel=True`` (default) and `slew_exact`, the COMPLETE constrained
    solve — AL outer loop included — runs in one Pallas kernel per 128-lane
    tile (`ops.pallas.rmpc_solve`) when the batch is a multiple of 128 on a
    TPU backend."""

    def __init__(self, *args, kernel_iters: int = 6, kernel_alphas: int = 4,
                 kernel_al_rounds: int = 3, kernel_tol_grad: float = 5e-3,
                 kernel_max_extra_rounds: int = 2,
                 kernel_interpret: bool = False,
                 kernel_xla_fallback: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        # Fixed unrolled budget for the whole-solve kernel. Defaults match
        # the robust evaluator budget (6 iters x 3 AL rounds x 4 alphas):
        # the former throughput-tuned 2x2x3 under-converges in closed loop
        # under stiff RLS estimates (|theta| ~ 10 on rolling objects) and
        # feeds divergence back through the estimator — pass lower budgets
        # explicitly only for open-loop throughput benchmarking. Lanes that
        # remain non-stationary (projected grad > kernel_tol_grad) or
        # infeasible (viol > cfg.tol_con) after the solve trigger up to
        # `kernel_max_extra_rounds` warm kernel re-solves.
        self.kernel_iters = kernel_iters
        self.kernel_alphas = kernel_alphas
        self.kernel_al_rounds = kernel_al_rounds
        self.kernel_tol_grad = kernel_tol_grad
        self.kernel_max_extra_rounds = kernel_max_extra_rounds
        # Testing knob (mirrors PMPCBatch): run the whole-solve kernel in
        # Pallas interpreter mode on CPU so CI can reproduce kernel-path
        # closed-loop behaviour without a TPU.
        self.kernel_interpret = kernel_interpret
        # Per-lane safety net (VERDICT r2 next-2): if any lane is still
        # non-stationary/infeasible AFTER kernel escalation, one XLA
        # `solve_batch` (adaptive iterations + regularisation ladder +
        # 8-alpha backtracking) re-solves the batch and the flagged lanes
        # take its answer. `lax.cond` skips the XLA work entirely on the
        # (overwhelmingly common) steps where every lane is certified, so
        # the steady-state throughput stays at kernel speed while the
        # stiff-RLS transients get IPOPT-grade robustness.
        self.kernel_xla_fallback = kernel_xla_fallback

    def init_carry_batch(self, states0: jnp.ndarray,
                         dtype=jnp.float32) -> RMPCCarry:
        return jax.vmap(lambda s: self.init_carry(s, dtype))(states0)

    def solve_batched(self, carry: RMPCCarry, states: jnp.ndarray,
                      targets: jnp.ndarray,
                      weights: RMPCWeights = RMPC_DEFAULT_WEIGHTS,
                      use_pallas: bool = True, use_kernel: bool = True):
        """states (B, 4), targets (B, 4). Returns (carry', u (B, 2), diag)."""
        B = states.shape[0]

        def pre(carry, state, target):
            ax = (state[1] - carry.prev_state[1]) / self.dt
            ay = (state[3] - carry.prev_state[3]) / self.dt
            phi = dyn.rmpc_features(carry.prev_state, self.v_eps)
            rls_x = rls_update(carry.rls_x, phi, ax, self.rls_lam,
                               self.rls_P_max)
            rls_y = rls_update(carry.rls_y, phi, ay, self.rls_lam,
                               self.rls_P_max)
            theta = jnp.concatenate([rls_x.theta, rls_y.theta])
            err_int, target_aug = self._stiction_update(carry.err_int, state,
                                                        target)
            r_v = reference_governor(carry.r_v, target_aug, self.dr_max,
                                     self.rg_alpha)
            ref = build_ref_traj(r_v, target_aug, self.N, self.step_fraction)
            return rls_x, rls_y, theta, r_v, ref, err_int

        rls_x, rls_y, theta, r_v, refs, err_int = jax.vmap(pre)(
            carry, states, targets)
        params = dyn.RMPCParams(theta=theta,
                                g=jnp.full(B, dyn.GRAVITY_Z, states.dtype),
                                v_eps=jnp.full(B, self.v_eps, states.dtype))
        w = jax.tree.map(lambda x: jnp.broadcast_to(jnp.asarray(
            x, states.dtype), (B,)), weights)
        aux = RMPCAux(ref=refs, Qp=w.Qp, Qv=w.Qv, Ru=w.Ru, Rdu=w.Rdu)
        z0 = jnp.concatenate([states, carry.u_prev], axis=-1)
        kernel_ok = (use_kernel and self.slew_exact and B % 128 == 0 and
                     (jax.default_backend() == "tpu"
                      or self.kernel_interpret))
        if kernel_ok:
            from dart_tpu.ops.pallas.rmpc_solve import rmpc_solve_pallas
            tl = lambda x: jnp.moveaxis(x, 0, -1)
            wk = jnp.stack([w.Qp, w.Qv, w.Ru, w.Rdu])

            def one_round(V):
                Vn, cost, viol, gn = rmpc_solve_pallas(
                    tl(theta), tl(refs), wk, tl(z0), jnp.moveaxis(V, 0, -1),
                    dt=self.dt,
                    u_bound=self.u_bound, du_bound=self.du_bound,
                    vmax=self.vmax, v_eps=self.v_eps,
                    n_iters=self.kernel_iters, n_alphas=self.kernel_alphas,
                    al_rounds=self.kernel_al_rounds,
                    mu_init=self.cfg.mu_init, mu_scale=self.cfg.mu_scale,
                    mu_max=self.cfg.mu_max, tol_con=self.cfg.tol_con,
                    interpret=self.kernel_interpret)
                return jnp.moveaxis(Vn, -1, 0), cost, viol, gn

            # the kernel's gnorm is the AL-merit feedforward norm, valid at
            # active constraints too (no inactivity gating needed); lanes
            # need help when non-stationary OR infeasible (NaN-safe).
            def needs_help(st):
                _, _, vl, gn = st
                return ~(jnp.max(vl) <= self.cfg.tol_con) | \
                    ~(jnp.max(gn) <= self.kernel_tol_grad)

            (V, cost, viol, gnorm), rounds = _escalate(
                one_round, one_round(carry.V), needs_help,
                self.kernel_max_extra_rounds)
            if self.kernel_xla_fallback:
                # Per-lane XLA rescue (VERDICT r2 next-2): lanes still
                # non-stationary or infeasible after kernel escalation
                # (stiff-RLS far-target transients — the fixed unrolled
                # budget's documented failure mode) are re-solved by the
                # adaptive XLA `solve_batch` (regularisation ladder +
                # 8-alpha backtracking + AL outer loop) and take its
                # answer. The cond skips the XLA program entirely on the
                # common all-certified step, so steady-state throughput
                # stays at kernel speed.
                bad = ~(viol <= self.cfg.tol_con) | \
                    ~(gnorm <= self.kernel_tol_grad)          # (B,) NaN-safe

                def rescue(op):
                    Vk, ck, vk, gk = op
                    lane_ok = jnp.all(
                        jnp.isfinite(Vk.reshape(B, -1)), axis=1)
                    V_ws = jnp.where(lane_ok[:, None, None], Vk,
                                     jnp.zeros_like(Vk))
                    sx = ilqr.solve_batch(self.ocp, self.cfg, params, aux,
                                          z0, V_ws, use_pallas=use_pallas)
                    m3 = bad[:, None, None]
                    Vm = jnp.where(m3, sx.V, Vk)
                    # sx.grad_norm is the RAW feedforward norm — large at
                    # active slew bounds even at the optimum. Report the
                    # box-PROJECTED stationarity instead, matching the
                    # kernel gnorm semantics, so rescued lanes certify.
                    pg = ilqr.projected_grad_norm(self.ocp, params, aux,
                                                  z0, Vm)
                    return (Vm,
                            jnp.where(bad, sx.cost, ck),
                            jnp.where(bad, sx.viol, vk),
                            jnp.where(bad, pg, gk))

                V, cost, viol, gnorm = jax.lax.cond(
                    jnp.any(bad), rescue, lambda op: op,
                    (V, cost, viol, gnorm))
            iters = jnp.broadcast_to(
                (1 + rounds) * self.kernel_iters * self.kernel_al_rounds,
                (B,)).astype(jnp.int32)
            sol = ilqr.ILQRSolution(V=V, Z=None, K=None, cost=cost,
                                    viol=viol, iters=iters, grad_norm=gnorm)
        else:
            sol = ilqr.solve_batch(self.ocp, self.cfg, params, aux, z0,
                                   carry.V, use_pallas=use_pallas)
        if self.slew_exact:
            u = jnp.clip(carry.u_prev + sol.V[:, 0], -self.u_bound,
                         self.u_bound)
        else:
            u = sol.V[:, 0]
        V_next = jnp.concatenate([sol.V[:, 1:], sol.V[:, -1:]], axis=1)
        new_carry = RMPCCarry(V=V_next, u_prev=u, r_v=r_v, rls_x=rls_x,
                              rls_y=rls_y, prev_state=states,
                              err_int=err_int)
        return new_carry, u, _diag(sol)


# --------------------------------------------------------------------------
# LMPC (RL-tuned model parameters; plan-shift on emulated solver lag)
# --------------------------------------------------------------------------

class LMPCWeights(NamedTuple):
    Q: jnp.ndarray               # (8,)
    R: jnp.ndarray               # (4,) on [u, du]
    Qt: jnp.ndarray              # (8,)


LMPC_DEFAULT_WEIGHTS = LMPCWeights(
    Q=jnp.asarray([200.0, 2.0, 200.0, 2.0, 0.0, 0.0, 0.0, 0.0]),
    R=jnp.asarray([0.1, 0.1, 1.0, 1.0]),
    Qt=jnp.asarray([200.0, 2.0, 200.0, 2.0, 0.0, 0.0, 0.0, 0.0]),
)


class LMPCCarry(NamedTuple):
    V: jnp.ndarray               # (N, 2) warm start
    U_plan: jnp.ndarray          # (N, 2) last full plan (for shifting)
    plan_idx: jnp.ndarray        # int: next index into the stale plan
    u_prev: jnp.ndarray          # (2,) last applied control


class LMPC:
    """MPC over the 34-parameter learned model (nx=8, nu=2)."""

    def __init__(self, N: int = 20, dt: float = 0.002, u_bound: float = 0.4,
                 cfg: ilqr.ILQRConfig = ilqr.ILQRConfig(), fast: bool = False):
        self.N, self.dt = N, dt
        self.ocp = make_lmpc_ocp(dt=dt, u_bound=u_bound, fast=fast)
        self.cfg = cfg

    def init_carry(self, dtype=jnp.float32) -> LMPCCarry:
        return LMPCCarry(V=jnp.zeros((self.N, 2), dtype),
                         U_plan=jnp.zeros((self.N, 2), dtype),
                         plan_idx=jnp.zeros((), jnp.int32),
                         u_prev=jnp.zeros(2, dtype))

    def solve(self, carry: LMPCCarry, state: jnp.ndarray, target: jnp.ndarray,
              pvec: jnp.ndarray, weights: LMPCWeights = LMPC_DEFAULT_WEIGHTS):
        aux = LMPCAux(target=target, Q=weights.Q, R=weights.R, Qt=weights.Qt)
        z0 = jnp.concatenate([state, carry.u_prev])
        sol = ilqr.solve(self.ocp, self.cfg, pvec, aux, z0, carry.V)
        u = sol.V[0]
        new_carry = LMPCCarry(V=_shift(sol.V), U_plan=sol.V,
                              plan_idx=jnp.ones((), jnp.int32), u_prev=u)
        return new_carry, u, _diag(sol)

    def shift_plan(self, carry: LMPCCarry):
        """Reuse the stale plan when the solver "missed its deadline".

        Receding-horizon plan-shift semantics of `rlmpc2.py:1013-1018`:
        advance one step into the cached plan, holding the last entry.
        """
        idx = jnp.minimum(carry.plan_idx, self.N - 1)
        u = carry.U_plan[idx]
        new_carry = carry._replace(plan_idx=idx + 1, u_prev=u)
        return new_carry, u


class LMPCBatch(LMPC):
    """Batch-major LMPC: one `solve_batch` (fused Pallas backward on TPU)
    over the whole scenario batch, with per-lane 34-parameter vectors — the
    TPU replacement for running one CasADi worker process per scenario
    (`rlmpc2.py:228-533`). Carry leaves all gain a leading batch dimension.
    The generic jacfwd linearisation is the measured fast path on XLA
    (docs/PERFORMANCE.md "Negative result"); pass ``fast=True`` to use the
    closed-form Jacobians instead. With ``use_kernel=True`` (default) the
    COMPLETE solve runs in one Pallas kernel per 128-lane tile
    (`ops.pallas.lmpc_solve`, ~900k solves/s/chip at N=8) when the batch is
    a multiple of 128 on a TPU backend.
    """

    def __init__(self, N: int = 20, dt: float = 0.002, u_bound: float = 0.4,
                 cfg: ilqr.ILQRConfig = ilqr.ILQRConfig(), fast: bool = False,
                 kernel_iters: int = 2, kernel_alphas: int = 3,
                 kernel_tol_grad: float = 5e-3,
                 kernel_max_extra_rounds: int = 2):
        super().__init__(N=N, dt=dt, u_bound=u_bound, cfg=cfg, fast=fast)
        self.u_bound = u_bound
        # Fixed unrolled budget for the whole-solve kernel (everything is
        # VMEM-resident and compile time grows with iters * alphas * N; 2
        # iterations recover warm-started receding-horizon accuracy, same
        # trade as the PMPC kernel). NOTE: cfg.max_iters governs only the
        # XLA paths. Lanes whose post-solve projected-gradient norm exceeds
        # `kernel_tol_grad` trigger up to `kernel_max_extra_rounds` warm
        # kernel re-solves.
        self.kernel_iters = kernel_iters
        self.kernel_alphas = kernel_alphas
        self.kernel_tol_grad = kernel_tol_grad
        self.kernel_max_extra_rounds = kernel_max_extra_rounds

    def init_carry_batch(self, batch: int, dtype=jnp.float32) -> LMPCCarry:
        return jax.vmap(lambda _: self.init_carry(dtype))(jnp.arange(batch))

    def solve_batched(self, carry: LMPCCarry, states: jnp.ndarray,
                      targets: jnp.ndarray, pvecs: jnp.ndarray,
                      weights: LMPCWeights = LMPC_DEFAULT_WEIGHTS,
                      use_pallas: bool = True, use_kernel: bool = True):
        """states (B, 8), targets (B, 8), pvecs (B, 34) raw parameters.

        Returns (carry', u (B, 2), diag) — semantics of `LMPC.solve`
        vectorised over scenarios.
        """
        B = states.shape[0]
        w = jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x, states.dtype),
                                       (B,) + jnp.shape(x)), weights)
        aux = LMPCAux(target=targets, Q=w.Q, R=w.R, Qt=w.Qt)
        z0 = jnp.concatenate([states, carry.u_prev], axis=-1)
        kernel_ok = (use_kernel and B % 128 == 0 and
                     jax.default_backend() == "tpu")
        if kernel_ok:
            from dart_tpu.ops.pallas.lmpc_solve import lmpc_solve_pallas
            tl = lambda x: jnp.moveaxis(x, 0, -1)

            def one_round(V):
                # kernel-emitted max|feedforward| = free convergence diag
                Vn, cost, gn = lmpc_solve_pallas(
                    tl(pvecs), tl(w.Q), tl(w.R), tl(w.Qt), tl(targets),
                    tl(z0), jnp.moveaxis(V, 0, -1), dt=self.dt,
                    u_bound=self.u_bound,
                    n_iters=self.kernel_iters, n_alphas=self.kernel_alphas)
                return jnp.moveaxis(Vn, -1, 0), cost, gn

            def needs_help(st):
                _, _, gn = st
                return ~(jnp.max(gn) <= self.kernel_tol_grad)   # NaN-safe

            (V, cost, gnorm), rounds = _escalate(
                one_round, one_round(carry.V), needs_help,
                self.kernel_max_extra_rounds)
            z = jnp.zeros((B,), states.dtype)
            iters = jnp.broadcast_to(
                (1 + rounds) * self.kernel_iters, (B,)).astype(jnp.int32)
            sol = ilqr.ILQRSolution(V=V, Z=None, K=None, cost=cost, viol=z,
                                    iters=iters, grad_norm=gnorm)
        else:
            sol = ilqr.solve_batch(self.ocp, self.cfg, pvecs, aux, z0,
                                   carry.V, use_pallas=use_pallas)
        u = sol.V[:, 0]
        new_carry = LMPCCarry(
            V=jnp.concatenate([sol.V[:, 1:], sol.V[:, -1:]], axis=1),
            U_plan=sol.V,
            plan_idx=jnp.ones((B,), jnp.int32),
            u_prev=u)
        return new_carry, u, _diag(sol)

    def shift_plan_batched(self, carry: LMPCCarry):
        """Per-lane stale-plan shift (`rlmpc2.py:1013-1018`, batched)."""
        idx = jnp.minimum(carry.plan_idx, self.N - 1)          # (B,)
        u = jnp.take_along_axis(carry.U_plan, idx[:, None, None],
                                axis=1)[:, 0]                  # (B, 2)
        new_carry = carry._replace(plan_idx=idx + 1, u_prev=u)
        return new_carry, u
