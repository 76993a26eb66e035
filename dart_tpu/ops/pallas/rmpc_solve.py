"""Pallas TPU kernel: the COMPLETE RMPC solve — AL outer loop included —
in one kernel launch.

RMPC is the adaptive variant (`RMPC/dev_dual/controller/
np_mpc_adaptive_with_linear_regressor.py:34-222` in the reference): an
nx=4 / nu=2 OCP over the gravity + 7-feature-regressor model whose theta is
tuned online by RLS, tracking a staged reference trajectory, with slew-rate
and velocity-cap constraints (IPOPT, 200-iteration budget). Here the whole
constrained solve runs inside ONE VMEM-resident kernel per 128-scenario
tile, in the slew-exact formulation (`solver.ocp.make_rmpc_ocp_du`):

- decision variable v = du with box bounds (+-du_bound) handled EXACTLY by
  per-stage 2x2 box QPs; applied tilt u = clip(u_prev + v, +-u_bound);
- velocity caps |vx|,|vy| <= vmax as augmented-Lagrangian constraints with
  per-lane multipliers lam (N,4,L) and penalty mu — the same PHR update as
  `solver.ilqr.solve_batch`'s outer loop, but without leaving VMEM between
  rounds;
- hand-derived closed-form RK4 linearisation (`models.dynamics.rmpc_jac` /
  `rk4_jac`, pinned to autodiff by `tests/test_structure.py`);
- Riccati backward PARTITIONED over the augmented state z = [x(4), u(2)]:
  with A = [[Ad, Bm], [0, Dm]] and B = [[Bm], [Dm]] (Dm = diag of the clip
  pass-through mask), the value Hessian splits into P (4,4), q (4,2),
  r (2,2) and every product touches only the structural nonzeros;
- multi-alpha line search on the AL-penalised cost with per-lane acceptance
  and convergence masks, reset per AL round (matching `solve_batch`).

Inputs per tile (batch on lanes, L = 128):
  theta (14, L)       RLS estimates [theta_x(7), theta_y(7)]
  ref   (N+1, 4, L)   staged reference trajectory (`build_ref_traj`)
  w     (4, L)        [Qp, Qv, Ru, Rdu]
  z0    (6, L)        [x0(4), u_prev(2)]
  V0    (N, 2, L)     warm start (du sequence)
Outputs: V (N, 2, L), cost (1, L) raw (unpenalised), viol (1, L).

Reg-free like the PMPC/LMPC kernels: the Gauss-Newton stage Hessians are
PSD by construction (diagonal state costs, PHR penalty curvature >= 0) and
Qvv >= 2*Rdu > 0; a 1e-8 jitter guards the 2x2 inverses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dart_tpu.ops.pallas.riccati import (_add_diag_vec, _boxqp2_lanes,
                                         _gains_lanes, _mm, _mT, _mv,
                                         _rk4_jac_lanes)

LANES = 128
_G = -9.81   # signed, like model.opt.gravity[2] (`rob_ctrl.py:281`)


def _rmpc_kernel(N, n_iters, n_alphas, al_rounds, dt, u_b, du_b, vmax, v_eps,
                 mu_init, mu_scale, mu_max, tol_con, roll_loops,
                 th_ref, ref_ref, w_ref, z0_ref, V0_ref,
                 V_out, cost_out, viol_out, gnorm_out):
    th = th_ref[...]            # (14, L)
    ref = ref_ref[...]          # (N+1, 4, L)
    wv = w_ref[...]             # (4, L)
    z0 = z0_ref[...]            # (6, L)
    V = V0_ref[...]             # (N, 2, L)
    Qp, Qv, Ru, Rdu = wv[0], wv[1], wv[2], wv[3]
    w4 = jnp.stack([Qp, Qv, Qp, Qv])            # (4, L)
    x0 = z0[0:4]
    up0 = z0[4:6]

    def f4(x, u):
        """xdot (4, L) — lane transcription of `models.dynamics.rmpc_dynamics`."""
        px, vx, py, vy = x[0], x[1], x[2], x[3]
        a, b = u[0], u[1]
        tx = jnp.tanh(vx / v_eps)
        ty = jnp.tanh(vy / v_eps)
        # phi = [px, vx, py, vy, tanh(vx/eps), tanh(vy/eps), 1]
        ax = (_G * jnp.sin(a) + th[0] * px + th[1] * vx + th[2] * py
              + th[3] * vy + th[4] * tx + th[5] * ty + th[6])
        ay = (_G * jnp.sin(b) + th[7] * px + th[8] * vx + th[9] * py
              + th[10] * vy + th[11] * tx + th[12] * ty + th[13])
        return jnp.stack([vx, ax, vy, ay])

    def jac4(x, u):
        """Continuous-time (A (4,4,L), B (4,2,L)) — `models.dynamics.rmpc_jac`."""
        vx, vy = x[1], x[3]
        a, b = u[0], u[1]
        tx = jnp.tanh(vx / v_eps)
        ty = jnp.tanh(vy / v_eps)
        dtx = (1.0 - tx * tx) / v_eps
        dty = (1.0 - ty * ty) / v_eps
        z = jnp.zeros_like(vx)
        o = jnp.ones_like(vx)
        r_ax = [th[0], th[1] + th[4] * dtx, th[2], th[3] + th[5] * dty]
        r_ay = [th[7], th[8] + th[11] * dtx, th[9], th[10] + th[12] * dty]
        A = jnp.stack([jnp.stack([z, o, z, z]), jnp.stack(r_ax),
                       jnp.stack([z, z, z, o]), jnp.stack(r_ay)])
        ca = _G * jnp.cos(a)
        cb = _G * jnp.cos(b)
        B = jnp.stack([jnp.stack([z, z]), jnp.stack([ca, z]),
                       jnp.stack([z, z]), jnp.stack([z, cb])])
        return A, B

    def rk4(x, u):
        k1 = f4(x, u)
        k2 = f4(x + 0.5 * dt * k1, u)
        k3 = f4(x + 0.5 * dt * k2, u)
        k4 = f4(x + dt * k3, u)
        return x + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    def con4(x):
        """Velocity caps c(x) <= 0 (`np_mpc...py:124-127`), (4, L)."""
        return jnp.stack([x[1] - vmax, -x[1] - vmax,
                          x[3] - vmax, -x[3] - vmax])

    def stage_cost_al(x, up, v, k, lam_k, mu):
        """AL-penalised stage cost (`make_rmpc_ocp_du.stage_cost` + PHR)."""
        u = jnp.clip(up + v, -u_b, u_b)
        e = x - ref[k]
        c = (jnp.sum(w4 * e * e, axis=0)
             + Ru * (u[0] * u[0] + u[1] * u[1])
             + Rdu * (v[0] * v[0] + v[1] * v[1]))
        t = jnp.maximum(0.0, lam_k + mu * con4(x))
        return c + jnp.sum(t * t - lam_k * lam_k, axis=0) / (2.0 * mu)

    def rollout_cost(V, lam, mu):
        xs = [x0]
        us = [up0]
        cost = jnp.zeros_like(Qp)
        for k in range(N):
            cost = cost + stage_cost_al(xs[k], us[k], V[k], k, lam[k], mu)
            u = jnp.clip(us[k] + V[k], -u_b, u_b)
            xs.append(rk4(xs[k], u))
            us.append(u)
        e = xs[N] - ref[N]
        cost = cost + jnp.sum(w4 * e * e, axis=0)
        return jnp.stack(xs), jnp.stack(us), cost   # (N+1,4,L), (N+1,2,L)

    alphas = [0.6 ** i for i in range(n_alphas)]

    def iteration(carry, lam, mu):
        X, U, V, cost, done, _ = carry

        # ---- backward: partitioned Riccati over z = [x(4), u_prev(2)] ----
        eT = X[N] - ref[N]
        vx4 = 2.0 * w4 * eT
        vu2 = jnp.zeros_like(up0)
        zl = jnp.zeros_like(Qp)
        P = _add_diag_vec(jnp.stack([jnp.stack([zl] * 4)] * 4), 2.0 * w4)
        q = jnp.stack([jnp.stack([zl] * 2)] * 4)    # (4, 2, L)
        r = jnp.stack([jnp.stack([zl] * 2)] * 2)    # (2, 2, L)
        Ds, K1s, K2s, gns = [], [], [], []
        for k in range(N - 1, -1, -1):
            x = X[k]
            up = U[k]
            v_k = V[k]
            s = up + v_k
            m = (jnp.abs(s) < u_b).astype(Qp.dtype)        # clip mask (2, L)
            u = jnp.clip(s, -u_b, u_b)
            Ad, Bd = _rk4_jac_lanes(f4, jac4, x, u, dt)
            Bm = Bd * m[None]                              # (4, 2, L)

            # Stage cost quadratics (`make_rmpc_ocp_du.cost_quad`).
            e = x - ref[k]
            gu = 2.0 * Ru * u * m                          # (2, L)
            hu = 2.0 * Ru * m
            e4 = 2.0 * w4 * e
            lv = 2.0 * Rdu * v_k + gu
            # PHR velocity-cap rows (Jacobian rows +-e1, +-e3).
            t = jnp.maximum(0.0, lam[k] + mu * con4(x))
            act = (t > 0).astype(Qp.dtype)
            lx4 = jnp.stack([e4[0], e4[1] + t[0] - t[1],
                             e4[2], e4[3] + t[2] - t[3]])
            diag_al = jnp.stack([zl, mu * (act[0] + act[1]),
                                 zl, mu * (act[2] + act[3])])

            AdT = _mT(Ad)
            BmT = _mT(Bm)
            core = _mv(BmT, vx4) + m * vu2                 # (2, L)
            Qx4 = lx4 + _mv(AdT, vx4)
            Qu2 = gu + core
            Qvl = lv + core

            PB = _mm(P, Bm)                                # (4, 2, L)
            qD = q * m[None]                               # (4, 2, L)
            W = PB + qD
            S1 = _mT(W)                                    # (2, 4, L)
            S2 = _mm(BmT, q) + r * m[:, None]              # (2, 2, L)
            Qxx11 = _add_diag_vec(_mm(_mm(AdT, P), Ad), 2.0 * w4 + diag_al)
            Qxx12 = _mm(AdT, W)                            # (4, 2, L)
            G = _mm(S1, Bm) + S2 * m[None]                 # (2, 2, L)
            Qvz1 = _mm(S1, Ad)                             # (2, 4, L)
            Qvz2 = _add_diag_vec(G, hu)                    # (2, 2, L)
            Qxx22 = Qvz2
            Qvv = _add_diag_vec(G, 2.0 * Rdu + hu + 1e-8)
            Qvv = 0.5 * (Qvv + _mT(Qvv))

            lo = -du_b - v_k
            hi = du_b - v_k
            d, free = _boxqp2_lanes(Qvv, Qvl, lo, hi)
            gns.append(jnp.maximum(jnp.abs(d[0]), jnp.abs(d[1])))
            cols = _gains_lanes(
                Qvv, free,
                [(Qvz1[0, j], Qvz1[1, j]) for j in range(4)]
                + [(Qvz2[0, j], Qvz2[1, j]) for j in range(2)])
            K1 = jnp.stack([jnp.stack([c[0] for c in cols[:4]]),
                            jnp.stack([c[1] for c in cols[:4]])])   # (2,4,L)
            K2 = jnp.stack([jnp.stack([c[0] for c in cols[4:]]),
                            jnp.stack([c[1] for c in cols[4:]])])   # (2,2,L)

            w2 = _mv(Qvv, d) + Qvl
            vx4 = Qx4 + _mv(_mT(K1), w2) + _mv(_mT(Qvz1), d)
            vu2 = Qu2 + _mv(_mT(K2), w2) + _mv(_mT(Qvz2), d)
            K1T_Qvv = _mm(_mT(K1), Qvv)                    # (4, 2, L)
            M1 = _mm(_mT(K1), Qvz1)                        # (4, 4, L)
            P = Qxx11 + _mm(K1T_Qvv, K1) + M1 + _mT(M1)
            P = 0.5 * (P + _mT(P))
            q = (Qxx12 + _mm(K1T_Qvv, K2) + _mm(_mT(K1), Qvz2)
                 + _mm(_mT(Qvz1), K2))
            K2T_Qvv = _mm(_mT(K2), Qvv)
            M2 = _mm(_mT(K2), Qvz2)
            r = Qxx22 + _mm(K2T_Qvv, K2) + M2 + _mT(M2)
            r = 0.5 * (r + _mT(r))
            Ds.append(d)
            K1s.append(K1)
            K2s.append(K2)
        Ds = Ds[::-1]
        K1s = K1s[::-1]
        K2s = K2s[::-1]

        # ---- forward line search with per-lane acceptance ----
        accepted = done
        X_best, U_best, V_best, c_best = X, U, V, cost
        for al in alphas:
            x = x0
            up = up0
            xs_new = [x0]
            us_new = [up0]
            vs_new = []
            c_new = jnp.zeros_like(Qp)
            for k in range(N):
                v = (V[k] + al * Ds[k] + _mv(K1s[k], x - X[k])
                     + _mv(K2s[k], up - U[k]))
                v = jnp.clip(v, -du_b, du_b)
                c_new = c_new + stage_cost_al(x, up, v, k, lam[k], mu)
                u = jnp.clip(up + v, -u_b, u_b)
                x = rk4(x, u)
                up = u
                xs_new.append(x)
                us_new.append(u)
                vs_new.append(v)
            e = x - ref[N]
            c_new = c_new + jnp.sum(w4 * e * e, axis=0)
            X_new = jnp.stack(xs_new)
            U_new = jnp.stack(us_new)
            V_new = jnp.stack(vs_new)
            newly = (~accepted) & (c_new < cost - 1e-12)
            m3 = newly[None, None, :]
            X_best = jnp.where(m3, X_new, X_best)
            U_best = jnp.where(m3, U_new, U_best)
            V_best = jnp.where(m3, V_new, V_best)
            c_best = jnp.where(newly, c_new, c_best)
            accepted = accepted | newly

        rel = (cost - c_best) / (jnp.abs(cost) + 1.0)
        done_n = done | (accepted & (rel < 1e-9)) | (~accepted)
        gnorm = gns[0]
        for g_k in gns[1:]:
            gnorm = jnp.maximum(gnorm, g_k)
        return (X_best, U_best, V_best, c_best, done_n, gnorm)

    # ---- augmented-Lagrangian outer loop (per-lane lam/mu in VMEM) ----
    # Compile-time control (VERDICT r2 next-6): small budgets unroll (the
    # warm closed-loop path keeps its cached byte-stable program); robust
    # budgets roll BOTH loops with fori_loop, so Mosaic compiles one
    # iteration body + one AL-round body instead of al_rounds*n_iters
    # copies (the r2 robust budget 6x4x3 compiled 18 copies in ~830 s).
    # Identical per-element op sequence either way; results agree to f32
    # roundoff (fusion choices may differ between the rolled body and
    # unrolled copies — gated by tests/test_rmpc_solve_kernel.py).
    roll = (n_iters * al_rounds > 4) if roll_loops is None else roll_loops

    def al_round(al_carry):
        V, lam, mu, _, _ = al_carry
        X, U, cost = rollout_cost(V, lam, mu)
        done = jnp.zeros_like(cost, dtype=jnp.bool_)
        carry = (X, U, V, cost, done, jnp.zeros_like(cost))
        if roll:
            carry = jax.lax.fori_loop(
                0, n_iters, lambda _, c: iteration(c, lam, mu), carry)
        else:
            for _ in range(n_iters):
                carry = iteration(carry, lam, mu)
        X, U, V, cost, _, gnorm = carry
        # PHR multiplier update on the round's final trajectory
        # (`ilqr.solve_batch` al_round; constraints at stages 0..N-1).
        viol = jnp.zeros_like(Qp)
        new_lam = []
        for k in range(N):
            C = con4(X[k])
            new_lam.append(jnp.maximum(0.0, lam[k] + mu[None] * C))
            viol = jnp.maximum(viol, jnp.max(jnp.maximum(C, 0.0), axis=0))
        lam = jnp.stack(new_lam)
        mu = jnp.where(viol > tol_con, jnp.minimum(mu * mu_scale, mu_max), mu)
        return (V, lam, mu, viol, gnorm)

    lam = jnp.stack([jnp.stack([jnp.zeros_like(Qp)] * 4)] * N)  # (N, 4, L)
    mu = jnp.full_like(Qp, mu_init)
    al_carry = (V, lam, mu, jnp.zeros_like(Qp), jnp.zeros_like(Qp))
    if roll:
        al_carry = jax.lax.fori_loop(0, al_rounds,
                                     lambda _, c: al_round(c), al_carry)
    else:
        for _ in range(al_rounds):
            al_carry = al_round(al_carry)
    V, lam, mu, viol, gnorm = al_carry

    # Raw (unpenalised) cost of the final iterate.
    raw = jnp.zeros_like(Qp)
    x = x0
    up = up0
    for k in range(N):
        u = jnp.clip(up + V[k], -u_b, u_b)
        e = x - ref[k]
        raw = raw + (jnp.sum(w4 * e * e, axis=0)
                     + Ru * (u[0] * u[0] + u[1] * u[1])
                     + Rdu * (V[k][0] ** 2 + V[k][1] ** 2))
        x = rk4(x, u)
        up = u
    e = x - ref[N]
    raw = raw + jnp.sum(w4 * e * e, axis=0)

    V_out[...] = V
    cost_out[...] = raw[None]
    viol_out[...] = viol[None]
    # max |feedforward| of the last AL round's last iteration — free
    # in-kernel stationarity diagnostic (the AL-merit analogue of the XLA
    # path's grad_norm).
    gnorm_out[...] = gnorm[None]


@functools.partial(jax.jit, static_argnames=(
    "dt", "u_bound", "du_bound", "vmax", "v_eps", "n_iters", "n_alphas",
    "al_rounds", "mu_init", "mu_scale", "mu_max", "tol_con", "interpret",
    "roll_loops"))
def rmpc_solve_pallas(theta, ref, w, z0, V0, dt: float,
                      u_bound: float = 0.4, du_bound: float = 0.05,
                      vmax: float = 0.25, v_eps: float = 0.1,
                      n_iters: int = 2, n_alphas: int = 3,
                      al_rounds: int = 2, mu_init: float = 10.0,
                      mu_scale: float = 10.0, mu_max: float = 1e8,
                      tol_con: float = 1e-8, interpret: bool = False,
                      roll_loops=None):
    """Batch-last layout: theta (14,Bt), ref (N+1,4,Bt), w (4,Bt) =
    [Qp,Qv,Ru,Rdu], z0 (6,Bt), V0 (N,2,Bt), Bt % 128 == 0.
    Returns (V (N,2,Bt) du sequence, cost, viol, gnorm (Bt,) each)."""
    N = V0.shape[0]
    Bt = V0.shape[-1]
    assert Bt % LANES == 0
    dtype = V0.dtype
    V0 = jnp.clip(V0, -du_bound, du_bound)

    # Tile = (S, 128) with the batch folded onto SUBLANES too: a full
    # (8, 128) f32 vreg per "lane scalar" (1024 scenarios/tile) when the
    # batch allows, falling back to single-sublane tiles. The kernel body
    # is shape-polymorphic over the trailing tile dims.
    S = 8 if Bt % (8 * LANES) == 0 else 1
    G = Bt // (S * LANES)

    kernel = functools.partial(_rmpc_kernel, N, n_iters, n_alphas, al_rounds,
                               dt, u_bound, du_bound, vmax, v_eps,
                               mu_init, mu_scale, mu_max, tol_con, roll_loops)

    def fold(x):
        return x.reshape(*x.shape[:-1], G * S, LANES)

    def spec(shape):
        def imap(i):
            return tuple([0] * (len(shape) - 1) + [i, 0])
        block = tuple(list(shape[:-1]) + [S, LANES])
        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    V, cost, viol, gnorm = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[spec((14, Bt)), spec((N + 1, 4, Bt)), spec((4, Bt)),
                  spec((6, Bt)), spec((N, 2, Bt))],
        out_specs=[spec((N, 2, Bt)), spec((1, Bt)), spec((1, Bt)),
                   spec((1, Bt))],
        out_shape=[jax.ShapeDtypeStruct((N, 2, G * S, LANES), dtype),
                   jax.ShapeDtypeStruct((1, G * S, LANES), dtype),
                   jax.ShapeDtypeStruct((1, G * S, LANES), dtype),
                   jax.ShapeDtypeStruct((1, G * S, LANES), dtype)],
        interpret=interpret,
    )(fold(theta.astype(dtype)), fold(ref.astype(dtype)),
      fold(w.astype(dtype)), fold(z0.astype(dtype)), fold(V0))
    V = V.reshape(N, 2, Bt)
    return V, cost.reshape(Bt), viol.reshape(Bt), gnorm.reshape(Bt)
