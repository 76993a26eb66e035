"""OCP builders for the three tray-tilt MPC variants.

Each builder returns an `OCPDef` (static, hashable) consumed by
`dart_tpu.solver.ilqr.solve`, with per-solve data (initial state, reference,
model parameters, previous control) passed as traced arrays. The problem
definitions mirror the reference NLPs term by term:

- PMPC: `PMPC/src/controller/mpc_3d.py:36-85`   (nx=6, nu=2, N=15 typical)
- RMPC: `RMPC/dev_dual/controller/np_mpc_adaptive_with_linear_regressor.py:
  76-168` (nx=4, nu=2, N=20; slew + velocity-cap constraints, staged ref)
- LMPC: `LMPC/src/controller/rlmpc2.py:236-491` (nx=8, nu=2, N=20, 34 model
  parameters, constant target reference)

Move-suppression (du) terms are expressed by augmenting the state with the
previously applied control: z = [x, u_prev]; the dynamics append
u_prev_next = u, which keeps the problem Markovian for the Riccati sweep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dart_tpu.models import dynamics as dyn
from dart_tpu.solver.ilqr import OCPDef


# --------------------------------------------------------------------------
# PMPC
# --------------------------------------------------------------------------

class PMPCAux(NamedTuple):
    """Per-solve cost data. Weights are traced so the 18-config sweep with
    per-object tuning (`PMPC/main_parallel.py:107-122`) batches in one jit."""

    target: jnp.ndarray          # (6,) reference state
    Qp: jnp.ndarray              # position weight
    Qv: jnp.ndarray              # velocity weight
    R: jnp.ndarray               # control weight


def _pmpc_w(aux: PMPCAux, dtype):
    """Diagonal state weights: Qp on position channels, Qv on velocity."""
    return (aux.Qp * jnp.asarray([1, 0, 1, 0, 0, 0], dtype)
            + aux.Qv * jnp.asarray([0, 1, 0, 1, 0, 0], dtype))


def make_pmpc_ocp(dt: float = 0.002, u_bound: float = 0.6,
                  fast: bool = False) -> OCPDef:
    step_x = dyn.discretize(dyn.pmpc_dynamics, dt)

    def stage_cost(z, v, k, aux: PMPCAux):
        pos_err = jnp.stack([z[0] - aux.target[0], z[2] - aux.target[2]])
        vel_err = jnp.stack([z[1] - aux.target[1], z[3] - aux.target[3]])
        return (aux.Qp * jnp.sum(pos_err**2) + aux.Qv * jnp.sum(vel_err**2)
                + aux.R * jnp.sum(v**2))

    def term_cost(z, aux: PMPCAux):
        pos_err = jnp.stack([z[0] - aux.target[0], z[2] - aux.target[2]])
        vel_err = jnp.stack([z[1] - aux.target[1], z[3] - aux.target[3]])
        return aux.Qp * jnp.sum(pos_err**2) + aux.Qv * jnp.sum(vel_err**2)

    # Structure-exploiting linearisation (see dynamics.pmpc_jac docstring).
    def dyn_jac(z, v, p):
        return dyn.rk4_jac(dyn.pmpc_dynamics, dyn.pmpc_jac, z, v, p, dt)

    def cost_quad(k, z, v, lam_k, mu, aux: PMPCAux):
        w = _pmpc_w(aux, z.dtype)
        lz = 2.0 * w * (z - aux.target)
        lv = 2.0 * aux.R * v
        lzz = 2.0 * jnp.diag(w)
        lvv = 2.0 * aux.R * jnp.eye(2, dtype=z.dtype)
        lvz = jnp.zeros((2, 6), z.dtype)
        return lz, lv, lzz, lvz, lvv

    def term_quad(z, aux: PMPCAux):
        w = _pmpc_w(aux, z.dtype)
        return 2.0 * w * (z - aux.target), 2.0 * jnp.diag(w)

    return OCPDef(
        step=lambda z, v, p: step_x(z, v, p),
        stage_cost=stage_cost,
        term_cost=term_cost,
        u_lo=(-u_bound, -u_bound),
        u_hi=(u_bound, u_bound),
        dyn_jac=dyn_jac if fast else None,
        cost_quad=cost_quad if fast else None,
        term_quad=term_quad if fast else None,
    )


# --------------------------------------------------------------------------
# RMPC
# --------------------------------------------------------------------------

class RMPCAux(NamedTuple):
    ref: jnp.ndarray             # (N+1, 4) staged reference trajectory
    Qp: jnp.ndarray
    Qv: jnp.ndarray
    Ru: jnp.ndarray
    Rdu: jnp.ndarray


def _rmpc_w4(aux: RMPCAux):
    return jnp.stack([aux.Qp, aux.Qv, aux.Qp, aux.Qv])


def make_rmpc_ocp(dt: float = 0.002, u_bound: float = 0.4,
                  du_bound: float = 0.05, vmax: float = 0.25,
                  fast: bool = False) -> OCPDef:
    """State z = [px, vx, py, vy, u_prev0, u_prev1] (nz=6).

    Constraints (c <= 0), 8 per stage, matching `np_mpc...py:113-127`:
      du - du_hi, du_lo - du (x2 controls), |vx| - vmax, |vy| - vmax.
    """
    step_x = dyn.discretize(dyn.rmpc_dynamics, dt)

    def step(z, v, p):
        xn = step_x(z[:4], v, p)
        return jnp.concatenate([xn, v])

    def stage_cost(z, v, k, aux: RMPCAux):
        r = aux.ref[k]
        du = v - z[4:6]
        pos_err = jnp.stack([z[0] - r[0], z[2] - r[2]])
        vel_err = jnp.stack([z[1] - r[1], z[3] - r[3]])
        return (aux.Qp * jnp.sum(pos_err**2) + aux.Qv * jnp.sum(vel_err**2)
                + aux.Ru * jnp.sum(v**2) + aux.Rdu * jnp.sum(du**2))

    def term_cost(z, aux: RMPCAux):
        r = aux.ref[-1]
        pos_err = jnp.stack([z[0] - r[0], z[2] - r[2]])
        vel_err = jnp.stack([z[1] - r[1], z[3] - r[3]])
        return aux.Qp * jnp.sum(pos_err**2) + aux.Qv * jnp.sum(vel_err**2)

    def constraints(z, v, k, aux: RMPCAux):
        du = v - z[4:6]
        return jnp.concatenate([
            du - du_bound,           # du <= du_hi
            -du_bound - du,          # du >= du_lo
            jnp.stack([z[1] - vmax, -z[1] - vmax, z[3] - vmax, -z[3] - vmax]),
        ])

    def dyn_jac(z, v, p):
        Ad, Bd = dyn.rk4_jac(dyn.rmpc_dynamics, dyn.rmpc_jac, z[:4], v, p, dt)
        A = jnp.zeros((6, 6), z.dtype).at[:4, :4].set(Ad)
        B = jnp.concatenate([Bd, jnp.eye(2, dtype=z.dtype)], axis=0)
        return A, B

    def cost_quad(k, z, v, lam_k, mu, aux: RMPCAux):
        dtype = z.dtype
        w4 = _rmpc_w4(aux).astype(dtype)
        e4 = z[:4] - aux.ref[k]
        du = v - z[4:6]
        lz = jnp.concatenate([2.0 * w4 * e4, -2.0 * aux.Rdu * du])
        lv = 2.0 * aux.Ru * v + 2.0 * aux.Rdu * du
        rdu2 = jnp.stack([aux.Rdu, aux.Rdu]).astype(dtype)
        lzz = 2.0 * jnp.diag(jnp.concatenate([w4, rdu2]))
        lvv = 2.0 * (aux.Ru + aux.Rdu) * jnp.eye(2, dtype=dtype)
        lvz = jnp.zeros((2, 6), dtype).at[0, 4].set(-2.0 * aux.Rdu) \
            .at[1, 5].set(-2.0 * aux.Rdu)

        # PHR penalty of the 8 linear constraint rows (closed form: the
        # constraint Jacobian is constant +-1 entries).
        c = constraints(z, v, k, aux)
        t = jnp.maximum(0.0, lam_k + mu * c)
        act = (t > 0).astype(dtype)
        # rows 0,1: v_i - z_{4+i} - du_b ; rows 2,3: -(v_i - z_{4+i}) - du_b
        gv = t[0:2] - t[2:4]
        lv = lv + gv
        lz = lz.at[4:6].add(-gv)
        lz = lz.at[1].add(t[4] - t[5]).at[3].add(t[6] - t[7])
        s = mu * (act[0:2] + act[2:4])          # (2,) du-row curvature
        lvv = lvv + jnp.diag(s)
        lzz = lzz.at[4, 4].add(s[0]).at[5, 5].add(s[1]) \
            .at[1, 1].add(mu * (act[4] + act[5])) \
            .at[3, 3].add(mu * (act[6] + act[7]))
        lvz = lvz.at[0, 4].add(-s[0]).at[1, 5].add(-s[1])
        return lz, lv, lzz, lvz, lvv

    def term_quad(z, aux: RMPCAux):
        w4 = _rmpc_w4(aux).astype(z.dtype)
        e4 = z[:4] - aux.ref[-1]
        gz = jnp.concatenate([2.0 * w4 * e4, jnp.zeros(2, z.dtype)])
        gzz = 2.0 * jnp.diag(jnp.concatenate([w4, jnp.zeros(2, z.dtype)]))
        return gz, gzz

    return OCPDef(
        step=step,
        stage_cost=stage_cost,
        term_cost=term_cost,
        u_lo=(-u_bound, -u_bound),
        u_hi=(u_bound, u_bound),
        constraints=constraints,
        n_con=8,
        dyn_jac=dyn_jac if fast else None,
        cost_quad=cost_quad if fast else None,
        term_quad=term_quad if fast else None,
    )


def make_rmpc_ocp_du(dt: float = 0.002, u_bound: float = 0.4,
                     du_bound: float = 0.05, vmax: float = 0.25,
                     fast: bool = False) -> OCPDef:
    """Slew-exact RMPC formulation (the recommended real-time mode).

    The decision variable is the tilt *increment* v = du with box bounds
    (+-du_bound), handled exactly by the DDP box QP; the applied tilt is
    u = clip(u_prev + v, +-u_bound), hard by construction. This upgrades the
    reference's soft IPOPT slew constraints (`np_mpc...py:113-121`) to a
    deterministic guarantee: even when transient RLS estimates make the
    velocity-capped NLP near-infeasible, the commanded tilt sequence can
    never jump faster than the actuator layer can track. Velocity caps stay
    as augmented-Lagrangian constraints (best-effort, as in the reference).
    """
    step_x = dyn.discretize(dyn.rmpc_dynamics, dt)

    def u_of(z, v):
        return jnp.clip(z[4:6] + v, -u_bound, u_bound)

    def step(z, v, p):
        u = u_of(z, v)
        xn = step_x(z[:4], u, p)
        return jnp.concatenate([xn, u])

    def stage_cost(z, v, k, aux: RMPCAux):
        r = aux.ref[k]
        u = u_of(z, v)
        pos_err = jnp.stack([z[0] - r[0], z[2] - r[2]])
        vel_err = jnp.stack([z[1] - r[1], z[3] - r[3]])
        return (aux.Qp * jnp.sum(pos_err**2) + aux.Qv * jnp.sum(vel_err**2)
                + aux.Ru * jnp.sum(u**2) + aux.Rdu * jnp.sum(v**2))

    def term_cost(z, aux: RMPCAux):
        r = aux.ref[-1]
        pos_err = jnp.stack([z[0] - r[0], z[2] - r[2]])
        vel_err = jnp.stack([z[1] - r[1], z[3] - r[3]])
        return aux.Qp * jnp.sum(pos_err**2) + aux.Qv * jnp.sum(vel_err**2)

    def constraints(z, v, k, aux: RMPCAux):
        return jnp.stack([z[1] - vmax, -z[1] - vmax, z[3] - vmax, -z[3] - vmax])

    def dyn_jac(z, v, p):
        u = u_of(z, v)
        # clip passthrough mask (strictly-inside convention; the bound set
        # has measure zero on the solve path).
        m = ((jnp.abs(z[4:6] + v) < u_bound)).astype(z.dtype)
        Ad, Bd = dyn.rk4_jac(dyn.rmpc_dynamics, dyn.rmpc_jac, z[:4], u, p, dt)
        Bm = Bd * m[None, :]
        A = jnp.zeros((6, 6), z.dtype).at[:4, :4].set(Ad) \
            .at[:4, 4:6].set(Bm).at[4:6, 4:6].set(jnp.diag(m))
        B = jnp.concatenate([Bm, jnp.diag(m)], axis=0)
        return A, B

    def cost_quad(k, z, v, lam_k, mu, aux: RMPCAux):
        dtype = z.dtype
        u = u_of(z, v)
        m = ((jnp.abs(z[4:6] + v) < u_bound)).astype(dtype)
        w4 = _rmpc_w4(aux).astype(dtype)
        e4 = z[:4] - aux.ref[k]
        gu = 2.0 * aux.Ru * u * m              # d(Ru u^2)/d(z4|v) via clip
        lz = jnp.concatenate([2.0 * w4 * e4, gu])
        lv = 2.0 * aux.Rdu * v + gu
        hu = 2.0 * aux.Ru * m                  # (2,) clip-masked curvature
        lzz = jnp.zeros((6, 6), dtype).at[:4, :4].set(2.0 * jnp.diag(w4)) \
            .at[4, 4].set(hu[0]).at[5, 5].set(hu[1])
        lvv = jnp.diag(2.0 * aux.Rdu + hu)
        lvz = jnp.zeros((2, 6), dtype).at[0, 4].set(hu[0]).at[1, 5].set(hu[1])

        # PHR penalty of the 4 velocity-cap rows (Jacobian rows +-e1, +-e3).
        c = constraints(z, v, k, aux)
        t = jnp.maximum(0.0, lam_k + mu * c)
        act = (t > 0).astype(dtype)
        lz = lz.at[1].add(t[0] - t[1]).at[3].add(t[2] - t[3])
        lzz = lzz.at[1, 1].add(mu * (act[0] + act[1])) \
            .at[3, 3].add(mu * (act[2] + act[3]))
        return lz, lv, lzz, lvz, lvv

    def term_quad(z, aux: RMPCAux):
        w4 = _rmpc_w4(aux).astype(z.dtype)
        e4 = z[:4] - aux.ref[-1]
        gz = jnp.concatenate([2.0 * w4 * e4, jnp.zeros(2, z.dtype)])
        gzz = 2.0 * jnp.diag(jnp.concatenate([w4, jnp.zeros(2, z.dtype)]))
        return gz, gzz

    return OCPDef(
        step=step,
        stage_cost=stage_cost,
        term_cost=term_cost,
        u_lo=(-du_bound, -du_bound),
        u_hi=(du_bound, du_bound),
        constraints=constraints,
        n_con=4,
        dyn_jac=dyn_jac if fast else None,
        cost_quad=cost_quad if fast else None,
        term_quad=term_quad if fast else None,
    )


# --------------------------------------------------------------------------
# LMPC
# --------------------------------------------------------------------------

class LMPCAux(NamedTuple):
    target: jnp.ndarray          # (8,) constant reference (`rlmpc2.py:448,460`)
    Q: jnp.ndarray               # (8,) stage state weights
    R: jnp.ndarray               # (4,) weights on [u0, u1, du0, du1]
    Qt: jnp.ndarray              # (8,) terminal state weights


def make_lmpc_ocp(dt: float = 0.002, u_bound: float = 0.4,
                  fast: bool = False) -> OCPDef:
    """State z = [x(8), u_prev(2)] (nz=10); params = raw 34-vector."""
    step_x = dyn.discretize(dyn.lmpc_dynamics, dt)

    def step(z, v, p):
        xn = step_x(z[:8], v, p)
        return jnp.concatenate([xn, v])

    def stage_cost(z, v, k, aux: LMPCAux):
        e = z[:8] - aux.target
        du = v - z[8:10]
        ctrl = jnp.concatenate([v, du])
        return jnp.sum(aux.Q * e * e) + jnp.sum(aux.R * ctrl * ctrl)

    def term_cost(z, aux: LMPCAux):
        e = z[:8] - aux.target
        return jnp.sum(aux.Qt * e * e)

    def dyn_jac(z, v, p):
        Ad, Bd = dyn.rk4_jac(dyn.lmpc_dynamics, dyn.lmpc_jac, z[:8], v, p, dt)
        A = jnp.zeros((10, 10), z.dtype).at[:8, :8].set(Ad)
        B = jnp.concatenate([Bd, jnp.eye(2, dtype=z.dtype)], axis=0)
        return A, B

    def cost_quad(k, z, v, lam_k, mu, aux: LMPCAux):
        dtype = z.dtype
        Q = aux.Q.astype(dtype)
        Ru, Rdu = aux.R[0:2].astype(dtype), aux.R[2:4].astype(dtype)
        e = z[:8] - aux.target
        du = v - z[8:10]
        lz = jnp.concatenate([2.0 * Q * e, -2.0 * Rdu * du])
        lv = 2.0 * Ru * v + 2.0 * Rdu * du
        lzz = 2.0 * jnp.diag(jnp.concatenate([Q, Rdu]))
        lvv = 2.0 * jnp.diag(Ru + Rdu)
        lvz = jnp.zeros((2, 10), dtype).at[0, 8].set(-2.0 * Rdu[0]) \
            .at[1, 9].set(-2.0 * Rdu[1])
        return lz, lv, lzz, lvz, lvv

    def term_quad(z, aux: LMPCAux):
        Qt = aux.Qt.astype(z.dtype)
        e = z[:8] - aux.target
        gz = jnp.concatenate([2.0 * Qt * e, jnp.zeros(2, z.dtype)])
        gzz = 2.0 * jnp.diag(jnp.concatenate([Qt, jnp.zeros(2, z.dtype)]))
        return gz, gzz

    return OCPDef(
        step=step,
        stage_cost=stage_cost,
        term_cost=term_cost,
        u_lo=(-u_bound, -u_bound),
        u_hi=(u_bound, u_bound),
        dyn_jac=dyn_jac if fast else None,
        cost_quad=cost_quad if fast else None,
        term_quad=term_quad if fast else None,
    )
