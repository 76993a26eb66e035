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


def make_pmpc_ocp(dt: float = 0.002, u_bound: float = 0.6) -> OCPDef:
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

    return OCPDef(
        step=lambda z, v, p: step_x(z, v, p),
        stage_cost=stage_cost,
        term_cost=term_cost,
        u_lo=(-u_bound, -u_bound),
        u_hi=(u_bound, u_bound),
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


def make_rmpc_ocp(dt: float = 0.002, u_bound: float = 0.4,
                  du_bound: float = 0.05, vmax: float = 0.25) -> OCPDef:
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

    return OCPDef(
        step=step,
        stage_cost=stage_cost,
        term_cost=term_cost,
        u_lo=(-u_bound, -u_bound),
        u_hi=(u_bound, u_bound),
        constraints=constraints,
        n_con=8,
    )


def make_rmpc_ocp_du(dt: float = 0.002, u_bound: float = 0.4,
                     du_bound: float = 0.05, vmax: float = 0.25) -> OCPDef:
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

    return OCPDef(
        step=step,
        stage_cost=stage_cost,
        term_cost=term_cost,
        u_lo=(-du_bound, -du_bound),
        u_hi=(du_bound, du_bound),
        constraints=constraints,
        n_con=4,
    )


# --------------------------------------------------------------------------
# LMPC
# --------------------------------------------------------------------------

class LMPCAux(NamedTuple):
    target: jnp.ndarray          # (8,) constant reference (`rlmpc2.py:448,460`)
    Q: jnp.ndarray               # (8,) stage state weights
    R: jnp.ndarray               # (4,) weights on [u0, u1, du0, du1]
    Qt: jnp.ndarray              # (8,) terminal state weights


def make_lmpc_ocp(dt: float = 0.002, u_bound: float = 0.4) -> OCPDef:
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

    return OCPDef(
        step=step,
        stage_cost=stage_cost,
        term_cost=term_cost,
        u_lo=(-u_bound, -u_bound),
        u_hi=(u_bound, u_bound),
    )
