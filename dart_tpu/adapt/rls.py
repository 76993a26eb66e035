"""Recursive least squares with forgetting, as a pure scan step.

Replaces the numpy RLS of the reference
(`RMPC/dev_dual/controller/np_mpc_adaptive_with_linear_regressor.py:10-30`):
K = P phi / (lam + phi' P phi); theta += K err; P = (P - K phi' P) / lam.

The state is an explicit pytree so the estimator vmaps across scenario
batches and lives inside `lax.scan` closed loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RLSState(NamedTuple):
    theta: jnp.ndarray   # (p,)
    P: jnp.ndarray       # (p, p)


def rls_init(p: int, P0: float = 1e3, theta0: jnp.ndarray | None = None,
             dtype=jnp.float32) -> RLSState:
    theta = jnp.zeros(p, dtype) if theta0 is None else jnp.asarray(theta0, dtype)
    return RLSState(theta=theta, P=jnp.eye(p, dtype=dtype) * P0)


def rls_update(s: RLSState, phi: jnp.ndarray, y: jnp.ndarray,
               lam: float = 0.995, P_max: float | None = None) -> RLSState:
    """One RLS step. `P_max` (optional) caps trace(P): with forgetting
    (lam < 1) and vanishing excitation — e.g. the object parked at the
    target — P grows without bound ("covariance wind-up") and theta
    eventually blows up; the reference sidesteps this only by *exiting its
    loop at convergence* (`rob_ctrl.py:391-414`). The clamp makes long
    steady-state operation safe."""
    Pphi = s.P @ phi
    denom = lam + phi @ Pphi
    K = Pphi / denom
    err = y - phi @ s.theta
    theta = s.theta + K * err
    P = (s.P - jnp.outer(K, phi) @ s.P) / lam
    if P_max is not None:
        tr = jnp.trace(P)
        P = P * jnp.minimum(1.0, P_max / jnp.maximum(tr, 1e-12))
    return RLSState(theta=theta, P=P)
