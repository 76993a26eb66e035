"""Experiment metrics, matching the reference definitions exactly
(`PMPC/src/logger.py:154-176`):

- steady-state error: final position error ||p_T - p*||;
- convergence time: first time the error crosses below tolerance (1 cm);
- control effort: sum ||u_k|| * dt.

All pure jnp, vmappable across scenario batches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Metrics(NamedTuple):
    steady_state_error: jnp.ndarray
    convergence_time: jnp.ndarray   # seconds; inf if never converged
    control_effort: jnp.ndarray
    min_error: jnp.ndarray
    converged: jnp.ndarray          # bool


def position_error(X: jnp.ndarray, target_xy: jnp.ndarray) -> jnp.ndarray:
    """(T+1,) Euclidean error of state channels [0, 2] vs target (2,)."""
    return jnp.linalg.norm(X[:, jnp.asarray([0, 2])] - target_xy[None, :],
                           axis=-1)


def compute_metrics(X: jnp.ndarray, U: jnp.ndarray, target_xy: jnp.ndarray,
                    dt: float, tol: float = 0.01) -> Metrics:
    err = position_error(X, target_xy)
    below = err < tol
    any_below = jnp.any(below)
    first = jnp.argmax(below)  # first True index (0 if none; guarded below)
    conv_time = jnp.where(any_below, first.astype(err.dtype) * dt,
                          jnp.asarray(jnp.inf, err.dtype))
    effort = jnp.sum(jnp.linalg.norm(U, axis=-1)) * dt
    return Metrics(
        steady_state_error=err[-1],
        convergence_time=conv_time,
        control_effort=effort,
        min_error=jnp.min(err),
        converged=any_below,
    )
