"""Reference-trajectory generation and governor (pure JAX).

Re-implements, exactly once:

- the staged exponential reference of RMPC
  (`RMPC/dev_dual/controller/np_mpc_adaptive_with_linear_regressor.py:201-210`),
- the per-step reference governor of the RMPC driver
  (`RMPC/dev_dual/rob_ctrl.py:346-348`),
- the quintic minimum-jerk trajectory of LMPC
  (`LMPC/src/controller/rlmpc2.py:947-984`, unused on the reference main path
  but part of its API surface).
"""

from __future__ import annotations

import jax.numpy as jnp


def build_ref_traj(r_v: jnp.ndarray, target: jnp.ndarray, N: int,
                   step_fraction: float = 0.2) -> jnp.ndarray:
    """Staged reference: exponential progression from r_v toward target.

    Args:
      r_v:    (4,) virtual reference state [px, vx, py, vy].
      target: (4,) terminal target state.
      N:      horizon; returns (N+1, 4).

    Matches `AdaptiveNPMPCSmooth.build_ref_traj`: stage i tracks
    ``r_v + (1 - (1-f)^(i+1)) (target - r_v)`` on positions, zero velocity.
    """
    i = jnp.arange(N + 1, dtype=r_v.dtype)
    w = 1.0 - jnp.power(1.0 - step_fraction, i + 1.0)
    r = r_v[None, :] + w[:, None] * (target - r_v)[None, :]
    # Track zero velocity by default (velocity channels 1, 3 zeroed).
    return r * jnp.asarray([1.0, 0.0, 1.0, 0.0], dtype=r_v.dtype)


def reference_governor(r_v: jnp.ndarray, target: jnp.ndarray,
                       dr_max: float = 0.01, alpha: float = 0.5) -> jnp.ndarray:
    """One governor update: r_v += alpha * clip(target - r_v, +-dr_max).

    Applied on position channels only, velocities pinned to zero
    (`rob_ctrl.py:346-348`).
    """
    err = (target - r_v) * jnp.asarray([1.0, 0.0, 1.0, 0.0], dtype=r_v.dtype)
    step = jnp.clip(err, -dr_max, dr_max)
    return r_v + alpha * step


def quintic_trajectory(state: jnp.ndarray, target: jnp.ndarray, N: int,
                       nx: int, dt: float) -> jnp.ndarray:
    """Quintic (minimum-jerk) position reference over the horizon.

    Boundary conditions: (p0, v0, a0=0) -> (pf, vf=0, af=0) over T = N*dt;
    positions only are filled (channels 0 and 2), matching
    `RLMPC.gen_Trajectory`. Returns (N+1, nx).
    """
    p0 = jnp.stack([state[0], state[2]])
    v0 = jnp.stack([state[1], state[3]])
    pf = jnp.stack([target[0], target[2]])
    T = N * dt
    # Solve for coefficients of c5 t^5 + ... + c1 t + c0 per axis.
    tm = jnp.asarray(
        [
            [0, 0, 0, 0, 0, 1],
            [0, 0, 0, 0, 1, 0],
            [0, 0, 0, 2, 0, 0],
            [T**5, T**4, T**3, T**2, T, 1],
            [5 * T**4, 4 * T**3, 3 * T**2, 2 * T, 1, 0],
            [20 * T**3, 12 * T**2, 6 * T, 2, 0, 0],
        ],
        dtype=state.dtype,
    )
    zeros = jnp.zeros_like(p0)
    b = jnp.stack([p0, v0, zeros, pf, zeros, zeros], axis=0)  # (6, 2)
    coeffs = jnp.linalg.solve(tm, b)  # (6, 2) high->low order

    t = jnp.arange(N + 1, dtype=state.dtype) * dt
    powers = jnp.stack([t**5, t**4, t**3, t**2, t, jnp.ones_like(t)], axis=-1)
    pos = powers @ coeffs  # (N+1, 2)
    R = jnp.zeros((N + 1, nx), dtype=state.dtype)
    return R.at[:, 0].set(pos[:, 0]).at[:, 2].set(pos[:, 1])
