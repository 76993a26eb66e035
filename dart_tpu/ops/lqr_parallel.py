"""Horizon-parallel LQR via `lax.associative_scan` (Sarkka &
Garcia-Fernandez, "Temporal Parallelization of Bayesian Smoothers and
LQT", 2021).

The framework's sequence-parallelism analog (SURVEY.md section 5.7): the
Riccati backward recursion is reformulated as an associative combination of
conditional-value-function elements, reducing the dependency depth over the
horizon from O(N) to O(log N). For the tray horizons (N = 15-20) the fused
sequential Pallas kernel wins; this path exists for long-horizon OCPs
(e.g. full-episode trajectory optimisation) where the horizon axis, not the
batch axis, is the bottleneck.

Problem: x_{k+1} = A_k x_k + B_k u_k,  cost  sum_k 0.5 x'Q_k x + 0.5 u'R_k u
+ terminal 0.5 x'Q_N x  (tracking offsets handled by shifting coordinates).

Element e = (Aa, b, C, eta, J); combining e_i (earlier) with e_j (later):
  e_j o e_i = (
    Aa_j M Aa_i,
    Aa_j M (b_i + C_i eta_j) + b_j,
    Aa_j M C_i Aa_j' + C_j,
    Aa_i' N (eta_j - J_j b_i) + eta_i,
    Aa_i' N J_j Aa_i + J_i,
  )  with  M = (I + C_i J_j)^-1,  N = (I + J_j C_i)^-1.

Value function at k: V_k(x) = 0.5 x' S_k x - v_k' x with (S_k, v_k) =
(J, eta) of the suffix combination k..N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _combine(ej, ei):
    """Combine later-suffix element ej with the earlier stage ei.

    With reverse associative scan the operator receives (later, earlier).
    """
    Aj, bj, Cj, ej_, Jj = ej
    Ai, bi, Ci, ei_, Ji = ei
    n = Ai.shape[-1]
    eye = jnp.eye(n, dtype=Ai.dtype)
    mv = lambda Mx, v: jnp.einsum("...ij,...j->...i", Mx, v)
    M = jnp.linalg.solve(eye + Ci @ Jj, jnp.broadcast_to(eye, Ci.shape))
    Nn = jnp.linalg.solve(eye + Jj @ Ci, jnp.broadcast_to(eye, Ci.shape))
    AiT = Ai.swapaxes(-1, -2)
    A_out = Aj @ M @ Ai
    b_out = mv(Aj @ M, bi + mv(Ci, ej_)) + bj
    C_out = Aj @ M @ Ci @ Aj.swapaxes(-1, -2) + Cj
    eta_out = mv(AiT @ Nn, ej_ - mv(Jj, bi)) + ei_
    J_out = AiT @ Nn @ Jj @ Ai + Ji
    return (A_out, b_out, C_out, eta_out, J_out)


def lqr_backward_parallel(A, B, Q, R, QN):
    """All value functions (S_k, v_k), k = 0..N, in O(log N) depth.

    Args: A (N,n,n), B (N,n,m), Q (N,n,n), R (N,m,m), QN (n,n).
    Returns S (N+1,n,n) with S[N] = QN (v terms are zero for the homogeneous
    regulator; tracking handled by coordinate shift at the call site).
    """
    N, n, m = B.shape
    dtype = A.dtype
    zeros_b = jnp.zeros((N, n), dtype)
    Rinv = jnp.linalg.inv(R)
    C = jnp.einsum("kij,kjl,kml->kim", B, Rinv, B)  # B R^-1 B'
    elems = (A, zeros_b, C, jnp.zeros((N, n), dtype), Q)
    # terminal element
    eT = (jnp.zeros((1, n, n), dtype), jnp.zeros((1, n), dtype),
          jnp.zeros((1, n, n), dtype), jnp.zeros((1, n), dtype), QN[None])
    full = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), elems, eT)
    combined = jax.lax.associative_scan(_combine, full, reverse=True, axis=0)
    S = combined[4]
    return S


def lqr_backward_sequential(A, B, Q, R, QN):
    """Reference: classic Riccati recursion, same convention."""
    N = A.shape[0]

    def step(S, inp):
        A_k, B_k, Q_k, R_k = inp
        K = jnp.linalg.solve(R_k + B_k.T @ S @ B_k, B_k.T @ S @ A_k)
        S_new = Q_k + A_k.T @ S @ (A_k - B_k @ K)
        return S_new, S_new

    S_final, Ss = jax.lax.scan(step, QN, (A, B, Q, R), reverse=True)
    return jnp.concatenate([Ss, QN[None]], axis=0)


def lqr_gains(A, B, R, S):
    """Feedback gains K_k = (R + B'S_{k+1}B)^-1 B'S_{k+1}A from the value
    matrices (S has N+1 entries)."""
    S_next = S[1:]
    BtS = jnp.einsum("kji,kjl->kil", B, S_next)
    K = jnp.linalg.solve(R + BtS @ B, BtS @ A)
    return K
