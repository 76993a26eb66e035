"""Horizon-parallel (associative-scan) Riccati vs the classic recursion."""

import numpy as np
import jax.numpy as jnp
import pytest

from dart_tpu.ops import lqr_parallel as lp


def _random_lqr(rng, N, n=6, m=2):
    A = jnp.asarray(rng.normal(size=(N, n, n)) * 0.2 + np.eye(n))
    B = jnp.asarray(rng.normal(size=(N, n, m)) * 0.3)
    Qh = rng.normal(size=(N, n, n)) * 0.3
    Q = jnp.asarray(np.einsum("kij,klj->kil", Qh, Qh) + np.eye(n)[None] * 0.5)
    Rh = rng.normal(size=(N, m, m)) * 0.2
    R = jnp.asarray(np.einsum("kij,klj->kil", Rh, Rh) + np.eye(m)[None])
    QN = jnp.asarray(np.eye(n) * 2.0)
    return A, B, Q, R, QN


@pytest.mark.parametrize("N", [1, 2, 7, 20, 64])
def test_parallel_matches_sequential(N):
    rng = np.random.default_rng(N)
    A, B, Q, R, QN = _random_lqr(rng, N)
    S_seq = lp.lqr_backward_sequential(A, B, Q, R, QN)
    S_par = lp.lqr_backward_parallel(A, B, Q, R, QN)
    assert np.allclose(np.asarray(S_seq), np.asarray(S_par),
                       atol=1e-9), N
    K_seq = lp.lqr_gains(A, B, R, S_seq)
    K_par = lp.lqr_gains(A, B, R, S_par)
    assert np.allclose(np.asarray(K_seq), np.asarray(K_par), atol=1e-9)


def test_value_matrices_positive_semidefinite():
    rng = np.random.default_rng(3)
    A, B, Q, R, QN = _random_lqr(rng, 32)
    S = lp.lqr_backward_parallel(A, B, Q, R, QN)
    for k in range(0, 33, 8):
        w = np.linalg.eigvalsh(np.asarray(S[k]))
        assert w.min() > -1e-9
