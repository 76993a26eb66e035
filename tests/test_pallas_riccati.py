"""Pallas fused Riccati backward-pass kernel: parity with the XLA scan path.

Runs in interpreter mode on the CPU test mesh; on TPU the same kernel
compiles via Mosaic (benchmarked at ~1.4x the XLA scan in
tools/bench_riccati.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.ops.pallas.riccati import riccati_backward_pallas
from dart_tpu.solver import ilqr


def _random_problem(rng, N=15, nz=6, Bt=128, dtype=jnp.float32):
    def mk(*shape):
        return jnp.asarray(rng.normal(size=shape) * 0.1, dtype)

    eye = jnp.eye(nz, dtype=dtype)
    A = mk(Bt, N, nz, nz) + eye[None, None]
    B = mk(Bt, N, nz, 2)
    lx = mk(Bt, N, nz)
    lu = mk(Bt, N, 2)
    h = mk(Bt, N, nz, nz)
    lxx = jnp.einsum("bnij,bnkj->bnik", h, h) + 2 * eye[None, None]
    lux = mk(Bt, N, 2, nz) * 0.1
    h2 = mk(Bt, N, 2, 2)
    luu = jnp.einsum("bnij,bnkj->bnik", h2, h2) + \
        0.5 * jnp.eye(2, dtype=dtype)[None, None]
    gx = mk(Bt, nz)
    h3 = mk(Bt, nz, nz)
    gxx = jnp.einsum("bij,bkj->bik", h3, h3) + eye[None]
    V = mk(Bt, N, 2)
    return (A, B, lx, lu, lxx, lux, luu, gx, gxx), V


def test_pallas_backward_matches_xla_scan():
    rng = np.random.default_rng(0)
    derivs, V = _random_problem(rng)
    u_lo = jnp.asarray([-0.6, -0.6], jnp.float32)
    u_hi = jnp.asarray([0.6, 0.6], jnp.float32)
    reg = 1e-6

    D_ref, K_ref, _, _ = jax.vmap(
        lambda d, v: ilqr._backward(d, v, u_lo, u_hi, reg))(derivs, V)

    tl = lambda x: jnp.moveaxis(x, 0, -1)
    D_p, K_p = riccati_backward_pallas(
        *[tl(x) for x in derivs], tl(V), u_lo, u_hi, reg, interpret=True)
    D_p = jnp.moveaxis(D_p, -1, 0)
    K_p = jnp.moveaxis(K_p, -1, 0)
    assert np.allclose(np.asarray(D_p), np.asarray(D_ref), atol=2e-5)
    assert np.allclose(np.asarray(K_p), np.asarray(K_ref), atol=2e-4)


def test_pallas_backward_respects_bounds():
    """Feedforward steps must stay inside the box relative to V."""
    rng = np.random.default_rng(1)
    derivs, V = _random_problem(rng)
    # Tight bounds: many active constraints.
    u_lo = jnp.asarray([-0.05, -0.05], jnp.float32)
    u_hi = jnp.asarray([0.05, 0.05], jnp.float32)
    V = jnp.clip(V, u_lo, u_hi)
    tl = lambda x: jnp.moveaxis(x, 0, -1)
    D_p, _ = riccati_backward_pallas(
        *[tl(x) for x in derivs], tl(V), u_lo, u_hi, 1e-6, interpret=True)
    D = np.moveaxis(np.asarray(D_p), -1, 0)
    Vn = np.asarray(V) + D
    assert np.all(Vn >= -0.05 - 1e-6) and np.all(Vn <= 0.05 + 1e-6)
