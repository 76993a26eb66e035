"""Micro-benchmark: Pallas fused Riccati backward vs the XLA scan path.

Run on TPU:  python tools/bench_riccati.py
Typical result (v5e, B=1024, N=15, nz=6): XLA ~39 ms, Pallas ~28 ms (1.4x).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dart_tpu.ops.pallas.riccati import riccati_backward_pallas
from dart_tpu.solver import ilqr


def main():
    rng = np.random.default_rng(0)
    N, nz, Bt = 15, 6, 1024
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
    eye = jnp.eye(nz, dtype=jnp.float32)
    A = mk(Bt, N, nz, nz) + eye[None, None]
    B = mk(Bt, N, nz, 2)
    lx, lu = mk(Bt, N, nz), mk(Bt, N, 2)
    h = mk(Bt, N, nz, nz)
    lxx = jnp.einsum("bnij,bnkj->bnik", h, h) + 2 * eye[None, None]
    lux = mk(Bt, N, 2, nz) * 0.1
    h2 = mk(Bt, N, 2, 2)
    luu = jnp.einsum("bnij,bnkj->bnik", h2, h2) + \
        0.5 * jnp.eye(2, dtype=jnp.float32)[None, None]
    gx = mk(Bt, nz)
    h3 = mk(Bt, nz, nz)
    gxx = jnp.einsum("bij,bkj->bik", h3, h3) + eye[None]
    V = mk(Bt, N, 2)
    u_lo = jnp.asarray([-0.6, -0.6], jnp.float32)
    u_hi = jnp.asarray([0.6, 0.6], jnp.float32)
    derivs = (A, B, lx, lu, lxx, lux, luu, gx, gxx)

    xla = jax.jit(lambda d, v: jax.vmap(
        lambda dd, vv: ilqr._backward(dd, vv, u_lo, u_hi, 1e-6))(d, v))
    jax.block_until_ready(xla(derivs, V))
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        jax.block_until_ready(xla(derivs, V))
    t_xla = (time.time() - t0) / reps
    print(f"XLA scan backward:     {t_xla * 1e3:.2f} ms")

    tl = lambda x: jnp.moveaxis(x, 0, -1)
    args = [tl(x) for x in derivs] + [tl(V)]
    pal = jax.jit(lambda *a: riccati_backward_pallas(*a, u_lo, u_hi, 1e-6))
    jax.block_until_ready(pal(*args))
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(pal(*args))
    t_pal = (time.time() - t0) / reps
    print(f"Pallas fused backward: {t_pal * 1e3:.2f} ms  "
          f"({t_xla / t_pal:.2f}x)")


if __name__ == "__main__":
    main()
