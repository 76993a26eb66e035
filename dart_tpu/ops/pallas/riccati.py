"""Pallas TPU kernel: fused batched box-DDP Riccati backward pass.

The hot inner stage of every tray-MPC solve (replacing IPOPT's KKT
factorisation). The XLA path (`dart_tpu.solver.ilqr._backward`) runs the
N-stage recursion as a `lax.scan` of many small (<=10x10) ops; this kernel
fuses the WHOLE backward sweep for a 128-scenario tile into one VMEM-resident
program: the batch lives on the 128-lane axis, every matrix entry is a lane
vector, and the per-stage algebra (Vxx propagation, exact 2x2 box-QP
active-set enumeration, masked feedback-gain solve) unrolls into pure VPU
elementwise code with zero HBM round-trips between stages.

Layout (per tile of LANES=128 scenarios), horizon N static:
  A   (N, nz, nz, L)   dynamics Jacobians w.r.t. state
  Bm  (N, nz, nu, L)   w.r.t. control
  lx  (N, nz, L)  lu (N, nu, L)  lxx (N, nz, nz, L)
  lux (N, nu, nz, L)  luu (N, nu, nu, L)
  gx  (nz, L)  gxx (nz, nz, L)   terminal expansion
  V   (N, nu, L)       current controls (for the box bounds)
Outputs: D (N, nu, L) feedforward, K (N, nu, nz, L) feedback, dV (2, L).

nu == 2 is hard-required (the tray tilt); nz is static (6 for PMPC, 10 for
LMPC's augmented state).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_BIG = 1e30


def _mm(a, b):
    """(n,k,L) @ (k,m,L) -> (n,m,L), row-blocked lane algebra.

    Row i of the result is one chain of k FMAs on (m, L) tiles:
    ``C[i] = sum_t a[i,t] * b[t]`` with the (L,) scalar-lane vector
    broadcast across the m sublanes — n*k vector ops instead of the naive
    n*m*k on (1, L) slices, same per-element FMA order (bitwise identical).
    Only leading-dim indexing and 2D broadcasts, which Mosaic lowers (the
    earlier >2D strided formulation did not).
    """
    n, k1 = a.shape[0], a.shape[1]
    k2, m = b.shape[0], b.shape[1]
    assert k1 == k2
    rows = []
    for i in range(n):
        acc = a[i, 0][None] * b[0]
        for t in range(1, k1):
            acc = acc + a[i, t][None] * b[t]
        rows.append(acc)
    return jnp.stack(rows)


def _mT(a):
    return jnp.swapaxes(a, 0, 1)


def _mv(a, v):
    """(n,k,L) @ (k,L) -> (n,L)."""
    n, k = a.shape[0], a.shape[1]
    out = []
    for i in range(n):
        acc = a[i, 0] * v[0]
        for t in range(1, k):
            acc = acc + a[i, t] * v[t]
        out.append(acc)
    return jnp.stack(out)


def _add_diag(M, val):
    """(n,n,L) + val on the diagonal, without materialising an identity
    (Pallas kernels may not capture constant arrays)."""
    n = M.shape[0]
    rows = []
    for i in range(n):
        cols = [M[i, j] + val if i == j else M[i, j] for j in range(n)]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _add_diag_vec(M, w):
    """(n,n,L) + diag(w) with w (n,L)."""
    n = M.shape[0]
    rows = []
    for i in range(n):
        cols = [M[i, j] + w[i] if i == j else M[i, j] for j in range(n)]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _scale_add_eye(M, s):
    """I + s*M for (n,n,L), without materialising an identity."""
    n = M.shape[0]
    rows = []
    for i in range(n):
        cols = [s * M[i, j] + 1.0 if i == j else s * M[i, j]
                for j in range(n)]
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def _rk4_jac_lanes(f, jac, x, v, dt):
    """Exact (Ad, Bd) of an RK4 step in (n,*,L) lane algebra.

    Mirrors `models.dynamics.rk4_jac` (exact chain rule through the four
    stages) for in-kernel use where jacfwd is unavailable: f(x,v) -> (n,L),
    jac(x,v) -> (A (n,n,L), B (n,m,L)).
    """
    k1 = f(x, v)
    x2 = x + 0.5 * dt * k1
    k2 = f(x2, v)
    x3 = x + 0.5 * dt * k2
    x4 = x + dt * f(x3, v)
    A1, B1 = jac(x, v)
    A2, B2 = jac(x2, v)
    A3, B3 = jac(x3, v)
    A4, B4 = jac(x4, v)
    dk2x = _mm(A2, _scale_add_eye(A1, 0.5 * dt))
    dk2u = _mm(A2, 0.5 * dt * B1) + B2
    dk3x = _mm(A3, _scale_add_eye(dk2x, 0.5 * dt))
    dk3u = _mm(A3, 0.5 * dt * dk2u) + B3
    dk4x = _mm(A4, _scale_add_eye(dk3x, dt))
    dk4u = _mm(A4, dt * dk3u) + B4
    Ad = _scale_add_eye(A1 + 2.0 * dk2x + 2.0 * dk3x + dk4x, dt / 6.0)
    Bd = dt / 6.0 * (B1 + 2.0 * dk2u + 2.0 * dk3u + dk4u)
    return Ad, Bd


def _gains_lanes(Quu, free, Qux_cols):
    """Feedback gains on the free set: solve H K = -(Qux * free) columnwise.

    Quu (2,2,L), free (2,L), Qux_cols an iterable of (2,L) columns.
    Returns a list of (k0, k1) lane pairs, one per column.
    """
    f0, f1 = free[0], free[1]
    h00 = Quu[0, 0] * f0 * f0 + (1.0 - f0)
    h01 = Quu[0, 1] * f0 * f1
    h11 = Quu[1, 1] * f1 * f1 + (1.0 - f1)
    deth = h00 * h11 - h01 * h01
    deth = jnp.where(jnp.abs(deth) < 1e-30, 1e-30, deth)
    out = []
    for (b0, b1) in Qux_cols:
        b0 = b0 * f0
        b1 = b1 * f1
        out.append((-(h11 * b0 - h01 * b1) / deth,
                    -(-h01 * b0 + h00 * b1) / deth))
    return out


def _boxqp2_lanes(Quu, Qu, lo, hi):
    """Exact lane-wise 2x2 box QP (mirrors `dart_tpu.ops.boxqp.boxqp2`).

    Quu: (2,2,L), Qu/lo/hi: (2,L). Returns d (2,L), free (2,L).
    """
    q00, q01, q11 = Quu[0, 0], Quu[0, 1], Quu[1, 1]
    det = q00 * q11 - q01 * q01
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)

    cand_d, cand_obj, cand_free = [], [], []
    for s0 in range(3):
        for s1 in range(3):
            f0 = jnp.where(s0 == 0, 1.0, 0.0) * jnp.ones_like(q00)
            f1 = jnp.where(s1 == 0, 1.0, 0.0) * jnp.ones_like(q00)
            c0 = lo[0] if s0 == 1 else (hi[0] if s0 == 2 else 0.0 * q00)
            c1 = lo[1] if s1 == 1 else (hi[1] if s1 == 2 else 0.0 * q00)
            if s0 == 0 and s1 == 0:
                d0 = -(q11 * Qu[0] - q01 * Qu[1]) / det
                d1 = -(-q01 * Qu[0] + q00 * Qu[1]) / det
            elif s0 == 0:
                d1 = c1
                d0 = -(Qu[0] + q01 * d1) / jnp.maximum(q00, 1e-30)
            elif s1 == 0:
                d0 = c0
                d1 = -(Qu[1] + q01 * d0) / jnp.maximum(q11, 1e-30)
            else:
                d0, d1 = c0, c1
            g0 = q00 * d0 + q01 * d1 + Qu[0]
            g1 = q01 * d0 + q11 * d1 + Qu[1]
            ok = jnp.ones_like(q00, dtype=jnp.bool_)
            for s, d, g, lo_i, hi_i in ((s0, d0, g0, lo[0], hi[0]),
                                        (s1, d1, g1, lo[1], hi[1])):
                if s == 0:
                    ok = ok & (d >= lo_i - 1e-9) & (d <= hi_i + 1e-9)
                elif s == 1:
                    ok = ok & (g >= -1e-9)
                else:
                    ok = ok & (g <= 1e-9)
            obj = 0.5 * (d0 * g0 + d1 * g1) + 0.5 * (Qu[0] * d0 + Qu[1] * d1)
            d0c = jnp.clip(d0, lo[0], hi[0])
            d1c = jnp.clip(d1, lo[1], hi[1])
            cand_d.append((d0c, d1c))
            cand_obj.append(jnp.where(ok, obj, _BIG))
            cand_free.append((f0, f1))

    best_obj = cand_obj[0]
    best_d0, best_d1 = cand_d[0]
    best_f0, best_f1 = cand_free[0]
    for i in range(1, 9):
        better = cand_obj[i] < best_obj
        best_obj = jnp.where(better, cand_obj[i], best_obj)
        best_d0 = jnp.where(better, cand_d[i][0], best_d0)
        best_d1 = jnp.where(better, cand_d[i][1], best_d1)
        best_f0 = jnp.where(better, cand_free[i][0], best_f0)
        best_f1 = jnp.where(better, cand_free[i][1], best_f1)
    d = jnp.stack([best_d0, best_d1])
    free = jnp.stack([best_f0, best_f1])
    return d, free


def _backward_kernel(nz, N, A_ref, B_ref, lx_ref, lu_ref, lxx_ref, lux_ref,
                     luu_ref, gx_ref, gxx_ref, V_ref, lo_ref, hi_ref,
                     reg_ref, D_ref, K_ref):
    Vx = gx_ref[...]            # (nz, L)
    Vxx = gxx_ref[...]          # (nz, nz, L)
    reg = reg_ref[0]            # (L,) per-lane regularisation
    u_lo = lo_ref[...]          # (2, L) broadcast bounds
    u_hi = hi_ref[...]

    for k in range(N - 1, -1, -1):
        A = A_ref[k]            # (nz, nz, L)
        Bm = B_ref[k]           # (nz, 2, L)
        lx = lx_ref[k]
        lu = lu_ref[k]
        lxx = lxx_ref[k]
        lux = lux_ref[k]
        luu = luu_ref[k]
        v_k = V_ref[k]          # (2, L)

        Qx = lx + _mv(_mT(A), Vx)
        Qu = lu + _mv(_mT(Bm), Vx)
        # state-regularised Vxx for the control blocks
        Vxx_reg = _add_diag(Vxx, reg)
        Qxx = lxx + _mm(_mT(A), _mm(Vxx, A))
        Qux = lux + _mm(_mT(Bm), _mm(Vxx_reg, A))
        Quu = luu + _mm(_mT(Bm), _mm(Vxx_reg, Bm))
        Quu = _add_diag(0.5 * (Quu + _mT(Quu)), 1e-9)

        lo = u_lo - v_k
        hi = u_hi - v_k
        d, free = _boxqp2_lanes(Quu, Qu, lo, hi)

        # Masked 2x2 solve: H = free*Quu*free + diag(1-free); K = -H^-1 Qux_f
        f0, f1 = free[0], free[1]
        h00 = Quu[0, 0] * f0 * f0 + (1.0 - f0)
        h01 = Quu[0, 1] * f0 * f1
        h11 = Quu[1, 1] * f1 * f1 + (1.0 - f1)
        deth = h00 * h11 - h01 * h01
        deth = jnp.where(jnp.abs(deth) < 1e-30, 1e-30, deth)
        Krows = []
        for j in range(nz):
            b0 = Qux[0, j] * f0
            b1 = Qux[1, j] * f1
            k0 = -(h11 * b0 - h01 * b1) / deth
            k1 = -(-h01 * b0 + h00 * b1) / deth
            Krows.append((k0, k1))
        K = jnp.stack([jnp.stack([k0 for k0, _ in Krows]),
                       jnp.stack([k1 for _, k1 in Krows])])  # (2, nz, L)

        # Value function update
        Quu_d = _mv(Quu, d)              # (2, L)
        KT_Quu_d = _mv(_mT(K), Quu_d)    # (nz, L)
        KT_Qu = _mv(_mT(K), Qu)
        QuxT_d = _mv(_mT(Qux), d)
        Vx = Qx + KT_Quu_d + KT_Qu + QuxT_d
        KT_Quu = _mm(_mT(K), Quu)        # (nz, 2, L)
        Vxx = (Qxx + _mm(KT_Quu, K) + _mm(_mT(K), Qux)
               + _mm(_mT(Qux), K))
        Vxx = 0.5 * (Vxx + _mT(Vxx))

        D_ref[k] = d
        K_ref[k] = K


@functools.partial(jax.jit, static_argnames=("interpret",))
def riccati_backward_pallas(A, B, lx, lu, lxx, lux, luu, gx, gxx, V,
                            u_lo, u_hi, reg, interpret: bool = False):
    """Batched fused backward pass.

    Batch-last layout: A (N,nz,nz,Bt), ..., V (N,2,Bt) with Bt a multiple of
    128. Returns D (N,2,Bt), K (N,2,nz,Bt).
    """
    N, nz, _, Bt = A.shape
    assert Bt % LANES == 0, f"batch {Bt} must be a multiple of {LANES}"
    dtype = A.dtype

    lo_b = jnp.broadcast_to(u_lo[:, None], (2, Bt)).astype(dtype)
    hi_b = jnp.broadcast_to(u_hi[:, None], (2, Bt)).astype(dtype)
    # reg may be scalar or per-batch (Bt,): always a (1, Bt) lane vector.
    reg_arr = jnp.broadcast_to(jnp.asarray(reg, dtype).reshape(-1)[None, :]
                               if jnp.ndim(reg) else
                               jnp.full((1, Bt), reg, dtype), (1, Bt))

    kernel = functools.partial(_backward_kernel, nz, N)

    # Batch folded onto (S, 128) sublane x lane tiles when possible (full
    # f32 vregs per "lane scalar"); kernel body is shape-polymorphic.
    S = 8 if Bt % (8 * LANES) == 0 else 1
    G = Bt // (S * LANES)

    def fold(x):
        return x.reshape(*x.shape[:-1], G * S, LANES)

    def spec(shape):
        def imap(i):
            return tuple([0] * (len(shape) - 1) + [i, 0])
        block = tuple(list(shape[:-1]) + [S, LANES])
        return pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)

    out_D = jax.ShapeDtypeStruct((N, 2, G * S, LANES), dtype)
    out_K = jax.ShapeDtypeStruct((N, 2, nz, G * S, LANES), dtype)

    D, K = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            spec((N, nz, nz, Bt)), spec((N, nz, 2, Bt)),
            spec((N, nz, Bt)), spec((N, 2, Bt)),
            spec((N, nz, nz, Bt)), spec((N, 2, nz, Bt)),
            spec((N, 2, 2, Bt)),
            spec((nz, Bt)), spec((nz, nz, Bt)),
            spec((N, 2, Bt)),
            spec((2, Bt)), spec((2, Bt)),
            spec((1, Bt)),
        ],
        out_specs=[spec((N, 2, Bt)), spec((N, 2, nz, Bt))],
        out_shape=[out_D, out_K],
        interpret=interpret,
    )(*map(fold, (A, B, lx, lu, lxx, lux, luu, gx, gxx, V, lo_b, hi_b,
                  reg_arr)))
    return D.reshape(N, 2, Bt), K.reshape(N, 2, nz, Bt)
