"""In-graph telemetry: io_callback tap from inside a jitted closed loop
into the native ring, plus solver robustness under degenerate inputs."""

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.io.ringlog import RingLogger
from dart_tpu.io.streaming import TelemetryTap

REC = np.dtype([("t", np.float32), ("x", np.float32, (2,)),
                ("u", np.float32, (2,))])


def test_tap_streams_from_jitted_scan(tmp_path):
    path = str(tmp_path / "stream.bin")
    tap = TelemetryTap(path, REC, capacity_records=4096)
    T = 50

    @jax.jit
    def loop():
        def f(x, k):
            u = jnp.stack([0.1 * jnp.sin(0.1 * k), 0.05 * jnp.cos(0.1 * k)])
            x = x + 0.01 * u
            tap.emit(t=k.astype(jnp.float32) * 0.002, x=x, u=u)
            return x, None

        x, _ = jax.lax.scan(f, jnp.zeros(2, jnp.float32),
                            jnp.arange(T, dtype=jnp.float32))
        return x

    x_fin = jax.block_until_ready(loop())
    tap.logger.flush()
    stats = tap.stats()
    tap.close()
    arr = RingLogger.read(path, REC)
    assert arr.shape == (T,)
    # ordered=True: records arrive in program order
    assert np.all(np.diff(arr["t"]) > 0)
    assert np.allclose(arr["x"][-1], np.asarray(x_fin), atol=1e-6)
    if stats["native"]:
        assert stats["dropped"] == 0


def test_solver_best_effort_on_degenerate_problem():
    """A pathological OCP (exploding dynamics, huge costs) must return
    finite best-effort controls with honest diagnostics, never NaNs —
    the analog of the reference's zero-torque/loss=-3 fallback."""
    from dart_tpu.solver import ilqr

    ocp = ilqr.OCPDef(
        step=lambda z, v, p: 3.0 * z + jnp.concatenate([v, v * 0]) * 10.0,
        stage_cost=lambda z, v, k, aux: 1e6 * jnp.sum(z**2) + jnp.sum(v**2),
        term_cost=lambda z, aux: 1e8 * jnp.sum(z**2),
        u_lo=(-0.1, -0.1), u_hi=(0.1, 0.1))
    z0 = jnp.asarray([5.0, -3.0, 2.0, 1.0])
    sol = ilqr.solve(ocp, ilqr.ILQRConfig(max_iters=15), None, None, z0,
                     jnp.zeros((8, 2)))
    assert np.all(np.isfinite(np.asarray(sol.V)))
    assert np.all(np.isfinite(np.asarray(sol.Z)))
    assert np.all(np.abs(np.asarray(sol.V)) <= 0.1 + 1e-9)
    assert np.isfinite(float(sol.cost))


def test_evaluator_streams_through_native_ring(tmp_path):
    """Production path (VERDICT r2 next-9): `make_pmpc_evaluator(tap=...)`
    emits per-step records from INSIDE the jitted scan through the native
    ring — `cli/pmpc --stream` end-to-end, minus argparse."""
    import jax

    from dart_tpu.io.ringlog import RingLogger
    from dart_tpu.io.streaming import EPISODE_STREAM_DTYPE, TelemetryTap
    from dart_tpu.physics.tray_object import _KAPPA_INV
    from dart_tpu.rollout.evaluate import make_pmpc_evaluator

    path = str(tmp_path / "ep.ring")
    tap = TelemetryTap(path, EPISODE_STREAM_DTYPE, capacity_records=4096)
    n_steps = 400
    ev = make_pmpc_evaluator(n_steps=n_steps, dt=0.002, control_every=5,
                             warmup_steps=100, max_iters=4, tap=tap)
    kinv = jnp.asarray(_KAPPA_INV["cube"], jnp.float32)
    res = jax.jit(ev)(kinv, jnp.float32(1.0), jnp.float32(0.1),
                      jnp.asarray([0.05, -0.04], jnp.float32))
    jax.block_until_ready(res.final_p)
    st = tap.stats()
    tap.close()
    assert st["pushed"] == n_steps, st
    assert st["dropped"] == 0, st
    arr = RingLogger.read(path, EPISODE_STREAM_DTYPE)
    assert arr.shape == (n_steps,)
    # ordered=True: records arrive in program order
    assert (np.diff(arr["k"]) == 1).all()
    # the final record's error matches the final state
    import math
    err = math.hypot(float(res.final_p[0]) - 0.05,
                     float(res.final_p[1]) + 0.04)
    assert abs(float(arr["err"][-1]) - err) < 1e-5
