"""Mesh-sharded 18-config sweep on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.io import scenes
from dart_tpu.parallel import sweep as sweep_mod
from dart_tpu.rollout.evaluate import make_pmpc_evaluator


def test_grid_has_18_configs():
    b = scenes.sweep_grid()
    assert b.size == 18
    assert int(jnp.sum(b.shape_id == 0)) == 6
    assert float(b.mass.min()) == 1.0 and float(b.mass.max()) == 2.0


def test_pad_to_multiple():
    b = scenes.sweep_grid()
    p, n = scenes.pad_to_multiple(b, 8)
    assert n == 18 and p.size == 24
    assert float(p.mass[-1]) == float(b.mass[-1])


def test_sharded_sweep_matches_vmap_and_succeeds():
    """The 18-config PMPC sweep over an 8-device mesh: (a) identical to the
    single-device vmap result, (b) meets the reference success criterion
    (>95% within tolerance for targets inside +-15 cm, PMPC/README.md:267)."""
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    evaluator = make_pmpc_evaluator(n_steps=1500, dt=0.002, control_every=5,
                                    warmup_steps=100, max_iters=8)
    batch = scenes.sweep_grid(targets=((0.05, -0.04),), dtype=jnp.float64)
    mesh = sweep_mod.make_mesh(8)
    res, agg = sweep_mod.run_sweep(evaluator, batch, mesh)

    # (a) parity with plain vmap on one device
    ref = jax.vmap(lambda k, m, mu, t: evaluator(k, m, mu, t))(
        batch.kappa_inv, batch.mass, batch.mu, batch.target_xy)
    assert np.allclose(np.asarray(res.metrics.steady_state_error),
                       np.asarray(ref.metrics.steady_state_error), atol=1e-10)

    # (b) success-rate gate
    conv = np.asarray(res.metrics.converged)
    assert conv.mean() > 0.95, \
        (conv, np.asarray(res.metrics.min_error))
    assert float(agg.n) == 18.0
    assert float(agg.n_converged) == conv.sum()
    assert float(agg.mean_sse) < 0.01


def test_batched_sweep_runs_and_aggregates():
    """run_sweep_batched: the 18-config RMPC sweep, one batched evaluator
    call per device shard, lanes padded per shard; padding rows must not
    leak into the aggregate."""
    from dart_tpu.rollout.evaluate import make_rmpc_batch_evaluator
    assert len(jax.devices()) >= 8
    ev = make_rmpc_batch_evaluator(n_steps=600, dt=0.002, control_every=5,
                                   warmup_steps=100, N=8, max_iters=6,
                                   use_kernel=False)
    batch = scenes.sweep_grid(targets=((0.05, -0.04),), dtype=jnp.float32)
    mesh = sweep_mod.make_mesh(8)
    res, agg = sweep_mod.run_sweep_batched(ev, batch, mesh, lane_multiple=4)
    assert res.metrics.converged.shape == (18,)
    assert float(agg.n) == 18.0
    conv = np.asarray(res.metrics.converged)
    assert float(agg.n_converged) == conv.sum()

    # Sharded+padded == the direct unsharded batch call (lanes are
    # independent; padding must not perturb the real rows).
    ref = jax.jit(ev)(batch.kappa_inv, batch.mass, batch.mu, batch.target_xy)
    assert np.allclose(np.asarray(res.metrics.steady_state_error),
                       np.asarray(ref.metrics.steady_state_error), atol=1e-6)
    assert np.array_equal(conv, np.asarray(ref.metrics.converged))
