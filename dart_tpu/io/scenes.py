"""Typed scene parameterisation — the replacement for the reference's
scene-asset machinery (SURVEY.md section 2.5): the 43 pre-baked
`world_*.xml` variants, the RMPC XML rewriter (`rob_ctrl.py:88-179`) and the
LMPC MjSpec live recompile (`run.py:204-241`) all reduce to arrays of
physical parameters consumed by the contact plant; "recompiling the scene"
is just selecting a different row of a batch.

The canonical evaluation grid: {cube, cylinder, sphere} x {1, 2 kg} x
{mu 0.05, 0.1, 0.2} = 18 configs (`README.md:101-105`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from dart_tpu.physics.tray_object import _KAPPA_INV, SHAPES

SHAPE_IDS = {name: i for i, name in enumerate(SHAPES)}

MASSES_18 = (1.0, 2.0)
FRICTIONS_18 = (0.05, 0.1, 0.2)


class ScenarioBatch(NamedTuple):
    """A batch of tray-object scenarios (all leaves have leading batch dim)."""

    shape_id: jnp.ndarray     # (B,) int: 0 cube, 1 cylinder, 2 sphere
    mass: jnp.ndarray         # (B,)
    mu: jnp.ndarray           # (B,)
    kappa_inv: jnp.ndarray    # (B, 2)
    target_xy: jnp.ndarray    # (B, 2) tray-relative target

    @property
    def size(self) -> int:
        return self.shape_id.shape[0]


def sweep_grid(targets=((0.05, -0.04),), dtype=jnp.float32) -> ScenarioBatch:
    """The full 18-config grid x requested targets."""
    rows = []
    for shape in SHAPES:
        for mass in MASSES_18:
            for mu in FRICTIONS_18:
                for t in targets:
                    rows.append((SHAPE_IDS[shape], mass, mu,
                                 _KAPPA_INV[shape], t))
    sid, mass, mu, kinv, txy = zip(*rows)
    return ScenarioBatch(
        shape_id=jnp.asarray(sid, jnp.int32),
        mass=jnp.asarray(mass, dtype),
        mu=jnp.asarray(mu, dtype),
        kappa_inv=jnp.asarray(kinv, dtype),
        target_xy=jnp.asarray(txy, dtype),
    )


def pad_to_multiple(batch: ScenarioBatch, multiple: int) -> tuple[ScenarioBatch, int]:
    """Pad a batch (repeating the last row) so it shards evenly over a mesh
    axis. Returns (padded batch, original size)."""
    n = batch.size
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], rem, axis=0)], 0)
    import jax
    return jax.tree.map(pad, batch), n


def random_scenarios(rng: np.random.Generator, B: int,
                     dtype=jnp.float32) -> ScenarioBatch:
    """Uniformly random scenarios over the evaluation envelope (for
    benchmarking / ensembles)."""
    sid = rng.integers(0, 3, size=B)
    kinv = np.asarray([_KAPPA_INV[SHAPES[i]] for i in sid])
    return ScenarioBatch(
        shape_id=jnp.asarray(sid, jnp.int32),
        mass=jnp.asarray(rng.uniform(0.5, 3.0, B), dtype),
        mu=jnp.asarray(rng.uniform(0.05, 0.2, B), dtype),
        kappa_inv=jnp.asarray(kinv, dtype),
        target_xy=jnp.asarray(rng.uniform(-0.1, 0.1, (B, 2)), dtype),
    )
