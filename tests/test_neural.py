"""Neural (MLP) transition model: fit to the ground-truth plant, then MPC
with gradient-through-network rollouts drives the plant to the target."""

import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.models import dynamics as dyn
from dart_tpu.models import neural as neu
from dart_tpu.solver import ilqr


def _true_plant():
    """4-state tray plant with nonlinear friction (ground truth)."""

    def xdot(x, u):
        vx, vy = x[1], x[3]
        ax = -9.81 * jnp.sin(u[0]) - 0.3 * vx - 0.5 * jnp.tanh(vx / 0.05)
        ay = -9.81 * jnp.sin(u[1]) - 0.3 * vy - 0.5 * jnp.tanh(vy / 0.05)
        return jnp.stack([vx, ax, vy, ay])

    return xdot


def test_fit_and_closed_loop_through_network():
    nx = 4
    plant_xdot = _true_plant()
    rng = np.random.default_rng(0)
    X, U, Xdot = neu.collect_transitions(plant_xdot, rng, 4096, nx)

    module = neu.DynamicsMLP(nx=nx, hidden=(64, 64))
    nm = neu.NeuralModel(module=module)
    params = module.init(jax.random.PRNGKey(0), X[0], U[0])
    params, mse = neu.fit_dynamics(nm, params, X, U, Xdot,
                                   jax.random.PRNGKey(1), steps=3000)
    assert float(mse) < 5e-3, float(mse)

    # Held-out accuracy
    Xt, Ut, Yt = neu.collect_transitions(plant_xdot, rng, 512, nx)
    pred = jax.vmap(lambda x, u: neu.neural_xdot(nm, params, x, u))(Xt, Ut)
    rel = float(jnp.mean((pred - Yt) ** 2) / jnp.mean(Yt ** 2))
    assert rel < 1e-2, rel

    # MPC through the network: box-DDP differentiates the MLP via jacfwd.
    DT = 0.02
    ocp = neu.make_neural_ocp(nm, dt=DT, nx=nx, u_bound=0.4)
    target = jnp.asarray([0.06, 0.0, -0.05, 0.0], jnp.float32)
    aux = (target,
           jnp.asarray([200.0, 2.0, 200.0, 2.0], jnp.float32),
           jnp.asarray([0.1, 0.1, 1.0, 1.0], jnp.float32),
           jnp.asarray([200.0, 2.0, 200.0, 2.0], jnp.float32))
    cfg = ilqr.ILQRConfig(max_iters=15)
    N = 15
    plant_step = dyn.discretize(lambda x, u, p: plant_xdot(x, u), DT)

    @jax.jit
    def loop():
        def f(carry, _):
            V, x = carry
            z0 = jnp.concatenate([x, jnp.zeros(2, jnp.float32)])
            sol = ilqr.solve(ocp, cfg, params, aux, z0, V)
            u = sol.V[0]
            Vn = jnp.concatenate([sol.V[1:], sol.V[-1:]])
            return (Vn, plant_step(x, u, None)), x

        (_, x_fin), _ = jax.lax.scan(
            f, (jnp.zeros((N, 2), jnp.float32), jnp.zeros(nx, jnp.float32)),
            None, length=250)
        return x_fin

    x_fin = loop()
    err = float(jnp.linalg.norm(x_fin[jnp.asarray([0, 2])] -
                                target[jnp.asarray([0, 2])]))
    assert err < 0.01, err
