import numpy as np
import jax
import jax.numpy as jnp

from dart_tpu.models import dynamics as dyn
from dart_tpu.solver import ilqr, mppi
from dart_tpu.solver.ocp import PMPCAux, make_pmpc_ocp


def _aux(target):
    return PMPCAux(target=target, Qp=jnp.asarray(300.0),
                   Qv=jnp.asarray(2.0), R=jnp.asarray(0.2))


def test_mppi_reduces_cost_toward_ddp():
    """On the PMPC OCP, MPPI with a few refinements must close most of the
    gap between zero control and the box-DDP optimum."""
    N = 15
    ocp = make_pmpc_ocp(dt=0.02, u_bound=0.6)
    params = dyn.PMPCParams(mu=0.1, dt=0.02)
    target = jnp.asarray([0.08, 0.0, -0.05, 0.0, 0.0, 0.0])
    aux = _aux(target)
    z0 = jnp.zeros(6)

    cost_zero = float(mppi._rollout_cost(ocp, params, aux, z0,
                                         jnp.zeros((N, 2))))
    ddp = ilqr.solve(ocp, ilqr.ILQRConfig(), params, aux, z0,
                     jnp.zeros((N, 2)))
    cost_ddp = float(ddp.cost)

    cfg = mppi.MPPIConfig(n_samples=512, temperature=0.05, sigma=0.08,
                          n_iters=8)
    U, _ = mppi.solve(ocp, cfg, params, aux, z0, jnp.zeros((N, 2)),
                      jax.random.PRNGKey(0))
    cost_mppi = float(mppi._rollout_cost(ocp, params, aux, z0, U))

    assert cost_mppi < cost_zero
    # within 15% of the DDP optimum measured against the zero-control gap
    assert (cost_mppi - cost_ddp) < 0.15 * (cost_zero - cost_ddp), \
        (cost_zero, cost_mppi, cost_ddp)
    assert np.all(np.abs(np.asarray(U)) <= 0.6 + 1e-7)


def test_mppi_receding_horizon_closed_loop():
    """MPPI front-end drives the analytic plant to the target."""
    N = 15
    DT = 0.02
    ocp = make_pmpc_ocp(dt=DT, u_bound=0.6)
    params = dyn.PMPCParams(mu=0.1, dt=DT)
    target = jnp.asarray([0.06, 0.0, 0.04, 0.0, 0.0, 0.0])
    aux = _aux(target)
    cfg = mppi.MPPIConfig(n_samples=256, temperature=0.05, sigma=0.08,
                          n_iters=2)
    init_carry, stepc = mppi.make_controller(ocp, cfg, N)
    plant = dyn.discretize(dyn.pmpc_dynamics, DT)

    @jax.jit
    def run():
        def f(carry, _):
            mc, x = carry
            mc, u, _ = stepc(mc, params, aux, x)
            return (mc, plant(x, u, params)), x

        (_, x_fin), xs = jax.lax.scan(
            f, (init_carry(jax.random.PRNGKey(1), jnp.float64),
                jnp.zeros(6, jnp.float64)), None, length=300)
        return x_fin, xs

    x_fin, xs = run()
    err = float(jnp.linalg.norm(x_fin[jnp.asarray([0, 2])] -
                                target[jnp.asarray([0, 2])]))
    assert err < 0.01, err
