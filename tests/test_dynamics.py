import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dart_tpu.models import dynamics as dyn


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ------------------------- PMPC -------------------------

def test_pmpc_dynamics_closed_form(rng):
    p = dyn.PMPCParams(mu=0.1, g=-9.81, dt=0.002)
    x = rng.normal(size=6)
    u = rng.uniform(-0.5, 0.5, size=2)
    got = np.asarray(dyn.pmpc_dynamics(jnp.asarray(x), jnp.asarray(u), p))
    g, mu = -9.81, 0.1
    ax = g * np.sin(u[0]) - mu * x[1]
    ay = g * np.sin(u[1]) - mu * x[3]
    vz_new = -g * (u[0] ** 2 + u[1] ** 2)
    az = (vz_new - x[5]) / 0.002
    want = np.array([x[1], ax, x[3], ay, vz_new, az])
    assert np.allclose(got, want, atol=1e-12)


def test_pmpc_rk4_matches_manual(rng):
    p = dyn.PMPCParams(mu=0.2)
    x = rng.normal(size=6) * 0.1
    u = np.array([0.1, -0.2])
    dt = 0.002
    step = dyn.discretize(dyn.pmpc_dynamics, dt)
    got = np.asarray(step(jnp.asarray(x), jnp.asarray(u), p))

    def f(x_):
        return np.asarray(dyn.pmpc_dynamics(jnp.asarray(x_), jnp.asarray(u), p))

    k1 = f(x); k2 = f(x + dt / 2 * k1); k3 = f(x + dt / 2 * k2); k4 = f(x + dt * k3)
    want = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
    assert np.allclose(got, want, atol=1e-12)


# ------------------------- RMPC -------------------------

def test_rmpc_dynamics_matches_numpy(rng):
    theta = rng.normal(size=14) * 0.1
    p = dyn.RMPCParams(theta=jnp.asarray(theta), g=-9.81, v_eps=0.1)
    x = rng.normal(size=4) * 0.2
    u = rng.uniform(-0.4, 0.4, size=2)
    got = np.asarray(dyn.rmpc_dynamics(jnp.asarray(x), jnp.asarray(u), p))
    phi = np.array([x[0], x[1], x[2], x[3],
                    np.tanh(x[1] / 0.1), np.tanh(x[3] / 0.1), 1.0])
    ax = -9.81 * np.sin(u[0]) + phi @ theta[:7]
    ay = -9.81 * np.sin(u[1]) + phi @ theta[7:]
    assert np.allclose(got, [x[1], ax, x[3], ay], atol=1e-12)


def test_rmpc_features_batched(rng):
    xs = rng.normal(size=(5, 4))
    phis = np.asarray(dyn.rmpc_features(jnp.asarray(xs), 0.1))
    assert phis.shape == (5, 7)
    assert np.allclose(phis[:, 6], 1.0)


# ------------------------- LMPC -------------------------

def _lmpc_numpy_oracle(x, u, p):
    """Independent numpy transcription of rlmpc2.py:260-429."""
    sq = lambda v: abs(v) + 1e-6
    px, vx, py, vy, th_x, om_x, th_y, om_y = x
    a, b = u
    m_x, m_y, c_x, c_y, k_x, k_y = [sq(p[i]) for i in range(6)]
    F_s_x, F_c_x, B_x = p[6], p[7], p[8]
    v_s_x, eps_x = sq(p[9]), sq(p[10])
    F_s_y, F_c_y, B_y = p[11], p[12], p[13]
    v_s_y, eps_y = sq(p[14]), sq(p[15])
    I_x, I_y, r_x, r_y = sq(p[16]), sq(p[17]), sq(p[18]), sq(p[19])
    c_rot_x, c_rot_y = sq(p[20]), sq(p[21])
    F_s_rx, F_c_rx, B_rx = p[22], p[23], p[24]
    v_s_rx, eps_rx = sq(p[25]), sq(p[26])
    F_s_ry, F_c_ry, B_ry = p[27], p[28], p[29]
    v_s_ry, eps_ry = sq(p[30]), sq(p[31])
    h_com_x, h_com_y = sq(p[32]), sq(p[33])
    g = 9.81

    def strib(v, Fs, Fc, B, vs, eps):
        return np.tanh(v / eps) * (Fc + (Fs - Fc) * np.exp(-abs(v) / (vs + 1e-12))) + B * v

    Ff_x = strib(vx, F_s_x, F_c_x, B_x, v_s_x, eps_x)
    Ff_y = strib(vy, F_s_y, F_c_y, B_y, v_s_y, eps_y)
    v_slip_x = vx - r_x * om_y
    v_slip_y = vy - (-r_y * om_x)
    F_roll_x = strib(v_slip_x, F_s_x, F_c_x, B_x, v_s_x, eps_x)
    F_roll_y = strib(v_slip_y, F_s_y, F_c_y, B_y, v_s_y, eps_y)
    tau_x = (-r_y * F_roll_y
             - strib(om_x, F_s_rx, F_c_rx, B_rx, v_s_rx, eps_rx)
             - c_rot_x * om_x - m_y * g * h_com_x * np.sin(th_x))
    tau_y = (-r_x * F_roll_x
             - strib(om_y, F_s_ry, F_c_ry, B_ry, v_s_ry, eps_ry)
             - c_rot_y * om_y - m_x * g * h_com_y * np.sin(th_y))
    qdd_x = (m_x * g * np.sin(a) - c_x * vx - k_x * px - Ff_x - F_roll_x) / m_x
    qdd_y = (m_y * g * np.sin(b) - c_y * vy - k_y * py - Ff_y - F_roll_y) / m_y
    return np.array([vx, qdd_x, vy, qdd_y, om_x, tau_x / (I_x + 1e-12),
                     om_y, tau_y / (I_y + 1e-12)])


def test_lmpc_dynamics_matches_oracle(rng):
    for _ in range(10):
        x = rng.normal(size=8) * 0.3
        u = rng.uniform(-0.4, 0.4, size=2)
        p = rng.uniform(0.01, 1.0, size=34)
        got = np.asarray(dyn.lmpc_dynamics(jnp.asarray(x), jnp.asarray(u), jnp.asarray(p)))
        want = _lmpc_numpy_oracle(x, u, p)
        assert np.allclose(got, want, rtol=1e-10, atol=1e-12)


def test_lmpc_dynamics_grad_finite(rng):
    """The stiff Stribeck terms must stay differentiable (tanh/exp only)."""
    x = jnp.asarray(rng.normal(size=8) * 0.1)
    u = jnp.asarray([0.1, -0.1])
    p = jnp.asarray(rng.uniform(0.01, 0.5, size=34))
    J = jax.jacfwd(dyn.lmpc_dynamics, argnums=(0, 1, 2))(x, u, p)
    for j in J:
        assert np.all(np.isfinite(np.asarray(j)))


def test_lmpc_squash_mask():
    p = -np.ones(34)
    out = np.asarray(dyn.lmpc_squash_params(jnp.asarray(p)))
    squashed_idx = [0, 1, 2, 3, 4, 5, 9, 10, 14, 15, 16, 17, 18, 19, 20, 21,
                    25, 26, 30, 31, 32, 33]
    for i in range(34):
        if i in squashed_idx:
            assert out[i] == pytest.approx(1.0 + 1e-6)
        else:
            assert out[i] == -1.0


def test_dynamics_vmap_consistency(rng):
    """Batched evaluation must equal per-sample evaluation for all models."""
    B = 4
    xs6 = jnp.asarray(rng.normal(size=(B, 6)) * 0.1)
    xs4 = xs6[:, :4]
    xs8 = jnp.asarray(rng.normal(size=(B, 8)) * 0.1)
    us = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 2)))
    pp = dyn.PMPCParams()
    rp = dyn.RMPCParams(theta=jnp.asarray(rng.normal(size=14) * 0.1))
    lp = jnp.asarray(rng.uniform(0.01, 0.5, size=34))

    for f, xs, p in [(dyn.pmpc_dynamics, xs6, pp), (dyn.rmpc_dynamics, xs4, rp),
                     (dyn.lmpc_dynamics, xs8, lp)]:
        batched = np.asarray(jax.vmap(lambda x, u: f(x, u, p))(xs, us))
        single = np.stack([np.asarray(f(xs[i], us[i], p)) for i in range(B)])
        assert np.allclose(batched, single, atol=1e-12)


def test_household_presets_slide_and_topple():
    """C15e breadth: the extracted household presets load, slide under
    tilt, and the tall-narrow wineglass topples before the wide bowl."""
    import jax
    import jax.numpy as jnp

    from dart_tpu.physics import tray_object as to_mod
    from dart_tpu.physics.object_presets import PRESETS, make_preset_params

    dt = 0.002

    def final_state(name, tilt):
        params = make_preset_params(name, mu=0.1, dtype=jnp.float64)
        u = jnp.asarray(tilt, jnp.float64)

        def f(s, _):
            return to_mod.step(s, u, params, dt), None

        s, _ = jax.lax.scan(f, to_mod.init_state(dtype=jnp.float64),
                            None, length=500)
        return s

    for name in PRESETS:
        s = final_state(name, [0.12, 0.0])
        assert bool(jnp.all(jnp.isfinite(s.p))), name
        # mu=0.1, tan(0.12)>mu: every preset slides downhill
        assert float(s.p[0]) < -1e-3, (name, float(s.p[0]))

    # toppling ordering: wineglass (h_com/half_w ~ 3.4) rocks harder than
    # the bowl (~1.1) under the same aggressive tilt
    sg = final_state("wineglass", [0.35, 0.0])
    sb = final_state("bowl", [0.35, 0.0])
    rocked_g = max(float(jnp.abs(sg.q_rock[0])), float(sg.toppled))
    rocked_b = max(float(jnp.abs(sb.q_rock[0])), float(sb.toppled))
    assert rocked_g >= rocked_b, (rocked_g, rocked_b)
