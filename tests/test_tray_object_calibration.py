"""Contact-plant fidelity gate against recorded MuJoCo ground truth.

`tools/calibrate_tray_object.py` drives the reference's MuJoCo world with
the dart_tpu arm stack and records (commanded tilt, realised tray tilt,
tray-frame object displacement) into
`artifacts/mujoco/tray_object_calibration.npz`. This gate replays the SAME
commanded tilt through the pure-JAX `tray_object` plant (with the
MuJoCo-calibrated tray lag) and asserts regime-level agreement — the
contact plant is an intentional reduced-order model, so the criteria are
physical-regime ones, not trajectory-exactness:

- tray tilt tracking within 0.03 rad RMS of the measured response;
- stiction: cube 2 kg / mu 0.2 stays put on both plants (< 3 mm);
- marginal slip: cube 1 kg / mu 0.1 moves < 1 cm on both, same direction;
- rolling: side-lying cylinder and sphere both roll downhill, with
  displacement within a factor of ~2 (the plant has no MuJoCo-style
  rolling-resistance contact pair).
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dart_tpu.physics import tray_object as to_mod

NPZ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "artifacts", "mujoco", "tray_object_calibration.npz")

CASES = [("cube_1.0_0.1", "cube", 1.0, 0.1),
         ("cube_2.0_0.2", "cube", 2.0, 0.2),
         ("cylinder_1.0_0.1", "cylinder", 1.0, 0.1),
         ("sphere_1.0_0.05", "sphere", 1.0, 0.05)]


@pytest.fixture(scope="module")
def traces():
    if not os.path.exists(NPZ):
        pytest.skip("calibration artifact missing; run "
                    "tools/calibrate_tray_object.py")
    return np.load(NPZ)


def _replay(shape, mass, mu, u_cmd):
    d = jnp.float64
    params = to_mod.make_params(shape, mass, mu, dtype=d, calibrated=True)

    def run():
        def f(s, u):
            s = to_mod.step(s, u, params, 0.002)
            return s, (s.p, s.theta)

        _, (ps, ths) = jax.lax.scan(f, to_mod.init_state(dtype=d),
                                    jnp.asarray(u_cmd, d))
        return ps, ths

    ps, ths = jax.jit(run)()
    return np.asarray(ps), np.asarray(ths)


def test_tray_tilt_tracking(traces):
    u_cmd = traces["u_cmd"]
    for key, shape, mass, mu in CASES:
        _, ths = _replay(shape, mass, mu, u_cmd)
        rms = float(np.sqrt(np.mean((ths - traces[f"{key}_theta"]) ** 2)))
        assert rms < 0.03, (key, rms)


def test_slide_regimes_match_mujoco(traces):
    u_cmd = traces["u_cmd"]
    disp = {}
    for key, shape, mass, mu in CASES:
        ps, _ = _replay(shape, mass, mu, u_cmd)
        disp[key] = (float(ps[-1, 0] - ps[0, 0]),
                     float(traces[f"{key}_p"][-1, 0]))

    ours, mj = disp["cube_2.0_0.2"]
    assert abs(ours) < 3e-3 and abs(mj) < 3e-3, disp   # stiction holds

    ours, mj = disp["cube_1.0_0.1"]
    assert abs(ours) < 1e-2 and abs(mj) < 1e-2, disp   # marginal slip
    # same direction when either moved measurably
    if min(abs(ours), abs(mj)) > 1e-3:
        assert np.sign(ours) == np.sign(mj), disp

    for key in ("cylinder_1.0_0.1", "sphere_1.0_0.05"):
        ours, mj = disp[key]
        assert np.sign(ours) == np.sign(mj), (key, disp)
        assert abs(mj) > 0.05, (key, disp)             # MuJoCo rolled far
        ratio = abs(ours) / abs(mj)
        assert 0.5 < ratio < 2.0, (key, disp)


def test_calibration_fit_recorded(traces):
    fit = json.loads(str(traces["fit"]))
    cal = to_mod.CALIBRATED_TRAY_LAG
    assert abs(fit["omega_n_x"] - cal[0][0]) < 1.0
    assert abs(fit["zeta_x"] - cal[1][0]) < 0.5
