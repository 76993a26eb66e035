import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as Rot

from dart_tpu.utils import quat as q


def _rand_quat(rng, n=None):
    shape = (4,) if n is None else (n, 4)
    x = rng.normal(size=shape)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_matches_scipy(rng):
    a, b = _rand_quat(rng), _rand_quat(rng)
    got = np.asarray(q.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    ra = Rot.from_quat(a, scalar_first=True)
    rb = Rot.from_quat(b, scalar_first=True)
    want = (ra * rb).as_quat(scalar_first=True)
    # Quaternion double cover: compare up to sign
    assert np.allclose(got, want, atol=1e-12) or np.allclose(got, -want, atol=1e-12)


def test_quat_rotate_and_matrix(rng):
    a = _rand_quat(rng, 5)
    v = rng.normal(size=(5, 3))
    want = Rot.from_quat(a, scalar_first=True).apply(v)
    got = np.asarray(q.quat_rotate(jnp.asarray(a), jnp.asarray(v)))
    assert np.allclose(got, want, atol=1e-12)
    gotm = np.asarray(q.quat_to_matrix(jnp.asarray(a)))
    wantm = Rot.from_quat(a, scalar_first=True).as_matrix()
    assert np.allclose(gotm, wantm, atol=1e-12)


def test_euler_xyz_roundtrip_matches_scipy(rng):
    angles = rng.uniform(-1.2, 1.2, size=(7, 3))
    want = Rot.from_euler("xyz", angles).as_quat(scalar_first=True)
    got = np.asarray(q.quat_from_euler_xyz(jnp.asarray(angles)))
    assert np.allclose(got, want, atol=1e-12)
    back = np.asarray(q.quat_to_euler_xyz(jnp.asarray(got)))
    assert np.allclose(back, angles, atol=1e-10)


def test_tilt_to_quat_matches_reference_formula(rng):
    """The hand-rolled formula in PMPC/main_parallel.py:210-219."""
    u = rng.uniform(-0.6, 0.6, size=(4, 2))
    got = np.asarray(q.tilt_to_quat(jnp.asarray(u)))
    for i, (u0, u1) in enumerate(u):
        want = Rot.from_euler("xyz", [u1, -u0, 0.0]).as_quat(scalar_first=True)
        assert np.allclose(got[i], want, atol=1e-12)


def test_rotvec_roundtrip_matches_scipy(rng):
    a = _rand_quat(rng, 6)
    want = Rot.from_quat(a, scalar_first=True).as_rotvec()
    got = np.asarray(q.quat_to_rotvec(jnp.asarray(a)))
    assert np.allclose(got, want, atol=1e-10)
    back = np.asarray(q.rotvec_to_quat(jnp.asarray(got)))
    sign = np.sign(np.sum(back * a, axis=-1, keepdims=True))
    assert np.allclose(back * sign, a, atol=1e-10)


def test_rotvec_small_angle_stable():
    tiny = jnp.asarray([1.0, 1e-9, -2e-9, 0.5e-9])
    tiny = tiny / jnp.linalg.norm(tiny)
    rv = q.quat_to_rotvec(tiny)
    assert np.all(np.isfinite(np.asarray(rv)))
    assert np.allclose(np.asarray(q.rotvec_to_quat(rv)), np.asarray(tiny), atol=1e-12)


def test_quat_error_rotvec_matches_reference_sequence(rng):
    """mju_negQuat -> mju_mulQuat -> as_rotvec (arm.py:176-183)."""
    ee = _rand_quat(rng)
    mocap = _rand_quat(rng)
    got = np.asarray(q.quat_error_rotvec(jnp.asarray(mocap), jnp.asarray(ee)))
    r_err = Rot.from_quat(mocap, scalar_first=True) * Rot.from_quat(ee, scalar_first=True).inv()
    assert np.allclose(got, r_err.as_rotvec(), atol=1e-10)
