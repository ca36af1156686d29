"""Rotation conversion tests: differential vs scipy + round trips + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from bodyfitting_tpu.ops import rotations as rot

jax.config.update("jax_enable_x64", False)


def _random_aa(rng, n=64, max_angle=np.pi * 0.95):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(1e-4, max_angle, size=(n, 1))
    return (axis * angle).astype(np.float32)


def test_rodrigues_matches_scipy(rng):
    aa = _random_aa(rng)
    got = np.asarray(rot.rodrigues(jnp.asarray(aa)))
    want = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rodrigues_at_zero_is_identity_with_finite_grad():
    aa = jnp.zeros((3,))
    m = rot.rodrigues(aa)
    np.testing.assert_allclose(np.asarray(m), np.eye(3), atol=1e-5)
    g = jax.jacobian(rot.rodrigues)(aa)
    assert np.isfinite(np.asarray(g)).all()


def test_quat_roundtrip(rng):
    aa = _random_aa(rng)
    m = rot.rodrigues(jnp.asarray(aa))
    q = rot.rotmat_to_quat(m)
    m2 = rot.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_rotmat_to_quat_matches_scipy(rng):
    aa = _random_aa(rng)
    m = R.from_rotvec(aa).as_matrix().astype(np.float32)
    got = np.asarray(rot.rotmat_to_quat(jnp.asarray(m)))
    want = R.from_matrix(m).as_quat()  # x,y,z,w
    want = np.concatenate([want[:, 3:], want[:, :3]], axis=-1)
    want *= np.where(want[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotmat_to_aa_roundtrip(rng):
    aa = _random_aa(rng)
    m = rot.rodrigues(jnp.asarray(aa))
    aa2 = np.asarray(rot.rotmat_to_aa(m))
    np.testing.assert_allclose(aa, aa2, atol=1e-4)


@pytest.mark.parametrize("special", ["pi_x", "pi_y", "pi_z", "identity"])
def test_rotmat_to_quat_edge_cases(special):
    mats = {
        "pi_x": R.from_rotvec([np.pi, 0, 0]),
        "pi_y": R.from_rotvec([0, np.pi, 0]),
        "pi_z": R.from_rotvec([0, 0, np.pi]),
        "identity": R.identity(),
    }
    m = mats[special].as_matrix().astype(np.float32)
    q = np.asarray(rot.rotmat_to_quat(jnp.asarray(m)))
    m2 = np.asarray(rot.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(m, m2, atol=1e-3)


def test_rot6d_roundtrip(rng):
    aa = _random_aa(rng)
    m = rot.rodrigues(jnp.asarray(aa))
    six = rot.rotmat_to_rot6d(m)
    m2 = rot.rot6d_to_rotmat(six)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_rot6d_gram_schmidt_on_noisy_input(rng):
    x = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    m = np.asarray(rot.rot6d_to_rotmat(x))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    det = np.linalg.det(m)
    np.testing.assert_allclose(det, np.ones_like(det), atol=1e-5)


def test_all_ops_vmap_and_jit(rng):
    aa = jnp.asarray(_random_aa(rng, n=8).reshape(2, 4, 3))
    m = jax.jit(jax.vmap(rot.rodrigues))(aa)
    assert m.shape == (2, 4, 3, 3)
    aa2 = jax.jit(rot.rotmat_to_aa)(m)
    assert aa2.shape == (2, 4, 3)


def test_rotmat_to_aa_np_matches_jax(rng):
    """Host-side mirror (used by hmr_init to avoid per-frame device
    round trips) agrees with the jax version to f32 rounding, including
    at the identity and near-pi angles."""
    aa = _random_aa(rng, n=128)
    m = np.asarray(rot.rodrigues(jnp.asarray(aa)))
    want = np.asarray(rot.rotmat_to_aa(jnp.asarray(m)))
    got = rot.rotmat_to_aa_np(m)
    np.testing.assert_allclose(got, want, atol=2e-6)
    assert got.dtype == np.float32
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (3, 3, 3))
    np.testing.assert_array_equal(rot.rotmat_to_aa_np(eye), 0.0)
