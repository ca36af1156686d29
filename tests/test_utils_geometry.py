"""Tests: translation estimation, crop transforms, mesh queries, frusta."""

import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.ops import geometry as geo
from bodyfitting_tpu.ops import mesh_queries as mq
from bodyfitting_tpu.utils import imutils
from bodyfitting_tpu.utils.cam_pose_vis import cam_pose_vis


def test_estimate_translation_recovers_known_shift(rng):
    # 3D joints + a known translation projected with the SPIN camera
    S = rng.normal(scale=0.3, size=(24, 3)).astype(np.float32)
    t_true = np.array([0.12, -0.3, 6.0], np.float32)
    f, c = 5000.0, 112.0
    P = S + t_true
    uv = np.stack(
        [f * P[:, 0] / P[:, 2] + c, f * P[:, 1] / P[:, 2] + c], 1
    )
    t = np.asarray(
        geo.estimate_translation_single(
            jnp.asarray(S), jnp.asarray(uv), jnp.ones(24)
        )
    )
    np.testing.assert_allclose(t, t_true, atol=2e-2)


def test_estimate_translation_batched(rng):
    S49 = rng.normal(scale=0.3, size=(2, 49, 3)).astype(np.float32)
    S49[..., 2] += 5.0
    f, c = 5000.0, 112.0
    uv = np.stack(
        [f * S49[..., 0] / S49[..., 2] + c,
         f * S49[..., 1] / S49[..., 2] + c,
         np.ones(S49.shape[:2], np.float32)], -1
    )
    t = np.asarray(geo.estimate_translation(jnp.asarray(S49),
                                            jnp.asarray(uv)))
    np.testing.assert_allclose(t, 0.0, atol=5e-2)   # already aligned


def test_crop_translation_roundtrip(rng):
    K = jnp.asarray(
        [[800.0, 0, 500], [0, 800.0, 400], [0, 0, 1]], jnp.float32
    )
    cam_t = jnp.asarray([0.1, -0.2, 4.0])
    center = jnp.asarray([300.0, 350.0])
    g = geo.crop_to_global_translation(cam_t, 1.2, center, 1.5, K)
    back = np.asarray(
        geo.global_to_crop_translation(g, 1.2, center, 1.5, K)
    )
    np.testing.assert_allclose(back, np.asarray(cam_t), atol=1e-5)


def test_spin_crop_uncrop_roundtrip(rng):
    img = (rng.uniform(size=(100, 80, 3)) * 255).astype(np.uint8)
    center, scale, res = [40, 50], 0.4, (64, 64)
    cropped = imutils.crop(img, center, scale, res)
    assert cropped.shape[:2] == res
    restored = imutils.uncrop(cropped, center, scale, (100, 80, 3))
    # the crop window content roughly survives the roundtrip
    t, l = 50 - 40, 40 - 40
    assert restored[20:80, 10:70].mean() > 0


def test_flip_pose_involution(rng):
    pose = rng.normal(size=(72,)).astype(np.float32)
    np.testing.assert_allclose(
        imutils.flip_pose(imutils.flip_pose(pose)), pose, atol=1e-6
    )


def test_flip_kp_involution(rng):
    kp = rng.normal(size=(49, 3)).astype(np.float32)
    np.testing.assert_allclose(
        imutils.flip_kp(imutils.flip_kp(kp)), kp, atol=1e-6
    )


def _tetra():
    verts = jnp.asarray(
        [[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32
    )
    faces = jnp.asarray(
        [[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], jnp.int32
    )
    return verts, faces


def test_inside_mesh_tetrahedron():
    verts, faces = _tetra()
    pts = jnp.asarray([
        [0.1, 0.1, 0.1],      # inside
        [0.2, 0.2, 0.2],      # inside
        [1.0, 1.0, 1.0],      # outside
        [-0.5, 0.0, 0.0],     # outside
    ])
    got = np.asarray(mq.inside_mesh(pts, verts, faces, face_block=2))
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_intersects_any():
    verts, faces = _tetra()
    origins = jnp.asarray([[-1.0, 0.2, 0.2], [-1.0, 5.0, 5.0]])
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    got = np.asarray(mq.intersects_any(origins, dirs, verts, faces))
    np.testing.assert_array_equal(got, [True, False])
    # ray pointing away misses
    got2 = np.asarray(
        mq.intersects_any(origins[:1], -dirs[:1], verts, faces)
    )
    assert not got2[0]


def test_cam_pose_vis_writes_obj(tmp_path):
    c2ws = np.stack([np.eye(4, dtype=np.float32)] * 3)
    c2ws[1, :3, 3] = [1, 0, 0]
    K = np.array([[500.0, 0, 256], [0, 500, 256], [0, 0, 1]])
    path = str(tmp_path / "cams.obj")
    cam_pose_vis(path, c2ws, K)
    from bodyfitting_tpu.io import load_obj

    mesh = load_obj(path)
    assert mesh.verts.shape == (18, 3)    # 6 verts per camera
    assert mesh.faces.shape == (15, 3)    # 5 faces per camera


def test_flip_kp_24_and_49():
    """flip_kp dispatches on joint count like the reference
    (imutils.py:137-146): 24 GT joints and the 49-joint superset."""
    from bodyfitting_tpu.utils.imutils import (
        J24_FLIP_PERM, SPIN_JOINT_FLIP_PERM, flip_kp,
    )

    rng = np.random.default_rng(0)
    kp24 = rng.normal(size=(24, 3))
    out24 = flip_kp(kp24.copy())
    np.testing.assert_allclose(out24[:, 1:], kp24[J24_FLIP_PERM][:, 1:])
    np.testing.assert_allclose(out24[:, 0], -kp24[J24_FLIP_PERM][:, 0])

    kp49 = rng.normal(size=(49, 3))
    out49 = flip_kp(kp49.copy())
    np.testing.assert_allclose(
        out49[:, 0], -kp49[SPIN_JOINT_FLIP_PERM][:, 0]
    )
    # involution: flipping twice is identity
    np.testing.assert_allclose(flip_kp(out24), kp24, atol=1e-12)
    np.testing.assert_allclose(flip_kp(out49), kp49, atol=1e-12)
