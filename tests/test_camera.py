"""Camera op tests: projection vs numpy reference, rigid inverse, crop-K."""

import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.ops import camera as cam


def _np_project(points, R, t, K):
    p = points @ R.T + t
    p = p @ K.T
    return p[:, :2] / p[:, 2:3]


def test_perspective_projection_matches_numpy(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.1, -0.2, 4.0], dtype=np.float32)
    K = np.array([[500, 0, 256], [0, 500, 256], [0, 0, 1]], dtype=np.float32)
    got = np.asarray(cam.perspective_projection(jnp.asarray(pts), R, t, K))
    want = _np_project(pts, R, t, K)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_perspective_projection_view_batch(rng):
    V, N = 4, 50
    pts = rng.normal(size=(N, 3)).astype(np.float32)
    Rs = np.stack([np.eye(3)] * V).astype(np.float32)
    ts = rng.normal(size=(V, 3)).astype(np.float32)
    ts[:, 2] += 6.0
    Ks = np.stack(
        [np.array([[400 + i, 0, 256], [0, 400 + i, 256], [0, 0, 1]]) for i in range(V)]
    ).astype(np.float32)
    got = np.asarray(
        cam.perspective_projection(jnp.asarray(pts)[None], Rs, ts, Ks)
    )
    assert got.shape == (V, N, 2)
    for v in range(V):
        want = _np_project(pts, Rs[v], ts[v], Ks[v])
        np.testing.assert_allclose(got[v], want, rtol=1e-5, atol=1e-3)


def test_invert_rigid(rng):
    aa = rng.normal(size=3)
    from scipy.spatial.transform import Rotation

    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(aa).as_matrix()
    T[:3, 3] = rng.normal(size=3)
    inv = np.asarray(cam.invert_rigid(jnp.asarray(T)))
    np.testing.assert_allclose(inv @ T, np.eye(4), atol=1e-6)


def test_adjust_intrinsics_for_crop():
    K = np.array([[800.0, 0, 512], [0, 800, 512], [0, 0, 1]], dtype=np.float32)
    # Reference recipe (apps/genebody_fitting.py:134-138)
    top, left, bottom, right, out = 100, 200, 612, 712, 512
    want = K.copy()
    want[0, 2] -= left
    want[1, 2] -= top
    want[0, :] *= out / (right - left)
    want[1, :] *= out / (bottom - top)
    got = np.asarray(
        cam.adjust_intrinsics_for_crop(
            jnp.asarray(K), float(top), float(left), float(bottom), float(right), out
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_look_at_points_camera_at_target():
    eye = jnp.asarray([0.0, 0.0, 3.0])
    center = jnp.asarray([0.0, 0.0, 0.0])
    up = jnp.asarray([0.0, 1.0, 0.0])
    T = np.asarray(cam.look_at_extrinsics(eye, center, up))
    p_cam = T[:3, :3] @ np.array([0.0, 0.0, 0.0]) + T[:3, 3]
    # center should be on the +z axis in front of the camera
    np.testing.assert_allclose(p_cam, [0, 0, 3.0], atol=1e-6)


def test_ring_cameras_all_see_center():
    T = np.asarray(cam.ring_cameras(8, jnp.asarray([0.0, 1.0, 0.0]), radius=2.5))
    assert T.shape == (8, 4, 4)
    for v in range(8):
        p = T[v, :3, :3] @ np.array([0.0, 1.0, 0.0]) + T[v, :3, 3]
        np.testing.assert_allclose(p, [0, 0, 2.5], atol=1e-5)
