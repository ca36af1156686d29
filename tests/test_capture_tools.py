"""Capture tooling tests: distortion rigs, RGBD streams, reconstruction,
vertex correspondence."""

import numpy as np
import pytest

from bodyfitting_tpu.io import rgbd_stream as rs
from bodyfitting_tpu.utils import camera_rig as cr
from bodyfitting_tpu.utils import correspondence as corr
from bodyfitting_tpu.utils import reconstruction as rec


def _camera():
    return cr.DistortionCamera.from_flat(
        [500.0, 505.0, 320.0, 240.0, 0.05, -0.02, 0.001, 0.002, 0.01,
         640, 480]
    )


def test_distort_undistort_roundtrip(rng):
    cam = _camera()
    pts = rng.uniform(-0.4, 0.4, size=(50, 2))
    round1 = cam.undistort(cam.distort(pts))
    # single-iteration undistortion: approximate inverse for mild coeffs
    np.testing.assert_allclose(round1, pts, atol=5e-3)


def test_reproject_project_roundtrip(rng):
    cam = _camera()
    uv = rng.uniform(100, 500, size=(30, 2))
    depth = rng.uniform(0.5, 3.0, size=(30,))
    pts3 = cam.reproject(uv, depth)
    np.testing.assert_allclose(pts3[:, 2], depth)
    uv2 = cam.project(pts3)
    np.testing.assert_allclose(uv2, uv, atol=0.5)


def test_camera_rotate_preserves_pixel_count():
    cam = _camera()
    r = cam.rotate(1)
    assert (r.width, r.height) == (cam.height, cam.width)
    assert r.fx == cam.fy and r.fy == cam.fx
    assert cam.rotate(0) is cam


def test_dual_camera_identity_rig(rng):
    cam = _camera()
    rig = cr.DualCamera(rgb=cam, tof=cam, rvec=np.zeros(3),
                        tvec=np.zeros(3))
    pts = np.concatenate(
        [rng.uniform(200, 400, size=(20, 2)),
         rng.uniform(1.0, 2.0, size=(20, 1))], axis=1,
    )
    uv = rig.tof2rgb(pts)
    # identity extrinsics: ToF pixel maps (approximately) to itself
    np.testing.assert_allclose(uv, pts[:, :2], atol=1.0)


def test_rgbd_stream_roundtrip(tmp_path, rng):
    colors = [
        rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    depths = [
        (rng.uniform(500, 3000, size=(24, 32))).astype(np.uint16)
        for _ in range(3)
    ]
    indices = [
        rng.integers(0, 2, size=(24, 32)).astype(np.uint8)
        for _ in range(3)
    ]
    K = rs.StreamIntrinsics(
        matrix=np.diag([400.0, 400.0, 1.0]).astype(np.float32),
        coeffs=np.arange(10, dtype=np.float32),
    )
    path = str(tmp_path / "capture.stream")
    rs.write_rgbd_stream(path, colors, depths, indices,
                         color_intrinsics=K)

    dec = rs.RGBDStreamDecoder(path)
    assert dec.frame_count == 3
    assert (dec.color_width, dec.color_height) == (64, 48)
    np.testing.assert_allclose(dec.color_intrinsics.matrix, K.matrix)
    fr = dec.get_frame(1)
    np.testing.assert_array_equal(fr.depth16, depths[1])
    np.testing.assert_array_equal(fr.index, indices[1])
    assert fr.color.shape == (48, 64, 3)   # jpeg: lossy, shape only
    assert dec.get_frame(3) is None
    dec.close()

    cs, ds, ms = rs.read_rgbd(path, read_depth=True, read_mask=True)
    assert len(cs) == 3 and len(ds) == 3 and len(ms) == 3


def test_pointcloud_from_depthmap():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.zeros((48, 64))
    depth[24, 32] = 2.0     # principal point at 2m -> (0, 0, 2)
    depth[24, 42] = 2.0     # 10px right -> x = 10/100*2 = 0.2
    pts, _ = rec.pointcloud_from_depthmap(depth, K)
    assert pts.shape == (2, 3)
    np.testing.assert_allclose(pts[0], [0, 0, 2], atol=1e-9)
    np.testing.assert_allclose(pts[1], [0.2, 0, 2], atol=1e-9)
    # with a camera pose
    c2w = np.eye(4)
    c2w[:3, 3] = [1, 2, 3]
    pts_w, _ = rec.pointcloud_from_depthmap(depth, K, c2w=c2w)
    np.testing.assert_allclose(pts_w[0], [1, 2, 5], atol=1e-9)


def test_depth_colorize_shapes():
    depth = np.zeros((10, 10))
    depth[2:8, 2:8] = np.linspace(1, 3, 36).reshape(6, 6)
    img = rec.depth_colorize(depth)
    assert img.shape == (10, 10, 3) and img.dtype == np.uint8
    assert (img[0, 0] == 0).all()          # invalid stays black


def test_hungarian_correspondence(rng):
    verts = rng.normal(size=(40, 3))
    perm_true = rng.permutation(40)
    noisy = verts[perm_true] + rng.normal(scale=1e-4, size=(40, 3))
    # match src=verts to dst=noisy: dst[perm[i]] ~ verts[i]
    perm = corr.match_vertices(verts, noisy)
    inv = np.empty_like(perm_true)
    inv[perm_true] = np.arange(40)
    np.testing.assert_array_equal(perm, inv)

    faces = rng.integers(0, 40, size=(10, 3))
    vr, fr_ = corr.reorder_mesh(verts, faces, np.arange(40)[::-1])
    np.testing.assert_allclose(vr, verts[::-1])
    tri0 = verts[faces[0]]
    np.testing.assert_allclose(vr[fr_[0]], tri0)
