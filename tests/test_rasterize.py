"""Rasterizer tests: golden coverage, depth ordering, gradients.

Pattern follows the reference's neural_renderer tests (golden-value
coverage + gradient checks, thirdparty/neural_renderer/tests/)."""

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.ops import rasterize as rz


def _screen_tri(a, b, c, z=(1.0, 1.0, 1.0)):
    px = jnp.asarray([[a, b, c]], jnp.float32)
    fz = jnp.asarray([list(z)], jnp.float32)
    return px, fz


def test_single_triangle_coverage():
    # right triangle covering the lower-left half of a 16x16 image
    px, fz = _screen_tri([0, 0], [16, 0], [0, 16])
    out = rz.rasterize(px, fz, image_size=16)
    sil = np.asarray(rz.render_silhouette(out))
    # pixel (x+.5, y+.5) is inside iff x + y + 1 <= 16 (on-edge inclusive)
    xs, ys = np.meshgrid(np.arange(16), np.arange(16), indexing="xy")
    want = ((xs + 0.5) + (ys + 0.5) <= 16).astype(np.float32)
    np.testing.assert_array_equal(sil, want)


def test_depth_test_picks_nearer_face():
    px = jnp.asarray(
        [
            [[0, 0], [16, 0], [0, 16]],     # far triangle
            [[0, 0], [16, 0], [0, 16]],     # near triangle, same footprint
        ],
        jnp.float32,
    )
    fz = jnp.asarray([[2.0, 2.0, 2.0], [1.0, 1.0, 1.0]], jnp.float32)
    out = rz.rasterize(px, fz, image_size=16)
    covered = np.asarray(out.face_idx) >= 0
    assert (np.asarray(out.face_idx)[covered] == 1).all()
    np.testing.assert_allclose(np.asarray(out.depth)[covered], 1.0, rtol=1e-5)


def test_perspective_correct_depth():
    # a triangle slanted in depth: check interpolated depth at a pixel
    px, fz = _screen_tri([0, 0], [16, 0], [0, 16], z=(1.0, 3.0, 1.0))
    out = rz.rasterize(px, fz, image_size=16)
    # at pixel (7.5, 0.5): screen bary wrt (a,b,c)
    p = np.array([7.5, 0.5])
    A = np.array([[0, 0], [16, 0], [0, 16]], np.float64)
    area = np.cross(A[1] - A[0], A[2] - A[0])
    w0 = np.cross(A[2] - A[1], p - A[1]) / area
    w1 = np.cross(A[0] - A[2], p - A[2]) / area
    w2 = np.cross(A[1] - A[0], p - A[0]) / area
    want = 1.0 / (w0 / 1.0 + w1 / 3.0 + w2 / 1.0)
    assert np.asarray(out.depth)[0, 7] == pytest_approx(want)


def pytest_approx(x, rel=1e-4):
    import pytest

    return pytest.approx(x, rel=rel)


def test_attribute_interpolation_affine():
    # attribute == x coordinate: interpolation must reproduce pixel x
    px, fz = _screen_tri([0, 0], [16, 0], [0, 16])
    out = rz.rasterize(px, fz, image_size=16)
    attrs = jnp.asarray([[[0.0], [16.0], [0.0]]], jnp.float32)
    img = np.asarray(rz.render_attributes(out, attrs))[..., 0]
    xs, ys = np.meshgrid(np.arange(16) + 0.5, np.arange(16) + 0.5,
                         indexing="xy")
    inside = np.asarray(out.face_idx) >= 0
    np.testing.assert_allclose(img[inside], xs[inside], atol=1e-3)


def test_texture_gradient_flows():
    px, fz = _screen_tri([0, 0], [16, 0], [0, 16])
    out = rz.rasterize(px, fz, image_size=16)
    uvs = jnp.asarray([[[0, 0], [1, 0], [0, 1]]], jnp.float32)

    def loss(tex):
        img = rz.sample_texture(out, uvs, tex)
        return jnp.sum((img - 0.7) ** 2)

    tex = jnp.full((8, 8, 3), 0.2)
    g = jax.grad(loss)(tex)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    # one gradient step reduces the loss
    l0 = float(loss(tex))
    l1 = float(loss(tex - 0.01 * g))
    assert l1 < l0


def test_soft_silhouette_matches_hard_in_the_limit():
    px, fz = _screen_tri([2, 2], [30, 2], [2, 30])
    hard = np.asarray(
        rz.render_silhouette(rz.rasterize(px, fz, image_size=32))
    )
    soft = np.asarray(rz.soft_silhouette(px, image_size=32, sigma=1e-6))
    # away from the boundary the soft mask saturates to the hard one
    interior = (hard == 1) & (np.asarray(
        rz.render_silhouette(rz.rasterize(px - 1.5, fz, 32))) == 1)
    assert soft[interior].min() > 0.95
    far_outside = hard == 0
    # erode the outside by ignoring pixels near the boundary
    assert np.median(soft[far_outside]) < 0.05


def test_soft_silhouette_vertex_gradients():
    px = jnp.asarray([[[4.0, 4], [28, 4], [4, 28]]], jnp.float32)
    target = np.zeros((32, 32), np.float32)
    target[8:24, 8:24] = 1.0
    target = jnp.asarray(target)

    def loss(p):
        s = rz.soft_silhouette(p, image_size=32, sigma=3e-3)
        return jnp.mean((s - target) ** 2)

    g = jax.grad(loss)(px)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    # gradient descent on the vertices reduces the IoU loss
    p = px
    l0 = float(loss(p))
    for _ in range(50):
        p = p - 200.0 * jax.grad(loss)(p)
    assert float(loss(p)) < 0.7 * l0


def test_project_faces_pipeline():
    verts = jnp.asarray(
        [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0]], jnp.float32
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    w2c = jnp.eye(4).at[2, 3].set(2.0)
    K = jnp.asarray([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1]])
    px, fz = rz.project_faces(verts, faces, w2c, K)
    np.testing.assert_allclose(np.asarray(fz), 2.0, atol=1e-6)
    out = rz.rasterize(px, fz, image_size=32)
    sil = np.asarray(rz.render_silhouette(out))
    assert 100 < sil.sum() < 160  # 16px x 16px triangle: area 128
    # behind-camera mesh renders nothing
    w2c_back = jnp.eye(4).at[2, 3].set(-2.0)
    px2, fz2 = rz.project_faces(verts, faces, w2c_back, K)
    out2 = rz.rasterize(px2, fz2, image_size=32)
    assert (np.asarray(out2.face_idx) == -1).all()


def test_face_block_padding_consistency():
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(0, 32, size=(37, 3, 2)), jnp.float32)
    fz = jnp.asarray(rng.uniform(1, 4, size=(37, 3)), jnp.float32)
    a = rz.rasterize(px, fz, image_size=32, face_block=8)
    b = rz.rasterize(px, fz, image_size=32, face_block=64)
    np.testing.assert_array_equal(np.asarray(a.face_idx), np.asarray(b.face_idx))
    np.testing.assert_allclose(
        np.asarray(a.depth), np.asarray(b.depth), rtol=1e-6
    )


def test_soft_silhouette_culls_behind_camera_faces():
    """A face with a vertex behind the camera projects to a huge wedge
    (perspective divide clamps z ~ 0); with face_z it must add zero
    coverage instead of smearing the image."""
    import jax.numpy as jnp

    w2c = jnp.eye(4).at[2, 3].set(2.0)          # camera at z=-2 looking +z
    K = jnp.asarray([[32.0, 0, 16], [0, 32.0, 16], [0, 0, 1.0]])
    # one tri safely in front, one tri with a vertex behind the camera
    verts = jnp.asarray([
        [-0.2, -0.2, 0.0], [0.2, -0.2, 0.0], [0.0, 0.2, 0.0],
        [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.5, -3.0],
    ])
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    px, z = rz.project_faces(verts, faces, w2c, K)
    assert float(z.min()) < 0                   # setup really crosses the plane

    culled = np.asarray(
        rz.soft_silhouette(px, image_size=32, sigma=1e-4, face_z=z)
    )
    front_only = np.asarray(
        rz.soft_silhouette(px[:1], image_size=32, sigma=1e-4, face_z=z[:1])
    )
    np.testing.assert_allclose(culled, front_only, atol=1e-6)
    assert culled.max() > 0.5                   # the front face still renders
