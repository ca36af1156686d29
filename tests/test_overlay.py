"""Overlay rendering tests."""

import numpy as np
import jax.numpy as jnp

from bodyfitting_tpu.utils.overlay import (
    render_fit_overlays,
    render_mesh_overlay,
)


def test_overlay_blends_mesh_over_image():
    image = np.full((64, 64, 3), 200, np.uint8)
    verts = np.array(
        [[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0]], np.float32
    )
    faces = np.array([[0, 1, 2]], np.int32)
    w2c = np.eye(4)
    w2c[2, 3] = 2.0
    K = np.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]])
    out = render_mesh_overlay(image, verts, faces, w2c, K)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # corner stays the untouched background; the center is tinted
    np.testing.assert_array_equal(out[0, 0], [200, 200, 200])
    assert (out[32, 32] != np.array([200, 200, 200])).any()


def test_render_fit_overlays_cadence():
    rng = np.random.default_rng(0)
    images = [np.zeros((32, 32, 3), np.uint8)] * 25
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = rng.integers(0, 10, size=(4, 3)).astype(np.int32)
    c2ws = [np.eye(4)] * 25
    for c in c2ws:
        pass
    Ks = [np.array([[30.0, 0, 16], [0, 30.0, 16], [0, 0, 1]])] * 25
    result = {"vertices": jnp.asarray(verts)}
    outs = render_fit_overlays(images, result, faces, c2ws, Ks, skip=12)
    assert [i for i, _ in outs] == [0, 12, 24]


def test_render_mesh_overlay_non_square_image():
    """Overlays on standard 16:9 (or any non-square) frames must work —
    the rasterizer is square internally but the blend is image-shaped."""
    import numpy as np

    from bodyfitting_tpu.utils.overlay import render_mesh_overlay

    img = np.full((48, 64, 3), 50, np.uint8)
    verts = np.asarray(
        [[-0.2, -0.2, 0.0], [0.2, -0.2, 0.0], [0.0, 0.3, 0.0]], np.float32
    )
    faces = np.asarray([[0, 1, 2]], np.int32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]], np.float32)
    out = render_mesh_overlay(img, verts, faces, w2c, K)
    assert out.shape == (48, 64, 3)
    assert (out != 50).any()          # the triangle actually rendered
