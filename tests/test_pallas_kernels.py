"""Pallas kernels vs the pure-XLA reference paths (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.ops import nearest, rasterize as rz
from bodyfitting_tpu.ops import pallas_kernels as pk


@pytest.fixture
def mesh(rng):
    verts = rng.normal(size=(50, 3)).astype(np.float32)
    faces = rng.integers(0, 50, size=(70, 3)).astype(np.int32)
    return jnp.asarray(verts), jnp.asarray(faces)


def test_nearest_pallas_matches_xla(mesh, rng):
    verts, faces = mesh
    points = jnp.asarray(
        rng.normal(scale=1.5, size=(37, 3)).astype(np.float32)
    )
    pt_ref, idx_ref, d2_ref = nearest.nearest_point_on_mesh(
        points, verts, faces, face_block=16
    )
    pt, idx, d2 = pk.nearest_point_on_mesh_pallas(
        points, verts, faces, query_tile=16, face_block=32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d2_ref), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pt), np.asarray(pt_ref), atol=1e-3
    )


def test_nearest_pallas_padding_cases(rng):
    # query & face counts that do NOT divide the tiles
    verts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, 10, size=(7, 3)).astype(np.int32))
    points = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    _, _, d2 = pk.nearest_point_on_mesh_pallas(
        points, verts, faces, query_tile=8, face_block=8, interpret=True
    )
    _, _, d2_ref = nearest.nearest_point_on_mesh(points, verts, faces)
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d2_ref), atol=1e-5, rtol=1e-4
    )


def test_raster_pallas_matches_xla(rng):
    F = 23
    px = jnp.asarray(rng.uniform(-4, 36, size=(F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(0.5, 4.0, size=(F, 3)).astype(np.float32))
    ref = rz.rasterize(px, fz, image_size=32, face_block=8)
    out = pk.rasterize_pallas(
        px, fz, image_size=32, pixel_tile=128, face_block=8, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(out.face_idx), np.asarray(ref.face_idx)
    )
    cov = np.asarray(ref.face_idx) >= 0
    np.testing.assert_allclose(
        np.asarray(out.depth)[cov], np.asarray(ref.depth)[cov], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.bary), np.asarray(ref.bary), atol=1e-5
    )


def test_raster_pallas_behind_camera(rng):
    px = jnp.asarray([[[4.0, 4], [28, 4], [4, 28]]], jnp.float32)
    fz = jnp.asarray([[-1.0, -1.0, -1.0]], jnp.float32)
    out = pk.rasterize_pallas(
        px, fz, image_size=32, pixel_tile=128, face_block=8, interpret=True
    )
    assert (np.asarray(out.face_idx) == -1).all()
