"""Precomputed-raster texture fitting equals the per-iteration path."""

import numpy as np
import jax.numpy as jnp

from bodyfitting_tpu.fitting import texture as tf
from tests.test_texture import _unit_quad


def test_precompute_matches_reraster():
    verts, faces, face_uvs = _unit_quad()
    S = 16
    target = np.zeros((S, S, 3), np.float32)
    target[: S // 2] = [0.9, 0.1, 0.1]
    target[S // 2:] = [0.1, 0.1, 0.9]

    base = dict(
        tex_img_size=S, render_img_size=32, iter_num=40, lr=5e-2,
        round_views=4, round_view_iters=5, face_block=4,
    )
    tex_pre, losses_pre = tf.fit_texture(
        verts, faces, face_uvs, verts, faces, face_uvs, target,
        tf.TextureFitConfig(precompute=True, **base),
    )
    tex_rr, losses_rr = tf.fit_texture(
        verts, faces, face_uvs, verts, faces, face_uvs, target,
        tf.TextureFitConfig(precompute=False, **base),
    )
    np.testing.assert_allclose(
        np.asarray(losses_pre), np.asarray(losses_rr), rtol=1e-4,
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(tex_pre), np.asarray(tex_rr), atol=1e-4
    )


def test_bucketed_equals_gather_precompute():
    """The one-hot plan path tracks the gather path iteration-for-iteration."""
    verts, faces, face_uvs = _unit_quad()
    S = 16
    target = np.zeros((S, S, 3), np.float32)
    target[:, : S // 2] = [0.2, 0.8, 0.3]
    target[:, S // 2:] = [0.7, 0.2, 0.6]

    base = dict(
        tex_img_size=S, render_img_size=32, iter_num=40, lr=5e-2,
        round_views=4, round_view_iters=5, face_block=4, precompute=True,
        uv_chunk=64, uv_window_rows=4,
    )
    tex_b, losses_b = tf.fit_texture(
        verts, faces, face_uvs, verts, faces, face_uvs, target,
        tf.TextureFitConfig(bucketed_uv=True, **base),
    )
    tex_g, losses_g = tf.fit_texture(
        verts, faces, face_uvs, verts, faces, face_uvs, target,
        tf.TextureFitConfig(bucketed_uv=False, **base),
    )
    np.testing.assert_allclose(
        np.asarray(losses_b), np.asarray(losses_g), rtol=5e-5, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(tex_b), np.asarray(tex_g), atol=1e-4
    )


def test_map_chunk_padding_invariant():
    """Chunked lax.map map-builds (incl. a padded final chunk) produce the
    same fit as one whole-schedule chunk: map_chunk only changes program
    shape, never values."""
    verts, faces, face_uvs = _unit_quad()
    S = 16
    target = np.zeros((S, S, 3), np.float32)
    target[:, : S // 2] = [0.2, 0.8, 0.3]
    target[:, S // 2:] = [0.7, 0.2, 0.6]

    base = dict(
        tex_img_size=S, render_img_size=32, iter_num=40, lr=5e-2,
        round_views=4, round_view_iters=5, face_block=4, precompute=True,
    )
    # the 40-iter schedule has ~24 unique poses: map_chunk=7 forces 4
    # chunks with a padded tail; map_chunk=64 clamps to one whole chunk
    tex_a, losses_a = tf.fit_texture(
        verts, faces, face_uvs, verts, faces, face_uvs, target,
        tf.TextureFitConfig(map_chunk=7, **base),
    )
    tex_b, losses_b = tf.fit_texture(
        verts, faces, face_uvs, verts, faces, face_uvs, target,
        tf.TextureFitConfig(map_chunk=64, **base),
    )
    np.testing.assert_array_equal(np.asarray(losses_a),
                                  np.asarray(losses_b))
    np.testing.assert_array_equal(np.asarray(tex_a), np.asarray(tex_b))


def test_packed_glue_matches_unpacked_maps():
    """packed_glue vmaps the raster pack across the chunk; the per-pose
    maps must match the unpacked program (same pack function, same
    kernel — Pallas interpret here vs the CPU XLA raster, so tolerance
    covers the documented ~1e-6 kernel-vs-XLA gap)."""
    verts, faces, face_uvs = _unit_quad()
    S = 16
    target = np.full((S, S, 3), 0.5, np.float32)

    poses = tf.ring_poses(np.zeros(3), 3, 2.0)
    K = jnp.asarray(tf.default_K(32))
    scene = (jnp.asarray(verts), jnp.asarray(faces),
             jnp.asarray(face_uvs), jnp.asarray(target),
             jnp.asarray(verts), jnp.asarray(faces),
             jnp.asarray(face_uvs))
    plain = tf._maps_program(32, 4, packed=False)
    packed = tf._maps_program(32, 4, packed=True)
    out_a = plain(jnp.asarray(poses), K, *scene)
    out_b = packed(jnp.asarray(poses), K, *scene)
    for a, b in zip(out_a[:2], out_b[:2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)
    # coverage masks must agree exactly
    np.testing.assert_array_equal(np.asarray(out_a[2]),
                                  np.asarray(out_b[2]))


def test_packed_glue_fit_matches():
    """End-to-end: a packed_glue fit reproduces the unpacked fit."""
    verts, faces, face_uvs = _unit_quad()
    S = 16
    target = np.zeros((S, S, 3), np.float32)
    target[: S // 2] = [0.9, 0.1, 0.1]
    target[S // 2:] = [0.1, 0.1, 0.9]

    base = dict(
        tex_img_size=S, render_img_size=32, iter_num=40, lr=5e-2,
        round_views=4, round_view_iters=5, face_block=4, precompute=True,
    )
    tex_a, losses_a = tf.fit_texture(
        verts, faces, face_uvs, verts, faces, face_uvs, target,
        tf.TextureFitConfig(packed_glue=False, **base),
    )
    tex_b, losses_b = tf.fit_texture(
        verts, faces, face_uvs, verts, faces, face_uvs, target,
        tf.TextureFitConfig(packed_glue=True, **base),
    )
    np.testing.assert_allclose(np.asarray(losses_a),
                               np.asarray(losses_b), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tex_a), np.asarray(tex_b),
                               atol=1e-4)
