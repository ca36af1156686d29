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
