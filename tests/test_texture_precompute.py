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
