"""Supersampled rendering: edge pixels blend, interior unchanged."""

import numpy as np
import jax.numpy as jnp

from bodyfitting_tpu.fitting import texture as tf
from tests.test_texture import _unit_quad


def test_supersample_blends_edges():
    verts, faces, face_uvs = _unit_quad()
    tex = jnp.ones((8, 8, 3)) * jnp.asarray([1.0, 0.0, 0.0])
    K = jnp.asarray(tf.default_K(32))
    w2c = jnp.asarray(
        tf.look_at_w2c(np.array([0, 0, 3.0]), np.zeros(3)), jnp.float32
    )
    img1, _ = tf.render_textured(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(face_uvs),
        tex, w2c, K, 32, face_block=4, supersample=1,
    )
    img2, _ = tf.render_textured(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(face_uvs),
        tex, w2c, K, 32, face_block=4, supersample=2,
    )
    a1 = np.asarray(img1)
    a2 = np.asarray(img2)
    assert a1.shape == a2.shape == (32, 32, 3)
    # interior agrees
    np.testing.assert_allclose(a2[16, 16], a1[16, 16], atol=1e-5)
    # AA produces fractional coverage along the silhouette: the green
    # channel blends red (0) and white background (1)
    frac = (a2[..., 1] > 0.05) & (a2[..., 1] < 0.95)
    hard_frac = (a1[..., 1] > 0.05) & (a1[..., 1] < 0.95)
    assert frac.sum() > hard_frac.sum()
