"""Nearest point-on-mesh tests: analytic cases + brute-force differential."""

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.ops import nearest


def _brute_force_np(points, verts, faces):
    """Per-pair scipy-free oracle: sample-free closed form in float64."""
    tris = verts[faces]

    def closest_on_tri(p, tri):
        a, b, c = tri
        # project on plane, then clamp via brute candidate enumeration:
        # all three edges (dense t samples refined), three vertices, interior
        candidates = [a, b, c]
        for (u, v) in [(a, b), (a, c), (b, c)]:
            d = v - u
            t = np.clip(np.dot(p - u, d) / max(np.dot(d, d), 1e-30), 0, 1)
            candidates.append(u + t * d)
        n = np.cross(b - a, c - a)
        nn = np.dot(n, n)
        if nn > 1e-30:
            q = p - np.dot(p - a, n) / nn * n
            # barycentric inside test
            v0, v1, v2 = b - a, c - a, q - a
            d00, d01, d11 = np.dot(v0, v0), np.dot(v0, v1), np.dot(v1, v1)
            d20, d21 = np.dot(v2, v0), np.dot(v2, v1)
            den = d00 * d11 - d01 * d01
            if abs(den) > 1e-30:
                v_ = (d11 * d20 - d01 * d21) / den
                w_ = (d00 * d21 - d01 * d20) / den
                if v_ >= 0 and w_ >= 0 and v_ + w_ <= 1:
                    candidates.append(q)
        d2s = [np.dot(p - c_, p - c_) for c_ in candidates]
        i = int(np.argmin(d2s))
        return candidates[i], d2s[i]

    pts, d2s = [], []
    for p in points:
        best, bd = None, np.inf
        for tri in tris:
            c, d2 = closest_on_tri(p, tri)
            if d2 < bd:
                best, bd = c, d2
        pts.append(best)
        d2s.append(bd)
    return np.array(pts), np.array(d2s)


def test_single_triangle_analytic():
    verts = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    pts = jnp.array([
        [0.2, 0.2, 1.0],    # above interior -> projects straight down
        [-1.0, -1.0, 0.0],  # vertex region A
        [2.0, 0.0, 0.0],    # vertex region B
        [0.5, -1.0, 0.5],   # edge AB region
    ])
    cp, idx, d2 = nearest.nearest_point_on_mesh(pts, verts, faces)
    want = np.array([
        [0.2, 0.2, 0.0],
        [0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.5, 0.0, 0.0],
    ])
    np.testing.assert_allclose(np.asarray(cp), want, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d2), ((pts - want) ** 2).sum(-1), atol=1e-6
    )
    assert (np.asarray(idx) == 0).all()


def test_differential_vs_numpy_brute_force(rng):
    verts = rng.normal(size=(40, 3)).astype(np.float32)
    faces = rng.integers(0, 40, size=(60, 3)).astype(np.int32)
    points = rng.normal(scale=1.5, size=(33, 3)).astype(np.float32)
    cp, idx, d2 = nearest.nearest_point_on_mesh(
        jnp.asarray(points), jnp.asarray(verts), jnp.asarray(faces),
        face_block=16,  # force multiple scan blocks + padding
    )
    cp_ref, d2_ref = _brute_force_np(
        points.astype(np.float64), verts.astype(np.float64), faces
    )
    np.testing.assert_allclose(np.asarray(d2), d2_ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cp), cp_ref, atol=1e-3)


def test_stop_gradient_semantics():
    verts = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)

    def loss(p):
        cp, _ = nearest.nearest_points(p, verts, faces)
        return jnp.sum((p - cp) ** 2)

    p = jnp.array([[0.2, 0.2, 0.7]])
    g = jax.grad(loss)(p)
    # gradient flows through the query point only: d/dp ||p - const||^2
    np.testing.assert_allclose(
        np.asarray(g), np.array([[0.0, 0.0, 1.4]]), atol=1e-5
    )


def test_query_on_surface_is_zero():
    verts = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    faces = jnp.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], jnp.int32)
    pts = verts[faces[:, 0]] * 0.5 + verts[faces[:, 1]] * 0.25 \
        + verts[faces[:, 2]] * 0.25
    _, _, d2 = nearest.nearest_point_on_mesh(pts, verts, faces)
    np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-10)
