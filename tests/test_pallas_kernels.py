"""Pallas kernels vs the pure-XLA reference paths (interpret mode on CPU)."""

import jax
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


def test_nearest_pallas_tiebreak_matches_xla(mesh, rng):
    """The culled tie-break pass reproduces the XLA sweep's
    implementation-independent (lowest-index-in-band) face choice."""
    verts, faces = mesh
    points = jnp.asarray(
        rng.normal(scale=1.5, size=(37, 3)).astype(np.float32)
    )
    pt_ref, idx_ref, d2_ref = nearest.nearest_point_on_mesh(
        points, verts, faces, face_block=16, tie_break=True
    )
    pt, idx, d2 = pk.nearest_point_on_mesh_pallas(
        points, verts, faces, query_tile=16, face_block=32,
        interpret=True, tie_break=True,
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(d2_ref), atol=1e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pt), np.asarray(pt_ref), atol=1e-3
    )


def test_nearest_pallas_tiebreak_on_shared_edge():
    """A query in a shared edge's Voronoi region is exactly equidistant
    from both incident faces; both engines must pick the LOWER index.
    Face order is adversarial (the high-index face listed first)."""
    verts = jnp.asarray(np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, 1, -1], [0.5, -1, -1]], np.float32
    ))
    # duplicate the two incident faces a few times so running-argmin
    # order and block layout differ between engines
    faces = jnp.asarray(np.array(
        [[0, 1, 3], [0, 1, 2], [0, 1, 3], [0, 1, 2]], np.int32
    ))
    points = jnp.asarray(np.array([[0.5, 0.0, 1.0]], np.float32))
    _, idx_ref, _ = nearest.nearest_point_on_mesh(
        points, verts, faces, face_block=2, tie_break=True
    )
    _, idx, _ = pk.nearest_point_on_mesh_pallas(
        points, verts, faces, query_tile=8, face_block=2,
        interpret=True, tie_break=True,
    )
    assert int(idx_ref[0]) == 0
    assert int(idx[0]) == 0


def test_nearest_pallas_grad_through_detached_query(mesh, rng):
    """The exact in-fit mesh term differentiates an expression that
    CONTAINS the pallas nearest call (loss = |points - closest|^2 with
    closest detached, reference loss.py:240).  pallas_call has no jvp
    rule, so `ops.nearest.nearest_points` must detach the kernel INPUTS
    — this locks the fix for the on-chip NotImplementedError and checks
    the gradient equals the XLA route's."""
    verts, faces = mesh
    points = jnp.asarray(
        rng.normal(scale=1.5, size=(16, 3)).astype(np.float32)
    )

    def loss_pallas(p):
        pt, _, _ = pk.nearest_point_on_mesh_pallas(
            jax.lax.stop_gradient(p), jax.lax.stop_gradient(verts), faces,
            query_tile=16, face_block=32, interpret=True, tie_break=True,
        )
        return jnp.sum((p - jax.lax.stop_gradient(pt)) ** 2)

    def loss_xla(p):
        pt, _ = nearest.nearest_points(p, verts, faces, face_block=16)
        return jnp.sum((p - pt) ** 2)

    g = jax.grad(loss_pallas)(points)
    g_ref = jax.grad(loss_xla)(points)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


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


def test_contour_min_idx_matches_xla(rng):
    P, M = 37, 300
    contour = jnp.asarray(
        rng.uniform(0, 512, size=(P, 2)).astype(np.float32)
    )
    proj = jnp.asarray(rng.uniform(0, 512, size=(M, 2)).astype(np.float32))
    valid = jnp.asarray((rng.uniform(size=(M,)) > 0.3).astype(np.float32))

    d2_ref = jnp.sum(
        (contour[:, None, :] - proj[None, :, :]) ** 2, -1
    )
    d2_ref = jnp.where(valid[None, :] > 0, d2_ref, 1e30)
    idx_ref = jnp.argmin(d2_ref, axis=1)

    d2, idx = pk.contour_min_idx(
        contour, proj, valid, point_block=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(jnp.min(d2_ref, axis=1)), rtol=1e-6
    )


def test_contour_min_idx_long_contour_p_blocked(rng):
    """P long enough that the VMEM budget blocks the contour axis too
    (p_block < P): the (pb, mb) grid must reproduce the masked argmin."""
    P, M = 9000, 300     # point_block floors at 128 -> p_block 7808, pb 2
    contour = jnp.asarray(
        rng.uniform(0, 2048, size=(P, 2)).astype(np.float32)
    )
    proj = jnp.asarray(
        rng.uniform(0, 2048, size=(M, 2)).astype(np.float32)
    )
    valid = jnp.asarray((rng.uniform(size=(M,)) > 0.3).astype(np.float32))

    d2_ref = jnp.sum((contour[:, None, :] - proj[None, :, :]) ** 2, -1)
    d2_ref = jnp.where(valid[None, :] > 0, d2_ref, 1e30)
    idx_ref = jnp.argmin(d2_ref, axis=1)

    d2, idx = pk.contour_min_idx(
        contour, proj, valid, point_block=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(d2), np.asarray(jnp.min(d2_ref, axis=1)), rtol=1e-6
    )


def test_contour_min_idx_all_invalid(rng):
    contour = jnp.asarray(rng.uniform(0, 64, size=(9, 2)).astype(np.float32))
    proj = jnp.asarray(rng.uniform(0, 64, size=(17, 2)).astype(np.float32))
    valid = jnp.zeros((17,))
    d2, idx = pk.contour_min_idx(
        contour, proj, valid, point_block=128, interpret=True
    )
    assert (np.asarray(d2) >= 1e29).all()


def test_contour_min_idx_vmapped(rng):
    N, P, M = 3, 16, 70
    contour = jnp.asarray(
        rng.uniform(0, 512, size=(N, P, 2)).astype(np.float32)
    )
    proj = jnp.asarray(
        rng.uniform(0, 512, size=(N, M, 2)).astype(np.float32)
    )
    valid = jnp.asarray(
        (rng.uniform(size=(N, M)) > 0.2).astype(np.float32)
    )
    f = jax.vmap(
        lambda c, p, v: pk.contour_min_idx(
            c, p, v, point_block=128, interpret=True
        )
    )
    d2, idx = f(contour, proj, valid)
    for i in range(N):
        d2r = jnp.sum(
            (contour[i][:, None, :] - proj[i][None, :, :]) ** 2, -1
        )
        d2r = jnp.where(valid[i][None, :] > 0, d2r, 1e30)
        np.testing.assert_array_equal(
            np.asarray(idx[i]), np.asarray(jnp.argmin(d2r, axis=1))
        )


def test_raster_attrs_pallas_matches_xla(rng):
    """Fused raster+attr kernel == rasterize + render_attributes."""
    F = 23
    px = jnp.asarray(rng.uniform(-4, 36, size=(F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(0.5, 4.0, size=(F, 3)).astype(np.float32))
    attrs = jnp.asarray(rng.uniform(size=(F, 3, 2)).astype(np.float32))
    a_ref, f_ref, d_ref = pk.rasterize_attrs_xla(
        px, fz, attrs, image_size=32, face_block=8
    )
    a, f, d = pk.rasterize_attrs_pallas(
        px, fz, attrs, image_size=32, pixel_tile=128, face_block=8,
        interpret=True, remap_faces=True,
    )
    np.testing.assert_array_equal(np.asarray(f), np.asarray(f_ref))
    cov = np.asarray(f_ref) >= 0
    np.testing.assert_allclose(
        np.asarray(d)[cov], np.asarray(d_ref)[cov], rtol=1e-5
    )
    # in-kernel perspective weights multiply by the winning depth instead
    # of normalising: ~1 ulp relative to the XLA post-pass
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(a_ref), atol=2e-5
    )
    assert (np.asarray(a)[~cov] == 0).all()


def test_raster_attrs_pallas_unremapped_coverage(rng):
    """remap_faces=False still yields correct coverage + attributes."""
    F = 11
    px = jnp.asarray(rng.uniform(-4, 36, size=(F, 3, 2)).astype(np.float32))
    fz = jnp.asarray(rng.uniform(0.5, 4.0, size=(F, 3)).astype(np.float32))
    attrs = jnp.asarray(rng.uniform(size=(F, 3, 3)).astype(np.float32))
    a_ref, f_ref, _ = pk.rasterize_attrs_xla(
        px, fz, attrs, image_size=16, face_block=8
    )
    a, f, _ = pk.rasterize_attrs_pallas(
        px, fz, attrs, image_size=16, pixel_tile=128, face_block=8,
        interpret=True, remap_faces=False,
    )
    np.testing.assert_array_equal(
        np.asarray(f >= 0), np.asarray(f_ref >= 0)
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref), atol=2e-5)


def test_raster_attrs_pallas_behind_camera(rng):
    px = jnp.asarray([[[4.0, 4], [28, 4], [4, 28]]], jnp.float32)
    fz = jnp.asarray([[-1.0, -1.0, -1.0]], jnp.float32)
    attrs = jnp.ones((1, 3, 2), jnp.float32)
    a, f, _ = pk.rasterize_attrs_pallas(
        px, fz, attrs, image_size=32, pixel_tile=128, face_block=8,
        interpret=True,
    )
    assert (np.asarray(f) == -1).all()
    assert (np.asarray(a) == 0).all()


def test_bilinear_cov_grads_matches_xla(rng):
    """Fused stay-inside kernel: sampled/coverage values and all four
    positional derivatives match the XLA one-hot formulation
    (losses.silhouette._bilinear_sample_onehot_cov) to bf16 operand
    rounding, including out-of-range points (zero padding)."""
    from bodyfitting_tpu.losses.silhouette import (
        _bilinear_sample_onehot_cov,
    )

    H = W = 96
    imsize = 96.0
    img = jnp.asarray(
        (rng.uniform(size=(H, W)) > 0.5).astype(np.float32)
    )
    N = 173                                   # exercises point padding
    xy = jnp.asarray(
        rng.uniform(-12, imsize + 12, size=(N, 2)).astype(np.float32)
    )
    scale = (W - 1) / imsize

    out = pk.bilinear_cov_grads(img, xy * scale, point_tile=128,
                                interpret=True)
    s, c, ds_dx, ds_dy, dc_dx, dc_dy = (np.asarray(o) for o in out)

    s_ref, c_ref = _bilinear_sample_onehot_cov(img, xy, imsize)
    np.testing.assert_allclose(s, np.asarray(s_ref), atol=5e-3)
    np.testing.assert_allclose(c, np.asarray(c_ref), atol=5e-3)

    # derivatives vs autodiff of the XLA path, with two random
    # cotangent vectors (per-point: diag of the Jacobian contraction);
    # d/dxy here is in pixel-grid units -> scale the XLA grad back
    gs = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
    gc = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    def f(xy_):
        s_, c_ = _bilinear_sample_onehot_cov(img, xy_, imsize)
        return jnp.sum(s_ * gs + c_ * gc)

    g_ref = np.asarray(jax.grad(f)(xy)) / scale
    g_ker = np.stack(
        [np.asarray(gs) * ds_dx + np.asarray(gc) * dc_dx,
         np.asarray(gs) * ds_dy + np.asarray(gc) * dc_dy], axis=-1
    )
    # mask out kink points (|i - x| within eps of 0/1: subgradient
    # conventions differ, measure-zero in optimization)
    xh = np.asarray(xy) * scale
    frac = np.abs(xh - np.round(xh))
    interior = (frac > 1e-3).all(axis=1)
    np.testing.assert_allclose(
        g_ker[interior], g_ref[interior], atol=2e-2
    )


def test_bilinear_cov_grads_windowed_matches_full(rng):
    """The row-windowed sweep (`row_window=`) returns bit-comparable
    outputs to the full-H kernel for every point distribution: coherent
    tiles (its target), uniformly spread points (multi-window worst
    case), tight clusters, fully off-image tiles above/below, image-edge
    bands, wild early-fit projections (float->int clipping), and integer
    coordinates (hinge kinks).  Both with_grads modes; Hw=8 exercises
    many windows plus the clamped last window's dedup guard."""
    H = W = 96
    img = jnp.asarray(
        (rng.uniform(size=(H, W)) > 0.5).astype(np.float32)
    )
    cases = {
        "coherent": np.stack(
            [rng.uniform(0, 96, 300), np.sort(rng.uniform(0, 96, 300))],
            -1),
        "spread": rng.uniform(-12, 108, size=(300, 2)),
        "cluster": rng.uniform(40, 44, size=(300, 2)),
        "below": rng.uniform(-8, -2, size=(300, 2)),
        "above": rng.uniform(97, 200, size=(300, 2)),
        "edge": np.stack(
            [rng.uniform(0, 96, 300), rng.uniform(94.2, 95.9, 300)], -1),
        "huge": rng.uniform(-1e9, 1e9, size=(300, 2)),
        "int": np.round(rng.uniform(0, 95, (300, 2))),
    }
    for wg in (True, False):
        for Hw in (32, 8):
            for name, xy in cases.items():
                xy = jnp.asarray(xy.astype(np.float32))
                a = pk.bilinear_cov_grads(
                    img, xy, point_tile=128, interpret=True, with_grads=wg)
                b = pk.bilinear_cov_grads(
                    img, xy, point_tile=128, interpret=True, with_grads=wg,
                    row_window=Hw)
                err = float(jnp.abs(a - b).max())
                assert err < 1e-5, (name, wg, Hw, err)


def test_stay_inside_pallas_custom_vjp(rng):
    """End-to-end: the silhouette loss's pallas stay-inside path (value
    AND gradient through the custom_vjp) agrees with the XLA path."""
    from bodyfitting_tpu.losses import silhouette as S

    H = W = 64
    img = jnp.asarray(
        (rng.uniform(size=(H, W)) > 0.5).astype(np.float32)
    )
    xy = jnp.asarray(
        rng.uniform(-8, 72, size=(200, 2)).astype(np.float32)
    )

    def loss(xy_):
        s, c = S._stay_inside_cov(img, xy_, float(W))
        return jnp.sum(c - s)

    old = S.STAY_INSIDE
    try:
        S.STAY_INSIDE = "pallas"
        v_p, g_p = jax.value_and_grad(loss)(xy)
        S.STAY_INSIDE = "xla"
        v_x, g_x = jax.value_and_grad(loss)(xy)
    finally:
        S.STAY_INSIDE = old
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-3)
    scale = (W - 1) / float(W)
    xh = np.asarray(xy) * scale
    frac = np.abs(xh - np.round(xh))
    interior = (frac > 1e-3).all(axis=1)
    np.testing.assert_allclose(
        np.asarray(g_p)[interior], np.asarray(g_x)[interior], atol=2e-2
    )
