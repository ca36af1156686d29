"""Content-cropped stay-inside path (losses.silhouette crop mode).

The crop path must be VALUE-EXACT vs the full-mask path (reference
semantics: torch-1.2.0 grid_sample zero-padded bilinear, loss.py:85-130):
sampling a content crop equals sampling the full mask (every nonzero
pixel is inside the crop), and the closed-form coverage equals the hinge
coverage up to f32 rounding.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu.losses import silhouette as sil


@pytest.fixture
def two_masks():
    masks = np.zeros((2, 128, 128), np.float32)
    masks[0, 30:90, 40:80] = 1.0
    masks[1, 10:50, 20:100] = 1.0
    return masks


def test_compute_mask_crops_windows(two_masks):
    crops, origins, (Hc, Wc) = sil.compute_mask_crops(list(two_masks))
    assert crops.shape == (2, Hc, Wc)
    assert Hc % 8 == 0 and (Wc % 128 == 0 or Wc == 128)
    # every nonzero pixel of each mask is inside its crop window, and the
    # crop content equals the mask restricted to the window
    for i, m in enumerate(two_masks):
        ox, oy = int(origins[i, 0]), int(origins[i, 1])
        np.testing.assert_array_equal(
            crops[i], m[oy:oy + Hc, ox:ox + Wc]
        )
        ys, xs = np.nonzero(m)
        assert ys.min() >= oy and ys.max() < oy + Hc
        assert xs.min() >= ox and xs.max() < ox + Wc
    # margin: at least one zero row/col around content when it fits
    assert crops[0].sum() == two_masks[0].sum()


def test_compute_mask_crops_too_small_raises(two_masks):
    with pytest.raises(ValueError):
        sil.compute_mask_crops(list(two_masks), crop_hw=(16, 128))


def test_coverage_closed_form_matches_hinges(rng):
    H, W = 48, 160
    pts = np.concatenate([
        rng.uniform(-5, max(H, W) + 5, size=(200, 2)),
        [[0, 0], [W - 1, H - 1], [-0.5, -0.5], [W - 0.5, H - 0.5],
         [-1.0, 3.0], [float(W), 3.0], [3.0, -1.0], [3.0, float(H)]],
    ]).astype(np.float32)
    got = np.asarray(sil.coverage_closed_form(jnp.asarray(pts), (H, W)))
    iy = np.arange(H)[None, :]
    ix = np.arange(W)[None, :]
    rs = np.maximum(0, 1 - np.abs(iy - pts[:, 1:2])).sum(1)
    cs = np.maximum(0, 1 - np.abs(ix - pts[:, 0:1])).sum(1)
    np.testing.assert_allclose(got, rs * cs, atol=2e-6)


def _loss_pair(masks, verts, impl, use_crop, crop_hw=None):
    contours, valid = sil.extract_contours(list(masks))
    rc, rw = sil.resample_contours(contours, valid, 64)
    H = masks.shape[1]
    K = jnp.array(
        [[100.0, 0, H / 2], [0, 100.0, H / 2], [0, 0, 1]], jnp.float32
    )
    Vm = masks.shape[0]
    w2cs = jnp.broadcast_to(jnp.eye(4).at[2, 3].set(2.0), (Vm, 4, 4))
    Ks = jnp.broadcast_to(K, (Vm, 3, 3))
    kwargs = dict(imsize=float(H), vertex_stride=1)
    if use_crop:
        crops, origins, _ = sil.compute_mask_crops(
            list(masks), crop_hw=crop_hw
        )
        kwargs.update(
            mask_crops=jnp.asarray(crops),
            mask_crop_origins=jnp.asarray(origins),
            full_hw=(H, H),
        )
        m = None
    else:
        m = jnp.asarray(masks)

    old_si, old_cm = sil.STAY_INSIDE, sil.CONTOUR_MATCH
    sil.STAY_INSIDE = impl
    sil.CONTOUR_MATCH = impl
    try:
        return jax.value_and_grad(
            lambda v: sil.silhouette_loss(
                jnp.asarray(rc), jnp.asarray(rw), m, w2cs, Ks, v, **kwargs
            )
        )(verts)
    finally:
        sil.STAY_INSIDE, sil.CONTOUR_MATCH = old_si, old_cm


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_crop_path_matches_full(two_masks, rng, impl):
    verts = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32) * 0.5)
    lf, gf = _loss_pair(two_masks, verts, impl, use_crop=False)
    lc, gc = _loss_pair(two_masks, verts, impl, use_crop=True)
    np.testing.assert_allclose(float(lc), float(lf), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gc), np.asarray(gf),
        atol=2e-5 * float(jnp.max(jnp.abs(gf))),
    )


def test_padded_view_contributes_nothing(two_masks, rng):
    verts = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32) * 0.5)
    crops, origins, (Hc, Wc) = sil.compute_mask_crops(list(two_masks))
    contours, valid = sil.extract_contours(list(two_masks))
    rc, rw = sil.resample_contours(contours, valid, 64)
    H = two_masks.shape[1]
    K = jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    w2cs = jnp.broadcast_to(jnp.eye(4).at[2, 3].set(2.0), (2, 4, 4))
    Ks = jnp.broadcast_to(K, (2, 3, 3))

    base = sil.silhouette_loss(
        jnp.asarray(rc), jnp.asarray(rw), None, w2cs, Ks, verts,
        imsize=float(H), vertex_stride=1,
        mask_crops=jnp.asarray(crops),
        mask_crop_origins=jnp.asarray(origins),
        full_hw=(H, H),
    )
    # + one inert view: ones crop, zero validity, zero contours
    rc3 = np.concatenate([rc, np.zeros((1,) + rc.shape[1:], np.float32)])
    rw3 = np.concatenate([rw, np.zeros((1,) + rw.shape[1:], np.float32)])
    crops3 = np.concatenate(
        [crops, np.ones((1, Hc, Wc), np.float32)]
    )
    orig3 = np.concatenate([origins, np.zeros((1, 2), np.float32)])
    padded = sil.silhouette_loss(
        jnp.asarray(rc3), jnp.asarray(rw3), None,
        jnp.concatenate([w2cs, jnp.eye(4)[None]]),
        jnp.concatenate([Ks, jnp.eye(3)[None]]),
        verts, imsize=float(H), vertex_stride=1,
        mask_crops=jnp.asarray(crops3),
        mask_crop_origins=jnp.asarray(orig3),
        mask_view_valid=jnp.asarray([1.0, 1.0, 0.0]),
        full_hw=(H, H),
    )
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-6)


def test_build_observations_mask_crop(two_masks):
    from bodyfitting_tpu.fitting.body_fitting import build_observations

    c2ws = [np.eye(4, dtype=np.float32)] * 2
    Ks = [np.eye(3, dtype=np.float32)] * 2
    obs = build_observations(
        c2ws, Ks, [None, None], use_hand_face=False,
        masks=list(two_masks), mask_c2ws=c2ws, mask_Ks=Ks,
        mask_num_views=3, mask_imsize=128, build_sdf=False,
        mask_crop=True,
    )
    assert obs.mask_crops is not None
    assert obs.mask_crops.shape[0] == 3
    assert obs.mask_view_valid.tolist() == [1.0, 1.0, 0.0]
    # full masks are not shipped on the crop path (h2d + HBM savings)
    assert obs.masks is None
    # crop content matches the binarized host masks at the origins
    Hc, Wc = obs.mask_crops.shape[1:]
    for i in range(2):
        ox, oy = (int(obs.mask_crop_origins[i, 0]),
                  int(obs.mask_crop_origins[i, 1]))
        np.testing.assert_array_equal(
            np.asarray(obs.mask_crops[i]),
            sil.binarize_mask(two_masks[i])[oy:oy + Hc, ox:ox + Wc],
        )


def test_fused_view_term_matches_separate(two_masks, rng):
    """The single-custom-vjp fused view term (r5: one combined projection
    cotangent instead of the ICP/stay-inside pair) must reproduce the
    separate pallas ops' value and gradient exactly (same kernels, same
    algebra — only the cotangent assembly differs)."""
    verts = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32) * 0.5)
    old = sil.FUSED_MASK_TERM
    try:
        sil.FUSED_MASK_TERM = "separate"
        ls, gs = _loss_pair(two_masks, verts, "pallas", use_crop=True)
        sil.FUSED_MASK_TERM = "fused"
        lf, gf = _loss_pair(two_masks, verts, "pallas", use_crop=True)
    finally:
        sil.FUSED_MASK_TERM = old
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gf), np.asarray(gs),
        atol=2e-6 * max(1e-30, float(jnp.max(jnp.abs(gs)))),
    )


def test_fused_view_term_padded_view_inert(two_masks, rng):
    """mask_view_valid=0 must zero a padded view's binary term in the
    fused path too (its ICP rows are zeroed by contour_valid)."""
    verts = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32) * 0.5)
    old = sil.FUSED_MASK_TERM
    crops, origins, (Hc, Wc) = sil.compute_mask_crops(list(two_masks))
    contours, valid = sil.extract_contours(list(two_masks))
    rc, rw = sil.resample_contours(contours, valid, 64)
    H = two_masks.shape[1]
    K = jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])

    def loss(n_views, vvalid):
        w2cs = jnp.broadcast_to(
            jnp.eye(4).at[2, 3].set(2.0), (n_views, 4, 4)
        )
        Ks = jnp.broadcast_to(K, (n_views, 3, 3))
        return float(sil.silhouette_loss(
            jnp.asarray(rc[:n_views]), jnp.asarray(rw[:n_views]), None,
            w2cs, Ks, verts, imsize=float(H), vertex_stride=1,
            mask_crops=jnp.asarray(crops[:n_views]),
            mask_crop_origins=jnp.asarray(origins[:n_views]),
            mask_view_valid=jnp.asarray(vvalid),
            full_hw=(H, H),
        ))

    try:
        sil.STAY_INSIDE = "pallas"
        sil.CONTOUR_MATCH = "pallas"
        sil.FUSED_MASK_TERM = "fused"
        one = loss(1, [1.0])
        both = loss(2, [1.0, 0.0])
        # view 2's stay-inside term is zeroed; its ICP term survives only
        # through contour_valid rows, which are real here — so compare
        # against the separate computation of the same 2-view setup
        sil.FUSED_MASK_TERM = "separate"
        both_sep = loss(2, [1.0, 0.0])
    finally:
        sil.FUSED_MASK_TERM = old
        sil.STAY_INSIDE = "auto"
        sil.CONTOUR_MATCH = "auto"
    np.testing.assert_allclose(both, both_sep, rtol=1e-6)
    assert both != one  # the second view's ICP rows still count


def test_with_cov_false_kernel_matches(rng):
    from bodyfitting_tpu.ops.pallas_kernels import bilinear_cov_grads

    img = jnp.asarray(rng.random((64, 128)).astype(np.float32))
    xy = jnp.asarray(
        rng.uniform(-5, 130, size=(200, 2)).astype(np.float32)
    )
    full = bilinear_cov_grads(img, xy, interpret=True)
    nocov = bilinear_cov_grads(img, xy, interpret=True, with_cov=False)
    np.testing.assert_array_equal(np.asarray(nocov[0]), np.asarray(full[0]))
    np.testing.assert_array_equal(np.asarray(nocov[2]), np.asarray(full[2]))
    np.testing.assert_array_equal(np.asarray(nocov[3]), np.asarray(full[3]))


def test_staged_fit_crop_vs_full_trajectory(rng):
    """A short staged mask fit must follow the same trajectory with and
    without crops (value-exactness at the loss level propagates through
    the optimizer for a few dozen iterations before f32 chaos can
    amplify ulp-level coverage differences)."""
    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
    from bodyfitting_tpu.models import body_model as bm

    model = bm.synthetic_model("smpl", num_verts=512, seed=0)
    prior = synthetic_gmm_prior()
    masks = np.zeros((2, 64, 64), np.float32)
    masks[:, 16:48, 20:44] = 1.0
    contours, valid = sil.extract_contours(list(masks))
    rc, rw = sil.resample_contours(contours, valid, 64)
    crops, origins, _ = sil.compute_mask_crops(list(masks))

    rng_np = np.random.default_rng(0)
    K = jnp.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    n_kp = 1 + model.J_regressor.shape[0]
    obs = smplify.Observations(
        w2cs=jnp.broadcast_to(w2c, (2, 4, 4)),
        Ks=jnp.broadcast_to(K, (2, 3, 3)),
        keypoints=jnp.asarray(
            rng_np.uniform(10, 50, size=(2, n_kp, 3)), jnp.float32
        ),
        view_mask=jnp.ones((2,)),
        constant_scale=jnp.asarray(0.3),
        masks=jnp.asarray(masks),
        mask_w2cs=jnp.broadcast_to(w2c, (2, 4, 4)),
        mask_Ks=jnp.broadcast_to(K, (2, 3, 3)),
        contours=jnp.asarray(rc),
        contour_valid=jnp.asarray(rw),
    )
    cfg = smplify.FitConfig(num_iters=30, use_mask=True, imsize=64.0)
    init = smplify.FitParams.init(model)
    p_full, _, l_full = smplify.fit(model, cfg, obs, init, prior)
    obs_crop = dataclasses.replace(
        obs,
        mask_crops=jnp.asarray(crops),
        mask_crop_origins=jnp.asarray(origins),
        mask_view_valid=jnp.ones(2, jnp.float32),
    )
    p_crop, _, l_crop = smplify.fit(model, cfg, obs_crop, init, prior)
    np.testing.assert_allclose(
        np.asarray(l_crop), np.asarray(l_full), rtol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_crop.body.body_pose),
        np.asarray(p_full.body.body_pose), atol=1e-5,
    )


def test_harmonize_mask_crops_pads_exactly(two_masks, rng):
    """Zero-padding a crop window (batch-shape harmonization in the
    genebody app) must not change the loss: padded rows/cols read 0,
    exactly like sampling the full zero-padded mask there."""
    from bodyfitting_tpu.apps.genebody import Runner

    verts = jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32) * 0.5)
    crops, origins, (Hc, Wc) = sil.compute_mask_crops(list(two_masks))
    contours, valid = sil.extract_contours(list(two_masks))
    rc, rw = sil.resample_contours(contours, valid, 64)
    H = two_masks.shape[1]
    K = jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    w2cs = jnp.broadcast_to(jnp.eye(4).at[2, 3].set(2.0), (2, 4, 4))
    Ks = jnp.broadcast_to(K, (2, 3, 3))

    def loss(crop_arr):
        return float(sil.silhouette_loss(
            jnp.asarray(rc), jnp.asarray(rw), None, w2cs, Ks, verts,
            imsize=float(H), vertex_stride=1,
            mask_crops=jnp.asarray(crop_arr),
            mask_crop_origins=jnp.asarray(origins),
            full_hw=(H, H),
        ))

    base = loss(crops)
    padded = np.zeros((2, Hc + 16, Wc + 128), np.float32)
    padded[:, :Hc, :Wc] = crops
    np.testing.assert_allclose(loss(padded), base, rtol=1e-6)

    # the app helper produces exactly that padding
    import dataclasses

    from bodyfitting_tpu.fitting import smplify

    def obs_with(c):
        return smplify.Observations(
            w2cs=w2cs, Ks=Ks, keypoints=jnp.zeros((2, 1, 3)),
            view_mask=jnp.ones(2), constant_scale=jnp.asarray(0.3),
            mask_crops=jnp.asarray(c),
            mask_crop_origins=jnp.asarray(origins),
            mask_view_valid=jnp.ones(2),
        )

    small = obs_with(crops)
    big = obs_with(padded)
    out = Runner._harmonize_mask_crops([small, big])
    assert out[0].mask_crops.shape == out[1].mask_crops.shape
    np.testing.assert_array_equal(
        np.asarray(out[0].mask_crops[:, :Hc, :Wc]), crops
    )
    assert float(np.abs(np.asarray(out[0].mask_crops)[:, Hc:, :]).max()) == 0
