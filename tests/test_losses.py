"""Loss-library tests, including differential tests vs the reference math
re-implemented with torch-free numpy loops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bodyfitting_tpu import losses
from bodyfitting_tpu.losses import keypoints as kp
from bodyfitting_tpu.losses import priors


def test_gmof_matches_formula(rng):
    x = jnp.asarray(rng.normal(size=(7, 2)) * 50, jnp.float32)
    got = np.asarray(kp.gmof(x, 100.0))
    xn = np.asarray(x, np.float64)
    want = (100.0 ** 2 * xn ** 2) / (100.0 ** 2 + xn ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reprojection_loss_conf_weighting(rng):
    cord = jnp.zeros((5, 2))
    gt = jnp.asarray(rng.normal(size=(5, 2)) * 10, jnp.float32)
    conf = jnp.array([1.0, 0.5, 0.0, 2.0, 1.0])
    got = float(kp.reprojection_loss(cord, gt, conf, 0.5, 100.0))
    want = 0.0
    for k in range(5):
        err = np.asarray(kp.gmof(gt[k] / 0.5, 100.0)).sum()
        want += float(conf[k]) ** 2 * err
    assert got == pytest.approx(want, rel=1e-5)


def test_angle_prior_indices_and_signs():
    pose = jnp.zeros((69,))
    base = np.asarray(kp.angle_prior(pose))
    np.testing.assert_allclose(base, np.ones(4), atol=1e-6)
    # bending the left elbow (idx 52) positively increases the penalty
    p2 = pose.at[52].set(1.0)
    assert np.asarray(kp.angle_prior(p2))[0] > 1.0
    # natural (negative) bending decreases it
    p3 = pose.at[52].set(-1.0)
    assert np.asarray(kp.angle_prior(p3))[0] < 1.0
    # knee sign is flipped: positive bend decreases
    p4 = pose.at[9].set(1.0)
    assert np.asarray(kp.angle_prior(p4))[2] < 1.0


def test_gmm_prior_differential(rng):
    prior = priors.synthetic_gmm_prior(num_gaussians=4, dim=12, seed=3)
    pose = rng.normal(size=(12,)).astype(np.float32)
    got = float(prior(jnp.asarray(pose)))

    means = np.asarray(prior.means, np.float64)
    precs = np.asarray(prior.precisions, np.float64)
    logw = np.asarray(prior.log_nll_weights, np.float64)
    vals = []
    for k in range(4):
        d = pose - means[k]
        vals.append(0.5 * d @ precs[k] @ d - logw[k])
    assert got == pytest.approx(min(vals), rel=1e-4)


def test_gmm_prior_batch_and_grad(rng):
    prior = priors.synthetic_gmm_prior(num_gaussians=8, dim=69)
    poses = jnp.asarray(rng.normal(size=(5, 69)), jnp.float32)
    nll = jax.jit(prior.__call__)(poses)
    assert nll.shape == (5,)
    g = jax.grad(lambda p: prior(p).sum())(poses)
    assert np.isfinite(np.asarray(g)).all()


def _toy_multiview_setup(rng, use_hand_face=False):
    K = jnp.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    nviews = 3
    w2cs = jnp.stack([jnp.eye(4)] * nviews)
    # put the subject 2m in front of every camera
    w2cs = w2cs.at[:, 2, 3].set(2.0)
    Ks = jnp.stack([K] * nviews)
    njoints = 135 if use_hand_face else 25
    joints = jnp.asarray(rng.normal(scale=0.3, size=(njoints, 3)), jnp.float32)
    return w2cs, Ks, joints


def test_multiview_keypoint_loss_zero_at_perfect_reprojection(rng):
    w2cs, Ks, joints = _toy_multiview_setup(rng)
    from bodyfitting_tpu.ops.camera import perspective_projection

    kps = jax.vmap(
        lambda w2c, K: perspective_projection(
            joints[None], w2c[None, :3, :3], w2c[None, :3, 3], K[None]
        )[0]
    )(w2cs, Ks)
    kps = jnp.concatenate([kps, jnp.ones_like(kps[..., :1])], -1)
    total, terms = losses.multiview_keypoint_loss(
        w2cs, Ks, kps, jnp.ones(3), joints,
        jnp.zeros(69), jnp.zeros(10), lambda p: jnp.zeros(()),
    )
    assert float(terms["reprojection_loss"]) == pytest.approx(0.0, abs=1e-4)
    # angle prior at zero pose contributes 4 * 15.2^2
    assert float(total) == pytest.approx(4 * 15.2 ** 2, rel=1e-5)


def test_multiview_keypoint_loss_view_masking(rng):
    w2cs, Ks, joints = _toy_multiview_setup(rng)
    kps = jnp.asarray(rng.uniform(0, 512, size=(3, 25, 3)), jnp.float32)
    prior = lambda p: jnp.zeros(())  # noqa: E731

    # garbage keypoints in view 2, masked out == that view zeroed
    masked, _ = losses.multiview_keypoint_loss(
        w2cs, Ks, kps, jnp.array([1.0, 1.0, 0.0]), joints,
        jnp.zeros(69), jnp.zeros(10), prior,
    )
    zeroed_kps = kps.at[2, :, 2].set(0.0)  # conf 0 == no contribution
    zeroed, _ = losses.multiview_keypoint_loss(
        w2cs, Ks, zeroed_kps, jnp.ones(3), joints,
        jnp.zeros(69), jnp.zeros(10), prior,
    )
    assert float(masked) == pytest.approx(float(zeroed), rel=1e-6)


def test_multiview_keypoint_loss_hand_face_blocks(rng):
    w2cs, Ks, joints = _toy_multiview_setup(rng, use_hand_face=True)
    kps = jnp.asarray(rng.uniform(0, 512, size=(3, 135, 3)), jnp.float32)
    total, terms = losses.multiview_keypoint_loss(
        w2cs, Ks, kps, jnp.ones(3), joints,
        jnp.zeros(69), jnp.zeros(10), lambda p: jnp.zeros(()),
        use_hand_face=True,
    )
    assert float(terms["hand_loss"]) > 0
    assert float(terms["face_loss"]) > 0
    # killing hand+face confidences removes exactly those terms
    kps2 = kps.at[:, 25:, 2].set(0.0)
    total2, terms2 = losses.multiview_keypoint_loss(
        w2cs, Ks, kps2, jnp.ones(3), joints,
        jnp.zeros(69), jnp.zeros(10), lambda p: jnp.zeros(()),
        use_hand_face=True,
    )
    assert float(terms2["hand_loss"]) == 0
    assert float(terms2["body_loss"]) == pytest.approx(
        float(terms["body_loss"])
    )


def test_vertex_normals_unit_sphere(rng):
    # icosahedron-ish: random points on a sphere, normals point outward
    pts = rng.normal(size=(64, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    from scipy.spatial import ConvexHull

    hull = ConvexHull(pts)
    faces = hull.simplices.astype(np.int32)
    # orient faces outward
    tris = pts[faces]
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    centers = tris.mean(1)
    flip = (n * centers).sum(-1) < 0
    faces[flip] = faces[flip][:, ::-1]

    vn = np.asarray(
        losses.compute_vertex_normals(jnp.asarray(pts, jnp.float32),
                                      jnp.asarray(faces))
    )
    cos = (vn * pts).sum(-1)
    assert cos.min() > 0.8  # all normals roughly radial


def test_point_cloud_loss_is_frobenius(rng):
    verts = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    pts = jnp.array([[0.2, 0.2, 0.5], [0.3, 0.3, -0.25]])
    got = float(losses.point_cloud_loss(pts, verts, faces))
    # distances are 0.5 and 0.25 -> frobenius sqrt(0.25 + 0.0625)
    assert got == pytest.approx(np.sqrt(0.3125), rel=1e-5)


def test_laplacian_smoothness_zero_for_constant_normals():
    normals = jnp.ones((10, 3))
    faces = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
    assert float(losses.normal_laplacian_smoothness(normals, faces)) == 0.0


def test_extract_contours_two_blobs():
    # Deliberate divergence vs reference loss.py:79 (README): on a
    # multi-component mask we take the LARGEST outer contour; the
    # reference's argmax over cv2-contour shape[1] (always 1) silently
    # takes the FIRST in cv2 emission order.  Pin that the big blob
    # wins regardless of its scan-order position.
    mask = np.zeros((128, 128), np.float32)
    mask[8:16, 8:16] = 1.0       # small noise blob, emitted first/last
    mask[48:112, 40:104] = 1.0   # the person: 64x64 blob
    contours, valid = losses.extract_contours([mask])
    pts = contours[0][valid[0] > 0]
    # every contour pixel must lie on the big blob's boundary box
    assert pts[:, 0].min() >= 39 and pts[:, 0].max() <= 104
    assert pts[:, 1].min() >= 47 and pts[:, 1].max() <= 112
    # and the contour has the big blob's perimeter scale, not the small's
    assert (valid[0] > 0).sum() > 4 * 32


def test_silhouette_loss_pulls_outward(rng):
    # square mask 128x128 with a filled square [32, 96)^2
    H = 128
    mask = np.zeros((H, H), np.float32)
    mask[32:96, 32:96] = 1.0
    contours, valid = losses.extract_contours([mask])

    K = jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(2.0)

    def loss_for(scale):
        # a 3D square grid of points at z=0 that projects inside the mask
        g = np.linspace(-0.3, 0.3, 8) * scale
        pts = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
        pts3 = np.concatenate([pts, np.zeros((64, 1))], -1).astype(np.float32)
        return float(
            losses.silhouette_loss(
                jnp.asarray(contours), jnp.asarray(valid),
                jnp.asarray(mask)[None], w2c[None], K[None],
                jnp.asarray(pts3), vertex_stride=1, imsize=float(H),
            )
        )

    # a tiny blob far from the contour costs more than one that fills it
    assert loss_for(1.0) > loss_for(2.0)


def test_onehot_bilinear_matches_gather_bilinear(rng):
    """The MXU one-hot sampler must equal the 4-tap gather sampler,
    including out-of-image points (zero padding) and the stay-inside
    algebra (coverage - mask_sample == (1-mask) sample)."""
    from bodyfitting_tpu.losses.silhouette import (
        _bilinear_sample_onehot,
        _bilinear_sample_zero_pad,
        _separable_bilinear_weights,
    )

    H, W = 48, 64
    S = 56.0  # normalisation constant distinct from both H and W
    img = jnp.asarray(rng.uniform(size=(H, W)), jnp.float32)
    xy = jnp.asarray(
        rng.uniform(-10, 74, size=(300, 2)), jnp.float32
    )  # includes far out-of-bounds on both sides
    a = np.asarray(_bilinear_sample_zero_pad(img, xy, S))
    b = np.asarray(_bilinear_sample_onehot(img, xy, S))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)

    inv = np.asarray(_bilinear_sample_zero_pad(1.0 - img, xy, S))
    row_w, col_w = _separable_bilinear_weights((H, W), xy, jnp.float32, S)
    coverage = np.asarray(jnp.sum(row_w, -1) * jnp.sum(col_w, -1))
    np.testing.assert_allclose(
        inv, coverage - b, rtol=0, atol=3e-5
    )

    # gradients w.r.t. coordinates agree too (the term's purpose)
    ga = jax.grad(lambda p: jnp.sum(_bilinear_sample_zero_pad(img, p, S)))(xy)
    gb = jax.grad(lambda p: jnp.sum(_bilinear_sample_onehot(img, p, S)))(xy)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=0, atol=2e-4
    )


def test_bilinear_sampler_matches_torch12_grid_sample(rng):
    """The JAX sampler must reproduce torch grid_sample with
    align_corners=True — the semantics of torch==1.2.0, the version the
    reference pins (requirements.txt:2), where the argument did not yet
    exist.  Values AND coordinate gradients, including out-of-bounds."""
    import torch
    import torch.nn.functional as F

    from bodyfitting_tpu.losses.silhouette import _bilinear_sample_onehot

    H, W = 40, 52
    S = 48.0
    img_np = rng.uniform(size=(H, W)).astype(np.float32)
    xy_np = rng.uniform(-8, 60, size=(200, 2)).astype(np.float32)

    got = np.asarray(_bilinear_sample_onehot(
        jnp.asarray(img_np), jnp.asarray(xy_np), S))
    gj = np.asarray(jax.grad(lambda p: jnp.sum(
        _bilinear_sample_onehot(jnp.asarray(img_np), p, S)
    ))(jnp.asarray(xy_np)))

    xy_t = torch.tensor(xy_np, requires_grad=True)
    grid = (xy_t / S * 2.0 - 1.0).reshape(1, -1, 1, 2)
    out = F.grid_sample(
        torch.tensor(img_np)[None, None], grid, mode="bilinear",
        padding_mode="zeros", align_corners=True,
    ).reshape(-1)
    out.sum().backward()
    np.testing.assert_allclose(got, out.detach().numpy(), rtol=0, atol=2e-5)
    np.testing.assert_allclose(gj, xy_t.grad.numpy(), rtol=1e-4, atol=2e-4)


def test_silhouette_loss_grad_finite(rng):
    H = 64
    mask = np.zeros((H, H), np.float32)
    mask[16:48, 16:48] = 1.0
    contours, valid = losses.extract_contours([mask])
    K = jnp.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(2.0)
    pts = jnp.asarray(rng.normal(scale=0.2, size=(40, 3)), jnp.float32)

    g = jax.grad(
        lambda p: losses.silhouette_loss(
            jnp.asarray(contours), jnp.asarray(valid),
            jnp.asarray(mask)[None], w2c[None], K[None], p,
            vertex_stride=1, imsize=float(H),
        )
    )(pts)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_resample_contours_preserves_loss_scale(rng):
    """Arc-length resampling: ~same silhouette loss at ~8x fewer points."""
    H = 256
    mask = np.zeros((H, H), np.float32)
    mask[40:200, 64:180] = 1.0
    mask[100:240, 120:160] = 1.0          # non-convex silhouette
    contours, valid = losses.extract_contours([mask])
    assert contours.shape[1] > 512
    rc, rw = losses.resample_contours(contours, valid, 96)
    assert rc.shape == (1, 96, 2)
    # weights preserve the pixel-sum scale
    assert rw[0].sum() == pytest.approx(valid[0].sum(), rel=1e-6)

    K = jnp.array([[200.0, 0, 128], [0, 200.0, 128], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(2.0)
    pts = jnp.asarray(rng.normal(scale=0.3, size=(120, 3)), jnp.float32)

    full = float(losses.silhouette_loss(
        jnp.asarray(contours), jnp.asarray(valid), jnp.asarray(mask)[None],
        w2c[None], K[None], pts, vertex_stride=1, imsize=float(H)))
    res = float(losses.silhouette_loss(
        jnp.asarray(rc), jnp.asarray(rw), jnp.asarray(mask)[None],
        w2c[None], K[None], pts, vertex_stride=1, imsize=float(H)))
    assert res == pytest.approx(full, rel=0.05)


def test_resample_contours_short_contour_passthrough():
    mask = np.zeros((32, 32), np.float32)
    mask[12:20, 12:20] = 1.0
    contours, valid = losses.extract_contours([mask])
    n = int(valid.sum())
    rc, rw = losses.resample_contours(contours, valid, 512)
    assert (rw > 0).sum() == n            # kept verbatim, weight 1
    np.testing.assert_allclose(rc[0, :n], contours[0, :n])


def test_silhouette_onehot_tail_matches_gather_oracle(rng):
    """The one-hot matmul tail (matched coords / inside flags / mask
    sample) must reproduce the naive gather transcription of the
    reference loss exactly — values AND gradients."""
    import jax

    from bodyfitting_tpu.losses import silhouette as sil
    from bodyfitting_tpu.ops.camera import perspective_projection

    Vm, P, H = 2, 40, 64
    contours = jnp.asarray(rng.uniform(0, H, size=(Vm, P, 2)), np.float32)
    cvalid = jnp.asarray((rng.uniform(size=(Vm, P)) > 0.2).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(Vm, H, H)) > 0.5).astype(np.float32))
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
    Ks = jnp.broadcast_to(K, (Vm, 3, 3))
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    w2cs = jnp.broadcast_to(w2c, (Vm, 4, 4))
    verts = jnp.asarray(rng.normal(size=(200, 3)) * 0.5, np.float32)

    def loss(v):
        return sil.silhouette_loss(
            contours, cvalid, masks, w2cs, Ks, v, imsize=float(H)
        )

    def naive(v):
        pts3d = v[::4]
        total = 0.0
        eps = 10.0
        for i in range(Vm):
            proj = perspective_projection(
                pts3d[None], w2cs[i][None, :3, :3], w2cs[i][None, :3, 3],
                Ks[i][None],
            )[0]
            inside = (
                (proj[:, 0] >= 0) & (proj[:, 0] < H)
                & (proj[:, 1] >= 0) & (proj[:, 1] < H)
            )
            png = jax.lax.stop_gradient(proj)
            d2 = jnp.sum((contours[i][:, None, :] - png[None, :, :]) ** 2, -1)
            idx = jnp.argmin(jnp.where(inside[None, :], d2, 1e9), 1)
            matched = proj[idx]
            md = jnp.sqrt(jnp.sum((contours[i] - matched) ** 2, -1) + 1e-12)
            md = jnp.where(inside[idx], md, jnp.sqrt(1e9))
            mx = jnp.clip(matched[:, 0].astype(jnp.int32), 0, H - 1)
            my = jnp.clip(matched[:, 1].astype(jnp.int32), 0, H - 1)
            om = (masks[i][my, mx] < 0.1).astype(jnp.float32)
            total = total + jnp.sum(md * (om * (eps - 1) + 1) * cvalid[i])
            rw, cw = sil._separable_bilinear_weights(
                masks[i].shape, proj, proj.dtype, float(H)
            )
            sampled = jnp.sum((rw @ masks[i]) * cw, -1)
            cov = jnp.sum(rw, -1) * jnp.sum(cw, -1)
            total = total + jnp.sum(cov - sampled) * eps
        return total

    l, g = jax.value_and_grad(loss)(verts)
    ln, gn = jax.value_and_grad(naive)(verts)
    np.testing.assert_allclose(float(l), float(ln), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(gn), rtol=1e-5, atol=1e-6
    )


def test_multiview_keypoint_loss_view_chunked_matches_unchunked(rng):
    """view_chunk accumulates identical loss AND joint-gradients (it is
    the same sum re-associated over view blocks; the cliff fix must not
    change the objective)."""
    K = jnp.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    nviews = 8
    th = jnp.linspace(0.0, 2 * np.pi, nviews, endpoint=False)
    w2cs = jnp.stack([jnp.eye(4)] * nviews)
    w2cs = w2cs.at[:, 0, 0].set(jnp.cos(th)).at[:, 0, 2].set(jnp.sin(th))
    w2cs = w2cs.at[:, 2, 0].set(-jnp.sin(th)).at[:, 2, 2].set(jnp.cos(th))
    w2cs = w2cs.at[:, 2, 3].set(2.5)
    Ks = jnp.stack([K] * nviews)
    joints = jnp.asarray(
        rng.normal(scale=0.3, size=(135, 3)), jnp.float32)
    kps = jnp.asarray(rng.uniform(50, 450, size=(nviews, 135, 3)),
                      jnp.float32)
    vm = jnp.asarray([1, 1, 1, 0, 1, 1, 0, 1], jnp.float32)
    pose = jnp.asarray(rng.normal(scale=0.2, size=69), jnp.float32)
    betas = jnp.asarray(rng.normal(size=10), jnp.float32)
    prior = lambda p: jnp.sum(p * p)  # noqa: E731

    def loss(j, chunk):
        total, _ = losses.multiview_keypoint_loss(
            w2cs, Ks, kps, vm, j, pose, betas, prior,
            use_hand_face=True, view_chunk=chunk,
        )
        return total

    for chunk in (2, 4, 8):
        l0, g0 = jax.value_and_grad(lambda j: loss(j, 0))(joints)
        lc, gc = jax.value_and_grad(lambda j: loss(j, chunk))(joints)
        np.testing.assert_allclose(float(l0), float(lc), rtol=2e-6)
        np.testing.assert_allclose(
            np.asarray(g0), np.asarray(gc), rtol=1e-4, atol=1e-6)
    # non-divisor chunk falls back to the unchunked path
    l3 = loss(joints, 3)
    np.testing.assert_allclose(float(l3), float(loss(joints, 0)), rtol=0)


def test_fit_with_view_chunk_matches_reference_path(rng):
    """A short jitted fit with view_chunk on equals the default path to
    float tolerance (same objective through the whole Adam loop)."""
    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.models import body_model as bm
    from bodyfitting_tpu.ops.camera import ring_cameras

    model = bm.synthetic_model("smplx", num_verts=256, seed=3)
    gt = bm.forward(model, bm.BodyParams.zeros(model))
    cs = jnp.asarray(0.3)
    w2cs = ring_cameras(6, gt.joints.mean(0) * cs, radius=3.0)
    K = jnp.array([[500.0, 0, 256], [0, 500.0, 256], [0, 0, 1]])
    Ks = jnp.stack([K] * 6)
    kps = jnp.asarray(rng.uniform(100, 400, size=(6, 135, 3)), jnp.float32)
    obs = smplify.Observations(
        w2cs=w2cs, Ks=Ks, keypoints=kps, view_mask=jnp.ones(6),
        constant_scale=cs,
    )
    init = smplify.FitParams.init(model)
    zero_prior = lambda p: jnp.zeros(p.shape[:-1], p.dtype)  # noqa: E731
    res = {}
    for chunk in (0, 2):
        config = smplify.FitConfig(
            num_iters=25, imsize=512.0, view_chunk=chunk)
        _, result, ls = jax.jit(
            lambda o, i, cf=config: smplify.fit(model, cf, o, i, zero_prior)
        )(obs, init)
        res[chunk] = (np.asarray(result["vertices"]), np.asarray(ls))
    np.testing.assert_allclose(res[0][1], res[2][1], rtol=2e-5)
    np.testing.assert_allclose(res[0][0], res[2][0], rtol=1e-3, atol=1e-5)
