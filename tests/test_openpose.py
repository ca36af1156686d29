"""OpenPose detector tests: architecture shapes, converter roundtrip, and
recovery of a synthetic two-person skeleton from constructed PAF fields."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bodyfitting_tpu.models import openpose as op
from bodyfitting_tpu.models import openpose_infer as opi


def test_body_net_shapes():
    model, variables = op.init_body_net()
    x = jnp.zeros((1, 64, 96, 3))
    paf, hm = model.apply(variables, x)
    assert paf.shape == (1, 8, 12, 38)
    assert hm.shape == (1, 8, 12, 19)


def test_hand_net_shapes():
    model, variables = op.init_hand_net()
    x = jnp.zeros((1, 64, 64, 3))
    hm = model.apply(variables, x)
    assert hm.shape == (1, 8, 8, 22)


def test_converter_roundtrip_body():
    """A torch-layout state dict built from the flax tree converts back
    exactly (validates the name mapping + OIHW/HWIO transposition)."""
    import flax

    model, variables = op.init_body_net()
    flat = flax.traverse_util.flatten_dict(variables)
    sd = {}
    for path, val in flat.items():
        layer, leaf = path[-3], path[-1]
        # bury under an arbitrary torch block prefix like 'model2_1.'
        key = f"model0.{layer}.weight" if leaf == "kernel" else \
            f"model0.{layer}.bias"
        v = np.asarray(val)
        if leaf == "kernel":
            v = v.transpose(3, 2, 0, 1)        # HWIO -> OIHW
        sd[key] = v
    converted = op.convert_openpose_torch(sd, variables)
    for path, val in flax.traverse_util.flatten_dict(converted).items():
        np.testing.assert_array_equal(np.asarray(val),
                                      np.asarray(flat[path]))


def _synthetic_fields(people, H=128, W=128):
    """Heatmaps + PAFs for a list of 18-part skeletons."""
    heat = np.zeros((H, W, 19), np.float32)
    paf = np.zeros((H, W, 38), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for kp in people:
        for part in range(18):
            x, y = kp[part]
            heat[:, :, part] += np.exp(
                -((xx - x) ** 2 + (yy - y) ** 2) / (2 * 2.0 ** 2)
            )
        for limb, midx in zip(opi.LIMB_SEQ, opi.MAP_IDX):
            a = np.array(kp[limb[0] - 1], np.float64)
            b = np.array(kp[limb[1] - 1], np.float64)
            vec = b - a
            norm = np.linalg.norm(vec)
            if norm < 1e-6:
                continue
            vecn = vec / norm
            # paint the PAF in a thick band along the limb
            ap = np.stack([xx - a[0], yy - a[1]], -1)
            t = (ap @ vecn) / norm
            perp = np.abs(ap @ np.array([-vecn[1], vecn[0]]))
            band = (t >= -0.05) & (t <= 1.05) & (perp < 4)
            ch = [midx[0] - 19, midx[1] - 19]
            paf[:, :, ch[0]][band] = vecn[0]
            paf[:, :, ch[1]][band] = vecn[1]
    return heat, paf


def _skeleton(cx, cy, s=1.0):
    """A plausible 18-part stick figure centred at (cx, cy)."""
    base = {
        0: (0, -42), 1: (0, -30), 2: (-12, -30), 3: (-16, -12),
        4: (-18, 4), 5: (12, -30), 6: (16, -12), 7: (18, 4),
        8: (-8, 0), 9: (-9, 20), 10: (-10, 40), 11: (8, 0),
        12: (9, 20), 13: (10, 40), 14: (-4, -45), 15: (4, -45),
        16: (-9, -43), 17: (9, -43),
    }
    return {
        k: (cx + s * dx, cy + s * dy) for k, (dx, dy) in base.items()
    }


def test_assembly_recovers_two_people():
    p1 = _skeleton(40, 60)
    p2 = _skeleton(90, 60)
    heat, paf = _synthetic_fields([p1, p2])
    peaks = opi.find_peaks(heat, thre1=0.3)
    candidate, subset = opi.assemble_people(peaks, paf, img_h=128)
    assert len(subset) == 2
    # each recovered person has (almost) all 18 parts
    assert (subset[:, -1] >= 16).all()
    # people don't share keypoints, and positions match the skeletons
    for row in subset:
        idx0 = int(row[0])
        nose = candidate[idx0][:2]
        d1 = np.hypot(nose[0] - p1[0][0], nose[1] - p1[0][1])
        d2 = np.hypot(nose[0] - p2[0][0], nose[1] - p2[0][1])
        src = p1 if d1 < d2 else p2
        for part in range(18):
            ci = int(row[part])
            if ci < 0:
                continue
            got = candidate[ci][:2]
            want = src[part]
            assert np.hypot(got[0] - want[0], got[1] - want[1]) < 3.0


def test_person_to_body25_midhip():
    p = _skeleton(50, 60)
    heat, paf = _synthetic_fields([p])
    peaks = opi.find_peaks(heat, thre1=0.3)
    candidate, subset = opi.assemble_people(peaks, paf, img_h=128)
    b25 = opi.person_to_body25(candidate, subset[0])
    assert b25.shape == (25, 3)
    # MidHip synthesized between the hips
    want = ((np.array(p[8]) + np.array(p[11])) / 2)
    np.testing.assert_allclose(b25[8, :2], want, atol=3.0)
    # feet slots (19..24) stay empty for the COCO model
    assert b25[19:, 2].sum() == 0


def test_hand_boxes_geometry():
    candidate = np.zeros((8, 4))
    # person with right arm: shoulder(2), elbow(3), wrist(4)
    candidate[0, :2] = [50, 50]   # shoulder
    candidate[1, :2] = [80, 50]   # elbow
    candidate[2, :2] = [110, 50]  # wrist
    row = -1 * np.ones((1, 20))
    row[0, 2], row[0, 3], row[0, 4] = 0, 1, 2
    boxes = opi.hand_boxes(candidate, row, (200, 300))
    assert len(boxes) == 1
    x, y, w, is_left = boxes[0]
    assert not is_left
    assert w >= 20
    # box is centred past the wrist, away from the elbow
    assert x + w / 2 > 110


def test_detect_to_json_contract(tmp_path, monkeypatch):
    """detect_to_json writes parseable OpenPose JSONs (stub detector)."""
    import cv2

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "00.png"),
                np.zeros((64, 64, 3), np.uint8))

    p = _skeleton(32, 32, s=0.5)
    heat, paf = _synthetic_fields([p], H=64, W=64)

    class StubBody:
        def __call__(self, img):
            peaks = opi.find_peaks(heat, thre1=0.3)
            return opi.assemble_people(peaks, paf, img_h=64)

    out_dir = tmp_path / "openpose"
    opi.detect_to_json(str(img_dir), str(out_dir), StubBody())
    from bodyfitting_tpu.io import load_openpose

    kp = load_openpose(str(out_dir / "00_keypoints.json"))
    assert kp is not None and kp["pose"].shape == (25, 3)
    assert kp["pose"][:, 2].sum() > 10  # most parts confident


def test_body_detector_smoke():
    """Full multiscale detector pipeline with random weights: shapes + no
    crashes (real checkpoints unavailable in this environment)."""
    import numpy as np

    from bodyfitting_tpu.models.openpose_infer import BodyDetector

    det = BodyDetector(scales=(0.5,))
    img = (np.random.default_rng(0).uniform(0, 255, size=(96, 80, 3))
           ).astype(np.uint8)
    candidate, subset = det(img)
    assert candidate.ndim == 2 and candidate.shape[1] == 4
    assert subset.ndim == 2 and subset.shape[1] == 20


def test_hand_detector_smoke():
    import numpy as np

    from bodyfitting_tpu.models.openpose_infer import HandDetector

    det = HandDetector(scales=(0.5,))
    crop = (np.random.default_rng(1).uniform(0, 255, size=(64, 64, 3))
            ).astype(np.uint8)
    peaks = det(crop)
    assert peaks.shape == (21, 3)
    # detected peaks carry the real heatmap score, not a 0/1 flag
    found = peaks[peaks[:, 2] > 0]
    if len(found):
        assert not np.all(found[:, 2] == 1.0)


def test_face_detector_smoke():
    import numpy as np

    from bodyfitting_tpu.models.openpose_infer import FaceDetector

    det = FaceDetector(scales=(0.5,))
    crop = (np.random.default_rng(2).uniform(0, 255, size=(64, 64, 3))
            ).astype(np.uint8)
    peaks = det(crop)
    assert peaks.shape == (70, 3)
    assert np.isfinite(peaks).all()


def test_face_box_from_head_keypoints():
    candidate = np.zeros((4, 4))
    candidate[0, :2] = [100, 60]   # nose
    candidate[1, :2] = [100, 100]  # neck
    candidate[2, :2] = [90, 50]    # left eye (part 14)
    candidate[3, :2] = [110, 50]   # right eye (part 15)
    row = -1 * np.ones(20)
    row[0], row[1], row[14], row[15] = 0, 1, 2, 3
    box = opi.face_box(candidate, row, (200, 300))
    assert box is not None
    x, y, w = box
    # 1.5x the neck-nose distance (40px) = 60px square around the head
    assert w == 60
    assert x <= 100 <= x + w and y <= 60 <= y + w


def test_detect_to_json_with_face(tmp_path):
    """Face block: real FaceDetector pipeline on synthetic heatmaps ->
    JSON -> loader -> nonzero face confidences in model order."""
    import cv2

    from bodyfitting_tpu.models.openpose_infer import FaceDetector

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "00.png"), np.zeros((256, 256, 3), np.uint8))

    p = _skeleton(128, 140, s=2.0)
    heat, paf = _synthetic_fields([p], H=256, W=256)

    class StubBody:
        def __call__(self, img):
            peaks = opi.find_peaks(heat, thre1=0.3)
            return opi.assemble_people(peaks, paf, img_h=256)

    det = FaceDetector(scales=(0.5,))

    def fake_apply(x):
        # gaussian bumps: part k peaks at a grid position, score ~0.7
        h, w = x.shape[1] // 8, x.shape[2] // 8
        hm = np.zeros((1, h, w, 71), np.float32)
        ys, xs = np.mgrid[0:h, 0:w]
        for k in range(70):
            cy, cx = 2 + (k % 5), 2 + (k // 5 % 5)
            hm[0, :, :, k] = 0.7 * np.exp(
                -((ys - cy) ** 2 + (xs - cx) ** 2) / 4.0
            )
        return jnp.asarray(hm)

    det._apply = fake_apply
    out_dir = tmp_path / "openpose"
    opi.detect_to_json(
        str(img_dir), str(out_dir), StubBody(), hand=None,
        hand_face=True, face=det,
    )
    from bodyfitting_tpu.io import load_openpose

    kp = load_openpose(str(out_dir / "00_keypoints.json"))
    assert kp is not None and "face" in kp
    assert kp["face"].shape == (70, 3)
    assert (kp["face"][:, 2] > 0).sum() >= 60
    # confidences are heatmap scores, not presence flags
    conf = kp["face"][kp["face"][:, 2] > 0, 2]
    assert np.all(conf < 1.0) and np.all(conf > 0.05)


def test_smplx_fit_from_native_detector(tmp_path):
    """End-to-end: native detector JSONs (body + face w/ real confidences)
    -> pack_keypoints -> SMPL-X fit; the face term contributes to the loss."""
    import cv2

    from bodyfitting_tpu.fitting import smplify
    from bodyfitting_tpu.io import load_openpose
    from bodyfitting_tpu.io.openpose import pack_keypoints
    from bodyfitting_tpu.losses.priors import synthetic_gmm_prior
    from bodyfitting_tpu.models import body_model as bm
    from bodyfitting_tpu.models.openpose_infer import FaceDetector

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "00.png"), np.zeros((256, 256, 3), np.uint8))

    p = _skeleton(128, 140, s=2.0)
    heat, paf = _synthetic_fields([p], H=256, W=256)

    class StubBody:
        def __call__(self, img):
            peaks = opi.find_peaks(heat, thre1=0.3)
            return opi.assemble_people(peaks, paf, img_h=256)

    det = FaceDetector(scales=(0.5,))

    def fake_apply(x):
        h, w = x.shape[1] // 8, x.shape[2] // 8
        hm = np.zeros((1, h, w, 71), np.float32)
        ys, xs = np.mgrid[0:h, 0:w]
        for k in range(70):
            cy, cx = 2 + (k % 5), 2 + (k // 5 % 5)
            hm[0, :, :, k] = 0.7 * np.exp(
                -((ys - cy) ** 2 + (xs - cx) ** 2) / 4.0
            )
        return jnp.asarray(hm)

    det._apply = fake_apply
    out_dir = tmp_path / "openpose"
    opi.detect_to_json(
        str(img_dir), str(out_dir), StubBody(), hand=None,
        hand_face=True, face=det,
    )
    kp = load_openpose(str(out_dir / "00_keypoints.json"))
    packed, view_mask = pack_keypoints([kp], use_hand_face=True)
    assert packed.shape == (1, 135, 3)
    face_conf = packed[0, 25 + 42:, 2]
    assert (face_conf > 0).sum() >= 50      # nonzero face confidences

    model = bm.synthetic_model("smplx", num_verts=512, seed=0,
                               use_face_contour=True)
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]])
    w2c = jnp.eye(4).at[2, 3].set(3.0)
    obs = smplify.Observations(
        w2cs=w2c[None], Ks=K[None], keypoints=jnp.asarray(packed),
        view_mask=jnp.asarray(view_mask), constant_scale=jnp.asarray(0.3),
    )
    config = smplify.FitConfig(num_iters=20, imsize=256.0)
    init = smplify.FitParams.init(model)
    prior = synthetic_gmm_prior()
    import jax as _jax

    params, result, losses = _jax.jit(
        lambda o, i: smplify.fit(model, config, o, i, prior)
    )(obs, init)
    assert np.isfinite(np.asarray(losses)).all()
    # the face block actually enters the objective
    _, terms = smplify.fit_loss(
        model, config, init, obs, jnp.asarray(0), prior
    )
    assert float(terms["face_loss"]) > 0.0
