"""IO tests: OpenPose JSON parsing/packing, OBJ round trips, crop math."""

import json
import os

import numpy as np
import pytest

from bodyfitting_tpu import io as bio
from bodyfitting_tpu.constants import FACE_MAPPING


def _openpose_doc(n_people=1, with_hand_face=True, conf=1.0, seed=0):
    rng = np.random.default_rng(seed)

    def block(n):
        kp = rng.uniform(0, 512, size=(n, 2))
        c = np.full((n, 1), conf)
        return np.concatenate([kp, c], 1).reshape(-1).tolist()

    people = []
    for _ in range(n_people):
        p = {"pose_keypoints_2d": block(25)}
        if with_hand_face:
            p["hand_left_keypoints_2d"] = block(21)
            p["hand_right_keypoints_2d"] = block(21)
            p["face_keypoints_2d"] = block(70)  # openpose emits 70 (68+2 pupils)
        people.append(p)
    return {"version": 1.3, "people": people}


def test_load_openpose_roundtrip(tmp_path):
    doc = _openpose_doc()
    path = tmp_path / "view_00_keypoints.json"
    path.write_text(json.dumps(doc))
    kp = bio.load_openpose(str(path))
    assert set(kp) == {"pose", "hand_left", "hand_right", "face"}
    assert kp["pose"].shape == (25, 3)
    assert kp["face"].shape == (70, 3)
    want = np.asarray(doc["people"][0]["pose_keypoints_2d"]).reshape(25, 3)
    np.testing.assert_allclose(kp["pose"], want, rtol=1e-6)


def test_load_openpose_empty_and_best_person(tmp_path):
    p0 = tmp_path / "empty.json"
    p0.write_text(json.dumps({"people": []}))
    assert bio.load_openpose(str(p0)) is None

    # two people: second has double confidence -> wins
    doc = _openpose_doc(n_people=2, conf=1.0)
    second = _openpose_doc(n_people=1, conf=2.0, seed=5)
    doc["people"][1] = second["people"][0]
    p1 = tmp_path / "two.json"
    p1.write_text(json.dumps(doc))
    kp = bio.load_openpose(str(p1))
    want = np.asarray(
        second["people"][0]["pose_keypoints_2d"]
    ).reshape(25, 3)
    np.testing.assert_allclose(kp["pose"], want, rtol=1e-6)


def test_pack_keypoints_face_mapping(tmp_path):
    doc = _openpose_doc()
    path = tmp_path / "v.json"
    path.write_text(json.dumps(doc))
    kp = bio.load_openpose(str(path))
    packed, mask = bio.pack_keypoints([kp, None], use_hand_face=True)
    assert packed.shape == (2, 135, 3)
    np.testing.assert_array_equal(mask, [1.0, 0.0])
    assert packed[1].sum() == 0
    # the face block is permuted: model-order entry 0 == openpose entry 17
    np.testing.assert_allclose(
        packed[0, 25 + 42], kp["face"][FACE_MAPPING][0], rtol=1e-6
    )
    np.testing.assert_allclose(
        packed[0, 25 + 42 + 51], kp["face"][0], rtol=1e-6
    )  # contour block starts with openpose contour 0


def test_obj_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = rng.integers(0, 10, size=(6, 3)).astype(np.int32)
    path = str(tmp_path / "m.obj")
    bio.save_obj(path, verts, faces)
    mesh = bio.load_obj(path)
    np.testing.assert_allclose(mesh.verts, verts, atol=1e-4)
    np.testing.assert_array_equal(mesh.faces, faces)


def test_obj_uv_roundtrip_with_texture(tmp_path):
    rng = np.random.default_rng(1)
    verts = rng.normal(size=(8, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    uvs = rng.uniform(size=(6, 2)).astype(np.float32)
    face_uvs = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    tex = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "t.obj")
    bio.save_obj_uv(path, verts, faces, uvs, face_uvs, texture=tex)
    mesh = bio.load_obj(path, load_texture=True)
    np.testing.assert_allclose(mesh.verts, verts, atol=1e-4)
    np.testing.assert_allclose(mesh.uvs, uvs, atol=1e-5)
    np.testing.assert_array_equal(mesh.face_uvs, face_uvs)
    assert mesh.texture is not None
    np.testing.assert_allclose(mesh.texture, tex, atol=2 / 255)


def test_obj_quads_triangulated(tmp_path):
    path = tmp_path / "q.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n" "f 1 2 3 4\n"
    )
    mesh = bio.load_obj(str(path))
    np.testing.assert_array_equal(
        mesh.faces, [[0, 1, 2], [0, 2, 3]]
    )


def test_mask_square_bbox_and_K():
    mask = np.zeros((100, 80), np.uint8)
    mask[20:60, 30:50] = 255
    top, left, bottom, right = bio.mask_square_bbox(mask)
    assert bottom - top == right - left          # square
    assert top <= 20 and bottom >= 60            # contains the blob + pad
    assert 0 <= left and right <= 80

    K = np.array([[100.0, 0, 40], [0, 100.0, 50], [0, 0, 1]])
    K2 = bio.adjust_K_for_crop(K, (top, left, bottom, right), 64)
    s = 64.0 / (right - left)
    assert K2[0, 0] == pytest.approx(100 * s)
    assert K2[0, 2] == pytest.approx((40 - left) * s)
    assert K2[2, 2] == 1.0


def test_params_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    result = {
        "vertices": rng.normal(size=(10, 3)).astype(np.float32),
        "joints": rng.normal(size=(49, 3)).astype(np.float32),
        "pose": rng.normal(size=(69,)).astype(np.float32),
        "betas": rng.normal(size=(10,)).astype(np.float32),
        "global_orient": rng.normal(size=(3,)).astype(np.float32),
        "global_transl": rng.normal(size=(3,)).astype(np.float32),
        "scale": np.ones((1,), np.float32),
        "full_pose": rng.normal(size=(72,)).astype(np.float32),
    }
    faces = rng.integers(0, 10, size=(5, 3))
    out = str(tmp_path / "fit")
    bio.save_fit_outputs(out, "smpl", result, faces,
                         displacement=np.zeros((10, 3), np.float32))
    loaded = bio.load_params(os.path.join(out, "smpl_parameter.npy"))
    assert set(loaded) >= set(result)
    np.testing.assert_allclose(loaded["vertices"], result["vertices"])
    assert loaded["faces"].dtype == np.int32
    assert os.path.exists(os.path.join(out, "smpl.obj"))
    assert os.path.exists(os.path.join(out, "smpl+d.obj"))


def test_annots_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    Ks = rng.normal(size=(4, 3, 3)).astype(np.float32)
    RTs = np.stack([np.eye(4, dtype=np.float32)] * 4)
    path = str(tmp_path / "annots.npy")
    bio.save_annots(path, Ks, RTs)
    K2, RT2 = bio.load_annots(path)
    np.testing.assert_allclose(K2, Ks)
    np.testing.assert_allclose(RT2, RTs)


def test_genebody_views():
    assert len(bio.genebody_views("zhuna")) == 48
    assert 32 not in bio.genebody_views("dannier")
    assert len(bio.genebody_views("joseph_matanda")) == 40


def test_bbox_from_keypoints():
    kp = np.zeros((25, 3), np.float32)
    kp[0] = [100, 100, 0.9]
    kp[1] = [300, 200, 0.9]
    kp[2] = [200, 150, 0.05]       # below threshold: ignored
    center, scale = bio.bbox_from_keypoints(kp)
    np.testing.assert_allclose(center, [200, 150])
    assert scale == pytest.approx(200 / 200.0 * 1.2)


def test_scan_prep_mtl_and_up_axis(tmp_path):
    from bodyfitting_tpu.io.scan_prep import copy_obj_y_up, ensure_mtl

    # z-up scan without mtl
    src = tmp_path / "s" / "subj_30k.obj"
    src.parent.mkdir()
    src.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 0 5\n"     # longest extent: z
        "f 1 2 3\n"
    )
    ensure_mtl(str(src))
    text = src.read_text()
    assert "usemtl default" in text and "mtllib" in text
    assert (tmp_path / "s" / "subj_30k.mtl").exists()
    ensure_mtl(str(src))                   # idempotent
    assert text == src.read_text()

    dst = tmp_path / "d" / "subj.obj"
    copy_obj_y_up(str(src), str(dst))
    mesh = bio.load_obj(str(dst))
    extents = mesh.verts.max(0) - mesh.verts.min(0)
    assert extents.argmax() == 1           # now y-up


def test_imread_checked(tmp_path):
    import cv2

    path = str(tmp_path / "im.png")
    cv2.imwrite(path, np.full((4, 5, 3), 7, np.uint8))
    img = bio.imread_checked(path)
    assert img.shape == (4, 5, 3) and (img == 7).all()
    # flags pass through (grayscale read keeps 2 dims)
    msk = bio.imread_checked(path, cv2.IMREAD_GRAYSCALE)
    assert msk.shape == (4, 5)
    with pytest.raises(FileNotFoundError, match="nope.png"):
        bio.imread_checked(str(tmp_path / "nope.png"))


def test_obj_partial_face_uvs_degrade_to_none(tmp_path):
    """Faces with and without vt indices: per-face UVs must not silently
    mispair (Python parser) or carry -1 sentinels (native parser) — both
    degrade to face_uvs=None with a warning."""
    src = tmp_path / "partial.obj"
    src.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "f 1/1 2/2 3/3\n"
        "f 2 4 3\n"              # no vt on this face
    )
    for use_native in (False, True):
        with pytest.warns(UserWarning, match="lack vt"):
            mesh = bio.load_obj(str(src), use_native=use_native)
        assert mesh.faces.shape == (2, 3)
        assert mesh.face_uvs is None, f"use_native={use_native}"
        assert mesh.uvs is not None


def test_rgbd_stream_truncated_final_frame(tmp_path):
    rng = np.random.default_rng(0)
    colors = [rng.integers(0, 255, size=(8, 8, 3)).astype(np.uint8)
              for _ in range(3)]
    depths = [rng.integers(0, 1000, size=(4, 4)).astype(np.uint16)
              for _ in range(3)]
    indices = [np.zeros((4, 4), np.uint16) for _ in range(3)]
    path = str(tmp_path / "cap.stream")
    from bodyfitting_tpu.io import rgbd_stream as rs

    rs.write_rgbd_stream(
        path, colors, depths, indices,
        timestamps=np.array([10, 20, 30]),     # numpy array must work
    )
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-7])          # kill mid-final-frame
    dec = rs.RGBDStreamDecoder(path)
    assert dec.frame_count == 2                # truncated frame dropped
    fr = dec.get_frame(1)
    assert fr is not None and fr.color_timestamp == 20


def test_build_observations_empty_masks_keeps_structure():
    """A use_mask frame whose GT-mask views were all dropped must produce
    the same Observations pytree structure as a frame with masks, so
    batched fits can stack them."""
    import jax

    from bodyfitting_tpu.fitting import body_fitting as bf

    K = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    kp = {"pose": np.full((25, 3), 0.5, np.float32)}
    msk = np.zeros((64, 64), np.float32)
    msk[16:48, 16:48] = 1.0

    common = dict(
        c2ws=[c2w] * 2, Ks=[K] * 2, keypoints=[kp, kp],
        use_hand_face=False, mask_c2ws=[c2w], mask_Ks=[K],
        num_views=2, mask_num_views=2, mask_imsize=64,
        contour_pad=512, contour_resample=96,
    )
    with_masks = bf.build_observations(masks=[msk], **common)
    no_masks = bf.build_observations(masks=[], **common)
    assert (jax.tree_util.tree_structure(with_masks)
            == jax.tree_util.tree_structure(no_masks))
    stacked = jax.tree.map(
        lambda *xs: np.stack(xs), with_masks, no_masks
    )
    assert stacked.masks.shape == (2, 2, 64, 64)
    # the inert frame contributes nothing: all-ones masks, zero validity
    assert float(np.asarray(no_masks.contour_valid).sum()) == 0.0
    assert float(np.asarray(no_masks.masks).min()) == 1.0
