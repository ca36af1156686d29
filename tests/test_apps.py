"""End-to-end app smoke tests on tiny synthetic on-disk datasets."""

import json
import os

import numpy as np
import pytest

from bodyfitting_tpu.io import save_annots, save_obj_uv


def _write_openpose_json(path, rng, imsize, with_hand_face=False):
    def block(n):
        kp = rng.uniform(imsize * 0.3, imsize * 0.7, size=(n, 2))
        conf = np.full((n, 1), 0.9)
        return np.concatenate([kp, conf], 1).reshape(-1).tolist()

    person = {"pose_keypoints_2d": block(25)}
    if with_hand_face:
        person["hand_left_keypoints_2d"] = block(21)
        person["hand_right_keypoints_2d"] = block(21)
        person["face_keypoints_2d"] = block(70)
    with open(path, "w") as f:
        json.dump({"people": [person]}, f)


@pytest.fixture
def genebody_dataset(tmp_path):
    """A 2-frame, 48-view (tiny-image) GeneBody-style dataset."""
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    subject = "testsub"
    root = tmp_path / "genebody" / subject
    size = 64
    n_views, n_frames = 48, 2
    Ks = np.broadcast_to(
        np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], np.float32),
        (n_views, 3, 3),
    ).copy()
    RTs = []
    for v in range(n_views):
        th = 2 * np.pi * v / n_views
        eye = np.array([3 * np.sin(th), 0, 3 * np.cos(th)])
        z = -eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.stack([x, y, z], 1)
        c2w[:3, 3] = eye
        RTs.append(c2w)
    root.mkdir(parents=True)
    save_annots(str(root / "annots.npy"), Ks, np.stack(RTs))

    for v in range(n_views):
        (root / "image" / ("%02d" % v)).mkdir(parents=True)
        (root / "mask" / ("%02d" % v)).mkdir(parents=True)
        for fr in range(n_frames):
            img = rng.integers(60, 255, size=(size, size, 3)).astype(
                np.uint8
            )
            msk = np.zeros((size, size), np.uint8)
            msk[16:48, 20:44] = 255
            imageio.imwrite(
                str(root / "image" / ("%02d" % v) / ("%04d.jpg" % fr)), img
            )
            imageio.imwrite(
                str(root / "mask" / ("%02d" % v) / ("%04d.png" % fr)), msk
            )
    return tmp_path, subject, size


def test_genebody_app_end_to_end(genebody_dataset, tmp_path):
    root, subject, size = genebody_dataset
    out_dir = tmp_path / "out"
    from bodyfitting_tpu.apps import genebody

    # precompute openpose JSONs (no binary in the test env) — the app's
    # cache check then skips the subprocess entirely
    rng = np.random.default_rng(1)
    args = genebody.config_parser().parse_args([
        "--target_dir", str(root / "genebody"),
        "--output_dir", str(out_dir),
        "--subject", subject,
        "--load_size", str(size),
        "--tasks", "openpose", "smplify", "output",
        "--num_iters", "10",
        "--batch_frames", "2",
        "--synthetic_num_verts", "64",
    ])
    runner = genebody.Runner(args)
    for frame in runner.seqs:
        data = runner.get_data(frame)
        op_dir = out_dir / subject / ("%06d" % frame) / "openpose"
        op_dir.mkdir(parents=True, exist_ok=True)
        for view in data[4]:
            _write_openpose_json(
                str(op_dir / ("%02d_keypoints.json" % view)), rng, size
            )
    runner.run()

    for frame in (0, 1):
        smpl_obj = out_dir / subject / "smpl" / ("%04d.obj" % frame)
        param = out_dir / subject / "param" / ("%04d.npy" % frame)
        assert smpl_obj.exists()
        assert param.exists()
        d = np.load(str(param), allow_pickle=True).item()
        assert {"vertices", "joints", "pose", "betas", "global_orient",
                "faces", "global_transl", "scale", "full_pose"} <= set(d)
        assert np.isfinite(d["vertices"]).all()


def test_genebody_pipelined_matches_serial(genebody_dataset, tmp_path):
    """The 3-stage pipelined run loop (prep threads + async dispatch +
    writer thread) must produce bitwise-identical outputs to the serial
    reference-structured loop (--prep_workers 0)."""
    import shutil

    root, subject, size = genebody_dataset
    from bodyfitting_tpu.apps import genebody

    outs = {}
    for mode, workers in (("serial", 0), ("pipelined", 2)):
        out_dir = tmp_path / f"out_{mode}"
        args = genebody.config_parser().parse_args([
            "--target_dir", str(root / "genebody"),
            "--output_dir", str(out_dir),
            "--subject", subject,
            "--load_size", str(size),
            "--tasks", "openpose", "smplify", "output",
            "--num_iters", "6",
            "--batch_frames", "1",
            "--prep_workers", str(workers),
            "--synthetic_num_verts", "64",
        ])
        runner = genebody.Runner(args)
        if mode == "serial":
            rng = np.random.default_rng(7)
            for frame in runner.seqs:
                data = runner.get_data(frame)
                op_dir = out_dir / subject / ("%06d" % frame) / "openpose"
                op_dir.mkdir(parents=True, exist_ok=True)
                for view in data[4]:
                    _write_openpose_json(
                        str(op_dir / ("%02d_keypoints.json" % view)),
                        rng, size,
                    )
            json_src = out_dir
        else:
            # identical keypoint JSONs for the second run
            for frame in runner.seqs:
                src = json_src / subject / ("%06d" % frame) / "openpose"
                dst = out_dir / subject / ("%06d" % frame) / "openpose"
                shutil.copytree(str(src), str(dst))
        runner.run()
        outs[mode] = out_dir

    for frame in (0, 1):
        a = np.load(
            str(outs["serial"] / subject / "param" / ("%04d.npy" % frame)),
            allow_pickle=True,
        ).item()
        b = np.load(
            str(outs["pipelined"] / subject / "param" /
                ("%04d.npy" % frame)),
            allow_pickle=True,
        ).item()
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=k
            )
    # loss traces cover every frame in both modes
    for mode in outs:
        trace = outs[mode] / subject / "loss_trace.jsonl"
        frames = sorted(
            json.loads(line)["frame"] for line in open(str(trace))
        )
        assert frames == [0, 1]


def test_genebody_data_parallel_matches_single(genebody_dataset, tmp_path):
    """--data_parallel shards each frame batch over the 8-device CPU mesh
    (conftest) and must produce the same fits as the unsharded path,
    including batch padding (2 frames padded to 8 shards)."""
    import shutil

    root, subject, size = genebody_dataset
    from bodyfitting_tpu.apps import genebody

    outs = {}
    for mode, extra in (("single", []), ("dp", ["--data_parallel"])):
        out_dir = tmp_path / f"out_{mode}"
        args = genebody.config_parser().parse_args([
            "--target_dir", str(root / "genebody"),
            "--output_dir", str(out_dir),
            "--subject", subject,
            "--load_size", str(size),
            "--tasks", "openpose", "smplify", "output",
            "--num_iters", "6",
            "--batch_frames", "2",
            "--synthetic_num_verts", "64",
        ] + extra)
        runner = genebody.Runner(args)
        if mode == "single":
            rng = np.random.default_rng(3)
            for frame in runner.seqs:
                data = runner.get_data(frame)
                op_dir = out_dir / subject / ("%06d" % frame) / "openpose"
                op_dir.mkdir(parents=True, exist_ok=True)
                for view in data[4]:
                    _write_openpose_json(
                        str(op_dir / ("%02d_keypoints.json" % view)),
                        rng, size,
                    )
            json_src = out_dir
        else:
            for frame in runner.seqs:
                shutil.copytree(
                    str(json_src / subject / ("%06d" % frame) / "openpose"),
                    str(out_dir / subject / ("%06d" % frame) / "openpose"),
                )
        runner.run()
        outs[mode] = out_dir

    for frame in (0, 1):
        a = np.load(
            str(outs["single"] / subject / "param" / ("%04d.npy" % frame)),
            allow_pickle=True,
        ).item()
        b = np.load(
            str(outs["dp"] / subject / "param" / ("%04d.npy" % frame)),
            allow_pickle=True,
        ).item()
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float64), np.asarray(b[k], np.float64),
                rtol=2e-5, atol=1e-5, err_msg=k,
            )


def test_genebody_temporal_fit(genebody_dataset, tmp_path):
    """--temporal runs the temporally-coupled sequence fit per batch;
    with --data_parallel the batch is padded to the 8-device mesh and the
    padding frames must be objective-inert: the fitted parameters must
    match the unsharded temporal fit."""
    import shutil

    root, subject, size = genebody_dataset
    from bodyfitting_tpu.apps import genebody

    outs = {}
    for mode, extra in (("single", []), ("dp", ["--data_parallel"])):
        out_dir = tmp_path / f"out_temporal_{mode}"
        args = genebody.config_parser().parse_args([
            "--target_dir", str(root / "genebody"),
            "--output_dir", str(out_dir),
            "--subject", subject,
            "--load_size", str(size),
            "--tasks", "openpose", "smplify", "output",
            "--num_iters", "6",
            "--batch_frames", "2",
            "--temporal",
            "--timing",
            "--synthetic_num_verts", "64",
        ] + extra)
        runner = genebody.Runner(args)
        if mode == "single":
            rng = np.random.default_rng(11)
            for frame in runner.seqs:
                data = runner.get_data(frame)
                op_dir = out_dir / subject / ("%06d" % frame) / "openpose"
                op_dir.mkdir(parents=True, exist_ok=True)
                for view in data[4]:
                    _write_openpose_json(
                        str(op_dir / ("%02d_keypoints.json" % view)),
                        rng, size,
                    )
            json_src = out_dir
        else:
            for frame in runner.seqs:
                shutil.copytree(
                    str(json_src / subject / ("%06d" % frame) / "openpose"),
                    str(out_dir / subject / ("%06d" % frame) / "openpose"),
                )
        runner.run()
        outs[mode] = out_dir

        recs = [json.loads(line) for line in
                open(str(out_dir / subject / "loss_trace.jsonl"))]
        assert sorted(r["frame"] for r in recs) == [0, 1]
        # one joint optimization -> identical sequence-level curves
        assert recs[0]["losses"] == recs[1]["losses"]
        # --timing wrote the stage breakdown
        timing = json.loads(
            (out_dir / subject / "timing.json").read_text()
        )
        assert {"prep/images", "prep/observations", "fit/dispatch",
                "fit/device_wait", "write/outputs"} <= set(timing)
        assert timing["prep/images"]["calls"] == 2

    # padding inertness: sharded+padded fit == unsharded fit
    for frame in (0, 1):
        a = np.load(
            str(outs["single"] / subject / "param" / ("%04d.npy" % frame)),
            allow_pickle=True,
        ).item()
        b = np.load(
            str(outs["dp"] / subject / "param" / ("%04d.npy" % frame)),
            allow_pickle=True,
        ).item()
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float64), np.asarray(b[k], np.float64),
                rtol=2e-5, atol=1e-5, err_msg=f"frame {frame} {k}",
            )


def test_renderpeople_app_end_to_end(tmp_path):
    """Tiny textured 'scan' -> render views -> smplify+smpld -> texfit."""
    import imageio.v2 as imageio
    from bodyfitting_tpu.apps import renderpeople

    rng = np.random.default_rng(0)
    scan_dir = tmp_path / "scans" / "subjectA"
    scan_dir.mkdir(parents=True)
    # a coarse textured sphere-ish scan
    pts = rng.normal(size=(40, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts[:, 1] *= 1.6  # person-ish height
    from scipy.spatial import ConvexHull

    hull = ConvexHull(pts)
    faces = hull.simplices.astype(np.int32)
    uvs = rng.uniform(size=(len(pts), 2)).astype(np.float32)
    face_uvs = faces.copy()
    tex = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    save_obj_uv(
        str(scan_dir / "subjectA.obj"), pts.astype(np.float32), faces,
        uvs, face_uvs, texture=tex,
    )

    out_dir = tmp_path / "out_rp"
    size = 64
    # smpl uv template for the synthetic model (64 verts, faces from model)
    from bodyfitting_tpu.models import body_model as bm

    model = bm.synthetic_model("smpl", num_verts=64)
    uv_dir = tmp_path / "smpl_uv"
    uv_dir.mkdir()
    mf = np.asarray(model.faces)
    muv = rng.uniform(size=(64, 2)).astype(np.float32)
    save_obj_uv(str(uv_dir / "smpl_uv.obj"),
                np.asarray(model.v_template), mf, muv, mf)

    args = renderpeople.config_parser().parse_args([
        "--target_dir", str(tmp_path / "scans"),
        "--output_dir", str(out_dir),
        "--load_size", str(size),
        "--viewnum", "4",
        "--tasks", "openpose", "smplify", "smpld", "texfit", "output",
        "--num_iters", "8",
        "--tex_iters", "6",
        "--smpl_uv_dir", str(uv_dir),
        "--synthetic_num_verts", "64",
        "--disp_map",
    ])
    runner = renderpeople.Runner(args)
    assert runner.subjects == ["subjectA"]

    # pre-write openpose JSONs into the cache location
    op_dir = out_dir / "subjectA" / "openpose"
    op_dir.mkdir(parents=True)
    for v in range(4):
        _write_openpose_json(
            str(op_dir / ("%02d_keypoints.json" % v)), rng, size
        )
    runner.run()

    smplify_dir = out_dir / "subjectA" / "smplify"
    assert (smplify_dir / "smpl.obj").exists()
    assert (smplify_dir / "smpl+d.obj").exists()        # displacement stage
    d = np.load(str(smplify_dir / "smpl_parameter.npy"),
                allow_pickle=True).item()
    assert "displacement" in d          # reference smplify.py:247 contract
    assert np.isfinite(d["displacement"]).all()
    assert (out_dir / "subjectA" / "texfit" / "smpl.png").exists()
    # --disp_map bakes the SMPL+D field into UV space (the output the
    # reference declares but ships disabled, texture_fitting.py:303-307)
    assert (out_dir / "subjectA" / "texfit" / "smpl_dis.png").exists()
    assert (out_dir / "SMPL" / "subjectA.obj").exists()


def test_genebody_native_openpose_wiring(genebody_dataset, tmp_path):
    """--native_openpose routes run_openpose through the in-repo detector
    (stubbed nets) and writes cacheable OpenPose JSONs the loader accepts."""
    root, subject, size = genebody_dataset
    out_dir = tmp_path / "out_native"
    from bodyfitting_tpu.apps import genebody

    args = genebody.config_parser().parse_args([
        "--target_dir", str(root / "genebody"),
        "--output_dir", str(out_dir),
        "--subject", subject,
        "--load_size", str(size),
        "--tasks", "openpose",
        "--native_openpose",
        "--synthetic_num_verts", "64",
    ])
    runner = genebody.Runner(args)

    class StubBody:
        def __call__(self, img):
            candidate = np.zeros((18, 4))
            candidate[:, 0] = np.linspace(10, 50, 18)
            candidate[:, 1] = np.linspace(10, 50, 18)
            candidate[:, 2] = 0.9
            candidate[:, 3] = np.arange(18)
            row = np.concatenate([np.arange(18.0), [15.0, 18.0]])
            return candidate, row[None]

    runner._native_detectors = (StubBody(), None, None)
    frame = runner.seqs[0]
    data = runner.get_data(frame)
    runner.run_openpose(frame, data)

    op_dir = out_dir / subject / ("%06d" % frame) / "openpose"
    jsons = sorted(op_dir.glob("*_keypoints.json"))
    assert len(jsons) == len(data[4])
    from bodyfitting_tpu.io import load_openpose

    kp = load_openpose(str(jsons[0]))
    assert kp is not None and kp["pose"].shape == (25, 3)
    # cache: a second call must not re-run detection (stub would be hit)
    runner._native_detectors = None
    runner.run_openpose(frame, data)   # returns via the JSON-count cache


def test_reference_cli_invocations_parse():
    """Reference-CLI drop-in: the exact flag sets the reference apps accept
    (incl. its declared-but-unused flags, /root/reference/apps/
    genebody_fitting.py:17-57 and rp_fitting.py:22-56) parse here too."""
    from bodyfitting_tpu.apps import genebody, renderpeople

    gb = genebody.config_parser().parse_args([
        "--target_dir", "/data/genebody", "--annot_dir", "/data/annots",
        "--output_dir", "./logs", "--openpose_dir", "../openpose",
        "--info_dir", "info.csv", "--debug", "--subject", "zhuna",
        "--load_size", "512", "--tasks", "openpose", "smplify", "output",
        "--use_mask", "--smpl_type", "smplx", "--age", "adult",
        "--smplx_with_smpl_init", "--use_bodyscan", "--viewnum", "8",
        "--smpl_uv_dir", "./data/smpl_uv", "--white_bkgd",
    ])
    assert gb.subject == "zhuna" and gb.use_bodyscan and gb.viewnum == 8

    rp = renderpeople.config_parser().parse_args([
        "--target_dir", "/data/ours_new", "--output_dir", "./logs",
        "--openpose_dir", "../openpose", "--info_dir", "info.csv",
        "--debug", "--load_size", "512",
        "--tasks", "openpose", "smplify", "smpld", "texfit", "output",
        "--use_mask", "--smpl_type", "smpl", "--age", "adult",
        "--smplx_with_smpl_init", "--viewnum", "8",
        "--smpl_uv_dir", "./data/smpl_uv", "--white_bkgd",
    ])
    assert rp.viewnum == 8 and rp.tasks[-1] == "output"


def test_genebody_bbox_cache_identical_and_skips_decodes(
    genebody_dataset, tmp_path
):
    """The per-frame bbox + cropped-mask caches return bit-identical
    get_data results while skipping every mask decode on re-runs (the
    ~40 bbox-only views via bbox_cache.npy, the GT-mask views via
    mask_crops_{size}.npz)."""
    root, subject, size = genebody_dataset
    out_dir = tmp_path / "out"
    from bodyfitting_tpu.apps import genebody

    rng = np.random.default_rng(2)
    args = genebody.config_parser().parse_args([
        "--target_dir", str(root / "genebody"),
        "--output_dir", str(out_dir),
        "--subject", subject,
        "--load_size", str(size),
        "--num_iters", "4",
        "--use_mask",
        "--synthetic_num_verts", "64",
    ])
    runner = genebody.Runner(args)
    frame = runner.seqs[0]
    # keypoint JSONs cached -> image decodes skipped -> the bbox cache is
    # what decides whether the mask files are opened at all
    op_dir = out_dir / subject / ("%06d" % frame) / "openpose"
    op_dir.mkdir(parents=True, exist_ok=True)
    for view in runner.views:
        _write_openpose_json(
            str(op_dir / ("%02d_keypoints.json" % view)), rng, size
        )

    first = runner.get_data(frame)
    cache = out_dir / subject / ("%06d" % frame) / "bbox_cache.npy"
    assert cache.exists()
    crop_cache = (
        out_dir / subject / ("%06d" % frame) / ("mask_crops_%d.npz" % size)
    )
    assert crop_cache.exists()

    from bodyfitting_tpu.io import images as io_images

    calls = []
    orig = io_images.imread_checked

    def counting(path, flags=None):
        calls.append(path)
        return orig(path, flags)

    io_images.imread_checked = counting
    # the app module imported the symbol directly
    saved = genebody.imread_checked
    genebody.imread_checked = counting
    try:
        second = runner.get_data(frame)
    finally:
        io_images.imread_checked = orig
        genebody.imread_checked = saved

    # no file is decoded at all on the cached run: bbox-only views hit
    # bbox_cache.npy, GT-mask views hit mask_crops_{size}.npz
    assert len(calls) == 0, calls
    for a, b in zip(first, second):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            if x is None:
                assert y is None
            else:
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
