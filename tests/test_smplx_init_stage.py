"""Two-stage SMPL -> SMPL-X init through the GeneBody app path."""

import numpy as np

from bodyfitting_tpu.apps import genebody
from tests.test_apps import _write_openpose_json, genebody_dataset  # noqa: F401


def test_genebody_smplx_with_smpl_init(genebody_dataset, tmp_path):  # noqa: F811
    root, subject, size = genebody_dataset
    out_dir = tmp_path / "out_x"
    rng = np.random.default_rng(2)
    args = genebody.config_parser().parse_args([
        "--target_dir", str(root / "genebody"),
        "--output_dir", str(out_dir),
        "--subject", subject,
        "--load_size", str(size),
        "--tasks", "openpose", "smplify", "output",
        "--smpl_type", "smplx",
        "--num_iters", "8",
        "--batch_frames", "2",
        "--synthetic_num_verts", "64",
        "--smplx_with_smpl_init",
    ])
    runner = genebody.Runner(args)
    for frame in runner.seqs:
        data = runner.get_data(frame)
        op_dir = out_dir / subject / ("%06d" % frame) / "openpose"
        op_dir.mkdir(parents=True, exist_ok=True)
        for view in data[4]:
            _write_openpose_json(
                str(op_dir / ("%02d_keypoints.json" % view)), rng, size,
                with_hand_face=True,
            )
    runner.run()
    d = np.load(
        str(out_dir / subject / "param" / "0000.npy"), allow_pickle=True
    ).item()
    assert d["pose"].shape == (63,)          # smplx body pose
    assert np.isfinite(d["vertices"]).all()
