"""Production-scale end-to-end RenderPeople run on the chip.

Generates a synthetic textured scan at production scale (~40k-face hull,
1024^2 texture atlas), then runs the real app — ``python -m
bodyfitting_tpu.apps.renderpeople`` semantics via its Runner — through
scan OBJ parsing (native C++ path), ring-view rendering + caching,
SMPLify with point-cloud + displacement stages (SDF-accelerated), the
200-iteration texture fit and output writing.  Prints a JSON line with
the end-to-end wall clock.

This is the workload the reference processes per scan with CUDA
mesh-grid searches and a CUDA rasterizer (apps/rp_fitting.py:112-170);
the torch-CPU re-enactment of its exact per-iteration structure
extrapolates to ~75 hours per scan (BENCH_NOTES per-config table), so
the only meaningful cross-engine number is the absolute wall below.

OpenPose JSONs are pre-written (the external binary is not shipped);
the app's cache check then skips the subprocess exactly as it does for
cached production runs.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np


def make_scan(root: str, n_pts: int, tex_size: int, seed: int = 0):
    """A person-ish textured hull scan in the RenderPeople layout."""
    from scipy.spatial import ConvexHull

    from bodyfitting_tpu.io import save_obj_uv

    rng = np.random.default_rng(seed)
    subject = "synth_rp"
    scan_dir = os.path.join(root, subject)
    os.makedirs(scan_dir, exist_ok=True)
    pts = rng.normal(size=(n_pts, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts[:, 1] *= 1.6                      # person-ish height
    hull = ConvexHull(pts)
    faces = hull.simplices.astype(np.int32)
    uu = 0.5 + np.arctan2(pts[:, 2], pts[:, 0]) / (2 * np.pi)
    vv = 0.5 + np.arcsin(np.clip(pts[:, 1] / 1.6, -1, 1)) / np.pi
    uvs = np.stack([uu, vv], -1).astype(np.float32)
    tex = rng.uniform(size=(tex_size, tex_size, 3)).astype(np.float32)
    save_obj_uv(
        os.path.join(scan_dir, f"{subject}.obj"),
        pts.astype(np.float32), faces, uvs, faces.copy(), texture=tex,
    )
    return subject


def write_openpose_jsons(out_dir, subject, n_views, size, seed=0):
    rng = np.random.default_rng(seed)
    op_dir = os.path.join(out_dir, subject, "openpose")
    os.makedirs(op_dir, exist_ok=True)
    for v in range(n_views):
        pose = np.zeros((25, 3))
        pose[:, 0] = rng.uniform(0.3 * size, 0.7 * size, 25)
        pose[:, 1] = rng.uniform(0.2 * size, 0.8 * size, 25)
        pose[:, 2] = 0.9
        person = {
            "pose_keypoints_2d": pose.ravel().tolist(),
            "hand_left_keypoints_2d": [0.0] * 63,
            "hand_right_keypoints_2d": [0.0] * 63,
            "face_keypoints_2d": [0.0] * 210,
        }
        with open(os.path.join(op_dir, "%02d_keypoints.json" % v),
                  "w") as f:
            json.dump({"people": [person]}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_pts", type=int, default=20000,
                    help="scan hull points (~2x faces)")
    ap.add_argument("--num_iters", type=int, default=600)
    ap.add_argument("--tex_iters", type=int, default=200)
    ap.add_argument("--viewnum", type=int, default=8)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from bodyfitting_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    work = tempfile.mkdtemp(prefix="rp_e2e_")
    root = os.path.join(work, "scans")
    out_dir = os.path.join(work, "out")
    print(f"dataset under {work}", file=sys.stderr)
    subject = make_scan(root, args.n_pts, tex_size=1024)

    from bodyfitting_tpu.apps import renderpeople

    app_args = renderpeople.config_parser().parse_args([
        "--target_dir", root,
        "--output_dir", out_dir,
        "--load_size", "512",
        "--viewnum", str(args.viewnum),
        "--tasks", "openpose", "smplify", "smpld", "texfit", "output",
        "--num_iters", str(args.num_iters),
        "--tex_iters", str(args.tex_iters),
        "--auto_uv",
        "--timing",
    ])
    write_openpose_jsons(out_dir, subject, args.viewnum, 512)

    t0 = time.perf_counter()
    runner = renderpeople.Runner(app_args)
    runner.run()
    wall = time.perf_counter() - t0

    smplify_dir = os.path.join(out_dir, subject, "smplify")
    assert os.path.exists(os.path.join(smplify_dir, "smpl.obj"))
    assert os.path.exists(os.path.join(smplify_dir, "smpl+d.obj"))
    d = np.load(os.path.join(smplify_dir, "smpl_parameter.npy"),
                allow_pickle=True).item()
    assert "displacement" in d and np.isfinite(d["displacement"]).all()
    assert os.path.exists(os.path.join(out_dir, subject, "texfit",
                                       "smpl.png"))
    assert os.path.exists(os.path.join(out_dir, "SMPL", f"{subject}.obj"))

    print(json.dumps({
        "metric": "renderpeople_e2e_wall_s",
        "value": round(wall, 1),
        "unit": (
            f"s per scan ({args.n_pts}-pt hull, {args.viewnum} ring views "
            f"@512^2): OBJ parse, view renders, SMPLify {args.num_iters} "
            f"iters + point-cloud + displacement stages (SDF), "
            f"{args.tex_iters}-iter 1024^2 texture fit, outputs"
        ),
    }))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
