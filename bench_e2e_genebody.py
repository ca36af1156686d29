"""Production-scale end-to-end GeneBody run on the chip.

Generates a synthetic GeneBody-layout dataset at full scale (48 views x
512^2 images + GT masks + annots.npy + per-view OpenPose JSONs with
body/hand/face blocks projected from a ground-truth body), then runs the
real app — ``python -m bodyfitting_tpu.apps.genebody`` semantics via its
Runner — through image IO, cropping, contour extraction, batched SMPL-X
fitting with silhouette views, and output writing.  Prints a JSON line
with the end-to-end wall clock.

This is the workload the reference processes as a serial per-frame loop at
minutes per frame (apps/genebody_fitting.py:183-192).
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np


def make_dataset(root: str, n_frames: int, size: int = 512, seed: int = 0):
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from bodyfitting_tpu.io.cameras import save_annots
    from bodyfitting_tpu.models import body_model as bm
    from bodyfitting_tpu.ops.camera import perspective_projection

    rng = np.random.default_rng(seed)
    subject = "synth"
    sub = os.path.join(root, subject)
    n_views = 48
    f = 1.2 * size
    Ks = np.broadcast_to(
        np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]],
                 np.float32), (n_views, 3, 3)).copy()
    RTs = []
    for v in range(n_views):
        th = 2 * np.pi * v / n_views
        eye = np.array([3 * np.sin(th), 0.0, 3 * np.cos(th)])
        z = -eye / np.linalg.norm(eye)
        x = np.cross([0, 1, 0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.stack([x, y, z], 1)
        c2w[:3, 3] = eye
        RTs.append(c2w)
    os.makedirs(sub, exist_ok=True)
    save_annots(os.path.join(sub, "annots.npy"), Ks, np.stack(RTs))

    # GT bodies (per frame) -> projected keypoint JSONs
    model = bm.synthetic_model("smplx", num_verts=10475, seed=seed,
                               use_face_contour=True)
    w2cs = np.linalg.inv(np.stack(RTs))
    frames_kp = []
    for fr in range(n_frames):
        import dataclasses

        gt = dataclasses.replace(
            bm.BodyParams.zeros(model),
            body_pose=jnp.asarray(
                rng.normal(scale=0.12, size=(63,)), jnp.float32),
            betas=jnp.asarray(rng.normal(scale=0.5, size=(10,)),
                              jnp.float32),
        )
        joints = np.asarray(bm.forward(model, gt).joints) * 0.3
        proj = np.asarray(perspective_projection(
            jnp.asarray(joints)[None].repeat(n_views, 0),
            jnp.asarray(w2cs[:, :3, :3]), jnp.asarray(w2cs[:, :3, 3]),
            jnp.asarray(Ks)))
        frames_kp.append(proj)

    img = rng.integers(50, 255, size=(size, size, 3)).astype(np.uint8)
    msk = np.zeros((size, size), np.uint8)
    msk[size // 8: 7 * size // 8, 5 * size // 16: 11 * size // 16] = 255
    # encode ONCE, copy bytes: re-encoding the identical image 48*n_frames
    # times wastes minutes on this 1-CPU host
    import io as _io

    jpg_buf = _io.BytesIO()
    imageio.imwrite(jpg_buf, img, format="jpeg")
    jpg = jpg_buf.getvalue()
    png_buf = _io.BytesIO()
    imageio.imwrite(png_buf, msk, format="png")
    png = png_buf.getvalue()
    for v in range(n_views):
        os.makedirs(os.path.join(sub, "image", "%02d" % v), exist_ok=True)
        os.makedirs(os.path.join(sub, "mask", "%02d" % v), exist_ok=True)
        for fr in range(n_frames):
            with open(os.path.join(sub, "image", "%02d" % v,
                                   "%04d.jpg" % fr), "wb") as f:
                f.write(jpg)
            with open(os.path.join(sub, "mask", "%02d" % v,
                                   "%04d.png" % fr), "wb") as f:
                f.write(png)
    return subject, frames_kp, Ks


def write_openpose_jsons(out_dir, subject, frames_kp, views, size):
    """Per-frame per-view keypoint JSONs the app's cache check accepts."""
    for fr, proj in enumerate(frames_kp):
        op = os.path.join(out_dir, subject, "%06d" % fr, "openpose")
        os.makedirs(op, exist_ok=True)
        for v in views:
            uv = proj[v]
            # crops move keypoints; conf-1 raw projections are fine for a
            # throughput benchmark (the app re-crops images by mask)
            # face block in OpenPose-70 order: the loader permutes via
            # FACE_MAPPING back into model order, so write the model's
            # 68 face points (uv[67:135]) through the inverse mapping;
            # the 2 pupil slots stay confidence-0
            from bodyfitting_tpu.constants import FACE_MAPPING

            face = np.zeros((70, 3), np.float32)
            face[FACE_MAPPING, :2] = uv[67:135]
            face[FACE_MAPPING, 2] = 1.0
            person = {
                "pose_keypoints_2d": [
                    float(x) for x in np.concatenate(
                        [uv[:25], np.ones((25, 1))], 1).reshape(-1)],
                "hand_left_keypoints_2d": [
                    float(x) for x in np.concatenate(
                        [uv[25:46], np.ones((21, 1))], 1).reshape(-1)],
                "hand_right_keypoints_2d": [
                    float(x) for x in np.concatenate(
                        [uv[46:67], np.ones((21, 1))], 1).reshape(-1)],
                "face_keypoints_2d": [
                    float(x) for x in face.reshape(-1)],
            }
            with open(os.path.join(op, "%02d_keypoints.json" % v), "w") as f:
                json.dump({"version": 1.3, "people": [person]}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_frames", type=int, default=16)
    ap.add_argument("--num_iters", type=int, default=600)
    ap.add_argument("--batch_frames", type=int, default=16)
    ap.add_argument("--prep_workers", type=int, default=2)
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the Runner N times on the same output dir; "
                         "pass 2+ measures the steady state with warm "
                         "openpose-JSON and bbox caches")
    ap.add_argument("--prep_only", action="store_true",
                    help="time only the host-side per-frame prep "
                         "(image IO/crop caches, contour extraction, "
                         "observation assembly) with no device fitting — "
                         "the host roofline of the pipelined run loop; "
                         "pins jax to CPU so it runs when the TPU is "
                         "unavailable")
    args = ap.parse_args()

    if args.prep_only:
        # Pin CPU properly: in this environment the JAX_PLATFORMS env var
        # alone is overridden by sitecustomize; the config update before
        # any array op is what actually takes effect (CLAUDE.md).
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bodyfitting_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import tempfile

    work = tempfile.mkdtemp(prefix="genebody_e2e_")
    root = os.path.join(work, "data")
    out_dir = os.path.join(work, "out")
    print(f"dataset under {work}", file=sys.stderr)
    subject, frames_kp, Ks = make_dataset(root, args.n_frames)

    from bodyfitting_tpu.apps import genebody

    app_args = genebody.config_parser().parse_args([
        "--target_dir", root,
        "--output_dir", out_dir,
        "--subject", subject,
        "--load_size", "512",
        "--tasks", "openpose", "smplify", "output",
        "--use_mask",
        "--smpl_type", "smplx",
        "--num_iters", str(args.num_iters),
        "--batch_frames", str(args.batch_frames),
        "--prep_workers", str(args.prep_workers),
    ] + (["--timing"] if args.timing else []))
    write_openpose_jsons(
        out_dir, subject, frames_kp, genebody.Runner(app_args).views, 512
    )

    # Pass 1 populates the per-frame bbox caches under output_dir; later
    # passes measure the steady state (re-runs over an already-processed
    # subject: all ~40 non-GT-mask PNG decodes per frame skipped).  A
    # fresh Runner per pass keeps per-process state out of the timing.
    if args.prep_only:
        # Host roofline: the pipelined loop overlaps prep with device
        # time, so e2e can never beat max(prep wall, chip wall).  Time
        # prep alone, serially, per pass (pass 1 populates the bbox and
        # mask-crop caches; later passes are the steady state).
        walls = []
        for rep in range(max(args.repeat, 1)):
            runner = genebody.Runner(app_args)
            t0 = time.perf_counter()
            for frame in runner.seqs:
                inputs = runner._prepare_frame(frame)
                assert inputs is not None
            walls.append(time.perf_counter() - t0)
            if args.timing and runner.timer is not None:
                print("[timing pass %d] " % (rep + 1)
                      + json.dumps(runner.timer.summary()), file=sys.stderr)
        print(json.dumps({
            "metric": "genebody_prep_wall_s",
            "value": round(walls[-1], 2),
            "unit": (
                f"s host prep for {args.n_frames} frames x 48 views "
                f"(pass walls {[round(w, 2) for w in walls]})"
            ),
            "frames_per_sec_prep": round(args.n_frames / walls[-1], 2),
        }))
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)
        return

    walls = []
    for rep in range(max(args.repeat, 1)):
        runner = genebody.Runner(app_args)
        t0 = time.perf_counter()
        runner.run()
        walls.append(time.perf_counter() - t0)

        # verify outputs
        n_obj = len(os.listdir(os.path.join(out_dir, subject, "smpl")))
        n_npy = len(os.listdir(os.path.join(out_dir, subject, "param")))
        assert n_obj == args.n_frames and n_npy == args.n_frames, (
            n_obj, n_npy)
        trace = os.path.join(out_dir, subject, "loss_trace.jsonl")
        assert os.path.exists(trace)

    print(json.dumps({
        "metric": "genebody_e2e_wall_s",
        "value": round(walls[-1], 1),
        "unit": (
            f"s for {args.n_frames} frames x 48 views x 512^2 SMPL-X, "
            f"{args.num_iters} iters, GT-mask silhouettes, incl. IO/"
            f"contours/compile/outputs"
            + (f"; steady-state pass {len(walls)} (pass walls "
               f"{[round(w, 1) for w in walls]})" if args.repeat > 1
               else "")
        ),
        "frames_per_sec_e2e": round(args.n_frames / walls[-1], 2),
    }))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
