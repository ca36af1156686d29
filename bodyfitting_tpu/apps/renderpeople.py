"""RenderPeople scan fitting driver (reference apps/rp_fitting.py).

Pipeline per scan: render synthetic ring views of the textured scan (cached
on disk like the reference, rp_fitting.py:98-122) -> OpenPose -> SMPLify
with the point-cloud term and optional SMPL+D displacement stage -> UV
texture fitting -> outputs.

Run:  python -m bodyfitting_tpu.apps.renderpeople --target_dir ...
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys

import numpy as np

from bodyfitting_tpu.fitting import body_fitting as bf
from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.fitting import texture as texfit
from bodyfitting_tpu.io import load_obj, load_openpose_dir
from bodyfitting_tpu.apps.genebody import load_body_model, load_prior


def config_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--target_dir", type=str, default="./data/renderpeople")
    p.add_argument("--output_dir", type=str, default="./logs_rp")
    p.add_argument("--openpose_dir", type=str, default="../openpose")
    p.add_argument("--info_dir", type=str, default=None)
    p.add_argument("--debug", default=False, action="store_true")
    p.add_argument("--timing", default=False, action="store_true",
                   help="print a per-stage wall-clock line per scan "
                        "(prep incl. renders+openpose / smplify incl. "
                        "smpld / texfit / output)")
    p.add_argument("--load_size", default=512, type=int)
    p.add_argument("--viewnum", default=8, type=int)
    p.add_argument("--tasks", nargs="+", type=str,
                   default=["openpose", "smplify", "smpld", "texfit",
                            "output"])
    p.add_argument("--use_mask", default=False, action="store_true")
    p.add_argument("--white_bkgd", default=True, action="store_true")
    p.add_argument("--smpl_type", default="smpl", type=str)
    p.add_argument("--age", default="adult", type=str)
    p.add_argument("--num_iters", default=600, type=int)
    p.add_argument("--contour_resample", default=512, type=int,
                   help="arc-length resample mask contours to this many "
                        "points (0 = keep every contour pixel)")
    p.add_argument("--smpl_uv_dir", type=str, default="./data/smpl_uv",
                   help="folder containing smpl_uv.obj / smplx_uv.obj")
    p.add_argument("--auto_uv", default=False, action="store_true",
                   help="generate a per-face chart atlas when the UV "
                        "template is absent (utils/uv_unwrap.py) instead "
                        "of skipping texture fitting")
    p.add_argument("--tex_iters", default=200, type=int)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--gmm_path", type=str, default=None)
    p.add_argument("--hmr_checkpoint", type=str, default=None)
    p.add_argument("--mean_params", type=str, default=None)
    p.add_argument("--synthetic_num_verts", type=int, default=None)
    p.add_argument("--inpaint", default=False, action="store_true",
                   help="inpaint unseen UV regions after texture fitting")
    p.add_argument("--lbam_checkpoint", type=str, default=None,
                   help="LBAM weights; diffusion inpainting when absent")
    p.add_argument("--disp_map", default=False, action="store_true",
                   help="also bake the SMPL+D displacement field into a "
                        "UV map (texfit/smpl_dis.png) — the output the "
                        "reference declares but ships disabled "
                        "(texture_fitting.py:303-307)")
    p.add_argument("--prep_scans", default=False, action="store_true",
                   help="normalise scans in place first: insert missing "
                        "MTL references (reference mtl_check)")
    # Reference-CLI compatibility: rp_fitting.py:51 declares this but never
    # consumes it; accept it so reference invocations run unchanged.
    p.add_argument("--smplx_with_smpl_init", default=True,
                   action="store_true",
                   help="accepted for reference-CLI compatibility (unused, "
                        "as in the reference)")
    return p


def discover_scans(target_dir):
    """All non-decimated .obj scans under target_dir (rp_fitting.py:86-96)."""
    subjects, meshes = [], []
    for path, _, files in os.walk(target_dir):
        for name in files:
            if name.endswith(".obj") and not name.endswith("_30k.obj"):
                meshes.append(os.path.join(path, name))
                subjects.append(os.path.basename(path))
    return subjects, meshes


class Runner:
    def __init__(self, args):
        self.args = args
        self.output_dir = args.output_dir
        self.use_hand_face = args.smpl_type == "smplx"
        self.subjects, self.meshfiles = discover_scans(args.target_dir)
        self.genders = self._genders()
        # per-gender model cache; self.model is re-pointed per subject in
        # run() (the reference passes gender=... per scan, rp_fitting.py:152)
        self._models = {}
        self.model = self._model_for(self.genders[0]
                                     if self.genders else "neutral")
        self.prior = load_prior(args)
        self.hmr = (
            bf.HMRBundle.load(args.hmr_checkpoint, args.mean_params)
            if args.hmr_checkpoint else None
        )
        self.disp = "smpld" in args.tasks

    def _model_for(self, gender: str):
        if gender not in self._models:
            self._models[gender] = load_body_model(self.args, gender=gender)
        return self._models[gender]

    def _genders(self):
        if self.args.info_dir and os.path.exists(self.args.info_dir):
            out = []
            with open(self.args.info_dir) as f:
                for row in csv.reader(f):
                    out.append("female" if int(row[1]) == 0 else "male")
            return out
        return ["neutral"] * len(self.subjects)

    def render_data(self, subject, meshfile):
        import imageio.v2 as imageio

        imgdir = os.path.join(self.output_dir, subject, "images")
        maskdir = os.path.join(self.output_dir, subject, "masks")
        os.makedirs(imgdir, exist_ok=True)
        os.makedirs(maskdir, exist_ok=True)

        if self.args.prep_scans:
            from bodyfitting_tpu.io.scan_prep import ensure_mtl

            ensure_mtl(meshfile)
        scan = load_obj(meshfile, load_texture=True)
        if scan.face_uvs is None or scan.texture is None:
            raise ValueError(f"{meshfile} lacks UVs/texture")
        scan_face_uvs = scan.uvs[scan.face_uvs]

        if os.path.exists(os.path.join(imgdir, "00.png")):
            import cv2

            from bodyfitting_tpu.io import imread_checked

            images = [
                imread_checked(
                    os.path.join(imgdir, "%02d.png" % i))[:, :, ::-1]
                for i in range(self.args.viewnum)
            ]
            masks = [
                imread_checked(os.path.join(maskdir, "%02d.png" % i),
                               cv2.IMREAD_UNCHANGED)
                for i in range(self.args.viewnum)
            ]
            center, _, dist = texfit.scene_bounds(scan.verts)
            w2cs = texfit.ring_poses(center, self.args.viewnum, dist)
            Ks = np.stack(
                [texfit.default_K(self.args.load_size)] * self.args.viewnum
            )
        else:
            images, masks, w2cs, Ks = texfit.render_scan_views(
                scan.verts, scan.faces, scan_face_uvs, scan.texture,
                imgsize=self.args.load_size, viewnum=self.args.viewnum,
                white_bkgd=self.args.white_bkgd,
            )
            for i in range(self.args.viewnum):
                imageio.imwrite(
                    os.path.join(imgdir, "%02d.png" % i), images[i]
                )
                imageio.imwrite(
                    os.path.join(maskdir, "%02d.png" % i), masks[i]
                )
        c2ws = [np.linalg.inv(w2c).astype(np.float32) for w2c in w2cs]
        return scan, scan_face_uvs, list(images), list(masks), list(Ks), c2ws

    def run_openpose(self, subject, n_images):
        img_dir = os.path.abspath(
            os.path.join(self.output_dir, subject, "images")
        )
        wrt_dir = os.path.abspath(
            os.path.join(self.output_dir, subject, "openpose")
        )
        os.makedirs(wrt_dir, exist_ok=True)
        n_json = len([f for f in os.listdir(wrt_dir) if f.endswith(".json")])
        if n_json >= n_images:
            return
        hand_face = ["--hand", "--face"] if self.use_hand_face else []
        cmd = [
            "build/examples/openpose/openpose.bin",
            "--image_dir", img_dir, "--write_json", wrt_dir,
            "--display", "0", "--render_pose", "0",
        ] + hand_face
        subprocess.run(cmd, cwd=self.args.openpose_dir, check=True)

    def run_smplify(self, subject, scan, data, keypoints):
        _, _, images, masks, Ks, c2ws = data
        obs = bf.build_observations(
            c2ws, Ks, keypoints, self.use_hand_face,
            masks=masks if self.args.use_mask else None,
            mask_c2ws=c2ws if self.args.use_mask else None,
            mask_Ks=Ks if self.args.use_mask else None,
            scan_verts=scan.verts, scan_faces=scan.faces,
            contour_resample=self.args.contour_resample or None,
        )
        betas, poses = bf.hmr_init(
            images[0] if self.hmr else None, c2ws[0], self.hmr
        )
        init = bf.init_params_from_hmr(self.model, betas, poses)
        config = smplify.FitConfig(
            num_iters=self.args.num_iters,
            use_mask=self.args.use_mask,
            use_mesh=True,
            displacement=self.disp,
            imsize=float(self.args.load_size),
        )
        # cached jitted program: a fresh jax.jit closure per subject
        # missed jit's fast path and paid a retrace + persistent-cache
        # executable read (~17 s over the tunnel) on EVERY scan
        _, result, losses = bf._fit_program(
            self.model, config, self.prior, batched=False
        )(obs, init)
        result = {k: np.asarray(v) for k, v in result.items()}
        out_dir = os.path.join(self.output_dir, subject, "smplify")
        # Loss curves on by default (the reference has none, SURVEY §5).
        from bodyfitting_tpu.utils.observability import LossTrace

        LossTrace(os.path.join(self.output_dir, "loss_trace.jsonl")).record(
            subject, np.asarray(losses)
        )
        bf.save_frame_outputs(
            out_dir, self.args.smpl_type, self.model, result,
            images=images, c2ws=c2ws, Ks=Ks, debug=self.args.debug,
        )
        return result

    def run_texfit(self, subject, scan, scan_face_uvs, result):
        import imageio.v2 as imageio

        uv_path = os.path.join(
            self.args.smpl_uv_dir, f"{self.args.smpl_type}_uv.obj"
        )
        if os.path.exists(uv_path):
            uv_mesh = load_obj(uv_path)
            uvs, face_uvs = uv_mesh.uvs, uv_mesh.face_uvs
        elif self.args.auto_uv:
            from bodyfitting_tpu.utils.uv_unwrap import per_face_atlas

            print(f"no UV template at {uv_path}; generating a per-face "
                  "chart atlas (--auto_uv)", file=sys.stderr)
            uvs, face_uvs = per_face_atlas(len(np.asarray(self.model.faces)))
        else:
            print(f"WARNING: no UV template at {uv_path}; skipping texfit "
                  "(pass --auto_uv to generate one)", file=sys.stderr)
            return
        smpl_face_uvs = uvs[face_uvs]
        verts = result["vertices"] + result.get(
            "displacement", np.zeros_like(result["vertices"])
        )
        cfg = texfit.TextureFitConfig(iter_num=self.args.tex_iters)
        tex, losses = texfit.fit_texture(
            verts, np.asarray(self.model.faces), smpl_face_uvs,
            scan.verts, scan.faces, scan_face_uvs, scan.texture, cfg,
        )
        import jax.numpy as jnp

        uv_raster = texfit.rasterize_uv_atlas(
            jnp.asarray(smpl_face_uvs), cfg.tex_img_size
        )
        from bodyfitting_tpu.ops.rasterize import render_silhouette

        coverage = np.asarray(render_silhouette(uv_raster))
        img = texfit.fill_texture_holes(np.asarray(tex), coverage)
        if self.args.inpaint:
            # unseen texels remain near the grey init (reference
            # texture_fitting.py:191-218 detects 118-138/255 grey)
            grey = np.abs(img - 128.0 / 255.0).max(-1) < 0.04
            unseen = grey & (coverage > 0.5)
            if self.args.lbam_checkpoint:
                from bodyfitting_tpu.models.inpaint import Inpainter

                net = Inpainter(self.args.lbam_checkpoint)
                img = net(
                    (img * 255).astype(np.uint8),
                    (unseen[..., None] * np.uint8(255)).repeat(3, -1),
                )
            else:
                img = texfit.inpaint_unseen(img, unseen)
        out_dir = os.path.join(self.output_dir, subject, "texfit")
        os.makedirs(out_dir, exist_ok=True)
        imageio.imwrite(
            os.path.join(out_dir, "smpl.png"),
            (np.clip(img, 0, 1) * 255).astype(np.uint8),
        )
        from bodyfitting_tpu.io import save_obj_uv

        save_obj_uv(
            os.path.join(out_dir, f"{self.args.smpl_type}+d_textured.obj"),
            verts, np.asarray(self.model.faces), uvs,
            face_uvs, texture=img,
        )
        if self.args.disp_map and "displacement" in result:
            # the reference declares this output but ships it disabled
            # (texture_fitting.py:303-307); here it works, opt-in
            dis_map, dis_cov = texfit.bake_displacement_map(
                jnp.asarray(smpl_face_uvs),
                jnp.asarray(np.asarray(self.model.faces)),
                jnp.asarray(result["displacement"]), cfg.tex_img_size,
                raster=uv_raster,
            )
            imageio.imwrite(
                os.path.join(out_dir, "smpl_dis.png"),
                texfit.displacement_map_to8b(dis_map, dis_cov),
            )
        if self.args.debug:
            texfit.render_compare(
                (verts, np.asarray(self.model.faces), smpl_face_uvs, img),
                (scan.verts, scan.faces, scan_face_uvs, scan.texture),
                os.path.join(out_dir, "render"),
                viewnum=36, imgsize=self.args.load_size,
            )

    def run_output(self, subject):
        import shutil

        smpl_folder = os.path.join(self.output_dir, "SMPL")
        os.makedirs(smpl_folder, exist_ok=True)
        src = os.path.join(
            self.output_dir, subject, "smplify",
            f"{self.args.smpl_type}.obj",
        )
        if os.path.exists(src):
            shutil.copy(src, os.path.join(smpl_folder, f"{subject}.obj"))
        param = os.path.join(
            self.output_dir, subject, "smplify",
            f"{self.args.smpl_type}_parameter.npy",
        )
        if os.path.exists(param):
            shutil.copy(
                param, os.path.join(smpl_folder, f"{subject}.npy")
            )

    def _load_cached_fit(self, subject):
        """The smplify stage's written parameter dict, or None."""
        from bodyfitting_tpu.io import params as io_params

        param = os.path.join(
            self.output_dir, subject, "smplify",
            io_params.param_filename(self.args.smpl_type),
        )
        if not os.path.exists(param):
            return None
        return io_params.load_params(param)

    def _prepare_scan(self, subject, meshfile):
        """Host-side prep for one scan (obj load, view render/IO, openpose)
        — prefetched one scan ahead while the previous scan fits."""
        data = self.render_data(subject, meshfile)
        if "openpose" in self.args.tasks:
            self.run_openpose(subject, len(data[2]))
        keypoints = load_openpose_dir(
            os.path.join(self.output_dir, subject, "openpose")
        )
        return data, keypoints

    def run(self):
        from concurrent.futures import ThreadPoolExecutor

        items = list(zip(self.subjects, self.meshfiles, self.genders))
        with ThreadPoolExecutor(max_workers=1) as prep:
            fut = (
                prep.submit(self._prepare_scan, items[0][0], items[0][1])
                if items else None
            )
            for i, (subject, meshfile, gender) in enumerate(items):
                import time as _time

                t0 = _time.perf_counter()
                self.model = self._model_for(gender)
                data, keypoints = fut.result()
                t_prep = _time.perf_counter()
                if i + 1 < len(items):
                    fut = prep.submit(
                        self._prepare_scan, items[i + 1][0], items[i + 1][1]
                    )
                scan, scan_face_uvs = data[0], data[1]
                result = None
                if "smplify" in self.args.tasks:
                    result = self.run_smplify(
                        subject, scan, data, keypoints
                    )
                t_fit = _time.perf_counter()
                if "texfit" in self.args.tasks:
                    if result is None:
                        # texfit without smplify in the same run: reuse the
                        # cached fit, like the reference loads the written
                        # smpl+d outputs (texture_fitting.py:227-230)
                        result = self._load_cached_fit(subject)
                    if result is None:
                        print(
                            f"WARNING: no cached smplify result for "
                            f"{subject}; run the smplify task first",
                            file=sys.stderr,
                        )
                    else:
                        self.run_texfit(
                            subject, scan, scan_face_uvs, result
                        )
                t_tex = _time.perf_counter()
                if "output" in self.args.tasks:
                    self.run_output(subject)
                if self.args.timing:
                    t_out = _time.perf_counter()
                    print(
                        f"[timing] {subject}: prep {t_prep - t0:.1f}s "
                        f"(overlapped for later scans), smplify+smpld "
                        f"{t_fit - t_prep:.1f}s, texfit "
                        f"{t_tex - t_fit:.1f}s, output "
                        f"{t_out - t_tex:.1f}s",
                        file=sys.stderr,
                    )


def main(argv=None):
    from bodyfitting_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    args = config_parser().parse_args(argv)
    Runner(args).run()


if __name__ == "__main__":
    main()
