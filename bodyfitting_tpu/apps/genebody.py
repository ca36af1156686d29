"""GeneBody mocap fitting driver (reference apps/genebody_fitting.py).

Same CLI surface, data layout, caching and outputs as the reference —
``--tasks openpose smplify output``, per-frame ``images/`` + ``openpose/``
caches, final ``smpl/%04d.obj`` + ``param/%04d.npy`` —  with one structural
upgrade: frames are fitted in **batches** (``--batch_frames``) through a
single vmapped jit instead of the reference's serial per-frame loop
(genebody_fitting.py:183-192), which is where the TPU throughput comes
from.

Run:  python -m bodyfitting_tpu.apps.genebody --target_dir ... --subject ...
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys

import numpy as np

from bodyfitting_tpu import constants
from bodyfitting_tpu.fitting import body_fitting as bf
from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.io import (
    adjust_K_for_crop,
    apply_mask,
    crop_and_resize,
    genebody_views,
    imread_checked,
    load_annots,
    load_openpose_dir,
    mask_square_bbox,
)
from bodyfitting_tpu.models import body_model as bm


def config_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--target_dir", type=str, default="/data/genebody")
    p.add_argument("--annot_dir", type=str, default=None,
                   help="annots.npy with camera parameters")
    p.add_argument("--output_dir", type=str, default="./logs")
    p.add_argument("--native_openpose", default=False, action="store_true",
                   help="use the in-repo Flax detector (body+hand+face) "
                        "instead of the external openpose.bin; pass the "
                        "released checkpoints via --openpose_ckpt_dir")
    p.add_argument("--openpose_ckpt_dir", type=str, default=None,
                   help="directory with body_pose_model.pth / "
                        "hand_pose_model.pth / face_pose_model.pth for the "
                        "native detector (random init when absent)")
    p.add_argument("--openpose_dir", type=str, default="../openpose",
                   help="directory of the built openpose binary")
    p.add_argument("--info_dir", type=str, default=None,
                   help="csv with per-subject gender")
    p.add_argument("--debug", default=False, action="store_true")
    p.add_argument("--subject", type=str, default="zhuna")
    p.add_argument("--load_size", default=512, type=int)
    p.add_argument("--tasks", nargs="+", type=str,
                   default=["openpose", "smplify", "output"])
    p.add_argument("--use_mask", default=False, action="store_true")
    p.add_argument("--smpl_type", default="smpl", type=str)
    p.add_argument("--age", default="adult", type=str)
    p.add_argument("--num_iters", default=600, type=int)
    p.add_argument("--mask_crop", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="run the stay-inside mask term on content-cropped "
                        "masks (exact values, faster kernel; the static "
                        "crop shape is derived from the subject's first "
                        "batch and grown on demand)")
    p.add_argument("--contour_resample", default=512, type=int,
                   help="arc-length resample mask contours to this many "
                        "points (0 = keep every contour pixel)")
    p.add_argument("--batch_frames", default=8, type=int,
                   help="frames fitted concurrently in one jit")
    p.add_argument("--prep_workers", default=2, type=int,
                   help="host threads preparing upcoming frames (IO/crop/"
                        "contours) while the chip fits the current batch; "
                        "0 = fully serial (the reference's structure)")
    p.add_argument("--io_cache", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="persist per-frame crop bboxes and cropped GT-view "
                        "masks under output_dir so later runs skip all "
                        "full-res mask PNG decodes (bit-identical results; "
                        "--no-io_cache disables)")
    p.add_argument("--data_parallel", default=False, action="store_true",
                   help="shard each frame batch over all local devices "
                        "(multi-chip data parallelism; batch_frames should "
                        "be a multiple of the device count)")
    p.add_argument("--temporal", default=False, action="store_true",
                   help="temporally-coupled fit per batch (velocity/"
                        "betas-consistency priors over the frame axis; "
                        "fitting/sequence.py) — a capability the "
                        "reference's serial loop cannot express")
    p.add_argument("--timing", default=False, action="store_true",
                   help="accumulate per-stage wall times; summary printed "
                        "at the end and written to <output_dir>/timing.json")
    p.add_argument("--model_path", type=str, default=None,
                   help="SMPL pkl / SMPL-X npz asset; synthetic when absent")
    p.add_argument("--gmm_path", type=str, default=None,
                   help="gmm_08.pkl pose prior; synthetic when absent")
    p.add_argument("--hmr_checkpoint", type=str, default=None)
    p.add_argument("--mean_params", type=str, default=None)
    p.add_argument("--synthetic_num_verts", type=int, default=None,
                   help="vertex count of the synthetic fallback model "
                        "(tiny values for smoke tests)")
    p.add_argument("--smplx_with_smpl_init", default=False,
                   action="store_true",
                   help="seed the SMPL-X fit from a first SMPL fit")
    # Reference-CLI compatibility: genebody_fitting.py:43-56 declares these
    # but never consumes them (dead parser rows inherited from rp_fitting);
    # accept them so reference invocations run unchanged.
    p.add_argument("--use_bodyscan", default=False, action="store_true",
                   help="accepted for reference-CLI compatibility (unused, "
                        "as in the reference)")
    p.add_argument("--viewnum", type=int, default=8,
                   help="accepted for reference-CLI compatibility (unused, "
                        "as in the reference)")
    p.add_argument("--smpl_uv_dir", type=str, default="./data/smpl_uv",
                   help="accepted for reference-CLI compatibility (unused, "
                        "as in the reference)")
    p.add_argument("--white_bkgd", default=True, action="store_true",
                   help="accepted for reference-CLI compatibility (unused, "
                        "as in the reference)")
    return p


def resolve_model_path(model_path: str, smpl_type: str,
                       gender: str) -> str:
    """Find the asset file for ``gender``.

    Mirrors the reference's ``smplx.create(model_path, gender=...)``
    resolution (smplify/smplify.py:50-68): a directory resolves to
    ``<dir>/<TYPE>_<GENDER>.<ext>``; a file path substitutes the gender
    token in its name when a sibling exists, else is used as-is.
    """
    genders = (gender.upper(), gender.lower())
    if os.path.isdir(model_path):
        for g in genders:
            for ext in (".npz", ".pkl"):
                cand = os.path.join(
                    model_path, f"{smpl_type.upper()}_{g}{ext}"
                )
                if os.path.exists(cand):
                    return cand
        raise FileNotFoundError(
            f"no {smpl_type.upper()}_{gender.upper()}.npz/.pkl under "
            f"{model_path}"
        )
    base = os.path.basename(model_path)
    for tok in ("NEUTRAL", "MALE", "FEMALE", "neutral", "male", "female"):
        if tok in base:
            for g in genders:
                cand = os.path.join(
                    os.path.dirname(model_path), base.replace(tok, g)
                )
                if os.path.exists(cand):
                    return cand
            break
    return model_path


# Memoized by the args that determine the result, so repeated Runner
# constructions in one process (steady-state benches, long-running
# services fitting many subjects) share one model/prior object — which
# in turn lets body_fitting's jitted-program cache (keyed on object
# identity) hit across Runners instead of retracing per Runner.
_MODEL_CACHE: dict = {}
_PRIOR_CACHE: dict = {}


def load_body_model(args, gender: str = "neutral") -> bm.BodyModel:
    key = (
        args.model_path, args.smpl_type, gender,
        getattr(args, "synthetic_num_verts", None),
    )
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    model = _load_body_model_uncached(args, gender)
    _MODEL_CACHE[key] = model
    return model


def _load_body_model_uncached(args, gender: str = "neutral") -> bm.BodyModel:
    if args.model_path and os.path.exists(args.model_path):
        path = resolve_model_path(args.model_path, args.smpl_type, gender)
        if gender != "neutral" and path == args.model_path and \
                not os.path.isdir(args.model_path):
            print(
                f"WARNING: no {gender} variant of {args.model_path} "
                "found; fitting with the given model", file=sys.stderr,
            )
        model = bm.load_model(path, model_type=args.smpl_type)
    else:
        print(
            "WARNING: no --model_path given; using a synthetic body model "
            "(fits run, outputs are not anthropometric)", file=sys.stderr,
        )
        nv = getattr(args, "synthetic_num_verts", None) or (
            constants.SMPLX_NUM_VERTS if args.smpl_type == "smplx"
            else constants.SMPL_NUM_VERTS
        )
        model = bm.synthetic_model(args.smpl_type, num_verts=nv)
    if model.model_type == "smpl":
        model = bm.spin_joint_mapper_for_smpl(model)
    return model


def load_prior(args):
    from bodyfitting_tpu.losses import priors

    key = args.gmm_path
    if key in _PRIOR_CACHE:
        return _PRIOR_CACHE[key]
    if args.gmm_path and os.path.exists(args.gmm_path):
        prior = priors.load_gmm_prior(args.gmm_path)
    else:
        prior = priors.synthetic_gmm_prior()
    _PRIOR_CACHE[key] = prior
    return prior


class Runner:
    def __init__(self, args):
        self.args = args
        self.subject = args.subject
        self.target_dir = os.path.join(args.target_dir, self.subject)
        self.output_dir = os.path.join(args.output_dir, self.subject)
        annot = (
            os.path.join(args.annot_dir, self.subject + ".npy")
            if args.annot_dir
            else os.path.join(self.target_dir, "annots.npy")
        )
        self.Ks_all, self.RTs_all = load_annots(annot)
        self.views = genebody_views(self.subject)
        self.mask_frames = list(constants.GENEBODY_MASK_FRAMES)
        self.gender = self._gender()
        self.use_hand_face = args.smpl_type == "smplx"
        self._native_detectors = None
        # gendered model, like the reference's BodyFitting(gender=...)
        # (genebody_fitting.py:169 -> smplify.py:50-68)
        self.model = load_body_model(args, gender=self.gender)
        self.prior = load_prior(args)
        self.hmr = (
            bf.HMRBundle.load(args.hmr_checkpoint, args.mean_params)
            if args.hmr_checkpoint else None
        )
        self.seqs = self._sequence()
        self._debug_data = {}   # frame -> (images, c2ws, Ks, view ids)
        self._smpl_stage_model = None
        import threading

        self._detector_lock = threading.Lock()
        self._dp_mesh = None
        if args.timing:
            from bodyfitting_tpu.utils.observability import StageTimer

            self.timer = StageTimer()
        else:
            self.timer = None

    def _stage(self, name):
        import contextlib

        return self.timer.stage(name) if self.timer else (
            contextlib.nullcontext()
        )

    def _gender(self):
        if self.args.info_dir and os.path.exists(self.args.info_dir):
            with open(self.args.info_dir) as f:
                for row in csv.reader(f):
                    if row and row[0] == self.subject:
                        return "female" if int(row[1]) == 0 else "male"
        return "neutral"

    def _sequence(self):
        img_dir = os.path.join(self.target_dir, "image", "00")
        names = sorted(os.listdir(img_dir))
        return [int(os.path.splitext(n)[0]) for n in names]

    # ----- per-frame data preparation (host) ------------------------------

    def get_data(self, frame):
        import imageio.v2 as imageio

        size = self.args.load_size
        img_dir = os.path.join(self.output_dir, "%06d" % frame, "images")
        os.makedirs(img_dir, exist_ok=True)
        # crop PNGs exist only to feed the OpenPose binary; when this
        # frame's keypoint JSONs are already cached (run_openpose's own
        # skip condition), encoding ~48 PNGs per frame is pure waste
        op_dir = os.path.join(self.output_dir, "%06d" % frame, "openpose")
        imgnames = sorted(
            os.listdir(os.path.join(self.target_dir, "image", "00"))
        )
        msknames = sorted(
            os.listdir(os.path.join(self.target_dir, "mask", "00"))
        )
        frame_idx = self.seqs.index(frame)

        import cv2

        # HMR consumes exactly one view's image (the keyframe,
        # genebody_fitting.py:167); don't let an --hmr_checkpoint force
        # 48 JPEG decodes per frame.  If the keyframe view drops out at
        # runtime (empty mask/black frame) hmr_init falls back to the
        # mean-parameter init.
        hmr_view = None
        if self.hmr is not None:
            hmr_view = (
                constants.GENEBODY_KEYFRAME
                if constants.GENEBODY_KEYFRAME in self.views
                else self.views[0]
            )

        # Per-frame bbox cache: of the 48 views, only the GT-mask views
        # need the mask *content* (contours); the other ~40 need just the
        # square crop bbox -> K adjustment.  The bbox is a deterministic
        # function of the (static) mask file, so after the first pass it
        # is persisted under output_dir and those 40 PNG decodes — the
        # dominant per-view host cost once keypoint JSONs are cached —
        # are skipped on every later run with bit-identical results.
        # Rows are (status, top, left, bottom, right) with status 0 = not
        # cached, 1 = bbox valid, 2 = view unusable (empty mask) — a
        # dedicated column because bbox coordinates can legitimately be
        # negative (mask_square_bbox slides top to h - size when the
        # padded square outgrows the image), so coordinate sentinels
        # would collide.
        cache_path = os.path.join(
            self.output_dir, "%06d" % frame, "bbox_cache.npy"
        )
        bbox_cache = None
        if self.args.io_cache and os.path.exists(cache_path):
            c = np.load(cache_path)
            if c.shape == (48, 5):
                bbox_cache = c.astype(np.int64)
        new_cache = (
            np.zeros((48, 5), np.int64)
            if bbox_cache is None else bbox_cache.copy()
        )

        # Companion cache for the GT-mask views: the fit consumes their
        # cropped mask *content* (contours + stay-inside term), so the
        # bbox alone cannot skip those decodes.  The cropped mask is a
        # deterministic function of (mask file, bbox, load_size), is
        # 16-64x smaller than the source PNG, and is stored raw (npz) so
        # steady-state re-runs decode zero mask PNGs per frame.  Keyed
        # on load_size; rows are only trusted alongside a status-1 bbox
        # row (always saved in tandem).
        crop_path = os.path.join(
            self.output_dir, "%06d" % frame, "mask_crops_%d.npz" % size
        )
        crop_cache: dict | None = None
        if self.args.io_cache and os.path.exists(crop_path):
            with np.load(crop_path) as z:
                crop_cache = {int(k[1:]): z[k] for k in z.files}
        new_crops: dict = {}

        def load_view(i, view):
            """Read + crop one view (IO/decode-bound; runs threaded —
            the reference reads its 48 views serially,
            genebody_fitting.py:111-142).  cv2 decode like the reference
            (and ~7x faster than PIL on mask PNGs).

            Per-view image-decode skip: the fit consumes only the mask
            (bbox -> K adjustment, GT-view contours) and the keypoint
            JSON; the image feeds the detector (not needed once this
            view's JSON exists), the HMR keyframe init and debug
            overlays.  A cached JSON also *is* the persisted record that
            this view passed the black-frame filter on the run that
            produced it — a filtered (black) view never got a crop PNG,
            so it never got a JSON, and is re-checked every run.  On
            full-res GeneBody data the JPEG decode is the dominant host
            cost per view."""
            cached = (
                bbox_cache[view]
                if bbox_cache is not None and view < 48 else None
            )
            json_cached = os.path.exists(
                os.path.join(op_dir, "%02d_keypoints.json" % view)
            )
            want_crop = view in self.mask_frames and self.args.use_mask
            cached_crop = (
                crop_cache.get(view)
                if crop_cache is not None and view < 48 else None
            )
            # the image branch composites through the full-res mask
            need_img = (
                not json_cached or view == hmr_view or self.args.debug
            )
            need_mask = (
                cached is None or cached[0] == 0
                or (want_crop and cached_crop is None)
                or need_img
            )
            if cached is not None and cached[0] == 2:
                return None             # cached empty-mask verdict
            if need_mask:
                msk = imread_checked(os.path.join(
                    self.target_dir, "mask", "%02d" % view,
                    msknames[frame_idx]
                ), cv2.IMREAD_UNCHANGED)
                if msk.ndim == 3:
                    msk = msk[..., 0]
                if not msk.any():       # empty mask -> view unusable
                    if view < 48:
                        new_cache[view] = (2, 0, 0, 0, 0)
                    return None
                bbox = mask_square_bbox(msk)
                if view < 48:
                    new_cache[view] = (1,) + tuple(bbox)
            else:
                msk = None
                bbox = tuple(int(v) for v in cached[1:])
            if need_img:
                img = imread_checked(os.path.join(
                    self.target_dir, "image", "%02d" % view,
                    imgnames[frame_idx]
                ))[:, :, ::-1]    # BGR -> RGB
                img = apply_mask(img, msk)
                img = crop_and_resize(img, bbox, size)
                if np.mean(img) <= 10:  # black frame -> view unusable
                    return None
                if not json_cached:
                    # crop PNGs exist only to feed the OpenPose binary;
                    # written per missing view (incremental re-runs)
                    imageio.imwrite(
                        os.path.join(img_dir, "%02d.png" % view), img
                    )
            else:
                img = None
            # linear, like the reference actually runs (its positional
            # INTER_NEAREST is ignored by cv2 — see crop_and_resize);
            # binarize_mask downstream re-thresholds the blended edges
            crop_msk = None
            if want_crop:
                if msk is not None:
                    crop_msk = crop_and_resize(msk, bbox, size)
                    if view < 48:       # threads write disjoint keys
                        new_crops[view] = crop_msk
                else:
                    crop_msk = cached_crop
            return (
                img, crop_msk, adjust_K_for_crop(self.Ks_all[i], bbox, size),
                self.RTs_all[i].astype(np.float32),
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(16, len(self.views))) as ex:
            loaded = list(ex.map(
                load_view, range(len(self.views)), self.views
            ))

        if self.args.io_cache and not np.array_equal(
            new_cache, bbox_cache if bbox_cache is not None else -1
        ):
            # threads wrote disjoint rows; persist once per frame
            np.save(cache_path, new_cache)
        if self.args.io_cache and any(
            crop_cache is None or v not in crop_cache
            or not np.array_equal(crop_cache[v], a)
            for v, a in new_crops.items()
        ):
            merged = dict(crop_cache or {})
            merged.update(new_crops)
            np.savez(crop_path, **{"m%02d" % v: a for v, a in merged.items()})

        Ks, c2ws, use_frames, mask_frames, images, masks = (
            [], [], [], [], [], []
        )
        for view, item in zip(self.views, loaded):
            if item is None:
                continue
            img, crop_msk, K, c2w = item
            use_frames.append(view)
            images.append(img)
            if crop_msk is not None:
                masks.append(crop_msk)
                mask_frames.append(view)
            Ks.append(K)
            c2ws.append(c2w)
        return images, masks, Ks, c2ws, use_frames, mask_frames

    # ----- openpose subprocess (kept as the reference's boundary) ---------

    def run_openpose(self, frame, data):
        img_dir = os.path.abspath(
            os.path.join(self.output_dir, "%06d" % frame, "images")
        )
        wrt_dir = os.path.abspath(
            os.path.join(self.output_dir, "%06d" % frame, "openpose")
        )
        os.makedirs(wrt_dir, exist_ok=True)
        n_json = len([f for f in os.listdir(wrt_dir) if f.endswith(".json")])
        if n_json >= len(data[0]):
            return                      # cached (genebody_fitting.py:150)
        if self.args.native_openpose:
            self._native_detect(img_dir, wrt_dir)
            return
        hand_face = ["--hand", "--face"] if self.use_hand_face else []
        cmd = [
            "build/examples/openpose/openpose.bin",
            "--image_dir", img_dir, "--write_json", wrt_dir,
            "--display", "0", "--render_pose", "0",
        ] + hand_face
        subprocess.run(cmd, cwd=self.args.openpose_dir, check=True)

    def _native_detect(self, img_dir, wrt_dir):
        """In-process drop-in for the binary: Flax body+hand+face nets."""
        from bodyfitting_tpu.models.openpose_infer import (
            BodyDetector, FaceDetector, HandDetector, detect_to_json,
        )

        with self._detector_lock:
            self._init_native_detectors()
        body, hand, face = self._native_detectors
        detect_to_json(
            img_dir, wrt_dir, body, hand=hand,
            hand_face=self.use_hand_face, face=face,
        )

    def _init_native_detectors(self):
        from bodyfitting_tpu.models.openpose_infer import (
            BodyDetector, FaceDetector, HandDetector,
        )

        if self._native_detectors is None:
            ckpt = self.args.openpose_ckpt_dir

            def path(name):
                if ckpt is None:
                    return None
                p = os.path.join(ckpt, name)
                if not os.path.exists(p):
                    # a typo'd dir silently detecting with random weights
                    # would poison the JSON cache for every later run
                    raise FileNotFoundError(
                        f"--openpose_ckpt_dir given but {p} is missing"
                    )
                return p

            if ckpt is None:
                print(
                    "WARNING: --native_openpose without --openpose_ckpt_dir "
                    "runs randomly-initialized detectors (tests only)",
                    file=sys.stderr,
                )
            body = BodyDetector(path("body_pose_model.pth"))
            hand = face = None
            if self.use_hand_face:
                hand = HandDetector(path("hand_pose_model.pth"))
                face = FaceDetector(path("face_pose_model.pth"))
            self._native_detectors = (body, hand, face)

    def _mask_crop_hw(self, masks):
        """Static crop shape shared by every frame of the subject.

        Derived from the first batch's GT masks with 12.5%% slack,
        rounded to TPU tiling (8, 128); grown (recompile) if a later
        frame's silhouette exceeds it.  Crops are value-exact
        (losses.silhouette.compute_mask_crops), so the only cost of a
        growth event is the recompile.
        """
        from bodyfitting_tpu.losses.silhouette import compute_mask_crops

        if not masks:
            return getattr(self, "_crop_hw", None) or (8, 128)
        _, _, (h, w) = compute_mask_crops(list(masks))
        full = int(self.args.load_size)
        cur = getattr(self, "_crop_hw", None)
        if cur is None or h > cur[0] or w > cur[1]:
            grow = lambda v, q: min(full, -(-int(v * 1.125) // q) * q)
            new = (max(grow(h, 8), cur[0] if cur else 0),
                   max(grow(w, 128), cur[1] if cur else 0))
            if cur is not None:
                print(f"[mask_crop] growing crop {cur} -> {new} "
                      f"(recompile)", flush=True)
            self._crop_hw = new
        return self._crop_hw

    def read_openpose(self, frame):
        return load_openpose_dir(
            os.path.join(self.output_dir, "%06d" % frame, "openpose")
        )

    # ----- batched fitting -------------------------------------------------

    def build_frame_inputs(self, frame, data, keypoints):
        images, masks, Ks, c2ws, use_frames, mask_frames = data
        obs = bf.build_observations(
            c2ws, Ks, keypoints, self.use_hand_face,
            masks=masks if self.args.use_mask else None,
            mask_c2ws=[c2ws[use_frames.index(f)] for f in mask_frames]
            if masks else None,
            mask_Ks=[Ks[use_frames.index(f)] for f in mask_frames]
            if masks else None,
            num_views=len(self.views),
            # fixed shapes so frames batch: all GT-mask views + a generous
            # contour budget (outer contour of a 512^2 person silhouette)
            mask_num_views=len(self.mask_frames),
            mask_imsize=self.args.load_size,
            contour_pad=8 * self.args.load_size,
            contour_resample=self.args.contour_resample or None,
            mask_crop=self.args.use_mask and self.args.mask_crop,
            mask_crop_hw=self._mask_crop_hw(masks)
            if (self.args.use_mask and self.args.mask_crop) else None,
        )
        keyframe = (constants.GENEBODY_KEYFRAME
                    if constants.GENEBODY_KEYFRAME in use_frames
                    else use_frames[0])
        key_idx = use_frames.index(keyframe)
        betas, poses = bf.hmr_init(
            images[key_idx] if self.hmr else None, c2ws[key_idx], self.hmr
        )
        init = bf.init_params_from_hmr(self.model, betas, poses)
        if self.args.debug:
            # keep every render_skip-th decoded view for the reprojection
            # overlays the reference writes in debug mode
            # (body_fitting.py:101-107); --debug already forces the full
            # per-view decode in load_view
            step = 12
            sel = [i for i in range(0, len(images), step)
                   if images[i] is not None]
            self._debug_data[frame] = (
                [images[i] for i in sel], [c2ws[i] for i in sel],
                [Ks[i] for i in sel], [use_frames[i] for i in sel],
            )
        return obs, init

    def _smpl_init_stage(self, obs_list, init_list, config):
        """Two-stage init: fit SMPL on the body keypoints, seed SMPL-X
        (the reference's declared smplx_with_smpl_init option,
        genebody_fitting.py:44-45)."""
        import dataclasses

        if self._smpl_stage_model is None:
            smpl_args = argparse.Namespace(**vars(self.args))
            smpl_args.smpl_type = "smpl"
            self._smpl_stage_model = load_body_model(smpl_args)
        smpl_model = self._smpl_stage_model
        smpl_obs = [
            dataclasses.replace(o, keypoints=o.keypoints[:, :25])
            for o in obs_list
        ]
        smpl_inits = [
            bf.init_params_from_hmr(
                smpl_model,
                np.asarray(i.body.betas),
                np.concatenate([
                    np.asarray(i.body.global_orient),
                    np.zeros(69, np.float32),
                ]),
            )
            for i in init_list
        ]
        _, smpl_results, _ = bf.fit_frames_batched(
            smpl_model, dataclasses.replace(config, use_mask=False),
            smpl_obs, smpl_inits, self.prior,
        )
        return [
            bf.smplx_init_from_smpl(
                self.model,
                {k: np.asarray(v[i]) for k, v in smpl_results.items()},
            )
            for i in range(len(obs_list))
        ]

    @staticmethod
    def _harmonize_mask_crops(obs_list):
        """Pad per-frame mask crops to one batch shape.

        The adaptive crop shape (``_mask_crop_hw``) can grow mid-batch;
        zero-padding a crop window on the bottom/right is VALUE-EXACT
        (zero-padded bilinear sampling of the full mask reads 0 both
        outside the window and outside the image), so frames built with
        the smaller shape stack against later ones without rebuilds.
        """
        import dataclasses

        import jax.numpy as jnp

        shapes = {
            tuple(o.mask_crops.shape[1:]) for o in obs_list
            if o.mask_crops is not None
        }
        if len(shapes) <= 1:
            return obs_list
        Hc = max(h for h, _ in shapes)
        Wc = max(w for _, w in shapes)
        out = []
        for o in obs_list:
            if o.mask_crops is None or o.mask_crops.shape[1:] == (Hc, Wc):
                out.append(o)
                continue
            h, w = o.mask_crops.shape[1:]
            out.append(dataclasses.replace(
                o,
                mask_crops=jnp.pad(
                    o.mask_crops, ((0, 0), (0, Hc - h), (0, Wc - w))
                ),
            ))
        return out

    def dispatch_fit(self, frames, inputs):
        """Dispatch one batched fit; returns device arrays WITHOUT blocking
        (XLA executes asynchronously, so the host can prepare the next
        batch while this one runs on-chip)."""
        config = smplify.FitConfig(
            num_iters=self.args.num_iters,
            use_mask=self.args.use_mask and any(
                o.masks is not None or o.mask_crops is not None
                for o, _ in inputs
            ),
            imsize=float(self.args.load_size),
        )
        obs_list = [o for o, _ in inputs]
        obs_list = self._harmonize_mask_crops(obs_list)
        init_list = [i for _, i in inputs]
        if self.args.smplx_with_smpl_init and self.args.smpl_type == "smplx":
            init_list = self._smpl_init_stage(obs_list, init_list, config)
        with self._stage("fit/dispatch"):
            mesh = None
            if self.args.data_parallel:
                from bodyfitting_tpu.parallel import sharding as sh

                if self._dp_mesh is None:
                    self._dp_mesh = sh.make_mesh(n_view_shards=1)
                mesh = self._dp_mesh
            if self.args.temporal:
                results, losses = bf.fit_sequence_batched(
                    self.model, config, obs_list, init_list, self.prior,
                    mesh=mesh,
                )
            elif mesh is not None:
                _, results, losses = bf.fit_frames_batched_sharded(
                    self.model, config, obs_list, init_list, self.prior,
                    mesh=mesh,
                )
            else:
                _, results, losses = bf.fit_frames_batched(
                    self.model, config, obs_list, init_list, self.prior
                )
        return results, losses

    def write_batch(self, frames, results, losses):
        """Blocking device->host fetch + file outputs (runs on the writer
        thread in the pipelined run loop)."""
        # Loss curves on by default (the reference has none, SURVEY §5);
        # one JSONL record per fitted frame.
        from bodyfitting_tpu.utils.observability import LossTrace

        trace = LossTrace(os.path.join(self.output_dir, "loss_trace.jsonl"))
        with self._stage("fit/device_wait"):
            losses_np = np.asarray(losses)
            results = {k: np.asarray(v) for k, v in results.items()}
        with self._stage("write/outputs"):
            for bi, frame in enumerate(frames):
                # temporal fits return one joint (sequence-level) curve;
                # record it under every frame of the batch
                trace.record(
                    int(frame),
                    losses_np if losses_np.ndim == 1 else losses_np[bi],
                )
                result = {k: v[bi] for k, v in results.items()}
                out_dir = os.path.join(
                    self.output_dir, "%06d" % frame, "smplify"
                )
                dbg = self._debug_data.pop(frame, None)
                bf.save_frame_outputs(
                    out_dir, self.args.smpl_type, self.model, result,
                    images=dbg[0] if dbg else None,
                    c2ws=dbg[1] if dbg else None,
                    Ks=dbg[2] if dbg else None,
                    use_frames=dbg[3] if dbg else None,
                    render_skip=1,      # views pre-strided at capture
                    debug=dbg is not None,
                )

    def fit_batch(self, frames, inputs):
        results, losses = self.dispatch_fit(frames, inputs)
        self.write_batch(frames, results, losses)

    def run_output(self, frame):
        import shutil

        frame_dir = os.path.join(self.output_dir, "%06d" % frame, "smplify")
        smpl_folder = os.path.join(self.output_dir, "smpl")
        param_folder = os.path.join(self.output_dir, "param")
        os.makedirs(smpl_folder, exist_ok=True)
        os.makedirs(param_folder, exist_ok=True)
        shutil.copy(
            os.path.join(frame_dir, f"{self.args.smpl_type}.obj"),
            os.path.join(smpl_folder, "%04d.obj" % frame),
        )
        shutil.copy(
            os.path.join(frame_dir,
                         f"{self.args.smpl_type}_parameter.npy"),
            os.path.join(param_folder, "%04d.npy" % frame),
        )

    def _prepare_frame(self, frame):
        """Host-side prep for one frame: image IO/crop, keypoint detection,
        observation assembly.  Pure host work (plus tiny HMR-init device
        calls) — safe to run on prep threads while the chip fits."""
        with self._stage("prep/images"):
            data = self.get_data(frame)
        if "openpose" in self.args.tasks:
            with self._stage("prep/openpose"):
                self.run_openpose(frame, data)
        if "smplify" not in self.args.tasks:
            return None
        with self._stage("prep/observations"):
            keypoints = self.read_openpose(frame)
            return self.build_frame_inputs(frame, data, keypoints)

    def run(self):
        if self.args.prep_workers <= 0:
            self._run_serial()
        else:
            self._run_pipelined()
        if "output" in self.args.tasks:
            for frame in self.seqs:
                if os.path.exists(os.path.join(
                    self.output_dir, "%06d" % frame, "smplify",
                    f"{self.args.smpl_type}.obj",
                )):
                    self.run_output(frame)
        if self.timer is not None:
            import json

            summary = self.timer.summary()
            print("[timing] " + json.dumps(summary), file=sys.stderr)
            self.timer.dump(os.path.join(self.output_dir, "timing.json"))

    def _run_serial(self):
        """The reference's structure: prep -> fit -> write, one batch at a
        time (genebody_fitting.py:183-192, but batched)."""
        pending_frames, pending_inputs = [], []
        for frame in self.seqs:
            inputs = self._prepare_frame(frame)
            if inputs is None:
                continue
            pending_frames.append(frame)
            pending_inputs.append(inputs)
            if len(pending_frames) == self.args.batch_frames:
                self.fit_batch(pending_frames, pending_inputs)
                pending_frames, pending_inputs = [], []
        if pending_frames:
            self.fit_batch(pending_frames, pending_inputs)

    def _run_pipelined(self):
        """Three-stage software pipeline: prep threads read/crop upcoming
        frames while the chip fits the current batch (async XLA dispatch)
        and a writer thread drains finished batches to disk.  Identical
        outputs to ``_run_serial`` — frames enter batches in sequence
        order and the writer is a single ordered worker."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        lookahead = max(2 * self.args.batch_frames, self.args.prep_workers)
        write_futs = []
        with ThreadPoolExecutor(self.args.prep_workers) as prep, \
                ThreadPoolExecutor(1) as writer:
            seq_iter = iter(self.seqs)
            futq = deque()

            def submit_next():
                frame = next(seq_iter, None)
                if frame is not None:
                    futq.append(
                        (frame, prep.submit(self._prepare_frame, frame))
                    )

            for _ in range(lookahead):
                submit_next()
            pending_frames, pending_inputs = [], []
            while futq:
                frame, fut = futq.popleft()
                inputs = fut.result()
                submit_next()
                if inputs is None:
                    continue
                pending_frames.append(frame)
                pending_inputs.append(inputs)
                if len(pending_frames) == self.args.batch_frames:
                    results, losses = self.dispatch_fit(
                        pending_frames, pending_inputs
                    )
                    # bound in-flight device batches to 2 (the running one
                    # + one queued) so results don't pile up in HBM
                    while len(write_futs) > 1:
                        write_futs.pop(0).result()
                    write_futs.append(writer.submit(
                        self.write_batch, pending_frames, results, losses
                    ))
                    pending_frames, pending_inputs = [], []
            if pending_frames:
                results, losses = self.dispatch_fit(
                    pending_frames, pending_inputs
                )
                write_futs.append(writer.submit(
                    self.write_batch, pending_frames, results, losses
                ))
            for f in write_futs:
                f.result()


def main(argv=None):
    from bodyfitting_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    args = config_parser().parse_args(argv)
    Runner(args).run()


if __name__ == "__main__":
    main()
