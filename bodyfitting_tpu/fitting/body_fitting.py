"""Frame-level fitting orchestration (reference smplify/body_fitting.py).

Glues together: HMR initialization on a keyframe (rotated into world
coordinates through the calibrated camera), the SMPLify optimization, and
the output files + debug reprojection overlays.  Unlike the reference's
per-frame objects, everything here is functional and the SMPLify stage
accepts *batches* of frames (vmapped and optionally mesh-sharded upstream).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu import constants
from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.io import pack_keypoints, save_fit_outputs
from bodyfitting_tpu.models import body_model as bm
from bodyfitting_tpu.ops.rotations import rotmat_to_aa_np


@dataclasses.dataclass
class HMRBundle:
    """A loaded HMR network + mean params (None -> mean-pose init)."""

    model: object = None
    variables: Optional[dict] = None
    mean_params: Optional[tuple] = None

    @staticmethod
    def load(checkpoint_path: Optional[str] = None,
             mean_params_path: Optional[str] = None) -> "HMRBundle":
        from bodyfitting_tpu.models import hmr as hmr_mod

        model, variables = hmr_mod.init_hmr(jax.random.key(0))
        if checkpoint_path is not None and os.path.exists(checkpoint_path):
            variables = hmr_mod.load_torch_checkpoint(
                checkpoint_path, variables
            )
        mean = (
            hmr_mod.load_mean_params(mean_params_path)
            if mean_params_path else hmr_mod.load_mean_params()
        )
        return HMRBundle(model=model, variables=variables, mean_params=mean)


def preprocess_hmr_image(image: np.ndarray, input_res: int = 224):
    """Resize + ImageNet-normalise (reference body_fitting.py:57-66)."""
    import cv2

    img = cv2.resize(image, (input_res, input_res),
                     interpolation=cv2.INTER_CUBIC)
    img = img.astype(np.float32) / 255.0
    img = (img - np.asarray(constants.IMG_NORM_MEAN)) / np.asarray(
        constants.IMG_NORM_STD
    )
    return img[None].astype(np.float32)          # NHWC


def hmr_init(
    image: Optional[np.ndarray],
    c2w: np.ndarray,
    bundle: Optional[HMRBundle] = None,
):
    """Initial (betas, poses[72]) for SMPLify from the keyframe.

    Runs HMR when a network is given, otherwise the mean-pose fallback;
    either way the global orientation is rotated into world frame through
    the keyframe's camera-to-world rotation (body_fitting.py:69-73).
    """
    if bundle is not None and bundle.model is not None and image is not None:
        from bodyfitting_tpu.models.hmr import hmr_forward

        rotmat, betas, _ = hmr_forward(
            bundle.model, bundle.variables,
            jnp.asarray(preprocess_hmr_image(image)),
            bundle.mean_params,
        )
        rotmat = np.asarray(rotmat[0])           # [24, 3, 3]
        betas = np.asarray(betas[0])
    else:
        rotmat = np.broadcast_to(np.eye(3, dtype=np.float32),
                                 (24, 3, 3)).copy()
        betas = np.zeros(10, np.float32)

    rotmat = np.array(rotmat)
    rotmat[0] = np.asarray(c2w)[:3, :3] @ rotmat[0]
    # host-side conversion: this runs once PER FRAME in the app run
    # loops, and the eager jax chain cost ~0.2-0.4 s/frame of tunnel
    # dispatches (profiled r5) for a [24, 3, 3] input
    poses = rotmat_to_aa_np(rotmat).reshape(-1)
    return betas.astype(np.float32), poses.astype(np.float32)


def build_observations(
    c2ws: Sequence[np.ndarray],
    Ks: Sequence[np.ndarray],
    keypoints: Sequence[Optional[dict]],
    use_hand_face: bool,
    constant_scale: float = constants.GENEBODY_SCENE_SCALE,
    masks: Optional[Sequence[np.ndarray]] = None,
    mask_c2ws: Optional[Sequence[np.ndarray]] = None,
    mask_Ks: Optional[Sequence[np.ndarray]] = None,
    scan_verts: Optional[np.ndarray] = None,
    scan_faces: Optional[np.ndarray] = None,
    num_views: Optional[int] = None,
    mask_num_views: Optional[int] = None,
    mask_imsize: Optional[int] = None,
    contour_pad: Optional[int] = None,
    contour_resample: Optional[int] = 512,
    build_sdf: bool = True,
    sdf_resolution: int = 96,
    mask_crop: bool = False,
    mask_crop_hw: Optional[tuple] = None,
) -> smplify.Observations:
    """Assemble a single frame's Observations from host-side data.

    ``num_views`` / ``mask_num_views`` / ``contour_pad`` fix the padded
    shapes so per-frame Observations stack into a batch.  Padded mask
    views are inert: an all-ones mask (zero stay-inside term) with zero
    contour validity (zero ICP term).  ``contour_resample`` arc-length
    resamples contours to a fixed point count with pixel-sum-preserving
    weights (losses.silhouette.resample_contours, ~8x smaller mask-loss
    transient at 512^2); None keeps every contour pixel.

    ``mask_crop``: additionally store content-cropped masks
    (losses.silhouette.compute_mask_crops) so the stay-inside term runs
    on the crops — exact values, measured ~1.6x on the silhouette kernel
    at 512^2 (BENCH_NOTES r5).  ``mask_crop_hw`` fixes the static crop
    shape so per-frame Observations stack into a batch (None = smallest
    fit for THIS frame — per-frame shapes then differ; batch callers
    must pass a shared shape).
    """
    c2ws = np.asarray(c2ws, np.float32)
    w2cs = np.linalg.inv(c2ws)
    kps, view_mask = pack_keypoints(
        keypoints, use_hand_face=use_hand_face, num_views=num_views
    )
    Vw = kps.shape[0]
    w2cs_p = np.zeros((Vw, 4, 4), np.float32)
    Ks_p = np.zeros((Vw, 3, 3), np.float32)
    w2cs_p[: len(w2cs)] = w2cs
    w2cs_p[len(w2cs):] = np.eye(4)
    Ks_p[: len(Ks)] = np.asarray(Ks, np.float32)
    Ks_p[len(Ks):] = np.eye(3)
    # views beyond the provided cameras can never be valid
    view_mask[len(w2cs):] = 0.0

    obs = smplify.Observations(
        w2cs=jnp.asarray(w2cs_p),
        Ks=jnp.asarray(Ks_p),
        keypoints=jnp.asarray(kps),
        view_mask=jnp.asarray(view_mask),
        constant_scale=jnp.asarray(constant_scale, jnp.float32),
        num_views_used=jnp.asarray(float(len(w2cs)), jnp.float32),
    )
    if (masks is not None and len(masks) == 0 and mask_num_views
            and mask_imsize):
        # a use_mask frame where every GT-mask view was dropped (empty
        # masks / black frames): fully-inert mask observations — all-ones
        # masks (stay-inside term sees nothing "outside"), zero-validity
        # contours, identity cameras — so batched frames keep ONE pytree
        # structure (mixing masks=None with arrays breaks jnp.stack)
        P = contour_pad or 512
        if contour_resample and P > contour_resample:
            P = contour_resample
        H = int(mask_imsize)
        obs = dataclasses.replace(
            obs,
            masks=jnp.ones((mask_num_views, H, H), jnp.float32),
            mask_w2cs=jnp.broadcast_to(
                jnp.eye(4, dtype=jnp.float32), (mask_num_views, 4, 4)
            ),
            mask_Ks=jnp.broadcast_to(
                jnp.eye(3, dtype=jnp.float32), (mask_num_views, 3, 3)
            ),
            contours=jnp.zeros((mask_num_views, P, 2), jnp.float32),
            contour_valid=jnp.zeros((mask_num_views, P), jnp.float32),
        )
        if mask_crop:
            Hc, Wc = mask_crop_hw or (8, 128)
            obs = dataclasses.replace(
                obs,
                # full masks are not shipped on the crop path (the loss
                # never reads them; saves h2d + HBM)
                masks=None,
                mask_crops=jnp.ones((mask_num_views, Hc, Wc),
                                    jnp.float32),
                mask_crop_origins=jnp.zeros((mask_num_views, 2),
                                            jnp.float32),
                mask_view_valid=jnp.zeros((mask_num_views,),
                                          jnp.float32),
            )
    elif masks is not None and len(masks) > 0:
        from bodyfitting_tpu.losses.silhouette import (
            binarize_mask,
            extract_contours,
            resample_contours,
        )

        contours, valid = extract_contours(masks, pad_to=contour_pad)
        if contour_resample and contours.shape[1] > contour_resample:
            contours, valid = resample_contours(
                contours, valid, contour_resample
            )
        mask_arr = None
        if not mask_crop:
            # same binarisation rule as extract_contours — a float 0/1
            # mask thresholded at 128 would yield an all-zero stay-inside
            # image while its contours extract fine (silently inverted
            # loss).  On the crop path the full-resolution binarized
            # stack is never built or shipped at all: compute_mask_crops
            # binarizes internally, and shipping H x W masks to the
            # device only to replace them with crops cost ~8 MB of h2d
            # per frame over the tunnel (profiled r5).
            mask_arr = np.stack([binarize_mask(m) for m in masks])
        mw2cs = np.linalg.inv(np.asarray(mask_c2ws, np.float32))
        mKs = np.asarray(mask_Ks, np.float32)
        Vm = mask_num_views or len(masks)
        if Vm > len(masks):
            P = contours.shape[1]
            pad_n = Vm - len(masks)
            # inert padding: full masks, invalid contours, identity cameras
            if mask_arr is not None:
                H, W = mask_arr.shape[1:3]
                mask_arr = np.concatenate(
                    [mask_arr, np.ones((pad_n, H, W), np.float32)]
                )
            contours = np.concatenate(
                [contours, np.zeros((pad_n, P, 2), np.float32)]
            )
            valid = np.concatenate(
                [valid, np.zeros((pad_n, P), np.float32)]
            )
            eye4 = np.broadcast_to(np.eye(4, dtype=np.float32),
                                   (pad_n, 4, 4))
            mw2cs = np.concatenate([mw2cs, eye4])
            eye3 = np.broadcast_to(np.eye(3, dtype=np.float32),
                                   (pad_n, 3, 3))
            mKs = np.concatenate([mKs, eye3])
        obs = dataclasses.replace(
            obs,
            masks=None if mask_arr is None else jnp.asarray(mask_arr),
            mask_w2cs=jnp.asarray(mw2cs),
            mask_Ks=jnp.asarray(mKs),
            contours=jnp.asarray(contours),
            contour_valid=jnp.asarray(valid),
        )
        if mask_crop:
            from bodyfitting_tpu.losses.silhouette import (
                compute_mask_crops,
            )

            crops, origins, (Hc, Wc) = compute_mask_crops(
                list(masks), crop_hw=mask_crop_hw
            )
            vvalid = np.ones(len(masks), np.float32)
            if Vm > len(masks):
                pad_n = Vm - len(masks)
                crops = np.concatenate(
                    [crops, np.ones((pad_n, Hc, Wc), np.float32)]
                )
                origins = np.concatenate(
                    [origins, np.zeros((pad_n, 2), np.float32)]
                )
                vvalid = np.concatenate(
                    [vvalid, np.zeros(pad_n, np.float32)]
                )
            obs = dataclasses.replace(
                obs,
                masks=None,
                mask_crops=jnp.asarray(crops),
                mask_crop_origins=jnp.asarray(origins),
                mask_view_valid=jnp.asarray(vvalid),
            )
    if scan_verts is not None:
        sv = np.asarray(scan_verts, np.float32)
        height = float(sv[:, 1].max() - sv[:, 1].min())
        obs = dataclasses.replace(
            obs,
            scan_verts=jnp.asarray(sv),
            scan_faces=jnp.asarray(np.asarray(scan_faces, np.int32)),
            scan_height=jnp.asarray(height, jnp.float32),
            constant_scale=jnp.asarray(
                height / constants.RENDERPEOPLE_PERSON_HEIGHT, jnp.float32
            ),
        )
        if build_sdf:
            from bodyfitting_tpu.ops.sdf import build_distance_volume

            obs = dataclasses.replace(
                obs,
                scan_volume=build_distance_volume(
                    obs.scan_verts, obs.scan_faces,
                    resolution=sdf_resolution,
                ),
            )
    return obs


def init_params_from_hmr(
    model: bm.BodyModel, betas: np.ndarray, poses: np.ndarray
) -> smplify.FitParams:
    """HMR output -> FitParams (reference smplify.py:103-128)."""
    nb = model.num_body_joints
    body_pose = poses[3:3 + 3 * nb]
    init_betas = betas
    if model.num_betas != betas.shape[0]:
        init_betas = np.zeros(model.num_betas, np.float32)
        init_betas[: min(model.num_betas, betas.shape[0])] = betas[
            : model.num_betas
        ]
    return smplify.FitParams.init(
        model,
        init_betas=jnp.asarray(init_betas),
        init_global_orient=jnp.asarray(poses[:3]),
        init_body_pose=jnp.asarray(body_pose),
    )


def smplx_init_from_smpl(
    smplx_model: bm.BodyModel, smpl_result: dict
) -> smplify.FitParams:
    """Seed an SMPL-X fit from a finished SMPL fit.

    Implements the reference's declared-but-unwired ``smplx_with_smpl_init``
    option (genebody_fitting.py:44-45): the first 21 body joints, betas,
    global orientation, translation and scale carry over; hands/face start
    at zero.
    """
    pose = np.asarray(smpl_result["pose"], np.float32).reshape(-1)
    body = bm.BodyParams.zeros(smplx_model)
    betas = np.zeros(smplx_model.num_betas, np.float32)
    src_betas = np.asarray(smpl_result["betas"], np.float32).reshape(-1)
    n = min(len(betas), len(src_betas))
    betas[:n] = src_betas[:n]
    import dataclasses as _dc

    body = _dc.replace(
        body,
        betas=jnp.asarray(betas),
        global_orient=jnp.asarray(
            np.asarray(smpl_result["global_orient"], np.float32).reshape(-1)
        ),
        body_pose=jnp.asarray(pose[: 3 * smplx_model.num_body_joints]),
    )
    scale = np.asarray(smpl_result["scale"], np.float32).reshape(-1)
    transl = np.asarray(
        smpl_result["global_transl"], np.float32
    ).reshape(-1)
    # stored global_transl is transl*scale (smplify.py:223): undo.
    # Sign-preserving guard — body_scale is unconstrained, so a (degenerate)
    # negative fitted scale must divide through as-is, not be clamped to
    # +1e-8 (which would launch the seed kilometres away).
    safe_scale = np.where(np.abs(scale) < 1e-8, 1e-8, scale)
    return smplify.FitParams(
        body=body,
        global_transl=jnp.asarray(transl / safe_scale),
        body_scale=jnp.asarray(scale),
    )


def check_smpl_fitting(image, verts, c2w, K):
    """Green-dot reprojection overlay (reference body_fitting.py:35-43)."""
    import cv2

    w2c = np.linalg.inv(np.asarray(c2w))
    cam = np.asarray(verts) @ w2c[:3, :3].T + w2c[:3, 3]
    proj = cam @ np.asarray(K).T
    uv = proj[:, :2] / np.maximum(proj[:, 2:3], 1e-9)
    out = image.copy()
    h, w = out.shape[:2]
    for p in uv:
        x, y = int(p[0]), int(p[1])
        if 0 <= x < w and 0 <= y < h:
            out = cv2.circle(out, (x, y), 1, (0, 255, 0), -1)
    return out


# Module-level cache of jitted batched-fit programs (same pattern as the
# texfit program cache, fitting/texture.py).  jax.jit's own C++ fast path
# caches per *callable*: a fresh ``jax.jit(lambda ...)`` closure per call
# misses it, so every fit_frames_batched call paid a full retrace AND a
# persistent-compilation-cache executable read (~17 s warm per Runner on
# the tunnel, profiled r5).  Keyed on (id(model), id(prior), config) with
# weakref identity checks so a dead-and-recycled id can never serve a
# stale program.
_FIT_PROGRAMS: dict = {}


def _fit_program(model, config, pose_prior_fn, batched: bool = True):
    import weakref

    key = (id(model), id(pose_prior_fn), config, batched)
    ent = _FIT_PROGRAMS.get(key)
    if ent is not None:
        mref, pref, fn = ent
        if mref() is model and pref() is pose_prior_fn:
            return fn
    fit_one = lambda o, i: smplify.fit(  # noqa: E731
        model, config, o, i, pose_prior_fn
    )
    fn = jax.jit(jax.vmap(fit_one) if batched else fit_one)
    try:
        mref, pref = weakref.ref(model), weakref.ref(pose_prior_fn)
    except TypeError:       # non-weakref-able prior: skip caching
        return fn
    if len(_FIT_PROGRAMS) > 32:     # bound growth across many configs
        _FIT_PROGRAMS.clear()
    _FIT_PROGRAMS[key] = (mref, pref, fn)
    return fn


def fit_frames_batched(
    model: bm.BodyModel,
    config: smplify.FitConfig,
    obs_list: Sequence[smplify.Observations],
    init_list: Sequence[smplify.FitParams],
    pose_prior_fn,
):
    """Stack per-frame observations and fit them all in one vmapped jit."""
    obs = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
    init = jax.tree.map(lambda *xs: jnp.stack(xs), *init_list)
    fit = _fit_program(model, config, pose_prior_fn)
    return fit(obs, init)


def fit_frames_batched_sharded(
    model: bm.BodyModel,
    config: smplify.FitConfig,
    obs_list: Sequence[smplify.Observations],
    init_list: Sequence[smplify.FitParams],
    pose_prior_fn,
    mesh=None,
):
    """Data-parallel :func:`fit_frames_batched`: the stacked frame axis is
    sharded over a ``(frames,)`` device mesh (multi-chip scaling the
    reference's serial loop, genebody_fitting.py:183-192, never had).

    Pads the batch by repeating the last frame up to the mesh size and
    strips the padding from every output.
    """
    from bodyfitting_tpu.parallel import sharding as sh

    if mesh is None:
        mesh = sh.make_mesh(n_view_shards=1)
    n = len(obs_list)
    n_shards = mesh.shape["frames"]
    pad = (-n) % n_shards
    obs_list = list(obs_list) + [obs_list[-1]] * pad
    init_list = list(init_list) + [init_list[-1]] * pad
    obs = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
    init = jax.tree.map(lambda *xs: jnp.stack(xs), *init_list)
    params, results, losses = sh.fit_sequence_sharded(
        model, config, obs, init, pose_prior_fn, mesh=mesh
    )
    return (
        jax.tree.map(lambda x: x[:n], params),
        {k: v[:n] for k, v in results.items()},
        losses[:n],
    )


def fit_sequence_batched(
    model: bm.BodyModel,
    config: smplify.FitConfig,
    obs_list: Sequence[smplify.Observations],
    init_list: Sequence[smplify.FitParams],
    pose_prior_fn,
    tcfg=None,
    mesh=None,
):
    """Temporally-coupled batch fit (:func:`sequence.fit_sequence`) over a
    list of per-frame observations, optionally sharded over a ``frames``
    device mesh.

    With a mesh, the batch is padded by repeating the last frame; padded
    frames are excluded from the objective via ``frame_valid`` (their
    data losses and every temporal term touching them carry zero weight,
    see :func:`sequence.temporal_loss`), so the real frames' fits match
    the unpadded objective exactly.  The cross-shard temporal differences
    become neighbour-exchange collectives XLA inserts automatically.
    Returns ``(results, losses [num_iters])`` — the loss curve is
    sequence-level (one joint optimization over the valid frames).
    """
    from bodyfitting_tpu.fitting import sequence as seq

    if tcfg is None:
        tcfg = seq.TemporalConfig()
    n = len(obs_list)
    obs_list, init_list = list(obs_list), list(init_list)
    frame_valid = None
    if mesh is not None:
        pad = (-n) % mesh.shape["frames"]
        obs_list += [obs_list[-1]] * pad
        init_list += [init_list[-1]] * pad
        frame_valid = jnp.asarray(
            [1.0] * n + [0.0] * pad, jnp.float32
        )
    obs = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_list)
    init = jax.tree.map(lambda *xs: jnp.stack(xs), *init_list)

    fit_one = lambda o, i, v: seq.fit_sequence(  # noqa: E731
        model, config, o, i, pose_prior_fn, tcfg, frame_valid=v
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bodyfitting_tpu.parallel import sharding as sh

        fit_j = jax.jit(
            fit_one,
            in_shardings=(
                sh.obs_sharding(mesh, obs), sh.params_sharding(mesh, init),
                NamedSharding(mesh, P("frames")),
            ),
        )
    else:
        fit_j = jax.jit(fit_one)
    _, results, losses = fit_j(obs, init, frame_valid)
    return {k: v[:n] for k, v in results.items()}, losses


def save_frame_outputs(
    output_folder: str,
    smpl_type: str,
    model: bm.BodyModel,
    result: dict,
    images=None,
    c2ws=None,
    Ks=None,
    use_frames=None,
    render_skip: int = 12,
    debug: bool = False,
) -> None:
    """Parameter/obj outputs + optional reprojection overlays
    (body_fitting.py:94-107)."""
    # displacement stays in the saved dict (reference smplify.py:247) AND
    # drives the +d.obj
    save_fit_outputs(
        output_folder, smpl_type, result, np.asarray(model.faces),
        displacement=result.get("displacement"),
    )
    if debug and images is not None:
        import imageio

        fit_dir = os.path.join(output_folder, "smpl_fitting")
        os.makedirs(fit_dir, exist_ok=True)
        frames = use_frames or list(range(len(images)))
        # reference semantics (body_fitting.py:104-107): images/c2ws/Ks are
        # positionally aligned with use_frames, whose entries are the frame
        # *ids* the overlays are named after
        if len(frames) != len(images):
            raise ValueError(
                f"use_frames ({len(frames)}) must align 1:1 with images "
                f"({len(images)})"
            )
        for idx in range(0, len(images), render_skip):
            overlay = check_smpl_fitting(
                images[idx], np.asarray(result["vertices"]), c2ws[idx],
                Ks[idx],
            )
            imageio.imwrite(
                os.path.join(fit_dir, "%02d.png" % frames[idx]), overlay
            )
