"""UV texture fitting: optimise a texture atlas by differentiable rendering.

Re-design of the reference's TextureFitting
(/root/reference/smplify/texture_fitting.py:173-307):

  * the optimised variable is the **UV texture image itself** (1024^2 x 3)
    sampled bilinearly through the rasterizer, instead of NMR's per-face
    texture cubes.  Atlas "baking" (reference render_texture_map,
    texture_fitting.py:149-165) becomes the identity — the optimised image
    *is* the atlas — so only the coverage morphology remains;
  * the 200-iteration Adam loop (5 cycles over 18 round views, then random
    sphere views — texture_fitting.py:244-276) runs as one jitted
    ``lax.scan`` whose per-iteration camera comes from a precomputed pose
    array; the loss is the reference's summed L1 between the scan render
    and the SMPL+D render;
  * camera rings/spheres are generated in plain CV convention (w2c + K);
    the reference's GL flip (utils/renderer.py:18) is a renderer-internal
    detail with no observable effect on the fitted texture.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bodyfitting_tpu.ops import rasterize as rz
from bodyfitting_tpu.ops import uv_sample as uvs


@dataclasses.dataclass(frozen=True)
class TextureFitConfig:
    tex_img_size: int = 1024
    render_img_size: int = 512
    lr: float = 1e-2
    iter_num: int = 200
    round_views: int = 18
    round_view_iters: int = 5      # cycles over the round views first
    face_block: int = 256
    seed: int = 0
    # geometry is FIXED during texture optimisation, so every unique
    # camera's raster maps and scan render are computed once; each Adam
    # iteration is then two dense one-hot matmuls per work item on the MXU
    # (ops/uv_sample.py, plans built on device) — 3.8 ms/iter vs the
    # re-raster path's ~93 ms/iter, same loss values (pinned by
    # tests/test_texture_precompute.py).  At the reference schedule (~64%
    # unique poses) the 200-iter texfit measures 18-19s warm vs
    # re-raster's 28-41s (tunnel-session spread); schedules that revisit
    # poses compound the win.  Set precompute=False to re-render every
    # iteration like the reference.
    precompute: bool = True
    # precompute mode only: False falls back to gather-based sampling of
    # the cached UV maps (same values; ~6x slower iterations)
    bucketed_uv: bool = True
    uv_chunk: int = 2048
    uv_window_rows: int = 8
    # precompute mode: unique-pose maps are built `map_chunk` poses per
    # program via lax.map (the Pallas rasterizer is a single op, so
    # scanning over poses is cheap to compile — the CLAUDE.md warning
    # about lax.map exploding compile time applies to the old XLA
    # scan-over-faces rasterizer).  Measured NEUTRAL on the warm wall vs
    # the per-pose host loop on this tunnel (async dispatch already
    # pipelines the 128 launches); kept because it cuts the launch count
    # 32x and replaces the 128-way per-pose restack with 4 concats.
    map_chunk: int = 32
    # precompute mode: vmap the fused raster's per-pose glue (project +
    # y-sort + SoA pack, ops/pallas_kernels._raster_attr_pack) across the
    # whole chunk so XLA parallelises it, leaving only the Pallas kernel
    # launches inside the sequential lax.map (bench_texfit_maps
    # "packedraster" stage).  Same values as the unpacked path (the pack
    # is the same function, pinned by tests/test_texture_precompute.py).
    # Measured NEUTRAL end-to-end at the 5b schedule (7.32s vs 7.60s
    # interleaved medians, BENCH_NOTES round-5): async dispatch already
    # overlaps the glue, so this stays off by default.
    packed_glue: bool = False


# ---------------------------------------------------------------------------
# Camera schedules (host-side numpy; reference utils/renderer.py:7-25 and
# texture_fitting.py:64-82)
# ---------------------------------------------------------------------------


def look_at_w2c(eye: np.ndarray, center: np.ndarray,
                up=(0.0, 1.0, 0.0)) -> np.ndarray:
    """CV-convention world-to-camera: +z forward (towards center), y down.

    Matches the reference's ``gen_cam_views(..., gl=True)`` axes exactly
    (utils/renderer.py:7-25: ``cv2gl @ inv(viewmatrix)``): for
    ``eye=(0,0,d), center=0, up=+y`` the camera axes are ``x=(1,0,0),
    y=(0,-1,0), z=(0,0,-1)`` — world-up maps to image-up (smaller v), so
    rendered people are upright for OpenPose/HMR.
    """
    eye = np.asarray(eye, np.float64)
    z = center - eye
    z = z / np.linalg.norm(z)
    up = np.asarray(up, np.float64)
    x = np.cross(z, up)
    n = np.linalg.norm(x)
    if n < 1e-8:                      # looking straight up/down
        x = np.array([1.0, 0.0, 0.0])
    else:
        x = x / n
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return np.linalg.inv(c2w)


def ring_poses(center: np.ndarray, n: int, dist: float) -> np.ndarray:
    """n w2c matrices on a horizontal ring looking at ``center``."""
    out = []
    for theta in np.linspace(0, 2 * np.pi, n + 1)[:-1]:
        eye = center + np.array(
            [np.cos(theta), 0.0, -np.sin(theta)]
        ) * dist
        out.append(look_at_w2c(eye, center))
    return np.stack(out).astype(np.float32)


def sphere_pose(rad: float, theta: float, phi: float,
                center: np.ndarray) -> np.ndarray:
    """A w2c on the sphere (reference sphere2rot, texture_fitting.py:64-82)."""
    eye = center + rad * np.array([
        np.sin(theta) * np.sin(phi), np.cos(theta), np.sin(theta) * np.cos(phi)
    ])
    return look_at_w2c(eye, center).astype(np.float32)


def training_pose_schedule(
    config: TextureFitConfig, center: np.ndarray, dist: float
) -> np.ndarray:
    """[iter_num, 4, 4] per-iteration cameras: round cycles then random
    sphere samples (reference texture_fitting.py:257-264)."""
    rng = np.random.default_rng(config.seed)
    ring = ring_poses(center, config.round_views, dist)
    poses = []
    for i in range(config.iter_num):
        if i < config.round_view_iters * config.round_views:
            poses.append(ring[i % config.round_views])
        else:
            poses.append(sphere_pose(
                dist, rng.uniform(0, np.pi), rng.uniform(0, 2 * np.pi),
                center,
            ))
    return np.stack(poses)


def default_K(img_size: int) -> np.ndarray:
    """f = img_size, principal point centred (texture_fitting.py:245)."""
    s = float(img_size)
    return np.array(
        [[s, 0, s / 2], [0, s, s / 2], [0, 0, 1]], np.float32
    )


# ---------------------------------------------------------------------------
# Rendering helpers
# ---------------------------------------------------------------------------


def render_textured(
    verts, faces, face_uvs, texture, w2c, K, image_size, face_block=256,
    background=1.0, supersample: int = 1,
):
    """Rasterize + UV-sample in one go; differentiable w.r.t. ``texture``.

    Uses the Pallas z-buffer kernel on TPU (the texture gradient flows
    through the sampling post-pass only, so the non-differentiable kernel
    is safe under grad).  ``supersample=2`` reproduces the reference
    renderer's 2x anti-aliasing (rasterize.py:297-304): render at 2x and
    box-filter down; the returned raster maps stay at the render scale.
    """
    from bodyfitting_tpu.ops.pallas_kernels import auto_rasterize

    ss = max(int(supersample), 1)
    K_ss = jnp.asarray(K)
    if ss > 1:
        # scale fx/fy/cx/cy but keep K[2,2]=1 — a numpy K used to skip
        # this via the hasattr fallback, leaving K[2,2]=ss which cancelled
        # the scaling in the perspective divide (mesh rendered at 1x into
        # the ss-times canvas)
        K_ss = (K_ss * ss).at[2, 2].set(1.0)
    px, fz = rz.project_faces(verts, faces, w2c, K_ss)
    raster = auto_rasterize(px, fz, image_size * ss, face_block=face_block)
    raster = jax.tree.map(jax.lax.stop_gradient, raster)
    img = rz.sample_texture(raster, face_uvs, texture,
                            background=background)
    if ss > 1:
        H = image_size
        img = img.reshape(H, ss, H, ss, -1).mean(axis=(1, 3))
    return img, raster


def scene_bounds(verts: np.ndarray):
    """(center, bound, dist) with dist = height/0.8
    (texture_fitting.py:232-236)."""
    vmin, vmax = np.asarray(verts).min(0), np.asarray(verts).max(0)
    center = (vmin + vmax) / 2
    bound = vmax - vmin
    return center, bound, float(bound[1] / 0.8)


@functools.lru_cache(maxsize=None)
def _scan_views_program(imgsize: int, face_block: int, background: float):
    """Jitted one-view scan render, cached per static config.

    The eager per-view version cost 8 sequential launch chains of
    ~dozens of tunnel dispatches each plus 4x the d2h bytes (uint8
    conversion now happens ON DEVICE), and was most of the RenderPeople
    prep stage (BENCH_NOTES r4: prep 174.9 s of a ~295 s scan).  The
    view axis is deliberately a HOST loop over this one cached program:
    batching it (jit(vmap)) exploded the Pallas-rasterizer compile the
    same way lax.map around it does (CLAUDE.md; measured r5: prep
    175 -> 1699 s).  Scene arrays are jit arguments, not closures (the
    remote-compile tunnel rejects huge programs, CLAUDE.md).
    """

    def render_one(verts, faces, face_uvs, texture, w2c, K):
        img, raster = render_textured(
            verts, faces, face_uvs, texture, w2c, K, imgsize,
            face_block=face_block, background=background,
        )
        mask = rz.render_silhouette(raster)
        # same uint8 rule as np: clip to [0,1], scale, truncate
        img_u8 = (jnp.clip(img, 0.0, 1.0) * 255).astype(jnp.uint8)
        return img_u8, (mask * 255).astype(jnp.uint8)

    return jax.jit(render_one)


def render_scan_views(
    scan_verts, scan_faces, scan_face_uvs, scan_texture,
    imgsize: int = 512, viewnum: int = 8, white_bkgd: bool = False,
    face_block: int = 512,
):
    """Round-view synthetic images + masks of a textured scan.

    Replaces the reference's render_texture_mesh (utils/renderer.py:27-62),
    which generates the multi-view input for RenderPeople fitting.
    Returns ``(images [N,H,W,3] uint8, masks [N,H,W] uint8, w2cs, Ks)``.
    """
    center, bound, dist = scene_bounds(np.asarray(scan_verts))
    w2cs = ring_poses(center, viewnum, dist)
    K = default_K(imgsize)

    render = _scan_views_program(
        int(imgsize), int(face_block), 1.0 if white_bkgd else 0.0
    )
    sv, sf = jnp.asarray(scan_verts), jnp.asarray(scan_faces)
    su, st = jnp.asarray(scan_face_uvs), jnp.asarray(scan_texture)
    Kj = jnp.asarray(K)
    out = [render(sv, sf, su, st, jnp.asarray(w2cs[i]), Kj)
           for i in range(viewnum)]
    imgs = np.stack([np.asarray(o[0]) for o in out])
    masks = np.stack([np.asarray(o[1]) for o in out])
    Ks = np.stack([K] * viewnum)
    return imgs, masks, w2cs, Ks


# ---------------------------------------------------------------------------
# The texture optimisation itself
# ---------------------------------------------------------------------------


def _plan_loss(t, idx, stacked, *_static):
    """Bucketed one-hot sampling loss for pose ``idx`` of a stacked plan."""
    return uvs.plan_l1_loss(t, uvs.index_plan(stacked, idx))


def _maps_loss(t, idx, maps, *_static):
    """Gather-based sampling loss from cached per-pose UV maps."""
    scan_imgs, uv_maps, fgs = maps
    smpl_img = rz.sample_texture_uvmap(
        uv_maps[idx], fgs[idx], t, background=1.0
    )
    return jnp.sum(jnp.abs(scan_imgs[idx] - smpl_img))


def _reraster_loss(t, w2c, aux, img_size, face_block):
    """Reference per-iteration behaviour: re-render both meshes."""
    (K, smpl_v, smpl_f, smpl_uv, scan_v, scan_f, scan_uv, scan_t) = aux
    scan_img, _ = render_textured(
        scan_v, scan_f, scan_uv, scan_t, w2c, K, img_size, face_block,
    )
    scan_img = jax.lax.stop_gradient(scan_img)
    smpl_img, _ = render_textured(
        smpl_v, smpl_f, smpl_uv, t, w2c, K, img_size, face_block,
    )
    return jnp.sum(jnp.abs(scan_img - smpl_img))


def _adam_scan(lr, loss_fn, tex0, aux, xs, static=()):
    """Shared texture Adam loop: scan over ``xs``, clip texture to [0,1].

    All three fit_texture variants (bucketed plans, gather maps,
    re-raster) differ only in ``loss_fn(tex, x, aux, *static)``; keeping
    one step body here keeps them iteration-for-iteration comparable
    (pinned by tests/test_texture_precompute.py).  ``aux``/``xs`` ride as
    jit arguments, never closures (a closed-over production scan would
    embed tens of MB of constants — the remote-compile tunnel rejects
    huge programs, CLAUDE.md).
    """
    return _adam_scan_program(lr, loss_fn, static)(tex0, aux, xs)


@functools.lru_cache(maxsize=None)
def _adam_scan_program(lr, loss_fn, static):
    """One jitted Adam-scan program per (lr, module-level loss) pair.

    fit_texture used to build a fresh ``jax.jit`` closure per call, so
    every fit in a process re-traced and re-looked-up the compiled scan
    (seconds of wall through the remote-compile tunnel even on cache
    hits).  Keying the program on hashables — the learning rate, a
    module-level loss function, and its static config — makes repeat
    fits (the production pattern: one process fitting many scans) true
    warm runs.
    """
    tx = optax.adam(lr)

    @jax.jit
    def run(tex0, aux, xs):
        opt_state = tx.init(tex0)

        def step(carry, x):
            tex, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda t: loss_fn(t, x, aux, *static)
            )(tex)
            updates, opt_state = tx.update(grads, opt_state, tex)
            tex = optax.apply_updates(tex, updates)
            return (jnp.clip(tex, 0.0, 1.0), opt_state), loss

        (tex, _), losses = jax.lax.scan(step, (tex0, opt_state), xs)
        return tex, losses

    return run


def fit_texture(
    smpl_verts,
    smpl_faces,
    smpl_face_uvs,
    scan_verts,
    scan_faces,
    scan_face_uvs,
    scan_texture,
    config: TextureFitConfig = TextureFitConfig(),
    init_texture: Optional[jnp.ndarray] = None,
):
    """Optimise the SMPL(+D) UV texture to match scan renders.

    Returns ``(texture [S,S,3], per-iter losses)``.  Jitted end to end; the
    per-iteration camera schedule is precomputed on host.
    """
    center, _, dist = scene_bounds(np.asarray(scan_verts))
    poses_np = training_pose_schedule(config, center, dist)
    K = jnp.asarray(default_K(config.render_img_size))

    S = config.tex_img_size
    if init_texture is None:
        # grey default texture (reference create_smpld_uv: 128/255)
        init_texture = jnp.full((S, S, 3), 128.0 / 255.0)

    smpl_verts = jnp.asarray(smpl_verts)
    smpl_faces = jnp.asarray(smpl_faces)
    smpl_face_uvs = jnp.asarray(smpl_face_uvs)
    scan_verts_j = jnp.asarray(scan_verts)
    scan_faces_j = jnp.asarray(scan_faces)
    scan_face_uvs_j = jnp.asarray(scan_face_uvs)
    scan_texture_j = jnp.asarray(scan_texture)

    if config.precompute:
        # Deduplicate the schedule (the round phase revisits each ring
        # camera round_view_iters times), rasterize each unique pose once.
        uniq, pose_index = np.unique(
            poses_np.reshape(len(poses_np), -1), axis=0,
            return_inverse=True,
        )
        uniq_poses = jnp.asarray(
            uniq.reshape(-1, 4, 4), jnp.float32
        )
        pose_index = jnp.asarray(pose_index.astype(np.int32))

        # chunked lax.map over poses (see TextureFitConfig.map_chunk).
        # The last chunk pads with repeats of the final pose so every
        # chunk compiles to the same program.
        chunk = max(1, min(config.map_chunk, uniq_poses.shape[0]))
        n_chunks = -(-uniq_poses.shape[0] // chunk)
        pad = n_chunks * chunk - uniq_poses.shape[0]
        padded = jnp.concatenate(
            [uniq_poses, jnp.repeat(uniq_poses[-1:], pad, axis=0)]
        ) if pad else uniq_poses

        maps_jit = _maps_program(config.render_img_size, config.face_block,
                                 packed=config.packed_glue)
        scene = (scan_verts_j, scan_faces_j, scan_face_uvs_j,
                 scan_texture_j, smpl_verts, smpl_faces, smpl_face_uvs)
        chunks = [
            maps_jit(padded[i * chunk:(i + 1) * chunk], K, *scene)
            for i in range(n_chunks)
        ]
        scan_imgs, uv_maps, fgs = (
            jnp.concatenate([c[k] for c in chunks])[:uniq_poses.shape[0]]
            for k in range(3)
        )

        if config.bucketed_uv:
            # One-hot MXU sampling plans, built ON DEVICE in one vmapped
            # call over all unique poses
            # (ops/uv_sample.build_uv_sample_plan_device — the round-2
            # HOST builder cost tens of seconds of 1-CPU numpy across
            # ~110 unique poses and sank this path, BENCH_NOTES.md).
            # Each Adam step is then two dense matmuls per work item with
            # the same loss value as the gather path.
            build = _plan_build_program(
                S, config.uv_chunk, config.uv_window_rows
            )
            stacked = build(uv_maps, fgs, scan_imgs)
            # drop the static item-cap padding (one small host sync)
            stacked = uvs.trim_plan(stacked, uvs.used_items(stacked))

            return _adam_scan(config.lr, _plan_loss, init_texture,
                              stacked, pose_index)

        return _adam_scan(config.lr, _maps_loss, init_texture,
                          (scan_imgs, uv_maps, fgs), pose_index)

    poses = jnp.asarray(poses_np)
    return _adam_scan(
        config.lr, _reraster_loss, init_texture,
        (K, smpl_verts, smpl_faces, smpl_face_uvs,
         scan_verts_j, scan_faces_j, scan_face_uvs_j, scan_texture_j),
        poses,
        static=(config.render_img_size, config.face_block),
    )


@functools.lru_cache(maxsize=None)
def _maps_program(img_size: int, face_block: int, packed: bool = False):
    """Jitted chunked unique-pose map build, cached per static config.

    Both rasters run the FUSED attr kernel (per-pixel UVs interpolated
    inside the z-buffer sweep, ops/pallas_kernels.rasterize_attrs_pallas):
    the old raster -> bary post-pass -> face_uvs[idx] chain cost ~5
    per-element 262k-row gathers per pose — most of the map build's
    ~57 ms/pose (bench_texfit_maps.py: 24 ms/pose fused).  Scene arrays
    are jit arguments, not closures (a closed-over production scan would
    embed tens of MB of constants — the remote-compile tunnel rejects
    huge programs, CLAUDE.md).
    """
    from bodyfitting_tpu.ops.pallas_kernels import (
        _raster_attr_pack,
        auto_rasterize_attrs,
        rasterize_attrs_prepacked,
    )

    if packed:
        # packed_glue: one vmapped pass builds EVERY pose's SoA-packed
        # operands (project + y-sort + pack runs as parallel XLA over the
        # chunk), then the sequential lax.map holds only the two Pallas
        # kernel launches + texture sampling per pose.
        fb = max(face_block, 512)
        interp = jax.default_backend() != "tpu"

        def prog(poses, K, scan_v, scan_f, scan_uv, scan_t,
                 smpl_v, smpl_f, smpl_uv):
            def glue(w2c):
                s_px, s_fz = rz.project_faces(scan_v, scan_f, w2c, K)
                s_soa, s_blk, _ = _raster_attr_pack(s_px, s_fz, scan_uv,
                                                    fb)
                px, fz = rz.project_faces(smpl_v, smpl_f, w2c, K)
                soa, blk, _ = _raster_attr_pack(px, fz, smpl_uv, fb)
                return s_soa, s_blk, soa, blk

            packed_ops = jax.vmap(glue)(poses)

            def kern(ops):
                s_soa, s_blk, soa, blk = ops
                s_uv, s_fidx, _ = rasterize_attrs_prepacked(
                    s_soa, s_blk, img_size, n_attr=2, interpret=interp
                )
                scan_img = rz.sample_texture_uvmap(
                    s_uv, s_fidx >= 0, scan_t, background=1.0
                )
                uv_map, fidx, _ = rasterize_attrs_prepacked(
                    soa, blk, img_size, n_attr=2, interpret=interp
                )
                return scan_img, uv_map, fidx >= 0

            return jax.lax.map(kern, packed_ops)

        return jax.jit(prog)

    def maps_for_pose(w2c, K, scan_v, scan_f, scan_uv, scan_t,
                      smpl_v, smpl_f, smpl_uv):
        s_px, s_fz = rz.project_faces(scan_v, scan_f, w2c, K)
        s_uv, s_fidx, _ = auto_rasterize_attrs(
            s_px, s_fz, scan_uv, img_size, face_block=face_block
        )
        scan_img = rz.sample_texture_uvmap(
            s_uv, s_fidx >= 0, scan_t, background=1.0
        )
        px, fz = rz.project_faces(smpl_v, smpl_f, w2c, K)
        uv_map, fidx, _ = auto_rasterize_attrs(
            px, fz, smpl_uv, img_size, face_block=face_block
        )
        return scan_img, uv_map, fidx >= 0

    return jax.jit(
        lambda poses, K, *scene: jax.lax.map(
            lambda w2c: maps_for_pose(w2c, K, *scene), poses
        )
    )


@functools.lru_cache(maxsize=None)
def _plan_build_program(tex_size: int, chunk: int, window_rows: int):
    """Jitted vmapped device plan build, cached per static config."""
    return jax.jit(jax.vmap(
        lambda um, fg, si: uvs.build_uv_sample_plan_device(
            um, fg, si, tex_size, background=1.0,
            chunk=chunk, window_rows=window_rows,
        )
    ))


def atlas_coverage_mask(
    face_uvs: jnp.ndarray, tex_img_size: int, face_block: int = 256
) -> jnp.ndarray:
    """[S, S] float mask of texels covered by any UV triangle.

    The UV-space analogue of the reference's render_texture depth-validity
    mask (texture_fitting.py:154-156).
    """
    raster = rasterize_uv_atlas(face_uvs, tex_img_size, face_block)
    return rz.render_silhouette(raster)


def rasterize_uv_atlas(
    face_uvs: jnp.ndarray, tex_img_size: int, face_block: int = 256
):
    """Rasterize UV triangles in atlas space (UV v-up -> texel row 0 =
    top, same mapping as ``sample_texture``).  Shared by the coverage
    mask and displacement baking so callers rasterize the atlas once."""
    S = tex_img_size
    px = jnp.stack(
        [face_uvs[..., 0] * (S - 1), (1.0 - face_uvs[..., 1]) * (S - 1)],
        axis=-1,
    )
    fz = jnp.ones(face_uvs.shape[:2])
    return rz.rasterize(px, fz, S, face_block=face_block)


def bake_displacement_map(
    face_uvs: jnp.ndarray,
    faces: jnp.ndarray,
    displacement: jnp.ndarray,
    tex_img_size: int,
    face_block: int = 256,
    raster=None,
):
    """Bake per-vertex SMPL+D displacements into a UV-space map.

    Working implementation of the capability the reference ships disabled
    (texture_fitting.py:303-307 commented out; renderer.py:349-447
    ``render_displacement`` is unreachable dead code): rasterize the UV
    triangles in atlas space and barycentric-interpolate the per-vertex
    displacement vectors.

    Args:
      face_uvs: ``[F, 3, 2]`` per-corner UVs (v up).
      faces: ``[F, 3]`` vertex ids.
      displacement: ``[V, 3]`` per-vertex offsets (smpl+d minus smpl).
      raster: optional precomputed :func:`rasterize_uv_atlas` output.
    Returns:
      ``(map [S, S, 3] float signed displacements, coverage [S, S])``.
    """
    if raster is None:
        raster = rasterize_uv_atlas(face_uvs, tex_img_size, face_block)
    corner_disp = displacement[faces]                      # [F, 3, 3]
    dis_map = rz.render_attributes(raster, corner_disp)
    return dis_map, rz.render_silhouette(raster)


def displacement_map_to8b(dis_map: np.ndarray, coverage: np.ndarray):
    """Signed displacement map -> uint8 image, 0.5 = zero displacement.

    Scaled by the RMS displacement *about zero* (not std about the mean:
    a constant or non-zero-mean field must land mid-range, not saturate;
    the reference's to8b path was never finished — its dead code stops
    after computing a per-channel std)."""
    dis = np.asarray(dis_map, np.float32)
    cov = np.asarray(coverage) > 0.5
    if cov.any():
        rms = np.sqrt((dis[cov].reshape(-1, 3) ** 2).mean(0)) + 1e-9
    else:
        rms = np.ones(3, np.float32)
    img = 0.5 + dis / (6.0 * rms)
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def fill_texture_holes(
    texture: np.ndarray, coverage: np.ndarray, iterations: int = 1
) -> np.ndarray:
    """Erode/dilate seam fill (reference render_texture_map morphology,
    texture_fitting.py:154-161)."""
    import cv2

    img = np.asarray(texture)
    valid = (np.asarray(coverage) > 0.5).astype(np.uint8)[..., None]
    kernel = np.ones((3, 3), np.uint8)
    valid_d = cv2.dilate(valid, kernel, iterations=iterations)[..., None]
    img_e = cv2.erode(img, kernel, iterations=iterations)
    return (valid_d - valid) * img_e + valid * img + (1 - valid_d) * img_e


def inpaint_unseen(
    texture: np.ndarray,
    unseen_mask: np.ndarray,
    iterations: int = 200,
) -> np.ndarray:
    """Diffusion inpainting of unseen atlas regions.

    Stand-in for the reference's optional LBAM network inpainting
    (texture_fitting.py:191-218, models/inpaint.py): iterative neighbour
    averaging propagates seen colours into masked texels.  Deterministic,
    dependency-free, and adequate for the small unseen UV islands.
    """
    img = np.asarray(texture, np.float32).copy()
    m = np.asarray(unseen_mask, bool)
    if not m.any():
        return img
    for _ in range(iterations):
        blur = (
            np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        ) / 4.0
        img[m] = blur[m]
    return img


def render_compare(
    smpl_mesh,
    scan_mesh,
    out_dir: str,
    viewnum: int = 36,
    imgsize: int = 512,
    write_video: bool = True,
    face_block: int = 512,
):
    """Side-by-side ring-view renders of the fitted mesh vs the scan.

    Reference render_compare (texture_fitting.py:119-147): per view a
    ``[scan | fitted]`` image written as ``%04d.png``, plus an mp4 when
    imageio's ffmpeg is available.  Each mesh is a tuple
    ``(verts, faces, face_uvs, texture)``.
    """
    import os

    import imageio.v2 as imageio
    import jax.numpy as _jnp

    os.makedirs(out_dir, exist_ok=True)
    sv = np.asarray(scan_mesh[0])
    center, _, dist = scene_bounds(sv)
    poses = ring_poses(center, viewnum, dist)
    K = jnp.asarray(default_K(imgsize))

    frames = []
    for i, w2c in enumerate(poses):
        w2c_j = _jnp.asarray(w2c)
        imgs = []
        for verts, faces, face_uvs, tex in (scan_mesh, smpl_mesh):
            img, _ = render_textured(
                _jnp.asarray(verts), _jnp.asarray(faces),
                _jnp.asarray(face_uvs), _jnp.asarray(tex),
                w2c_j, K, imgsize, face_block,
            )
            imgs.append(
                (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
            )
        frame = np.hstack(imgs)
        imageio.imwrite(os.path.join(out_dir, f"{i:04d}.png"), frame)
        frames.append(frame)
    if write_video:
        try:
            imageio.mimwrite(
                os.path.join(out_dir, "video.mp4"), frames, fps=10
            )
        except Exception:
            pass  # no ffmpeg plugin: stills are enough
    return frames
