"""Decompose the texture-fit unique-pose map-build wall (BENCH_NOTES
"remaining lever": ~110 ms/pose against a ~9 ms raster kernel).

Each stage variant runs as ONE jitted ``lax.map`` over a chunk of poses
(the production shape, fitting/texture.py map_chunk) with per-launch
camera perturbation and a host fetch of a scalar, per the tunnel timing
protocol (bench_common).  Stages nest, so stage N - stage N-1 isolates
one component:

  raster      project_faces + Pallas z-buffer (depth/fidx only)
  +bary       rasterize_pallas (adds the winning-face bary gather post-pass)
  +uvinterp   adds interpolate_uvs (face_uvs[idx] gather + einsum)
  +sample     adds bilinear_sample_uv into the 1024^2 texture (4 taps)
  scanrender  full render_textured of the scan (what maps_for_pose does
              for the scan image)
  maps        full maps_for_pose (scan render + smpl raster + smpl uvs)
  planbuild   vmapped build_uv_sample_plan_device over the chunk

Usage: python bench_texfit_maps.py [--big] [--chunk 16]
  --big uses SMPL-X-sized meshes (10475v/20908f smpl, 40k-face scan)
  instead of the bench_configs 5b sphere (2000v/~4k faces).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from bench_common import timed_launches
from bodyfitting_tpu.ops import rasterize as rz
from bodyfitting_tpu.ops import uv_sample as uvs
from bodyfitting_tpu.ops.pallas_kernels import auto_rasterize
from bodyfitting_tpu.fitting import texture as texfit


def sphere_mesh(n, seed=0):
    rng = np.random.default_rng(seed)
    sph = rng.normal(size=(n, 3))
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    from scipy.spatial import ConvexHull

    f = ConvexHull(sph).simplices.astype(np.int32)
    v = sph.astype(np.float32)
    uu = 0.5 + np.arctan2(v[:, 2], v[:, 0]) / (2 * np.pi)
    vv = 0.5 + np.arcsin(np.clip(v[:, 1], -1, 1)) / np.pi
    fuv = np.stack(
        [np.stack([uu[f[:, i]], vv[f[:, i]]], -1) for i in range(3)], 1
    ).astype(np.float32)
    return v, f, fuv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--tex", type=int, default=1024)
    cli = ap.parse_args()

    rng = np.random.default_rng(0)
    if cli.big:
        sv, sf, suv = sphere_mesh(20000, 1)     # ~40k-face scan
        mv, mf, muv = sphere_mesh(10475, 2)     # SMPL-X-sized
    else:
        sv, sf, suv = sphere_mesh(2000, 1)      # bench_configs 5b shape
        mv, mf, muv = sv, sf, suv
    scan_tex = rng.uniform(size=(cli.tex, cli.tex, 3)).astype(np.float32)

    center, _, dist = texfit.scene_bounds(sv)
    poses = texfit.ring_poses(center, cli.chunk, dist)
    K = jnp.asarray(texfit.default_K(cli.img))
    print(f"scan {sv.shape[0]}v/{sf.shape[0]}f, smpl {mv.shape[0]}v/"
          f"{mf.shape[0]}f, {cli.chunk} poses/launch, {cli.img}^2 renders")

    scene = tuple(map(jnp.asarray, (sv, sf, suv, scan_tex, mv, mf, muv)))
    poses_j = jnp.asarray(poses)

    def perturb(w2cs, off):
        # tiny camera translation so no two launches share inputs
        return w2cs.at[:, :3, 3].add(off * 1e-4)

    def stage_raster(w2c, scan_v, scan_f, *_):
        px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
        from bodyfitting_tpu.ops.pallas_kernels import rasterize_zbuf

        depth, fidx = rasterize_zbuf(px, fz, cli.img, face_block=512)
        return depth.sum() + fidx.sum()

    def stage_bary(w2c, scan_v, scan_f, *_):
        px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
        r = auto_rasterize(px, fz, cli.img)
        return r.depth.sum() + r.bary.sum()

    def stage_uvinterp(w2c, scan_v, scan_f, scan_uv, *_):
        px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
        r = auto_rasterize(px, fz, cli.img)
        uv = rz.interpolate_uvs(r, scan_uv)
        return r.depth.sum() + uv.sum()

    def stage_sample(w2c, scan_v, scan_f, scan_uv, scan_t, *_):
        px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
        r = auto_rasterize(px, fz, cli.img)
        uv = rz.interpolate_uvs(r, scan_uv)
        img = rz.sample_texture_uvmap(uv, r.face_idx >= 0, scan_t, 1.0)
        return img.sum()

    def stage_scanrender(w2c, scan_v, scan_f, scan_uv, scan_t, *_):
        img, _ = texfit.render_textured(
            scan_v, scan_f, scan_uv, scan_t, w2c, K, cli.img
        )
        return img.sum()

    def stage_maps(w2c, scan_v, scan_f, scan_uv, scan_t,
                   smpl_v, smpl_f, smpl_uv):
        img, _ = texfit.render_textured(
            scan_v, scan_f, scan_uv, scan_t, w2c, K, cli.img
        )
        px, fz = rz.project_faces(smpl_v, smpl_f, w2c, K)
        r = auto_rasterize(px, fz, cli.img)
        uv = rz.interpolate_uvs(r, smpl_uv)
        return img.sum() + uv.sum() + (r.face_idx >= 0).sum()

    def stage_maps_fused(w2c, scan_v, scan_f, scan_uv, scan_t,
                         smpl_v, smpl_f, smpl_uv):
        from bodyfitting_tpu.ops.pallas_kernels import auto_rasterize_attrs

        s_px, s_fz = rz.project_faces(scan_v, scan_f, w2c, K)
        s_uv, s_fidx, _ = auto_rasterize_attrs(
            s_px, s_fz, scan_uv, cli.img
        )
        img = rz.sample_texture_uvmap(s_uv, s_fidx >= 0, scan_t, 1.0)
        px, fz = rz.project_faces(smpl_v, smpl_f, w2c, K)
        uv, fidx, _ = auto_rasterize_attrs(px, fz, smpl_uv, cli.img)
        return img.sum() + uv.sum() + (fidx >= 0).sum()

    def stage_fusedraster(w2c, scan_v, scan_f, scan_uv, *_):
        from bodyfitting_tpu.ops.pallas_kernels import auto_rasterize_attrs

        px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
        uv, fidx, _ = auto_rasterize_attrs(px, fz, scan_uv, cli.img)
        return uv.sum() + (fidx >= 0).sum()

    # --- fused-raster glue attribution (r5): the fused raster is
    # project + y-argsort + SoA pack + kernel inside lax.map; stage
    # differences isolate each.  "packedmaps" is the production
    # candidate: glue vmapped across the chunk (parallel XLA) with only
    # the kernel left inside the sequential pose map.
    from bodyfitting_tpu.ops.pallas_kernels import (
        _raster_attr_pack, rasterize_attrs_prepacked,
    )

    def stage_proj(w2c, scan_v, scan_f, *_):
        px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
        return px.sum() + fz.sum()

    def stage_sort(w2c, scan_v, scan_f, *_):
        px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
        order = jnp.argsort(px[:, :, 1].mean(axis=1))
        return px.sum() + fz.sum() + order.sum()

    def stage_pack(w2c, scan_v, scan_f, scan_uv, *_):
        px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
        soa, blk_y, order = _raster_attr_pack(px, fz, scan_uv, 512)
        return soa.sum() + blk_y.sum() + order.sum()

    def packed_raster_chunk(w2cs, scan_v, scan_f, scan_uv):
        """vmap the glue across poses, lax.map only the kernel."""
        def glue(w2c):
            px, fz = rz.project_faces(scan_v, scan_f, w2c, K)
            soa, blk_y, _ = _raster_attr_pack(px, fz, scan_uv, 512)
            return soa, blk_y

        soas, blks = jax.vmap(glue)(w2cs)
        return jax.lax.map(
            lambda sb: rasterize_attrs_prepacked(
                sb[0], sb[1], cli.img, n_attr=2
            ),
            (soas, blks),
        )

    stages = [
        ("raster", stage_raster),
        ("+bary", stage_bary),
        ("+uvinterp", stage_uvinterp),
        ("+sample", stage_sample),
        ("scanrender", stage_scanrender),
        ("maps(full)", stage_maps),
        ("proj", stage_proj),
        ("+sort", stage_sort),
        ("+pack", stage_pack),
        ("fusedraster", stage_fusedraster),
        ("maps(fused)", stage_maps_fused),
    ]
    results = {}
    for name, fn in stages:
        f = jax.jit(
            lambda w2cs, *scn, fn=fn: jax.lax.map(
                lambda w: fn(w, *scn), w2cs
            ).sum()
        )

        def run(off, f=f):
            float(f(perturb(poses_j, off), *scene))

        res = timed_launches(run, warmups=2, runs=3)
        per = res.median / cli.chunk * 1e3
        results[name] = per
        print(f"  {name:12s} {per:7.1f} ms/pose  (launch {res.median:.3f}s,"
              f" compile {res.first:.0f}s)")

    # packed-glue fused raster (not a per-pose lambda: the vmap spans the
    # chunk, so it gets its own timed program)
    f_packed = jax.jit(
        lambda w2cs, *scn: sum(
            x.sum() for x in packed_raster_chunk(w2cs, *scn[:3])
        )
    )

    def run_packed(off):
        float(f_packed(perturb(poses_j, off), *scene))

    res_p = timed_launches(run_packed, warmups=2, runs=3)
    print(f"  packedraster {res_p.median / cli.chunk * 1e3:7.1f} ms/pose  "
          f"(launch {res_p.median:.3f}s, compile {res_p.first:.0f}s)")

    # plan build over the chunk (needs maps first, built once outside)
    maps_jit = jax.jit(
        lambda w2cs, *scn: jax.lax.map(
            lambda w: (
                texfit.render_textured(*scn[:4], w, K, cli.img)[0],
                rz.interpolate_uvs(
                    auto_rasterize(
                        *rz.project_faces(scn[4], scn[5], w, K), cli.img
                    ),
                    scn[6],
                ),
                auto_rasterize(
                    *rz.project_faces(scn[4], scn[5], w, K), cli.img
                ).face_idx
                >= 0,
            ),
            w2cs,
        )
    )
    build = jax.jit(
        jax.vmap(
            lambda um, fg, si: uvs.build_uv_sample_plan_device(
                um, fg, si, cli.tex, background=1.0
            )
        )
    )

    def run_build(off):
        si, um, fg = maps_jit(perturb(poses_j, off), *scene)
        p = build(um, fg, si)
        float(p.wx.sum())

    res_maps = timed_launches(
        lambda off: [float(x.sum()) for x in
                     maps_jit(perturb(poses_j, off), *scene)][0],
        warmups=2, runs=3,
    )
    res_b = timed_launches(run_build, warmups=2, runs=3)
    per_b = (res_b.median - res_maps.median) / cli.chunk * 1e3
    print(f"  planbuild    {per_b:7.1f} ms/pose  (differenced; maps+build "
          f"launch {res_b.median:.3f}s)")


if __name__ == "__main__":
    main()
