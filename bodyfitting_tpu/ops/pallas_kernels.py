"""Pallas TPU kernels for the two hot geometry ops.

These are the TPU-native replacements for the reference's CUDA kernels:

  * ``nearest_d2_idx`` — point-to-mesh nearest query
    (vs mesh_grid_kernel.cu:240-353's expanding-ring grid walk).  The TPU
    formulation is a dense sweep: grid = (query tiles x face blocks), each
    program computes a [TQ, FB] block of point-triangle squared distances
    on the VPU and folds it into per-query running minima kept in the
    output block, which stays VMEM-resident across the face sweep (the
    face-block grid axis is innermost and its output index map is
    constant).
  * ``rasterize_zbuf`` — z-buffer rasterization
    (vs rasterize_cuda_kernel.cu:70-169's per-pixel brute force).  Grid =
    (pixel tiles x face blocks); each program tests a [TP, FB] block of
    pixel/face coverage and folds perspective-correct depths into the
    per-pixel min-depth + argmin face index accumulators.

Both kernels return only (d2/depth, winning index); winning-face payloads
(closest point, barycentrics) are recomputed outside by O(Q) gathers —
cheaper than carrying them through the sweep.

Data layouts are struct-of-arrays with the face axis on lanes
([9, F] component rows), so every op is a full-width VPU op with no
3-wide trailing dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e30


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# Nearest point-on-mesh
# ---------------------------------------------------------------------------


def _nearest_kernel(tile_aabb_ref, blk_aabb_ref, tile_ub_ref, q_ref,
                    tri_ref, d2_ref, idx_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    fb = tri_ref.shape[1]

    @pl.when(j == 0)
    def _():
        d2_ref[:] = jnp.full_like(d2_ref, _FAR)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # block cull: squared AABB-AABB distance vs the tile's upper bound
    # (a sampled-face prepass guarantees every query in the tile has a
    # neighbour within sqrt(ub), so farther blocks cannot win)
    d2_lb = jnp.zeros((), jnp.float32)
    for a in range(3):
        gap = jnp.maximum(
            jnp.maximum(
                blk_aabb_ref[j, a] - tile_aabb_ref[i, a + 3],
                tile_aabb_ref[i, a] - blk_aabb_ref[j, a + 3],
            ),
            0.0,
        )
        d2_lb = d2_lb + gap * gap

    @pl.when(d2_lb <= tile_ub_ref[i, 0])
    def _body():
        _nearest_block(q_ref, tri_ref, d2_ref, idx_ref, j, fb)


def _nearest_block(q_ref, tri_ref, d2_ref, idx_ref, j, fb):
    dist2 = _block_dist2(q_ref, tri_ref)                  # [TQ, FB]

    arg = jnp.argmin(dist2, axis=1)                       # [TQ]
    mind2 = jnp.min(dist2, axis=1)                        # [TQ]
    cur = d2_ref[:, 0]
    better = mind2 < cur
    d2_ref[:, 0] = jnp.where(better, mind2, cur)
    idx_ref[:, 0] = jnp.where(
        better, j * fb + arg.astype(jnp.int32), idx_ref[:, 0]
    )


def _block_dist2(q_ref, tri_ref):
    """[TQ, FB] point-triangle squared distances (shared by the min and
    tie-break passes so both see bit-identical values)."""
    px = q_ref[:, 0:1]                 # [TQ, 1]
    py = q_ref[:, 1:2]
    pz = q_ref[:, 2:3]

    ax, ay, az = tri_ref[0:1, :], tri_ref[1:2, :], tri_ref[2:3, :]
    bx, by, bz = tri_ref[3:4, :], tri_ref[4:5, :], tri_ref[5:6, :]
    cx, cy, cz = tri_ref[6:7, :], tri_ref[7:8, :], tri_ref[8:9, :]

    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx - ax, cy - ay, cz - az

    apx, apy, apz = px - ax, py - ay, pz - az            # [TQ, FB]
    d1 = abx * apx + aby * apy + abz * apz
    d2_ = acx * apx + acy * apy + acz * apz
    bpx, bpy, bpz = px - bx, py - by, pz - bz
    d3 = abx * bpx + aby * bpy + abz * bpz
    d4 = acx * bpx + acy * bpy + acz * bpz
    cpx, cpy, cpz = px - cx, py - cy, pz - cz
    d5 = abx * cpx + aby * cpy + abz * cpz
    d6 = acx * cpx + acy * cpy + acz * cpz

    va = d3 * d6 - d5 * d4
    vb = d5 * d2_ - d1 * d6
    vc = d1 * d4 - d3 * d2_

    def safe_div(num, den):
        return num / jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)

    # candidate points per Voronoi region (same math as ops.nearest)
    t_ab = jnp.clip(safe_div(d1, d1 - d3), 0.0, 1.0)
    t_ac = jnp.clip(safe_div(d2_, d2_ - d6), 0.0, 1.0)
    t_bc = jnp.clip(safe_div(d4 - d3, (d4 - d3) + (d5 - d6)), 0.0, 1.0)
    denom = safe_div(jnp.ones_like(va), va + vb + vc)
    v = vb * denom
    w = vc * denom

    def sel(cond, tx, ty, tz, ox, oy, oz):
        return (
            jnp.where(cond, tx, ox),
            jnp.where(cond, ty, oy),
            jnp.where(cond, tz, oz),
        )

    ox = ax + abx * v + acx * w
    oy = ay + aby * v + acy * w
    oz = az + abz * v + acz * w
    cond_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)
    ox, oy, oz = sel(cond_bc, bx + t_bc * (cx - bx), by + t_bc * (cy - by),
                     bz + t_bc * (cz - bz), ox, oy, oz)
    cond_ac = (vb <= 0) & (d2_ >= 0) & (d6 <= 0)
    ox, oy, oz = sel(cond_ac, ax + t_ac * acx, ay + t_ac * acy,
                     az + t_ac * acz, ox, oy, oz)
    cond_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    ox, oy, oz = sel(cond_ab, ax + t_ab * abx, ay + t_ab * aby,
                     az + t_ab * abz, ox, oy, oz)
    ox, oy, oz = sel((d6 >= 0) & (d5 <= d6), cx, cy, cz, ox, oy, oz)
    ox, oy, oz = sel((d3 >= 0) & (d4 <= d3), bx, by, bz, ox, oy, oz)
    ox, oy, oz = sel((d1 <= 0) & (d2_ <= 0), ax, ay, az, ox, oy, oz)

    return (px - ox) ** 2 + (py - oy) ** 2 + (pz - oz) ** 2  # [TQ, FB]


_BIG_IDX = 2**30    # python int: a jnp scalar would be captured as a
                    # pallas constant (must be passed as input)


def _nearest_tie_kernel(tile_aabb_ref, blk_aabb_ref, tile_ub_ref, q_ref,
                        thr_ref, tri_ref, orig_ref, low_ref):
    """Lowest ORIGINAL face index whose distance^2 <= the per-query
    threshold — the second pass of ops.nearest's tie-break rule, with the
    same AABB block cull as the min pass (the winning block always has
    d2_lb <= d2min <= thresh, so it is never culled)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        low_ref[:] = jnp.full_like(low_ref, _BIG_IDX)

    d2_lb = jnp.zeros((), jnp.float32)
    for a in range(3):
        gap = jnp.maximum(
            jnp.maximum(
                blk_aabb_ref[j, a] - tile_aabb_ref[i, a + 3],
                tile_aabb_ref[i, a] - blk_aabb_ref[j, a + 3],
            ),
            0.0,
        )
        d2_lb = d2_lb + gap * gap

    @pl.when(d2_lb <= tile_ub_ref[i, 0])
    def _body():
        dist2 = _block_dist2(q_ref, tri_ref)              # [TQ, FB]
        cand = jnp.where(
            dist2 <= thr_ref[:, 0:1], orig_ref[0:1, :], _BIG_IDX
        )
        low_ref[:, 0] = jnp.minimum(low_ref[:, 0], cand.min(axis=1))


def _morton_codes(pts: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """30-bit Morton codes for 3D points (10 bits per axis)."""
    g = jnp.clip(
        (pts - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0, 0.0, 1023.0
    ).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return (
        spread(g[:, 0]) | (spread(g[:, 1]) << 1) | (spread(g[:, 2]) << 2)
    )


def build_nearest_index(tri: jax.Array):
    """Precompute the Morton-sorted face data + per-block AABBs.

    Returns ``(tri_sorted [F,3,3], order [F], lo [3], hi [3])`` — reuse
    across many queries against the same mesh (e.g. SDF volume builds).
    """
    centroid = tri.mean(axis=1)
    lo = centroid.min(0)
    hi = centroid.max(0)
    order = jnp.argsort(_morton_codes(centroid, lo, hi))
    return tri[order], order, lo, hi


@functools.partial(
    jax.jit,
    static_argnames=(
        "query_tile", "face_block", "ub_samples", "interpret", "tie_break",
    ),
)
def nearest_d2_idx(
    points: jax.Array,
    tri: jax.Array,
    query_tile: int = 256,
    face_block: int = 512,
    ub_samples: int = 512,
    interpret: bool = False,
    index=None,
    tie_break: bool = False,
    tie_verts: jax.Array | None = None,
):
    """Min distance^2 + winning face index for each query.

    points ``[Q, 3]``, tri ``[F, 3, 3]``.  Returns ``(d2 [Q], idx [Q])``.

    Faces are Morton-sorted so face blocks have tight 3D AABBs; a
    sampled-face prepass gives each query tile a distance upper bound,
    and the kernel skips any block whose AABB lies beyond it.  Pass a
    prebuilt ``index`` (:func:`build_nearest_index`) to skip the sort.

    ``tie_break=True`` runs a second culled pass applying
    ``ops.nearest``'s implementation-independent tie rule (lowest
    original face index within ``tie_threshold`` of the minimum;
    ``tie_verts`` supplies the bbox for the threshold's absolute term,
    defaulting to the triangle vertices).  Both passes share
    ``_block_dist2`` so the tie set is evaluated on bit-identical
    distances.
    """
    from bodyfitting_tpu.ops.nearest import closest_point_on_triangles

    Q = points.shape[0]
    F = tri.shape[0]
    qt = _cdiv(Q, query_tile)
    fb = _cdiv(F, face_block)
    qpad = qt * query_tile - Q
    fpad = fb * face_block - F

    # Morton-sort faces by centroid AND queries, so both query tiles and
    # face blocks have tight AABBs (the cull needs both)
    if index is None:
        tri_s, order, lo, hi = build_nearest_index(tri)
    else:
        tri_s, order, lo, hi = index
    q_order = jnp.argsort(_morton_codes(points, lo, hi))
    points = points[q_order]

    # per-tile upper bound: exact distance to a strided face subsample
    stride = max(1, F // ub_samples)
    samp = tri_s[::stride]
    cp = closest_point_on_triangles(
        points[:, None, :], samp[None, :, 0], samp[None, :, 1],
        samp[None, :, 2],
    )
    ub_q = jnp.min(
        jnp.sum((points[:, None, :] - cp) ** 2, -1), axis=1
    )                                                      # [Q]
    if qpad:
        points = jnp.concatenate(
            [points, jnp.zeros((qpad, 3), points.dtype)]
        )
        # padded queries inherit a tiny bound so they never block culling
        ub_q = jnp.concatenate([ub_q, jnp.zeros((qpad,), ub_q.dtype)])
    tile_ub = ub_q.reshape(qt, query_tile).max(1)[:, None] * (1 + 1e-5)

    tile_pts = points.reshape(qt, query_tile, 3)
    tile_aabb = jnp.concatenate(
        [tile_pts.min(1), tile_pts.max(1)], axis=1
    )                                                      # [qt, 6]

    soa = tri_s.reshape(F, 9).T                            # [9, F]
    blk_min = tri_s.min(axis=1)                            # [F, 3]
    blk_max = tri_s.max(axis=1)
    if fpad:
        soa = jnp.concatenate(
            [soa, jnp.full((9, fpad), 1e15, soa.dtype)], axis=1
        )
        blk_min = jnp.concatenate(
            [blk_min, jnp.full((fpad, 3), 1e15, blk_min.dtype)]
        )
        blk_max = jnp.concatenate(
            [blk_max, jnp.full((fpad, 3), 1e15, blk_max.dtype)]
        )
    blk_aabb = jnp.concatenate(
        [
            blk_min.reshape(fb, face_block, 3).min(1),
            blk_max.reshape(fb, face_block, 3).max(1),
        ],
        axis=1,
    )                                                      # [fb, 6]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,       # tile_aabb, blk_aabb, tile_ub
        grid=(qt, fb),
        in_specs=[
            pl.BlockSpec((query_tile, 3), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, face_block), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    d2, idx = pl.pallas_call(
        _nearest_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qt * query_tile, 1), points.dtype),
            jax.ShapeDtypeStruct((qt * query_tile, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_aabb, blk_aabb, tile_ub, points, soa)
    inv_q = jnp.argsort(q_order)
    if not tie_break:
        # undo both sorts: face ids back to caller numbering, results
        # back to the caller's query order
        idx = order.astype(jnp.int32)[idx[:Q, 0]]
        return d2[:Q, 0][inv_q], idx[inv_q]

    from bodyfitting_tpu.ops.nearest import tie_threshold

    tv = tie_verts if tie_verts is not None else tri.reshape(-1, 3)
    thr = tie_threshold(d2[:, 0], tv)                      # [qt*QT]
    if qpad:
        # padded queries match nothing (their thresh is driven by the
        # zero-point distances; force-exclude them instead)
        thr = thr.at[Q:].set(-1.0)
    tile_thr = thr.reshape(qt, query_tile).max(1)[:, None]
    orig = order.astype(jnp.int32)[None, :]                # [1, F]
    if fpad:
        orig = jnp.concatenate(
            [orig, jnp.full((1, fpad), _BIG_IDX, jnp.int32)], axis=1
        )
    tie_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(qt, fb),
        in_specs=[
            pl.BlockSpec((query_tile, 3), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, face_block), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, face_block), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (low,) = pl.pallas_call(
        _nearest_tie_kernel,
        grid_spec=tie_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qt * query_tile, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_aabb, blk_aabb, tile_thr, points, thr[:, None], soa, orig)
    # the min face always satisfies d2 <= thresh, so the tie pass alone
    # determines the index; clamp guards the (impossible) all-culled case
    idx_tb = jnp.minimum(low[:Q, 0], order.astype(jnp.int32)[idx[:Q, 0]])
    return d2[:Q, 0][inv_q], idx_tb[inv_q]


def tris_to_soa(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """``[V,3]`` + ``[F,3]`` -> ``[9, F]`` component rows."""
    tri = verts[faces]                                    # [F, 3, 3]
    return tri.reshape(tri.shape[0], 9).T


@functools.partial(
    jax.jit,
    static_argnames=("query_tile", "face_block", "interpret", "tie_break"),
)
def nearest_point_on_mesh_pallas(
    points: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    query_tile: int = 256,
    face_block: int = 512,
    interpret: bool = False,
    tie_break: bool = False,
):
    """Drop-in Pallas version of ``ops.nearest.nearest_point_on_mesh``.

    ``tie_break=True`` applies the same implementation-independent tie
    rule (lowest face index within the rounding band, point recomputed
    on the tie-broken face) so the result matches the XLA sweep's — the
    AABB-culled replacement for the exact in-fit mesh term, which the
    XLA version evaluates as TWO full O(Q*F) sweeps per iteration.
    """
    from bodyfitting_tpu.ops.nearest import closest_point_on_triangles

    d2, idx = nearest_d2_idx(
        points, verts[faces], query_tile=query_tile,
        face_block=face_block, interpret=interpret,
        tie_break=tie_break, tie_verts=verts,
    )
    tri = verts[faces[idx]]                               # [Q, 3, 3]
    pt = closest_point_on_triangles(
        points, tri[:, 0], tri[:, 1], tri[:, 2]
    )
    return pt, idx, d2


# ---------------------------------------------------------------------------
# Z-buffer rasterization
# ---------------------------------------------------------------------------


def _raster_kernel(tile_y_ref, blk_y_ref, pix_x_ref, pix_y_ref, face_ref,
                   depth_ref, fidx_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    fb = face_ref.shape[1]

    @pl.when(j == 0)
    def _():
        depth_ref[:] = jnp.full_like(depth_ref, _FAR)
        fidx_ref[:] = jnp.full_like(fidx_ref, -1)

    # spatial cull: faces are y-sorted, so whole blocks miss most tiles
    # (tile/block y-ranges come in via scalar prefetch)
    overlap = (blk_y_ref[j, 0] <= tile_y_ref[i, 1]) & (
        blk_y_ref[j, 1] >= tile_y_ref[i, 0]
    )

    @pl.when(overlap)
    def _body():
        _raster_block(pix_x_ref, pix_y_ref, face_ref, depth_ref, fidx_ref,
                      j, fb)


def _raster_block(pix_x_ref, pix_y_ref, face_ref, depth_ref, fidx_ref,
                  j, fb):
    px = pix_x_ref[:, 0:1]                                # [TP, 1]
    py = pix_y_ref[:, 0:1]

    ax, ay = face_ref[0:1, :], face_ref[1:2, :]
    bx, by = face_ref[2:3, :], face_ref[3:4, :]
    cx, cy = face_ref[4:5, :], face_ref[5:6, :]
    iz0, iz1, iz2 = face_ref[6:7, :], face_ref[7:8, :], face_ref[8:9, :]
    valid = face_ref[9:10, :] > 0.5

    e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)    # [TP, FB]
    e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
    e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
        (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
    )
    denom = jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
    w0, w1, w2 = e0 / denom, e1 / denom, e2 / denom
    inv_z = w0 * iz0 + w1 * iz1 + w2 * iz2
    depth = 1.0 / jnp.maximum(inv_z, 1.0 / _FAR)
    ok = inside & valid & (jnp.abs(area) > 1e-9)
    depth = jnp.where(ok, depth, _FAR)

    arg = jnp.argmin(depth, axis=1)
    dmin = jnp.min(depth, axis=1)
    cur = depth_ref[:, 0]
    better = dmin < cur
    depth_ref[:, 0] = jnp.where(better, dmin, cur)
    fidx_ref[:, 0] = jnp.where(
        better, j * fb + arg.astype(jnp.int32), fidx_ref[:, 0]
    )


@functools.partial(
    jax.jit, static_argnames=("image_size", "pixel_tile", "face_block",
                              "interpret")
)
def rasterize_zbuf(
    face_px: jax.Array,
    face_z: jax.Array,
    image_size: int,
    pixel_tile: int = 1024,
    face_block: int = 512,
    interpret: bool = False,
):
    """Pallas z-buffer pass: ``(depth [H,W], face_idx [H,W])``.

    face_px ``[F,3,2]`` screen coords, face_z ``[F,3]`` camera depths.
    """
    H = W = image_size
    F = face_px.shape[0]
    fb = _cdiv(F, face_block)
    fpad = fb * face_block - F

    # sort faces by y centroid: blocks become spatially coherent, so the
    # kernel's per-(tile, block) y-overlap cull skips most programs
    y_centroid = face_px[:, :, 1].mean(axis=1)
    order = jnp.argsort(y_centroid)
    face_px_s = face_px[order]
    face_z_s = face_z[order]

    eps = 1e-9
    front = (face_z_s > eps).all(axis=1)
    iz = 1.0 / jnp.maximum(face_z_s, eps)                 # [F, 3]
    soa = jnp.concatenate(
        [
            face_px_s[:, 0], face_px_s[:, 1], face_px_s[:, 2],
            iz,                                           # [F,3]
            front[:, None].astype(face_px.dtype),         # [F,1]
        ],
        axis=1,
    ).T                                                   # [10, F]
    # per-face y extent (invalid faces excluded from block ranges)
    fy_min = jnp.where(front, face_px_s[:, :, 1].min(1), jnp.inf)
    fy_max = jnp.where(front, face_px_s[:, :, 1].max(1), -jnp.inf)
    if fpad:
        pad = jnp.zeros((10, fpad), soa.dtype)
        soa = jnp.concatenate([soa, pad], axis=1)
        fy_min = jnp.concatenate([fy_min, jnp.full((fpad,), jnp.inf)])
        fy_max = jnp.concatenate([fy_max, jnp.full((fpad,), -jnp.inf)])
    blk_y = jnp.stack(
        [
            fy_min.reshape(fb, face_block).min(1),
            fy_max.reshape(fb, face_block).max(1),
        ],
        axis=1,
    ).astype(face_px.dtype)                               # [fb, 2]

    P = H * W
    pt = _cdiv(P, pixel_tile)
    ppad = pt * pixel_tile - P
    ys = jnp.repeat(jnp.arange(H, dtype=face_px.dtype), W) + 0.5
    xs = jnp.tile(jnp.arange(W, dtype=face_px.dtype), H) + 0.5
    if ppad:
        xs = jnp.concatenate([xs, jnp.full((ppad,), -1e6, xs.dtype)])
        ys = jnp.concatenate([ys, jnp.full((ppad,), -1e6, ys.dtype)])
    tile_y = jnp.stack(
        [
            ys.reshape(pt, pixel_tile).min(1),
            ys.reshape(pt, pixel_tile).max(1),
        ],
        axis=1,
    ).astype(face_px.dtype)                               # [pt, 2]
    xs = xs[:, None]
    ys = ys[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,       # tile_y, blk_y live in SMEM, full
        grid=(pt, fb),
        in_specs=[
            pl.BlockSpec((pixel_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pixel_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, face_block), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((pixel_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pixel_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    depth, fidx = pl.pallas_call(
        _raster_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pt * pixel_tile, 1), face_px.dtype),
            jax.ShapeDtypeStruct((pt * pixel_tile, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_y, blk_y, xs, ys, soa)
    depth = depth[:P, 0].reshape(H, W)
    fidx = fidx[:P, 0].reshape(H, W)
    # map sorted indices back to the caller's face numbering
    fidx = jnp.where(
        fidx >= 0, order.astype(jnp.int32)[jnp.maximum(fidx, 0)], -1
    )
    return depth, fidx


def auto_rasterize(face_px, face_z, image_size, face_block: int = 256):
    """Pallas z-buffer on TPU (3x the XLA scan), XLA path elsewhere."""
    if jax.default_backend() == "tpu":
        return rasterize_pallas(
            face_px, face_z, image_size, face_block=max(face_block, 512)
        )
    from bodyfitting_tpu.ops.rasterize import rasterize

    return rasterize(face_px, face_z, image_size, face_block=face_block)


# ---------------------------------------------------------------------------
# Fused z-buffer + attribute interpolation
# ---------------------------------------------------------------------------
#
# The texture-fit map builds (fitting/texture.py) used to run the z-buffer
# kernel and then recover per-pixel UVs with three post-pass gathers
# (winning-face px/z for barycentrics + face_uvs[idx]) — per-element
# 262k-row gathers, the known slow TPU lowering (BENCH_NOTES.md).  This
# kernel interpolates per-corner attributes INSIDE the sweep: the face
# block's attribute rows are already VMEM-resident, the winning face is
# selected with a dense one-hot multiply-reduce (no gather), and the
# perspective-correct weights reuse the depth math (pc_k = w_k * iz_k *
# depth).  Replaces the rasterize->interpolate path of the reference's
# NMR texture sampling (rasterize_cuda_kernel.cu:70-169 + the per-pixel
# weight recompute at 171-244) for static-geometry texture fitting.


def _raster_attr_kernel(tile_y_ref, blk_y_ref, pix_x_ref, pix_y_ref,
                        face_ref, depth_ref, fidx_ref, attr_ref, *,
                        n_attr):
    i = pl.program_id(0)
    j = pl.program_id(1)
    fb = face_ref.shape[1]

    @pl.when(j == 0)
    def _():
        depth_ref[:] = jnp.full_like(depth_ref, _FAR)
        fidx_ref[:] = jnp.full_like(fidx_ref, -1)
        attr_ref[:] = jnp.zeros_like(attr_ref)

    overlap = (blk_y_ref[j, 0] <= tile_y_ref[i, 1]) & (
        blk_y_ref[j, 1] >= tile_y_ref[i, 0]
    )

    @pl.when(overlap)
    def _body():
        px = pix_x_ref[:, 0:1]                            # [TP, 1]
        py = pix_y_ref[:, 0:1]

        ax, ay = face_ref[0:1, :], face_ref[1:2, :]
        bx, by = face_ref[2:3, :], face_ref[3:4, :]
        cx, cy = face_ref[4:5, :], face_ref[5:6, :]
        iz0, iz1, iz2 = (face_ref[6:7, :], face_ref[7:8, :],
                         face_ref[8:9, :])
        valid = face_ref[9:10, :] > 0.5

        e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)  # [TP, FB]
        e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | (
            (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        )
        denom = jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
        wiz0 = (e0 / denom) * iz0                         # w_k * (1/z_k)
        wiz1 = (e1 / denom) * iz1
        wiz2 = (e2 / denom) * iz2
        inv_z = wiz0 + wiz1 + wiz2
        depth = 1.0 / jnp.maximum(inv_z, 1.0 / _FAR)
        ok = inside & valid & (jnp.abs(area) > 1e-9)
        depth = jnp.where(ok, depth, _FAR)

        arg = jnp.argmin(depth, axis=1)                   # [TP]
        dmin = jnp.min(depth, axis=1)
        cur = depth_ref[:, 0]
        better = dmin < cur
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, depth.shape, 1)
            == arg[:, None]
        )
        # perspective-correct interpolation, winner selected by a dense
        # masked reduce (pc_k = wiz_k * depth; sum_k pc_k == 1 up to
        # rounding for real winners)
        cols = []
        for c in range(n_attr):
            a0 = face_ref[10 + c:11 + c, :]
            a1 = face_ref[10 + n_attr + c:11 + n_attr + c, :]
            a2 = face_ref[10 + 2 * n_attr + c:11 + 2 * n_attr + c, :]
            interp = wiz0 * a0 + wiz1 * a1 + wiz2 * a2    # [TP, FB]
            cols.append(
                (jnp.sum(jnp.where(onehot, interp, 0.0), axis=1)
                 * dmin)[:, None]
            )
        vals = jnp.concatenate(cols, axis=1)              # [TP, A]
        won = better & (dmin < _FAR)
        attr_ref[:] = jnp.where(won[:, None], vals, attr_ref[:])
        depth_ref[:, 0] = jnp.where(better, dmin, cur)
        fidx_ref[:, 0] = jnp.where(
            better, j * fb + arg.astype(jnp.int32), fidx_ref[:, 0]
        )


def _raster_attr_pack(face_px, face_z, face_attrs, face_block):
    """Per-pose glue of the fused raster: y-sort + SoA pack + block AABBs.

    Split out of :func:`rasterize_attrs_pallas` so multi-pose callers
    (fitting/texture.py map builds) can batch the glue across poses
    (``jax.vmap``) and stream the packed operands through
    :func:`rasterize_attrs_prepacked`.  Returns
    ``(soa [rows8, fb*face_block], blk_y [fb, 2], order [F])`` with
    ``rows8 = 8-ceil(10 + 3A)`` and faces y-centroid-sorted.
    """
    F = face_px.shape[0]
    A = int(face_attrs.shape[-1])
    fb = _cdiv(F, face_block)
    fpad = fb * face_block - F

    y_centroid = face_px[:, :, 1].mean(axis=1)
    order = jnp.argsort(y_centroid)
    face_px_s = face_px[order]
    face_z_s = face_z[order]
    attrs_s = face_attrs[order]

    eps = 1e-9
    front = (face_z_s > eps).all(axis=1)
    iz = 1.0 / jnp.maximum(face_z_s, eps)
    soa = jnp.concatenate(
        [
            face_px_s[:, 0], face_px_s[:, 1], face_px_s[:, 2],
            iz,
            front[:, None].astype(face_px.dtype),
            # corner-major attribute rows: row 10 + k*A + c
            attrs_s.reshape(F, 3 * A).astype(face_px.dtype),
        ],
        axis=1,
    ).T                                                   # [10 + 3A, F]
    rows = soa.shape[0]
    rpad = _cdiv(rows, 8) * 8 - rows
    fy_min = jnp.where(front, face_px_s[:, :, 1].min(1), jnp.inf)
    fy_max = jnp.where(front, face_px_s[:, :, 1].max(1), -jnp.inf)
    if fpad:
        soa = jnp.concatenate(
            [soa, jnp.zeros((rows, fpad), soa.dtype)], axis=1
        )
        fy_min = jnp.concatenate([fy_min, jnp.full((fpad,), jnp.inf)])
        fy_max = jnp.concatenate([fy_max, jnp.full((fpad,), -jnp.inf)])
    if rpad:
        soa = jnp.concatenate(
            [soa, jnp.zeros((rpad, soa.shape[1]), soa.dtype)]
        )
    blk_y = jnp.stack(
        [
            fy_min.reshape(fb, face_block).min(1),
            fy_max.reshape(fb, face_block).max(1),
        ],
        axis=1,
    ).astype(face_px.dtype)
    return soa, blk_y, order


@functools.partial(
    jax.jit, static_argnames=("image_size", "n_attr", "pixel_tile",
                              "interpret")
)
def rasterize_attrs_prepacked(
    soa: jax.Array,
    blk_y: jax.Array,
    image_size: int,
    n_attr: int,
    pixel_tile: int = 1024,
    interpret: bool = False,
):
    """Fused raster on PREPACKED operands (:func:`_raster_attr_pack`).

    Returns ``(attrs [H, W, A], face_idx [H, W], depth [H, W])`` with
    ``face_idx`` in the packed (y-sorted) numbering — apply the pack's
    ``order`` to recover caller face ids when needed.
    """
    H = W = image_size
    A = int(n_attr)
    rows8 = soa.shape[0]
    fb = blk_y.shape[0]
    face_block = soa.shape[1] // fb

    P = H * W
    pt = _cdiv(P, pixel_tile)
    ppad = pt * pixel_tile - P
    ys = jnp.repeat(jnp.arange(H, dtype=soa.dtype), W) + 0.5
    xs = jnp.tile(jnp.arange(W, dtype=soa.dtype), H) + 0.5
    if ppad:
        xs = jnp.concatenate([xs, jnp.full((ppad,), -1e6, xs.dtype)])
        ys = jnp.concatenate([ys, jnp.full((ppad,), -1e6, ys.dtype)])
    tile_y = jnp.stack(
        [
            ys.reshape(pt, pixel_tile).min(1),
            ys.reshape(pt, pixel_tile).max(1),
        ],
        axis=1,
    ).astype(soa.dtype)
    xs = xs[:, None]
    ys = ys[:, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(pt, fb),
        in_specs=[
            pl.BlockSpec((pixel_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pixel_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows8, face_block), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((pixel_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pixel_tile, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pixel_tile, A), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    depth, fidx, attr = pl.pallas_call(
        functools.partial(_raster_attr_kernel, n_attr=A),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pt * pixel_tile, 1), soa.dtype),
            jax.ShapeDtypeStruct((pt * pixel_tile, 1), jnp.int32),
            jax.ShapeDtypeStruct((pt * pixel_tile, A), soa.dtype),
        ],
        interpret=interpret,
    )(tile_y, blk_y, xs, ys, soa)
    return (
        attr[:P].reshape(H, W, A),
        fidx[:P, 0].reshape(H, W),
        depth[:P, 0].reshape(H, W),
    )


@functools.partial(
    jax.jit, static_argnames=("image_size", "pixel_tile", "face_block",
                              "interpret", "remap_faces")
)
def rasterize_attrs_pallas(
    face_px: jax.Array,
    face_z: jax.Array,
    face_attrs: jax.Array,
    image_size: int,
    pixel_tile: int = 1024,
    face_block: int = 512,
    interpret: bool = False,
    remap_faces: bool = False,
):
    """Fused z-buffer + perspective-correct attribute interpolation.

    Args:
      face_px: ``[F, 3, 2]`` screen coords; face_z ``[F, 3]`` camera z.
      face_attrs: ``[F, 3, A]`` per-corner attributes (e.g. UVs, A=2).
      remap_faces: map ``face_idx`` back to caller face numbering (one
        per-pixel gather); leave False when only coverage is needed.
    Returns ``(attrs [H, W, A], face_idx [H, W], depth [H, W])`` with
    attrs == 0 and face_idx == -1 at background pixels.  Matches
    ``rasterize`` + ``render_attributes`` up to ~1e-6 (the in-kernel
    perspective weights multiply by the winning depth instead of
    normalising; tests pin the tolerance in interpret mode).
    """
    A = int(face_attrs.shape[-1])
    soa, blk_y, order = _raster_attr_pack(
        face_px, face_z, face_attrs, face_block
    )
    attr, fidx, depth = rasterize_attrs_prepacked(
        soa, blk_y, image_size, n_attr=A, pixel_tile=pixel_tile,
        interpret=interpret,
    )
    if remap_faces:
        fidx = jnp.where(
            fidx >= 0, order.astype(jnp.int32)[jnp.maximum(fidx, 0)], -1
        )
    return attr, fidx, depth


def rasterize_attrs_xla(face_px, face_z, face_attrs, image_size,
                        face_block: int = 256):
    """Pure-XLA equivalent of :func:`rasterize_attrs_pallas`."""
    from bodyfitting_tpu.ops import rasterize as rz

    raster = rz.rasterize(face_px, face_z, image_size,
                          face_block=face_block)
    attrs = rz.render_attributes(raster, face_attrs, background=0.0)
    return attrs, raster.face_idx, raster.depth


def auto_rasterize_attrs(face_px, face_z, face_attrs, image_size,
                         face_block: int = 256):
    """Fused raster+attrs: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return rasterize_attrs_pallas(
            face_px, face_z, face_attrs, image_size,
            face_block=max(face_block, 512),
        )
    return rasterize_attrs_xla(face_px, face_z, face_attrs, image_size,
                               face_block=face_block)


def rasterize_pallas(
    face_px: jax.Array,
    face_z: jax.Array,
    image_size: int,
    pixel_tile: int = 1024,
    face_block: int = 512,
    interpret: bool = False,
):
    """Drop-in Pallas version of ``ops.rasterize.rasterize``."""
    from bodyfitting_tpu.ops.rasterize import RasterOut, _EPS, _FAR as RFAR
    from bodyfitting_tpu.ops.rasterize import _edge

    depth, fidx = rasterize_zbuf(
        face_px, face_z, image_size, pixel_tile=pixel_tile,
        face_block=face_block, interpret=interpret,
    )
    H = W = image_size
    depth = jnp.where(fidx >= 0, depth, RFAR)

    # winning-face barycentrics, same post-pass as the XLA path
    ys = (jnp.arange(H, dtype=face_px.dtype) + 0.5)[:, None]
    xs = (jnp.arange(W, dtype=face_px.dtype) + 0.5)[None, :]
    p = jnp.stack(
        [jnp.broadcast_to(xs, (H, W)), jnp.broadcast_to(ys, (H, W))], -1
    ).reshape(-1, 2)
    safe_idx = jnp.maximum(fidx.reshape(-1), 0)
    tri = face_px[safe_idx]
    z3 = face_z[safe_idx]
    e0 = _edge(tri[:, 1], tri[:, 2], p)
    e1 = _edge(tri[:, 2], tri[:, 0], p)
    e2 = _edge(tri[:, 0], tri[:, 1], p)
    area = _edge(tri[:, 0], tri[:, 1], tri[:, 2])
    denom = jnp.where(jnp.abs(area) > _EPS, area, 1.0)
    sb = jnp.stack([e0, e1, e2], -1) / denom[:, None]
    wgt = sb / jnp.maximum(z3, _EPS)
    pc = wgt / jnp.maximum(wgt.sum(-1, keepdims=True), _EPS)
    bary = jnp.where((fidx.reshape(-1) >= 0)[:, None], pc, 0.0)
    return RasterOut(
        face_idx=fidx, bary=bary.reshape(H, W, 3), depth=depth
    )


# ---------------------------------------------------------------------------
# Fused linear-blend skinning
# ---------------------------------------------------------------------------
#
# The fit's full-vertex forward is HBM-bound on the blended transform
# T = lbs_weights @ A ([B, V, 12] written + re-read by the skinning einsum
# and its backward; see BENCH_NOTES.md).  This kernel streams A[J, 12]
# through VMEM, keeps the whole weight matrix resident (V x J f32 ~ 5.4 MB
# for SMPL-X, fetched once), and accumulates vertices tile by tile so T is
# never materialized in HBM.  Backward recomputes T per tile and emits
# per-tile dA partials (summed outside, [tiles, J, 12] is tiny).
#
# Replaces the last stage of the reference smplx LBS (the `torch.einsum`
# over per-vertex 4x4 transforms inside the smplx pip package used at
# /root/reference/smplify/smplify.py:80); the reference never fuses this.
#
# The returned function closes over `weights`, so no cotangent is ever
# computed for the weight matrix (the fit treats it as a constant; a
# per-frame [B, V, J] weight cotangent under vmap would dwarf the savings).


def _skin_fwd_kernel(w_ref, a_ref, vp_ref, out_ref, *, vert_tile):
    i = pl.program_id(0)
    W = w_ref[pl.ds(i * vert_tile, vert_tile), :]          # [TV, J]
    T = jnp.dot(W, a_ref[:], preferred_element_type=jnp.float32)  # [TV, 12]
    vp = vp_ref[:]                                         # [TV, 3]
    cols = []
    for r in range(3):
        acc = T[:, 4 * r + 3:4 * r + 4]
        for k in range(3):
            acc = acc + T[:, 4 * r + k:4 * r + k + 1] * vp[:, k:k + 1]
        cols.append(acc)
    out_ref[:] = jnp.concatenate(cols, axis=-1)


def _skin_bwd_kernel(w_ref, a_ref, vp_ref, g_ref, dvp_ref, da_ref, *,
                     vert_tile):
    i = pl.program_id(0)
    W = w_ref[pl.ds(i * vert_tile, vert_tile), :]          # [TV, J]
    T = jnp.dot(W, a_ref[:], preferred_element_type=jnp.float32)  # [TV, 12]
    g = g_ref[:]                                           # [TV, 3]
    vp = vp_ref[:]                                         # [TV, 3]

    # dvp[:, k] = sum_r T[:, 4r+k] * g[:, r]
    cols = []
    for k in range(3):
        acc = T[:, k:k + 1] * g[:, 0:1]
        for r in range(1, 3):
            acc = acc + T[:, 4 * r + k:4 * r + k + 1] * g[:, r:r + 1]
        cols.append(acc)
    dvp_ref[:] = jnp.concatenate(cols, axis=-1)

    # M[:, 4r+k] = g[:, r] * vph[:, k]  (vph = [vp, 1])
    blocks = []
    for r in range(3):
        gr = g[:, r:r + 1]
        blocks.extend([gr * vp[:, 0:1], gr * vp[:, 1:2], gr * vp[:, 2:3], gr])
    M = jnp.concatenate(blocks, axis=-1)                   # [TV, 12]
    # dA partial for this tile: W^T @ M  -> [J, 12]
    da_ref[0] = jax.lax.dot_general(
        W, M, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def make_fused_skinning(
    weights: jax.Array,
    vert_tile: int = 1024,
    interpret: bool = False,
):
    """Build ``skin(A [J, 12], v_posed [V, 3]) -> verts [V, 3]``.

    ``weights`` ([V, J] skinning matrix) is closed over and held fully in
    VMEM (constant block index => fetched once, including under ``vmap``
    over frames, where the batch only prepends a grid axis).  The function
    is differentiable in A and v_posed via a fused backward kernel and is
    safe to ``vmap``/``jit``.

    Note on the closure: like every other model array in this framework
    (shapedirs is ~10x larger and closed over by all fit entry points),
    ``weights`` becomes a constant of the enclosing jitted program.  The
    CLAUDE.md remote-compile caveat is about *megabyte-scale arrays the
    caller could pass as arguments instead*; model parameters are part of
    the program by design and the tunnel handles them.
    """
    V, J = weights.shape
    TV = min(vert_tile, max(128, V))
    Vp = _cdiv(V, TV) * TV
    tiles = Vp // TV
    w_pad = jnp.pad(weights, ((0, Vp - V), (0, 0)))

    def fwd_call(A, vp):
        vp_pad = jnp.pad(vp, ((0, Vp - V), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_skin_fwd_kernel, vert_tile=TV),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((TV, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TV, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Vp, 3), jnp.float32),
            interpret=interpret,
        )(w_pad, A, vp_pad)
        return out[:V]

    def bwd_call(A, vp, g):
        vp_pad = jnp.pad(vp, ((0, Vp - V), (0, 0)))
        g_pad = jnp.pad(g, ((0, Vp - V), (0, 0)))
        dvp, da_part = pl.pallas_call(
            functools.partial(_skin_bwd_kernel, vert_tile=TV),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((TV, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TV, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((TV, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, J, 12), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Vp, 3), jnp.float32),
                jax.ShapeDtypeStruct((tiles, J, 12), jnp.float32),
            ),
            interpret=interpret,
        )(w_pad, A, vp_pad, g_pad)
        return da_part.sum(axis=0), dvp[:V]

    @jax.custom_vjp
    def skin(A, vp):
        return fwd_call(A, vp)

    def skin_fwd(A, vp):
        return fwd_call(A, vp), (A, vp)

    def skin_bwd(res, g):
        A, vp = res
        return bwd_call(A, vp, g)

    skin.defvjp(skin_fwd, skin_bwd)
    return skin


# ---------------------------------------------------------------------------
# Contour -> projected-vertex 2D nearest match (silhouette ICP term)
# ---------------------------------------------------------------------------
#
# The mask loss (losses/silhouette.py, reference smplify/loss.py:85-130)
# matches every contour pixel to the nearest projected SMPL vertex each
# iteration.  The XLA broadcast [P, M] min+argmin measured 3.4 ms/iter at
# 8 frames x 8 views (BENCH_NOTES.md); this kernel runs the same sweep as
# a (m-block) grid with VMEM-resident running minima — the 2D analogue of
# ``nearest_d2_idx`` without the AABB cull (M is only ~2.6k).


def _contour_match_kernel(c_ref, p_ref, d2_ref, idx_ref):
    j = pl.program_id(1)                # minor: m-blocks sweep while the
    mb = p_ref.shape[1]                 # same P-block's minima stay resident

    @pl.when(j == 0)
    def _():
        d2_ref[:] = jnp.full_like(d2_ref, _FAR)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    cx = c_ref[:, 0:1]                                    # [P, 1]
    cy = c_ref[:, 1:2]
    px = p_ref[0:1, :]                                    # [1, MB]
    py = p_ref[1:2, :]
    big = p_ref[2:3, :]                                   # _FAR where invalid

    dx = cx - px
    dy = cy - py
    d2 = dx * dx + dy * dy + big                          # [P, MB]

    arg = jnp.argmin(d2, axis=1)                          # [P]
    mind = jnp.min(d2, axis=1)
    cur = d2_ref[:, 0]
    better = mind < cur
    d2_ref[:, 0] = jnp.where(better, mind, cur)
    idx_ref[:, 0] = jnp.where(
        better, j * mb + arg.astype(jnp.int32), idx_ref[:, 0]
    )


@functools.partial(
    jax.jit, static_argnames=("point_block", "interpret")
)
def contour_min_idx(
    contour: jax.Array,
    proj: jax.Array,
    valid: jax.Array,
    point_block: int = 1024,
    interpret: bool = False,
):
    """Nearest projected vertex for each contour pixel.

    contour ``[P, 2]`` (x, y); proj ``[M, 2]``; valid ``[M]`` (boolean-ish,
    invalid candidates never win).  Returns ``(d2 [P], idx [P] int32)`` —
    identical to ``argmin`` over a masked ``[P, M]`` distance matrix.
    Differentiation: none (callers stop gradients and recompute matched
    distances through a gather, reference loss.py:240 semantics).
    """
    P, M = contour.shape[0], proj.shape[0]
    ppad8 = _cdiv(P, 8) * 8
    # the kernel materializes ~3 [p_block, point_block] f32 transients
    # (dx, dy, d2); keep p_block * point_block <= ~1M f32 (~12 MB of the
    # 16 MB VMEM).  Shrink point_block first (long raw contours, P = 4096
    # before resampling); once point_block floors at one 128-lane tile,
    # block the P axis too so arbitrarily long contours still compile
    # (a [16384, 128] block trio alone would be 25 MB).
    point_block = min(
        point_block, max(128, (1_000_000 // ppad8) // 128 * 128)
    )
    p_block = min(ppad8, max(8, (1_000_000 // point_block) // 8 * 8))
    pb = _cdiv(ppad8, p_block)
    ppad = pb * p_block - P
    mb = _cdiv(M, point_block)
    mpad = mb * point_block - M

    soa = jnp.concatenate(
        [proj.T, jnp.where(valid > 0, 0.0, _FAR)[None, :]], axis=0
    )                                                     # [3, M]
    if mpad:
        soa = jnp.concatenate(
            [soa, jnp.full((3, mpad), _FAR, soa.dtype)], axis=1
        )
    cpad = contour
    if ppad:
        cpad = jnp.concatenate(
            [contour, jnp.zeros((ppad, 2), contour.dtype)]
        )

    d2, idx = pl.pallas_call(
        _contour_match_kernel,
        grid=(pb, mb),
        in_specs=[
            pl.BlockSpec((p_block, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, point_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pb * p_block, 1), contour.dtype),
            jax.ShapeDtypeStruct((pb * p_block, 1), jnp.int32),
        ],
        interpret=interpret,
    )(cpad, soa)
    return d2[:P, 0], idx[:P, 0]


def skinning_xla(weights: jax.Array, A12: jax.Array,
                 v_posed: jax.Array) -> jax.Array:
    """Pure-XLA reference skinning (what lbs() does without the kernel)."""
    T = jnp.matmul(
        weights, A12,
        preferred_element_type=jnp.promote_types(weights.dtype, A12.dtype),
    )
    T = T.reshape(weights.shape[0], 3, 4)
    return jnp.einsum("vij,vj->vi", T[:, :, :3], v_posed) + T[:, :, 3]


# ---------------------------------------------------------------------------
# Stay-inside bilinear sampling (silhouette loss)
# ---------------------------------------------------------------------------


def _bilinear_cov_kernel(xy_ref, img_ref, out_ref, *, H, W,
                         with_grads=True, with_cov=True):
    """One point-tile of :func:`bilinear_cov_grads`.

    The separable zero-padded bilinear weights (``max(0, 1-|i-y|)``
    hinges — identical taps to torch-1.2.0 grid_sample with
    align_corners=True semantics) are GENERATED in VMEM per tile and
    contracted against the VMEM-resident image immediately: the
    ``[N, H]``/``[N, W]`` weight matrices never exist in HBM.  The same
    two MXU contractions (``rw @ img`` and ``drw @ img``) also yield the
    y-derivative, so the forward pass computes the sampled value, the
    constant-1 coverage, and all four positional derivatives at once and
    the custom-vjp backward is pure elementwise math.

    Matmul operands are cast to bf16 (f32 accumulation): the XLA
    equivalent (`losses.silhouette._bilinear_sample_onehot_cov`) runs its
    dots at default precision, which is the same bf16 operand rounding.
    """
    x = xy_ref[:, 0:1]                                    # [tN, 1]
    y = xy_ref[:, 1:2]
    img = img_ref[:]                                      # [H, W] bf16
    dt = xy_ref.dtype
    # Mosaic iota is integer-only; cast to the compute dtype after
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1).astype(dt)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(dt)
    ady = jnp.abs(iy - y)                                 # [tN, H]
    adx = jnp.abs(ix - x)                                 # [tN, W]
    rw = jnp.maximum(0.0, 1.0 - ady)
    cw = jnp.maximum(0.0, 1.0 - adx)
    bf = jnp.bfloat16
    # NOTE: every output row must be a lane-reduction-shaped [tN] value
    # with a common layout: analytic closed-form coverage (elementwise
    # [tN]) and floor one-hot u/v reformulations (U/V matmuls with
    # drows = V - U free) were both tried — the first trips a Mosaic
    # concat-layout bug, and both measured SLOWER than this form
    # (11.8-13.0 vs 10.4 ms/iter at the production batch).
    if not with_grads:
        rows = jnp.dot(rw.astype(bf), img,
                       preferred_element_type=jnp.float32).astype(dt)
        s = jnp.sum(rows * cw, axis=1)                    # sampled
        z = jnp.zeros_like(s)
        cov = (jnp.sum(rw, axis=1) * jnp.sum(cw, axis=1)  # coverage
               if with_cov else z)
        out_ref[:] = jnp.stack([s, cov, z, z, z, z, z, z], axis=0)
        return
    # d rw / dy = sign(i - y) on the open support of the hinge.  (At the
    # kinks |i-y| in {0, 1} autodiff of the XLA hinge picks subgradients
    # 0 / 0.5; measure-zero divergence, documented in the wrapper.)
    drw = jnp.where(rw > 0.0, jnp.sign(iy - y), 0.0)
    dcw = jnp.where(cw > 0.0, jnp.sign(ix - x), 0.0)
    # ONE [2 tN, H] @ [H, W] dot for rows+drows (measured neutral vs two
    # [tN, H] dots — the kernel is VPU/overhead-bound, not MXU-bound)
    both = jnp.concatenate([rw.astype(bf), drw.astype(bf)], axis=0)
    br = jnp.dot(both, img, preferred_element_type=jnp.float32)
    rows = br[:rw.shape[0]].astype(dt)
    drows = br[rw.shape[0]:].astype(dt)
    s = jnp.sum(rows * cw, axis=1)                        # sampled
    z = jnp.zeros_like(s)
    ds_dx = jnp.sum(rows * dcw, axis=1)
    ds_dy = jnp.sum(drows * cw, axis=1)
    if not with_cov:
        # crop mode (losses.silhouette stay-inside on content-cropped
        # masks): coverage vs the FULL image bounds is closed-form in
        # XLA, so the kernel skips the rsum/csum machinery entirely
        out_ref[:] = jnp.stack(
            [s, z, ds_dx, ds_dy, z, z, z, z], axis=0,
        )
        return
    rsum = jnp.sum(rw, axis=1)
    csum = jnp.sum(cw, axis=1)
    cov = rsum * csum                                     # coverage
    dc_dx = rsum * jnp.sum(dcw, axis=1)
    dc_dy = jnp.sum(drw, axis=1) * csum
    out_ref[:] = jnp.stack(
        [s, cov, ds_dx, ds_dy, dc_dx, dc_dy, z, z], axis=0,
    )


def _bilinear_cov_kernel_windowed(xy_ref, img_ref, out_ref, *, H, W, Hw,
                                  with_grads=True):
    """Row-windowed variant of :func:`_bilinear_cov_kernel`.

    The full kernel generates ``[tN, H]`` row hinges and contracts them
    against all ``H`` image rows, although each point's hinge support is
    exactly 2 rows — the only reason the full sweep was needed is that
    per-point dynamic VMEM gathers are not expressible in Mosaic.  When
    the caller orders points so a tile is ROW-COHERENT (consecutive
    points project to nearby image rows — true for contour walks and for
    height-sorted body vertices under upright cameras), the tile's union
    support is a narrow row band.  This kernel computes that band
    in-kernel from the tile's y-range and sweeps it in ``Hw``-row windows
    with a dynamic-trip-count ``fori_loop``: hinge generation AND the MXU
    contraction shrink from ``H`` rows to the tile's actual span, with
    the full-H sweep as the worst case (incoherent tiles lose nothing but
    loop overhead).  Values are identical to the full kernel: windows
    tile ``[r0, rend)`` disjointly (the image-edge clamp masks re-visited
    rows), rows outside every point's support contribute zero weight.
    """
    x = xy_ref[:, 0:1]                                    # [tN, 1]
    y = xy_ref[:, 1:2]
    tN = y.shape[0]
    dt = xy_ref.dtype
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(dt)
    adx = jnp.abs(ix - x)                                 # [tN, W]
    cw = jnp.maximum(0.0, 1.0 - adx)
    bf = jnp.bfloat16

    # Union hinge support of the tile: point y touches integer rows
    # floor(y) and floor(y)+1 only, so [floor(ymin), floor(ymax)+2)
    # covers every point; clip to the image, align the base to sublanes.
    # clip in FLOAT before the int cast: early-fit projections can land
    # anywhere (near-zero w divides), and float->int32 overflow is UB
    ymin = jnp.clip(jnp.min(y), 0.0, float(H))
    ymax = jnp.clip(jnp.max(y), 0.0, float(H))
    # All row offsets are computed in UNITS OF 8 SUBLANES and multiplied
    # by 8 at the load site: Mosaic must statically prove the dynamic
    # sublane index is a multiple of 8, which it can for `x * 8` but not
    # through a floor/min/align chain.
    r0_8 = jnp.floor(ymin).astype(jnp.int32) // 8
    rend = jnp.minimum(jnp.floor(ymax).astype(jnp.int32) + 2, H)
    nwin = jnp.maximum((rend - r0_8 * 8 + Hw - 1) // Hw, 0)

    def body(k, carry):
        rows, rsum, drows, drsum = carry
        start = (r0_8 + k * (Hw // 8)) * 8
        # keep the static-size load inside the image; the `fresh` guard
        # zeroes rows an earlier window already produced, so the clamped
        # last window never double-counts
        ld_8 = jnp.minimum(r0_8 + k * (Hw // 8), (H - Hw) // 8)
        ld = ld_8 * 8
        img_k = img_ref[pl.ds(ld_8 * 8, Hw), :]           # [Hw, W] bf16
        rid = ld + jax.lax.broadcasted_iota(jnp.int32, (1, Hw), 1)
        fresh = rid >= start
        iy = rid.astype(dt)
        ady = jnp.abs(iy - y)                             # [tN, Hw]
        rw = jnp.where(fresh, jnp.maximum(0.0, 1.0 - ady), 0.0)
        if with_grads:
            drw = jnp.where(rw > 0.0, jnp.sign(iy - y), 0.0)
            both = jnp.concatenate([rw.astype(bf), drw.astype(bf)], axis=0)
            br = jnp.dot(both, img_k, preferred_element_type=jnp.float32)
            rows = rows + br[:tN]
            drows = drows + br[tN:]
            drsum = drsum + jnp.sum(drw, axis=1)
        else:
            br = jnp.dot(rw.astype(bf), img_k,
                         preferred_element_type=jnp.float32)
            rows = rows + br
        rsum = rsum + jnp.sum(rw, axis=1)
        return rows, rsum, drows, drsum

    zNW = jnp.zeros((tN, W), jnp.float32)
    zN = jnp.zeros((tN,), dt)
    rows, rsum, drows, drsum = jax.lax.fori_loop(
        0, nwin, body, (zNW, zN, zNW, zN)
    )
    rows = rows.astype(dt)
    csum = jnp.sum(cw, axis=1)
    s = jnp.sum(rows * cw, axis=1)
    cov = rsum * csum
    z = jnp.zeros_like(s)
    if not with_grads:
        out_ref[:] = jnp.stack([s, cov, z, z, z, z, z, z], axis=0)
        return
    dcw = jnp.where(cw > 0.0, jnp.sign(ix - x), 0.0)
    drows = drows.astype(dt)
    ds_dx = jnp.sum(rows * dcw, axis=1)
    ds_dy = jnp.sum(drows * cw, axis=1)
    dc_dx = rsum * jnp.sum(dcw, axis=1)
    dc_dy = drsum * csum
    out_ref[:] = jnp.stack(
        [s, cov, ds_dx, ds_dy, dc_dx, dc_dy, z, z], axis=0,
    )


def _bilinear_cov_kernel_banded(xy_ref, img_ref, out_ref, *, H, W, Hb, NB,
                                with_grads=True):
    """Row-BANDED variant of :func:`_bilinear_cov_kernel` (grid axis, not
    an in-kernel loop).

    The windowed fori_loop variant cut the dot's row extent 8-16x but
    measured SLOWER than the full sweep at production shape
    (bench_stay_inside.py r5: 10.2 vs 9.0 ms/iter) — its dynamic
    ``pl.ds`` sublane loads defeat Mosaic's lowering even when 8-aligned.
    This form instead makes the row band a SECOND (minor) grid axis of
    ``NB`` static ``Hb``-row bands: the image block per step IS the band
    (static index map, normal DMA pipelining), the out block is revisited
    across the band axis and accumulates, and bands whose rows cannot
    intersect the tile's hinge support skip all compute via ``pl.when``
    (points project row-coherently per tile under
    ``FitConfig.mask_point_order='height'``, so typically 1-2 of NB bands
    are active).  The MXU dot shrinks from ``[2tN, H] @ [H, W]`` — which
    bound the production mask fit at ~86%% MXU occupancy for 4 useful
    taps per point — to one ``[2tN, Hb] @ [Hb, W]`` per ACTIVE band.
    Unconditionally correct for any point distribution: the NB bands
    tile all H rows, over-inclusive overlap tests only add zero-weight
    rows.

    Accumulation layout: out rows 0/2/3 accumulate s / ds_dx / ds_dy,
    rows 6/7 accumulate rsum / drsum; the last band step finalizes
    cov = rsum * csum and the coverage derivatives (the x side is
    band-independent) and zeroes the scratch rows.
    """
    k = pl.program_id(1)       # minor grid axis = band index (user grid
    #                            (nt, NB); vmap batch dims are excluded
    #                            from user program_id numbering)
    x = xy_ref[:, 0:1]                                    # [tN, 1]
    y = xy_ref[:, 1:2]
    tN = y.shape[0]
    dt = xy_ref.dtype
    bf = jnp.bfloat16

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    # Band k holds rows [k*Hb, (k+1)*Hb).  A point's hinge support is
    # rows [floor(y), floor(y)+1]; the tile intersects the band iff
    # ymax >= k*Hb - 1 and ymin < (k+1)*Hb (+1 slack; over-inclusion
    # only adds zero-weight rows).
    ymin = jnp.min(y)
    ymax = jnp.max(y)
    band_lo = (k * Hb).astype(dt)
    overlap = (ymax >= band_lo - 1.0) & (ymin < band_lo + Hb)

    @pl.when(overlap)
    def _accumulate():
        iy = (
            k * Hb
            + jax.lax.broadcasted_iota(jnp.int32, (1, Hb), 1)
        ).astype(dt)
        ady = jnp.abs(iy - y)                             # [tN, Hb]
        rw = jnp.maximum(0.0, 1.0 - ady)
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(dt)
        adx = jnp.abs(ix - x)                             # [tN, W]
        cw = jnp.maximum(0.0, 1.0 - adx)
        img_k = img_ref[:]                                # [Hb, W] bf16
        if with_grads:
            drw = jnp.where(rw > 0.0, jnp.sign(iy - y), 0.0)
            both = jnp.concatenate([rw.astype(bf), drw.astype(bf)], axis=0)
            br = jnp.dot(both, img_k, preferred_element_type=jnp.float32)
            rows = br[:tN].astype(dt)
            drows = br[tN:].astype(dt)
            dcw = jnp.where(cw > 0.0, jnp.sign(ix - x), 0.0)
            ds_dx = jnp.sum(rows * dcw, axis=1)
            ds_dy = jnp.sum(drows * cw, axis=1)
            drsum = jnp.sum(drw, axis=1)
        else:
            rows = jnp.dot(rw.astype(bf), img_k,
                           preferred_element_type=jnp.float32).astype(dt)
            ds_dx = ds_dy = drsum = jnp.zeros((tN,), dt)
        s = jnp.sum(rows * cw, axis=1)
        rsum = jnp.sum(rw, axis=1)
        z = jnp.zeros((tN,), dt)
        out_ref[:] = out_ref[:] + jnp.stack(
            [s, z, ds_dx, ds_dy, z, z, rsum, drsum], axis=0
        )

    @pl.when(k == NB - 1)
    def _finalize():
        ix = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(dt)
        adx = jnp.abs(ix - x)
        cw = jnp.maximum(0.0, 1.0 - adx)
        csum = jnp.sum(cw, axis=1)
        acc = out_ref[:]
        rsum = acc[6]
        z = jnp.zeros((tN,), dt)
        if with_grads:
            dcw = jnp.where(cw > 0.0, jnp.sign(ix - x), 0.0)
            dcsum = jnp.sum(dcw, axis=1)
            out_ref[:] = jnp.stack(
                [acc[0], rsum * csum, acc[2], acc[3],
                 rsum * dcsum, acc[7] * csum, z, z], axis=0,
            )
        else:
            out_ref[:] = jnp.stack(
                [acc[0], rsum * csum, z, z, z, z, z, z], axis=0,
            )


def bilinear_cov_grads(
    img: jax.Array,
    xy: jax.Array,
    point_tile: int = 256,
    interpret: bool = False,
    with_grads: bool = True,
    row_window: int | None = None,
    band_rows: int | None = None,
    with_cov: bool = True,
):
    """Fused zero-padded bilinear sample + coverage + position gradients.

    img ``[H, W]``; xy ``[N, 2]`` sample positions in PIXEL-GRID units
    (already scaled by ``(size-1)/imsize``).  Returns ``[6, N]``: sampled
    value, coverage (the same sample of a constant-1 image), and their
    x/y derivatives (zeros with ``with_grads=False`` — value-only mode
    skips the derivative matmul, e.g. for stop-gradient floor sampling).
    Values match the XLA one-hot formulation
    (`losses.silhouette._bilinear_sample_onehot_cov`) which materializes
    [N, H]/[N, W] hinge matrices through HBM per (frame, view) — that
    traffic, not the MXU, bound the production mask fit (r4 ablation:
    the stay-inside term was 70%% of the staged step).

    ``row_window``: sweep only the tile's union row-support in windows of
    this many rows (:func:`_bilinear_cov_kernel_windowed`) instead of all
    ``H`` rows — a large win when the caller orders points row-coherently
    (``FitConfig.mask_point_order='height'``; contour walks are already
    coherent), the full sweep in the worst case.  Requires ``H % 8 == 0``
    and ``row_window < H`` (falls back to the full kernel otherwise).
    """
    N = xy.shape[0]
    H, W = img.shape
    nt = _cdiv(max(N, 1), point_tile)
    npad = nt * point_tile - N
    if npad:
        # padded points sit far outside the hinge support: all-zero rows
        xy = jnp.concatenate(
            [xy, jnp.full((npad, 2), -4.0, xy.dtype)]
        )
    if row_window is not None and (
        H % 8 != 0 or row_window % 8 != 0 or row_window >= H
    ):
        row_window = None
    if band_rows is not None and (H % band_rows != 0 or band_rows >= H):
        band_rows = None
    # operand cast hoisted out of the kernel: the image is loop-constant
    # in the fit scan, so the bf16 copy is made once, not per grid step,
    # and the VMEM-resident block halves
    img_bf = img.astype(jnp.bfloat16)
    if band_rows is not None:
        NB = H // band_rows
        kern = functools.partial(
            _bilinear_cov_kernel_banded, H=H, W=W, Hb=band_rows, NB=NB,
            with_grads=with_grads,
        )
        outs = pl.pallas_call(
            kern,
            grid=(nt, NB),
            in_specs=[
                pl.BlockSpec((point_tile, 2), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((band_rows, W), lambda i, k: (k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, point_tile), lambda i, k: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, nt * point_tile), xy.dtype),
            interpret=interpret,
        )(xy, img_bf)
        return outs[:6, :N]
    kern = (
        functools.partial(_bilinear_cov_kernel_windowed, H=H, W=W,
                          Hw=row_window, with_grads=with_grads)
        if row_window is not None
        else functools.partial(_bilinear_cov_kernel, H=H, W=W,
                               with_grads=with_grads, with_cov=with_cov)
    )
    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((point_tile, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, point_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, nt * point_tile), xy.dtype),
        interpret=interpret,
    )(xy, img_bf)
    return outs[:6, :N]


# ---------------------------------------------------------------------------
# Contour ICP matching with payloads (silhouette loss)
# ---------------------------------------------------------------------------


def _contour_match_full_kernel(c_ref, p_ref, d2_ref, idx_ref, px_ref,
                               py_ref, in_ref):
    """contour_min_idx plus running payloads: the winning candidate's
    coordinates and inside-flag are selected per block via a VMEM one-hot
    (never materialized to HBM — the XLA tail built a [P, M] one-hot
    through HBM per frame x view, ~4 GB/iter at production batch)."""
    j = pl.program_id(1)
    mb = p_ref.shape[1]

    @pl.when(j == 0)
    def _():
        d2_ref[:] = jnp.full_like(d2_ref, _FAR)
        idx_ref[:] = jnp.zeros_like(idx_ref)
        px_ref[:] = jnp.zeros_like(px_ref)
        py_ref[:] = jnp.zeros_like(py_ref)
        in_ref[:] = jnp.zeros_like(in_ref)

    cx = c_ref[:, 0:1]                                    # [P, 1]
    cy = c_ref[:, 1:2]
    px = p_ref[0:1, :]                                    # [1, MB]
    py = p_ref[1:2, :]
    big = p_ref[2:3, :]                                   # _FAR where invalid
    ins = p_ref[3:4, :]                                   # inside flag

    dx = cx - px
    dy = cy - py
    d2 = dx * dx + dy * dy + big                          # [P, MB]

    arg = jnp.argmin(d2, axis=1)                          # [P]
    mind = jnp.min(d2, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    oh = (lane == arg[:, None]).astype(d2.dtype)          # [P, MB] VMEM only
    bpx = jnp.sum(oh * px, axis=1)
    bpy = jnp.sum(oh * py, axis=1)
    bin_ = jnp.sum(oh * ins, axis=1)
    cur = d2_ref[:, 0]
    better = mind < cur
    d2_ref[:, 0] = jnp.where(better, mind, cur)
    idx_ref[:, 0] = jnp.where(
        better, j * mb + arg.astype(jnp.int32), idx_ref[:, 0]
    )
    px_ref[:, 0] = jnp.where(better, bpx, px_ref[:, 0])
    py_ref[:, 0] = jnp.where(better, bpy, py_ref[:, 0])
    in_ref[:, 0] = jnp.where(better, bin_, in_ref[:, 0])


@functools.partial(
    jax.jit, static_argnames=("point_block", "interpret")
)
def contour_match_full(
    contour: jax.Array,
    proj: jax.Array,
    valid: jax.Array,
    inside: jax.Array,
    point_block: int = 1024,
    interpret: bool = False,
):
    """Nearest projected vertex per contour pixel, WITH payloads.

    Same matching as :func:`contour_min_idx` (identical to argmin over a
    masked [P, M] distance matrix) but also returns the winning
    candidate's coordinates and ``inside`` value, so callers need no
    [P, M] one-hot gather outside the kernel.  Non-differentiable by
    contract (callers rebuild the gradient path via
    :func:`rows_scatter_add`, reference loss.py:240 semantics).

    Returns ``(d2 [P], idx [P] int32, matched [P, 2], in_match [P])``.
    """
    P, M = contour.shape[0], proj.shape[0]
    ppad8 = _cdiv(P, 8) * 8
    point_block = min(
        point_block, max(128, (1_000_000 // ppad8) // 128 * 128)
    )
    p_block = min(ppad8, max(8, (1_000_000 // point_block) // 8 * 8))
    pb = _cdiv(ppad8, p_block)
    ppad = pb * p_block - P
    mb = _cdiv(M, point_block)
    mpad = mb * point_block - M

    soa = jnp.concatenate(
        [proj.T, jnp.where(valid > 0, 0.0, _FAR)[None, :],
         inside[None, :].astype(proj.dtype)], axis=0
    )                                                     # [4, M]
    if mpad:
        pad = jnp.zeros((4, mpad), soa.dtype).at[2].set(_FAR)
        soa = jnp.concatenate([soa, pad], axis=1)
    cpad = contour
    if ppad:
        cpad = jnp.concatenate(
            [contour, jnp.zeros((ppad, 2), contour.dtype)]
        )

    d2, idx, mx, my, inm = pl.pallas_call(
        _contour_match_full_kernel,
        grid=(pb, mb),
        in_specs=[
            pl.BlockSpec((p_block, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, point_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((p_block, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
        ] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((pb * p_block, 1), contour.dtype),
            jax.ShapeDtypeStruct((pb * p_block, 1), jnp.int32),
            jax.ShapeDtypeStruct((pb * p_block, 1), contour.dtype),
            jax.ShapeDtypeStruct((pb * p_block, 1), contour.dtype),
            jax.ShapeDtypeStruct((pb * p_block, 1), contour.dtype),
        ],
        interpret=interpret,
    )(cpad, soa)
    matched = jnp.stack([mx[:P, 0], my[:P, 0]], axis=-1)
    return d2[:P, 0], idx[:P, 0], matched, inm[:P, 0]


def _rows_scatter_kernel(idx_ref, g_ref, out_ref):
    """One M-block of :func:`rows_scatter_add`: build the [P, MB] one-hot
    in VMEM and contract ``g^T @ onehot`` on the MXU."""
    j = pl.program_id(0)
    mb = out_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (idx_ref.shape[0], mb), 1)
    oh = (idx_ref[:, 0:1] - j * mb == lane).astype(g_ref.dtype)
    out_ref[:] = jax.lax.dot_general(
        g_ref[:], oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)                               # [C, MB]


@functools.partial(
    jax.jit, static_argnames=("M", "m_block", "interpret")
)
def rows_scatter_add(
    idx: jax.Array,
    g: jax.Array,
    M: int,
    m_block: int = 1024,
    interpret: bool = False,
):
    """``out[c, m] = sum over p with idx[p]==m of g[p, c]`` — the
    backward of a row gather (``matched = proj[idx]``), as a one-hot
    contraction per M-block so the [P, M] one-hot lives only in VMEM.
    idx ``[P]`` int32 (entries may exceed M; those rows are dropped,
    used for padding); g ``[P, C]``.  Returns ``[C, M]``.
    """
    P, C = g.shape
    ppad = _cdiv(max(P, 1), 8) * 8 - P
    if ppad:
        idx = jnp.concatenate([idx, jnp.full((ppad,), 2**30, idx.dtype)])
        g = jnp.concatenate([g, jnp.zeros((ppad, C), g.dtype)])
    mbk = _cdiv(M, m_block)
    out = pl.pallas_call(
        _rows_scatter_kernel,
        grid=(mbk,),
        in_specs=[
            pl.BlockSpec((idx.shape[0], 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((idx.shape[0], C), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, m_block), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, mbk * m_block), g.dtype),
        interpret=interpret,
    )(idx[:, None], g)
    return out[:, :M]
