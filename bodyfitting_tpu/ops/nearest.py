"""Nearest point-on-mesh queries, TPU-native.

Replaces the reference's CUDA uniform-grid searcher
(/root/reference/thirdparty/mesh_grid/mesh_grid_kernel.cu:240-353 and
utils/mesh_grid_searcher.py:52-99).  Instead of translating the
data-dependent expanding-ring grid walk (which XLA cannot tile), queries
run as a *blocked brute force* over face chunks with a running minimum — a
dense, static-shape computation that maps onto the VPU and pipelines HBM
reads.  For SMPL-sized meshes (13k-21k faces, ~10k queries) this is
bandwidth-trivial and runs in the fitting loop without host round trips.

The closed-form point-to-triangle projection follows the standard Voronoi
region decomposition (Ericson, "Real-Time Collision Detection"), written
branchlessly with ``jnp.where`` so it vectorises — functionally equivalent
to the reference's KKT-system solver (mesh_grid_kernel.cu:12-109).

Gradient semantics match the reference: ``nearest_points`` stops gradients
through the returned closest points (the reference's autograd Function has
its backward disabled and callers detach — utils/mesh_grid_searcher.py:17-49,
smplify/loss.py:240), so losses differentiate through the query points only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def closest_point_on_triangles(
    p: jax.Array, a: jax.Array, b: jax.Array, c: jax.Array
) -> jax.Array:
    """Closest point to ``p`` on each triangle ``(a, b, c)``.

    All inputs broadcast: ``p [..., 3]``, ``a/b/c [..., 3]`` -> ``[..., 3]``.
    Branchless Voronoi-region classification.
    """
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    def safe_div(num, den):
        den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1e-30)
        return num / den_safe

    # Edge/interior candidate points.
    t_ab = jnp.clip(safe_div(d1, d1 - d3), 0.0, 1.0)[..., None]
    p_ab = a + t_ab * ab
    t_ac = jnp.clip(safe_div(d2, d2 - d6), 0.0, 1.0)[..., None]
    p_ac = a + t_ac * ac
    t_bc = jnp.clip(safe_div(d4 - d3, (d4 - d3) + (d5 - d6)), 0.0, 1.0)[
        ..., None
    ]
    p_bc = b + t_bc * (c - b)
    denom = safe_div(jnp.ones_like(va), va + vb + vc)
    v = (vb * denom)[..., None]
    w = (vc * denom)[..., None]
    p_in = a + ab * v + ac * w

    # Region selection, highest priority last (inner where wins).
    out = p_in
    out = jnp.where(
        ((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0))[..., None], p_bc, out
    )
    out = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], p_ac, out)
    out = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], p_ab, out)
    out = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, out)
    out = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, out)
    out = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, out)
    return out


@functools.partial(jax.jit, static_argnames=("face_block", "tie_break"))
def nearest_point_on_mesh(
    points: jax.Array,
    verts: jax.Array,
    faces: jax.Array,
    face_block: int = 512,
    tie_break: bool = True,
):
    """For each query point, the closest point on the mesh surface.

    Args:
      points: ``[Q, 3]`` query points.
      verts: ``[V, 3]`` mesh vertices.
      faces: ``[F, 3]`` int32 triangle indices.  Padded (degenerate) faces
        are fine — a duplicate-vertex face still yields a valid point.
      face_block: chunk of faces scanned per step (controls peak memory:
        the transient is ``[Q, face_block]`` floats).
      tie_break: resolve equal-distance ties deterministically (see below).

    Returns:
      ``(closest [Q, 3], face_idx [Q] int32, sqdist [Q])``.

    Tie-breaking: a query in the Voronoi region of a mesh *edge* (a
    positive-measure event, not a degeneracy) is equidistant from both
    incident faces, and which one a running-argmin reports depends on
    floating-point rounding of the two face's distance computations — so
    the face index (hence the normal-loss term that reads the face's
    normal, reference loss.py:260-271) would differ between any two
    correct implementations.  With ``tie_break=True`` a second sweep
    returns the LOWEST face index within a rounding-scale distance band
    of the minimum, making the result implementation-independent (the
    torch re-enactment applies the identical rule).  Costs a second pass
    over the faces.
    """
    from bodyfitting_tpu.ops.blocking import num_blocks, pad_to_blocks

    Q = points.shape[0]
    F = faces.shape[0]
    nblocks = num_blocks(F, face_block)
    # Pad with far-away degenerate triangles so they never win.
    tri = pad_to_blocks(verts[faces], face_block, 1e9)

    def closest_block(tri_blk):
        cp = closest_point_on_triangles(
            points[:, None, :], tri_blk[None, :, 0], tri_blk[None, :, 1],
            tri_blk[None, :, 2],
        )                                                   # [Q, FB, 3]
        d2 = jnp.sum((points[:, None, :] - cp) ** 2, -1)    # [Q, FB]
        return cp, d2

    def body(carry, inp):
        best_d2, best_idx, best_pt = carry
        blk_idx, tri_blk = inp
        cp, d2 = closest_block(tri_blk)
        arg = jnp.argmin(d2, axis=1)                        # [Q]
        min_d2 = jnp.take_along_axis(d2, arg[:, None], 1)[:, 0]
        min_pt = jnp.take_along_axis(cp, arg[:, None, None], 1)[:, 0]
        better = min_d2 < best_d2
        best_pt = jnp.where(better[:, None], min_pt, best_pt)
        best_idx = jnp.where(
            better, blk_idx * face_block + arg.astype(jnp.int32), best_idx
        )
        best_d2 = jnp.where(better, min_d2, best_d2)
        return (best_d2, best_idx, best_pt), None

    init = (
        jnp.full((Q,), jnp.inf, points.dtype),
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((Q, 3), points.dtype),
    )
    (d2, idx, pt), _ = jax.lax.scan(
        body, init, (jnp.arange(nblocks, dtype=jnp.int32), tri)
    )
    if not tie_break:
        return pt, idx, d2

    thresh = tie_threshold(d2, verts)

    def tie_body(carry, inp):
        low_idx = carry
        blk_idx, tri_blk = inp
        _, bd2 = closest_block(tri_blk)
        fidx = blk_idx * face_block + jnp.arange(
            face_block, dtype=jnp.int32
        )[None, :]
        cand = jnp.where(bd2 <= thresh[:, None], fidx, jnp.int32(2**30))
        return jnp.minimum(low_idx, cand.min(axis=1)), None

    low0 = jnp.full((Q,), 2**30, jnp.int32)
    low_idx, _ = jax.lax.scan(
        tie_body, low0, (jnp.arange(nblocks, dtype=jnp.int32), tri)
    )
    idx_tb = jnp.minimum(low_idx, idx)
    # Recompute the closest point on the tie-broken face so pt and idx
    # stay consistent (equal to the pass-1 point up to ~1 ulp on ties).
    tri_tb = verts[faces][jnp.clip(idx_tb, 0, F - 1)]       # [Q, 3, 3]
    pt_tb = closest_point_on_triangles(
        points, tri_tb[:, 0], tri_tb[:, 1], tri_tb[:, 2]
    )
    return pt_tb, idx_tb, d2


def tie_threshold(best_d2: jax.Array, verts: jax.Array) -> jax.Array:
    """Distance-squared band counting as "tied with the minimum".

    ``best + 32 eps (best + diag^2)``: the relative term catches rounding
    between two algorithms' evaluations of the same tie, the bbox-diagonal
    absolute term catches exact-zero minima (a query ON the surface).
    Shared verbatim by the torch re-enactment so both engines see the same
    tie sets.
    """
    eps = jnp.finfo(best_d2.dtype).eps
    ext = verts.max(axis=0) - verts.min(axis=0)
    diag2 = jnp.sum(ext * ext)
    return best_d2 + 32.0 * eps * (best_d2 + diag2)


def nearest_points(
    points: jax.Array, verts: jax.Array, faces: jax.Array,
    face_block: int = 512,
):
    """Reference-compatible query: gradients stop at the mesh.

    Mirrors ``MeshGridSearcher.nearest_points`` semantics
    (utils/mesh_grid_searcher.py:81-91): the returned closest point and face
    index are constants w.r.t. autodiff.

    On TPU this routes to the Morton-sorted AABB-culled Pallas sweep
    (``ops.pallas_kernels.nearest_point_on_mesh_pallas`` with the same
    tie rule) — the TPU answer to the reference's expanding-ring CUDA
    grid walk (mesh_grid_kernel.cu:240-353); the XLA blocked brute force
    evaluates every face twice per query (min + tie pass), which at the
    exact scan-fit scale (V~7k x F~80k x 1200 iters) exceeded the remote
    tunnel's per-execution time budget.
    """
    if jax.default_backend() == "tpu":
        from bodyfitting_tpu.ops.pallas_kernels import (
            nearest_point_on_mesh_pallas,
        )

        # Detach the INPUTS, not just the outputs: under jax.grad the
        # pallas_call would otherwise be traced with JVP tracers (pallas
        # has no jvp rule -> NotImplementedError) even though the caller
        # discards the tangents.  With zero-tangent inputs JAX evaluates
        # the primal only, which is exactly the reference's disabled
        # backward (utils/mesh_grid_searcher.py:17-49).
        pt, idx, _ = nearest_point_on_mesh_pallas(
            jax.lax.stop_gradient(points),
            jax.lax.stop_gradient(verts),
            faces,
            face_block=face_block,
            tie_break=True,
        )
    else:
        pt, idx, _ = nearest_point_on_mesh(
            points, verts, faces, face_block
        )
    return jax.lax.stop_gradient(pt), jax.lax.stop_gradient(idx)
