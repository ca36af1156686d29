"""Silhouette (mask) fitting loss.

Re-design of the reference's ``multview_mask_loss`` (smplify/loss.py:85-130)
for TPU: the per-view Python loop becomes a ``vmap`` over a padded view
axis, and the variable-length cv2 contours become fixed-size padded tensors
with validity masks (host-side extraction stays in
:func:`extract_contours`, out of the jitted path).

Semantics preserved from the reference:
  * contour -> model 2D ICP: for every contour pixel, the distance to the
    nearest projected (every-4th) SMPL vertex, weighted ``epsilon`` x when
    that matched vertex lands outside the mask;
  * a differentiable "stay inside" term: bilinear-sampling ``1 - mask`` at
    every projected vertex — the reference's ``grid_sample(1-mask,
    uv/imsize*2-1)`` under torch==1.2.0 (requirements.txt:2), whose
    ``grid_sample`` predates the ``align_corners`` argument and uses
    align_corners=True semantics (the default flipped to False in torch
    1.3) -> tap position is ``uv * (size-1) / imsize``, zero padding.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e9

# Contour->vertex nearest-match implementation for the ICP term:
# 'xla' = broadcast [P, M] min+argmin; 'pallas' = ops.pallas_kernels.
# contour_min_idx (VMEM-resident running minima); 'auto' = pallas on TPU.
# Read at TRACE time: set it before the first jit of a fit — already-
# compiled programs keep whichever impl they were traced with (both
# produce identical values, so this only matters for benchmarking).
CONTOUR_MATCH = "auto"


def _use_pallas_match() -> bool:
    if CONTOUR_MATCH == "pallas":
        return True
    if CONTOUR_MATCH == "xla":
        return False
    return jax.default_backend() == "tpu"


# Stay-inside term implementation: 'xla' = separable one-hot matmuls
# (materializes [N, H]/[N, W] hinge matrices per frame x view — that HBM
# traffic bound the production mask fit, r4 ablation); 'pallas' = fused
# kernel (ops.pallas_kernels.bilinear_cov_grads) that generates the
# hinges in VMEM and returns value + coverage + position grads in one
# pass.  'auto' = pallas on TPU.  Trace-time flag, like CONTOUR_MATCH.
STAY_INSIDE = "auto"

# Row-window size for the fused kernel's banded row sweep (see
# ops.pallas_kernels._bilinear_cov_kernel_windowed): each point tile
# touches only its own row span instead of all H image rows.  MEASURED
# NET NEGATIVE at the production shape (10.2 vs 9.0 ms/iter even with
# row-coherent tiles — the dynamic pl.ds sublane loads + dynamic-trip
# fori_loop cost more than the rows they skip; BENCH_NOTES r5 kernel
# study), so the default is the full sweep; the knob stays for
# experimentation.
STAY_INSIDE_ROW_WINDOW: int | None = None


def _use_pallas_stay_inside() -> bool:
    if STAY_INSIDE == "pallas":
        return True
    if STAY_INSIDE == "xla":
        return False
    return jax.default_backend() == "tpu"


def binarize_mask(mask: np.ndarray) -> np.ndarray:
    """0/1 float32 from a binary/float/uint8 mask.

    One shared rule so contour extraction and the stay-inside mask image
    can never disagree (a float 0/1 mask thresholded at 128 would be
    all-zero while its contours extract fine): values on a [0, 255]
    scale threshold at 127.5, values on a [0, 1] scale at 0.5.
    """
    m = np.asarray(mask)
    thr = 127.5 if m.max(initial=0.0) > 1.0 else 0.5
    return (m > thr).astype(np.float32)


def extract_contours(
    masks: Sequence[np.ndarray], pad_to: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side outer-contour extraction (reference loss.py:73-83).

    DELIBERATE DIVERGENCE (documented in README): on multi-component
    masks this picks the LARGEST outer contour (most boundary pixels).
    The reference's ``extract_countours`` selects
    ``argmax([a.shape[1] for a in contour])`` (loss.py:79) — but
    ``shape[1]`` of a cv2 contour is always 1, so it silently always
    takes the *first* contour in cv2's emission order (bottom-most blob
    in OpenCV's scan), which on a person+noise-blob mask can be the
    noise.  Largest-by-perimeter is the intended behaviour; the
    regression test pins it on a two-blob mask
    (tests/test_losses.py::test_extract_contours_two_blobs).

    Args:
      masks: list of ``[H, W]`` binary/float masks.
      pad_to: contour length to pad/truncate to (default: longest).

    Returns:
      ``(contours [Vm, P, 2] float32 (x, y), valid [Vm, P] float32)``.
    """
    import cv2

    pts_list = []
    for mask in masks:
        m8 = binarize_mask(mask).astype(np.uint8) * 255
        found = cv2.findContours(m8, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
        contours = found[0] if len(found) == 2 else found[1]
        if not contours:
            # all-background mask (subject occluded/out of frame in this
            # view): inert zero-validity contour instead of crashing
            pts_list.append(np.zeros((0, 2), np.float32))
            continue
        largest = contours[
            int(np.argmax([c.shape[0] for c in contours]))
        ]
        pts_list.append(largest.reshape(-1, 2).astype(np.float32))

    P = pad_to or max(p.shape[0] for p in pts_list)
    out = np.zeros((len(pts_list), P, 2), np.float32)
    valid = np.zeros((len(pts_list), P), np.float32)
    for i, p in enumerate(pts_list):
        n = min(p.shape[0], P)
        out[i, :n] = p[:n]
        valid[i, :n] = 1.0
    return out, valid


def resample_contours(
    contours: np.ndarray,
    valid: np.ndarray,
    num_points: int = 512,
) -> tuple[np.ndarray, np.ndarray]:
    """Arc-length-uniform resampling of padded contours (host-side).

    The mask loss's dominant transient is the ``[P, M]`` contour-to-vertex
    distance matrix; a 512^2 mask's outer contour has P up to ~4096 pixels
    while the silhouette objective is insensitive to sub-pixel contour
    density.  Resampling to ``num_points`` shrinks the transient ~8x.

    The returned weights are ``n_original / num_points`` instead of 1.0, so
    ``sum(mindist * weight)`` keeps the *pixel-sum* magnitude of the
    reference objective (loss.py:85-130 sums over every contour pixel) and
    the loss scale — hence the balance against the keypoint/prior terms —
    is preserved.  Weights fold into ``contour_valid``; the jitted loss is
    unchanged.
    """
    Vm = contours.shape[0]
    out = np.zeros((Vm, num_points, 2), np.float32)
    weights = np.zeros((Vm, num_points), np.float32)
    for i in range(Vm):
        pts = contours[i][valid[i] > 0]
        n = pts.shape[0]
        if n == 0:
            continue
        if n <= num_points:
            out[i, :n] = pts
            weights[i, :n] = 1.0
            continue
        closed = np.concatenate([pts, pts[:1]], axis=0)
        seg = np.linalg.norm(np.diff(closed, axis=0), axis=1)
        arc = np.concatenate([[0.0], np.cumsum(seg)])
        total = arc[-1]
        targets = np.linspace(0.0, total, num_points, endpoint=False)
        seg_idx = np.clip(
            np.searchsorted(arc, targets, side="right") - 1, 0, n - 1
        )
        t = (targets - arc[seg_idx]) / np.maximum(seg[seg_idx], 1e-9)
        out[i] = (
            closed[seg_idx] * (1.0 - t[:, None])
            + closed[seg_idx + 1] * t[:, None]
        )
        weights[i] = n / float(num_points)
    return out, weights


def _bilinear_sample_zero_pad(
    img: jax.Array, xy: jax.Array, imsize: float
) -> jax.Array:
    """Sample ``img [H, W]`` at pixel coords ``xy [N, 2] (x, y)``, bilinear
    with zero padding, matching torch-1.2.0 ``grid_sample`` (align_corners=
    True semantics — the arg did not exist yet) given normalised coords
    ``xy/imsize*2-1``: tap position is ``xy * (size-1) / imsize``."""
    H, W = img.shape
    x = xy[:, 0] * ((W - 1) / imsize)
    y = xy[:, 1] * ((H - 1) / imsize)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1).astype(jnp.int32),
                jnp.clip(xi, 0, W - 1).astype(jnp.int32)]
        return jnp.where(inb, v, 0.0)

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _bilinear_sample_onehot(
    img: jax.Array, xy: jax.Array, imsize: float
) -> jax.Array:
    """TPU-friendly equivalent of :func:`_bilinear_sample_zero_pad`.

    XLA lowers the 4-tap gather to a slow per-element path on TPU (it was
    ~75% of the whole silhouette-fit iteration, BENCH_NOTES.md).  This
    form builds separable hinge ("one-hot pair") weight matrices and
    samples via one ``[N, H] @ [H, W]`` matmul on the MXU instead —
    identical values (the hinge ``max(0, 1-|i-y|)`` has the same two
    nonzeros as the bilinear taps, and rows/cols outside the image get
    all-zero weights = zero padding), ~3.7x faster at 512^2.  Default
    matmul precision is deliberate: operands are exact mask values and
    sub-1 weights, accumulation is f32, and HIGHEST costs 3.9x for a
    <1e-4 relative difference.
    """
    sampled, _ = _bilinear_sample_onehot_cov(img, xy, imsize)
    return sampled


def _bilinear_sample_onehot_cov(
    img: jax.Array, xy: jax.Array, imsize: float
) -> tuple[jax.Array, jax.Array]:
    """One-hot bilinear sample plus per-point in-image *coverage*.

    ``coverage`` is the same sample taken from a constant-1 image, which
    factorizes into ``rowsum * colsum`` — so ``coverage - sampled``
    equals sampling ``1 - img`` with zero padding without ever
    materializing the complement image.
    """
    row_w, col_w = _separable_bilinear_weights(img.shape, xy, img.dtype, imsize)
    rows = jax.lax.dot_general(
        row_w, img, (((1,), (0,)), ((), ()))
    )                                                           # [N, W]
    sampled = jnp.sum(rows * col_w, axis=-1)
    coverage = jnp.sum(row_w, -1) * jnp.sum(col_w, -1)
    return sampled, coverage


@jax.custom_vjp
def _stay_inside_pallas(img: jax.Array, xyhat: jax.Array):
    """(sampled, coverage) via the fused Pallas kernel; positions in
    pixel-grid units (pre-scaled).  The kernel's forward already yields
    the positional derivatives, so the backward is elementwise.  The
    image cotangent is pinned to zero: masks are observations, never
    optimized (the loss treats them as constants).  Kink subgradients
    (|i - y| exactly 0 or 1) follow sign() conventions rather than the
    XLA hinge's maximum-tie rule — a measure-zero divergence."""
    s, c, *_ = _stay_inside_fwd_impl(img, xyhat)
    return s, c


def _stay_inside_fwd_impl(img, xyhat):
    from bodyfitting_tpu.ops.pallas_kernels import bilinear_cov_grads

    out = bilinear_cov_grads(
        img, xyhat, interpret=jax.default_backend() != "tpu",
        row_window=STAY_INSIDE_ROW_WINDOW,
    )
    return tuple(out)


def _stay_inside_fwd(img, xyhat):
    s, c, ds_dx, ds_dy, dc_dx, dc_dy = _stay_inside_fwd_impl(img, xyhat)
    return (s, c), (img, ds_dx, ds_dy, dc_dx, dc_dy)


def _stay_inside_bwd(res, g):
    img, ds_dx, ds_dy, dc_dx, dc_dy = res
    gs, gc = g
    gx = gs * ds_dx + gc * dc_dx
    gy = gs * ds_dy + gc * dc_dy
    return jnp.zeros_like(img), jnp.stack([gx, gy], axis=-1)


_stay_inside_pallas.defvjp(_stay_inside_fwd, _stay_inside_bwd)


@jax.custom_vjp
def _contour_matched_pallas(contour, proj, inside_f):
    """(matched [P, 2], in_match [P]) of the contour->vertex ICP match,
    via the payload kernel (ops.pallas_kernels.contour_match_full) — no
    [P, M] one-hot in HBM.  Matching is over INSIDE-projecting vertices
    only (reference loss.py:96-101).  Gradient: d matched / d proj is
    row selection; the backward scatters cotangent rows back to the
    winning vertices (rows_scatter_add).  contour/inside get zero
    cotangents (the argmin is gradient-stopped, reference loss.py:240
    semantics; contour's own gradient path — the ICP distance — is
    outside this op)."""
    matched, in_match, _ = _contour_matched_fwd_impl(contour, proj, inside_f)
    return matched, in_match


def _contour_matched_fwd_impl(contour, proj, inside_f):
    from bodyfitting_tpu.ops.pallas_kernels import contour_match_full

    _, idx, matched, in_match = contour_match_full(
        contour, jax.lax.stop_gradient(proj), inside_f, inside_f,
        interpret=jax.default_backend() != "tpu",
    )
    return matched, in_match, idx


def _contour_matched_fwd(contour, proj, inside_f):
    matched, in_match, idx = _contour_matched_fwd_impl(
        contour, proj, inside_f
    )
    return (matched, in_match), (idx, proj.shape[0], contour, inside_f)


def _contour_matched_bwd(res, g):
    from bodyfitting_tpu.ops.pallas_kernels import rows_scatter_add

    idx, M, contour, inside_f = res
    g_matched, _ = g
    dproj = rows_scatter_add(
        idx, g_matched, M, interpret=jax.default_backend() != "tpu"
    ).T
    return jnp.zeros_like(contour), dproj, jnp.zeros_like(inside_f)


_contour_matched_pallas.defvjp(_contour_matched_fwd, _contour_matched_bwd)


def _stay_inside_cov(img: jax.Array, xy: jax.Array, imsize: float):
    """Dispatch for the stay-inside sample+coverage pair (see
    :data:`STAY_INSIDE`).  Both paths implement torch-1.2.0
    ``grid_sample(img, xy/imsize*2-1)`` zero-padded bilinear taps."""
    if _use_pallas_stay_inside():
        H, W = img.shape
        scale = jnp.asarray(
            [(W - 1) / imsize, (H - 1) / imsize], img.dtype
        )
        return _stay_inside_pallas(img, xy * scale)
    return _bilinear_sample_onehot_cov(img, xy, imsize)


# ---------------------------------------------------------------------------
# Content-cropped stay-inside path
# ---------------------------------------------------------------------------
#
# The stay-inside kernel's cost is O(N (H + W)) VPU work + an
# [N, H] @ [H, W] gather-dot — at 512^2 it owned the production mask fit
# (BENCH_NOTES r4/r5: the full-sweep kernel is VPU-elementwise bound;
# row-windowed and row-banded variants both measured SLOWER than the full
# sweep).  The winning lever is the IMAGE EXTENT: masks are constants
# through the fit, so the kernel can run on a CONTENT-CROPPED mask —
# bilinear zero-padded sampling of the full mask equals sampling the crop
# (every nonzero pixel is inside the crop), and the coverage term (the
# same sample of a constant-1 full image) collapses to a per-point closed
# form against the full image bounds, computed in O(N) XLA.  Measured at
# the production 3b shape: 8.97 -> 5.7 ms/iter at a [304, 256] crop
# (bench_stay_inside.py).


def coverage_closed_form(xyhat: jax.Array, full_hw: tuple) -> jax.Array:
    """Per-point in-image coverage, closed form.

    ``coverage(p)`` is the zero-padded bilinear sample of a constant-1
    ``[H, W]`` image at pixel-grid position ``p`` — which factorizes into
    ``rowsum(y) * colsum(x)`` with
    ``rowsum(y) = sum_h max(0, 1 - |h - y|) = clip(min(y + 1, H - y), 0, 1)``
    (1 in the interior, linear ramps over the one-pixel borders, 0
    outside).  Algebraically identical to the hinge-matrix form the
    kernels compute; float values can differ by ~1 ulp (the hinge sum
    computes ``(1-f) + f``).  Autodiff subgradients at the kinks follow
    min/clip conventions rather than the kernel's ``sign()`` — a
    measure-zero divergence like the one already documented for
    :func:`_stay_inside_pallas`.

    ``xyhat [N, 2]`` in PIXEL-GRID units (already scaled by
    ``(size-1)/imsize``); ``full_hw = (H, W)`` of the full image.
    """
    H, W = full_hw
    x = xyhat[..., 0]
    y = xyhat[..., 1]
    rs = jnp.clip(jnp.minimum(y + 1.0, float(H) - y), 0.0, 1.0)
    cs = jnp.clip(jnp.minimum(x + 1.0, float(W) - x), 0.0, 1.0)
    return rs * cs


def _coverage_and_grads(xyhat, full_hw):
    """Closed-form coverage + ANALYTIC x/y derivatives (instead of
    autodiffing the clip/min chain — jax's clip VJP expands into ~30
    select/divide passes whose layouts thrash, measured +5 ms/iter at
    the production shape).  Ramp derivative is ±1 on the open border
    ramps, 0 elsewhere (same measure-zero kink conventions as the
    kernels)."""
    H, W = full_hw
    x = xyhat[..., 0]
    y = xyhat[..., 1]

    def axis_cov(v, n):
        lo = v + 1.0
        hi = float(n) - v
        c = jnp.clip(jnp.minimum(lo, hi), 0.0, 1.0)
        on_ramp = (c > 0.0) & (c < 1.0)
        dc = jnp.where(on_ramp, jnp.where(lo < hi, 1.0, -1.0), 0.0)
        return c, dc

    rs, drs = axis_cov(y, H)
    cs, dcs = axis_cov(x, W)
    return rs * cs, dcs * rs, drs * cs        # cov, dcov_dx, dcov_dy


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _stay_inside_sample_crop(crop: jax.Array, xyhat: jax.Array,
                             origin: jax.Array, full_hw: tuple):
    """(sampled, coverage) for the crop path: the sampled value comes
    from the fused kernel on the content-cropped mask (positions shifted
    into crop coordinates INSIDE this op), the coverage from the closed
    form against the FULL image bounds.  One custom-vjp whose backward
    is a single elementwise combine + ONE stacked ``[.., 2]`` cotangent
    — mirroring the full path exactly: a two-input variant (xyc + xyhat)
    paid two ``[BV, M, 2]`` cotangent relayouts and measured +3 ms/iter
    at the production shape (BENCH_NOTES r5).  Image and origin
    cotangents pinned to zero (observations)."""
    s, *_ = _stay_inside_crop_fwd_impl(crop, xyhat - origin)
    cov, _, _ = _coverage_and_grads(xyhat, full_hw)
    return s, cov


def _stay_inside_crop_fwd_impl(crop, xyc):
    from bodyfitting_tpu.ops.pallas_kernels import bilinear_cov_grads

    return tuple(bilinear_cov_grads(
        crop, xyc, interpret=jax.default_backend() != "tpu",
        with_cov=False,
    ))


def _stay_inside_crop_fwd(crop, xyhat, origin, full_hw):
    s, _, ds_dx, ds_dy, *_ = _stay_inside_crop_fwd_impl(
        crop, xyhat - origin
    )
    cov, dc_dx, dc_dy = _coverage_and_grads(xyhat, full_hw)
    return (s, cov), (crop, origin, ds_dx, ds_dy, dc_dx, dc_dy)


def _stay_inside_crop_bwd(full_hw, res, g):
    crop, origin, ds_dx, ds_dy, dc_dx, dc_dy = res
    gs, gc = g
    gx = gs * ds_dx + gc * dc_dx
    gy = gs * ds_dy + gc * dc_dy
    return (
        jnp.zeros_like(crop),
        jnp.stack([gx, gy], axis=-1),
        jnp.zeros_like(origin),
    )


_stay_inside_sample_crop.defvjp(
    _stay_inside_crop_fwd, _stay_inside_crop_bwd
)


def _stay_inside_cov_crop(
    crop: jax.Array, origin: jax.Array, xy: jax.Array, imsize: float,
    full_hw: tuple,
):
    """Crop-path (sampled, coverage): identical values to
    :func:`_stay_inside_cov` on the full mask (up to ~1 ulp in coverage)
    whenever the crop contains every nonzero mask pixel plus a one-pixel
    zero margin (guaranteed by :func:`compute_mask_crops`)."""
    H, W = full_hw
    scale = jnp.asarray(
        [(W - 1) / imsize, (H - 1) / imsize], crop.dtype
    )
    xyhat = xy * scale
    if _use_pallas_stay_inside():
        return _stay_inside_sample_crop(crop, xyhat, origin,
                                        tuple(full_hw))
    xyc = xyhat - origin
    cov = coverage_closed_form(xyhat, full_hw)
    Hc, Wc = crop.shape
    iy = jnp.arange(Hc, dtype=crop.dtype)[None, :]
    ix = jnp.arange(Wc, dtype=crop.dtype)[None, :]
    row_w = jnp.maximum(0.0, 1.0 - jnp.abs(iy - xyc[:, 1:2]))
    col_w = jnp.maximum(0.0, 1.0 - jnp.abs(ix - xyc[:, 0:1]))
    rows = jax.lax.dot_general(row_w, crop, (((1,), (0,)), ((), ())))
    s = jnp.sum(rows * col_w, axis=-1)
    return s, cov


# ---------------------------------------------------------------------------
# Fused per-view mask term (crop path)
# ---------------------------------------------------------------------------
#
# With the ICP and stay-inside terms as SEPARATE custom-vjp ops, the
# projection cotangent is the SUM of two [.., M, 2] arrays built in
# different native layouts (rows_scatter_add's [2, M].T vs the
# stay-inside stack([gx, gy], -1)) plus a chain through xyhat = proj *
# scale — XLA reconciles them with {0,2,1} relayouts inside the 600-iter
# scan (BENCH_NOTES r5: ~1.7 ms/iter of the staged step was attributed
# to neither term alone).  This op computes BOTH terms of one view in a
# single custom vjp whose backward assembles the combined projection
# cotangent once, with the scale chain folded in.  Values and gradients
# are identical to the separate ops (same kernels, same algebra;
# tests/test_silhouette.py pins both).

# Trace-time switch like STAY_INSIDE: 'auto' = the SEPARATE ops (the
# reference path) everywhere — the fused op measured NEUTRAL at the
# production 3b shape (15.24 vs 15.06 ms/iter fused-vs-separate, same
# session, B=32; BENCH_NOTES round-5 kernel study): XLA was already
# reconciling the two cotangent layouts for free, so the single-
# cotangent rewrite buys nothing in-fit.  The op stays in-tree,
# parity-tested, selectable with FUSED_MASK_TERM = 'fused'.
FUSED_MASK_TERM = "auto"


def _use_fused_mask_term() -> bool:
    if FUSED_MASK_TERM == "fused":
        return True
    return False


def _mask_view_terms_impl(proj, contour, cvalid, crop, origin, vvalid,
                          imsize, epsilon, full_hw, with_grads):
    from bodyfitting_tpu.ops.pallas_kernels import (
        bilinear_cov_grads, contour_match_full,
    )

    interp = jax.default_backend() != "tpu"
    H, W = full_hw
    scale = jnp.asarray(
        [(W - 1) / imsize, (H - 1) / imsize], proj.dtype
    )
    xyhat = proj * scale

    # stay-inside: fused sampler on the content crop + closed-form
    # coverage against the full image bounds (same ops as
    # _stay_inside_sample_crop)
    s, _, ds_dx, ds_dy, *_ = bilinear_cov_grads(
        crop, xyhat - origin, interpret=interp, with_cov=False,
        with_grads=with_grads,
    )
    cov, dc_dx, dc_dy = _coverage_and_grads(xyhat, full_hw)
    binary = vvalid * jnp.sum(cov - s)

    # contour ICP (same ops as _contour_matched_pallas + the mindist /
    # epsilon-coefficient chain of per_view)
    inside = (
        (proj[:, 0] >= 0) & (proj[:, 0] < imsize)
        & (proj[:, 1] >= 0) & (proj[:, 1] < imsize)
    )
    inside_f = inside.astype(proj.dtype)
    _, idx, matched, in_match = contour_match_full(
        contour, proj, inside_f, inside_f, interpret=interp
    )
    dist = jnp.sqrt(jnp.sum((contour - matched) ** 2, -1) + 1e-12)
    live = in_match > 0.5
    mindist = jnp.where(live, dist, 0.0)
    mx = jnp.clip(matched[:, 0].astype(jnp.int32), 0, W - 1)
    my = jnp.clip(matched[:, 1].astype(jnp.int32), 0, H - 1)
    mxy = jnp.stack([mx, my], -1).astype(crop.dtype) - origin
    mask_at = bilinear_cov_grads(
        crop, mxy, interpret=interp, with_grads=False, with_cov=False
    )[0]
    outside_mask = (mask_at < 0.1).astype(proj.dtype)
    coeff = outside_mask * (epsilon - 1.0) + 1.0
    icp = jnp.sum(mindist * coeff * cvalid)

    res = (idx, matched, contour, live, dist, coeff, cvalid, vvalid,
           crop, origin, ds_dx, ds_dy, dc_dx, dc_dy, scale,
           proj.shape[0])
    return icp, binary, res


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _mask_view_terms_fused(proj, contour, cvalid, crop, origin, vvalid,
                           imsize, epsilon, full_hw):
    """(icp, binary) of ONE view's mask loss as a single custom-vjp op.

    proj ``[M, 2]`` projected strided vertices (the only differentiable
    input — contour/crop/origin/validities are observations and get zero
    cotangents).  Reference semantics: loss.py:85-130 (ICP with the
    epsilon outside-mask coefficient) + the stay-inside binary term.
    """
    icp, binary, _ = _mask_view_terms_impl(
        proj, contour, cvalid, crop, origin, vvalid,
        imsize, epsilon, full_hw, with_grads=False,
    )
    return icp, binary


def _mask_view_terms_fwd(proj, contour, cvalid, crop, origin, vvalid,
                         imsize, epsilon, full_hw):
    icp, binary, res = _mask_view_terms_impl(
        proj, contour, cvalid, crop, origin, vvalid,
        imsize, epsilon, full_hw, with_grads=True,
    )
    return (icp, binary), res


def _mask_view_terms_bwd(imsize, epsilon, full_hw, res, g):
    from bodyfitting_tpu.ops.pallas_kernels import rows_scatter_add

    (idx, matched, contour, live, dist, coeff, cvalid, vvalid,
     crop, origin, ds_dx, ds_dy, dc_dx, dc_dy, scale, M) = res
    g_icp, g_binary = g

    # d icp / d matched, scattered to the winning vertices ([2, M] rows
    # — consumed as rows, never transposed)
    w = jnp.where(live, g_icp * coeff * cvalid / dist, 0.0)
    g_matched = w[:, None] * (matched - contour)            # [P, 2]
    d2 = rows_scatter_add(
        idx, g_matched, M,
        interpret=jax.default_backend() != "tpu",
    )                                                       # [2, M]

    # d binary / d proj (scale chain folded in)
    gb = g_binary * vvalid
    gx = d2[0] + gb * (dc_dx - ds_dx) * scale[0]
    gy = d2[1] + gb * (dc_dy - ds_dy) * scale[1]
    dproj = jnp.stack([gx, gy], axis=-1)                    # [M, 2] once

    z = jnp.zeros_like
    return (dproj, z(contour), z(cvalid), z(crop), z(origin), z(vvalid))


_mask_view_terms_fused.defvjp(_mask_view_terms_fwd, _mask_view_terms_bwd)


def compute_mask_crops(
    masks: Sequence[np.ndarray],
    crop_hw: tuple | None = None,
    margin: int = 2,
) -> tuple[np.ndarray, np.ndarray, tuple]:
    """Host-side content crops for the stay-inside term.

    Args:
      masks: list of ``[H, W]`` masks (full images; any binarizable
        scale).
      crop_hw: static crop shape ``(Hc, Wc)``; None picks the smallest
        shape containing every view's content + ``margin``, rounded up to
        (8, 128) multiples (TPU tiling), clipped to the image.
      margin: zero-pixel border kept around the content so bilinear taps
        at the content boundary stay inside the crop.

    Returns:
      ``(crops [Vm, Hc, Wc] float32, origins [Vm, 2] float32 (x0, y0),
      (Hc, Wc))``.  Raises ValueError if a view's content + margin cannot
      fit in the requested ``crop_hw``.
    """
    bins = [binarize_mask(m) for m in masks]
    H, W = bins[0].shape
    boxes = []
    for b in bins:
        ys, xs = np.nonzero(b)
        if ys.size == 0:
            boxes.append((0, 1, 0, 1))
        else:
            boxes.append((int(ys.min()), int(ys.max()) + 1,
                          int(xs.min()), int(xs.max()) + 1))
    need_h = max(y1 - y0 for y0, y1, _, _ in boxes) + 2 * margin
    need_w = max(x1 - x0 for _, _, x0, x1 in boxes) + 2 * margin
    if crop_hw is None:
        Hc = min(H, int(-(-need_h // 8) * 8))
        Wc = min(W, int(-(-need_w // 128) * 128))
    else:
        Hc, Wc = crop_hw
        if (need_h > Hc and Hc < H) or (need_w > Wc and Wc < W):
            raise ValueError(
                f"mask content {need_h}x{need_w} exceeds crop {Hc}x{Wc}"
            )
    crops = np.zeros((len(bins), Hc, Wc), np.float32)
    origins = np.zeros((len(bins), 2), np.float32)
    for i, (b, (y0, y1, x0, x1)) in enumerate(zip(bins, boxes)):
        # window containing content + margin, shifted to fit the image
        oy = min(max(y0 - margin, 0), H - Hc)
        ox = min(max(x0 - margin, 0), W - Wc)
        crops[i] = b[oy:oy + Hc, ox:ox + Wc]
        origins[i] = (ox, oy)
    return crops, origins, (Hc, Wc)


def _separable_bilinear_weights(shape, xy, dtype, imsize):
    """Hinge weight matrices ``(row_w [N, H], col_w [N, W])`` whose outer
    product per point is the zero-padded bilinear tap pattern of
    torch-1.2.0 ``grid_sample`` (align_corners=True semantics) for
    normalised coords ``xy/imsize*2-1``."""
    H, W = shape
    x = xy[:, 0] * ((W - 1) / imsize)
    y = xy[:, 1] * ((H - 1) / imsize)
    iy = jnp.arange(H, dtype=dtype)[None, :]
    ix = jnp.arange(W, dtype=dtype)[None, :]
    row_w = jnp.maximum(0.0, 1.0 - jnp.abs(iy - y[:, None]))
    col_w = jnp.maximum(0.0, 1.0 - jnp.abs(ix - x[:, None]))
    return row_w, col_w


def silhouette_loss(
    contours: jax.Array,
    contour_valid: jax.Array,
    masks: jax.Array,
    w2cs: jax.Array,
    Ks: jax.Array,
    verts: jax.Array,
    *,
    vertex_stride: int = 4,
    epsilon: float = 10.0,
    imsize: float = 512.0,
    terms: tuple = ("icp", "binary"),
    mask_crops: jax.Array | None = None,
    mask_crop_origins: jax.Array | None = None,
    mask_view_valid: jax.Array | None = None,
    full_hw: tuple | None = None,
) -> jax.Array:
    """Multi-view mask loss for one frame.

    Args:
      contours: ``[Vm, P, 2]`` padded contour pixels (x, y).
      contour_valid: ``[Vm, P]`` 1.0 for real contour pixels.
      masks: ``[Vm, H, W]`` float masks in [0, 1].
      w2cs: ``[Vm, 4, 4]``; Ks: ``[Vm, 3, 3]``.
      verts: ``[V, 3]`` SMPL vertices (world, already scaled).

    ``terms`` selects which of the two loss terms to compute ("icp",
    "binary") — production always uses both; the knob exists for cost
    attribution in ``bench_mask_ablation.py``.

    PADDING CONVENTION: ``contour_valid`` zeroes only the contour-ICP
    term.  The differentiable stay-inside term samples ``1 - mask`` for
    every view, so a padded view's mask MUST be all-ONES (nothing is
    "outside"), not all-zeros — an all-zero pad would penalize every
    projected vertex and push the body out of the image.
    ``fitting.body_fitting.build_observations`` pads this way.

    CROP PATH: when ``mask_crops [Vm, Hc, Wc]`` + ``mask_crop_origins
    [Vm, 2]`` (from :func:`compute_mask_crops`) are given, the mask
    samples run on the content crops and the coverage term uses the
    closed form against ``full_hw`` — identical values (~1 ulp in
    coverage), a measured ~1.6x on the stay-inside kernel at 512^2
    (BENCH_NOTES r5).  ``masks`` may then be None; padded views are
    zeroed by ``mask_view_valid`` instead of the all-ones convention
    (closed-form coverage cannot see an all-ones pad).
    """
    from bodyfitting_tpu.ops.camera import perspective_projection

    use_crops = mask_crops is not None
    if use_crops:
        if full_hw is None:
            full_hw = (int(imsize), int(imsize))
        if mask_view_valid is None:
            mask_view_valid = jnp.ones(mask_crops.shape[0],
                                       mask_crops.dtype)
        if masks is None:
            masks = jnp.zeros((mask_crops.shape[0], 1, 1),
                              mask_crops.dtype)  # unused placeholder
    else:
        mask_crops = jnp.zeros((w2cs.shape[0], 1, 1), w2cs.dtype)
        mask_crop_origins = jnp.zeros((w2cs.shape[0], 2), w2cs.dtype)
        mask_view_valid = jnp.ones(w2cs.shape[0], w2cs.dtype)

    pts3d = verts[::vertex_stride]

    def per_view(w2c, K, contour, cvalid, mask, crop, origin, vvalid):
        proj = perspective_projection(
            pts3d[None], w2c[None, :3, :3], w2c[None, :3, 3], K[None]
        )[0]                                               # [M, 2]
        if (use_crops and set(terms) == {"icp", "binary"}
                and _use_pallas_stay_inside() and _use_pallas_match()
                and _use_fused_mask_term()):
            # both terms in ONE custom vjp: the combined projection
            # cotangent is assembled once (see _mask_view_terms_fused)
            return _mask_view_terms_fused(
                proj, contour, cvalid, crop, origin, vvalid,
                imsize, float(epsilon), tuple(full_hw),
            )
        inside = (
            (proj[:, 0] >= 0) & (proj[:, 0] < imsize)
            & (proj[:, 1] >= 0) & (proj[:, 1] < imsize)
        )

        def stay_cov(pts):
            if use_crops:
                return _stay_inside_cov_crop(
                    crop, origin, pts, imsize, full_hw
                )
            return _stay_inside_cov(mask, pts, imsize)

        if "icp" not in terms:
            icp = jnp.zeros((), proj.dtype)
            sampled, coverage = stay_cov(proj)
            return icp, vvalid * jnp.sum(coverage - sampled)
        # contour -> model matching over inside-projecting vertices,
        # gradients stopped through the argmin (non-differentiable
        # anyway); matched-pair distances recompute through the match so
        # the backward never scatters into a [P, M] matrix.
        H, W = full_hw if use_crops else mask.shape
        if _use_pallas_match():
            # fused kernel returns the payloads directly: no [P, M]
            # one-hot and no [P, H]/[P, W] selection matrices in HBM
            # (those were most of the ICP term's wall, r4 ablation)
            matched, in_match = _contour_matched_pallas(
                contour, proj, inside.astype(proj.dtype)
            )
        else:
            proj_ng = jax.lax.stop_gradient(proj)
            d2 = jnp.sum(
                (contour[:, None, :] - proj_ng[None, :, :]) ** 2, -1
            )
            d2 = jnp.where(inside[None, :], d2, _BIG)
            idx = jnp.argmin(d2, axis=1)                   # [P]
            # matched coords / inside flags via an exact one-hot matmul:
            # point-gathers lower to a slow per-element TPU path; a
            # single-nonzero-per-row one-hot gives identical values in
            # any matmul precision and the same gradient (d matched /
            # d proj is the same row-selection).
            M = proj.shape[0]
            onehot = (
                idx[:, None] == jnp.arange(M, dtype=idx.dtype)[None, :]
            ).astype(proj.dtype)                           # [P, M]
            # HIGHEST: default-precision operand rounding would perturb
            # the *coordinates* (~0.1px at 512); with one nonzero per
            # row HIGHEST reproduces the gather bit-exactly.
            matched = jnp.matmul(
                onehot, proj, precision=jax.lax.Precision.HIGHEST
            )                                              # [P, 2]
            in_match = onehot @ inside.astype(proj.dtype)  # [P]
        mindist = jnp.sqrt(
            jnp.sum((contour - matched) ** 2, -1) + 1e-12
        )
        # in_match < 0.5 happens only when NO strided vertex projects
        # inside this view (argmin otherwise picks an inside one): there
        # is nothing to match, so the view's ICP term is dropped — a
        # gradient-free _BIG constant here would explode the loss value
        # (~1.6e7/view) without adding any corrective signal
        mindist = jnp.where(in_match > 0.5, mindist, 0.0)
        mx = jnp.clip(
            jax.lax.stop_gradient(matched[:, 0]).astype(jnp.int32), 0, W - 1
        )
        my = jnp.clip(
            jax.lax.stop_gradient(matched[:, 1]).astype(jnp.int32), 0, H - 1
        )
        # in crop mode the matched-pixel lookup runs on the crop too:
        # every nonzero mask pixel is inside the crop, so an
        # outside-the-crop pixel reads 0 from either image
        look_img = crop if use_crops else mask
        mxy = jnp.stack([mx, my], -1).astype(look_img.dtype)
        if use_crops:
            mxy = mxy - origin
        if _use_pallas_stay_inside():
            # nearest-sample at integer pixels == bilinear at those
            # integer coordinates, exactly (hinge weight 1 at the pixel,
            # 0 at neighbours; 0/1 mask values are exact in bf16)
            from bodyfitting_tpu.ops.pallas_kernels import (
                bilinear_cov_grads,
            )

            mask_at = bilinear_cov_grads(
                look_img,
                mxy,
                interpret=jax.default_backend() != "tpu",
                with_grads=False,
                with_cov=False,
            )[0]
        else:
            # nearest-sample the mask at the matched pixels, one-hot
            Hl, Wl = look_img.shape
            rowsel = (
                mxy[:, 1:2] == jnp.arange(Hl, dtype=look_img.dtype)[None]
            ).astype(look_img.dtype)                       # [P, Hl]
            colsel = (
                mxy[:, 0:1] == jnp.arange(Wl, dtype=look_img.dtype)[None]
            ).astype(look_img.dtype)                       # [P, Wl]
            mask_at = jnp.sum((rowsel @ look_img) * colsel, axis=-1)
        outside_mask = (mask_at < 0.1).astype(proj.dtype)
        coeff = outside_mask * (epsilon - 1.0) + 1.0
        icp = jnp.sum(mindist * coeff * cvalid)

        # differentiable "stay inside" term over all projected vertices:
        # sum of (1 - mask) sampled at proj with zero padding.  Computed
        # as coverage - mask_sample so the (1 - mask) image is never
        # materialized inside the optimization loop (the scan does not
        # hoist it; it cost ~4 ms/iter at 8 frames x 8 views): sampling
        # the constant-1 image with separable zero-padded bilinear
        # weights factorizes into rowsum * colsum.
        if "binary" in terms:
            sampled, coverage = stay_cov(proj)
            binary = vvalid * jnp.sum(coverage - sampled)
        else:
            binary = jnp.zeros((), proj.dtype)
        return icp, binary

    icp, binary = jax.vmap(per_view)(
        w2cs, Ks, contours, contour_valid, masks,
        mask_crops, mask_crop_origins, mask_view_valid,
    )
    return jnp.sum(icp) + jnp.sum(binary) * epsilon
