"""Bucketed one-hot UV texture sampling for the texture-fit hot loop.

The reference's texture fit samples the optimised texture at every visible
pixel each Adam iteration (``nr.Renderer.render_rgb`` texture sampling,
/root/reference/thirdparty/neural_renderer/neural_renderer/rasterize.py:253
+ cuda/load_textures path; driven from
/root/reference/smplify/texture_fitting.py:257-276).  The direct JAX port
(``ops.rasterize.bilinear_sample_uv``) expresses this as 4 per-pixel
advanced-indexing gathers into the ``[S, S, 3]`` texture — the same
slow-on-TPU per-element lowering the silhouette and SDF terms replaced
with one-hot matmuls (measured 51 ms/iter fwd+bwd at 512^2 pixels into a
1024^2 texture, 99% of the whole texture-fit step).

A full one-hot over the S^2 texels is out of reach (a ``[N, S^2]`` weight
matrix is ~1 GB), so this module *buckets*: pixels are sorted by their top
texture row ``y0`` on the host (the UV map is fixed per camera pose — the
geometry never moves during texture fitting) and greedily packed into
fixed-size **work items** of at most ``chunk`` pixels whose rows all fall
inside an ``(R+1)``-row texture window.  Each item is then two dense
contractions on the MXU:

    P   = W_x [K, S] @ T_window [S, (R+1)*C]     (2 nonzeros per W_x row)
    out = sum_r W_y [K, R+1] * P [K, R+1, C]     (2 nonzeros per W_y row)

The item count is deterministically bounded: a new item starts only when
the previous one is full (``<= ceil(N/chunk)`` times) or the row window is
exhausted (``<= ceil(S/R)`` times), so FLOPs stay ~2*N*S*(R+1)*C*2 no
matter how skewed the UV atlas is.  Padded slots carry zero weights and a
zero validity mask.  The plan replicates ``bilinear_sample_uv``'s float32
tap/weight arithmetic bit-for-bit on the host; at HIGHEST matmul
precision the sampled values match the gather form up to f32 summation
order (~1 ulp of the 4-tap blend).

Because the L1 render loss is permutation-invariant, the plan also carries
the target pixels in bucket order plus the constant background-pixel
contribution — ``plan_l1_loss`` needs no scatter back to image layout.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UVSamplePlan:
    """Host-precomputed bucketed sampling plan for one camera pose.

    Shapes: ``I`` work items x ``K`` pixel slots; texture ``[S, S, C]``.
    """

    row_start: jax.Array   # [I] i32 first texture row of each item window
    x0: jax.Array          # [I, K] i16 left tap column
    x1: jax.Array          # [I, K] i16 right tap column (clamped)
    wx: jax.Array          # [I, K] f32 right-tap weight
    dy: jax.Array          # [I, K] i8 top tap row offset in window
    dy1: jax.Array         # [I, K] i8 bottom tap row offset (clamped)
    wy: jax.Array          # [I, K] f32 bottom-tap weight
    valid: jax.Array       # [I, K] f32 1 for real pixels, 0 for padding
    target: jax.Array      # [I, K, C] f32 target pixels in bucket order
    const_loss: jax.Array  # [] f32 background pixels' |target - bg| sum
    window_rows: int       # static: R (window holds R+1 rows)

    @property
    def num_items(self) -> int:
        return self.row_start.shape[0]


jax.tree_util.register_dataclass(
    UVSamplePlan,
    data_fields=["row_start", "x0", "x1", "wx", "dy", "dy1", "wy",
                 "valid", "target", "const_loss"],
    meta_fields=["window_rows"],
)


def _bilinear_taps(uv: np.ndarray, size: int):
    """Replicate ``rasterize.bilinear_sample_uv`` tap math in float32.

    Returns int32 ``x0, x1, y0, y1`` and float32 ``wx, wy`` identical to
    what the device gather path computes (same clips, same f32 rounding).
    """
    uv = uv.astype(np.float32)
    s1 = np.float32(size - 1)
    x = uv[:, 0] * s1
    y = (np.float32(1.0) - uv[:, 1]) * s1
    x0 = np.clip(np.floor(x), 0, size - 1)
    y0 = np.clip(np.floor(y), 0, size - 1)
    x1 = np.clip(x0 + np.float32(1.0), 0, size - 1)
    y1 = np.clip(y0 + np.float32(1.0), 0, size - 1)
    wx = np.clip(x - x0, np.float32(0.0), np.float32(1.0))
    wy = np.clip(y - y0, np.float32(0.0), np.float32(1.0))
    return (x0.astype(np.int32), x1.astype(np.int32),
            y0.astype(np.int32), y1.astype(np.int32),
            wx.astype(np.float32), wy.astype(np.float32))


def build_uv_sample_plan(
    uv_map: np.ndarray,
    fg: np.ndarray,
    target: np.ndarray,
    tex_size: int,
    background: float = 1.0,
    chunk: int = 2048,
    window_rows: int = 8,
) -> UVSamplePlan:
    """Bucket the foreground pixels of one pose into MXU work items.

    Args:
      uv_map: ``[H, W, 2]`` per-pixel UVs (OBJ convention, v up).
      fg: ``[H, W]`` bool foreground coverage.
      target: ``[H, W, C]`` the (stop-gradient) scan render to match.
      tex_size: texture side S.
      background: the constant background value of the sampled render.
      chunk: pixel slots per work item K.
      window_rows: R; each item reads an (R+1)-row texture window.
    """
    S, R = int(tex_size), int(window_rows)
    uv_map = np.asarray(uv_map)
    fg = np.asarray(fg).astype(bool)
    target = np.asarray(target, np.float32)
    C = target.shape[-1]

    fg_flat = fg.reshape(-1)
    tgt_flat = target.reshape(-1, C)
    const = float(
        np.sum(np.abs(tgt_flat[~fg_flat] - np.float32(background)))
    )

    uv_fg = uv_map.reshape(-1, 2)[fg_flat]
    tgt_fg = tgt_flat[fg_flat]
    x0, x1, y0, y1, wx, wy = _bilinear_taps(uv_fg, S)

    order = np.argsort(y0, kind="stable")
    y0s = y0[order]
    n = y0s.shape[0]

    # Greedy packing over the sorted pixels: per-ITEM python loop (a few
    # hundred), never per-pixel.
    starts: List[int] = []
    ends: List[int] = []
    rows: List[int] = []
    if R < 1 or R > 127 or S <= R:
        raise ValueError(
            f"window_rows={R} must be in [1, min(127, tex_size={S} - 1)]"
        )
    if S > 32767:
        raise ValueError(f"tex_size={S} exceeds the int16 tap columns")
    p = 0
    while p < n:
        row = int(min(y0s[p], S - 1 - R))
        # first pixel whose top row no longer fits the [row, row+R) span
        # (the bottom tap y1 <= y0+1 <= row+R always fits the R+1 window)
        cut = int(np.searchsorted(y0s, row + R, side="left"))
        if cut <= p:
            # only reachable when y0s[p] == S-1 (the floor clamp): those
            # pixels' bottom tap is also clamped to S-1 == row+R, so the
            # window's inclusive last row holds both taps
            cut = int(np.searchsorted(y0s, row + R, side="right"))
        end = min(p + chunk, cut)
        starts.append(p)
        ends.append(end)
        rows.append(row)
        p = end
    n_items = max(len(starts), 1)

    def padded(vals, fill, dtype):
        out = np.full((n_items, chunk), fill, dtype)
        for i, (a, b) in enumerate(zip(starts, ends)):
            out[i, : b - a] = vals[order[a:b]]
        return out

    row_start = np.zeros((n_items,), np.int32)
    row_start[: len(rows)] = rows
    # compact tap dtypes halve the plan's device footprint (columns fit
    # int16 for any realistic atlas, window offsets fit int8 for R<=127)
    dy = np.zeros((n_items, chunk), np.int8)
    dy1 = np.zeros((n_items, chunk), np.int8)
    tgt = np.zeros((n_items, chunk, C), np.float32)
    valid = np.zeros((n_items, chunk), np.float32)
    for i, (a, b) in enumerate(zip(starts, ends)):
        sel = order[a:b]
        dy[i, : b - a] = y0[sel] - rows[i]
        dy1[i, : b - a] = y1[sel] - rows[i]
        tgt[i, : b - a] = tgt_fg[sel]
        valid[i, : b - a] = 1.0

    return UVSamplePlan(
        row_start=jnp.asarray(row_start),
        x0=jnp.asarray(padded(x0, 0, np.int16)),
        x1=jnp.asarray(padded(x1, 0, np.int16)),
        wx=jnp.asarray(padded(wx, 0.0, np.float32)),
        dy=jnp.asarray(dy),
        dy1=jnp.asarray(dy1),
        wy=jnp.asarray(padded(wy, 0.0, np.float32)),
        valid=jnp.asarray(valid),
        target=jnp.asarray(tgt),
        const_loss=jnp.asarray(const, jnp.float32),
        window_rows=R,
    )


def plan_item_cap(n_pixels: int, tex_size: int, chunk: int,
                  window_rows: int) -> int:
    """Static bound on the greedy packer's item count: a new item starts
    only when the previous is full (<= ceil(N/chunk) times) or its row
    window is exhausted (<= ceil(S/R) times)."""
    return -(-n_pixels // chunk) + -(-tex_size // window_rows)


def build_uv_sample_plan_device(
    uv_map: jax.Array,
    fg: jax.Array,
    target: jax.Array,
    tex_size: int,
    background: float = 1.0,
    chunk: int = 2048,
    window_rows: int = 8,
) -> UVSamplePlan:
    """Device-side :func:`build_uv_sample_plan` — identical plan semantics
    (same tap math, same stable y0-sort, same greedy packing decisions),
    built entirely with jittable static-shape ops.

    The host builder's per-pose numpy work (sort + per-item copies of
    262k-pixel arrays) measured tens of seconds across the reference
    schedule's ~110 unique poses on a 1-CPU host — that cost sank the
    bucketed texture-fit path in round 2 (BENCH_NOTES.md).  Here the sort
    is one device ``argsort``, the packing is a ``lax.scan`` over the
    (statically-bounded) item count doing binary searches, and the
    per-item slot fill is one gather — microseconds-scale per pose on
    TPU.

    Returns a plan with the STATIC item count :func:`plan_item_cap`
    (padded items carry ``valid == 0``); use :func:`used_items` +
    ``trim_plan`` after stacking poses to drop the all-empty tail.
    """
    S, R, K = int(tex_size), int(window_rows), int(chunk)
    if R < 1 or R > 127 or S <= R:
        raise ValueError(
            f"window_rows={R} must be in [1, min(127, tex_size={S} - 1)]"
        )
    if S > 32767:
        raise ValueError(f"tex_size={S} exceeds the int16 tap columns")
    H, W = fg.shape
    N = H * W
    C = target.shape[-1]
    I = plan_item_cap(N, S, K, R)

    fg_flat = fg.reshape(-1)
    tgt_flat = target.reshape(-1, C).astype(jnp.float32)
    const = jnp.sum(
        jnp.where(
            fg_flat[:, None], 0.0,
            jnp.abs(tgt_flat - jnp.float32(background)),
        )
    )

    # Tap math — bit-identical to the host builder / gather path (f32).
    flat = uv_map.reshape(-1, 2).astype(jnp.float32)
    s1 = jnp.float32(S - 1)
    x = flat[:, 0] * s1
    y = (jnp.float32(1.0) - flat[:, 1]) * s1
    x0 = jnp.clip(jnp.floor(x), 0, S - 1)
    y0 = jnp.clip(jnp.floor(y), 0, S - 1)
    x1 = jnp.clip(x0 + jnp.float32(1.0), 0, S - 1)
    y1 = jnp.clip(y0 + jnp.float32(1.0), 0, S - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)
    wy = jnp.clip(y - y0, 0.0, 1.0)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    # Stable sort by y0 with background pixels keyed past every real row:
    # equivalent to the host's fg-masked stable argsort.
    BIG = jnp.int32(S + R + 2)
    key = jnp.where(fg_flat, y0i, BIG)
    order = jnp.argsort(key, stable=True)
    y0s = jnp.concatenate([key[order], jnp.full((1,), BIG, jnp.int32)])

    # Row-cut table: cum[r] = #fg pixels with y0 < r, as one vectorized
    # binary search over the sorted keys (a scatter-add histogram or a
    # per-step searchsorted both hit slow per-element TPU paths).
    # method='sort' lowers to one more (cheap) device sort; the default
    # binary-search lowering measured ~6 ms/pose of per-element gathers
    cum = jnp.searchsorted(
        y0s[:-1], jnp.arange(S + 1, dtype=jnp.int32), side="left",
        method="sort",
    ).astype(jnp.int32)                                # [S + 1]

    # Greedy packing: the host builder's while loop as a bounded scan.
    # cut(left)  = #keys <  row+R = cum[row+R]     (searchsorted left)
    # cut(right) = #keys <= row+R = cum[row+R+1]   (searchsorted right)
    def pack(p, _):
        row = jnp.minimum(y0s[p], jnp.int32(S - 1 - R))
        cut_l = cum[jnp.minimum(row + R, S)]
        cut_r = cum[jnp.minimum(row + R + 1, S)]
        cut = jnp.where(cut_l <= p, cut_r, cut_l).astype(jnp.int32)
        end = jnp.maximum(jnp.minimum(p + K, cut), p)
        return end, (p, end, row)

    _, (starts, ends, rows_out) = jax.lax.scan(
        pack, jnp.int32(0), None, length=I
    )

    # Slot fill: permute the packed [N, 6+C] rows into sort order ONCE,
    # then each item is one contiguous ``dynamic_slice`` at its start
    # offset.  (Round-3 profiling, bench_texfit_maps.py/_planbuild
    # decomposition: the earlier ``packed[order[slot]]`` form spent
    # ~17 ms/pose materializing the [I*K] per-element index gather and
    # ~14 ms/pose gathering 2x the rows; sorted-once + sliced reads the
    # same data contiguously.)  K zero pad rows keep starts near N from
    # clamping the slice window (pad rows are masked below).
    slot = starts[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    slot_valid = slot < ends[:, None]

    packed = jnp.concatenate(
        [x0[:, None], x1[:, None], wx[:, None],
         y0[:, None], y1[:, None], wy[:, None], tgt_flat], axis=1,
    )                                                  # [N, 6 + C]
    psort = jnp.concatenate(
        [packed[order], jnp.zeros((K, 6 + C), packed.dtype)]
    )
    rowsf = jax.vmap(
        lambda s: jax.lax.dynamic_slice(psort, (s, 0), (K, 6 + C))
    )(starts)                                          # [I, K, 6 + C]
    vmaskf = slot_valid.astype(jnp.float32)
    rowsf = rowsf * vmaskf[..., None]
    rowbase = rows_out[:, None].astype(jnp.float32)
    return UVSamplePlan(
        row_start=rows_out,
        x0=rowsf[..., 0].astype(jnp.int16),
        x1=rowsf[..., 1].astype(jnp.int16),
        wx=rowsf[..., 2],
        dy=jnp.where(slot_valid, rowsf[..., 3] - rowbase, 0.0).astype(
            jnp.int8
        ),
        dy1=jnp.where(slot_valid, rowsf[..., 4] - rowbase, 0.0).astype(
            jnp.int8
        ),
        wy=rowsf[..., 5],
        valid=vmaskf,
        target=rowsf[..., 6:],
        const_loss=const,
        window_rows=R,
    )


def used_items(plan: UVSamplePlan) -> int:
    """Number of leading items that carry any real pixel (host sync)."""
    any_valid = np.asarray(jnp.any(plan.valid > 0, axis=-1))
    if any_valid.ndim == 2:          # stacked [U, I]
        any_valid = any_valid.any(axis=0)
    nz = np.nonzero(any_valid)[0]
    return int(nz[-1]) + 1 if nz.size else 1


def trim_plan(plan: UVSamplePlan, n_items: int) -> UVSamplePlan:
    """Drop the all-empty item tail.

    Leaves: row_start [.., I]; x0/x1/wx/dy/dy1/wy/valid [.., I, K];
    target [.., I, K, C]; const_loss scalar — trim the I axis of each.
    """
    def trim_leaf(name, leaf):
        if name == "const_loss":
            return leaf
        i_axis = {"row_start": leaf.ndim - 1, "target": leaf.ndim - 3}.get(
            name, leaf.ndim - 2
        )
        sl = [slice(None)] * leaf.ndim
        sl[i_axis] = slice(0, n_items)
        return leaf[tuple(sl)]

    return UVSamplePlan(
        **{
            f.name: trim_leaf(f.name, getattr(plan, f.name))
            for f in dataclasses.fields(plan)
            if f.name != "window_rows"
        },
        window_rows=plan.window_rows,
    )


def stack_plans(plans: Sequence[UVSamplePlan]) -> UVSamplePlan:
    """Stack per-pose plans along a leading axis, padding item counts.

    Pad items carry ``valid == 0`` everywhere, so indexing any pose out of
    the stacked plan reproduces that pose's loss exactly.
    """
    R = plans[0].window_rows
    if any(p.window_rows != R for p in plans):
        raise ValueError("plans disagree on window_rows")
    max_i = max(p.num_items for p in plans)

    def pad_leaf(leaf, n_items):
        pad = max_i - n_items
        if pad == 0:
            return leaf
        widths = [(0, pad)] + [(0, 0)] * (leaf.ndim - 1)
        return jnp.pad(leaf, widths)

    leaves = []
    for p in plans:
        leaves.append(jax.tree.map(
            lambda l: pad_leaf(l, p.num_items)
            if l.ndim >= 1 else l, p))
    return jax.tree.map(lambda *ls: jnp.stack(ls), *leaves)


def index_plan(plan: UVSamplePlan, idx) -> UVSamplePlan:
    """Select one pose out of a ``stack_plans`` result (idx may be traced)."""
    return jax.tree.map(lambda l: l[idx], plan)


def plan_sample(
    texture: jax.Array,
    plan: UVSamplePlan,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Bilinear samples ``[I, K, C]`` in bucket order (0 at padded slots).

    Equals ``bilinear_sample_uv(texture, uv)`` at each planned pixel.
    HIGHEST matmul precision by default: the taps are f32 texels weighted
    by fractional f32 weights, and the texture-fit parity tests compare
    against the gather path (same convention as ``ops/sdf.py``).
    """
    if texture.shape[0] != texture.shape[1]:
        raise ValueError(
            f"plans assume a square texture, got {texture.shape}"
        )
    S, C = texture.shape[0], texture.shape[-1]
    R = plan.window_rows
    cols = jnp.arange(S, dtype=jnp.int32)
    rows = jnp.arange(R + 1, dtype=jnp.int32)

    def item(row_start, x0, x1, wx, dy, dy1, wy, valid):
        win = jax.lax.dynamic_slice(
            texture, (row_start, 0, 0), (R + 1, S, C)
        )
        # [K, S] two-nonzero weight rows; coincident taps (clamped edges)
        # sum their weights exactly like the gather form does
        ohx = ((cols == x0[:, None]) * (1.0 - wx[:, None])
               + (cols == x1[:, None]) * wx[:, None]) * valid[:, None]
        p = jnp.matmul(
            ohx,
            win.transpose(1, 0, 2).reshape(S, (R + 1) * C),
            precision=precision,
        ).reshape(-1, R + 1, C)
        ohy = ((rows == dy[:, None]) * (1.0 - wy[:, None])
               + (rows == dy1[:, None]) * wy[:, None])
        return jnp.einsum("kr,krc->kc", ohy, p)

    return jax.vmap(item)(
        plan.row_start, plan.x0, plan.x1, plan.wx,
        plan.dy, plan.dy1, plan.wy, plan.valid,
    )


def plan_l1_loss(
    texture: jax.Array,
    plan: UVSamplePlan,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """``sum |target - render|`` over the full image, no scatter needed.

    Identical (values and texture gradients) to
    ``sum(abs(target - sample_texture_uvmap(uv_map, fg, texture, bg)))``
    from the gather path: foreground pixels via the bucketed samples,
    background pixels via the plan's precomputed constant.
    """
    out = plan_sample(texture, plan, precision=precision)
    resid = jnp.sum(
        plan.valid[..., None] * jnp.abs(plan.target - out)
    )
    return resid + plan.const_loss
