"""Bucketed one-hot UV sampling equals the gather path (values + grads).

The bucketed plan (`ops/uv_sample.py`) replaces the per-pixel
advanced-indexing gathers of `ops/rasterize.bilinear_sample_uv` in the
texture-fit hot loop (reference semantics:
/root/reference/smplify/texture_fitting.py:257-276).  The L1 loss and its
texture gradient are permutation-invariant, so equality of both against
the gather form pins every tap index and weight.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bodyfitting_tpu.ops import rasterize as rz
from bodyfitting_tpu.ops import uv_sample as us


def _gather_loss(texture, uv_map, fg, target, background=1.0):
    img = rz.sample_texture_uvmap(
        jnp.asarray(uv_map), jnp.asarray(fg), texture,
        background=background,
    )
    return jnp.sum(jnp.abs(jnp.asarray(target) - img))


def _rand_case(rng, H, W, S, edge_frac=0.2):
    uv = rng.uniform(0.0, 1.0, size=(H, W, 2)).astype(np.float32)
    # pin a block of pixels to the clamped edges (v=0 -> y0=S-1; u=1,v=1)
    n_edge = int(edge_frac * H)
    uv[:n_edge, :, 1] = 0.0
    uv[-1, :, 0] = 1.0
    uv[-1, :, 1] = 1.0
    fg = rng.uniform(size=(H, W)) < 0.7
    target = rng.uniform(size=(H, W, 3)).astype(np.float32)
    return uv, fg, target


def test_plan_l1_matches_gather_values_and_grads():
    rng = np.random.default_rng(0)
    H = W = 24
    S = 32
    uv, fg, target = _rand_case(rng, H, W, S)
    tex = jnp.asarray(rng.uniform(size=(S, S, 3)).astype(np.float32))

    plan = us.build_uv_sample_plan(
        uv, fg, target, S, background=1.0, chunk=64, window_rows=5,
    )
    # multiple work items and row windows must actually be exercised
    assert plan.num_items > 3

    ref_loss, ref_grad = jax.value_and_grad(_gather_loss)(
        tex, uv, fg, target
    )
    got_loss, got_grad = jax.value_and_grad(us.plan_l1_loss)(tex, plan)
    np.testing.assert_allclose(
        float(got_loss), float(ref_loss), rtol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_grad), np.asarray(ref_grad), rtol=1e-5, atol=1e-5
    )


def test_clamped_top_edge_terminates_and_matches():
    # all pixels at v=0 -> y0 == S-1 everywhere: the packing loop must
    # terminate (side="right" fallback) and still reproduce the gather
    rng = np.random.default_rng(1)
    H = W = 8
    S = 16
    uv = rng.uniform(size=(H, W, 2)).astype(np.float32)
    uv[..., 1] = 0.0
    fg = np.ones((H, W), bool)
    target = rng.uniform(size=(H, W, 3)).astype(np.float32)
    tex = jnp.asarray(rng.uniform(size=(S, S, 3)).astype(np.float32))

    plan = us.build_uv_sample_plan(uv, fg, target, S, window_rows=4)
    ref = float(_gather_loss(tex, uv, fg, target))
    got = float(us.plan_l1_loss(tex, plan))
    np.testing.assert_allclose(got, ref, rtol=2e-6)


def test_empty_foreground_is_constant():
    rng = np.random.default_rng(2)
    H = W = 6
    S = 8
    uv = rng.uniform(size=(H, W, 2)).astype(np.float32)
    fg = np.zeros((H, W), bool)
    target = rng.uniform(size=(H, W, 3)).astype(np.float32)
    tex = jnp.asarray(rng.uniform(size=(S, S, 3)).astype(np.float32))

    plan = us.build_uv_sample_plan(uv, fg, target, S, window_rows=3)
    ref = float(_gather_loss(tex, uv, fg, target))
    got_loss, got_grad = jax.value_and_grad(us.plan_l1_loss)(tex, plan)
    np.testing.assert_allclose(float(got_loss), ref, rtol=1e-6)
    assert float(jnp.abs(got_grad).sum()) == 0.0


def test_stacked_plans_index_inside_scan():
    rng = np.random.default_rng(3)
    H = W = 12
    S = 16
    tex = jnp.asarray(rng.uniform(size=(S, S, 3)).astype(np.float32))

    cases = [_rand_case(rng, H, W, S, edge_frac=0.0) for _ in range(3)]
    # confine case 0's v to a narrow band: fewer texture-row windows ->
    # fewer work items, so stacking actually pads (padded items must
    # contribute zero loss)
    uv0, fg0, tgt0 = cases[0]
    cases[0] = (
        np.concatenate(
            [uv0[..., :1], 0.8 + 0.2 * uv0[..., 1:]], -1
        ).astype(np.float32),
        fg0, tgt0,
    )
    plans = [
        us.build_uv_sample_plan(uv, fg, tgt, S, chunk=32, window_rows=4)
        for uv, fg, tgt in cases
    ]
    assert len({p.num_items for p in plans}) >= 2
    stacked = us.stack_plans(plans)

    @jax.jit
    def losses_of(tex, stacked):
        def body(carry, idx):
            return carry, us.plan_l1_loss(
                tex, us.index_plan(stacked, idx)
            )
        _, out = jax.lax.scan(
            body, 0, jnp.arange(len(plans), dtype=jnp.int32)
        )
        return out

    got = np.asarray(losses_of(tex, stacked))
    ref = np.array([
        float(_gather_loss(tex, uv, fg, tgt)) for uv, fg, tgt in cases
    ])
    np.testing.assert_allclose(got, ref, rtol=2e-6)


def test_device_plan_builder_matches_host():
    """build_uv_sample_plan_device reproduces the host builder exactly:
    same packing decisions, same taps/weights/targets (after trimming its
    static item padding), hence identical loss and texture gradient."""
    rng = np.random.default_rng(3)
    H = W = 24
    S = 32
    uv, fg, target = _rand_case(rng, H, W, S)
    tex = jnp.asarray(rng.uniform(size=(S, S, 3)).astype(np.float32))

    host = us.build_uv_sample_plan(
        uv, fg, target, S, background=1.0, chunk=64, window_rows=5,
    )
    dev = jax.jit(
        lambda u, f, t: us.build_uv_sample_plan_device(
            u, f, t, S, background=1.0, chunk=64, window_rows=5,
        )
    )(jnp.asarray(uv), jnp.asarray(fg), jnp.asarray(target))
    used = us.used_items(dev)
    assert used == host.num_items
    trimmed = us.trim_plan(dev, used)
    for name in ("row_start", "x0", "x1", "wx", "dy", "dy1", "wy",
                 "valid", "target"):
        np.testing.assert_array_equal(
            np.asarray(getattr(trimmed, name)),
            np.asarray(getattr(host, name)), err_msg=name,
        )
    np.testing.assert_allclose(
        float(dev.const_loss), float(host.const_loss), rtol=1e-6
    )

    # untrimmed loss/grad also agree (padded items are inert)
    lh, gh = jax.value_and_grad(us.plan_l1_loss)(tex, host)
    ld, gd = jax.value_and_grad(us.plan_l1_loss)(tex, dev)
    np.testing.assert_allclose(float(ld), float(lh), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gh), atol=1e-6)


def test_device_plan_builder_empty_foreground():
    rng = np.random.default_rng(4)
    S, H = 16, 8
    target = rng.uniform(size=(H, H, 3)).astype(np.float32)
    dev = us.build_uv_sample_plan_device(
        jnp.zeros((H, H, 2)), jnp.zeros((H, H), bool),
        jnp.asarray(target), S, background=0.5, chunk=16, window_rows=4,
    )
    assert float(jnp.sum(dev.valid)) == 0.0
    tex = jnp.asarray(rng.uniform(size=(S, S, 3)).astype(np.float32))
    np.testing.assert_allclose(
        float(us.plan_l1_loss(tex, dev)),
        float(np.abs(target - 0.5).sum()), rtol=1e-6,
    )
