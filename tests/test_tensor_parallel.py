"""Vertex-sharded (tensor-parallel) body model matches the replicated one."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from bodyfitting_tpu.models import body_model as bm
from bodyfitting_tpu.parallel import tensor as tp


def test_vertex_sharded_forward_matches(rng):
    # 256 verts: divisible by the 8-device tp axis
    model = bm.synthetic_model("smplx", num_verts=256, seed=4)
    params = dataclasses.replace(
        bm.BodyParams.zeros(model),
        body_pose=jnp.asarray(rng.normal(size=63) * 0.2, jnp.float32),
        betas=jnp.asarray(rng.normal(size=10), jnp.float32),
    )
    want = bm.forward(model, params)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("tp",))
    sharded = tp.shard_model_vertices(model, mesh)
    params_r = tp.replicate_params(params, mesh)

    got = jax.jit(lambda p: bm.forward(sharded, p))(params_r)
    np.testing.assert_allclose(
        np.asarray(got.vertices), np.asarray(want.vertices), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.joints), np.asarray(want.joints), atol=2e-5
    )

    # verify the per-vertex arrays really are distributed
    shard_sizes = {
        tuple(s.index) for s in sharded.v_template.addressable_shards
    }
    assert len(shard_sizes) == 8


def test_vertex_sharded_smplx_odd_vertex_count(rng):
    """The flagship case the capacity path must handle: SMPL-X's real
    vertex count (V=10475, odd — 3V too) shards over 8 devices via
    auto-padding, with forward parity to the unpadded, unsharded model."""
    V = 10475
    model = bm.synthetic_model("smplx", num_verts=V, seed=5)
    assert model.v_template.shape[0] == V
    params = dataclasses.replace(
        bm.BodyParams.zeros(model),
        body_pose=jnp.asarray(rng.normal(size=63) * 0.2, jnp.float32),
        betas=jnp.asarray(rng.normal(size=10), jnp.float32),
    )
    want = bm.forward(model, params)

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("tp",))
    sharded = tp.shard_model_vertices(model, mesh)   # auto-pads to 10480
    V_pad = sharded.v_template.shape[0]
    assert V_pad % 8 == 0 and V_pad >= V

    got = jax.jit(lambda p: bm.forward(sharded, p))(
        tp.replicate_params(params, mesh)
    )
    np.testing.assert_allclose(
        np.asarray(got.vertices)[:V], np.asarray(want.vertices), atol=2e-5
    )
    # pad rows are exact no-ops: identically zero output coordinates
    assert np.all(np.asarray(got.vertices)[V:] == 0.0)
    np.testing.assert_allclose(
        np.asarray(got.joints), np.asarray(want.joints), atol=2e-5
    )
    shard_sizes = {
        tuple(s.index) for s in sharded.v_template.addressable_shards
    }
    assert len(shard_sizes) == 8


def test_pad_model_vertices_forward_exact(rng):
    """Padding alone (no sharding) is mathematically inert.

    The pad rows/columns are zeros, so real outputs agree up to matmul
    reduction-order rounding (a padded contraction dimension re-blocks
    XLA's sums — same math, different association), and pad-vertex
    outputs are identically zero."""
    model = bm.synthetic_model("smplx", num_verts=253, seed=7)
    padded = tp.pad_model_vertices(model, 8)
    assert padded.v_template.shape[0] == 256
    params = dataclasses.replace(
        bm.BodyParams.zeros(model),
        body_pose=jnp.asarray(rng.normal(size=63) * 0.3, jnp.float32),
    )
    want = bm.forward(model, params)
    got = bm.forward(padded, params)
    np.testing.assert_allclose(
        np.asarray(got.vertices)[:253], np.asarray(want.vertices),
        atol=2e-6,
    )
    assert np.all(np.asarray(got.vertices)[253:] == 0.0)
    np.testing.assert_allclose(
        np.asarray(got.joints), np.asarray(want.joints), atol=2e-6
    )


def test_vertex_sharded_gradients_match(rng):
    model = bm.synthetic_model("smpl", num_verts=128, seed=6)
    params = bm.BodyParams.zeros(model)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("tp",))
    sharded = tp.shard_model_vertices(model, mesh)

    def loss(m, p):
        return jnp.sum(bm.forward(m, p).vertices ** 2)

    g_ref = jax.grad(lambda p: loss(model, p))(params)
    g_tp = jax.jit(jax.grad(lambda p: loss(sharded, p)))(
        tp.replicate_params(params, mesh)
    )
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_tp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )
