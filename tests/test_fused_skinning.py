"""Fused Pallas skinning kernel: exact parity with the XLA path.

Kernels run in ``interpret=True`` on the CPU test platform; the on-chip
number lives in ``bench_skinning.py`` / BENCH_NOTES.md.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bodyfitting_tpu.models import body_model as bm
from bodyfitting_tpu.ops.pallas_kernels import make_fused_skinning, skinning_xla


def _data(V=777, J=55, B=3, seed=0):
    rng = np.random.default_rng(seed)
    W = jnp.asarray(rng.random((V, J)), jnp.float32)
    W = W / W.sum(1, keepdims=True)
    A = jnp.asarray(rng.normal(size=(B, J, 12)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32)
    return W, A, vp


def test_forward_parity():
    W, A, vp = _data()
    skin = make_fused_skinning(W, vert_tile=256, interpret=True)
    out = jax.vmap(skin)(A, vp)
    ref = jax.vmap(lambda a, v: skinning_xla(W, a, v))(A, vp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_backward_parity():
    W, A, vp = _data(seed=1)
    skin = make_fused_skinning(W, vert_tile=256, interpret=True)

    def loss_fused(a, v):
        return (jax.vmap(skin)(a, v) ** 2).sum()

    def loss_xla(a, v):
        return (jax.vmap(lambda x, y: skinning_xla(W, x, y))(a, v) ** 2).sum()

    gA, gvp = jax.grad(loss_fused, argnums=(0, 1))(A, vp)
    rA, rvp = jax.grad(loss_xla, argnums=(0, 1))(A, vp)
    np.testing.assert_allclose(np.asarray(gA), np.asarray(rA),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gvp), np.asarray(rvp),
                               rtol=1e-4, atol=1e-4)


def test_lbs_with_fused_kernel_matches():
    """forward() with FUSED_SKINNING='on' (interpret) == XLA path."""
    model = bm.synthetic_model("smplx", num_verts=700, seed=0)
    rng = np.random.default_rng(2)
    p = dataclasses.replace(
        bm.BodyParams.zeros(model),
        betas=jnp.asarray(rng.normal(scale=0.5, size=(10,)), jnp.float32),
        body_pose=jnp.asarray(rng.normal(scale=0.2, size=(63,)), jnp.float32),
        global_orient=jnp.asarray([0.1, 0.2, -0.3], jnp.float32),
    )
    ref = np.asarray(bm.forward(model, p).vertices)

    import bodyfitting_tpu.ops.pallas_kernels as pk

    orig_make = pk.make_fused_skinning
    old = bm.FUSED_SKINNING
    bm.FUSED_SKINNING = "on"
    # interpret mode on the CPU test platform
    pk.make_fused_skinning = lambda w, **kw: orig_make(
        w, interpret=True, **{k: v for k, v in kw.items() if k != "interpret"}
    )
    try:
        out = np.asarray(bm.forward(model, p).vertices)
    finally:
        bm.FUSED_SKINNING = old
        pk.make_fused_skinning = orig_make
    np.testing.assert_allclose(out, ref, atol=1e-5)
