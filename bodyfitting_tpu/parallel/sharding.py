"""Multi-chip scaling: shard the frame (and view) axes over a device mesh.

The reference has no parallelism of any kind — frames run in a serial
Python loop (apps/genebody_fitting.py:184) and views in a loop inside the
loss (smplify/loss.py:156).  Here a whole sequence fit is one ``jit`` whose
batch axes are sharded over a ``jax.sharding.Mesh``:

  * ``frames`` axis — pure data parallelism.  Each frame's fit is
    independent, so the hot loop has **no collectives at all**; XLA runs
    per-chip scans in lockstep and results land already sharded.
  * ``views`` axis — optional intra-frame parallelism for many-camera
    rigs (GeneBody: 48 views).  The keypoint loss reduces over views, so
    XLA inserts a single small ``psum`` of per-view scalars per step over
    ICI — bandwidth-trivial.

Use :func:`fit_sequence_sharded` for the common case; it builds the
shardings, places the inputs, and jits the vmapped fit.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bodyfitting_tpu.fitting import smplify
from bodyfitting_tpu.models import body_model as bm


def make_mesh(
    n_frames_shards: Optional[int] = None,
    n_view_shards: int = 1,
    devices=None,
) -> Mesh:
    """A ``(frames, views)`` mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if n_frames_shards is None:
        n_frames_shards = total // n_view_shards
    assert n_frames_shards * n_view_shards == total, (
        f"{n_frames_shards} x {n_view_shards} != {total} devices"
    )
    return Mesh(
        devices.reshape(n_frames_shards, n_view_shards), ("frames", "views")
    )


def obs_sharding(mesh: Mesh, obs: smplify.Observations):
    """Per-leaf shardings: frame axis 0 sharded; view axis 1 for per-view
    tensors when the mesh has a views dimension."""
    view_sharded = {"w2cs", "Ks", "keypoints", "view_mask"}

    def leaf_spec(name, x):
        if x is None:
            return None
        if name in view_sharded and x.ndim >= 2:
            return NamedSharding(mesh, P("frames", "views"))
        return NamedSharding(mesh, P("frames"))

    import dataclasses

    return smplify.Observations(
        **{
            f.name: leaf_spec(f.name, getattr(obs, f.name))
            for f in dataclasses.fields(obs)
        }
    )


def params_sharding(mesh: Mesh, params) -> object:
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P("frames")), params
    )


def fit_sequence_sharded(
    model: bm.BodyModel,
    config: smplify.FitConfig,
    obs: smplify.Observations,
    init: smplify.FitParams,
    pose_prior_fn,
    mesh: Optional[Mesh] = None,
):
    """Fit a batch of frames, sharded over the mesh's ``frames`` axis.

    ``obs``/``init`` carry a leading frame axis (length divisible by the
    mesh's frame dimension).  Returns the same structure as
    :func:`bodyfitting_tpu.fitting.smplify.fit`, batched and sharded.
    """
    if mesh is None:
        mesh = make_mesh()

    obs_sh = obs_sharding(mesh, obs)
    init_sh = params_sharding(mesh, init)

    fit_one = lambda o, i: smplify.fit(  # noqa: E731
        model, config, o, i, pose_prior_fn
    )
    fit_batched = jax.jit(
        jax.vmap(fit_one),
        in_shardings=(obs_sh, init_sh),
    )
    return fit_batched(obs, init)


def training_step(model, config, pose_prior_fn, step_idx: int = 0):
    """One Adam step of the batched fit — the unit the dryrun compiles.

    Returns ``step_fn(params, opt_state, obs) -> (params, opt_state, loss)``
    vmapped over a leading frame axis.  ``step_idx`` is the fit-iteration
    index the loss is evaluated at — pass a value past the stage gate
    (``config.num_iters // config.stage_gate_den``) to exercise the
    mask/mesh branches.
    """
    tx = smplify._make_optimizer(
        config, smplify.FitParams.init(model)
    )

    def one(params, opt_state, obs):
        # the PRODUCTION step body (incl. the joints-only model reduction)
        # — duplicating it here once made the dryrun compile a program
        # real fits never run
        step_fn = smplify.make_step_fn(model, config, obs, pose_prior_fn,
                                       tx)
        (params, opt_state), loss = step_fn(
            (params, opt_state), jax.numpy.asarray(step_idx, jax.numpy.int32)
        )
        return params, opt_state, loss

    return tx, jax.vmap(one)
