"""Tensor parallelism: shard the body model's vertex axis over a mesh.

Data parallelism over frames (parallel/sharding.py) is the throughput
path; vertex sharding is the *capacity* path — for SMPL+D on dense scans
or high-res per-vertex displacement where one chip's HBM or FLOPs are the
limit.  All of LBS is vertex-parallel: blendshapes ``[S] @ [S, 3V]`` are
column-sharded, skinning ``[V, J] @ [J, 16]`` row-sharded, and the only
cross-vertex reduction is joint regression ``[J, V] @ [V, 3]``, which XLA
turns into a contraction psum over the ``tp`` axis automatically.

Annotate once with :func:`shard_model_vertices`; jitted forwards then
run vertex-sharded with no code changes.
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bodyfitting_tpu.models import body_model as bm

# model fields whose leading (or trailing) dim is the vertex axis
_VERTEX_AXIS0 = ("v_template", "lbs_weights")
_VERTEX_AXIS1 = ("J_regressor", "extra_joint_regressor")
# flattened [*, 3V] bases: shard the last axis (3V) — vertex-major layout
_VERTEX_FLAT = ("shapedirs", "posedirs", "expr_dirs", "kid_shape_dir")


def shard_model_vertices(
    model: bm.BodyModel, mesh: Mesh, axis: str = "tp"
) -> bm.BodyModel:
    """Place the model's per-vertex arrays sharded over ``mesh[axis]``.

    Both V (for ``v_template``/``lbs_weights``) and 3V (for the flattened
    blendshape bases) must divide the axis size: SMPL's V=6890 divides 2,
    but SMPL-X's V=10475 is odd (3V=31425 too) — pad the vertex axis to a
    multiple of the mesh size first for any even ``tp`` factor.  Faces
    and selector ids are gather indices and stay replicated.
    """
    size = mesh.shape[axis]
    if model.v_template.shape[0] % size or \
            (3 * model.v_template.shape[0]) % size:
        raise ValueError(
            f"vertex count {model.v_template.shape[0]} (and 3V) must "
            f"divide mesh['{axis}'] = {size}; pad the model's vertex axis"
        )
    def place(name, x):
        if x is None:
            return None
        if name in _VERTEX_AXIS0:
            spec = P(axis)
        elif name in _VERTEX_AXIS1:
            spec = P(None, axis)
        elif name in _VERTEX_FLAT:
            spec = P(None, axis) if x.ndim == 2 else P(axis)
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    updates = {}
    for f in dataclasses.fields(model):
        v = getattr(model, f.name)
        if hasattr(v, "ndim"):
            updates[f.name] = place(f.name, v)
    return dataclasses.replace(model, **updates)


def replicate_params(params, mesh: Mesh):
    """Fit/body params are tiny: replicate them over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), params
    )
