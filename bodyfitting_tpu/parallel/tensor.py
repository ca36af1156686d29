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


def pad_model_vertices(model: bm.BodyModel, multiple: int) -> bm.BodyModel:
    """Pad the vertex axis to a multiple of ``multiple`` with inert rows.

    Makes any model shardable over any mesh size (SMPL-X's V=10475 is odd,
    so without padding no even ``tp`` factor works).  Pad rows are exact
    no-ops for everything real: zero blendshape columns, zero regressor
    columns (joints unchanged), zero LBS-weight rows (a padded vertex's
    skinning transform is identically 0, so its output coordinates are 0
    and carry no gradient).  Faces, selector ids and landmark tables keep
    their original indices — no real vertex moves.  Forward outputs gain
    ``V_pad - V`` trailing all-zero vertex rows; slice ``[:V]`` where the
    original count matters (``model.num_verts`` of the unpadded model).
    """
    V = model.v_template.shape[0]
    V_pad = -(-V // multiple) * multiple
    if V_pad == V:
        return model
    extra = V_pad - V

    def pad_rows(x):          # [V, *] -> [V_pad, *]
        if x is None:
            return None
        import numpy as np

        widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jax.numpy.asarray(
            np.pad(np.asarray(x), widths), dtype=x.dtype
        )

    def pad_cols(x):          # [*, V] -> [*, V_pad]
        if x is None:
            return None
        import numpy as np

        widths = [(0, 0)] * (x.ndim - 1) + [(0, extra)]
        return jax.numpy.asarray(
            np.pad(np.asarray(x), widths), dtype=x.dtype
        )

    def pad_flat(x):          # [*, 3V] (or [3V]) vertex-major -> [*, 3V_pad]
        if x is None:
            return None
        import numpy as np

        arr = np.asarray(x)
        lead = arr.shape[:-1]
        unflat = arr.reshape(lead + (V, 3))
        widths = [(0, 0)] * len(lead) + [(0, extra), (0, 0)]
        padded = np.pad(unflat, widths)
        return jax.numpy.asarray(
            padded.reshape(lead + (3 * V_pad,)), dtype=x.dtype
        )

    updates = dict(
        v_template=pad_rows(model.v_template),
        lbs_weights=pad_rows(model.lbs_weights),
        J_regressor=pad_cols(model.J_regressor),
        extra_joint_regressor=pad_cols(model.extra_joint_regressor),
        shapedirs=pad_flat(model.shapedirs),
        posedirs=pad_flat(model.posedirs),
        expr_dirs=pad_flat(model.expr_dirs),
        kid_shape_dir=pad_flat(model.kid_shape_dir),
    )
    updates = {k: v for k, v in updates.items()
               if getattr(model, k) is not None}
    return dataclasses.replace(model, **updates)


def shard_model_vertices(
    model: bm.BodyModel, mesh: Mesh, axis: str = "tp",
    auto_pad: bool = True,
) -> bm.BodyModel:
    """Place the model's per-vertex arrays sharded over ``mesh[axis]``.

    Both V (for ``v_template``/``lbs_weights``) and 3V (for the flattened
    blendshape bases) must divide the axis size; with ``auto_pad`` any
    model (including the real SMPL-X, whose V=10475 is odd) is first run
    through :func:`pad_model_vertices`, whose pad rows are exact no-ops —
    forward outputs then carry trailing zero vertex rows (slice to the
    original count where it matters).  Faces and selector ids are gather
    indices and stay replicated.
    """
    size = mesh.shape[axis]
    if model.v_template.shape[0] % size or \
            (3 * model.v_template.shape[0]) % size:
        if not auto_pad:
            raise ValueError(
                f"vertex count {model.v_template.shape[0]} (and 3V) must "
                f"divide mesh['{axis}'] = {size}; pad the model's vertex "
                f"axis (pad_model_vertices) or pass auto_pad=True"
            )
        model = pad_model_vertices(model, size)
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
