"""Differentiable geometry ops: rotations, cameras, meshes, Pallas kernels."""

from bodyfitting_tpu.ops.rotations import (  # noqa: F401
    rodrigues,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    rotmat_to_quat,
    rotmat_to_aa,
)
from bodyfitting_tpu.ops.camera import (  # noqa: F401
    perspective_projection,
    world_to_camera,
    adjust_intrinsics_for_crop,
    invert_rigid,
)
from bodyfitting_tpu.ops.nearest import (  # noqa: F401
    nearest_point_on_mesh,
    nearest_points,
    closest_point_on_triangles,
)
# NOTE: the rasterize() function is NOT re-exported — it would shadow the
# `bodyfitting_tpu.ops.rasterize` module name; use ops.rasterize.rasterize.
from bodyfitting_tpu.ops.rasterize import (  # noqa: F401
    project_faces,
    render_attributes,
    render_silhouette,
    render_depth,
    sample_texture,
    soft_silhouette,
)
from bodyfitting_tpu.ops.mesh_queries import (  # noqa: F401
    inside_mesh,
    intersects_any,
)
from bodyfitting_tpu.ops.sdf import (  # noqa: F401
    DistanceVolume,
    build_distance_volume,
    query_distance,
)
from bodyfitting_tpu.ops.geometry import estimate_translation  # noqa: F401
