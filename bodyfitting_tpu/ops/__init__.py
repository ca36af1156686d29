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
