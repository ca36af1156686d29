"""Model families: SMPL/SMPL-X body models, HMR, OpenPose, LBAM."""

from bodyfitting_tpu.models.body_model import (  # noqa: F401
    BodyModel,
    BodyParams,
    BodyOutput,
    forward,
    lbs,
    load_model,
    synthetic_model,
    smpl_to_openpose,
    spin_joint_mapper_for_smpl,
)
