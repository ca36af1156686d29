"""Fit-result parameter IO: the ``{smpl_type}_parameter.npy`` contract.

The reference saves a pickled-dict ``.npy`` per frame with keys
vertices/joints/pose/betas/global_orient/faces/global_transl/scale/
full_pose[/displacement] (smplify/smplify.py:216-226,247, saved at
body_fitting.py:94-99) and copies them into ``param/%04d.npy`` +
``smpl/%04d.obj`` (genebody_fitting.py:172-181).  Downstream GeneBody
tooling loads these files, so the schema is preserved byte-for-byte
(np.save of a dict of float32 arrays).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

PARAM_KEYS = (
    "vertices", "joints", "pose", "betas", "global_orient", "faces",
    "global_transl", "scale", "full_pose",
)


def to_numpy_result(result: dict, faces) -> dict:
    """Device fit output -> the reference's numpy dict schema."""
    out = {k: np.asarray(v, np.float32) for k, v in result.items()}
    out["faces"] = np.asarray(faces, np.int32)
    return out


def param_filename(smpl_type: str) -> str:
    """The per-fit parameter file name (single owner of the pattern)."""
    return f"{smpl_type}_parameter.npy"


def save_params(path: str, result: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, result, allow_pickle=True)


def load_params(path: str) -> dict:
    return np.load(path, allow_pickle=True).item()


def save_fit_outputs(
    output_dir: str,
    smpl_type: str,
    result: dict,
    faces,
    displacement: Optional[np.ndarray] = None,
) -> None:
    """Write ``{smpl_type}_parameter.npy``, ``{smpl_type}.obj`` (+ ``+d``),
    mirroring body_fitting.py:94-99."""
    from bodyfitting_tpu.io.obj import save_obj

    os.makedirs(output_dir, exist_ok=True)
    np_result = to_numpy_result(result, faces)
    save_params(
        os.path.join(output_dir, param_filename(smpl_type)), np_result
    )
    save_obj(
        os.path.join(output_dir, f"{smpl_type}.obj"),
        np_result["vertices"], np_result["faces"],
    )
    if displacement is not None:
        save_obj(
            os.path.join(output_dir, f"{smpl_type}+d.obj"),
            np_result["vertices"] + np.asarray(displacement, np.float32),
            np_result["faces"],
        )


def make_hmr_vec(pose, betas, cam_t, smpl_type: str) -> np.ndarray:
    """Pack (pose, betas, cam_t) into one row vector
    (reference io_utils.py:275-286): 66+10+3 for smplx, 72+10+3 for smpl."""
    n = 66 if smpl_type == "smplx" else 72
    return np.concatenate([
        np.asarray(pose, np.float32).reshape(1, n),
        np.asarray(betas, np.float32).reshape(1, 10),
        np.asarray(cam_t, np.float32).reshape(1, 3),
    ], axis=1)
