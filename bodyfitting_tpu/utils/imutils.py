"""SPIN-style image/keypoint augmentation utilities (host-side numpy).

Re-implements the reference's utils/imutils.py: the center+scale crop
transform used for HMR preprocessing (h = 200*scale convention), its
inverse, and the flip helpers.  The deprecated scipy.misc calls are
replaced with cv2.
"""

from __future__ import annotations

import numpy as np

# SMPL pose-parameter permutation under a left-right flip (SPIN convention).
SMPL_POSE_FLIP_PERM = []
for i in [0, 2, 1, 3, 5, 4, 6, 8, 7, 9, 11, 10, 12, 14, 13, 15, 17, 16, 19,
          18, 21, 20, 23, 22]:
    SMPL_POSE_FLIP_PERM.extend([3 * i, 3 * i + 1, 3 * i + 2])

# SPIN left-right swaps: the 24 GT joints alone (J24) and OpenPose 25 +
# the 24 GT joints (J49).
J24_FLIP_PERM = [5, 4, 3, 2, 1, 0, 11, 10, 9, 8, 7, 6, 12, 13, 14, 15, 16,
                 17, 18, 19, 21, 20, 23, 22]
SPIN_JOINT_FLIP_PERM = (
    [0, 1, 5, 6, 7, 2, 3, 4, 8, 12, 13, 14, 9, 10, 11, 16, 15, 18, 17,
     22, 23, 24, 19, 20, 21]
    + [25 + i for i in J24_FLIP_PERM]
)


def get_transform(center, scale, res, rot=0):
    """Crop-to-output transform matrix (reference imutils.py:14-40)."""
    h = 200 * scale
    t = np.zeros((3, 3))
    t[0, 0] = float(res[1]) / h
    t[1, 1] = float(res[0]) / h
    t[0, 2] = res[1] * (-float(center[0]) / h + 0.5)
    t[1, 2] = res[0] * (-float(center[1]) / h + 0.5)
    t[2, 2] = 1
    if rot != 0:
        rot_rad = -rot * np.pi / 180
        sn, cs = np.sin(rot_rad), np.cos(rot_rad)
        rot_mat = np.eye(3)
        rot_mat[0, :2] = [cs, -sn]
        rot_mat[1, :2] = [sn, cs]
        t_mat = np.eye(3)
        t_mat[0, 2] = -res[1] / 2
        t_mat[1, 2] = -res[0] / 2
        t_inv = t_mat.copy()
        t_inv[:2, 2] *= -1
        t = t_inv @ rot_mat @ t_mat @ t
    return t


def transform(pt, center, scale, res, invert=0, rot=0):
    """Map a pixel between original and cropped frames
    (reference imutils.py:42-49, including its 1-based offsets)."""
    t = get_transform(center, scale, res, rot=rot)
    if invert:
        t = np.linalg.inv(t)
    new_pt = t @ np.array([pt[0] - 1, pt[1] - 1, 1.0])
    return new_pt[:2].astype(int) + 1


def crop(img, center, scale, res, rot=0):
    """Crop + resize with zero padding (reference imutils.py:51-86)."""
    import cv2

    ul = np.array(transform([1, 1], center, scale, res, invert=1)) - 1
    br = np.array(
        transform([res[0] + 1, res[1] + 1], center, scale, res, invert=1)
    ) - 1
    pad = int(np.linalg.norm(br - ul) / 2 - float(br[1] - ul[1]) / 2)
    if rot != 0:
        ul -= pad
        br += pad
    new_shape = [br[1] - ul[1], br[0] - ul[0]]
    if img.ndim > 2:
        new_shape += [img.shape[2]]
    new_img = np.zeros(new_shape, dtype=img.dtype)

    new_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
    new_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
    old_x = max(0, ul[0]), min(img.shape[1], br[0])
    old_y = max(0, ul[1]), min(img.shape[0], br[1])
    new_img[new_y[0]:new_y[1], new_x[0]:new_x[1]] = img[
        old_y[0]:old_y[1], old_x[0]:old_x[1]
    ]
    if rot != 0:
        M = cv2.getRotationMatrix2D(
            (new_img.shape[1] / 2, new_img.shape[0] / 2), rot, 1.0
        )
        new_img = cv2.warpAffine(
            new_img.astype(np.float32), M,
            (new_img.shape[1], new_img.shape[0]),
        )
        new_img = new_img[pad:-pad, pad:-pad]
    return cv2.resize(
        new_img.astype(np.float32), (res[1], res[0]),
        interpolation=cv2.INTER_LINEAR,
    ).astype(img.dtype)


def uncrop(img, center, scale, orig_shape):
    """Paste a cropped image back into the original frame
    (reference imutils.py:88-113)."""
    import cv2

    res = img.shape[:2]
    ul = np.array(transform([1, 1], center, scale, res, invert=1)) - 1
    br = np.array(
        transform([res[0] + 1, res[1] + 1], center, scale, res, invert=1)
    ) - 1
    crop_shape = (br[0] - ul[0], br[1] - ul[1])
    new_img = np.zeros(orig_shape, dtype=img.dtype)
    new_x = max(0, -ul[0]), min(br[0], orig_shape[1]) - ul[0]
    new_y = max(0, -ul[1]), min(br[1], orig_shape[0]) - ul[1]
    old_x = max(0, ul[0]), min(orig_shape[1], br[0])
    old_y = max(0, ul[1]), min(orig_shape[0], br[1])
    img = cv2.resize(
        img.astype(np.float32), crop_shape,
        interpolation=cv2.INTER_NEAREST,
    ).astype(new_img.dtype)
    new_img[old_y[0]:old_y[1], old_x[0]:old_x[1]] = img[
        new_y[0]:new_y[1], new_x[0]:new_x[1]
    ]
    return new_img


def rot_aa(aa, rot):
    """Rotate an axis-angle vector about the z axis by ``rot`` degrees
    (reference imutils.py:115-127)."""
    import cv2

    R = np.array([
        [np.cos(np.deg2rad(-rot)), -np.sin(np.deg2rad(-rot)), 0],
        [np.sin(np.deg2rad(-rot)), np.cos(np.deg2rad(-rot)), 0],
        [0, 0, 1],
    ])
    per_rdg, _ = cv2.Rodrigues(np.asarray(aa, np.float64))
    resrot, _ = cv2.Rodrigues(R @ per_rdg)
    return resrot.T[0].astype(aa.dtype if hasattr(aa, "dtype") else
                              np.float32)


def flip_img(img):
    """Horizontal image flip (reference imutils.py:129-134)."""
    return np.fliplr(img)


def flip_kp(kp):
    """Flip SPIN keypoints left<->right (reference imutils.py:137-146):
    dispatches on 24 GT joints vs the 49-joint superset, like the
    reference."""
    perm = J24_FLIP_PERM if len(kp) == 24 else SPIN_JOINT_FLIP_PERM
    kp = kp[perm]
    kp = kp.copy()
    kp[:, 0] = -kp[:, 0]
    return kp


def flip_pose(pose):
    """Flip SMPL pose parameters (reference imutils.py:148-157)."""
    pose = np.asarray(pose)[SMPL_POSE_FLIP_PERM]
    pose = pose.copy()
    pose[1::3] = -pose[1::3]
    pose[2::3] = -pose[2::3]
    return pose
