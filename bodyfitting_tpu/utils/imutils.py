"""SPIN-style image/keypoint augmentation utilities (host-side numpy).

The center+scale crop transform used for HMR preprocessing (the
"box height = 200 * scale" convention), its inverse, and the left-right
flip helpers for images, SPIN keypoints and SMPL pose vectors.

The numerical contract here is exact and inherited: HMR was trained on
crops produced by SPIN's MIT-licensed ``utils/imutils.py`` (which the
reference vendors at /root/reference/utils/imutils.py), including its
1-based pixel offsets and integer truncations — reproducing those to the
pixel is the point, so the formulas below are **derived from SPIN (MIT)**
rather than redesigned.  The deprecated ``scipy.misc`` image calls are
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
    """Affine (3x3) mapping original-image pixels into the crop's pixels.

    The crop is the square of side ``200 * scale`` original pixels
    centered on ``center``, resampled to ``res = (out_h, out_w)``;
    ``rot`` degrees of rotation are applied about the crop center.
    (Exact SPIN semantics, reference imutils.py:14-40.)
    """
    box_h = 200.0 * scale
    out_h, out_w = float(res[0]), float(res[1])
    m = np.array([
        [out_w / box_h, 0.0, out_w * (-float(center[0]) / box_h + 0.5)],
        [0.0, out_h / box_h, out_h * (-float(center[1]) / box_h + 0.5)],
        [0.0, 0.0, 1.0],
    ])
    if rot != 0:
        ang = -rot * np.pi / 180.0
        cs, sn = np.cos(ang), np.sin(ang)
        spin = np.array([
            [cs, -sn, 0.0], [sn, cs, 0.0], [0.0, 0.0, 1.0],
        ])
        to_center = np.eye(3)
        to_center[:2, 2] = [-out_w / 2, -out_h / 2]
        from_center = np.eye(3)
        from_center[:2, 2] = [out_w / 2, out_h / 2]
        m = from_center @ spin @ to_center @ m
    return m


def transform(pt, center, scale, res, invert=0, rot=0):
    """Map one pixel between the original and cropped frames.

    Keeps SPIN's quirks on purpose (reference imutils.py:42-49): pixels
    are treated 1-based on the way in and out, and the result is
    truncated to int — the integer crop boxes below depend on it.
    """
    m = get_transform(center, scale, res, rot=rot)
    if invert:
        m = np.linalg.inv(m)
    mapped = m @ np.array([pt[0] - 1, pt[1] - 1, 1.0])
    return mapped[:2].astype(int) + 1


def _overlap(box_ul, box_br, img_h, img_w):
    """Index ranges pasting the image region ``[ul, br)`` into a canvas
    whose origin sits at ``box_ul``: returns ``(canvas_y, canvas_x,
    image_y, image_x)`` as (start, stop) pairs."""
    canvas_x = max(0, -box_ul[0]), min(box_br[0], img_w) - box_ul[0]
    canvas_y = max(0, -box_ul[1]), min(box_br[1], img_h) - box_ul[1]
    image_x = max(0, box_ul[0]), min(img_w, box_br[0])
    image_y = max(0, box_ul[1]), min(img_h, box_br[1])
    return canvas_y, canvas_x, image_y, image_x


def _crop_box(center, scale, res):
    """Integer (x, y) corners of the crop box in original-image pixels."""
    box_ul = np.array(transform([1, 1], center, scale, res, invert=1)) - 1
    box_br = np.array(
        transform([res[0] + 1, res[1] + 1], center, scale, res, invert=1)
    ) - 1
    return box_ul, box_br


def crop(img, center, scale, res, rot=0):
    """Crop + resize with zero padding (reference imutils.py:51-86).

    With rotation the canvas is grown by a diagonal-sized margin first so
    the rotated content never clips, then trimmed back.
    """
    import cv2

    box_ul, box_br = _crop_box(center, scale, res)
    margin = int(
        np.linalg.norm(box_br - box_ul) / 2
        - float(box_br[1] - box_ul[1]) / 2
    )
    if rot != 0:
        box_ul -= margin
        box_br += margin
    canvas_shape = [box_br[1] - box_ul[1], box_br[0] - box_ul[0]]
    if img.ndim > 2:
        canvas_shape += [img.shape[2]]
    canvas = np.zeros(canvas_shape, dtype=img.dtype)

    cy, cx, iy, ix = _overlap(box_ul, box_br, img.shape[0], img.shape[1])
    canvas[cy[0]:cy[1], cx[0]:cx[1]] = img[iy[0]:iy[1], ix[0]:ix[1]]
    if rot != 0:
        spin = cv2.getRotationMatrix2D(
            (canvas.shape[1] / 2, canvas.shape[0] / 2), rot, 1.0
        )
        canvas = cv2.warpAffine(
            canvas.astype(np.float32), spin,
            (canvas.shape[1], canvas.shape[0]),
        )
        canvas = canvas[margin:-margin, margin:-margin]
    return cv2.resize(
        canvas.astype(np.float32), (res[1], res[0]),
        interpolation=cv2.INTER_LINEAR,
    ).astype(img.dtype)


def uncrop(img, center, scale, orig_shape):
    """Paste a cropped image back into the original frame
    (reference imutils.py:88-113; nearest-neighbour upsampling, as there).
    """
    import cv2

    res = img.shape[:2]
    box_ul, box_br = _crop_box(center, scale, res)
    restored = np.zeros(orig_shape, dtype=img.dtype)
    cy, cx, iy, ix = _overlap(
        box_ul, box_br, orig_shape[0], orig_shape[1]
    )
    img = cv2.resize(
        img.astype(np.float32),
        (box_br[0] - box_ul[0], box_br[1] - box_ul[1]),
        interpolation=cv2.INTER_NEAREST,
    ).astype(restored.dtype)
    restored[iy[0]:iy[1], ix[0]:ix[1]] = img[cy[0]:cy[1], cx[0]:cx[1]]
    return restored


def rot_aa(aa, rot):
    """Rotate an axis-angle vector about the z axis by ``rot`` degrees
    (reference imutils.py:115-127)."""
    import cv2

    ang = np.deg2rad(-rot)
    Rz = np.array([
        [np.cos(ang), -np.sin(ang), 0],
        [np.sin(ang), np.cos(ang), 0],
        [0, 0, 1],
    ])
    R_aa, _ = cv2.Rodrigues(np.asarray(aa, np.float64))
    rotated, _ = cv2.Rodrigues(Rz @ R_aa)
    return rotated.T[0].astype(
        aa.dtype if hasattr(aa, "dtype") else np.float32
    )


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
