"""Host-side image preparation: mask-driven square cropping + intrinsics.

Reproduces the reference's crop pipeline exactly (utils/io_utils.py:97-136
``image_cropping`` and apps/genebody_fitting.py:131-141): a square bbox
around the mask with 10% padding, clamped to the image, and the matching
crop/resize adjustment of K.
"""

from __future__ import annotations

import numpy as np


def imread_checked(path: str, flags=None) -> np.ndarray:
    """``cv2.imread`` that raises ``FileNotFoundError`` naming the file.

    cv2 returns ``None`` on a missing/unreadable image, which surfaces
    later as an opaque ``AttributeError``/``TypeError`` — often from a
    prep worker thread with no path in the message.
    """
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR if flags is None else flags)
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return img


def mask_square_bbox(mask: np.ndarray) -> tuple[int, int, int, int]:
    """``(top, left, bottom, right)`` square crop window from a mask.

    Same decisions as the reference: pad the tight bbox by 10% of its size
    (left pad uses bbox_h — a reference quirk kept for parity,
    io_utils.py:110), then grow the short side to a square, sliding the
    window to stay inside the image.
    """
    ys, xs = np.nonzero(mask)
    h, w = mask.shape[:2]
    top, left = int(ys.min()), int(xs.min())
    bottom, right = int(ys.max()), int(xs.max())
    bbox_h, bbox_w = bottom - top, right - left

    bottom = min(int(bbox_h * 0.1 + bottom), h)
    top = max(int(top - bbox_h * 0.1), 0)
    right = min(int(bbox_w * 0.1 + right), w)
    left = max(int(left - bbox_h * 0.1), 0)   # quirk: uses bbox_h
    bbox_h, bbox_w = bottom - top, right - left

    if bbox_h >= bbox_w:
        center = (left + right) / 2
        size = bbox_h
        if center - size / 2 < 0:
            left, right = 0, size
        elif center + size / 2 >= w:
            left, right = w - size, w
        else:
            left = int(center - size / 2)
            right = left + size
    else:
        center = (top + bottom) / 2
        size = bbox_w
        if center - size / 2 < 0:
            top, bottom = 0, size
        elif center + size / 2 >= h:
            top, bottom = h - size, h
        else:
            top = int(center - size / 2)
            bottom = top + size
    return top, left, bottom, right


def crop_and_resize(
    img: np.ndarray,
    bbox: tuple[int, int, int, int],
    out_size: int,
    nearest: bool = False,
):
    """Crop to the bbox and resize to ``out_size`` square (cv2).

    Interpolation is INTER_LINEAR for parity with what the reference
    actually runs: genebody_fitting.py:124,130 pass INTER_CUBIC /
    INTER_NEAREST *positionally*, which lands in cv2.resize's ignored
    ``dst`` slot, so both its image and mask resizes execute the default
    INTER_LINEAR (verified empirically).  ``nearest`` is kept for callers
    that want true nearest-neighbour masks (non-parity use).
    """
    import cv2

    top, left, bottom, right = bbox
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(
        img[top:bottom, left:right].copy(), (out_size, out_size),
        interpolation=interp,
    )


def adjust_K_for_crop(
    K: np.ndarray, bbox: tuple[int, int, int, int], out_size: int
) -> np.ndarray:
    """Intrinsics after crop+resize (reference genebody_fitting.py:134-138)."""
    top, left, bottom, right = bbox
    K = np.array(K, np.float64, copy=True)
    K[0, 2] -= left
    K[1, 2] -= top
    K[0, :] *= out_size / float(right - left)
    K[1, :] *= out_size / float(bottom - top)
    return K.astype(np.float32)


def apply_mask(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Zero the background (reference: ``img * (msk > 128)[..., None]``)."""
    return img * (mask > 128)[..., None]


def bbox_from_keypoints(keypoints, rescale: float = 1.2,
                        detection_thresh: float = 0.2):
    """(center, SPIN scale) from confident 2D keypoints
    (reference io_utils.py:263-273)."""
    kp = np.reshape(np.asarray(keypoints, np.float64), (-1, 3))
    valid = kp[:, -1] > detection_thresh
    pts = kp[valid][:, :2]
    center = pts.mean(axis=0)
    size = (pts.max(axis=0) - pts.min(axis=0)).max()
    return center, size / 200.0 * rescale
