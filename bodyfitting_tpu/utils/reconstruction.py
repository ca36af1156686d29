"""Depth-map reconstruction helpers (reference utils/reconstruction_utils.py).

Depth colorization for debug images and depth-map -> point-cloud
unprojection; the open3d visualisers are replaced by plain OBJ/ply-free
numpy outputs (render with any viewer).
"""

from __future__ import annotations

import numpy as np


def copy2cpu(x) -> np.ndarray:
    """Device array -> numpy (reference reconstruction_utils.py:13)."""
    return np.asarray(x)


def depth_colorize(depth: np.ndarray, max_depth: float = None) -> np.ndarray:
    """Depth -> uint8 heat colormap (reference reconstruction_utils.py:16)."""
    import cv2

    d = np.asarray(depth, np.float32)
    valid = d > 0
    if not valid.any():
        return np.zeros(d.shape + (3,), np.uint8)
    dmax = max_depth or float(d[valid].max())
    dmin = float(d[valid].min())
    norm = np.zeros_like(d)
    norm[valid] = (d[valid] - dmin) / max(dmax - dmin, 1e-6)
    # clamp BEFORE the uint8 cast (reference reconstruction_utils.py:18-20):
    # depths past max_depth would otherwise wrap modulo 256 into arbitrary
    # mid-range colormap colors
    img = cv2.applyColorMap(
        np.clip(norm * 255, 0, 255).astype(np.uint8), cv2.COLORMAP_JET
    )
    img[~valid] = 0
    return img


def pointcloud_from_depthmap(
    depth: np.ndarray,
    K: np.ndarray,
    c2w: np.ndarray = None,
    color: np.ndarray = None,
    stride: int = 1,
    depth_scale: float = 1.0,
    max_depth: float = np.inf,
):
    """Unproject a depth map to a world-space point cloud
    (reference reconstruction_utils.py:72-130).

    Returns ``(points [N, 3], colors [N, 3] or None)``.
    """
    d = np.asarray(depth, np.float64)[::stride, ::stride] * depth_scale
    H, W = d.shape
    ys, xs = np.mgrid[0:H, 0:W]
    xs = xs * stride
    ys = ys * stride
    valid = (d > 0) & (d < max_depth)
    z = d[valid]
    x = (xs[valid] - K[0, 2]) / K[0, 0] * z
    y = (ys[valid] - K[1, 2]) / K[1, 1] * z
    pts = np.stack([x, y, z], axis=1)
    if c2w is not None:
        R, t = np.asarray(c2w)[:3, :3], np.asarray(c2w)[:3, 3]
        pts = pts @ R.T + t
    cols = None
    if color is not None:
        cols = np.asarray(color)[::stride, ::stride][valid]
    return pts, cols


def save_pointcloud_obj(path: str, points: np.ndarray,
                        colors: np.ndarray = None) -> None:
    """Write a point cloud as OBJ vertices (with optional rgb)."""
    with open(path, "w") as f:
        if colors is None:
            for p in points:
                f.write("v %.6f %.6f %.6f\n" % (p[0], p[1], p[2]))
        else:
            c = np.asarray(colors, np.float64)
            if c.max() > 1.0:
                c = c / 255.0
            for p, col in zip(points, c):
                f.write(
                    "v %.6f %.6f %.6f %.4f %.4f %.4f\n"
                    % (p[0], p[1], p[2], col[0], col[1], col[2])
                )
