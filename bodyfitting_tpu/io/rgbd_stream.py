"""Binary RGBD ``.stream`` capture IO (reference utils/FileDecoder.py).

Format (little-endian), kept bit-compatible with the reference decoder:

  header: frame_count i32, color (w, h, c) 3x i32, depth (w, h, c) 3x i32,
          2 x intrinsics blocks (3x3 f32 matrix + 10 f32 distortion:
          k1..k6, p1, p2, codx, cody), extrinsics 4x4 f32 (depth->color)
  frame:  color_ts u64, color_size u64, jpg bytes[color_size],
          depth_ts u64, depth bytes[dw*dh*dc], index bytes[dw*dh]

Adds what the reference lacks: an encoder (for tests and capture tools)
and numpy-native frame access.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Optional

import numpy as np

_HEADER_FMT = "<7i"


@dataclasses.dataclass
class StreamIntrinsics:
    matrix: np.ndarray            # [3, 3] float32
    coeffs: np.ndarray            # [10] k1..k6, p1, p2, codx, cody


@dataclasses.dataclass
class RGBDFrame:
    color: np.ndarray             # [H, W, 3] uint8 (BGR, like cv2)
    color_timestamp: int
    depth_raw: np.ndarray         # [dh, dw, dc] uint8
    depth16: np.ndarray           # [dh, dw] uint16
    depth_timestamp: int
    index: np.ndarray             # [dh, dw] uint8 segmentation ids


class RGBDStreamDecoder:
    """Random-access reader over a ``.stream`` capture file."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._parse()

    def _read(self, fmt):
        size = struct.calcsize(fmt)
        return struct.unpack(fmt, self._f.read(size))

    def _read_intrinsics(self) -> StreamIntrinsics:
        vals = self._read("<19f")
        return StreamIntrinsics(
            matrix=np.asarray(vals[:9], np.float32).reshape(3, 3),
            coeffs=np.asarray(vals[9:], np.float32),
        )

    def _parse(self):
        (self.frame_count, self.color_width, self.color_height,
         self.color_channels, self.depth_width, self.depth_height,
         self.depth_channels) = self._read(_HEADER_FMT)
        if self.frame_count == 0:
            self.frame_count = 9999
        self.depth_size = (
            self.depth_width * self.depth_height * self.depth_channels
        )
        self.index_size = self.depth_width * self.depth_height
        self.color_intrinsics = self._read_intrinsics()
        self.depth_intrinsics = self._read_intrinsics()
        ext = np.asarray(self._read("<16f"), np.float32).reshape(4, 4)
        self.depth2color = ext

        header = struct.calcsize(_HEADER_FMT) + 2 * 19 * 4 + 16 * 4
        self.frame_offsets = [header]
        import os

        file_size = os.path.getsize(self.path)
        while len(self.frame_offsets) < self.frame_count:
            prev = self.frame_offsets[-1]
            if prev + 16 > file_size:
                break
            self._f.seek(prev)
            _, color_sz = self._read("<QQ")
            nxt = prev + 3 * 8 + color_sz + self.depth_size + self.index_size
            if nxt > file_size:
                break
            self.frame_offsets.append(nxt)
        # drop trailing truncated frames (recorder killed mid-frame):
        # an offset is only a frame if its header AND payload fit
        while self.frame_offsets:
            last = self.frame_offsets[-1]
            if last + 16 > file_size:
                self.frame_offsets.pop()
                continue
            self._f.seek(last)
            _, color_sz = self._read("<QQ")
            end = last + 3 * 8 + color_sz + self.depth_size + self.index_size
            if end > file_size:
                self.frame_offsets.pop()
                continue
            break
        self.frame_count = len(self.frame_offsets)

    def get_frame(self, idx: int) -> Optional[RGBDFrame]:
        import cv2

        if idx >= len(self.frame_offsets):
            return None
        self._f.seek(self.frame_offsets[idx])
        color_ts, color_sz = self._read("<QQ")
        jpg = np.frombuffer(self._f.read(color_sz), np.uint8)
        color = cv2.imdecode(jpg, cv2.IMREAD_COLOR)
        (depth_ts,) = self._read("<Q")
        depth_bytes = self._f.read(self.depth_size)
        index_bytes = self._f.read(self.index_size)
        depth_raw = np.frombuffer(depth_bytes, np.uint8).reshape(
            self.depth_height, self.depth_width, self.depth_channels
        )
        depth16 = np.frombuffer(depth_bytes, np.uint16).reshape(
            self.depth_height, self.depth_width
        )
        index = np.frombuffer(index_bytes, np.uint8).reshape(
            self.depth_height, self.depth_width
        )
        return RGBDFrame(
            color=color, color_timestamp=color_ts, depth_raw=depth_raw,
            depth16=depth16, depth_timestamp=depth_ts, index=index,
        )

    def close(self):
        self._f.close()


def write_rgbd_stream(
    path: str,
    colors,
    depths16,
    indices,
    color_intrinsics: Optional[StreamIntrinsics] = None,
    depth_intrinsics: Optional[StreamIntrinsics] = None,
    depth2color: Optional[np.ndarray] = None,
    timestamps=None,
) -> None:
    """Encode frames into the ``.stream`` format (new capability)."""
    import cv2

    colors = list(colors)
    depths16 = [np.asarray(d, np.uint16) for d in depths16]
    indices = [np.asarray(i, np.uint8) for i in indices]
    ch, cw = colors[0].shape[:2]
    dh, dw = depths16[0].shape
    default_K = StreamIntrinsics(
        matrix=np.eye(3, dtype=np.float32),
        coeffs=np.zeros(10, np.float32),
    )
    ci = color_intrinsics or default_K
    di = depth_intrinsics or default_K
    ext = (depth2color if depth2color is not None
           else np.eye(4, dtype=np.float32))

    with open(path, "wb") as f:
        f.write(struct.pack(_HEADER_FMT, len(colors), cw, ch, 3, dw, dh, 2))
        for intr in (ci, di):
            f.write(struct.pack(
                "<19f", *np.asarray(intr.matrix, np.float32).reshape(-1),
                *np.asarray(intr.coeffs, np.float32),
            ))
        f.write(struct.pack(
            "<16f", *np.asarray(ext, np.float32).reshape(-1)
        ))
        for i, (c, d, ix) in enumerate(zip(colors, depths16, indices)):
            # `is not None` + length: plain truthiness raises on numpy
            # timestamp arrays ("truth value ... is ambiguous")
            has_ts = timestamps is not None and len(timestamps) > 0
            ts = int(timestamps[i]) if has_ts else i
            ok, jpg = cv2.imencode(".jpg", c)
            assert ok
            f.write(struct.pack("<QQ", ts, len(jpg)))
            f.write(jpg.tobytes())
            f.write(struct.pack("<Q", ts))
            f.write(d.tobytes())
            f.write(ix.tobytes())


def read_rgbd(path: str, read_color=True, read_depth=False,
              read_mask=False):
    """Bulk frame extraction (reference utils/rgbd_utils.py:11-60)."""
    dec = RGBDStreamDecoder(path)
    colors, depths, masks = [], [], []
    for i in range(dec.frame_count):
        fr = dec.get_frame(i)
        if fr is None:
            break
        if read_color:
            colors.append(fr.color)
        if read_depth:
            depths.append(fr.depth16)
        if read_mask:
            masks.append(fr.index)
    dec.close()
    return colors, depths, masks
