"""ctypes binding to the native IO runtime (native/bodyfit_native.cpp).

The shared library is built on first use with g++ and cached next to the
source; every entry point degrades gracefully to the pure-Python path when
no compiler is available, so the package never hard-depends on the native
build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_LIB = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native",
    )


def _build_library(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed: {e}", file=sys.stderr)
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_native_dir(), "bodyfit_native.cpp")
    so = os.path.join(_native_dir(), "libbodyfit_native.so")
    if not os.path.exists(src):
        _LIB_FAILED = True
        return None
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        if not _build_library(src, so):
            _LIB_FAILED = True
            return None
    lib = ctypes.CDLL(so)
    lib.parse_obj.restype = ctypes.c_int
    lib.parse_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p,
    ]
    lib.write_obj.restype = ctypes.c_int
    lib.write_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.free_f32.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.free_i32.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return _LIB


def parse_obj_native(path: str):
    """Parse an OBJ with the native runtime.

    Returns ``(verts, uvs, normals, faces, face_uvs, face_normals, mtllib)``
    as numpy arrays (face_uvs/face_normals None when absent), or None when
    the native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    verts_p, uvs_p, norms_p = fp(), fp(), fp()
    faces_p, fuv_p, fn_p = ip(), ip(), ip()
    nv, nu, nn, nf = (ctypes.c_int64(), ctypes.c_int64(), ctypes.c_int64(),
                      ctypes.c_int64())
    mtl = ctypes.create_string_buffer(256)
    rc = lib.parse_obj(
        path.encode(), ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(uvs_p), ctypes.byref(nu), ctypes.byref(norms_p),
        ctypes.byref(nn), ctypes.byref(faces_p), ctypes.byref(fuv_p),
        ctypes.byref(fn_p), ctypes.byref(nf), mtl,
    )
    if rc != 0:
        raise IOError(f"parse_obj({path}) failed with code {rc}")

    def take_f(ptr, n, cols):
        if n == 0:
            lib.free_f32(ptr)
            return None
        out = np.ctypeslib.as_array(ptr, shape=(n * cols,)).copy()
        lib.free_f32(ptr)
        return out.reshape(n, cols)

    def take_i(ptr, n):
        if n == 0:
            lib.free_i32(ptr)
            return None
        out = np.ctypeslib.as_array(ptr, shape=(n * 3,)).copy()
        lib.free_i32(ptr)
        return out.reshape(n, 3)

    verts = take_f(verts_p, nv.value, 3)
    uvs = take_f(uvs_p, nu.value, 2)
    normals = take_f(norms_p, nn.value, 3)
    faces = take_i(faces_p, nf.value)
    face_uvs = take_i(fuv_p, nf.value)
    face_normals = take_i(fn_p, nf.value)
    def drop_partial(arr, kind):
        # -1 rows mark faces without vt/vn indices; partial coverage
        # cannot be represented downstream (numpy fancy indexing wraps
        # -1), so it degrades to None like the Python parser
        if arr is None or not (arr < 0).any():
            return arr
        if not (arr < 0).all():
            import warnings

            warnings.warn(
                f"{int((arr < 0).any(1).sum())}/{len(arr)} faces lack "
                f"{kind} indices; dropping per-face {kind} entirely"
            )
        return None

    face_uvs = drop_partial(face_uvs, "vt")
    face_normals = drop_partial(face_normals, "vn")
    return (
        verts, uvs, normals, faces, face_uvs, face_normals,
        mtl.value.decode() or None,
    )


def write_obj_native(path: str, verts: np.ndarray,
                     faces: np.ndarray) -> bool:
    lib = load_library()
    if lib is None:
        return False
    v = np.ascontiguousarray(verts, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    rc = lib.write_obj(
        path.encode(),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
    )
    return rc == 0
