"""Native C++ IO runtime: differential vs the pure-Python OBJ parser."""

import os
import time

import numpy as np
import pytest

from bodyfitting_tpu.io import load_obj, save_obj_uv
from bodyfitting_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("no g++ / native build unavailable")
    return lib


def test_native_matches_python_parser(lib, tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(50, 3)).astype(np.float32)
    faces = rng.integers(0, 50, size=(30, 3)).astype(np.int32)
    uvs = rng.uniform(size=(40, 2)).astype(np.float32)
    face_uvs = rng.integers(0, 40, size=(30, 3)).astype(np.int32)
    tex = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "m.obj")
    save_obj_uv(path, verts, faces, uvs, face_uvs, texture=tex)

    mesh_py = load_obj(path, load_texture=True, use_native=False)
    mesh_nat = load_obj(path, load_texture=True, use_native=True)

    np.testing.assert_allclose(mesh_nat.verts, mesh_py.verts, atol=1e-6)
    np.testing.assert_array_equal(mesh_nat.faces, mesh_py.faces)
    np.testing.assert_allclose(mesh_nat.uvs, mesh_py.uvs, atol=1e-6)
    np.testing.assert_array_equal(mesh_nat.face_uvs, mesh_py.face_uvs)
    np.testing.assert_allclose(mesh_nat.texture, mesh_py.texture)


def test_native_quads_and_negative_indices(lib, tmp_path):
    path = tmp_path / "q.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"           # quad -> 2 tris
        "f -4 -3 -2\n"          # negative indices
    )
    mesh = load_obj(str(path), use_native=True)
    np.testing.assert_array_equal(
        mesh.faces, [[0, 1, 2], [0, 2, 3], [0, 1, 2]]
    )


def test_native_mixed_face_forms(lib, tmp_path):
    path = tmp_path / "mixed.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1\n"
        "f 1//1 2//1 3//1\n"
    )
    import pytest

    with pytest.warns(UserWarning, match="lack vt"):
        mesh = load_obj(str(path), use_native=True)
    assert mesh.faces.shape == (2, 3)
    # partial vt coverage degrades to None (numpy fancy indexing would
    # wrap the -1 sentinels to uvs[-1], silently mispairing textures)
    assert mesh.face_uvs is None
    np.testing.assert_array_equal(mesh.face_normals, np.zeros((2, 3)))


def test_native_write_roundtrip(lib, tmp_path):
    rng = np.random.default_rng(1)
    verts = rng.normal(size=(20, 3)).astype(np.float32)
    faces = rng.integers(0, 20, size=(12, 3)).astype(np.int32)
    path = str(tmp_path / "w.obj")
    assert native.write_obj_native(path, verts, faces)
    mesh = load_obj(path)
    np.testing.assert_allclose(mesh.verts, verts, atol=1e-4)
    np.testing.assert_array_equal(mesh.faces, faces)


def test_native_writer_byte_identical_to_python(lib, tmp_path):
    """save_obj's native fast path must be byte-identical to the Python
    reference-format writer (io_utils.py:185-192) so cached outputs never
    depend on which path wrote them."""
    from bodyfitting_tpu.io.obj import save_obj

    rng = np.random.default_rng(5)
    verts = (rng.normal(size=(500, 3)) * 3).astype(np.float32)
    faces = rng.integers(0, 500, size=(900, 3)).astype(np.int32)
    p_nat = str(tmp_path / "nat.obj")
    p_py = str(tmp_path / "py.obj")
    save_obj(p_nat, verts, faces, use_native=True)
    save_obj(p_py, verts, faces, use_native=False)
    assert open(p_nat, "rb").read() == open(p_py, "rb").read()


def test_native_is_faster_on_large_files(lib, tmp_path):
    rng = np.random.default_rng(2)
    n = 40000
    verts = rng.normal(size=(n, 3)).astype(np.float32)
    faces = rng.integers(0, n, size=(2 * n, 3)).astype(np.int32)
    path = str(tmp_path / "big.obj")
    with open(path, "w") as f:
        for v in verts:
            f.write("v %.4f %.4f %.4f\n" % (v[0], v[1], v[2]))
        for fa in faces + 1:
            f.write("f %d %d %d\n" % (fa[0], fa[1], fa[2]))

    t0 = time.perf_counter()
    m_nat = load_obj(path, use_native=True)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    m_py = load_obj(path, use_native=False)
    t_py = time.perf_counter() - t0
    np.testing.assert_array_equal(m_nat.faces, m_py.faces)
    assert t_nat < t_py, (t_nat, t_py)
    print(f"native {t_nat * 1e3:.1f}ms vs python {t_py * 1e3:.1f}ms")


def test_native_messy_formatting(lib, tmp_path):
    """Comments, CRLF, blank lines, extra whitespace parse identically."""
    path = tmp_path / "messy.obj"
    path.write_bytes(
        b"# a comment\r\n"
        b"\r\n"
        b"v   0.0\t0.0  0.0\r\n"
        b"v 1 0 0\n"
        b"v 0 1 0   # trailing comment\n"
        b"vt 0.5 0.5\n"
        b"g group1\n"
        b"usemtl something\n"
        b"f 1 2 3\n"
        b"  f 3 2 1\n"
    )
    m_nat = load_obj(str(path), use_native=True)
    m_py = load_obj(str(path), use_native=False)
    np.testing.assert_allclose(m_nat.verts, m_py.verts)
    np.testing.assert_array_equal(m_nat.faces, m_py.faces)
    assert m_nat.faces.shape == (2, 3)


def test_native_empty_and_missing(lib, tmp_path):
    empty = tmp_path / "empty.obj"
    empty.write_text("")
    m = load_obj(str(empty), use_native=True)
    assert m.verts.shape[0] == 0 and m.faces.shape[0] == 0
    with pytest.raises(IOError):
        load_obj(str(tmp_path / "nonexistent.obj"), use_native=True)


def test_native_short_line_does_not_cross_newline(lib, tmp_path):
    """strtof/strtol skip whitespace incl. newlines: a truncated 'v' line
    must zero-fill, not steal the next line's number and drop that line."""
    path = tmp_path / "short.obj"
    path.write_text(
        "v 1 2\n"          # truncated: z missing
        "v -3 -4 -5\n"
        "v 6 7 8\n"
        "f 1 2 3\n"
    )
    mesh = load_obj(str(path), use_native=True)
    assert mesh.verts.shape == (3, 3)
    np.testing.assert_allclose(mesh.verts[0], [1, 2, 0])   # zero-filled
    np.testing.assert_allclose(mesh.verts[1], [-3, -4, -5])
    np.testing.assert_allclose(mesh.verts[2], [6, 7, 8])
    assert mesh.faces.shape == (1, 3)


def test_native_trailing_slash_corners(lib, tmp_path):
    """'f 1/ 2/ 3/' (exporters emitting empty vt slots) must keep the
    face instead of strtol stealing the next corner's vertex index."""
    path = tmp_path / "slash.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "f 1/ 2/ 3/\n"
    )
    mesh = load_obj(str(path), use_native=True)
    assert mesh.faces.shape == (1, 3)
    np.testing.assert_array_equal(mesh.faces[0], [0, 1, 2])
    assert mesh.face_uvs is None
