"""OBJ loader parity with the reference's unit tests
(src/geometry/mesh.rs:64-89)."""

import numpy as np

from rt.scene import objloader


def test_cube_counts():
    m = objloader.load_asset("cube.obj")
    assert m.vertices.shape == (8, 3)
    assert len(m.indices) == 36


def test_suzanne_counts():
    m = objloader.load_asset("suzanne.obj")
    assert m.vertices.shape == (515, 3)
    assert len(m.indices) == 2937


def test_parse_failure_returns_empty_mesh():
    # mesh.rs:54-59 — silent empty mesh
    m = objloader.load_obj(b"\xff\xfe not an obj \x00")
    assert m.vertices.shape[0] == 0 and len(m.indices) == 0


def test_indices_in_range():
    for name in ["cube.obj", "suzanne.obj", "quad.obj", "ico_sphere.obj"]:
        m = objloader.load_asset(name)
        if len(m.indices):
            assert m.indices.max() < len(m.vertices)
            assert m.indices.min() >= 0
            assert len(m.indices) % 3 == 0


def test_python_parser_direct():
    v, f = objloader._parse_obj_python(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    assert v.shape == (3, 3)
    np.testing.assert_array_equal(f, [0, 1, 2])
