"""Native C++ host-runtime parity: the ctypes bridge must agree exactly
(bitwise / bytewise) with the pure-Python oracles for OBJ parsing, BVH
build, and PPM serialization.  Skipped when no toolchain can build
native/librtnative.so."""

import os

import numpy as np
import pytest

from rt.scene import bvh as bvh_mod
from rt.scene.objloader import ASSET_DIR, _parse_obj_python, load_asset

nb = pytest.importorskip("rt.scene.native_bridge")

pytestmark = pytest.mark.skipif(not nb.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("name", ["cube.obj", "suzanne.obj", "quad.obj",
                                  "ico_sphere.obj"])
def test_obj_parse_parity(name):
    text = open(os.path.join(ASSET_DIR, name)).read()
    v1, f1 = _parse_obj_python(text)
    v2, f2 = nb.parse_obj(text)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)


def test_obj_negative_indices():
    text = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
    v1, f1 = _parse_obj_python(text)
    v2, f2 = nb.parse_obj(text)
    np.testing.assert_array_equal(f1, f2)
    assert f2.tolist() == [0, 1, 2]


def test_obj_quad_fan_triangulation():
    text = "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1/1/1 2/2/2 3/3/3 4/4/4\n"
    v1, f1 = _parse_obj_python(text)
    v2, f2 = nb.parse_obj(text)
    np.testing.assert_array_equal(f1, f2)
    assert len(f2) == 6  # two triangles


@pytest.mark.parametrize("name", ["cube.obj", "suzanne.obj"])
def test_bvh_build_parity(name):
    mesh = load_asset(name, bvh_mod.material_lambertian((1, 1, 1)))
    t1 = bvh_mod.Tree().add_mesh(mesh).build(use_native=True)
    t2 = bvh_mod.Tree().add_mesh(mesh).build(use_native=False)
    assert t1.sizes == t2.sizes
    for f in ("a", "b", "c", "custom", "mat_id", "bmin", "bmax"):
        np.testing.assert_array_equal(getattr(t1, f), getattr(t2, f),
                                      err_msg=f)


def test_bvh_reference_sizes():
    """tree.rs unit tests: cube -> [16, 12], suzanne -> [1024, 979]."""
    cube = load_asset("cube.obj", bvh_mod.material_lambertian((1, 1, 1)))
    assert bvh_mod.Tree().add_mesh(cube).build(use_native=True).sizes == (16, 12)


def test_ppm_parity():
    from rt.render.ppm import render_ppm
    rng = np.random.default_rng(0)
    img = (rng.random((32, 24, 3)).astype(np.float32) * 1.4 - 0.1)
    img[0, 0, 0] = np.nan
    img[0, 1, 1] = np.inf
    assert render_ppm(img, use_native=True) == render_ppm(img, use_native=False)
