"""BVH builder parity with the reference's unit tests
(src/scene/bvh/tree.rs:99-126) plus structural invariants."""

import numpy as np

from rt.scene import bvh, objloader


def _tree(name):
    m = objloader.load_asset(name, bvh.material_lambertian((0.5, 0.5, 0.5)))
    return bvh.build_tree([m])


def test_cube_sizes():
    t = _tree("cube.obj")
    assert t.sizes == (16, 12)
    assert t.bmin.shape == (16, 3)
    assert len(t.a) == 12
    assert len(t.materials) == 1


def test_suzanne_sizes():
    t = _tree("suzanne.obj")
    assert t.sizes == (1024, 979)
    assert t.bmin.shape == (1024, 3)
    assert len(t.a) == 979


def test_root_aabb_bounds_everything():
    t = _tree("suzanne.obj")
    all_min = np.minimum(np.minimum(t.a, t.b), t.c).min(0)
    all_max = np.maximum(np.maximum(t.a, t.b), t.c).max(0)
    np.testing.assert_allclose(t.bmin[1], all_min, rtol=0, atol=0)
    np.testing.assert_allclose(t.bmax[1], all_max, rtol=0, atol=0)


def test_node0_is_inverted_infinite_box():
    # node.rs:20-27 — node 0 never touched by the ancestor walk
    t = _tree("cube.obj")
    assert (t.bmin[0] > t.bmax[0]).all()


def test_child_aabbs_nest():
    t = _tree("suzanne.obj")
    n = t.sizes[0]
    for k in range(1, n // 2):
        for child in (2 * k, 2 * k + 1):
            # empty children (inverted boxes) trivially "nest"
            if (t.bmin[child] <= t.bmax[child]).all():
                assert (t.bmin[k] <= t.bmin[child] + 1e-6).all()
                assert (t.bmax[k] >= t.bmax[child] - 1e-6).all()


def test_normals_are_unit_and_flat():
    t = _tree("cube.obj")
    ln = np.linalg.norm(t.custom, axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)
    # face normal orthogonal to both edges
    e1 = t.b - t.a
    e2 = t.c - t.a
    assert np.abs((t.custom * e1).sum(-1)).max() < 1e-4
    assert np.abs((t.custom * e2).sum(-1)).max() < 1e-4


def test_multi_mesh_material_ids():
    m1 = objloader.load_asset("quad.obj", bvh.material_lambertian((1, 0, 0)))
    m2 = objloader.load_asset("cube.obj", bvh.material_metal((0, 1, 0), 0.3))
    t = bvh.build_tree([m1, m2])
    assert len(t.materials) == 2
    assert set(np.unique(t.mat_id)) == {0, 1}
    assert t.sizes == (16, 14)  # 2 + 12 triangles -> n = 16
