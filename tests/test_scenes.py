"""Scene-constructor coverage: dispatch map, globe determinism, camera
parameters, mesh/material composition (scene_tris.rs / scene_sphere.rs
parity)."""

import numpy as np
import pytest

from rt.config import (MAT_DIELECTRIC, MAT_LAMBERTIAN, MAT_METAL)
from rt.core.sphere import SphereArray
from rt.core.triangle import TriangleScene
from rt.scene import scenes


def test_dispatch_map_mirrors_app():
    """src/app.rs:47-55: ids 1-7 mirror the reference; 8 is our cover-scene
    extension; unknown ids fall back to the simple scene."""
    assert set(scenes.SCENE_BY_ID) == set(range(1, 9))
    assert scenes.SCENE_BY_ID[8] is scenes.scene_sphere_cover
    sd = scenes.build_scene(99, 64, 32)
    assert sd.name == "sphere_simple"


def test_simple_scene_composition():
    """scene_sphere.rs:90-128: 7 spheres with the exact material mix."""
    sd = scenes.scene_sphere_simple(64, 32)
    assert isinstance(sd.scene, SphereArray)
    kinds = np.asarray(sd.scene.mat_kind[:7])
    assert list(kinds) == [MAT_LAMBERTIAN, MAT_DIELECTRIC, MAT_LAMBERTIAN,
                           MAT_METAL, MAT_LAMBERTIAN, MAT_METAL,
                           MAT_DIELECTRIC]
    assert sd.config.n_active_spheres == 7
    # ground sphere: r=100 at (0,-100.5,-1)
    np.testing.assert_allclose(np.asarray(sd.scene.center[0]),
                               [0.0, -100.5, -1.0])
    assert float(sd.scene.radius[0]) == 100.0


def test_globe_scene_deterministic():
    """The reference's globe scene is thread_rng nondeterministic
    (scene_sphere.rs:34); ours is seeded — same seed, same scene."""
    a = scenes.scene_sphere_globe(64, 32, seed=7)
    b = scenes.scene_sphere_globe(64, 32, seed=7)
    c = scenes.scene_sphere_globe(64, 32, seed=8)
    np.testing.assert_array_equal(np.asarray(a.scene.center),
                                  np.asarray(b.scene.center))
    assert not np.array_equal(np.asarray(a.scene.center),
                              np.asarray(c.scene.center))
    # distribution shape: 1 base sphere + up to 64 shell positions at ~40%
    n = a.config.n_active_spheres
    assert 10 <= n <= 50


@pytest.mark.parametrize("builder,n_meshes,first_mat", [
    (scenes.scene_quad, 1, MAT_LAMBERTIAN),
    (scenes.scene_cube, 1, MAT_LAMBERTIAN),
    (scenes.scene_suzanne, 5, MAT_LAMBERTIAN),
    (scenes.scene_lucy, 2, MAT_LAMBERTIAN),
    (scenes.scene_dragon, 2, MAT_LAMBERTIAN),
])
def test_mesh_scene_composition(builder, n_meshes, first_mat):
    sd = builder(64, 32)
    assert isinstance(sd.scene, TriangleScene)
    assert sd.scene.mat_albedo.shape[0] == n_meshes
    assert int(sd.scene.mat_kind[0]) == first_mat
    assert sd.kind == "triangles"
    assert sd.config.bounces == 5          # BOUNCE_MAX_TRIS
    assert sd.config.normalize_defocus_dir


def test_suzanne_scene_stats():
    """scene_tris.rs:119-159: suzanne + ico_sphere + 3 cubes; BVH leaves
    pad the merged 1095-triangle soup to 2048."""
    sd = scenes.scene_suzanne(64, 32)
    assert sd.scene.m == 979 + 80 + 12 * 3  # suzanne+ico+3 cubes
    cam = sd.camera
    np.testing.assert_allclose(np.asarray(cam.eye)[:3], [0.0, 2.2, 4.5])
    assert abs(float(cam.focal_length) - 5.6) < 1e-6


def test_dragon_scene_scale():
    sd = scenes.scene_dragon(64, 32)
    assert sd.scene.m == 49976 + 12       # dragon_lp_20 + floor mesh
    assert sd.scene.n == 65536


def test_cover_scene_exceeds_reference_cap():
    """Scene 8 (RTIOW cover, BASELINE config 3): ~490 spheres, past the
    reference's MAX_OBJECT_IN_SCENE=100 cap (scene_sphere.rs:15);
    deterministic under its seed; all three material kinds present."""
    from rt.config import (MAX_SPHERES, MAT_DIELECTRIC, MAT_LAMBERTIAN,
                           MAT_METAL)
    sd = scenes.scene_sphere_cover(64, 32)
    n = sd.config.n_active_spheres
    assert n > 4 * MAX_SPHERES            # ~490 objects
    assert sd.scene.count % 8 == 0 and sd.scene.count >= n
    assert sd.config.mat_kinds == (MAT_LAMBERTIAN, MAT_METAL, MAT_DIELECTRIC)
    # deterministic: same seed -> identical buffers
    sd2 = scenes.scene_sphere_cover(64, 32)
    np.testing.assert_array_equal(np.asarray(sd.scene.center),
                                  np.asarray(sd2.scene.center))
    # hero spheres present at the end (RTIOW: glass/diffuse/metal at y=1)
    c = np.asarray(sd.scene.center)[:n]
    assert [4.0, 1.0, 0.0] in c.tolist() and [-4.0, 1.0, 0.0] in c.tolist()
    # camera: RTIOW final-scene framing
    np.testing.assert_allclose(np.asarray(sd.camera.eye)[:3], [13.0, 2.0, 3.0])
    assert sd.config.width == 64 and sd.config.height == 32
