"""Camera basis construction and the vec4-w conventions
(src/scene/camera.rs:15-28 vs src/camera_controller.rs:116-129)."""

import numpy as np

from rt.core import camera as cam


def test_look_at_basis_reference_example():
    # Camera at (0,0,3.5) looking at origin: dir=(0,0,-1), right=(1,0,0),
    # up=(0,1,0) — the basis printed by the reference's camera.rs println.
    c = cam.look_at((0, 0, 3.5), (0, 0, 0), 3.5, 0.04, np.pi * 0.2)
    np.testing.assert_allclose(np.asarray(c.direction), [0, 0, -1, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.right), [1, 0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.up), [0, 1, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c.eye), [0, 0, 3.5, 1], atol=1e-6)


def test_scene_camera_w_is_one():
    # camera.rs:22-25 extends every basis vector with 1.0 — the 4D-normalize
    # quirk in make_ray depends on this.
    c = cam.look_at((3, 1.5, -2), (0, 0, -5), 5.0, 0.1, 0.8)
    for v in (c.eye, c.direction, c.up, c.right):
        assert float(v[3]) == 1.0


def test_orbit_uniform_w_is_zero():
    # camera_controller.rs:119-127: w=0 on direction/up/right, fl=10, blur=0.
    c = cam.orbit_uniform((0, 0, 5), (0, 0, 0), np.radians(45))
    assert float(c.eye[3]) == 1.0
    for v in (c.direction, c.up, c.right):
        assert float(v[3]) == 0.0
    assert float(c.focal_length) == 10.0
    assert float(c.focal_blur) == 0.0


def test_defocus_disk_consumes_three_draws_even_at_zero_blur():
    import jax.numpy as jnp

    from rt.core import rng
    s0 = jnp.uint32(123)
    s_after, off = cam.random_on_disk(s0, jnp.float32(0.0))
    s_expect = rng.step(rng.step(rng.step(s0)))
    assert np.uint32(s_after) == np.uint32(s_expect)
    np.testing.assert_array_equal(np.asarray(off), [0, 0, 0])


def test_primary_ray_4d_normalize_quirk():
    # With w=1 camera vectors the 3D part of the direction is NOT unit.
    import jax.numpy as jnp
    c = cam.look_at((0, 0, 3.5), (0, 0, 0), 1.0, 0.0, np.pi * 0.2)
    uv = jnp.array([[0.5, 0.5]], jnp.float32)
    _, o, d = cam.make_ray(c, uv, jnp.uint32([7]), normalize_defocus_dir=True)
    n3 = float(np.linalg.norm(np.asarray(d[0])))
    assert abs(n3 - 1.0) > 1e-3  # 4D-normalized => 3D norm < 1
