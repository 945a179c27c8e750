"""Differentiable-rendering tests: forward parity with the non-diff path,
finite-difference gradient verification (the BASELINE acceptance criterion),
and a tiny albedo-recovery optimization."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rt.grad import (CameraParams, SphereParams, apply_params,
                     camera_from_params, finite_difference_check, image_mse,
                     look_at_jnp)
from rt.grad.diff_render import render_color_diff, render_image_diff
from rt.render.renderer import render_color
from rt.scene import scenes

W, H = 64, 32


def tiny_scene(bounces=3):
    sd = scenes.test_scene_metal(W, H)
    return dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=bounces))


def test_diff_forward_matches_oracle():
    """The scan+checkpoint bounce loop must produce the fori_loop path's
    exact forward values (same ops, same order)."""
    sd = tiny_scene()
    t = jnp.uint32(1000)
    a = render_color(sd.scene, sd.camera, sd.config, t)
    b = render_color_diff(sd.scene, sd.camera, sd.config, t)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_diff_forward_matches_oracle_triangles():
    sd = scenes.scene_cube(W, H)
    sd = dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=2))
    t = jnp.uint32(1000)
    b = render_color_diff(sd.scene, sd.camera, sd.config, t)
    assert np.isfinite(np.asarray(b)).all()


def test_finite_difference_albedo():
    sd = tiny_scene()
    target = render_color_diff(sd.scene, sd.camera, sd.config,
                               jnp.uint32(2000))

    def loss(albedo):
        scene = sd.scene._replace(albedo=albedo)
        img = render_color_diff(scene, sd.camera, sd.config, jnp.uint32(1000))
        return image_mse(img, target)

    loss = jax.jit(loss)
    max_rel, _ = finite_difference_check(loss, sd.scene.albedo, eps=1e-2,
                                         num_coords=6, rtol=0.2)
    assert max_rel <= 0.2


def test_finite_difference_camera_sky_path():
    """Camera gradients through the continuous sky term.

    With the reference's light transport (color = prod(albedo*0.7) *
    sky(primary_dir) — shader_sphere.wgsl:230-243), the ONLY continuous
    dependence on camera pose is via the primary ray direction entering the
    sky gradient; visibility changes are discrete jumps that FD cannot
    measure against detached-sampling autodiff.  So verify on an empty scene
    (pure sky) where the loss is everywhere continuous.
    """
    from rt.core.sphere import pack_spheres
    sd = tiny_scene(bounces=2)
    empty = pack_spheres([])
    target = render_color_diff(empty, sd.camera, sd.config, jnp.uint32(2000))
    cp = CameraParams.create((0.0, 0.1, 3.5), (0.0, 0.0, 0.0), 3.5, 0.04,
                             np.pi * 0.2)

    def loss(p):
        img = render_color_diff(empty, look_at_jnp(p), sd.config,
                                jnp.uint32(1000))
        return image_mse(img, target)

    loss = jax.jit(loss)
    max_rel, checks = finite_difference_check(loss, cp, eps=1e-3,
                                              num_coords=8, rtol=0.25)
    assert max_rel <= 0.25


def test_camera_geometry_grads_are_structurally_sky_only():
    """Documented property: with spheres present, detached-sampling autodiff
    routes camera-pose gradients only through sky(primary_dir.y) — the
    x-components are exactly zero.  (The soft-visibility relaxation in
    rt.grad is the tool for pose recovery.)"""
    sd = tiny_scene(bounces=2)
    target = render_color_diff(sd.scene, sd.camera, sd.config,
                               jnp.uint32(2000))
    cp = CameraParams.create((0.0, 0.0, 3.5), (0.0, 0.0, 0.0), 3.5, 0.04,
                             np.pi * 0.2)

    def loss(p):
        img = render_color_diff(sd.scene, look_at_jnp(p), sd.config,
                                jnp.uint32(1000))
        return image_mse(img, target)

    g = jax.grad(loss)(cp)
    assert float(g.eye[0]) == 0.0 and float(g.target[0]) == 0.0
    assert float(g.eye[1]) != 0.0  # the sky path is alive


def test_look_at_jnp_matches_host():
    from rt.core.camera import look_at
    host = look_at((1.0, 2.0, 3.5), (0.2, -0.1, 0.0), 3.5, 0.04, 0.6)
    traced = look_at_jnp(CameraParams.create((1.0, 2.0, 3.5),
                                             (0.2, -0.1, 0.0), 3.5, 0.04, 0.6))
    for a, b in zip(host, traced):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_albedo_recovery():
    """Inverse rendering: perturb one sphere's albedo, recover it."""
    from rt.grad import fit
    sd = tiny_scene(bounces=3)
    times = (1000, 1010)
    target = render_image_diff(sd.scene, sd.camera, sd.config, times)

    wrong = sd.scene.albedo.at[1].set(jnp.array([0.1, 0.9, 0.1]))
    init = {"scene": SphereParams(albedo=wrong)}
    params, losses = fit(sd.scene, sd.camera, sd.config, target, times=times,
                         steps=60, learning_rate=5e-2, init_params=init,
                         optimize_scene=False)
    assert losses[-1] < losses[0] * 0.05
    rec = np.asarray(params["scene"].albedo[1])
    np.testing.assert_allclose(rec, np.asarray(sd.scene.albedo[1]), atol=0.08)


def test_finite_difference_triangle_material():
    """BASELINE config 5's parameter class: per-mesh albedo gradients on a
    triangle scene, FD-verified."""
    from rt.grad import TriangleParams, apply_tri_params
    sd = scenes.scene_cube(W, H)
    sd = dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=2))
    target = render_color_diff(sd.scene, sd.camera, sd.config,
                               jnp.uint32(2000))

    def loss(p):
        sc = apply_tri_params(sd.scene, p)
        img = render_color_diff(sc, sd.camera, sd.config, jnp.uint32(1000))
        return image_mse(img, target)

    loss = jax.jit(loss)
    p0 = TriangleParams.from_scene(sd.scene, albedo=True)
    max_rel, _ = finite_difference_check(loss, p0, eps=1e-2, num_coords=3,
                                         rtol=0.2)
    assert max_rel <= 0.2


@pytest.mark.slow
def test_triangle_albedo_recovery():
    from rt.grad import TriangleParams, fit
    sd = scenes.scene_cube(W, H)
    sd = dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=2))
    target = render_image_diff(sd.scene, sd.camera, sd.config, (1000,))
    wrong = sd.scene.mat_albedo.at[0].set(jnp.array([0.9, 0.1, 0.1]))
    init = {"scene": TriangleParams(mat_albedo=wrong)}
    params, losses = fit(sd.scene, sd.camera, sd.config, target,
                         times=(1000,), steps=60, learning_rate=5e-2,
                         init_params=init, optimize_scene=False)
    assert losses[-1] < losses[0] * 0.05


def test_soft_render_camera_gradients_everywhere():
    """The soft-visibility surrogate has nonzero, FD-matching camera
    gradients INCLUDING the x components the hard renderer structurally
    zeroes out."""
    from rt.grad.soft import make_soft_loss, soft_render
    sd = tiny_scene(bounces=2)
    target = soft_render(sd.scene, sd.camera, sd.config, jnp.uint32(1000))
    cp = CameraParams.create((0.15, 0.1, 3.4), (0.0, 0.0, 0.0), 3.5, 0.04,
                             np.pi * 0.2)
    loss = make_soft_loss(sd.scene, sd.config, target)
    g = jax.grad(loss)(cp)
    assert float(g.eye[0]) != 0.0          # x-gradient is alive here
    max_rel, _ = finite_difference_check(loss, cp, eps=1e-3, num_coords=6,
                                         rtol=0.2)
    assert max_rel <= 0.2


@pytest.mark.slow
def test_soft_camera_recovery():
    """Recover a camera-eye offset by annealed soft-visibility descent."""
    from rt.grad.soft import recover_camera, soft_render
    sd = tiny_scene()
    true_cp = CameraParams.create((0.0, 0.0, 3.5), (0.0, 0.0, 0.0), 3.5,
                                  0.04, np.pi * 0.2)
    from rt.grad import look_at_jnp
    target = soft_render(sd.scene, look_at_jnp(true_cp), sd.config,
                         jnp.uint32(1000), tau=0.02)
    init = CameraParams.create((0.35, -0.25, 3.5), (0.0, 0.0, 0.0), 3.5,
                               0.04, np.pi * 0.2)
    rec, losses = recover_camera(sd.scene, sd.config, target, init,
                                 steps=240, learning_rate=2e-2)
    err = float(jnp.max(jnp.abs(rec.eye - true_cp.eye)))
    assert err < 0.08, f"eye error {err}"
