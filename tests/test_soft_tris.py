"""Triangle-scene soft surrogate (rt/grad/soft_tris.py) — the mesh pose
recovery path that closes BASELINE config 5's camera clause.

Mirrors tests/test_grad.py's sphere-surrogate coverage: FD-verified pose
gradients, albedo gradients, tau->0 consistency with the hard renderer's
first bounce, and end-to-end pose recovery against an EXACT-render target.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rt.grad import (CameraParams, finite_difference_check, look_at_jnp,
                     make_soft_tris_loss, recover_camera_tris,
                     soft_render_tris)
from rt.scene import scenes


def small(builder, w=64, h=48, bounces=2):
    sd = builder(w, h)
    return dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=bounces))


def cube_cp():
    # scene_cube's camera (scene_tris.rs:160-180): eye (0,1,3)->(0,0,0),
    # fl 3.5, blur 0, fov 0.25*pi  (see rt/scene/scenes.py:scene_cube)
    sd = scenes.scene_cube(8, 8)
    eye = np.asarray(sd.camera.eye[:3])
    return CameraParams.create(eye, (0.0, 0.0, 0.0),
                               float(sd.camera.focal_length),
                               float(sd.camera.focal_blur),
                               float(sd.camera.fov))


def test_soft_tris_fd_camera():
    """Pose gradients of the mesh surrogate agree with central differences
    — including across silhouettes (where the hard renderer's are zero)."""
    sd = small(scenes.scene_cube)
    true_cp = cube_cp()
    target = soft_render_tris(sd.scene, look_at_jnp(true_cp), sd.config,
                              jnp.uint32(1000), tau=0.08)
    off = true_cp._replace(eye=true_cp.eye + jnp.asarray([0.07, -0.05, 0.0]),
                           fov=true_cp.fov + 0.01)
    loss = make_soft_tris_loss(sd.scene, sd.config, target, tau=0.08)
    max_rel, checks = finite_difference_check(loss, off, eps=1e-3,
                                              num_coords=8, rtol=0.08)
    # gradients must be alive, not vacuously matching zeros
    g = jax.grad(loss)(off)
    assert float(jnp.max(jnp.abs(g.eye))) > 1e-4
    assert abs(float(g.fov)) > 1e-4


def test_soft_tris_fd_albedo():
    """Joint albedo gradients (the config-5 'jointly with materials' leg)."""
    sd = small(scenes.scene_cube)
    cp = cube_cp()
    target = soft_render_tris(sd.scene, look_at_jnp(cp), sd.config,
                              jnp.uint32(1000), tau=0.08)
    loss0 = make_soft_tris_loss(sd.scene, sd.config, target, tau=0.08)
    bad = sd.scene.mat_albedo.at[0, 0].add(0.2)
    loss = lambda alb: loss0(cp, alb)
    max_rel, _ = finite_difference_check(loss, bad, eps=1e-2, num_coords=4,
                                         rtol=0.08)
    assert float(jnp.max(jnp.abs(jax.grad(loss)(bad)))) > 1e-5


def test_soft_tris_approaches_hard_first_bounce():
    """tau -> 0 limit: on a single-bounce lambertian scene the surrogate
    converges to the exact transport (albedo*0.7*sky on hits, sky on
    misses) except in the AA-jitter edge band."""
    from rt.render.renderer import render_color

    sd = small(scenes.scene_quad, bounces=1)
    hard = np.asarray(render_color(sd.scene, sd.camera, sd.config,
                                   jnp.uint32(1000)))
    soft = np.asarray(soft_render_tris(sd.scene, sd.camera, sd.config,
                                       jnp.uint32(1000), tau=0.003,
                                       tau_depth=0.2))
    mean_diff = np.abs(hard - soft).mean()
    assert mean_diff < 0.02, f"mean diff {mean_diff}"


def test_soft_tris_chunking_invariant():
    """The streamed chunk scan is exactly the unchunked sum."""
    sd = small(scenes.scene_cube)
    cam = look_at_jnp(cube_cp())
    t = jnp.uint32(1000)
    full = soft_render_tris(sd.scene, cam, sd.config, t, chunk=128)
    chunked = soft_render_tris(sd.scene, cam, sd.config, t, chunk=5)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=2e-6, rtol=0)


def test_cube_pose_recovery_from_exact_target():
    """End-to-end: recover a perturbed pose (eye offset + fov) on the cube
    scene against the EXACT renderer's image — the unit-scale version of
    the Suzanne config-5 pipeline (tools/exp_config5_pose.py)."""
    from rt.grad.soft_tris import downsample
    from rt.render.renderer import render_color

    sd = small(scenes.scene_cube, w=96, h=72, bounces=2)
    true_cp = cube_cp()
    target = render_color(sd.scene, look_at_jnp(true_cp), sd.config,
                          jnp.uint32(1000))

    init = true_cp._replace(
        eye=true_cp.eye + jnp.asarray([0.12, -0.09, 0.0], jnp.float32),
        fov=true_cp.fov + 0.03)
    rec, _, losses = recover_camera_tris(
        sd.scene, sd.config, target, init, steps=180, learning_rate=1e-2,
        taus=(0.1, 0.04, 0.015), optimize_fields=("eye", "fov"))

    err0 = float(jnp.max(jnp.abs(init.eye - true_cp.eye)))
    err1 = float(jnp.max(jnp.abs(rec.eye - true_cp.eye)))
    ferr0 = abs(float(init.fov) - float(true_cp.fov))
    ferr1 = abs(float(rec.fov) - float(true_cp.fov))
    assert err1 < err0 / 4, f"eye error {err0} -> {err1}"
    assert ferr1 < ferr0 / 2, f"fov error {ferr0} -> {ferr1}"
    assert losses[-1] < losses[0]
