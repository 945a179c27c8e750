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


def small(builder, w=64, h=48, bounces=2, spp=1):
    sd = builder(w, h)
    return dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=bounces,
                                       samples_per_frame=spp))


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


def test_cube_free_eye_recovery_is_gauge_limited():
    """Free 3-dof eye recovery on a mesh scene converges in LOSS but not
    necessarily in eye position: dolly-along-view and translate-vs-tilt are
    near-degenerate at surrogate fidelity (measured: loss down 22x, eye
    error only ~2x on a 1.8-degree tangential perturbation).  This is why
    the production mesh pose path is ORBIT-coordinate recovery
    (recover_orbit_tris — the reference camera's own dof, with the radius
    gauge axis explicit and freezable); free-eye stays supported for
    sphere scenes (rt/grad/soft.py) where silhouette curvature pins it."""
    from rt.render.renderer import render_color

    sd = small(scenes.scene_cube, w=96, h=72, bounces=2, spp=4)
    true_cp = cube_cp()
    target = render_color(sd.scene, look_at_jnp(true_cp), sd.config,
                          jnp.uint32(1000))

    eye = np.asarray(true_cp.eye)
    v = eye  # target is the origin for cube_cp
    a = np.deg2rad(1.8)
    c, s = np.cos(a), np.sin(a)
    v2 = np.array([c * v[0] + s * v[2], v[1], -s * v[0] + c * v[2]],
                  np.float32)
    init = true_cp._replace(eye=jnp.asarray(v2))
    rec, _, losses = recover_camera_tris(
        sd.scene, sd.config, target, init, steps=160, learning_rate=8e-3,
        taus=(0.06, 0.02, 0.008), optimize_fields=("eye",))

    err0 = float(jnp.max(jnp.abs(init.eye - true_cp.eye)))
    err1 = float(jnp.max(jnp.abs(rec.eye - true_cp.eye)))
    assert losses[-1] < losses[0] / 5, f"loss {losses[0]} -> {losses[-1]}"
    assert err1 < err0, f"eye error {err0} -> {err1}"


def test_orbit_params_roundtrip():
    """from_eye(to_camera_params(op).eye) == op (the reference's
    update_position spherical convention, camera_controller.rs:59-70)."""
    from rt.grad.soft_tris import OrbitParams

    op = OrbitParams.create(9.26, 1.57, 1.33, 0.9)
    cp = op.to_camera_params((0.0, 0.0, -4.5), 5.6, 0.0)
    back = OrbitParams.from_eye(np.asarray(cp.eye), (0.0, 0.0, -4.5), 0.9)
    np.testing.assert_allclose(
        [float(back.radius), float(back.theta), float(back.phi)],
        [9.26, 1.57, 1.33], atol=1e-5)


def test_cube_orbit_recovery_from_exact_target():
    """Orbit-coordinate pose recovery (theta/phi/fov, radius pinned) on the
    cube against the exact renderer — the unit-scale config-5 camera
    clause (tools/exp_config5_pose.py runs the Suzanne full-scale form)."""
    from rt.grad.soft_tris import OrbitParams, recover_orbit_tris
    from rt.render.renderer import render_color

    sd = small(scenes.scene_cube, w=96, h=72, bounces=2, spp=4)
    # scene_cube's camera looks at (0, 0.1, -3.0), NOT the origin
    # (scene_tris.rs:160-180); the orbit sphere is centered there
    look_target = (0.0, 0.1, -3.0)
    fl, blur = float(sd.camera.focal_length), float(sd.camera.focal_blur)
    true_op = OrbitParams.from_eye(np.asarray(sd.camera.eye[:3]),
                                   look_target, float(sd.camera.fov))
    target = render_color(sd.scene, sd.camera, sd.config, jnp.uint32(1000))

    init = OrbitParams.create(float(true_op.radius),
                              float(true_op.theta) + np.deg2rad(2.5),
                              float(true_op.phi) - np.deg2rad(1.5),
                              float(true_op.fov) + 0.03)
    rec, losses = recover_orbit_tris(
        sd.scene, sd.config, target, init, look_target, focal_length=fl,
        focal_blur=blur, steps=200, learning_rate=8e-3,
        taus=(0.06, 0.02, 0.008, 0.003))

    def errs(op):
        return (abs(float(op.theta) - float(true_op.theta)),
                abs(float(op.phi) - float(true_op.phi)),
                abs(float(op.fov) - float(true_op.fov)))

    e0, e1 = errs(init), errs(rec)
    # measured on this config: theta 71x, phi 51x, fov 3.4x (fov is
    # pixel-limited at 96x72 — ~1 px of edge scale; the full-scale tool
    # runs at 480x270 where the floor is ~4x lower)
    assert e1[0] < e0[0] / 10, f"theta {e0[0]} -> {e1[0]}"
    assert e1[1] < e0[1] / 10, f"phi {e0[1]} -> {e1[1]}"
    assert e1[2] < e0[2] / 2, f"fov {e0[2]} -> {e1[2]}"
    assert losses[-1] < losses[0]
