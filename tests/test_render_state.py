"""Progressive-accumulation state semantics (src/renderer.rs:336-348,
shader accumulation at shader_sphere.wgsl:266-271) — the reference's
"training loop" analog per SURVEY.md §3.5."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rt.config import RenderConfig
from rt.render import renderer
from rt.scene import scenes


def _small_scene():
    return scenes.test_scene_lambertian(64, 48)


def test_frame0_replaces_accumulator():
    r = renderer.ProgressiveRenderer(_small_scene())
    r.set_time(1000)
    r.draw()
    assert r.frame_count == 1
    # w = 1/(0+1) = 1: image == frame color exactly, regardless of old value
    from rt.render.renderer import render_color
    sd = _small_scene()
    color = np.asarray(render_color(sd.scene, sd.camera, sd.config,
                                    jnp.uint32(1000)))
    # separately-jitted graphs may differ by 1 ulp from fusion reordering
    np.testing.assert_allclose(r.image, color, atol=1e-6)


def test_ema_weights():
    sd = _small_scene()
    r = renderer.ProgressiveRenderer(sd)
    r.set_time(1000)
    r.draw()
    i1 = r.image.copy()
    r.set_time(2000)
    r.draw()
    i2 = r.image.copy()
    from rt.render.renderer import render_color
    c2 = np.asarray(render_color(sd.scene, sd.camera, sd.config,
                                 jnp.uint32(2000)))
    # frame 1: w = 1/2 -> mix(i1, c2, 0.5)
    np.testing.assert_allclose(i2, i1 * 0.5 + c2 * 0.5, atol=1e-6)


def test_ema_saturates_at_sample_frame():
    st = renderer.RenderState(image=jnp.zeros((4, 4, 3)),
                              frame_count=jnp.uint32(5000))
    cfg = RenderConfig.for_spheres(4, 4)
    fc = jnp.minimum(st.frame_count, jnp.uint32(cfg.sample_frame))
    w = 1.0 / (fc.astype(jnp.float32) + 1.0)
    assert abs(float(w) - 1.0 / 1001.0) < 1e-9  # f32 of 1/1001


def test_reset_zeroes_accumulator_and_count():
    r = renderer.ProgressiveRenderer(_small_scene())
    r.set_time(1000)
    r.draw()
    r.draw()
    r.reset_frame_count()
    assert r.frame_count == 0
    np.testing.assert_array_equal(r.image, 0.0)


def test_resize_reallocates_and_resets():
    r = renderer.ProgressiveRenderer(_small_scene())
    r.set_time(1000)
    r.draw()
    r.resize(32, 16)
    assert r.image.shape == (16, 32, 3)
    assert r.frame_count == 0


def test_determinism():
    a = renderer.ProgressiveRenderer(_small_scene())
    b = renderer.ProgressiveRenderer(_small_scene())
    for r in (a, b):
        r.set_time(1234)
        r.draw()
    np.testing.assert_array_equal(a.image, b.image)


def test_different_time_different_noise():
    a = renderer.ProgressiveRenderer(_small_scene())
    a.set_time(1000)
    a.draw()
    b = renderer.ProgressiveRenderer(_small_scene())
    b.set_time(2000)
    b.draw()
    assert np.abs(a.image - b.image).max() > 0.0
