"""Checkpoint/resume: a paused + resumed progressive render must equal an
uninterrupted one bitwise; pytree save/load round-trips optimizer state."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rt.render.checkpoint import (load_pytree, load_render_state, save_pytree,
                                  save_render_state)
from rt.render.renderer import ProgressiveRenderer
from rt.scene import scenes


def small_scene():
    sd = scenes.test_scene_metal(64, 32)
    return dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=3))


def test_resume_equals_uninterrupted(tmp_path):
    sd = small_scene()
    # uninterrupted: 6 frames
    r1 = ProgressiveRenderer(sd)
    for i in range(6):
        r1.set_time(1000 + 10 * i)
        r1.draw()

    # interrupted after 3 frames, checkpointed, resumed in a NEW renderer
    r2 = ProgressiveRenderer(sd)
    for i in range(3):
        r2.set_time(1000 + 10 * i)
        r2.draw()
    ckpt = str(tmp_path / "render.ckpt")
    save_render_state(ckpt, r2.state, r2.time)

    r3 = ProgressiveRenderer(sd)
    r3.state, t = load_render_state(ckpt)
    assert t == 1020
    for i in range(3, 6):
        r3.set_time(1000 + 10 * i)
        r3.draw()

    np.testing.assert_array_equal(np.asarray(r1.state.image),
                                  np.asarray(r3.state.image))
    assert int(r3.state.frame_count) == 6


def test_pytree_roundtrip(tmp_path):
    import optax
    params = {"scene": {"albedo": jnp.ones((5, 3)) * 0.3},
              "fov": jnp.float32(0.6)}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    p = str(tmp_path / "train.ckpt")
    save_pytree(p, {"params": params, "opt": state})
    restored = load_pytree(p, {"params": params, "opt": state})
    for a, b in zip(jax.tree_util.tree_leaves({"params": params, "opt": state}),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


import jax  # noqa: E402  (used in test_pytree_roundtrip)
