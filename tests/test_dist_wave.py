"""DP sharding of the PRODUCTION wavefront triangle backend (rt/dist/wave.py)
on the 8-virtual-CPU-device mesh, Pallas kernels in interpret mode.

This closes the r3 gap: every earlier multi-chip artifact exercised only the
oracle backend; here the row-sharded wave pipeline (per-shard ray streams,
shard-local sorts, shard-local pixel-order restore) must equal the unsharded
production call BITWISE.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rt.dist import make_mesh, sharded_wave_render_frames, sharded_wave_step
from rt.kernels.dispatch import render_color_frames
from rt.scene import scenes

W, H = 128, 64  # H divisible by 8 devices


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def small(builder, bounces, spp=1):
    sd = builder(W, H)
    return dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=bounces,
                                       samples_per_frame=spp,
                                       backend="pallas"))


@pytest.mark.parametrize("builder,bounces,spp", [
    (scenes.scene_cube, 3, 1),
    (scenes.scene_quad, 2, 1),
    (scenes.scene_cube, 2, 2),   # the spp>1 stream pipeline too
])
def test_sharded_wave_bitwise_equal(mesh, builder, bounces, spp):
    sd = small(builder, bounces, spp)
    times = jnp.asarray([1000, 1010], jnp.uint32)

    ref = render_color_frames(sd.scene, sd.camera, sd.config, times,
                              interpret=True)
    out = sharded_wave_render_frames(sd.scene, sd.camera, sd.config, times,
                                     mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_sharded_wave_step_matches_single_device(mesh):
    """Progressive EMA accumulation with the image left row-sharded across
    frames — the production multi-chip loop — equals the SAME step on a
    1-device mesh bitwise, and keeps its sharding.

    The 1-device reference (rather than a hand-rolled EMA loop) keeps both
    sides in the identical compiled structure: the EMA tail FMA-contracts
    with the wave graph it fuses into, so an eagerly-computed mix differs
    by 1 ULP — the same contraction caveat as wave-vs-mono on chip."""
    from rt.dist import image_sharding, shard_scene
    from rt.render.renderer import RenderState, init_state

    sd = small(scenes.scene_cube, 2)
    step = sharded_wave_step(mesh, interpret=True)
    mesh1 = make_mesh(jax.devices()[:1])
    step1 = sharded_wave_step(mesh1, interpret=True)

    img_s = image_sharding(mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    state = RenderState(
        image=jax.device_put(init_state(sd.config).image, img_s),
        frame_count=jax.device_put(jnp.uint32(0), rep))
    scene = shard_scene(sd.scene, mesh)
    camera = shard_scene(sd.camera, mesh)
    ref_state = init_state(sd.config)

    for i in range(3):
        t = jnp.uint32(1000 + 10 * i)
        state = step(scene, camera, state, t, sd.config)
        ref_state = step1(sd.scene, sd.camera, ref_state, t, sd.config)

    np.testing.assert_array_equal(np.asarray(ref_state.image),
                                  np.asarray(state.image))
    assert int(state.frame_count) == 3
    assert state.image.sharding.is_equivalent_to(img_s, 3)
    # and the accumulated image tracks the unsharded per-frame colors to
    # float32 roundoff (1-ULP EMA contraction bound)
    ref2 = init_state(sd.config)
    for i in range(3):
        t = jnp.uint32(1000 + 10 * i)
        color = render_color_frames(sd.scene, sd.camera, sd.config,
                                    t.reshape(1), interpret=True)[0]
        fc = jnp.minimum(ref2.frame_count, jnp.uint32(sd.config.sample_frame))
        w = 1.0 / (fc.astype(jnp.float32) + 1.0)
        ref2 = RenderState(image=ref2.image * (1.0 - w) + color * w,
                           frame_count=ref2.frame_count + 1)
    np.testing.assert_allclose(np.asarray(ref2.image),
                               np.asarray(state.image), atol=3e-7, rtol=0)


def test_sharded_wave_real_mesh(mesh):
    """A real multi-mesh BVH scene (Suzanne, 1105 tris / 5 materials)
    shards bitwise too — the flagship scene's DP form."""
    sd = small(scenes.scene_suzanne, 2)
    times = jnp.asarray([1000], jnp.uint32)
    ref = render_color_frames(sd.scene, sd.camera, sd.config, times,
                              interpret=True)
    out = sharded_wave_render_frames(sd.scene, sd.camera, sd.config, times,
                                     mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_bad_height_raises(mesh):
    sd = small(scenes.scene_cube, 2)
    cfg = dataclasses.replace(sd.config, height=60)  # 60 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        sharded_wave_render_frames(sd.scene, sd.camera, cfg,
                                   jnp.asarray([1000], jnp.uint32), mesh,
                                   interpret=True)
