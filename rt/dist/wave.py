"""Image-row DP sharding of the PRODUCTION wavefront triangle backend.

``rt/dist/sharding.py`` shards the oracle render graph by letting XLA's SPMD
partitioner split the per-pixel math (free, because that graph has no
cross-pixel ops).  The wavefront backend is different: it flattens the frame
into ONE ray stream and re-sorts it per bounce (``lax.sort`` over the whole
stream — rt/kernels/tris_kernel.py), so under a naive ``pjit`` sharding
those sorts would become cross-chip collectives (or force a full reshard
per bounce), destroying the zero-per-frame-collectives DP design.

The TPU-native answer is ``shard_map``: each chip runs the COMPLETE wave
pipeline — raygen, per-bounce kernels, coherence sorts, pixel-order
restore — on its own row band's rays, with the scene tables replicated.
Ray generation is purely position-based (seed = (x*height + y)*time,
uv from global (x, y) — rt/kernels/tracer_common.generate_rays), so a band
launch with ``row0 = shard_index * band_height`` produces bit-identical
rays to the same rows of the full-frame launch; sorting only changes which
stream tile a ray lands in, which the per-ray closest-hit arithmetic does
not observe (strict t < best; the same measure-zero cross-chunk exact-t
tie caveat as wave-vs-mono, tris_kernel.py).  Sharded output therefore
equals the unsharded render bitwise (asserted in tests/test_dist_wave.py).

Collectives: ZERO during rendering; the only cross-chip traffic is the
lazy all-gather on host readback — same story as the oracle DP path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rt.config import RenderConfig
from rt.dist.sharding import AXIS
from rt.render.renderer import RenderState

__all__ = ["sharded_wave_render_frames", "sharded_wave_step",
           "sharded_wave_frames"]


def _band_colors(scene, cam_row, times, row0, *, height, width, band_h,
                 kw, interpret):
    """(F, band_h, width, 3) colors for the row band starting at ``row0``
    (a traced i32 scalar) — the per-shard body; kw are wave_params knobs."""
    from rt.kernels.dispatch import _round_up
    from rt.kernels.tris_kernel import render_color_tris_wave

    th, tw = kw["th"], kw["tw"]
    hp, wp = _round_up(band_h, th), _round_up(width, tw)
    colors = render_color_tris_wave(
        scene, cam_row, times, height=height, width=width,
        height_pad=hp, width_pad=wp, row0=row0,
        interpret=interpret, **kw)                 # (F, 3, hp, wp)
    colors = jnp.transpose(colors, (0, 2, 3, 1))   # (F, hp, wp, 3)
    if (hp, wp) != (band_h, width):
        colors = colors[:, :band_h, :width]
    return colors


def _band_params(scene, config: RenderConfig, n_shards: int):
    from rt.kernels.dispatch import _round_up, wave_params

    h = config.height
    if h % n_shards:
        raise ValueError(f"height {h} not divisible by {n_shards} shards")
    band_h = h // n_shards
    kw = wave_params(scene, config)
    # a band may be shorter than the full-frame tile height; shrink th to
    # keep >= 1 tile row per shard (raygen stays bit-identical regardless —
    # tiling never changes per-ray math)
    kw["th"] = min(kw["th"], _round_up(band_h, 8))
    return band_h, kw


def sharded_wave_render_frames(scene, camera, config: RenderConfig, times,
                               mesh: Mesh, axis_name: str = AXIS,
                               interpret: bool = False):
    """(F, H, W, 3) colors for F frames, image rows sharded over ``mesh`` —
    the multi-chip form of ``rt.kernels.dispatch.render_color_frames``,
    bit-identical to it (each shard's stream is a row band; all sorts stay
    shard-local)."""
    from rt.kernels.dispatch import pack_camera

    n = mesh.shape[axis_name]
    band_h, kw = _band_params(scene, config, n)
    cam_row = pack_camera(camera)
    times_arr = jnp.asarray(times, jnp.uint32).reshape(-1, 1)

    def per_shard(scene, cam_row, times):
        row0 = jax.lax.axis_index(axis_name).astype(jnp.int32) * band_h
        return _band_colors(scene, cam_row, times, row0,
                            height=config.height, width=config.width,
                            band_h=band_h, kw=kw, interpret=interpret)

    rep = P()
    return shard_map(
        per_shard, mesh=mesh,
        in_specs=(rep, rep, rep),
        out_specs=P(None, axis_name, None, None),
        # the kernels' fori_loops seed carries with literals (unvarying)
        # and update them with per-shard values — semantically fine
        check_vma=False)(scene, cam_row, times_arr)


def _step_graph(scene, camera, state: RenderState, time,
                config: RenderConfig, *, mesh: Mesh, axis_name: str,
                n: int, interpret: bool) -> RenderState:
    """Un-jitted sharded progressive step: trace every shard's row band and
    EMA-accumulate into its image shard (shader_sphere.wgsl:266-271
    semantics, identical to render_frame); frame_count stays replicated."""
    from rt.core.vecmath import mix
    from rt.kernels.dispatch import pack_camera

    band_h, kw = _band_params(scene, config, n)
    cam_row = pack_camera(camera)

    def per_shard(scene, cam_row, img, fc, time):
        row0 = jax.lax.axis_index(axis_name).astype(jnp.int32) * band_h
        color = _band_colors(scene, cam_row, time.reshape(1, 1), row0,
                             height=config.height, width=config.width,
                             band_h=band_h, kw=kw,
                             interpret=interpret)[0]
        fcm = jnp.minimum(fc, jnp.uint32(config.sample_frame))
        w = 1.0 / (fcm.astype(jnp.float32) + 1.0)
        return mix(img, color, w), fc + 1

    rep = P()
    img, fc = shard_map(
        per_shard, mesh=mesh,
        in_specs=(rep, rep, P(axis_name, None, None), rep, rep),
        out_specs=(P(axis_name, None, None), rep),
        check_vma=False)(scene, cam_row, state.image,
                         state.frame_count, jnp.asarray(time, jnp.uint32))
    return RenderState(image=img, frame_count=fc)


def sharded_wave_step(mesh: Mesh, axis_name: str = AXIS,
                      interpret: bool = False):
    """Jitted progressive step on the wave backend with the accumulator
    row-sharded: step(scene, camera, state, time, config) -> RenderState.

    The multi-chip production render loop for triangle scenes: each chip
    traces its rows' stream and EMA-accumulates into its image shard;
    frame_count stays replicated.  Zero per-frame collectives.
    """
    img_s = NamedSharding(mesh, P(axis_name, None, None))
    rep_s = NamedSharding(mesh, P())
    n = mesh.shape[axis_name]

    @partial(jax.jit, static_argnames=("config",),
             out_shardings=RenderState(image=img_s, frame_count=rep_s))
    def step(scene, camera, state: RenderState, time,
             config: RenderConfig) -> RenderState:
        return _step_graph(scene, camera, state, time, config, mesh=mesh,
                           axis_name=axis_name, n=n, interpret=interpret)

    return step


def sharded_wave_frames(mesh: Mesh, axis_name: str = AXIS,
                        interpret: bool = False):
    """Jitted multi-frame progressive loop on the sharded wave backend:
    frames(scene, camera, state, time0, time_step, config, n_frames) ->
    RenderState — the multi-chip analog of rt.render.renderer.render_frames
    (a lax.scan of the sharded step, one compiled call per batch), which is
    what the CLI's --sharded --backend pallas path drives (rt/cli.py)."""
    img_s = NamedSharding(mesh, P(axis_name, None, None))
    rep_s = NamedSharding(mesh, P())
    n = mesh.shape[axis_name]

    @partial(jax.jit, static_argnames=("config", "n_frames"),
             out_shardings=RenderState(image=img_s, frame_count=rep_s))
    def frames(scene, camera, state: RenderState, time0, time_step,
               config: RenderConfig, n_frames: int) -> RenderState:
        time0 = jnp.asarray(time0, jnp.uint32)
        time_step = jnp.asarray(time_step, jnp.uint32)

        def body(st, i):
            return _step_graph(scene, camera, st, time0 + i * time_step,
                               config, mesh=mesh, axis_name=axis_name, n=n,
                               interpret=interpret), None

        st, _ = jax.lax.scan(body, state,
                             jnp.arange(n_frames, dtype=jnp.uint32))
        return st

    return frames
