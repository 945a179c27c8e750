"""r4 experiments: (a) previous-bounce winning-chunk sort key A/B
(key_mode chunk/chunk_oct vs morton — the last unevaluated cheap coherence
lever from docs/DESIGN_binning.md), (b) segmented stream sorts
(sort_segments — the O(n) answer to XLA's superlinear sort, PERF.md
0.8/5.6/41 ms at 262K/1M/4.2M keys), and (c) frame-batched streams
REVISITED with per-frame segments (the r2 negative result was sort
superlinearity; segments remove exactly that).

Timing: per-frame stream inside a lax.scan over frames (the production
dispatch shape) unless batch=True (all frames one stream).  All timed
through a host readback (axon).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_r4_knobs.py
       [--scenes suzanne,lucy,dragon] [--sizes 512,720p] [--frames 16]
"""
from __future__ import annotations

import argparse
import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np

from rt.kernels.dispatch import pack_camera, wave_params
from rt.scene import scenes


def _round_up(v, m):
    return -(-v // m) * m


def bench(sd, *, frames, bounces, h, w, label, batch=False, reps=2,
          spp=1, **overrides):
    import dataclasses

    cfg = dataclasses.replace(sd.config, bounces=bounces, height=h, width=w,
                              samples_per_frame=spp)
    kw = wave_params(sd.scene, cfg)
    kw.update(overrides)
    th, tw = kw["th"], kw["tw"]
    hp, wp = _round_up(h, th), _round_up(w, tw)
    cam_row = pack_camera(sd.camera)
    from rt.kernels.tris_kernel import render_color_tris_wave

    times = jnp.arange(1000, 1000 + 10 * frames, 10,
                       dtype=jnp.uint32).reshape(-1, 1)

    if batch:
        @jax.jit
        def run(scene, times):
            return render_color_tris_wave(
                scene, cam_row, times, height=h, width=w, height_pad=hp,
                width_pad=wp, **kw)[:, :, 0, 0].sum()
    else:
        @jax.jit
        def run(scene, times):
            def step(acc, t):
                col = render_color_tris_wave(
                    scene, cam_row, t.reshape(1, 1), height=h, width=w,
                    height_pad=hp, width_pad=wp, **kw)[0]
                return acc + col[:, 0, 0].sum(), None
            acc, _ = jax.lax.scan(step, jnp.float32(0.0), times)
            return acc

    try:
        np.asarray(run(sd.scene, times))          # compile + warm
        t0 = time_mod.perf_counter()
        for _ in range(reps):
            np.asarray(run(sd.scene, times))
        dt = (time_mod.perf_counter() - t0) / reps
    except Exception as e:  # noqa: BLE001
        print(f"{label:44s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None
    segs = w * h * spp * bounces * frames
    v = segs / dt
    print(f"{label:44s} {dt/frames*1e3:7.2f} ms/f  {v:.3e} seg/s",
          flush=True)
    return v


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", default="suzanne,lucy,dragon")
    p.add_argument("--sizes", default="512,720p")
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--part", default="abc",
                   help="a=chunk key, b=segments, c=frame batching")
    args = p.parse_args(argv)

    print(f"platform={jax.devices()[0].platform}", flush=True)
    builders = {"suzanne": (scenes.scene_suzanne, 8),
                "lucy": (scenes.scene_lucy, 5),
                "dragon": (scenes.scene_dragon, 5)}
    F = args.frames

    for name in args.scenes.split(","):
        builder, b512 = builders[name]
        for size in args.sizes.split(","):
            if size == "512":
                h, w, b = 512, 512, b512
            else:
                h, w, b = 720, 1280, 5
            sd = builder(w, h)
            base = dict(frames=F, bounces=b, h=h, w=w)
            print(f"== {name} {w}x{h} b{b} F={F} ==", flush=True)

            if "a" in args.part:
                bench(sd, label=f"{name}/{size} morton (base)", **base)
                bench(sd, label=f"{name}/{size} key=chunk", **base,
                      key_mode="chunk")
                bench(sd, label=f"{name}/{size} key=chunk_oct", **base,
                      key_mode="chunk_oct")

            if "b" in args.part and size == "720p":
                # 720p stream = 115 tiles of 8K rays (th32) or 230 (th16)
                for seg in (5, 23):
                    bench(sd, label=f"{name}/{size} seg={seg}", **base,
                          sort_segments=seg)
                bench(sd, label=f"{name}/{size} seg=5 key=chunk", **base,
                      sort_segments=5, key_mode="chunk")

            if "c" in args.part and size == "512":
                # frame-batched stream: all F frames one stream, one segment
                # per frame (the r2 killer was the F-times-bigger sort)
                bench(sd, label=f"{name}/{size} batchF seg=1 (r2 negative)",
                      **base, batch=True)
                bench(sd, label=f"{name}/{size} batchF seg=F", **base,
                      batch=True, sort_segments=F)
                bench(sd, label=f"{name}/{size} batchF seg=F key=chunk",
                      **base, batch=True, sort_segments=F, key_mode="chunk")
    return 0


if __name__ == "__main__":
    sys.exit(main())
