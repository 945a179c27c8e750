"""Frame-batch amortization sweep for the bench config (suzanne 512x512 b8,
wavefront backend): how much of the per-call fixed cost (dispatch + readback
through the tunnel) is left at F=64 (the bench default) vs 128/256.

PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bench_frames.py
"""
from __future__ import annotations

import dataclasses
import time as time_mod

import jax
import numpy as np

from rt.render.renderer import ProgressiveRenderer
from rt.scene import scenes


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)

    def run(name, builder, w, h, bounces, frames):
        sd = builder(w, h)
        sd = dataclasses.replace(sd, config=dataclasses.replace(
            sd.config, bounces=bounces, backend="pallas"))
        r = ProgressiveRenderer(sd)
        r.set_time(1000)
        for f in frames:
            r.reset_frame_count()
            r.draw_frames(f)            # per-frame scan in ONE compiled call
            np.asarray(r.state.image)   # compile + warm (+ tunnel readback)
            r.reset_frame_count()
            t0 = time_mod.perf_counter()
            r.draw_frames(f)
            np.asarray(r.state.image)
            dt = time_mod.perf_counter() - t0
            segs = w * h * bounces * f
            print(f"{name} F={f:4d}: {dt:7.3f}s  {dt/f*1e3:7.2f} ms/f  "
                  f"{segs/dt:.3e} seg/s", flush=True)

    run("suzanne 512x512 b8", scenes.scene_suzanne, 512, 512, 8,
        (64, 128, 256))
    run("sphere_simple 512x512 b10", scenes.scene_sphere_simple, 512, 512,
        10, (256, 512, 1024))


if __name__ == "__main__":
    main()
