"""Frame-batch amortization sweep for the bench config (suzanne 512x512 b8,
wavefront backend): how much of the per-call fixed cost (dispatch + readback
through the tunnel) is left at F=64 (the bench default) vs 128/256.

PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_bench_frames.py
"""
from __future__ import annotations

import dataclasses
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np

from rt.kernels.dispatch import render_color_frames
from rt.scene import scenes


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    sd = scenes.scene_suzanne(512, 512)
    cfg = dataclasses.replace(sd.config, bounces=8, backend="pallas")

    for f in (64, 128, 256):
        times = jnp.uint32(1000) + jnp.arange(f, dtype=jnp.uint32) * 10
        fn = jax.jit(lambda ts: render_color_frames(sd.scene, sd.camera,
                                                    cfg, ts))
        np.asarray(fn(times))           # compile + warm
        t0 = time_mod.perf_counter()
        np.asarray(fn(times))
        dt = time_mod.perf_counter() - t0
        segs = 512 * 512 * cfg.bounces * f
        print(f"F={f:4d}: {dt:7.3f}s  {dt/f*1e3:7.2f} ms/f  "
              f"{segs/dt:.3e} seg/s", flush=True)


if __name__ == "__main__":
    main()
