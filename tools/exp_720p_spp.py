"""Experiment: attribute the config-4 gap (suzanne 1280x720 spp128 b5 at
5.4e7 seg/s vs 9.8e7 at 512x512 spp1 b8).

Two candidate causes:
  (a) wave spp loop coherence — samples re-traced against a stream sorted
      once per bounce, not per sample;
  (b) sort superlinearity — 921K rays/stream vs 262K (PERF.md measures the
      14-operand sort at 0.8 / 5.6 ms for 262K / 1M keys).

Discriminator: spp=1 frames at 1280x720.  If per-segment throughput stays
~5-6e7, the resolution (sort + tile count) is the cost and spp is innocent;
if it recovers toward ~9e7, the in-kernel spp loop is the gap.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_720p_spp.py
"""
from __future__ import annotations

import dataclasses
import sys
import time as time_mod

import jax.numpy as jnp
import numpy as np

from rt.render.renderer import ProgressiveRenderer
from rt.scene import scenes


def run(w, h, spp, bounces, frames, label):
    sd = scenes.scene_suzanne(w, h)
    sd = dataclasses.replace(sd, config=dataclasses.replace(
        sd.config, bounces=bounces, samples_per_frame=spp,
        backend="pallas"))
    r = ProgressiveRenderer(sd)
    r.set_time(1000)
    r.draw_frames(frames)
    np.asarray(r.state.image)
    t0 = time_mod.perf_counter()
    r.draw_frames(frames)
    np.asarray(r.state.image)
    dt = time_mod.perf_counter() - t0
    segs = w * h * spp * bounces * frames
    print(f"{label:32s} {dt:6.2f}s  {segs/dt:.4g} seg/s", flush=True)


def main():
    import jax
    print(f"platform={jax.devices()[0].platform}", flush=True)
    run(1280, 720, 1, 5, 32, "720p spp=1 F=32 b5")
    run(1280, 720, 8, 5, 4, "720p spp=8 F=4 b5 (same segs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
