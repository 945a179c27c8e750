"""On-chip per-bounce cost decomposition of the wave pipeline (r5): time
render_color_tris_wave at bounces=1..B on the production config; the
increments separate per-bounce scan+sort cost from fixed raygen/restore
cost, and a sort=False run isolates the sort share.

Usage: python tools/exp_r5_decomp.py [scene=dragon] [res=512] [B=5] [F=8]
"""
from __future__ import annotations

import dataclasses
import sys
import time as time_mod

import jax.numpy as jnp
import numpy as np

from rt.kernels.dispatch import _round_up, pack_camera, wave_params
from rt.kernels.tris_kernel import render_color_tris_wave
from rt.scene import scenes


def timed(fn, *args, **kw):
    out = np.asarray(fn(*args, **kw))          # includes compile
    t0 = time_mod.perf_counter()
    out = np.asarray(fn(*args, **kw))
    return time_mod.perf_counter() - t0, out


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    F = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    sd = getattr(scenes, f"scene_{name}")(res, res)
    cfg = dataclasses.replace(sd.config, bounces=B)
    kw = wave_params(sd.scene, cfg)
    h = w = res
    hp, wp = _round_up(h, kw["th"]), _round_up(w, kw["tw"])
    cam_row = pack_camera(sd.camera)
    times = jnp.asarray([[1000 + 10 * i] for i in range(F)], jnp.uint32)

    common = dict(cam_row=cam_row, time=times, height=h, width=w,
                  height_pad=hp, width_pad=wp)
    print(f"{name} {res}^2 F={F} config={kw}", flush=True)

    prev = 0.0
    for b in range(1, B + 1):
        kwb = dict(kw); kwb["bounces"] = b
        dt, _ = timed(render_color_tris_wave, sd.scene, **common, **kwb)
        print(f"  bounces={b}: {dt*1e3/F:8.2f} ms/f  (+{(dt-prev)*1e3/F:6.2f})",
              flush=True)
        prev = dt

    kwn = dict(kw); kwn["bounces"] = B; kwn["sort"] = False
    dt, _ = timed(render_color_tris_wave, sd.scene, **common, **kwn)
    print(f"  sort=False b{B}: {dt*1e3/F:8.2f} ms/f", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
