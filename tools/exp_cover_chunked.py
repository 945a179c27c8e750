"""Experiment: chunk-culled sphere kernel on the RTIOW cover scene
(BASELINE config 3, ~490 spheres, 1280x720).

The flat scan pays all ~490 spheres per segment (r2: 5.31e7 seg/s at b10
F=128).  Chunk culling (Morton chunks of 32, front-to-back slab tests)
should cut that by the live-chunk fraction, most of it on coherent
primary-ray tiles.

Usage: python tools/exp_cover_chunked.py
"""
from __future__ import annotations

import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np

from rt.kernels.dispatch import pack_camera, pack_spheres_table, _round_up
from rt.kernels.sphere_kernel import (render_color_spheres,
                                      render_color_spheres_chunked)
from rt.scene import scenes


def bench(sd, *, frames=32, bounces=10, th=16, tw=256, variant="chunked",
          unroll=4, chunk=32, spp=1, label=""):
    cfg = sd.config
    cam_row = pack_camera(sd.camera)
    h, w = cfg.height, cfg.width
    hp, wp = _round_up(h, th), _round_up(w, tw)
    tab, kinds, n = pack_spheres_table(sd.scene)

    common = dict(n_spheres=n, height=h, width=w, height_pad=hp,
                  width_pad=wp, bounces=bounces,
                  normalize_defocus_dir=cfg.normalize_defocus_dir,
                  normalize_reflect_in=cfg.normalize_reflect_in,
                  th=th, tw=tw, spp=spp)

    @jax.jit
    def run(tab, kinds, times):
        def step(acc, t):
            if variant == "chunked":
                col = render_color_spheres_chunked(
                    tab, kinds, cam_row, t.reshape(1, 1), unroll=unroll,
                    chunk=chunk, **common)
            else:
                col = render_color_spheres(
                    tab, kinds, cam_row, t.reshape(1, 1),
                    table_in_vmem=True, **common)
            return acc + col, None
        acc, _ = jax.lax.scan(step, jnp.zeros((3, hp, wp), jnp.float32),
                              times)
        return acc

    times = 1000 + 10 * jnp.arange(frames, dtype=jnp.uint32)
    np.asarray(run(tab, kinds, times))
    t0 = time_mod.perf_counter()
    np.asarray(run(tab, kinds, times))
    dt = time_mod.perf_counter() - t0
    segs = h * w * spp * bounces * frames
    print(f"{label:36s} {dt*1e3/frames:8.2f} ms/f  {segs/dt:.4g} seg/s",
          flush=True)
    return segs / dt


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    sd = scenes.scene_sphere_cover(1280, 720)
    for v in [
        dict(label="chunked u4 th32 F=128", th=32, frames=128),
        dict(label="chunked u4 th32 tw512 F=128", th=32, tw=512,
             frames=128),
        dict(label="chunked u4 th64 F=128", th=64, frames=128),
        dict(label="chunked u8 th32 F=128", th=32, unroll=8, frames=128),
        dict(label="chunked u4 th32 spp8 F=16", th=32, spp=8, frames=16),
    ]:
        label = v.pop("label")
        try:
            bench(sd, label=label, **v)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
