"""Experiment: sphere-scan ILP round 3 — deeper unroll on the chunked
kernel (u16) and full unroll of the flat small-scene scan (sphere_simple
n=7).  The chunked u8 result (+18% over u4) says the sphere select chain is
issue-bound like the triangle scan.

Usage: python tools/exp_sphere_unroll.py
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


def bench(sd, *, frames, bounces=10, th=16, tw=256, variant="flat",
          unroll=4, chunk=32, unroll_all=False, label=""):
    cfg = sd.config
    cam_row = pack_camera(sd.camera)
    h, w = cfg.height, cfg.width
    hp, wp = _round_up(h, th), _round_up(w, tw)
    tab, kinds, n = pack_spheres_table(sd.scene)
    if 0 < cfg.n_active_spheres < n:
        n = cfg.n_active_spheres

    common = dict(n_spheres=n, height=h, width=w, height_pad=hp,
                  width_pad=wp, bounces=bounces,
                  normalize_defocus_dir=cfg.normalize_defocus_dir,
                  normalize_reflect_in=cfg.normalize_reflect_in,
                  th=th, tw=tw)

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
                    unroll_all=unroll_all, **common)
            return acc + col, None
        acc, _ = jax.lax.scan(step, jnp.zeros((3, hp, wp), jnp.float32),
                              times)
        return acc

    times = 1000 + 10 * jnp.arange(frames, dtype=jnp.uint32)
    np.asarray(run(tab, kinds, times))
    t0 = time_mod.perf_counter()
    np.asarray(run(tab, kinds, times))
    dt = time_mod.perf_counter() - t0
    segs = h * w * bounces * frames
    print(f"{label:40s} {dt*1e3/frames:8.3f} ms/f  {segs/dt:.4g} seg/s",
          flush=True)
    return segs / dt


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    cover = scenes.scene_sphere_cover(1280, 720)
    simple = scenes.scene_sphere_simple(512, 512)
    for sd, v in [
        (cover, dict(label="cover chunked u32 th32 F=128", variant="chunked",
                     th=32, unroll=32, frames=128)),
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
