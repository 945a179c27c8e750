"""Experiment: sphere-kernel throughput vs (tile shape, frame batch).

VERDICT r1 item 2: push the sphere path past 1e9 seg/s.  Hypotheses:
 1. the 6.7e8 headline (16-frame batches) still pays ~40% dispatch floor —
    larger in-call frame batches amortize it;
 2. smaller tiles exit earlier on dead regions (whole-tile early-out is the
    only compaction the kernel has).

Times through a host readback (axon: block_until_ready returns early).
Prints one line per variant; run in background, generous timeout.
"""
from __future__ import annotations

import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np

from rt.kernels.dispatch import pack_camera, pack_spheres_table
from rt.kernels.sphere_kernel import render_color_spheres
from rt.scene import scenes


def _round_up(v, m):
    return -(-v // m) * m


def bench_variant(sd, *, frames, th, tw, bounces, h=512, w=512):
    tab, kinds, n = pack_spheres_table(sd.scene)
    n = sd.config.n_active_spheres or n
    cam_row = pack_camera(sd.camera)
    hp, wp = _round_up(h, th), _round_up(w, tw)
    cfg = sd.config

    @jax.jit
    def run(times):
        def step(image, t):
            col = render_color_spheres(
                tab, kinds, cam_row, t.reshape(1, 1), n_spheres=n,
                height=h, width=w, height_pad=hp, width_pad=wp,
                bounces=bounces,
                normalize_defocus_dir=cfg.normalize_defocus_dir,
                normalize_reflect_in=cfg.normalize_reflect_in,
                th=th, tw=tw)
            return image + col, None
        img0 = jnp.zeros((3, hp, wp), jnp.float32)
        image, _ = jax.lax.scan(step, img0, times)
        return image

    times = (1000 + 10 * jnp.arange(frames, dtype=jnp.uint32))
    np.asarray(run(times))          # compile + warm
    t0 = time_mod.perf_counter()
    np.asarray(run(times))
    dt = time_mod.perf_counter() - t0
    segs = h * w * bounces * frames
    print(f"th={th:3d} tw={tw:3d} F={frames:4d} b={bounces} "
          f"{dt*1e3/frames:8.3f} ms/frame  {segs/dt:.4g} seg/s", flush=True)
    return segs / dt


def main():
    sd = scenes.scene_sphere_simple(512, 512)
    print(f"platform={jax.devices()[0].platform}", flush=True)
    # baseline replication first, then batch scaling on the same kernel
    # (no recompile), then tile variants (each is a fresh Mosaic compile)
    for th, tw, frames in [
        (16, 256, 16),
        (16, 256, 64),
        (16, 256, 256),
        (8, 256, 64),
        (8, 128, 64),
        (16, 128, 64),
        (32, 256, 64),
    ]:
        try:
            bench_variant(sd, frames=frames, th=th, tw=tw, bounces=10)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"th={th} tw={tw} F={frames} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
