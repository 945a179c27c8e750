"""Experiment: wavefront triangle kernel knobs (r2 perf round).

Measures suzanne 512x512 b8, F frames per jitted call, through host
readback.  Knobs: triangle-loop unroll (ILP), direction-Morton sort key
bits (post-bounce direction spread drives the tile chunk-union), chunk
size, tile height, sort cadence.
"""
from __future__ import annotations

import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np

from rt.kernels.dispatch import pack_camera
from rt.kernels.tris_kernel import render_color_tris_wave
from rt.scene import scenes


def _round_up(v, m):
    return -(-v // m) * m


def bench(sd, *, frames=16, bounces=8, th=32, tw=256, chunk=32, unroll=1,
          unroll_tree=False, split_big=False, key_bits=8, dir_bits=1,
          sort_every=2, h=512, w=512, label=""):
    cfg = sd.config
    cam_row = pack_camera(sd.camera)
    hp, wp = _round_up(h, th), _round_up(w, tw)

    # NOTE: the scene must be a traced ARGUMENT, not a closure constant —
    # embedding dragon's ~4 MB of arrays as XLA literals crashes the remote
    # AOT compile helper (tpu_compile_helper exit 1).
    @jax.jit
    def run(scene, times):
        def step(acc, t):
            col = render_color_tris_wave(
                scene, cam_row, t.reshape(1, 1), height=h, width=w,
                height_pad=hp, width_pad=wp, bounces=bounces,
                normalize_defocus_dir=cfg.normalize_defocus_dir,
                normalize_reflect_in=cfg.normalize_reflect_in,
                th=th, tw=tw, chunk=chunk, unroll=unroll,
                unroll_tree=unroll_tree, split_big=split_big,
                key_bits=key_bits, key_dir_bits=dir_bits,
                sort_every=sort_every)[0]
            return acc + col, None
        acc, _ = jax.lax.scan(step, jnp.zeros((3, hp, wp), jnp.float32),
                              times)
        return acc

    times = 1000 + 10 * jnp.arange(frames, dtype=jnp.uint32)
    np.asarray(run(sd.scene, times))
    t0 = time_mod.perf_counter()
    np.asarray(run(sd.scene, times))
    dt = time_mod.perf_counter() - t0
    segs = h * w * bounces * frames
    print(f"{label:34s} {dt*1e3/frames:8.2f} ms/f  {segs/dt:.4g} seg/s",
          flush=True)
    return segs / dt


def main():
    sd = scenes.scene_suzanne(512, 512)
    print(f"platform={jax.devices()[0].platform}", flush=True)
    variants = [
        dict(label="base (u1 key8/1 c32 th32 se2)"),
        dict(label="unroll=2", unroll=2),
        dict(label="unroll=4", unroll=4),
        dict(label="key 8/2", key_bits=8, dir_bits=2),
        dict(label="key 7/3", key_bits=7, dir_bits=3),
        dict(label="key 6/4", key_bits=6, dir_bits=4),
        dict(label="key 7/3 sort_every=1", key_bits=7, dir_bits=3,
             sort_every=1),
        dict(label="key 7/3 unroll=2", key_bits=7, dir_bits=3, unroll=2),
        dict(label="chunk=16 key 7/3", chunk=16, key_bits=7, dir_bits=3),
        dict(label="th=16 key 7/3", th=16, key_bits=7, dir_bits=3),
    ]
    for v in variants:
        label = v.pop("label")
        try:
            bench(sd, label=label, **v)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
