"""Experiment: r3 wavefront knob batch across scenes.

Open questions this batch answers (PERF.md r2 left them unmeasured):
- dragon/lucy: direction-Morton key bits were only swept on SUZANNE (an
  enclosed room — direction coherence can't matter there).  Open scenes
  post-bounce unions are line-of-sight driven, so direction bits MIGHT
  finally pay where origin bits saturate.
- dragon/lucy: chunk=16 (finer culling granularity when unions are
  650-1546 live of 1563) and split_big (ground-plane segregation).
- suzanne: unroll_tree at u4/u8 (the plain-unroll sweep adopted u4;
  the tree merge shortens the serial select chain further), tw=512
  (wider vregs, same 8K-ray tiles), chunk=64 at u4.

Usage: python tools/exp_r3_knobs.py [suzanne|lucy|dragon|all]
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


def bench(sd, *, frames=16, bounces=8, th=32, tw=256, chunk=32, unroll=4,
          unroll_tree=False, split_big=False, key_bits=8, dir_bits=1,
          dmajor=False, sort_every=2, h=512, w=512, label=""):
    cfg = sd.config
    cam_row = pack_camera(sd.camera)
    hp, wp = _round_up(h, th), _round_up(w, tw)

    # scene as traced argument (closure constants crash the remote AOT
    # compile helper on multi-MB literals)
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
                key_bits=key_bits, key_dir_bits=dir_bits, key_dmajor=dmajor,
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
    print(f"{label:40s} {dt*1e3/frames:8.2f} ms/f  {segs/dt:.4g} seg/s",
          flush=True)
    return segs / dt


def run_variants(sd, base, variants):
    for v in variants:
        label = v.pop("label")
        try:
            bench(sd, label=label, **{**base, **v})
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"platform={jax.devices()[0].platform}", flush=True)

    if which in ("suzanne", "all"):
        print("== suzanne 512x512 b8 F=64 ==", flush=True)
        sd = scenes.scene_suzanne(512, 512)
        base = dict(bounces=8, th=32, sort_every=2, unroll=4, frames=64)
        run_variants(sd, base, [
            dict(label="base u4 F=64"),
            dict(label="u8 F=64", unroll=8),
            dict(label="u16 F=64", unroll=16),
            dict(label="u32 F=64", unroll=32),
        ])

    if which in ("dragon8", "all2"):
        print("== dragon u8 512x512 b5 F=16 ==", flush=True)
        sd = scenes.scene_dragon(512, 512)
        base = dict(bounces=5, th=16, sort_every=1, unroll=4)
        run_variants(sd, base, [
            dict(label="dragon u8", unroll=8),
            dict(label="dragon u16", unroll=16),
        ])

    if which in ("lucy", "all"):
        print("== lucy 512x512 b5 F=16 ==", flush=True)
        sd = scenes.scene_lucy(512, 512)
        base = dict(bounces=5, th=16, sort_every=1, unroll=4)
        run_variants(sd, base, [
            dict(label="base (u4 c32 th16 se1 key8/1)"),
            dict(label="key 8/2", dir_bits=2),
            dict(label="key 7/3", key_bits=7, dir_bits=3),
            dict(label="chunk=16", chunk=16),
            dict(label="tree u4", unroll_tree=True),
        ])

    if which in ("dragon", "all"):
        print("== dragon 512x512 b5 F=16 ==", flush=True)
        sd = scenes.scene_dragon(512, 512)
        base = dict(bounces=5, th=16, sort_every=1, unroll=4)
        run_variants(sd, base, [
            dict(label="base (u4 c32 th16 se1 key8/1)"),
            dict(label="key 8/2", dir_bits=2),
            dict(label="key 7/3", key_bits=7, dir_bits=3),
            dict(label="key 4/4 dmajor", key_bits=4, dir_bits=4,
                 dmajor=True),
            dict(label="chunk=16", chunk=16),
            dict(label="split_big", split_big=True),
            dict(label="tree u4", unroll_tree=True),
        ])
    return 0


if __name__ == "__main__":
    sys.exit(main())
