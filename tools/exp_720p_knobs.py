"""Experiment: wavefront knob sweep at BASELINE config-4 resolution
(suzanne 1280x720 b5) after the sort-restore adoption (r3: scatters ->
inverse sorts took the frame 4.8e7 -> 8.6e7 seg/s).

Open questions:
- sort_every: the 14-operand sort costs ~6 ms at 942K keys (superlinear);
  does halving sorts (se=2, default) beat fresher coherence (se=1), and is
  dropping mid-stream sorts entirely (se=5 -> none for b5) even better at
  this scale?
- tile shape: th=16 (more, smaller tiles -> tighter chunk unions, more
  fixed cost) vs th=32; tw=128 (tighter columns at 1280 wide).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_720p_knobs.py
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


def bench(sd, *, frames=16, bounces=5, th=32, tw=256, chunk=32, unroll=32,
          key_bits=8, dir_bits=1, dmajor=False, sort_every=2,
          h=720, w=1280, label=""):
    cfg = sd.config
    cam_row = pack_camera(sd.camera)
    hp, wp = _round_up(h, th), _round_up(w, tw)

    @jax.jit
    def run(scene, times):
        def step(acc, t):
            col = render_color_tris_wave(
                scene, cam_row, t.reshape(1, 1), height=h, width=w,
                height_pad=hp, width_pad=wp, bounces=bounces,
                normalize_defocus_dir=cfg.normalize_defocus_dir,
                normalize_reflect_in=cfg.normalize_reflect_in,
                th=th, tw=tw, chunk=chunk, unroll=unroll,
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


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    sd = scenes.scene_suzanne(1280, 720)
    base = dict()
    for v in (dict(label="base th32 tw256 se2"),
              dict(label="se1", sort_every=1),
              dict(label="se5 (no mid sorts)", sort_every=5),
              dict(label="th16", th=16),
              dict(label="tw128", tw=128)):
        label = v.pop("label")
        try:
            bench(sd, label=label, **{**base, **v})
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
