"""r5b: non-scan overhead experiments on the wave pipeline.

PERF.md's frame decomposition (suzanne 512x512 b8, ~17.6 ms at F=256)
attributes ~45% to non-scan work: ~3-4 ms stream sorts, ~2 ms
restore/raygen/EMA, ~2-3 ms residual.  This harness A/Bs the two
bitwise-safe cuts to that budget:

  lean            drop the 2 redundant sort operands (active rebuilt from
                  the sorted key; pdy applied after the pixel-order
                  restore) — 12-operand coherence sorts instead of 14,
                  BIT-IDENTICAL by construction.
  skip_last_sort  skip the re-sort before the final bounce launch (it
                  benefits only the trailing `bounces % sort_every or
                  sort_every` bounces) — tile-regrouping-only change
                  (measure-zero exact-t ties, same caveat as sorting).

plus two anchors that size the prize:

  sort=False      no coherence sorts at all (restore still runs)
  raw sort        12 vs 14-operand lax.sort at the stream size

Timing through a host readback (axon semantics), per-frame scan over F
frames — the production dispatch shape.

Usage: python tools/exp_r5_overhead.py [--frames 32] [--reps 3]
"""
from __future__ import annotations

import argparse
import dataclasses
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np

from rt.kernels.dispatch import pack_camera, wave_params
from rt.scene import scenes


def _round_up(v, m):
    return -(-v // m) * m


def bench_frames(sd, *, frames, bounces, h, w, reps=3, spp=1, **overrides):
    from rt.kernels.tris_kernel import render_color_tris_wave

    cfg = dataclasses.replace(sd.config, bounces=bounces, height=h, width=w,
                              samples_per_frame=spp)
    kw = wave_params(sd.scene, cfg)
    kw.update(overrides)
    th, tw = kw["th"], kw["tw"]
    hp, wp = _round_up(h, th), _round_up(w, tw)
    cam_row = pack_camera(sd.camera)
    times = jnp.arange(1000, 1000 + 10 * frames, 10,
                       dtype=jnp.uint32).reshape(-1, 1)

    @jax.jit
    def run(scene, times):
        def step(acc, t):
            col = render_color_tris_wave(
                scene, cam_row, t[None], height=h, width=w, height_pad=hp,
                width_pad=wp, **kw)
            return acc + col[0, :, 0, 0].sum(), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), times)
        return acc

    r = run(sd.scene, times)
    float(np.asarray(r))                      # compile + first run
    best = float("inf")
    for _ in range(reps):
        t0 = time_mod.perf_counter()
        float(np.asarray(run(sd.scene, times)))
        best = min(best, time_mod.perf_counter() - t0)
    return best / frames * 1e3                # ms/frame


def bench_raw_sort(n, n_ops, reps=5, iters=20):
    key = jax.random.key(0)
    k = jax.random.randint(key, (n,), 0, 1 << 30, jnp.int32).astype(
        jnp.uint32)
    pays = [jax.random.uniform(jax.random.fold_in(key, i), (n,))
            for i in range(n_ops - 1)]

    @jax.jit
    def run(k, pays):
        def step(c, _):
            k, pays = c
            ops = jax.lax.sort((k, *pays), num_keys=1)
            # rotate the key so iterations don't fold away
            return (ops[0] + jnp.uint32(1), list(ops[1:])), None

        (k, pays), _ = jax.lax.scan(step, (k, pays), None, length=iters)
        return k[0] + sum(p[0] for p in pays)

    float(np.asarray(run(k, pays)))
    best = float("inf")
    for _ in range(reps):
        t0 = time_mod.perf_counter()
        float(np.asarray(run(k, pays)))
        best = min(best, time_mod.perf_counter() - t0)
    return best / iters * 1e3                 # ms/sort


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--skip-raw", action="store_true")
    p.add_argument("--only", type=lambda s: s.split(","), default=None,
                   help="comma-separated subset of {suz512,suz720,"
                        "dragon512,lucy512}")
    # back-to-back large compiles in one process crash the axon worker
    # (bench_configs lesson) — run one variant per process:
    #   for i in 0 1 2; do python tools/exp_r5_overhead.py --skip-raw \
    #       --only suz512 --variant $i; done
    p.add_argument("--variant", type=int, default=None,
                   help="run only this variant index of --only's scene")
    args = p.parse_args()

    print("devices:", jax.devices())

    if not args.skip_raw:
        for ops in (14, 12, 4):
            ms = bench_raw_sort(512 * 512, ops)
            print(f"raw sort 262K x {ops} operands: {ms:.3f} ms")

    plan = {
        "suz512": dict(sd=scenes.scene_suzanne, bounces=8, h=512, w=512,
                       frames=args.frames, variants=[
                           ("baseline", {}),
                           ("lean", dict(lean=True)),
                           ("lean+skiplast", dict(lean=True,
                                                  skip_last_sort=True)),
                           ("nosort", dict(sort=False)),
                           ("lean+skip se3", dict(lean=True, sort_every=3,
                                                  skip_last_sort=True)),
                           ("lean+skip se4", dict(lean=True, sort_every=4,
                                                  skip_last_sort=True)),
                           ("lean se3", dict(lean=True, sort_every=3)),
                           ("lean+skip seg2", dict(lean=True,
                                                   skip_last_sort=True,
                                                   sort_segments=2)),
                           ("lean+skip seg4", dict(lean=True,
                                                   skip_last_sort=True,
                                                   sort_segments=4)),
                       ]),
        "suz720": dict(sd=scenes.scene_suzanne, bounces=5, h=720, w=1280,
                       frames=max(args.frames // 2, 8), variants=[
                           ("baseline", {}),
                           ("lean+skiplast", dict(lean=True,
                                                  skip_last_sort=True)),
                           ("lean+skip se3", dict(lean=True, sort_every=3,
                                                  skip_last_sort=True)),
                       ]),
        # config-4 shape (720p spp-mode b5) at spp=16 — per-SAMPLE schedule
        # behavior is what's probed, the sample count just scales the time
        "suzspp": dict(sd=scenes.scene_suzanne, bounces=5, h=720, w=1280,
                       frames=2, spp=16, variants=[
                           ("baseline", {}),
                           ("solo0", dict(solo_bounce0=True)),
                           ("solo0 se4", dict(solo_bounce0=True,
                                              sort_every=4)),
                           # 720p streams have 115 tiles (5*23): seg must
                           # divide the tile count
                           ("seg5", dict(sort_segments=5)),
                       ]),
        "dragon512": dict(sd=scenes.scene_dragon, bounces=5, h=512, w=512,
                          frames=4, variants=[
                              ("baseline", {}),
                              ("lean+skiplast", dict(lean=True,
                                                     skip_last_sort=True)),
                          ]),
        "lucy512": dict(sd=scenes.scene_lucy, bounces=5, h=512, w=512,
                        frames=4, variants=[
                            ("baseline", {}),
                            ("lean+skiplast", dict(lean=True,
                                                   skip_last_sort=True)),
                        ]),
    }
    only = getattr(args, "only", None)
    for name, spec in plan.items():
        if only and name not in only:
            continue
        sd = spec["sd"]()
        segs = spec["h"] * spec["w"] * spec["bounces"] * spec.get("spp", 1)
        rows = []
        variants = spec["variants"]
        if args.variant is not None:
            variants = [variants[args.variant]]
        for label, kw in variants:
            ms = bench_frames(sd, frames=spec["frames"],
                              bounces=spec["bounces"], h=spec["h"],
                              w=spec["w"], reps=args.reps,
                              spp=spec.get("spp", 1), **kw)
            rows.append((label, ms))
            print(f"{name} {label:>16}: {ms:7.2f} ms/f "
                  f"({segs / ms * 1e3:.3e} seg/s)", flush=True)
        if len(rows) > 1:
            base = rows[0][1]
            for label, ms in rows[1:]:
                print(f"  {label}: x{base / ms:.3f} vs baseline", flush=True)


if __name__ == "__main__":
    main()
