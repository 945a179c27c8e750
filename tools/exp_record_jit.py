"""Probe: large-mesh recording under an outer jit (VERDICT r3 weak #4).

r3 measured the dragon wave recorder working EAGERLY (737 ms at 512x512 b5)
but OOMing under an outer ``jax.jit`` (scoped VMEM 26.4M > 16M): XLA
scope-allocates the recorder's (bounces+13)xHxW output planes.  This probe
(a) reproduces the failure mode on the current tree, (b) times the eager
path, and (c) checks whether fit_replay's production shape — eager record +
one-dispatch chained replay — runs end-to-end on dragon, recording step
time (the VERDICT done-criterion).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_record_jit.py
       [--scene dragon] [--size 512x512] [--steps 16]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time as time_mod

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="dragon")
    p.add_argument("--size", default="512x512")
    p.add_argument("--steps", type=int, default=16)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rt.grad.replay import record_hits_pallas
    from rt.grad.train import fit_replay
    from rt.kernels.dispatch import render_color
    from rt.scene import scenes

    w, h = (int(v) for v in args.size.lower().split("x"))
    builders = {"suzanne": scenes.scene_suzanne, "lucy": scenes.scene_lucy,
                "dragon": scenes.scene_dragon}
    sd = builders[args.scene](w, h)
    cfg = dataclasses.replace(sd.config, backend="pallas")
    print(f"platform={jax.devices()[0].platform} {args.scene} {w}x{h} "
          f"b{cfg.bounces} m={sd.scene.m}", flush=True)

    # (a) eager record (the production fit_replay path)
    t0 = time_mod.perf_counter()
    color, idx = record_hits_pallas(sd.scene, sd.camera, cfg,
                                    jnp.uint32(1000))
    np.asarray(color), np.asarray(idx)
    t_warm = time_mod.perf_counter() - t0
    t0 = time_mod.perf_counter()
    color, idx = record_hits_pallas(sd.scene, sd.camera, cfg,
                                    jnp.uint32(1000))
    np.asarray(color), np.asarray(idx)
    print(f"eager record: {time_mod.perf_counter()-t0:.3f}s "
          f"(first {t_warm:.1f}s incl compile), hit frac "
          f"{float((np.asarray(idx)>=0).mean()):.3f}", flush=True)

    # (b) the same recorder under an outer jit (r3: VMEM OOM on dragon)
    try:
        jitted = jax.jit(lambda sc, cam, t: record_hits_pallas(
            sc, cam, cfg, t))
        c2, i2 = jitted(sd.scene, sd.camera, jnp.uint32(1000))
        np.asarray(c2), np.asarray(i2)
        ok = (np.array_equal(np.asarray(c2), np.asarray(color))
              and np.array_equal(np.asarray(i2), np.asarray(idx)))
        print(f"outer-jit record: OK, equals eager: {ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"outer-jit record FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # (c) fit_replay end-to-end (eager record between chained blocks)
    target = render_color(sd.scene, sd.camera, cfg, jnp.uint32(1000))
    np.asarray(target)
    bad = sd.scene._replace(
        mat_albedo=sd.scene.mat_albedo.at[0].set(
            jnp.asarray([0.8, 0.1, 0.1], jnp.float32)))
    t0 = time_mod.perf_counter()
    params, losses = fit_replay(bad, sd.camera, cfg, target,
                                steps=args.steps, rerecord_every=8,
                                learning_rate=5e-2)
    dt = time_mod.perf_counter() - t0
    print(f"fit_replay {args.steps} steps: {dt:.1f}s "
          f"({dt/args.steps*1e3:.0f} ms/step incl records+compile), "
          f"loss {losses[0]:.3e} -> {losses[-1]:.3e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
