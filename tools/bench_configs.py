"""Bench every BASELINE.json config end-to-end on the attached chip and
write ``BENCH_CONFIGS.json`` at the repo root (plus a human table to
stderr).  ``bench.py`` stays the driver's single-line headline; this is the
per-config evidence artifact.

Configs (BASELINE.json "configs"):
  1. rtiow_one_sphere     400x225   16 spp   4 bounces
  2. rtiow_three_spheres  800x450   64 spp  10 bounces
  3. sphere_cover        1280x720  128 spp  10 bounces  (~490 spheres)
  4. suzanne             1280x720  128 spp   5 bounces  (BVH mesh)
  5. differentiable suzanne 1920x1080 — fit_replay steps/s + loss drop

Throughput counts traced ray segments: w*h*spp*bounces*frames / wall time,
timed through a host readback (axon block_until_ready returns early).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_configs.py
       [--quick]  (smaller frame batches for a fast sanity pass)
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time as time_mod


def bench_forward(sd, *, spp, bounces, frames, label):
    import jax.numpy as jnp
    import numpy as np

    from rt.render.renderer import ProgressiveRenderer

    sd = dataclasses.replace(sd, config=dataclasses.replace(
        sd.config, bounces=bounces, samples_per_frame=spp,
        backend="pallas"))
    w, h = sd.config.width, sd.config.height
    r = ProgressiveRenderer(sd)
    r.set_time(1000)
    r.draw_frames(frames)
    np.asarray(r.state.image)            # compile + warm
    t0 = time_mod.perf_counter()
    r.draw_frames(frames)
    np.asarray(r.state.image)
    dt = time_mod.perf_counter() - t0
    segs = w * h * spp * bounces * frames
    v = segs / dt
    print(f"{label:28s} {w}x{h} spp={spp} b={bounces} F={frames}: "
          f"{dt:.2f}s  {v:.4g} seg/s", file=sys.stderr, flush=True)
    return {"config": label, "resolution": f"{w}x{h}", "spp": spp,
            "bounces": bounces, "frames_per_call": frames,
            "metric": "ray_segments_per_s", "value": v, "unit": "rays/s",
            "vs_target_1e9": v / 1e9}


def bench_config5(*, steps, rerecord_every):
    import jax.numpy as jnp
    import numpy as np

    from rt.grad.train import fit_replay
    from rt.kernels.dispatch import render_color
    from rt.scene import scenes

    w, h = 1920, 1080
    sd = scenes.scene_suzanne(w, h)
    cfg = dataclasses.replace(sd.config, backend="pallas")
    target = render_color(sd.scene, sd.camera, cfg, jnp.uint32(1000))
    np.asarray(target)
    bad = sd.scene._replace(
        mat_albedo=sd.scene.mat_albedo.at[0].set(
            jnp.array([0.8, 0.1, 0.1], jnp.float32)))
    t0 = time_mod.perf_counter()
    params, losses = fit_replay(bad, sd.camera, cfg, target, steps=steps,
                                rerecord_every=rerecord_every,
                                learning_rate=5e-2)
    dt = time_mod.perf_counter() - t0
    print(f"{'config5_diff_suzanne':28s} {w}x{h} {steps} steps: {dt:.1f}s "
          f"({dt/steps*1e3:.0f} ms/step incl. records+compile), "
          f"loss {losses[0]:.3e} -> {losses[-1]:.3e}",
          file=sys.stderr, flush=True)
    return {"config": "config5_diff_suzanne", "resolution": f"{w}x{h}",
            "steps": steps, "metric": "train_step_ms_incl_records",
            "value": dt / steps * 1e3, "unit": "ms/step",
            "loss_start": float(losses[0]), "loss_end": float(losses[-1])}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", default="BENCH_CONFIGS.json")
    p.add_argument("--configs", default="1,2,3,4,5",
                   help="subset to run; with --merge-into, the chosen "
                        "configs' rows replace same-name rows in the "
                        "existing artifact (per-config process isolation: "
                        "back-to-back large compiles in ONE process can "
                        "crash the axon TPU worker — r5, reproduced twice "
                        "at config 3 while each config alone passes)")
    p.add_argument("--merge-into", action="store_true")
    args = p.parse_args(argv)

    import jax

    from rt.scene import scenes

    q = args.quick
    want = {int(v) for v in args.configs.split(",")}
    print(f"platform={jax.devices()[0].platform} configs={sorted(want)}",
          file=sys.stderr, flush=True)
    results = []
    # configs 1-2 are cheap per frame, so the dispatch floor dominates at
    # small batches: F=256/F=64 measured +81%/+21% over F=64/F=16 (r5) at
    # 0.2-2 s/call, far under the worker's ~60 s single-call limit
    if 1 in want:
        results.append(bench_forward(
            scenes.scene_rtiow_one_sphere(), spp=16, bounces=4,
            frames=8 if q else 256, label="config1_one_sphere"))
    if 2 in want:
        results.append(bench_forward(
            scenes.scene_rtiow_three_spheres(), spp=64, bounces=10,
            frames=2 if q else 64, label="config2_three_spheres"))
    # configs 3-4: F=4 frames per compiled call — at frames_per_call=1 the
    # r3 artifact ate the ~26 ms dispatch floor per measurement and
    # understated the shipped code (VERDICT r3 Missing #3); F=16 at spp=128
    # makes a single compiled call run 75-95 s of device time, which the
    # axon worker does not survive (r5: worker crashed at configs 3/4 even
    # in isolated processes; F=4 keeps calls ~20-25 s and the dispatch
    # floor amortized to <0.2%)
    if 3 in want:
        results.append(bench_forward(
            scenes.scene_sphere_cover(), spp=8 if q else 128, bounces=10,
            frames=2 if q else 4, label="config3_cover"))
    if 4 in want:
        results.append(bench_forward(
            scenes.scene_suzanne(1280, 720), spp=8 if q else 128, bounces=5,
            frames=2 if q else 4, label="config4_suzanne"))
    if 5 in want:
        results.append(bench_config5(steps=8 if q else 24,
                                     rerecord_every=8))

    out = {"n_devices": len(jax.devices()),
           "platform": jax.devices()[0].platform,
           "results": results}
    if args.merge_into:
        import os
        if os.path.exists(args.out):
            with open(args.out) as f:
                old = json.load(f)
            new_names = {r["config"] for r in results}
            out["results"] = [r for r in old["results"]
                              if r["config"] not in new_names] + results
            out["results"].sort(key=lambda r: r["config"])
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
