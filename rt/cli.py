"""Headless CLI — the TPU-native replacement for the reference's winit app
shell (src/main.rs, src/app.rs).

Scene selection mirrors App::parse_args + build_scene (src/app.rs:36-55):
a scene id 1-7, random in 1..=7 when absent/unparsable.  Instead of a window
swapchain, frames accumulate progressively into the device-resident image and
are written out as PPM (the reference's own headless path,
src/scene/render_ppm.rs).

Usage:
    python -m rt.cli [scene_id] [--frames N] [--size WxH] [-o out.ppm]
                     [--backend jax|pallas] [--time-step MS] [--stats]
"""

from __future__ import annotations

import argparse
import dataclasses
import random
import sys
import time as time_mod

from rt.render.ppm import write_ppm
from rt.render.renderer import ProgressiveRenderer
from rt.scene import scenes


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("scene", nargs="?", default=None,
                   help="scene id 1-7 (random if omitted, like the reference)")
    p.add_argument("--scene", dest="scene_opt", type=int, default=None)
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--size", default="512x512")
    p.add_argument("-o", "--output", default="out.ppm")
    p.add_argument("--backend", choices=["jax", "pallas"], default="jax")
    p.add_argument("--time-step", type=int, default=10,
                   help="ms added to the RNG time uniform per frame")
    p.add_argument("--start-time", type=int, default=1000)
    p.add_argument("--stats", action="store_true",
                   help="print throughput stats per frame batch")
    p.add_argument("--seed", type=int, default=0,
                   help="seed for the randomized globe scene (scene 2)")
    return p.parse_args(argv)


def resolve_scene_id(args) -> int:
    if args.scene_opt is not None:
        return args.scene_opt
    j = random.randint(1, 7)  # App::parse_args random fallback (app.rs:36-41)
    if args.scene is None:
        return j
    try:
        return int(args.scene)
    except ValueError:
        return j


def main(argv=None) -> int:
    args = parse_args(argv)
    scene_id = resolve_scene_id(args)
    w, h = (int(v) for v in args.size.lower().split("x"))
    if scene_id == 2:
        sd = scenes.scene_sphere_globe(w, h, seed=args.seed)
    else:
        sd = scenes.build_scene(scene_id, w, h)
    sd = dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, backend=args.backend))
    print(f"scene {scene_id} ({sd.name}), {w}x{h}, {args.frames} frames, "
          f"backend={sd.config.backend}", file=sys.stderr)

    r = ProgressiveRenderer(sd)
    t0 = time_mod.perf_counter()
    for i in range(args.frames):
        r.set_time(args.start_time + args.time_step * i)
        r.draw()
        if args.stats and (i + 1) % 25 == 0:
            r.state.image.block_until_ready()
            dt = time_mod.perf_counter() - t0
            rays = (i + 1) * w * h * sd.config.samples_per_frame
            print(f"  frame {i+1}/{args.frames}: {rays/dt:.3e} camera rays/s",
                  file=sys.stderr)
    r.state.image.block_until_ready()
    dt = time_mod.perf_counter() - t0
    write_ppm(args.output, r.image)
    print(f"wrote {args.output} ({args.frames} frames in {dt:.2f}s)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
