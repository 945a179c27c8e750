"""On-chip A/B of in-chunk sub-AABB culling (r5) on the production wave
configs — per-frame streams in a lax.scan (the dispatch pattern), timed
through a host readback.

Usage: python tools/exp_r5_sub.py [--scenes dragon,lucy,suzanne]
                                  [--frames 16] [--part base,sub]
"""
from __future__ import annotations

import argparse
import sys

import jax

from exp_r4_knobs import bench  # same dir; per-frame scan + readback timing
from rt.scene import scenes


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", default="dragon,lucy,suzanne")
    p.add_argument("--frames", type=int, default=16)
    args = p.parse_args(argv)

    print(f"platform={jax.devices()[0].platform}", flush=True)
    builders = {"suzanne": (scenes.scene_suzanne, 8),
                "lucy": (scenes.scene_lucy, 5),
                "dragon": (scenes.scene_dragon, 5)}
    F = args.frames

    for name in args.scenes.split(","):
        builder, b = builders[name]
        sd = builder(512, 512)
        base = dict(frames=F, bounces=b, h=512, w=512)
        print(f"== {name} 512x512 b{b} F={F} ==", flush=True)
        bench(sd, label=f"{name} base (sub=0)", **base)
        bench(sd, label=f"{name} sub=8", **base, sub=8)
        bench(sd, label=f"{name} sub=16", **base, sub=16)
        if name == "dragon":
            # sub-culling changes the tile-size tradeoff: larger tiles
            # amortize fixed costs while sub rejection soaks union growth
            bench(sd, label=f"{name} th=32 sub=8", **base, sub=8, th=32)
            bench(sd, label=f"{name} sub=8 unroll=8", **base, sub=8,
                  unroll=8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
