"""Experiment: r3b — re-sweep structural knobs at the NEW operating point.

r3 adopted full-chunk unroll (u32 suzanne/cover, u16 large scenes) after
discovering the chunk scan is ISSUE-bound on the serialized best-t select
chain.  Every tile/chunk/sort knob was last swept at u1-u4, i.e. at a
different bottleneck.  This batch re-asks the structural questions at the
adopted ILP point:

- suzanne: unroll_tree at u32 (5-level min-tree vs 32-long select chain —
  the chain is exactly what the issue-bound finding indicts), th16/th64,
  tw512, sort_every=1/3, chunk=64 at u64 (half the scalar chunk branches).
- lucy: the r3 unroll sweep stopped at u4 (only dragon was re-probed);
  dispatch now assumes u16 for all large scenes — verify on lucy, try u32
  and tree.
- dragon: u16 tree, u32.

Usage: python tools/exp_r3b_knobs.py [suzanne|lucy|dragon|all]
"""
from __future__ import annotations

import sys

import jax

from rt.scene import scenes
from tools.exp_r3_knobs import bench, run_variants


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"platform={jax.devices()[0].platform}", flush=True)

    if which in ("suzanne", "all"):
        print("== suzanne 512x512 b8 F=64 (adopted: u32 th32 se2) ==",
              flush=True)
        sd = scenes.scene_suzanne(512, 512)
        base = dict(bounces=8, th=32, sort_every=2, unroll=32, frames=64)
        run_variants(sd, base, [
            dict(label="base u32"),
            dict(label="u32 tree", unroll_tree=True),
            dict(label="u32 th16", th=16),
            dict(label="u32 th64", th=64),
            dict(label="u32 tw512", tw=512),
            dict(label="u32 se1", sort_every=1),
            dict(label="u32 se3", sort_every=3),
            dict(label="c64 u64", chunk=64, unroll=64),
        ])

    if which in ("lucy", "all"):
        print("== lucy 512x512 b5 F=16 (adopted: u16 th16 se1) ==",
              flush=True)
        sd = scenes.scene_lucy(512, 512)
        base = dict(bounces=5, th=16, sort_every=1, unroll=16)
        run_variants(sd, base, [
            dict(label="u4 (r3 base)", unroll=4),
            dict(label="u16 (dispatch)"),
            dict(label="u32", unroll=32),
            dict(label="u16 tree", unroll_tree=True),
        ])

    if which in ("dragon", "all"):
        print("== dragon 512x512 b5 F=16 (adopted: u16 th16 se1 split) ==",
              flush=True)
        sd = scenes.scene_dragon(512, 512)
        base = dict(bounces=5, th=16, sort_every=1, unroll=16,
                    split_big=True)
        run_variants(sd, base, [
            dict(label="base u16 split"),
            dict(label="u32 split", unroll=32),
            dict(label="u16 split tree", unroll_tree=True),
        ])
    return 0


if __name__ == "__main__":
    sys.exit(main())
