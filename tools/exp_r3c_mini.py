"""Experiment: r3c mini — the two highest-EV unmeasured variants at the
adopted u32 operating point, trimmed from exp_r3b_knobs after measuring
that each fresh wave-kernel variant pays a multi-minute remote Mosaic
compile (no persistent JAX compile cache in this environment): a 15-variant
batch is hours of queue time, so only the candidates with a mechanism-level
case get compiled:

- u32 tree: the full-chunk scan is issue-bound on the 32-long serialized
  best-t select chain; the 5-level ascending-index min-tree shortens the
  dependency chain 32 -> 5 while staying bit-identical (strict t<best,
  ascending-index merge — test_unroll_variants_bit_identical).
- c64 u64: half the scalar chunk-order reads/branches per bounce; the
  64-triangle full unroll doubles the independent-quadratic ILP window.

Usage: python tools/exp_r3c_mini.py
"""
from __future__ import annotations

import jax

from rt.scene import scenes
from tools.exp_r3_knobs import bench, run_variants


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    print("== suzanne 512x512 b8 F=64 (adopted: u32 th32 se2) ==", flush=True)
    sd = scenes.scene_suzanne(512, 512)
    base = dict(bounces=8, th=32, sort_every=2, unroll=32, frames=64)
    run_variants(sd, base, [
        dict(label="base u32"),
        dict(label="u32 tree", unroll_tree=True),
        dict(label="c64 u64", chunk=64, unroll=64),
    ])
    return 0


if __name__ == "__main__":
    main()
