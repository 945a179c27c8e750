"""Round-2 triangle knob sweep: deeper unrolls, tree-merged candidates,
chunk/tile retunes at the new unroll, sort cadence, on suzanne 512x512 b8
(seg/s; F=16 per call)."""
from __future__ import annotations

import sys

from exp_tris_knobs import bench  # noqa: F401  (same bench harness)

import jax
from rt.scene import scenes


def main():
    sd = scenes.scene_suzanne(512, 512)
    print(f"platform={jax.devices()[0].platform}", flush=True)
    variants = [
        dict(label="unroll=8", unroll=8),
        dict(label="tree unroll=4", unroll=4, unroll_tree=True),
        dict(label="tree unroll=8", unroll=8, unroll_tree=True),
        dict(label="unroll=4 sort_every=1", unroll=4, sort_every=1),
        dict(label="unroll=4 sort_every=3", unroll=4, sort_every=3),
        dict(label="unroll=4 chunk=64", unroll=4, chunk=64),
        dict(label="unroll=4 th=16", unroll=4, th=16),
        dict(label="tree4 chunk=64", unroll=4, unroll_tree=True, chunk=64),
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
