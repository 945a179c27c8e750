"""Experiment: large-scene (dragon/lucy) tile-size retune.

The offline union analysis (tools/analyze_binning.py) shows dragon's
per-lane pair work shrinks ~2.4x from 8K-ray to 1K-ray stream tiles (union
1546 -> 650 chunks) — opposite of suzanne, where fixed per-tile costs
dominate.  Measures th/tw/unroll combos on dragon + lucy 512x512 b5.
"""
from __future__ import annotations

import sys

import jax

from exp_tris_knobs import bench
from rt.scene import scenes


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for name in ("dragon", "lucy"):
        sd = getattr(scenes, f"scene_{name}")(512, 512)
        print(f"--- {name}", flush=True)
        for v in [
            dict(label=f"{name} base th32 u4", th=32, unroll=4),
            dict(label=f"{name} th16 u4", th=16, unroll=4),
            dict(label=f"{name} th8 u4", th=8, unroll=4),
            dict(label=f"{name} th8 tw128 u4", th=8, tw=128, unroll=4),
            dict(label=f"{name} th16 u4 se1", th=16, unroll=4,
                 sort_every=1),
        ]:
            label = v.pop("label")
            try:
                bench(sd, label=label, bounces=5, frames=8, **v)
            except Exception as e:  # noqa: BLE001
                print(f"{label} FAILED: {type(e).__name__}: {str(e)[:160]}",
                      flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
