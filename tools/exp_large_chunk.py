"""Experiment: chunk granularity + origin-key resolution on LARGE scenes.

The r2 knob sweep tested chunk=16 / key bits on suzanne only (both no);
large scenes are pair-work-bound with ~11% of chunks surviving the
best-t rejection (PERF.md), so finer chunks (tighter unions, fewer tris
per live chunk) and a finer origin Morton key may pay there even though
they lose on suzanne.  Measures dragon + lucy 512x512 b5, F=8.
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
            dict(label=f"{name} base th16 u4 se1 c32", th=16, unroll=4,
                 sort_every=1),
            dict(label=f"{name} chunk16", th=16, unroll=4, sort_every=1,
                 chunk=16),
            dict(label=f"{name} key9", th=16, unroll=4, sort_every=1,
                 key_bits=9),
            dict(label=f"{name} chunk16 key9", th=16, unroll=4,
                 sort_every=1, chunk=16, key_bits=9),
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
