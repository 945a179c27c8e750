"""Experiment: combos of the 720p knob winners (tools/exp_720p_knobs.py:
se1 +25%, tw128 +32%, th16 +20% individually vs the th32/tw256/se2
default) plus the same knobs at 512x512 — the sort-restore adoption may
have moved the 512 optimum as well (sorting got relatively cheaper).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_720p_knobs2.py
"""
from __future__ import annotations

import os
import sys

import jax

from rt.scene import scenes

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from exp_720p_knobs import bench  # noqa: E402


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    sd = scenes.scene_suzanne(1280, 720)
    print("== suzanne 1280x720 b5 F=16 ==", flush=True)
    for v in (dict(label="base re-run (th32 tw256 se2)"),
              dict(label="se1 tw128", sort_every=1, tw=128),
              dict(label="th16 tw128", th=16, tw=128),
              dict(label="se1 th16 tw128", sort_every=1, th=16, tw=128)):
        label = v.pop("label")
        try:
            bench(sd, label=label, **v)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    sd5 = scenes.scene_suzanne(512, 512)
    print("== suzanne 512x512 b8 F=64 ==", flush=True)
    for v in (dict(label="512 base (th32 tw256 se2)"),
              dict(label="512 tw128", tw=128),
              dict(label="512 se1 tw128", sort_every=1, tw=128)):
        label = v.pop("label")
        try:
            bench(sd5, label=label, h=512, w=512, bounces=8, frames=64, **v)
        except Exception as e:  # noqa: BLE001
            print(f"{label} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
