"""BASELINE config 5 at full scale: path-replay inverse rendering of
Suzanne materials at 1920x1080 on one chip — record (Pallas forward +
per-bounce hit ids) + scan-chained replay train steps (rt.grad.fit_replay
structure), timed through host readbacks.

Run from the repo root on the TPU host:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_config5.py
"""
from __future__ import annotations

import dataclasses
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np

from rt.grad.train import fit_replay
from rt.kernels.dispatch import render_color
from rt.scene import scenes


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    w, h = 1920, 1080
    sd = scenes.scene_suzanne(w, h)
    cfg = dataclasses.replace(sd.config, backend="pallas")
    print(f"suzanne {w}x{h}, {sd.scene.m} tris, bounces={cfg.bounces}",
          flush=True)

    # target = the scene's own converged-ish render (ground-truth params)
    t = jnp.uint32(1000)
    target = render_color(sd.scene, sd.camera, cfg, t)
    np.asarray(target)

    # perturb the suzanne material albedo, recover it
    bad = sd.scene._replace(
        mat_albedo=sd.scene.mat_albedo.at[0].set(
            jnp.array([0.8, 0.1, 0.1], jnp.float32)))

    t0 = time_mod.perf_counter()
    params, losses = fit_replay(bad, sd.camera, cfg, target,
                                steps=24, rerecord_every=8,
                                learning_rate=5e-2, log_every=8)
    dt = time_mod.perf_counter() - t0
    rec = np.asarray(params["scene"].mat_albedo[0])
    print(f"24 steps (3 re-records) in {dt:.1f}s "
          f"({dt/24*1e3:.0f} ms/step incl. records)", flush=True)
    print(f"loss {losses[0]:.3e} -> {losses[-1]:.3e}; "
          f"albedo[0] recovered to {rec} (true {np.asarray(sd.scene.mat_albedo[0])})",
          flush=True)


if __name__ == "__main__":
    main()
