"""On-chip validation of the path-replay differentiable pipeline at the
BASELINE config-5 scale: Suzanne 512x512, Pallas recording forward + replay
gradient step.  Prints timings + equality checks; run on the TPU host.
"""
from __future__ import annotations

import dataclasses
import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rt.grad import SphereParams, TriangleParams, image_mse
from rt.grad.replay import record_hits_pallas, replay_color, replay_loss_fn
from rt.scene import scenes


def timed(label, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)   # force through readback
    t0 = time_mod.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    dt = time_mod.perf_counter() - t0
    print(f"{label:42s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)

    # ---- spheres 512^2 b10 ----------------------------------------------
    sd = scenes.scene_sphere_simple(512, 512)
    cfg = sd.config
    t = jnp.uint32(1000)
    rec = jax.jit(lambda: record_hits_pallas(sd.scene, sd.camera, cfg, t))
    color, hits = timed("sphere record (Pallas fwd + hit ids)", rec)
    print(f"  hit fraction/bounce: "
          f"{np.asarray((hits >= 0).mean(axis=(1, 2)))[:4]}", flush=True)

    target = jnp.zeros((512, 512, 3), jnp.float32)
    params = SphereParams.from_scene(sd.scene, albedo=True, center=True,
                                     radius=True)
    opt = optax.adam(1e-2)
    st = opt.init(params)

    grads = {}
    for mode in ("take", "onehot"):
        loss = replay_loss_fn(sd.scene, sd.camera, cfg, target, hits, t,
                              gather_mode=mode)

        @jax.jit
        def step(params, st, hits, loss=loss):
            l, g = jax.value_and_grad(lambda p: loss(p))(params)
            upd, st = opt.update(g, st, params)
            return optax.apply_updates(params, upd), st, l

        p1, st1, l0 = timed(f"sphere replay train step [{mode}]",
                            step, params, st, hits)
        print(f"  loss {float(l0):.5g}", flush=True)
        grads[mode] = jax.jit(lambda p, loss=loss: jax.grad(
            lambda q: loss(q))(p))(params)
    gd = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        grads["take"], grads["onehot"])
    print(f"  onehot-vs-take grad max abs diff: {gd}", flush=True)

    # replay forward == kernel forward (sanity, on-chip rounding)
    img = jax.jit(lambda: replay_color(sd.scene, sd.camera, cfg, t, hits))()
    diff = np.abs(np.asarray(img) - np.asarray(color))
    print(f"  replay-vs-kernel color: max {diff.max():.3e} "
          f"mean {diff.mean():.3e}", flush=True)

    # ---- suzanne 512^2 b5 (BASELINE config 5 scale) -----------------------
    sd = scenes.scene_suzanne(512, 512)
    cfg = sd.config
    rec = jax.jit(lambda: record_hits_pallas(sd.scene, sd.camera, cfg, t))
    color, hits = timed("suzanne record (Pallas mono fwd + ids)", rec)
    print(f"  hit fraction/bounce: "
          f"{np.asarray((hits >= 0).mean(axis=(1, 2)))}", flush=True)

    params = TriangleParams.from_scene(sd.scene, albedo=True, param=True)
    st = opt.init(params)

    for mode in ("take", "onehot"):
        loss = replay_loss_fn(sd.scene, sd.camera, cfg, target, hits, t,
                              gather_mode=mode)

        @jax.jit
        def tstep(params, st, hits, loss=loss):
            l, g = jax.value_and_grad(lambda p: loss(p))(params)
            upd, st = opt.update(g, st, params)
            return optax.apply_updates(params, upd), st, l

        p1, st1, l0 = timed(f"suzanne replay train step [{mode}]",
                            tstep, params, st, hits)
        print(f"  loss {float(l0):.5g}", flush=True)

    img = jax.jit(lambda: replay_color(sd.scene, sd.camera, cfg, t, hits))()
    diff = np.abs(np.asarray(img) - np.asarray(color))
    print(f"  replay-vs-kernel color: max {diff.max():.3e} "
          f"mean {diff.mean():.3e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
