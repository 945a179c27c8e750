"""Decompose the replay train-step cost on-chip: dispatch floor, forward
only, fwd+bwd, full step — per gather mode.  Identifies where the ~300 ms
(spheres 512^2 b10) actually goes.  Run from the repo root on the TPU host.
"""
from __future__ import annotations

import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rt.grad import SphereParams
from rt.grad.replay import record_hits_oracle, replay_color, replay_loss_fn
from rt.scene import scenes


def timed(label, fn, *args, reps=3):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    best = 1e9
    for _ in range(reps):
        t0 = time_mod.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time_mod.perf_counter() - t0)
    print(f"{label:52s} {best*1e3:9.1f} ms", flush=True)
    return out


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    sd = scenes.scene_sphere_simple(512, 512)
    cfg = sd.config
    t = jnp.uint32(1000)

    # dispatch floor: trivial call returning a small array
    x = jnp.ones((8, 128), jnp.float32)
    timed("floor (tiny jit add)", jax.jit(lambda v: v + 1.0), x)

    # record once (on-chip hits)
    from rt.grad.replay import record_hits_pallas
    color, hits = jax.jit(
        lambda: record_hits_pallas(sd.scene, sd.camera, cfg, t))()
    jax.block_until_ready(hits)

    target = jnp.zeros((512, 512, 3), jnp.float32)
    params = SphereParams.from_scene(sd.scene, albedo=True, center=True,
                                     radius=True)
    opt = optax.adam(1e-2)
    st = opt.init(params)

    for mode in ("take", "onehot"):
        fwd = jax.jit(lambda h, m=mode: replay_color(
            sd.scene, sd.camera, cfg, t, h, gather_mode=m))
        # forward, summed to a scalar so readback is negligible
        fwd_s = jax.jit(lambda h, m=mode: jnp.sum(replay_color(
            sd.scene, sd.camera, cfg, t, h, gather_mode=m)))
        timed(f"replay forward sum [{mode}]", fwd_s, hits)
        timed(f"replay forward full-image readback [{mode}]", fwd, hits)

        loss = replay_loss_fn(sd.scene, sd.camera, cfg, target, hits, t,
                              gather_mode=mode)
        vg = jax.jit(lambda p, h, loss=loss: jax.value_and_grad(
            lambda q: loss(q))(p))
        timed(f"value_and_grad [{mode}]", vg, params, hits)

        # remat off: is rematerialization the cost?
        from rt.grad.loss import image_mse
        from rt.grad.params import apply_params

        def loss_nr(p, h, m=mode):
            img = replay_color(apply_params(sd.scene, p), sd.camera, cfg, t,
                               h, remat=False, gather_mode=m)
            return image_mse(img, target)

        vg_nr = jax.jit(lambda p, h: jax.value_and_grad(
            lambda q: loss_nr(q, h))(p))
        timed(f"value_and_grad remat=False [{mode}]", vg_nr, params, hits)

        @jax.jit
        def step(params, st, h, loss=loss):
            l, g = jax.value_and_grad(lambda p: loss(p))(params)
            upd, st = opt.update(g, st, params)
            return optax.apply_updates(params, upd), st, l

        timed(f"full train step [{mode}]", step, params, st, hits)

        # the REAL training shape: K steps chained on device, one scalar
        # readback — the per-call tunnel floor (~27 ms) and per-leaf
        # readbacks amortize away; this is compute per step.
        @jax.jit
        def steps16(params, st, h, loss=loss):
            def body(c, _):
                p, s = c
                l, g = jax.value_and_grad(lambda q: loss(q))(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), l
            (_, _), ls = jax.lax.scan(body, (params, st), None, length=16)
            return ls[-1]

        timed(f"16 chained train steps [{mode}] (/16 per step)",
              steps16, params, st, hits)
    return 0


if __name__ == "__main__":
    sys.exit(main())
