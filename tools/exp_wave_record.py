"""On-chip timing of the WAVE recorder vs the monolithic recorder on
large meshes (lucy/dragon at 512x512), plus a replay train step — the
large-mesh differentiable path (rt/grad/replay.py tris_backend="wave").
Run from the repo root on the TPU host.
"""
from __future__ import annotations

import dataclasses
import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rt.grad import TriangleParams
from rt.grad.replay import record_hits_pallas, replay_loss_fn
from rt.scene import scenes


def timed(label, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)   # force through readback
    t0 = time_mod.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    dt = time_mod.perf_counter() - t0
    print(f"{label:46s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    t = jnp.uint32(1000)
    opt = optax.adam(1e-2)

    for name, builder in (("suzanne", scenes.scene_suzanne),
                          ("lucy", scenes.scene_lucy),
                          ("dragon", scenes.scene_dragon)):
        sd = builder(512, 512)
        cfg = sd.config
        print(f"--- {name}: {sd.scene.m} tris, bounces={cfg.bounces}",
              flush=True)

        recs = {}
        for backend in ("mono", "wave"):
            # EAGER, not jax.jit-wrapped: under an outer jit XLA scope-
            # allocates the recorder's pallas outputs (13 x H x W planes) in
            # VMEM and OOMs at dragon scale (26.4M > the 16M scoped limit);
            # eagerly each pallas_call jits alone and outputs land in HBM.
            # fit_replay calls the recorder eagerly for the same reason.
            rec = lambda be=backend: record_hits_pallas(
                sd.scene, sd.camera, cfg, t, tris_backend=be)
            try:
                color, hits = timed(f"{name} record [{backend}]", rec)
            except Exception as e:  # noqa: BLE001 — e.g. mono VMEM OOM on dragon
                print(f"{name} record [{backend}] FAILED: "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
                continue
            recs[backend] = (np.asarray(color), np.asarray(hits))
        if "mono" in recs and "wave" in recs:
            cdiff = np.abs(recs["mono"][0] - recs["wave"][0]).max()
            iagree = (recs["mono"][1] == recs["wave"][1]).mean()
            print(f"  wave-vs-mono color max diff {cdiff:.3e}, "
                  f"idx agreement {iagree:.6f}", flush=True)

        target = jnp.zeros((512, 512, 3), jnp.float32)
        hits = jnp.asarray(recs["wave"][1])
        loss = replay_loss_fn(sd.scene, sd.camera, cfg, target, hits, t)
        params = TriangleParams.from_scene(sd.scene, albedo=True, param=True)
        st = opt.init(params)

        @jax.jit
        def step(params, st, hits, loss=loss):
            l, g = jax.value_and_grad(lambda p: loss(p))(params)
            upd, st = opt.update(g, st, params)
            return optax.apply_updates(params, upd), st, l

        _, _, l0 = timed(f"{name} replay train step", step, params, st, hits)
        print(f"  loss {float(l0):.5g}", flush=True)

        # chained steps: the real per-step compute (readback floor amortized)
        @jax.jit
        def steps16(params, st, h, loss=loss):
            def body(c, _):
                p, s = c
                l, g = jax.value_and_grad(lambda q: loss(q))(p)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), l
            (_, _), ls = jax.lax.scan(body, (params, st), None, length=16)
            return ls[-1]

        timed(f"{name} 16 chained steps (/16 per step)", steps16,
              params, st, hits)
    return 0


if __name__ == "__main__":
    sys.exit(main())
