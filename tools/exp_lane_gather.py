"""Primitive probe: per-lane dynamic gather inside a Pallas TPU kernel.

The per-ray-exact traversal design (windowed lane-gather M-T) needs
out[r, c] = table[idx[r, c]] where table is one 128-wide lane vector —
``jnp.take_along_axis(src, idx, axis=1)`` with src/idx/out all (th, tw)
lowers to tpu.dynamic_gather per the Mosaic lowering rules.  This probe
checks (a) it lowers + runs on-chip, (b) correctness vs a host reference,
(c) cost per gather (loop of many dependent gathers, timed through
readback).
"""
from __future__ import annotations

import functools
import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe_kernel(tab_ref, idx_ref, out_ref, *, th, tw, iters):
    tab = tab_ref[...]          # (th, tw) f32: table broadcast per row
    idx = idx_ref[...]          # (th, tw) i32 in [0, tw)

    def body(i, acc):
        g = jnp.take_along_axis(tab, (idx + i) % tw, axis=1)
        return acc + g

    out_ref[...] = jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((th, tw), jnp.float32))


@functools.partial(jax.jit, static_argnames=("th", "tw", "iters",
                                             "interpret"))
def probe(tab, idx, *, th, tw, iters, interpret=False):
    return pl.pallas_call(
        functools.partial(_probe_kernel, th=th, tw=tw, iters=iters),
        out_shape=jax.ShapeDtypeStruct((th, tw), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret)(tab, idx)


def run(th, tw, iters):
    rng = np.random.default_rng(0)
    tab_row = rng.random(tw, dtype=np.float32)
    tab = jnp.asarray(np.broadcast_to(tab_row, (th, tw)).copy())
    idx = jnp.asarray(rng.integers(0, tw, size=(th, tw), dtype=np.int32))

    out = np.asarray(probe(tab, idx, th=th, tw=tw, iters=iters))
    # reference
    ref = np.zeros((th, tw), np.float32)
    idx_np = np.asarray(idx)
    for i in range(iters):
        ref += tab_row[(idx_np + i) % tw]
    ok = np.allclose(out, ref, atol=1e-4)

    t0 = time_mod.perf_counter()
    np.asarray(probe(tab, idx, th=th, tw=tw, iters=iters))
    dt = time_mod.perf_counter() - t0
    per = dt / iters * 1e9
    print(f"(th={th:3d}, tw={tw:3d}) iters={iters}: correct={ok} "
          f"{dt*1e3:.2f} ms total, {per:.1f} ns/gather-plane "
          f"({per / (th * tw / 8 / 128):.2f} ns/vreg)", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for th, tw in [(8, 128), (32, 128), (32, 256)]:
        try:
            run(th, tw, 512)
        except Exception as e:  # noqa: BLE001
            print(f"(th={th}, tw={tw}) FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
