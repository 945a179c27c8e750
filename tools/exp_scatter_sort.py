"""Microbenchmark: scatter-to-pixel-order vs inverse-sort-by-pix.

The wavefront backend restores pixel order with element-granularity XLA
scatters (``.at[:, pix].set``) — once per frame at spp=1, once per SAMPLE
at spp>1 (plus a state scatter).  CLAUDE.md's measured rule of thumb says
TPU element scatters are ~30x slower than moving the same data through a
variadic ``lax.sort``; since ``pix`` is a permutation of ``arange(n)``,
sorting by it restores pixel order BIT-IDENTICALLY.

This measures both at the two stream sizes that matter: 512x512 (262K,
the bench headline) and 1280x736 padded (942K, BASELINE config 4).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_scatter_sort.py
"""
from __future__ import annotations

import functools
import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=3):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time_mod.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    return (time_mod.perf_counter() - t0) / iters


@functools.partial(jax.jit, static_argnames=("reps",))
def scatter3(pix, planes, reps=8):
    def body(i, acc):
        src = planes + i.astype(jnp.float32)
        out = jnp.zeros_like(planes).at[:, pix].set(src)
        return acc + out
    return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(planes))


@functools.partial(jax.jit, static_argnames=("reps",))
def sort4(pix, planes, reps=8):
    def body(i, acc):
        src = planes + i.astype(jnp.float32)
        ops = jax.lax.sort((pix, src[0], src[1], src[2]), num_keys=1)
        return acc + jnp.stack(ops[1:4])
    return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(planes))


@functools.partial(jax.jit, static_argnames=("reps",))
def scatter1_state(pix, state, reps=8):
    def body(i, acc):
        out = jnp.zeros_like(state).at[pix].set(state + i.astype(jnp.uint32))
        return acc + out
    return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(state))


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    for n, label in ((512 * 512, "262K (512^2)"),
                     (736 * 1280, "942K (720p pad)")):
        pix = jnp.asarray(rng.permutation(n).astype(np.int32))
        planes = jnp.asarray(rng.standard_normal((3, n), dtype=np.float32))
        state = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
        # one reps variable feeds BOTH the jitted loop count and the
        # per-op normalization — changing either alone can't skew timings
        reps = 8
        ts = timed(functools.partial(scatter3, reps=reps), pix,
                   planes) / reps * 1e3
        tt = timed(functools.partial(sort4, reps=reps), pix,
                   planes) / reps * 1e3
        tu = timed(functools.partial(scatter1_state, reps=reps), pix,
                   state) / reps * 1e3
        # correctness: sort-by-pix == scatter
        got = np.asarray(sort4(pix, planes, reps=1))
        want = np.asarray(scatter3(pix, planes, reps=1))
        ok = np.array_equal(got, want)
        print(f"{label:18s} scatter3={ts:7.3f}ms  sort4={tt:7.3f}ms  "
              f"state_scatter={tu:7.3f}ms  ratio={ts/tt:5.1f}x  "
              f"bitident={ok}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
