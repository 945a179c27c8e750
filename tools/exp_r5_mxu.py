"""r5 precision-RELAXED fast-path evaluation (VERDICT r4 item 4): measure
whether dropping f32 bit-exactness unlocks an MXU (Woop unit-triangle)
intersection ≥2x faster than the production VPU Möller–Trumbore scan.

PERF.md r2b closed MXU intersection UNDER the bit-exact constraint (HIGHEST
precision forces 3-6 bf16 passes).  This experiment drops that constraint —
bf16 single-pass matmul, relaxed epsilon semantics — and measures the
remaining two objections head-to-head in a standalone Pallas microbench:

  A. VPU M-T scan: 64 chunks x 32 triangles, the production `_trace_bounce`
     arithmetic (validity chain + best-t select), unroll=32, tracking t.
  B. MXU Woop: per chunk, rays (R, 8) [o,1,d,0] @ W (8, 192) bf16 where W's
     columns are COEFFICIENT-GROUPED per triangle transform (all o'x, all
     o'y, ... all d'z), so the epilogue is (R, 32)-shaped elementwise math:
     t = -o'z/d'z, u = o'x + t d'x, v = o'y + t d'y, valid window, then a
     32-wide min reduction.  K=8 contraction = 6% MXU utilization — the
     arithmetic ceiling this measures.

Both kernels do the same logical job (closest-t over 2048 triangles for
8192 rays); per-chunk cost ratio decides adopt/close.  B's tracked output
is t only (the real kernel would also need normal/mat resolve, making B
strictly worse than measured here).

Usage: python tools/exp_r5_mxu.py [--reps 200] [--chunks 64]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 32, 256
R = TH * TW
CHUNK = 32
EPS = 1e-4
FLT_MAX = 3.40282e38


def kernel_vpu(tri_ref, o_ref, d_ref, out_ref, *, n_chunks: int):
    """Production-shaped M-T scan: per chunk, 32 scalar-broadcast triangle
    tests against all (TH, TW) lanes, strict t < best."""
    o = (o_ref[0], o_ref[1], o_ref[2])
    d = (d_ref[0], d_ref[1], d_ref[2])
    zero = jnp.zeros((TH, TW), jnp.float32)

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def scan_tri(k, bt):
        e1 = (tri_ref[k, 3], tri_ref[k, 4], tri_ref[k, 5])
        e2 = (tri_ref[k, 6], tri_ref[k, 7], tri_ref[k, 8])
        h = cross(d, e2)
        det = dot(e1, h)
        inv_det = 1.0 / det
        s = (o[0] - tri_ref[k, 0], o[1] - tri_ref[k, 1],
             o[2] - tri_ref[k, 2])
        u = inv_det * dot(s, h)
        q = cross(s, e1)
        v = inv_det * dot(d, q)
        t = inv_det * dot(e2, q)
        valid = (jnp.abs(det) >= EPS)
        valid &= (u >= 0.0) & (u <= 1.0)
        valid &= (v >= 0.0) & (u + v <= 1.0)
        valid &= (t >= EPS) & (t < bt)
        return jnp.where(valid, t, bt)

    def chunk_body(ci, bt):
        def body(kk, b):
            for uu in range(CHUNK):       # unroll=32, the dispatch default
                b = scan_tri(ci * CHUNK + kk * CHUNK + uu, b)
            return b
        return jax.lax.fori_loop(0, 1, body, bt)

    best = jax.lax.fori_loop(0, n_chunks, chunk_body, zero + FLT_MAX)
    out_ref[...] = best


def kernel_mxu(w_ref, x_ref, out_ref, *, n_chunks: int):
    """Woop bf16: per (ray-block, chunk) one (RB, 8) @ (8, 192) matmul,
    coefficient-grouped epilogue, 32-wide min reduce.  Ray-blocked because
    the full (R, 192) transform output (plus epilogue temps) overflows the
    16M scoped VMEM — the traffic objection from the r2b closure, now
    measured: the unblocked form OOMs at 39.8M scoped."""
    RB = 1024

    def block_body(rb, _):
        x = x_ref[pl.ds(rb * RB, RB), :].astype(jnp.bfloat16)   # (RB, 8)

        def chunk_body(ci, best):
            w = w_ref[ci]                                # (8, 192) bf16
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (RB, 192)
            ox, oy, oz = y[:, 0:32], y[:, 32:64], y[:, 64:96]
            dx, dy, dz = y[:, 96:128], y[:, 128:160], y[:, 160:192]
            t = -oz * (1.0 / dz)
            u = ox + t * dx
            v = oy + t * dy
            valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
                & (t >= EPS) & (t < best)
            cand = jnp.where(valid, t, FLT_MAX).min(axis=1, keepdims=True)
            return jnp.minimum(best, cand)

        best = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                 jnp.full((RB, 1), FLT_MAX, jnp.float32))
        out_ref[pl.ds(rb * RB, RB), :] = best
        return 0

    jax.lax.fori_loop(0, R // RB, block_body, 0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=200)
    p.add_argument("--chunks", type=int, default=64)
    args = p.parse_args(argv)
    n_chunks = args.chunks
    rng = np.random.default_rng(0)

    tri = jnp.asarray(rng.normal(size=(n_chunks * CHUNK, 13)), jnp.float32)
    o = jnp.asarray(rng.normal(size=(3, TH, TW)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(3, TH, TW)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(n_chunks, 8, 192)), jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(R, 8)), jnp.float32)

    va = pl.pallas_call(
        functools.partial(kernel_vpu, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((TH, TW), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    vb = pl.pallas_call(
        functools.partial(kernel_mxu, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))

    @jax.jit
    def run_a(tri, o, d):
        def body(acc, _):
            return acc + va(tri, o, d)[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.reps)
        return acc

    @jax.jit
    def run_b(w, x):
        def body(acc, _):
            return acc + vb(w, x)[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.reps)
        return acc

    for name, fn, fargs in [("A vpu-mt", run_a, (tri, o, d)),
                            ("B mxu-woop", run_b, (w, x))]:
        np.asarray(fn(*fargs))           # compile + warm
        t0 = time_mod.perf_counter()
        np.asarray(fn(*fargs))
        dt = (time_mod.perf_counter() - t0) / args.reps
        pairs = R * n_chunks * CHUNK
        print(f"{name}: {dt*1e6:9.1f} us/pass  "
              f"{pairs/dt/1e9:7.2f} Gpairs/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
