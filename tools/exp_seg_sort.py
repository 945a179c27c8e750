"""Microbench: flat vs reshape-batched vs lax.map segmented 14-operand
sorts at the 720p stream size (942K keys) — explains the exp_r4_knobs
segment results (sort_segments measured SLOWER in-graph).

Usage: python tools/exp_seg_sort.py   (run from the repo root on TPU)
"""
import functools, time
import jax, jax.numpy as jnp, numpy as np

def timed(fn, *a):
    out = fn(*a); jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(4): out = fn(*a)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / 4

rng = np.random.default_rng(0)
n = 942080
key = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
planes = [jnp.asarray(rng.standard_normal(n, ).astype(np.float32)) for _ in range(13)]

@functools.partial(jax.jit, static_argnames=("seg",))
def seg_sort(key, planes, seg=1):
    ops = (key, *planes)
    if seg == 1:
        out = jax.lax.sort(ops, num_keys=1)
    else:
        out = tuple(o.reshape(-1) for o in
                    jax.lax.sort(tuple(x.reshape(seg, -1) for x in ops), num_keys=1))
    return out[1][0]

@functools.partial(jax.jit, static_argnames=("seg",))
def map_sort(key, planes, seg):
    ops = tuple(x.reshape(seg, -1) for x in (key, *planes))
    out = jax.lax.map(lambda xs: jax.lax.sort(xs, num_keys=1), ops)
    return out[1][0, 0]

if __name__ == "__main__":
    for seg in (1, 5, 23):
        print(f"seg={seg:3d} reshape-batched: {timed(seg_sort, key, planes, seg)*1e3:7.2f} ms", flush=True)
    for seg in (5, 23):
        print(f"seg={seg:3d} lax.map:        {timed(map_sort, key, planes, seg)*1e3:7.2f} ms", flush=True)
