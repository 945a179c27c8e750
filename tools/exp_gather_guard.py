"""A/B the non-finite guard in the one-hot MXU gather (rt/grad/gather.py):
guarded (4C-column matmul + mask reconstruction) vs the bare r2 form, on
the shapes the replay step actually uses.  Also re-times the sphere replay
chained step to compare against PERF.md r2b's 12.1 ms/step.

PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_gather_guard.py
"""
from __future__ import annotations

import time as time_mod

import jax
import jax.numpy as jnp
import numpy as np

from rt.grad.gather import gather_rows


def bare_gather(table, idx, block=32768):
    n, c = table.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    p = flat.shape[0]
    iota = jax.lax.iota(jnp.int32, n)

    def one_block(rows):
        oh = (rows[:, None] == iota[None, :]).astype(table.dtype)
        return jax.lax.dot(oh, table, precision=jax.lax.Precision.HIGHEST)

    nb = -(-p // block)
    pad = nb * block - p
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
    out = jax.lax.map(one_block, flat.reshape(nb, block))
    return out.reshape(nb * block, c)[:p].reshape(idx.shape + (c,))


def timeit(label, fn, *args, iters=20):
    out = jax.jit(fn)(*args)
    jax.tree_util.tree_map(np.asarray, out)

    @jax.jit
    def chain(*a):
        def body(acc, _):
            return acc + fn(*a).sum(), None
        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    float(chain(*args))
    t0 = time_mod.perf_counter()
    float(chain(*args))
    dt = (time_mod.perf_counter() - t0) / iters
    print(f"{label:42s} {dt*1e3:8.3f} ms/iter", flush=True)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    # replay shapes: sphere table (7..490, 9), idx (bounces*H*W,)
    for n, c, p in ((7, 9, 10 * 512 * 512), (490, 9, 10 * 512 * 512),
                    (1095, 13, 5 * 512 * 512)):
        table = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, n, size=(p,)), jnp.int32)
        print(f"--- table ({n},{c}), {p} gathers", flush=True)
        timeit("bare one-hot (r2)", bare_gather, table, idx)
        timeit("guarded one-hot (r3)", gather_rows, table, idx)


if __name__ == "__main__":
    main()
