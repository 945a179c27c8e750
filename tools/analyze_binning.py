"""Offline (CPU) analysis: how much work would per-ray-exact chunk binning
save over the wavefront backend's tile-union culling — BEFORE building a
kernel.  Replicates the wave pipeline's per-bounce state (oracle transport,
same sort key, same tiles) and reports, per bounce:

  union   — chunks scanned today: sum over tiles of |union of live chunks|
  exact   — per-ray floor: mean live chunks per ray
  win4/8  — windowed lane-gather cost: sum over tiles over windows of
            max-lane live-chunks-in-window (the pass count the windowed
            kernel would pay), in chunk-scan units

Run on CPU: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_binning.py
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from rt.core import camera as camera_mod
from rt.core import triangle as triangle_mod
from rt.core.materials import scatter
from rt.config import FLT_MAX
from rt.kernels.tris_kernel import _morton_order, _ray_sort_key, _spread10
from rt.scene import scenes


def chunk_tables(scene, chunk=32):
    order = np.asarray(_morton_order((scene.a + scene.b + scene.c) / 3.0))
    a = np.asarray(scene.a)[order]
    b = np.asarray(scene.b)[order]
    c = np.asarray(scene.c)[order]
    m = a.shape[0]
    m_pad = -(-m // chunk) * chunk
    verts = np.stack([a, b, c], 1)
    big = 3e38
    vmin = np.concatenate([verts, np.full((m_pad - m, 3, 3), big)])
    vmax = np.concatenate([verts, np.full((m_pad - m, 3, 3), -big)])
    bmin = vmin.reshape(-1, chunk, 3, 3).min((1, 2))
    bmax = vmax.reshape(-1, chunk, 3, 3).max((1, 2))
    return bmin, bmax


def live_mask(o, d, bmin, bmax, best_t):
    """(R, C) live mask: slab enter test + tmin < best_t (the kernel's)."""
    inv = 1.0 / d
    t0 = (bmin[None] - o[:, None]) * inv[:, None]     # (R, C, 3)
    t1 = (bmax[None] - o[:, None]) * inv[:, None]
    tmin = np.fmin(t0, t1).max(-1)
    tmax = np.fmax(t0, t1).min(-1)
    return (tmin <= tmax) & (tmax >= 0.0) & (tmin < best_t[:, None])


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "suzanne"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sd = getattr(scenes, f"scene_{name}")(res, res)
    cfg = dataclasses.replace(sd.config, bounces=bounces)
    scene = sd.scene
    bmin, bmax = chunk_tables(scene)
    n_chunks = bmin.shape[0]
    print(f"{name} {res}x{res} b{bounces}: {n_chunks} chunks", flush=True)

    state, o, d = camera_mod.generate_primary_rays(
        sd.camera, res, res, jnp.uint32(1000), cfg.normalize_defocus_dir)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    state = state.reshape(-1)
    active = np.ones(o.shape[0], bool)

    lo = jnp.asarray(bmin.min(0), jnp.float32)
    inv_span = 1.0 / jnp.maximum(jnp.asarray(bmax.max(0)) - lo, 1e-30)

    TH, TW = 32, 256
    tile = TH * TW

    for bounce in range(bounces):
        t, idx = triangle_mod.intersect_all_bvh(scene, jnp.asarray(o),
                                                jnp.asarray(d))
        t = np.asarray(t)

        if bounce >= 1:
            # sort by the wave key (origin morton + octant), dead to end
            ot = tuple(jnp.asarray(o[:, c]) for c in range(3))
            dt = tuple(jnp.asarray(d[:, c]) for c in range(3))
            key = np.asarray(_ray_sort_key(ot, dt, lo, inv_span,
                                           jnp.asarray(active, jnp.int32)))
            perm = np.argsort(key, kind="stable")
            so, sdir, st, sact = o[perm], d[perm], t[perm], active[perm]

            n_tiles = len(so) // tile
            union = exact = win4 = win8 = 0
            live_rays = 0
            for ti in range(n_tiles):
                sl = slice(ti * tile, (ti + 1) * tile)
                if not sact[sl].any():
                    continue
                # best_t = the FINAL closest hit: the max-pruning lower
                # bound of the kernel's front-to-back `tmin < best` test
                best = np.where(st[sl] < FLT_MAX, st[sl], FLT_MAX)
                lm = live_mask(so[sl], sdir[sl], bmin, bmax, best) \
                    & sact[sl][:, None]
                pad = (-n_chunks) % 8
                lmp = np.pad(lm, ((0, 0), (0, pad)))
                union += int(lm.any(0).sum())
                exact += int(lm.sum())
                live_rays += int(sact[sl].sum())
                win4 += int(lmp.reshape(tile, -1, 4).sum(-1).max(0).sum())
                win8 += int(lmp.reshape(tile, -1, 8).sum(-1).max(0).sum())
            print(f"  bounce {bounce}: live {live_rays/len(o):.0%} | "
                  f"union {union} chunk-scans | exact {exact/max(live_rays,1):.2f}"
                  f" chunks/ray ({exact/tile:.0f} tile-units) | "
                  f"win4 {win4} | win8 {win8} "
                  f"(ratios u/e={union*tile/max(exact,1):.1f} "
                  f"u/w4={union/max(win4,1):.2f} u/w8={union/max(win8,1):.2f})",
                  flush=True)

        # advance the transport (oracle)
        hit_rec = triangle_mod.hit_record(scene, jnp.asarray(o),
                                          jnp.asarray(d), jnp.asarray(t),
                                          idx)
        ns, no, nd = scatter(jnp.asarray(state), jnp.asarray(o),
                             jnp.asarray(d), hit_rec,
                             normalize_reflect_in=cfg.normalize_reflect_in)
        hm = active & (t != FLT_MAX)
        state = np.where(hm, np.asarray(ns), state)
        o = np.where(hm[:, None], np.asarray(no), o)
        d = np.where(hm[:, None], np.asarray(nd), d)
        active = hm
    return 0


if __name__ == "__main__":
    sys.exit(main())
