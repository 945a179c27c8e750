"""Round-5 offline (CPU) traversal analysis at the PRODUCTION wave configs —
the measurement that decides the two r5 kernel candidates before building
them (VERDICT r4 items 1-2):

  A. union liveness tail  — for the tile-union scan, how many union chunks
     are live for <X% of the tile's lanes?  A two-round "masked scan with
     leftover-lane deferral" (docs/DESIGN_binning.md) can only win if the
     main pass may skip a FAT tail of low-liveness chunks while few lanes
     need them (those lanes re-trace compacted in round 2).  Reported per
     threshold: chunks the main pass keeps, lanes left incomplete, and the
     round-2 re-scan cost after re-compacting leftover lanes into tiles.

  B. sub-chunk culling    — per live chunk, how many 8/16-triangle sub-AABBs
     have >=1 lane entering (slab + tmin<best)?  An in-kernel sub-box cond
     skip is EXACTLY result-preserving (conservative rejection, order kept),
     so its win is just  32 / (4*slab_tri_eq + live_subs*8)  per live chunk.

Both use the FINAL best-t as the pruning bound (max-pruning lower bounds,
same convention as tools/analyze_binning.py r2).

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/analyze_r5.py \
      [scene=suzanne] [res=256] [bounces=5]
Config (th/tw, key mode, sort_every, split_big) comes from the production
dispatch (rt.kernels.dispatch.wave_params) for the scene.
"""
from __future__ import annotations

import dataclasses
import sys

import jax.numpy as jnp
import numpy as np

from rt.config import FLT_MAX
from rt.core import camera as camera_mod
from rt.core import triangle as triangle_mod
from rt.core.materials import scatter
from rt.kernels.tris_kernel import _morton_order, _ray_sort_key
from rt.scene import scenes

SLAB_TRI_EQ = 0.55   # slab test ~25 VPU ops + cond overhead vs ~65 ops/tri


def table_order(scene, split_big: bool):
    """The Morton(+split_big) table order — rt.kernels.tris_kernel.pack_tri_table."""
    morton = np.asarray(_morton_order((scene.a + scene.b + scene.c) / 3.0))
    if split_big:
        e1 = np.asarray(scene.b - scene.a)
        e2 = np.asarray(scene.c - scene.a)
        area2 = (np.cross(e1, e2) ** 2).sum(1)
        big = area2 > 256.0 * np.median(area2)
        keyed = np.argsort(big[morton].astype(np.int32), kind="stable")
        return morton[keyed]
    return morton


def boxes(verts_min, verts_max, group):
    bmin = verts_min.reshape(-1, group, 3, 3).min((1, 2))
    bmax = verts_max.reshape(-1, group, 3, 3).max((1, 2))
    return bmin, bmax


def enter_mask(o, d, bmin, bmax, best_t):
    inv = 1.0 / d
    t0 = (bmin[None] - o[:, None]) * inv[:, None]
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

    from rt.kernels.dispatch import wave_params
    kw = wave_params(scene, cfg)
    chunk = kw["chunk"]
    th, tw = kw["th"], kw["tw"]
    key_mode, sort_every = kw["key_mode"], kw["sort_every"]
    split_big = kw["split_big"]

    order = table_order(scene, split_big)
    a = np.asarray(scene.a)[order]
    b = np.asarray(scene.b)[order]
    c = np.asarray(scene.c)[order]
    m = a.shape[0]
    m_pad = -(-m // chunk) * chunk
    verts = np.stack([a, b, c], 1)
    big = 3e38
    vmin = np.concatenate([verts, np.full((m_pad - m, 3, 3), big)])
    vmax = np.concatenate([verts, np.full((m_pad - m, 3, 3), -big)])
    bmin, bmax = boxes(vmin, vmax, chunk)
    smin8, smax8 = boxes(vmin, vmax, 8)
    smin16, smax16 = boxes(vmin, vmax, 16)
    n_chunks = bmin.shape[0]
    # winning triangle (scene order) -> chunk id in table order
    inv_order = np.empty(m, np.int64)
    inv_order[order] = np.arange(m)

    tile = th * tw
    print(f"{name} {res}x{res} b{bounces}: {n_chunks} chunks, tile {th}x{tw},"
          f" key={key_mode}, sort_every={sort_every}, split_big={split_big}",
          flush=True)

    state, o, d = camera_mod.generate_primary_rays(
        sd.camera, res, res, jnp.uint32(1000), cfg.normalize_defocus_dir)
    o = np.asarray(o).reshape(-1, 3)
    d = np.asarray(d).reshape(-1, 3)
    state = np.asarray(state).reshape(-1)
    active = np.ones(o.shape[0], bool)
    wch = np.full(o.shape[0], -1, np.int64)

    lo = jnp.asarray(bmin.min(0), jnp.float32)
    inv_span = 1.0 / jnp.maximum(jnp.asarray(bmax.max(0)) - lo, 1e-30)

    perm = np.arange(o.shape[0])
    for bounce in range(bounces):
        t, idx = triangle_mod.intersect_all_bvh(scene, jnp.asarray(o),
                                                jnp.asarray(d))
        t = np.asarray(t)
        idx = np.asarray(idx)

        if bounce >= 1:
            if (bounce - 1) % sort_every == 0:   # wave re-sort schedule
                if key_mode == "morton":
                    ot = tuple(jnp.asarray(o[:, k]) for k in range(3))
                    dt = tuple(jnp.asarray(d[:, k]) for k in range(3))
                    key = np.asarray(_ray_sort_key(
                        ot, dt, lo, inv_span, jnp.asarray(active, jnp.int32)))
                else:       # chunk_oct: winning chunk id + direction octant
                    key = (wch.astype(np.uint64) << 3) \
                        | ((d[:, 0] > 0).astype(np.uint64) << 2) \
                        | ((d[:, 1] > 0).astype(np.uint64) << 1) \
                        | (d[:, 2] > 0).astype(np.uint64)
                    key = np.where(active, key, np.uint64(1) << 63)
                perm = np.argsort(key, kind="stable")
            so, sdir, st, sact = o[perm], d[perm], t[perm], active[perm]

            n_tiles = len(so) // tile
            union = exact = live_rays = 0
            # deferral accounting per threshold (fraction of tile lanes)
            ths = [0.01, 0.02, 0.05, 0.10]
            main_chunks = {x: 0 for x in ths}
            leftover_lanes = {x: 0 for x in ths}
            leftover_sets = {x: [] for x in ths}   # (lane mask rows) for r2 re-tiling
            # sub-box accounting
            live_sub8 = live_sub16 = 0
            for ti in range(n_tiles):
                sl = slice(ti * tile, (ti + 1) * tile)
                if not sact[sl].any():
                    continue
                best = np.where(st[sl] < FLT_MAX, st[sl], FLT_MAX)
                lm = enter_mask(so[sl], sdir[sl], bmin, bmax, best) \
                    & sact[sl][:, None]                       # (tile, C)
                cnt = lm.sum(0)                               # per-chunk lanes
                u = cnt > 0
                union += int(u.sum())
                exact += int(lm.sum())
                live_rays += int(sact[sl].sum())
                for x in ths:
                    keep = cnt >= x * tile
                    main_chunks[x] += int(keep.sum())
                    rest = lm & ~keep[None, :]        # full chunk space
                    lane_left = rest.any(1)
                    leftover_lanes[x] += int(lane_left.sum())
                    if lane_left.any():
                        leftover_sets[x].append(np.packbits(rest[lane_left],
                                                            axis=1))
                # sub-boxes inside live chunks only
                ulist = np.nonzero(u)[0]
                if len(ulist):
                    for kgrp in (8, 16):
                        smin, smax = (smin8, smax8) if kgrp == 8 \
                            else (smin16, smax16)
                        per = chunk // kgrp
                        subs = np.concatenate(
                            [np.arange(ci * per, ci * per + per)
                             for ci in ulist])
                        sm = enter_mask(so[sl], sdir[sl], smin[subs],
                                        smax[subs], best) \
                            & sact[sl][:, None]
                        if kgrp == 8:
                            live_sub8 += int(sm.any(0).sum())
                        else:
                            live_sub16 += int(sm.any(0).sum())

            # model the two-round deferral: round2 re-tiles leftover lanes
            # (they arrive compacted by the next sort); each new tile pays
            # the union of its lanes' leftover chunk sets
            defer_cost = {}
            for x in ths:
                if leftover_sets[x]:
                    rows = np.concatenate(leftover_sets[x], 0)  # packed bits
                    cost = 0
                    for s0 in range(0, rows.shape[0], tile):
                        blk = np.unpackbits(rows[s0:s0 + tile], axis=1,
                                            count=n_chunks)
                        cost += int(blk.any(0).sum())
                    defer_cost[x] = cost
                else:
                    defer_cost[x] = 0

            ue = union * tile / max(exact, 1)
            print(f"  bounce {bounce}: live {live_rays/len(o):.0%} | union "
                  f"{union} | exact {exact/max(live_rays,1):.2f}/ray "
                  f"({exact/tile:.0f} tile-units, u/e={ue:.1f}) | "
                  f"live sub8 {live_sub8/max(union,1):.2f}/chunk "
                  f"sub16 {live_sub16/max(union,1):.2f}/chunk", flush=True)
            est8 = union * chunk / max(
                union * 4 * SLAB_TRI_EQ + live_sub8 * 8, 1)
            est16 = union * chunk / max(
                union * 2 * SLAB_TRI_EQ + live_sub16 * 16, 1)
            print(f"      sub-cull scan-win est: x{est8:.2f} (sub8) "
                  f"x{est16:.2f} (sub16)", flush=True)
            for x in ths:
                tot = main_chunks[x] + defer_cost[x]
                print(f"      defer X={x:4.0%}: main {main_chunks[x]} + r2 "
                      f"{defer_cost[x]} = {tot} vs union {union} "
                      f"(x{union/max(tot,1):.2f}), leftover lanes "
                      f"{leftover_lanes[x]/max(live_rays,1):.1%}", flush=True)

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
        # winning chunk id (table order) for the chunk_oct key
        wch = np.where(hm & (idx >= 0), inv_order[np.clip(idx, 0, m - 1)]
                       // chunk, -1)
        active = hm
    return 0


if __name__ == "__main__":
    sys.exit(main())
