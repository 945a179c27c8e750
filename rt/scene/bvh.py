"""Implicit-heap BVH builder (host-side preprocessing, NumPy).

Re-derivation of Tree::build (src/scene/bvh/tree.rs:36-72) — the reference
also builds this on the CPU before upload, so a host-side NumPy builder is
the like-for-like design.  Semantics replicated exactly:

- n = m.next_power_of_two(); BFS queue of (i, j, depth) ranges, sorting
  triangles[l .. min(j, m)) STABLY by centroid-sum (a+b+c, float32) along
  axis depth % 3, splitting at the PADDED midpoint (i + j) / 2;
- node k's AABB = union of all vertices of triangles under leaf slots
  [k * 2^h - n, ...); node 0 is never touched and stays the inverted-infinite
  box (node.rs:20-27);
- after building, each triangle's ``custom`` becomes the flat face normal
  normalize(cross(b - a, c - a)) (tree.rs:67-70);
- expected structure (tree.rs tests): cube → sizes [16, 12],
  suzanne → sizes [1024, 979].

The AABB pass here is vectorized level-by-level (reduction trees are
associative, so results equal the reference's per-triangle ancestor walk).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from rt.config import MAT_DIELECTRIC, MAT_LAMBERTIAN, MAT_METAL
from rt.scene.objloader import Mesh

F32_MAX = np.float32(3.4028235e38)


def next_power_of_two(m: int) -> int:
    if m <= 1:
        return 1
    return 1 << (m - 1).bit_length()


@dataclass
class Tree:
    """Host-side BVH — mirrors the reference Tree (tree.rs:10-16)."""

    a: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    b: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    c: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    custom: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    mat_id: np.ndarray = field(default_factory=lambda: np.zeros((0,), np.int32))
    bmin: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    bmax: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.float32))
    materials: list = field(default_factory=list)  # [(albedo(3,), param, kind)]
    sizes: tuple = (0, 0)

    def add_mesh(self, mesh: Mesh):
        """tree.rs:74-90 — append triangles; custom = a+b+c (3x centroid)."""
        mat_index = len(self.materials)
        self.materials.append(mesh.material)
        idx = mesh.indices.reshape(-1, 3).astype(np.int64)
        a = mesh.vertices[idx[:, 0]].astype(np.float32)
        b = mesh.vertices[idx[:, 1]].astype(np.float32)
        c = mesh.vertices[idx[:, 2]].astype(np.float32)
        self.a = np.concatenate([self.a, a])
        self.b = np.concatenate([self.b, b])
        self.c = np.concatenate([self.c, c])
        self.custom = np.concatenate([self.custom, (a + b + c).astype(np.float32)])
        self.mat_id = np.concatenate(
            [self.mat_id, np.full(len(a), mat_index, np.int32)])
        return self

    def build(self, use_native: bool = True):
        m = len(self.a)
        n = next_power_of_two(m)

        if use_native and m > 0:
            # C++ fast path (native/rt_native.cpp) — same BFS median-split
            # and level-reduced AABBs; Python below is the oracle fallback.
            try:
                from rt.scene import native_bridge
                if native_bridge.available():
                    tri_lo = np.minimum(np.minimum(self.a, self.b), self.c)
                    tri_hi = np.maximum(np.maximum(self.a, self.b), self.c)
                    order, bmin, bmax = native_bridge.bvh_build(
                        self.custom, tri_lo, tri_hi)
                    self.a, self.b, self.c = (self.a[order], self.b[order],
                                              self.c[order])
                    self.custom = self.custom[order]
                    self.mat_id = self.mat_id[order]
                    self.bmin, self.bmax = bmin, bmax
                    nrm = np.cross(self.b - self.a,
                                   self.c - self.a).astype(np.float32)
                    ln = np.sqrt(np.sum(nrm * nrm, axis=-1, dtype=np.float32))
                    with np.errstate(invalid="ignore", divide="ignore"):
                        self.custom = (nrm / ln[:, None]).astype(np.float32)
                    self.sizes = (n, m)
                    return self
            except Exception:
                pass  # fall through to the Python oracle

        # --- BFS median-split sort (tree.rs:37-55) -----------------------
        order = np.arange(m)
        queue = [(0, n, 0)]
        while queue:
            i, j, depth = queue.pop(0)
            l, r = i, min(j, m)
            if l + 1 >= r:
                continue
            keys = self.custom[order[l:r], depth % 3]
            perm = np.argsort(keys, kind="stable")
            order[l:r] = order[l:r][perm]
            mid = (i + j) // 2
            queue.append((i, mid, depth + 1))
            queue.append((mid, j, depth + 1))
        self.a, self.b, self.c = self.a[order], self.b[order], self.c[order]
        self.custom = self.custom[order]
        self.mat_id = self.mat_id[order]

        # --- AABBs, level by level (equivalent to tree.rs:57-66) ---------
        pad = n - m
        tri_min = np.minimum(np.minimum(self.a, self.b), self.c)
        tri_max = np.maximum(np.maximum(self.a, self.b), self.c)
        lo = np.concatenate([tri_min, np.full((pad, 3), F32_MAX, np.float32)])
        hi = np.concatenate([tri_max, np.full((pad, 3), -F32_MAX, np.float32)])
        bmin = np.full((n, 3), F32_MAX, np.float32)
        bmax = np.full((n, 3), -F32_MAX, np.float32)
        level_lo, level_hi = lo, hi
        size = n // 2
        while size >= 1:
            level_lo = np.minimum(level_lo[0::2], level_lo[1::2])
            level_hi = np.maximum(level_hi[0::2], level_hi[1::2])
            bmin[size:2 * size] = level_lo
            bmax[size:2 * size] = level_hi
            size //= 2
        self.bmin, self.bmax = bmin, bmax

        # --- face normals (tree.rs:67-70) --------------------------------
        nrm = np.cross(self.b - self.a, self.c - self.a).astype(np.float32)
        ln = np.sqrt(np.sum(nrm * nrm, axis=-1, dtype=np.float32))
        with np.errstate(invalid="ignore", divide="ignore"):
            self.custom = (nrm / ln[:, None]).astype(np.float32)
        self.sizes = (n, m)
        return self


def build_tree(meshes) -> Tree:
    t = Tree()
    for mesh in meshes:
        t.add_mesh(mesh)
    return t.build()


def to_triangle_scene(tree: Tree):
    """Upload the built tree as a device TriangleScene pytree — the analog of
    SceneTris::write_tree_data (src/scene/scene_tris.rs:21-44)."""
    import jax.numpy as jnp

    from rt.core.triangle import TriangleScene

    mats = tree.materials or [((0.0, 0.0, 0.0), 0.0, 0)]
    albedo = np.array([m[0] for m in mats], np.float32).reshape(-1, 3)
    param = np.array([m[1] for m in mats], np.float32)
    kind = np.array([m[2] for m in mats], np.uint32)
    return TriangleScene(
        a=jnp.asarray(tree.a), b=jnp.asarray(tree.b), c=jnp.asarray(tree.c),
        normal=jnp.asarray(tree.custom), mat_id=jnp.asarray(tree.mat_id),
        bmin=jnp.asarray(tree.bmin), bmax=jnp.asarray(tree.bmax),
        mat_albedo=jnp.asarray(albedo), mat_param=jnp.asarray(param),
        mat_kind=jnp.asarray(kind),
    )


def material_lambertian(albedo):
    return (tuple(np.float32(v) for v in albedo), np.float32(0.0), MAT_LAMBERTIAN)


def material_metal(albedo, fuzz):
    return (tuple(np.float32(v) for v in albedo), np.float32(fuzz), MAT_METAL)


def material_dielectric(ir):
    return ((1.0, 1.0, 1.0), np.float32(ir), MAT_DIELECTRIC)
