"""Sphere primitive (SoA) and ray-sphere intersection.

Replicates shader_sphere.wgsl:136-155 exactly:

- near quadratic root only: ``t = (-b - sqrt(disc)) / (2a)`` — rays starting
  inside a sphere effectively never hit it (the far root is ignored);
- ``t = -1`` sentinel on negative discriminant;
- normal flipped to face the ray, ``front_face = dot(dir, normal) < 0``.

The scene buffer is always MAX_SPHERES long with zero padding, mirroring the
reference's fixed-size storage buffer that the shader scans in full via
``arrayLength`` (src/renderer.rs buffer alloc + shader_sphere.wgsl:218-229).
Zero-radius padding spheres have discriminant <= 0 up to rounding, matching
the GPU's behavior including the measure-zero phantom-hit edge case.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rt.config import FLT_MAX, MAX_SPHERES
from rt.core.vecmath import dot


class SphereArray(NamedTuple):
    """SoA sphere scene, padded to a static count (default MAX_SPHERES)."""

    center: jnp.ndarray   # (N, 3) f32
    radius: jnp.ndarray   # (N,)   f32
    albedo: jnp.ndarray   # (N, 3) f32 (material albedo.rgb)
    mat_param: jnp.ndarray  # (N,) f32 (fuzz or IOR; params.x)
    mat_kind: jnp.ndarray   # (N,) u32 (1=lambertian 2=metal 3=dielectric)

    @property
    def count(self) -> int:
        return self.center.shape[0]


def pack_spheres(spheres, pad_to: int = MAX_SPHERES) -> SphereArray:
    """Build a padded SphereArray from a list of
    (center(3,), radius, albedo(3,), param, kind) tuples — the host-side
    equivalent of SceneSphere::write_scene_data (src/scene/scene_sphere.rs:24-31).
    """
    n = len(spheres)
    if n > pad_to:
        raise ValueError(f"{n} spheres > cap {pad_to}")
    center = np.zeros((pad_to, 3), np.float32)
    radius = np.zeros((pad_to,), np.float32)
    albedo = np.zeros((pad_to, 3), np.float32)
    param = np.zeros((pad_to,), np.float32)
    kind = np.zeros((pad_to,), np.uint32)
    for i, (c, r, a, p, k) in enumerate(spheres):
        center[i] = c
        radius[i] = r
        albedo[i] = a
        param[i] = p
        kind[i] = k
    return SphereArray(jnp.asarray(center), jnp.asarray(radius),
                       jnp.asarray(albedo), jnp.asarray(param),
                       jnp.asarray(kind))


def intersect_sphere_t(origin, direction, center, radius):
    """Returns the reference's ``t`` for one sphere against batched rays.

    origin/direction: (..., 3); center: (3,) or (..., 3); radius scalar/(...).
    t = -1 when the discriminant is negative (shader_sphere.wgsl:144-147).
    """
    oc = origin - center
    a = dot(direction, direction)
    b = 2.0 * dot(oc, direction)
    c = dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    # Double-where sqrt guard: forward-identical to sqrt(max(disc, 0))
    # (disc > 0 -> sqrt(disc); disc <= 0 -> 0), but the backward pass sees
    # sqrt(1) on non-positive lanes instead of d(sqrt)/dx|_0 = inf — without
    # it, miss lanes poison geometry/camera cotangents with 0*inf = NaN
    # (rt/grad differentiates through this t — shader_sphere.wgsl:136-155).
    pos = disc > 0.0
    sq = jnp.where(pos, jnp.sqrt(jnp.where(pos, disc, 1.0)), 0.0)
    t = (-b - sq) / (2.0 * a)
    return jnp.where(disc < 0.0, jnp.float32(-1.0), t)


def intersect_all_spheres(scene: SphereArray, origin, direction):
    """Closest-hit scan over the full padded scene buffer
    (shader_sphere.wgsl:218-229: linear loop, strict ``t < closest.t`` so the
    earliest index wins ties).

    Returns (t, hit_index): t == FLT_MAX where nothing was hit.
    """
    n = scene.count

    def body(i, carry):
        best_t, best_i = carry
        t = intersect_sphere_t(origin, direction, scene.center[i], scene.radius[i])
        better = (t > 0.0) & (t < best_t)
        return jnp.where(better, t, best_t), jnp.where(better, i, best_i)

    best_t = jnp.full(origin.shape[:-1], FLT_MAX, jnp.float32)
    best_i = jnp.full(origin.shape[:-1], -1, jnp.int32)
    best_t, best_i = jax.lax.fori_loop(0, n, body, (best_t, best_i))
    return best_t, best_i


def hit_record(scene: SphereArray, origin, direction, t, idx):
    """Recompute the HitRecord fields for the winning sphere
    (shader_sphere.wgsl:148-154).  idx is clamped for gather safety; callers
    must mask on t != FLT_MAX."""
    i = jnp.clip(idx, 0, scene.count - 1)
    center = scene.center[i]
    radius = scene.radius[i]
    # Miss lanes carry the t = FLT_MAX sentinel; FLT_MAX * d overflows to
    # inf and the downstream scatter's normalize(reflect(inf)) is NaN —
    # harmless in the forward pass (callers mask on t != FLT_MAX) but NaN
    # primals poison reverse-mode cotangents (0 * NaN).  Pin miss lanes to
    # t = 1: their hit-record values stay discarded, gradients stay finite.
    t_safe = jnp.where(t == FLT_MAX, jnp.float32(1.0), t)
    point = origin + t_safe[..., None] * direction
    normal = (point - center) / radius[..., None]
    front_face = dot(direction, normal) < 0.0
    normal = jnp.where(front_face[..., None], normal, -normal)
    return {
        "point": point,
        "normal": normal,
        "front_face": front_face,
        "albedo": scene.albedo[i],
        "mat_param": scene.mat_param[i],
        "mat_kind": scene.mat_kind[i],
    }
