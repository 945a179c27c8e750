"""Small vector-math helpers shared by the oracle renderer and Pallas kernels.

Vectors are ``(..., 3)`` or ``(..., 4)`` float32 arrays; every function is
elementwise over leading dims, so the same code runs vmapped over a flat pixel
array (oracle) or over an (8, 128) lane tile (Pallas).

Replicates WGSL built-ins where their semantics matter:
- ``normalize`` = v / length(v), no zero guard (NaN on zero input, same as GPU).
- ``mix(a, b, t)`` = a*(1-t) + b*t, UNCLAMPED — the reference relies on
  extrapolation for the sky gradient (shader_sphere.wgsl:241 with an
  unnormalized primary direction whose |y| can exceed 1).
- ``reflect`` / ``refract`` / Schlick per shader_sphere.wgsl:156-171.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(v):
    return jnp.sqrt(dot(v, v))


def normalize(v):
    return v / length(v)[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def mix(a, b, t):
    """WGSL mix: a*(1-t) + b*t, unclamped (extrapolates)."""
    return a * (1.0 - t) + b * t


def reflect(v, n):
    """shader_sphere.wgsl:156-158: v - 2*dot(v,n)*n."""
    return v - 2.0 * dot(v, n)[..., None] * n


def refract(uv, n, etai_over_etat):
    """shader_sphere.wgsl:159-165 (input may be unnormalized, as in the ref).

    The perp-length sqrt is double-where guarded: forward-identical to
    length(r_out_perp) (sqrt(x) for x > 0, 0 at x == 0), but reverse-mode
    sees sqrt(1) on the zero lanes — a ray exactly antiparallel to the
    normal makes r_out_perp == 0, whose d(sqrt)/dx = inf otherwise poisons
    geometry/pose cotangents (0 * inf = NaN) even on lanes whose scatter
    output is masked away (rt/grad differentiates through this arm)."""
    cos_theta = jnp.minimum(dot(-uv, n), 1.0)
    r_out_perp = etai_over_etat[..., None] * (uv + cos_theta[..., None] * n)
    lnsq = dot(r_out_perp, r_out_perp)
    pos = lnsq > 0.0
    ln = jnp.where(pos, jnp.sqrt(jnp.where(pos, lnsq, 1.0)), 0.0)
    # same guard for the parallel term: d(sqrt(abs(x)))/dx at x == 0 is
    # inf * sign(0) = NaN in reverse mode (even with a zero cotangent);
    # x == 0 happens for rays exactly antiparallel to the normal (ln == 0,
    # x == 1 is fine — the hazard is ln == 1, grazing incidence on unit d).
    x = 1.0 - ln * ln
    nz = x != 0.0
    sq = jnp.where(nz, jnp.sqrt(jnp.abs(jnp.where(nz, x, 1.0))), 0.0)
    return r_out_perp - sq[..., None] * n


def schlick_reflectance(cosine, ref_idx):
    """shader_sphere.wgsl:166-171."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def fract(x):
    """WGSL fract: x - floor(x)."""
    return x - jnp.floor(x)
