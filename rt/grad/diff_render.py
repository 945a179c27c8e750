"""Differentiable render graph — the backward-capable twin of
rt/render/renderer.render_color.

The forward bounce loop (rt/core/trace.py, replicating shader_sphere.wgsl:
230-243) uses ``fori_loop``; here the loop is a ``lax.scan`` over bounces
with per-bounce ``jax.checkpoint``: the backward pass rematerializes each
bounce's intersections instead of storing every hit record, so backward
memory is O(1) in bounce depth — the "sequence parallel / long context"
analog called out in SURVEY.md §5 (the bounce path *is* the sequence).

Gradient semantics:
- RNG draws are uint32-derived floats: zero cotangent (the sampler is
  detached by construction) — decisions are frozen at their sampled values;
- `jnp.where` selections (hit mask, material arm, Schlick Bernoulli) pass
  gradients through the taken branch only;
- geometry gradients flow through the quadratic-root t, hit point, and
  normal; material gradients through albedo attenuation / fuzz / IOR.

Forward values are IDENTICAL to the non-diff path (same ops, same order), so
golden parity transfers; tests assert jnp.allclose against render_color.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rt.config import FLT_MAX, RenderConfig
from rt.core import camera as camera_mod
from rt.core import sphere as sphere_mod
from rt.core import triangle as triangle_mod
from rt.core.materials import scatter
from rt.core.trace import sky_color


def trace_diff(intersect_fn, hit_record_fn, state, origin, direction, *,
               bounces: int, normalize_reflect_in: bool, remat: bool = True,
               sky_from_final_dir: bool = False):
    """Differentiable bounce loop: scan + optional per-bounce checkpoint.

    Same carry/update semantics as rt.core.trace.trace (fori_loop body),
    including the masked-lane freeze on miss.

    sky_from_final_dir=True (RenderConfig extension) is what makes exact
    geometry/pose gradients non-trivial: it closes the continuous chain
    params -> t/normal -> reflect/refract -> final dir -> sky.  Under the
    reference transport (False) those gradients are structurally zero
    (tests/test_grad.py::test_sphere_geometry_grads_structurally_zero_in_reference_mode).
    """

    def body(carry, _):
        state, o, d, atten, active = carry
        t, idx = intersect_fn(o, d)
        hit_mask = active & (t != FLT_MAX)
        hit = hit_record_fn(o, d, t, idx)
        ns, no, nd = scatter(state, o, d, hit,
                             normalize_reflect_in=normalize_reflect_in)
        m3 = hit_mask[..., None]
        state = jnp.where(hit_mask, ns, state)
        o = jnp.where(m3, no, o)
        d = jnp.where(m3, nd, d)
        atten = jnp.where(m3, atten * hit["albedo"] * 0.7, atten)
        return (state, o, d, atten, hit_mask), None

    if remat:
        body = jax.checkpoint(body)

    atten = jnp.ones(origin.shape, jnp.float32)
    active = jnp.ones(origin.shape[:-1], jnp.bool_)
    carry = (state, origin, direction, atten, active)
    (state, _, d, atten, _), _ = jax.lax.scan(body, carry, None, length=bounces)
    return state, atten * sky_color(d if sky_from_final_dir else direction)


def render_color_diff(scene, camera, config: RenderConfig, time,
                      remat: bool = True):
    """One frame's (H, W, 3) color — differentiable w.r.t. scene arrays and
    camera fields.  Triangle scenes use the brute-force closest-hit scan
    (fori_loop over triangles with static count — differentiable), not the
    600-step while_loop BVH walk (while_loop has no reverse-mode rule)."""
    state, origin, direction = camera_mod.generate_primary_rays(
        camera, config.width, config.height, time,
        config.normalize_defocus_dir)

    if isinstance(scene, sphere_mod.SphereArray):
        intersect = partial(sphere_mod.intersect_all_spheres, scene)
        hit_rec = partial(sphere_mod.hit_record, scene)
    else:
        intersect = partial(triangle_mod.intersect_all_bruteforce, scene)
        hit_rec = partial(triangle_mod.hit_record, scene)

    color = jnp.zeros((config.height, config.width, 3), jnp.float32)
    for _ in range(config.samples_per_frame):
        state, c = trace_diff(intersect, hit_rec, state, origin, direction,
                              bounces=config.bounces,
                              normalize_reflect_in=config.normalize_reflect_in,
                              remat=remat,
                              sky_from_final_dir=config.sky_from_final_dir)
        color = color + c
    return color / config.samples_per_frame


def render_image_diff(scene, camera, config: RenderConfig, times,
                      remat: bool = True):
    """Multi-frame progressive render as one differentiable graph.

    ``times`` — a static tuple of RNG time uniforms (the test harness's
    1000, 1010, ... sequence).  Accumulates with the reference's EMA weights
    (frame f gets w = 1/(min(f, SAMPLE_FRAME)+1)) so the result matches a
    ProgressiveRenderer run over the same times exactly.
    """
    image = jnp.zeros((config.height, config.width, 3), jnp.float32)
    for f, t in enumerate(times):
        c = render_color_diff(scene, camera, config, jnp.uint32(t), remat=remat)
        w = 1.0 / (min(f, config.sample_frame) + 1.0)
        image = image + (c - image) * jnp.float32(w)
    return image
