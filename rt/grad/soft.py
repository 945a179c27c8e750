"""Soft-visibility relaxation for pose/geometry recovery.

The hard renderer's camera/geometry gradients are structurally confined to
the sky term: with the reference's transport (color = Π albedo·0.7 ×
sky(primary_dir), shader_sphere.wgsl:230-243), *which* sphere a ray hits is
a discrete event, so detached-sampling autodiff cannot see visibility edges
(tests/test_grad.py::test_camera_geometry_grads_are_structurally_sky_only).

This module is the standard differentiable-rendering answer (soft
rasterization / SDF blending): a SMOOTH single-bounce approximation of the
same transport whose visibility is a sigmoid of the ray-sphere signed
distance and whose occlusion is a softmin over hit depths.  It is used ONLY
as the optimization surrogate — optimize pose/geometry on the soft render
(annealing tau), then validate/polish against the exact renderer.

color(ray) = Σ_i α_i · albedo_i·0.7·sky(d) + (1−Σ_i α_i) · sky(d)
  cov_i = sigmoid((r_i − dist_i(ray)) / (tau·r_i))    visibility edge
  α     = cov weighted by softmax(−t_i / tau_depth)   occlusion ordering

As tau → 0 this approaches the hard renderer's first-bounce image (with
hemisphere scattering replaced by its mean — the sky factor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rt.config import RenderConfig
from rt.core import camera as camera_mod
from rt.core.sphere import SphereArray
from rt.core.trace import sky_color
from rt.core.vecmath import dot


def soft_render(scene: SphereArray, camera, config: RenderConfig, time,
                tau: float = 0.05, tau_depth: float = 0.5):
    """Smooth (H, W, 3) render — differentiable w.r.t. camera AND sphere
    centers/radii/albedos, everywhere."""
    _, origin, direction = camera_mod.generate_primary_rays(
        camera, config.width, config.height, time,
        config.normalize_defocus_dir)

    d2 = dot(direction, direction)
    oc = scene.center[:, None, None, :] - origin[None]      # (N, H, W, 3)
    t_ca = jnp.einsum("nhwc,hwc->nhw", oc, direction) / d2  # depth along ray
    closest = origin[None] + t_ca[..., None] * direction[None]
    dist = jnp.sqrt(jnp.sum((closest - scene.center[:, None, None, :]) ** 2,
                            axis=-1) + 1e-12)

    r = scene.radius[:, None, None]
    # visibility: smooth in (r - dist); behind-camera spheres fade out
    cov = jax.nn.sigmoid((r - dist) / (tau * jnp.maximum(r, 1e-3)))
    cov = cov * jax.nn.sigmoid(t_ca / tau_depth)

    # occlusion: nearer surfaces dominate (softmin over depth among covered)
    depth_logit = -t_ca / tau_depth + jnp.log(cov + 1e-9)
    w = jax.nn.softmax(depth_logit, axis=0)
    total_cov = jnp.clip(jnp.sum(cov, axis=0), 0.0, 1.0)
    alpha = w * total_cov[None]                              # (N, H, W)

    sky = sky_color(direction)                               # (H, W, 3)
    surf = jnp.einsum("nhw,nc->hwc", alpha, scene.albedo * 0.7) * sky
    return surf + (1.0 - total_cov)[..., None] * sky


def make_soft_loss(scene: SphereArray, config: RenderConfig, target,
                   time=1000, tau: float = 0.05, tau_depth: float = 0.5):
    """loss(camera_params) -> scalar; target is any (H, W, 3) image
    (typically the exact renderer's output at the true pose)."""
    from rt.grad.params import look_at_jnp

    target = jnp.asarray(target, jnp.float32)
    t = jnp.uint32(time)

    @jax.jit
    def loss(cp):
        img = soft_render(scene, look_at_jnp(cp), config, t, tau=tau,
                          tau_depth=tau_depth)
        d = img - target
        return jnp.mean(d * d)

    return loss


def make_soft_geom_loss(base_scene: SphereArray, camera, config: RenderConfig,
                        target, time=1000, tau: float = 0.05,
                        tau_depth: float = 0.5):
    """loss(SphereParams) -> scalar: the geometry twin of make_soft_loss —
    differentiable in sphere centers/radii (and albedos) EVERYWHERE,
    including across silhouettes (the hard renderer's geometry gradients
    are structurally zero under the reference transport; see
    RenderConfig.sky_from_final_dir for the exact-transport alternative)."""
    from rt.grad.params import apply_params

    target = jnp.asarray(target, jnp.float32)
    t = jnp.uint32(time)

    @jax.jit
    def loss(p):
        sc = apply_params(base_scene, p)
        img = soft_render(sc, camera, config, t, tau=tau,
                          tau_depth=tau_depth)
        d = img - target
        return jnp.mean(d * d)

    return loss


def recover_geometry(scene: SphereArray, camera, config: RenderConfig,
                     target, init_params, *, sphere_index: int,
                     steps: int = 180, learning_rate: float = 3e-2,
                     taus=(0.2, 0.05, 0.02), time=1000):
    """Annealed geometry recovery: optimize ONE sphere's center/radius on
    the soft surrogate, coarse-to-fine tau.  Returns (SphereParams, losses).

    Only the ``sphere_index`` row receives gradient — the rest of the scene
    is treated as known (the identifiable single-object recovery task of
    BASELINE config 5's geometry clause)."""
    import optax

    params = init_params
    losses = []
    for tau in taus:
        loss = make_soft_geom_loss(scene, camera, config, target, time=time,
                                   tau=tau)
        opt = optax.adam(learning_rate)
        st = opt.init(params)
        grad = jax.jit(jax.value_and_grad(loss))
        for _ in range(steps // len(taus)):
            l, g = grad(params)
            g = jax.tree_util.tree_map(
                lambda gi: gi * jnp.zeros(gi.shape[:1], gi.dtype)
                                 .at[sphere_index].set(1.0)
                                 .reshape((-1,) + (1,) * (gi.ndim - 1)), g)
            upd, st = opt.update(g, st, params)
            params = optax.apply_updates(params, upd)
            losses.append(float(l))
    return params, losses


def recover_camera(scene: SphereArray, config: RenderConfig, target,
                   init_params, *, steps: int = 200, learning_rate: float = 3e-2,
                   taus=(0.2, 0.05, 0.02), time=1000,
                   optimize_fields=("eye",), log_every: int = 0):
    """Annealed pose recovery: coarse-to-fine tau schedule on the soft
    surrogate.  Returns (CameraParams, losses).

    ``optimize_fields`` freezes the rest of the pose — the full
    (eye, target, fov, focal) parameterization is gauge-ambiguous (many
    combinations render the same image), so identifiable recovery means
    choosing which degrees of freedom are unknown.
    """
    import optax

    fields = set(optimize_fields)
    mask = type(init_params)(
        **{f: (f in fields) for f in init_params._fields})

    params = init_params
    losses = []
    for tau in taus:
        loss = make_soft_loss(scene, config, target, time=time, tau=tau)
        opt = optax.adam(learning_rate)
        st = opt.init(params)
        grad = jax.jit(jax.value_and_grad(loss))
        for i in range(steps // len(taus)):
            l, g = grad(params)
            g = jax.tree_util.tree_map(
                lambda gi, mi: gi if mi else jnp.zeros_like(gi), g, mask)
            upd, st = opt.update(g, st, params)
            params = optax.apply_updates(params, upd)
            losses.append(float(l))
            if log_every and (i + 1) % log_every == 0:
                print(f"  tau={tau} step {i+1}: loss {losses[-1]:.3e}")
    return params, losses
