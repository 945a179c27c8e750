"""Soft-visibility relaxation for TRIANGLE scenes — pose recovery on meshes.

The sphere surrogate (rt/grad/soft.py) owns pose/geometry recovery for
sphere scenes; this is its mesh twin, closing BASELINE config 5's camera
clause for Suzanne: the hard renderer's pose gradients are FD-correct but
useless for RECOVERY (the visible mismatch under a pose error is discrete
pixel reassignment — PERF.md r3 negative result), so pose is recovered on a
SMOOTH first-bounce approximation and materials are then polished with the
exact path-replay objective (rt/grad/train.fit_replay).

Per ray (soft rasterization in ray space, one Möller–Trumbore per
(ray, triangle) pair — shader_tris.wgsl:161-202's t/u/v reused as the
smooth quantities):

  margin_i = min(u_i, v_i, 1-u_i-v_i)            barycentric inside-ness
  cov_i    = sigmoid(margin_i / tau) * sigmoid(t_i / tau_depth)
  w_i      = cov_i * exp(-(t_i - shift) / tau_depth)   occlusion softmin
  color    = total_cov * (Σ w_i albedo_i / Σ w_i) * 0.7 * sky(d)
             + (1 - total_cov) * sky(d),   total_cov = clip(Σ cov_i, 0, 1)

As tau -> 0 this approaches the hard renderer's first bounce with the
scatter chain replaced by its sky factor — the same limit structure as the
sphere surrogate.  Defocus blur is ignored (shared eye origin): with a
single origin every M-T term factors into per-triangle constants dotted
with the ray direction, so a triangle chunk costs 3 einsums over (C, H, W)
— MXU-shaped work — instead of per-pixel cross products.

Differentiable everywhere w.r.t. camera pose/fov AND material albedos
(jointly), and vertices if made parameters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rt.config import RenderConfig
from rt.core import camera as camera_mod
from rt.core.trace import sky_color
from rt.core.triangle import TriangleScene


def soft_render_tris(scene: TriangleScene, camera, config: RenderConfig,
                     time, tau: float = 0.05, tau_depth: float = 0.5,
                     chunk: int = 128):
    """Smooth (H, W, 3) render of a triangle scene — differentiable w.r.t.
    camera and material albedos, everywhere.

    chunk: triangles per scan step — bounds the live (chunk, H, W) planes
    (memory), with the sums streamed across steps.
    """
    _, _, direction = camera_mod.generate_primary_rays(
        camera, config.width, config.height, time,
        config.normalize_defocus_dir)
    o = camera.eye[:3]                            # shared origin (no blur)
    d = direction                                 # (H, W, 3)

    # per-triangle constants (all M-T terms with a shared origin reduce to
    # dots of d against these):
    #   det = -d . n_raw;  u = -(d . se2)/det;  v = (d . q)/det;
    #   t = t_num/det   with  n_raw = e1 x e2, s = o - a,
    #                        se2 = s x e2, q = s x e1, t_num = e2 . q
    a = scene.a.astype(jnp.float32)
    e1 = scene.b.astype(jnp.float32) - a
    e2 = scene.c.astype(jnp.float32) - a
    n_raw = jnp.cross(e1, e2)
    s = o[None, :] - a
    se2 = jnp.cross(s, e2)
    q = jnp.cross(s, e1)
    t_num = jnp.sum(e2 * q, axis=-1)
    alb = scene.mat_albedo[
        jnp.clip(scene.mat_id, 0, scene.mat_albedo.shape[0] - 1)]

    m = a.shape[0]
    pad = (-m) % chunk
    if pad:
        z3 = jnp.zeros((pad, 3), jnp.float32)
        # padding triangles have n_raw = 0 -> det = 0 -> masked invalid
        n_raw = jnp.concatenate([n_raw, z3])
        se2 = jnp.concatenate([se2, z3])
        q = jnp.concatenate([q, z3])
        t_num = jnp.concatenate([t_num, jnp.zeros((pad,), jnp.float32)])
        alb = jnp.concatenate([alb, z3])
    n_chunks = (m + pad) // chunk
    xs = tuple(v.reshape(n_chunks, chunk, -1)
               for v in (n_raw, se2, q, t_num[:, None], alb))

    # occlusion weights are exp(-(t - shift)/tau_depth); the constant shift
    # cancels in the normalization and keeps magnitudes ~e^{+-few} around
    # the subject distance instead of underflowing at scene scale
    shift = camera.focal_length
    inv_tau = 1.0 / tau
    inv_td = 1.0 / tau_depth

    def body(carry, x):
        wsum, csum, covsum = carry
        n_c, se2_c, q_c, tn_c, alb_c = x
        det = -jnp.einsum("hwk,ck->chw", d, n_c)
        valid = jnp.abs(det) > 1e-12
        inv = 1.0 / jnp.where(valid, det, 1.0)
        u = -jnp.einsum("hwk,ck->chw", d, se2_c) * inv
        v = jnp.einsum("hwk,ck->chw", d, q_c) * inv
        t = tn_c[:, 0, None, None] * inv
        margin = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        cov = (jax.nn.sigmoid(margin * inv_tau)
               * jax.nn.sigmoid(t * inv_td)
               * valid.astype(jnp.float32))
        # clip the depth logit: near-parallel rays produce huge |t| whose
        # exp would inf/underflow; the clamp only binds far from any
        # optimum (cov there is ~0 anyway)
        wgt = cov * jnp.exp(jnp.clip(-(t - shift) * inv_td, -30.0, 30.0))
        return (wsum + jnp.sum(wgt, axis=0),
                csum + jnp.einsum("chw,cz->hwz", wgt, alb_c),
                covsum + jnp.sum(cov, axis=0)), None

    h, w = config.height, config.width
    zero = jnp.zeros((h, w), jnp.float32)
    (wsum, csum, covsum), _ = jax.lax.scan(
        body, (zero, jnp.zeros((h, w, 3), jnp.float32), zero), xs)

    sky = sky_color(d)
    total_cov = jnp.clip(covsum, 0.0, 1.0)
    mean_alb = csum / (wsum[..., None] + 1e-9)
    surf = mean_alb * 0.7 * sky * total_cov[..., None]
    return surf + (1.0 - total_cov)[..., None] * sky


def downsample(img, factor: int):
    """Average-pool (H, W, 3) by ``factor`` — the pose stage runs at reduced
    resolution (silhouettes don't need 1080p) and pooling also denoises the
    Monte-Carlo target."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape[0] // factor * factor, img.shape[1] // factor * factor
    img = img[:h, :w]
    return img.reshape(h // factor, factor, w // factor, factor,
                       img.shape[-1]).mean(axis=(1, 3))


def make_soft_tris_loss(scene: TriangleScene, config: RenderConfig, target,
                        time=1000, tau: float = 0.05, tau_depth: float = 0.5,
                        chunk: int = 128):
    """loss(camera_params, mat_albedo|None) -> scalar vs an (H, W, 3) target
    (typically the exact render at the true pose, downsampled to the soft
    resolution)."""
    from rt.grad.params import look_at_jnp

    target = jnp.asarray(target, jnp.float32)
    t = jnp.uint32(time)

    @jax.jit
    def loss(cp, mat_albedo=None):
        sc = scene if mat_albedo is None else scene._replace(
            mat_albedo=mat_albedo)
        img = soft_render_tris(sc, look_at_jnp(cp), config, t, tau=tau,
                               tau_depth=tau_depth, chunk=chunk)
        diff = img - target
        return jnp.mean(diff * diff)

    return loss


def recover_camera_tris(scene: TriangleScene, config: RenderConfig, target,
                        init_params, *, steps: int = 150,
                        learning_rate: float = 2e-2,
                        taus=(0.15, 0.05, 0.02), time=1000,
                        tau_depth: float = 0.5,
                        optimize_fields=("eye", "fov"),
                        optimize_albedo: bool = False, chunk: int = 128,
                        log_every: int = 0):
    """Annealed mesh-scene pose recovery: coarse-to-fine tau on the soft
    surrogate; optionally recovers material albedos jointly.  Returns
    (CameraParams, mat_albedo or None, losses).

    ``optimize_fields`` freezes the rest of the pose (the full camera
    parameterization is gauge-ambiguous — same policy as the sphere
    surrogate's recover_camera)."""
    import optax

    fields = set(optimize_fields)
    mask = type(init_params)(
        **{f: (f in fields) for f in init_params._fields})

    cp = init_params
    albedo = scene.mat_albedo if optimize_albedo else None
    losses = []
    for tau in taus:
        loss = make_soft_tris_loss(scene, config, target, time=time, tau=tau,
                                   tau_depth=tau_depth, chunk=chunk)
        params = (cp, albedo) if optimize_albedo else (cp,)
        opt = optax.adam(learning_rate)
        st = opt.init(params)
        grad = jax.jit(jax.value_and_grad(
            lambda p: loss(*p) if optimize_albedo else loss(p[0])))
        for i in range(steps // len(taus)):
            l, g = grad(params)
            gcp = jax.tree_util.tree_map(
                lambda gi, mi: gi if mi else jnp.zeros_like(gi), g[0], mask)
            g = (gcp,) + g[1:]
            upd, st = opt.update(g, st, params)
            params = optax.apply_updates(params, upd)
            losses.append(float(l))
            if log_every and (i + 1) % log_every == 0:
                print(f"  tau={tau} step {i+1}: loss {losses[-1]:.3e}")
        cp = params[0]
        if optimize_albedo:
            albedo = params[1]
    return cp, albedo, losses
