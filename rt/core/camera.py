"""Camera model and primary-ray generation.

Replicates two reference constructs:

- the scene-authored ``Camera`` (src/scene/camera.rs:15-28): look-at basis with
  every basis vector stored as a vec4 with **w = 1.0**.  The WGSL ``make_ray``
  (shader_sphere.wgsl:123-135) then does ``normalize(x+y+z)`` on *vec4s*, so
  the w components (uv.x*k + uv.y*k + 1) participate in the normalization.
  This 4-D normalize measurably skews the projection and is baked into the
  golden images — replicated here verbatim.
- the interactive ``CameraUniform`` (src/camera_controller.rs:116-147) which
  instead uses **w = 0** for direction/up/right (plain 3-D behavior) and
  hardcodes focal_length=10, blur=0.

Ray generation replicates fs_main (shader_sphere.wgsl:252-258):
  seed   = (x * res.y + y) * time                    (u32 wrap)
  pos_aa = (x+0.5, y+0.5) + normalize(rng_vec2)      (unit first-quadrant jitter)
  uv     = (2 * pos_aa/(res-1) - 1) * (aspect, -1)
and make_ray's defocus sampling (random_on_disk consumes 3 draws even when
blur == 0 — stream position matters for golden parity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rt.core import rng as rng_mod
from rt.core.vecmath import normalize


class Camera(NamedTuple):
    """Pytree camera. vec4 fields keep their reference w components."""

    eye: jnp.ndarray        # (4,) f32
    direction: jnp.ndarray  # (4,) f32
    up: jnp.ndarray         # (4,) f32
    right: jnp.ndarray      # (4,) f32
    focal_length: jnp.ndarray  # () f32
    focal_blur: jnp.ndarray    # () f32
    fov: jnp.ndarray           # () f32


def look_at(eye, target, focal_length, focal_blur, fov) -> Camera:
    """Scene-authored camera — src/scene/camera.rs:15-28 (w = 1 everywhere).

    right = normalize(direction × +Y); up = normalize(right × direction).
    Computed in float32 to match glam.
    """
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    d = target - eye
    d = d / np.sqrt(np.sum(d * d, dtype=np.float32))
    r = np.cross(d, np.array([0, 1, 0], np.float32)).astype(np.float32)
    r = r / np.sqrt(np.sum(r * r, dtype=np.float32))
    u = np.cross(r, d).astype(np.float32)
    u = u / np.sqrt(np.sum(u * u, dtype=np.float32))
    ext = lambda v: jnp.asarray(np.append(v, np.float32(1.0)), jnp.float32)
    return Camera(
        eye=ext(eye), direction=ext(d), up=ext(u), right=ext(r),
        focal_length=jnp.float32(focal_length),
        focal_blur=jnp.float32(focal_blur),
        fov=jnp.float32(fov),
    )


def orbit_uniform(position, target, fov, focal_length=10.0, focal_blur=0.0) -> Camera:
    """Interactive-path camera — src/camera_controller.rs:116-129 (w = 0 on
    direction/up/right, w = 1 on eye; focal_length defaults to the
    controller's hardcoded 10.0, blur 0.0)."""
    position = np.asarray(position, np.float32)
    target = np.asarray(target, np.float32)
    f = target - position
    f = f / np.sqrt(np.sum(f * f, dtype=np.float32))
    r = np.cross(f, np.array([0, 1, 0], np.float32)).astype(np.float32)
    r = r / np.sqrt(np.sum(r * r, dtype=np.float32))
    u = np.cross(r, f).astype(np.float32)
    u = u / np.sqrt(np.sum(u * u, dtype=np.float32))
    return Camera(
        eye=jnp.asarray(np.append(position, np.float32(1.0))),
        direction=jnp.asarray(np.append(f, np.float32(0.0))),
        up=jnp.asarray(np.append(u, np.float32(0.0))),
        right=jnp.asarray(np.append(r, np.float32(0.0))),
        focal_length=jnp.float32(focal_length),
        focal_blur=jnp.float32(focal_blur),
        fov=jnp.float32(fov),
    )


def random_on_disk(state, radius):
    """shader_sphere.wgsl:118-122 — normalize(rng_vec2) * rng_float * radius.

    First-quadrant arc bias replicated.  Always consumes 3 draws.
    Returns (state, (..., 3) offset with z = 0).
    """
    state, v2 = rng_mod.next_vec2(state)
    v2 = normalize(v2)
    state, r = rng_mod.next_float(state)
    r = r * radius
    off = jnp.concatenate([v2 * r[..., None], jnp.zeros_like(r)[..., None]], axis=-1)
    return state, off


def make_ray(camera: Camera, uv, state, normalize_defocus_dir: bool):
    """shader_sphere.wgsl:123-135 / shader_tris.wgsl:136-148.

    uv: (..., 2).  Returns (state, origin(...,3), direction(...,3)).
    The vec4 normalize quirk: ``direction = normalize(x+y+z)`` where
    x/y/z are vec4s whose w components come straight from the camera struct.
    """
    k = jnp.tan(camera.fov * 0.5)
    d4 = (camera.right * (uv[..., 0] * k)[..., None]
          + camera.up * (uv[..., 1] * k)[..., None]
          + camera.direction)
    d4 = normalize(d4)  # 4-D normalize (w participates)
    o4 = jnp.broadcast_to(camera.eye, d4.shape)
    focus = o4 + d4 * camera.focal_length
    state, disk = random_on_disk(state, camera.focal_blur)
    o4 = o4 + jnp.concatenate([disk, jnp.ones_like(disk[..., :1])], axis=-1)
    d4 = focus - o4
    if normalize_defocus_dir:
        d4 = normalize(d4)  # tris shader: 4-D normalize again (wgsl:146)
    return state, o4[..., :3], d4[..., :3]


def generate_primary_rays(camera: Camera, width: int, height: int, time,
                          normalize_defocus_dir: bool):
    """Per-pixel seed + AA jitter + uv + make_ray for a (H, W) image.

    Returns (state(H,W) u32, origin(H,W,3), direction(H,W,3)).
    """
    y = jnp.arange(height, dtype=jnp.uint32)[:, None]
    x = jnp.arange(width, dtype=jnp.uint32)[None, :]
    state = rng_mod.seed(jnp.broadcast_to(x, (height, width)),
                         jnp.broadcast_to(y, (height, width)), height, time)
    pos = jnp.stack(
        [jnp.broadcast_to(x.astype(jnp.float32) + 0.5, (height, width)),
         jnp.broadcast_to(y.astype(jnp.float32) + 0.5, (height, width))],
        axis=-1)
    state, jitter = rng_mod.next_vec2(state)
    pos_aa = pos + normalize(jitter)
    res_minus_1 = jnp.array([width - 1, height - 1], jnp.float32)
    uv = pos_aa / res_minus_1
    aspect = jnp.float32(width) / jnp.float32(height)
    uv = (2.0 * uv - 1.0) * jnp.array([1.0, -1.0], jnp.float32) * jnp.stack([aspect, jnp.float32(1.0)])
    return make_ray(camera, uv, state, normalize_defocus_dir)
