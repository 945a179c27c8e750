"""Inverse-rendering optimizer loop (BASELINE.json config 5): recover
camera / material parameters from a golden image by gradient descent.

The "training step" of this framework: render differentiably → image loss →
grads → optax update.  Under a device mesh (rt.dist) the render is pixel-
sharded, the loss mean triggers a psum over ICI, and parameters stay
replicated — classic data-parallel training with pixels as the batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from rt.config import RenderConfig
from rt.grad.diff_render import render_image_diff
from rt.grad.loss import image_mse
from rt.grad.params import (CameraParams, SphereParams, TriangleParams,
                            apply_params, apply_tri_params,
                            camera_from_params)


class TrainStep(NamedTuple):
    params: Any
    opt_state: Any
    loss: jnp.ndarray


def make_train_step(base_scene, base_camera, config: RenderConfig,
                    times: Sequence[int], optimizer: optax.GradientTransformation,
                    *, remat: bool = True) -> Callable:
    """Build the jitted step:  (params, opt_state, target) -> TrainStep.

    ``params`` is a dict with optional keys "scene" (SphereParams) and
    "camera" (CameraParams); absent keys stay frozen at the base values.
    """
    times = tuple(int(t) for t in times)

    def loss_fn(params, target):
        scene = base_scene
        if "scene" in params:
            sp = params["scene"]
            scene = (apply_tri_params(base_scene, sp)
                     if isinstance(sp, TriangleParams)
                     else apply_params(base_scene, sp))
        camera = camera_from_params(params.get("camera"), base_camera)
        img = render_image_diff(scene, camera, config, times, remat=remat)
        return image_mse(img, target)

    @jax.jit
    def step(params, opt_state, target) -> TrainStep:
        loss, grads = jax.value_and_grad(loss_fn)(params, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return TrainStep(params, opt_state, loss)

    return step


def fit(base_scene, base_camera, config: RenderConfig, target,
        *, times: Sequence[int] = (1000,), steps: int = 200,
        learning_rate: float = 2e-2, optimize_scene: bool = True,
        optimize_camera: bool = False,
        scene_fields=dict(albedo=True, mat_param=False),
        init_params: Optional[dict] = None, remat: bool = True,
        log_every: int = 0):
    """Run the recovery loop; returns (params, losses)."""
    params = {}
    if init_params:
        params.update(init_params)
    if optimize_scene and "scene" not in params:
        from rt.core.sphere import SphereArray
        if isinstance(base_scene, SphereArray):
            params["scene"] = SphereParams.from_scene(base_scene,
                                                      **scene_fields)
        else:
            params["scene"] = TriangleParams.from_scene(base_scene)
    if optimize_camera and "camera" not in params:
        raise ValueError("optimize_camera requires init_params['camera'] "
                         "(a CameraParams initial guess)")

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step = make_train_step(base_scene, base_camera, config, times, optimizer,
                           remat=remat)

    target = jnp.asarray(target, jnp.float32)
    losses = []
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, target)
        losses.append(float(loss))
        if log_every and (i + 1) % log_every == 0:
            print(f"  step {i+1}/{steps}: loss {losses[-1]:.6g}")
    return params, losses
