from rt.grad.params import (CameraParams, SphereParams, TriangleParams,
                            apply_params, apply_tri_params,
                            camera_from_params, look_at_jnp)
from rt.grad.diff_render import render_image_diff, trace_diff
from rt.grad.loss import image_mse
from rt.grad.fd import finite_difference_check
from rt.grad.train import TrainStep, fit, fit_replay, make_train_step
from rt.grad.soft import (make_soft_geom_loss, make_soft_loss,
                          recover_camera, recover_geometry, soft_render)
from rt.grad.soft_tris import (OrbitParams, downsample, make_soft_tris_loss,
                               recover_camera_tris, recover_orbit_tris,
                               soft_render_tris)
from rt.grad.replay import (record_hits_oracle, record_hits_pallas,
                            replay_color, replay_loss_fn)

__all__ = [
    "CameraParams", "SphereParams", "TriangleParams", "apply_params",
    "apply_tri_params", "camera_from_params",
    "look_at_jnp", "render_image_diff", "trace_diff", "image_mse",
    "finite_difference_check", "TrainStep", "make_train_step", "fit",
    "fit_replay",
    "soft_render", "make_soft_loss", "make_soft_geom_loss",
    "recover_camera", "recover_geometry",
    "soft_render_tris", "make_soft_tris_loss", "recover_camera_tris",
    "recover_orbit_tris", "OrbitParams", "downsample",
    "record_hits_oracle", "record_hits_pallas", "replay_color",
    "replay_loss_fn",
]
