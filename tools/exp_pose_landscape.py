"""Probe the soft-loss landscape around the TRUE Suzanne pose: loss vs
theta / phi / fov offsets, per loss_mode and tau — decides whether the
recovery failures are landscape (no minimum at truth) or optimization
(schedule/lr) problems.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_pose_landscape.py
"""
from __future__ import annotations

import dataclasses
import sys
import time as time_mod

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from rt.grad.soft_tris import (OrbitParams, downsample,
                                   make_soft_tris_loss)
    from rt.scene import scenes

    w, h = 1920, 1080
    platform = jax.devices()[0].platform
    backend = "pallas" if platform == "tpu" else "jax"
    sd = scenes.scene_suzanne(w, h)
    cfg = dataclasses.replace(sd.config, backend=backend, samples_per_frame=16)
    look_target = np.array([0.0, 0.0, -4.5], np.float32)
    fl, blur = float(sd.camera.focal_length), float(sd.camera.focal_blur)
    true_op = OrbitParams.from_eye(np.asarray(sd.camera.eye[:3]), look_target,
                                   float(sd.camera.fov))

    if backend == "pallas":
        from rt.kernels.dispatch import render_color
    else:
        from rt.render.renderer import render_color
    t0 = time_mod.perf_counter()
    target = jnp.asarray(np.asarray(
        render_color(sd.scene, sd.camera, cfg, jnp.uint32(1000))))
    print(f"target: {time_mod.perf_counter()-t0:.0f}s", flush=True)

    scale = 4
    soft_cfg = dataclasses.replace(cfg, width=w // scale, height=h // scale,
                                   backend="jax")
    soft_target = downsample(target, scale)
    bad_alb = sd.scene.mat_albedo.at[0].set(
        jnp.asarray([0.55, 0.25, 0.35], jnp.float32))
    bad_scene = sd.scene._replace(mat_albedo=bad_alb)

    # ROI: soft coverage of the subject meshes (all but the room, mat 4)
    # at a POSE-PERTURBED camera (the solver only has the init guess)
    from rt.grad.params import look_at_jnp
    from rt.grad.soft_tris import subject_roi
    init_op = OrbitParams.create(float(true_op.radius),
                                 float(true_op.theta) + np.deg2rad(2.0),
                                 float(true_op.phi) + np.deg2rad(1.0),
                                 float(true_op.fov) + 0.02)
    init_cam = look_at_jnp(init_op.to_camera_params(look_target, fl, blur))
    roi = subject_roi(bad_scene, init_cam, soft_cfg,
                      subject_mat_ids=(0, 1, 2, 3), dilate=41)
    print(f"roi frac: {float(roi.mean()):.3f}", flush=True)

    offs = [-3.0, -2.0, -1.0, -0.5, -0.2, 0.0, 0.2, 0.5, 1.0, 2.0, 3.0]
    for label, sc_probe, mode, pool in (
            ("bad-alb", bad_scene, "grad", 2),
            ("bad-alb", bad_scene, "mse", 1)):
        for tau in (0.004, 0.002, 0.001):
            loss0 = make_soft_tris_loss(sc_probe, soft_cfg, soft_target,
                                        tau=tau, loss_mode=mode,
                                        grad_pool=pool, full_res=(h, w))
            for field in ("theta", "phi"):
                row = []
                for o in offs:
                    op = true_op._replace(**{
                        field: getattr(true_op, field) + np.deg2rad(o)})
                    l = float(loss0(op.to_camera_params(look_target, fl,
                                                        blur)))
                    row.append(f"{l:.4e}")
                print(f"{label} {mode:4s} p{pool} tau={tau:<6} {field:5s}: " + " ".join(row), flush=True)
            row = []
            for o in offs:
                op = true_op._replace(fov=true_op.fov + np.deg2rad(o))
                l = float(loss0(op.to_camera_params(look_target, fl, blur)))
                row.append(f"{l:.4e}")
            print(f"{label} {mode:4s} p{pool} tau={tau:<6} fov  : " + " ".join(row), flush=True)
    print("offsets(deg):", offs, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
