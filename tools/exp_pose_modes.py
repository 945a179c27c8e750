"""Sweep soft-stage settings for Suzanne pose recovery in ONE process
(the 1080p target renders once): loss_mode x lr x tau schedules.

Feeds tools/exp_config5_pose.py's final configuration.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_pose_modes.py
"""
from __future__ import annotations

import dataclasses
import sys
import time as time_mod

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from rt.grad.soft_tris import OrbitParams, downsample, recover_orbit_tris
    from rt.scene import scenes

    w, h = 1920, 1080
    platform = jax.devices()[0].platform
    backend = "pallas" if platform == "tpu" else "jax"
    sd = scenes.scene_suzanne(w, h)
    cfg = dataclasses.replace(sd.config, backend=backend, samples_per_frame=4)
    look_target = np.array([0.0, 0.0, -4.5], np.float32)
    true_eye = np.asarray(sd.camera.eye[:3], np.float32)
    fl, blur = float(sd.camera.focal_length), float(sd.camera.focal_blur)
    true_op = OrbitParams.from_eye(true_eye, look_target,
                                   float(sd.camera.fov))

    if backend == "pallas":
        from rt.kernels.dispatch import render_color
    else:
        from rt.render.renderer import render_color
    t0 = time_mod.perf_counter()
    target = jnp.asarray(np.asarray(
        render_color(sd.scene, sd.camera, cfg, jnp.uint32(1000))))
    print(f"target: {time_mod.perf_counter()-t0:.0f}s", flush=True)

    init_op = OrbitParams.create(float(true_op.radius),
                                 float(true_op.theta) + np.deg2rad(2.0),
                                 float(true_op.phi) + np.deg2rad(1.0),
                                 float(true_op.fov) + 0.02)
    bad_alb = sd.scene.mat_albedo.at[0].set(
        jnp.asarray([0.55, 0.25, 0.35], jnp.float32))
    bad_scene = sd.scene._replace(mat_albedo=bad_alb)

    def errs(op):
        return (np.rad2deg(abs(float(op.theta) - float(true_op.theta))),
                np.rad2deg(abs(float(op.phi) - float(true_op.phi))),
                abs(float(op.fov) - float(true_op.fov)))

    e0 = errs(init_op)
    print(f"init: dtheta {e0[0]:.3f} deg dphi {e0[1]:.3f} deg "
          f"dfov {e0[2]:.4f} rad", flush=True)

    for label, scale, mode, lr, taus, steps in [
        ("grad s4", 4, "grad", 6e-3, (0.06, 0.02, 0.008, 0.003), 240),
        ("mse+grad s4", 4, "mse+grad", 6e-3, (0.06, 0.02, 0.008, 0.003), 240),
        ("grad s4 lr3e-3", 4, "grad", 3e-3, (0.06, 0.02, 0.008, 0.003), 240),
        ("grad s2 fine", 2, "grad", 3e-3, (0.02, 0.008, 0.003, 0.0015), 240),
    ]:
        soft_cfg = dataclasses.replace(cfg, width=w // scale,
                                       height=h // scale, backend="jax")
        soft_target = downsample(target, scale)
        t0 = time_mod.perf_counter()
        try:
            rec, losses = recover_orbit_tris(
                bad_scene, soft_cfg, soft_target, init_op, look_target,
                focal_length=fl, focal_blur=blur, steps=steps,
                learning_rate=lr, taus=taus, loss_mode=mode, chunk=128)
        except Exception as ex:  # noqa: BLE001
            print(f"{label:20s} FAILED {type(ex).__name__}: {str(ex)[:120]}",
                  flush=True)
            continue
        e1 = errs(rec)
        dt = time_mod.perf_counter() - t0
        print(f"{label:20s} {dt:5.0f}s  dtheta {e1[0]:.4f} "
              f"({e0[0]/max(e1[0],1e-9):5.1f}x)  dphi {e1[1]:.4f} "
              f"({e0[1]/max(e1[1],1e-9):5.1f}x)  dfov {e1[2]:.5f} "
              f"({e0[2]/max(e1[2],1e-9):5.1f}x)  loss "
              f"{losses[0]:.2e}->{losses[-1]:.2e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
