"""BASELINE config 5, camera clause — end-to-end pose + albedo recovery on
Suzanne at 1920x1080.

Pipeline (the production inverse-rendering recipe):
  1. target  = exact Pallas render at the TRUE pose (unknown to the solver);
  2. perturb = orbit the eye by --yaw/--pitch degrees around the look-at
     target (the reference's OrbitCamera dof, src/camera_controller.rs:59-70),
     shift fov by --dfov rad, and corrupt the Suzanne material albedo;
  3. soft stage: annealed pose (+ albedo) recovery on the triangle
     soft-visibility surrogate (rt/grad/soft_tris.py) at --soft-scale
     downsampled resolution;
  4. polish stage: rt.grad.train.fit_replay albedo recovery at FULL
     1920x1080 with the recovered pose (path-replay backprop — pose stays
     fixed; replay pose recovery is a documented negative result, PERF.md).

Prints pose errors (eye angle deg, fov rad) and albedo error before/after —
the config-5 acceptance numbers for PERF.md.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/exp_config5_pose.py
       [--size 1920x1080] [--soft-scale 4] [--yaw 2.0] [--pitch 1.0]
       [--dfov 0.02] [--soft-steps 240] [--polish-steps 24] [--spp 4]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time as time_mod

import numpy as np


def orbit_perturb(eye, target, yaw_deg, pitch_deg):
    """Rotate eye about the look-at target: yaw about +Y, then pitch about
    the local right axis — the OrbitCamera's (theta, phi) increments."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    v = eye - target
    cy, sy = np.cos(np.deg2rad(yaw_deg)), np.sin(np.deg2rad(yaw_deg))
    v = np.array([cy * v[0] + sy * v[2], v[1], -sy * v[0] + cy * v[2]])
    right = np.cross(v / np.linalg.norm(v), [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    cp, sp = np.cos(np.deg2rad(pitch_deg)), np.sin(np.deg2rad(pitch_deg))
    # Rodrigues about `right`
    v = (v * cp + np.cross(right, v) * sp
         + right * np.dot(right, v) * (1 - cp))
    return (target + v).astype(np.float32)


def eye_angle_deg(eye_a, eye_b, target):
    va = np.asarray(eye_a, np.float64) - target
    vb = np.asarray(eye_b, np.float64) - target
    c = np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
    return float(np.rad2deg(np.arccos(np.clip(c, -1.0, 1.0))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1920x1080")
    p.add_argument("--soft-scale", type=int, default=4)
    p.add_argument("--yaw", type=float, default=2.0)
    p.add_argument("--pitch", type=float, default=1.0)
    p.add_argument("--dfov", type=float, default=0.02)
    p.add_argument("--soft-steps", type=int, default=240)
    p.add_argument("--polish-steps", type=int, default=24)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--lr", type=float, default=8e-3)
    p.add_argument("--taus", default="0.1,0.04,0.015,0.006")
    p.add_argument("--joint-albedo", action="store_true",
                   help="also optimize albedo in the soft stage (measured: "
                        "the soft color model biases albedo, so default is "
                        "pose-only soft + albedo in the replay polish)")
    p.add_argument("--backend", default="auto")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rt.grad import (CameraParams, look_at_jnp, recover_camera_tris)
    from rt.grad.soft_tris import downsample
    from rt.grad.train import fit_replay
    from rt.scene import scenes

    w, h = (int(v) for v in args.size.lower().split("x"))
    platform = jax.devices()[0].platform
    backend = args.backend
    if backend == "auto":
        backend = "pallas" if platform == "tpu" else "jax"
    print(f"platform={platform} backend={backend} {w}x{h}", flush=True)

    sd = scenes.scene_suzanne(w, h)
    cfg = dataclasses.replace(sd.config, backend=backend,
                              samples_per_frame=args.spp)

    # true pose: the scene's own camera inputs (scene_tris.rs:146-152)
    look_target = np.array([0.0, 0.0, -4.5], np.float32)
    true_eye = np.asarray(sd.camera.eye[:3], np.float32)
    true_cp = CameraParams.create(true_eye, look_target,
                                  float(sd.camera.focal_length),
                                  float(sd.camera.focal_blur),
                                  float(sd.camera.fov))

    # ---- 1. exact target at the true pose ------------------------------
    if backend == "pallas":
        from rt.kernels.dispatch import render_color
    else:
        from rt.render.renderer import render_color
    t0 = time_mod.perf_counter()
    target = render_color(sd.scene, sd.camera, cfg, jnp.uint32(1000))
    target = jnp.asarray(np.asarray(target))
    print(f"target render: {time_mod.perf_counter()-t0:.1f}s", flush=True)

    # ---- 2. perturb pose + albedo --------------------------------------
    bad_eye = orbit_perturb(true_eye, look_target, args.yaw, args.pitch)
    init_cp = true_cp._replace(eye=jnp.asarray(bad_eye),
                               fov=true_cp.fov + args.dfov)
    true_alb = sd.scene.mat_albedo
    bad_alb = true_alb.at[0].set(jnp.asarray([0.55, 0.25, 0.35], jnp.float32))
    bad_scene = sd.scene._replace(mat_albedo=bad_alb)

    err_deg0 = eye_angle_deg(bad_eye, true_eye, look_target)
    err_fov0 = abs(float(init_cp.fov) - float(true_cp.fov))
    err_alb0 = float(jnp.abs(bad_alb - true_alb).max())
    print(f"perturbation: eye {err_deg0:.3f} deg, fov {err_fov0:.4f} rad, "
          f"albedo {err_alb0:.3f}", flush=True)

    # ---- 3. soft pose (+ albedo) recovery at reduced res ----------------
    f = args.soft_scale
    soft_cfg = dataclasses.replace(cfg, width=w // f, height=h // f,
                                   backend="jax")
    soft_target = downsample(target, f)
    taus = tuple(float(v) for v in args.taus.split(","))
    t0 = time_mod.perf_counter()
    rec_cp, rec_alb, losses = recover_camera_tris(
        bad_scene, soft_cfg, soft_target, init_cp, steps=args.soft_steps,
        learning_rate=args.lr, taus=taus, optimize_fields=("eye", "fov"),
        optimize_albedo=args.joint_albedo, chunk=128,
        log_every=max(1, args.soft_steps // (len(taus) * 6)))
    dt_soft = time_mod.perf_counter() - t0

    err_deg1 = eye_angle_deg(np.asarray(rec_cp.eye), true_eye, look_target)
    err_fov1 = abs(float(rec_cp.fov) - float(true_cp.fov))
    print(f"soft stage ({dt_soft:.1f}s, {len(losses)} steps, "
          f"loss {losses[0]:.3e} -> {losses[-1]:.3e}):", flush=True)
    print(f"  eye angle: {err_deg0:.3f} -> {err_deg1:.4f} deg "
          f"({err_deg0/max(err_deg1,1e-9):.1f}x)", flush=True)
    print(f"  fov:       {err_fov0:.4f} -> {err_fov1:.5f} rad "
          f"({err_fov0/max(err_fov1,1e-9):.1f}x)", flush=True)

    # ---- 4. replay polish: albedo at FULL resolution, recovered pose ----
    rec_scene = sd.scene._replace(
        mat_albedo=rec_alb if rec_alb is not None else bad_alb)
    rec_camera = look_at_jnp(rec_cp)
    t0 = time_mod.perf_counter()
    params, plosses = fit_replay(
        rec_scene, rec_camera, cfg, target, steps=args.polish_steps,
        rerecord_every=8, learning_rate=5e-2)
    dt_pol = time_mod.perf_counter() - t0
    fin_alb = params["scene"].mat_albedo
    err_alb_soft = float(jnp.abs(
        (rec_alb if rec_alb is not None else bad_alb) - true_alb).max())
    err_alb1 = float(jnp.abs(fin_alb - true_alb).max())
    print(f"replay polish ({dt_pol:.1f}s, {args.polish_steps} steps at "
          f"{w}x{h}, loss {plosses[0]:.3e} -> {plosses[-1]:.3e}):",
          flush=True)
    print(f"  albedo max err: {err_alb0:.3f} (perturbed) -> "
          f"{err_alb_soft:.3f} (soft) -> {err_alb1:.4f} (polish, "
          f"{err_alb0/max(err_alb1,1e-9):.0f}x)", flush=True)

    ok = (err_deg1 <= err_deg0 / 10 and err_fov1 <= err_fov0 / 10
          and err_alb1 <= err_alb0 / 10)
    print(f"config5 camera clause: pose+fov+albedo all >=10x reduced: {ok}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
