"""Path-replay backprop tests (rt/grad/replay.py — the TPU-fast
differentiable path): recorder parity, replay-forward parity, and gradient
equality with the full differentiable renderer at the recording point."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rt.grad import SphereParams, apply_params, image_mse
from rt.grad.diff_render import render_color_diff
from rt.grad.replay import (record_hits_oracle, record_hits_pallas,
                            replay_color, replay_loss_fn)
from rt.render.renderer import render_color
from rt.scene import scenes

W, H = 64, 32


def _cfg(sd, bounces=3, **kw):
    return dataclasses.replace(
        sd, config=dataclasses.replace(sd.config, bounces=bounces, **kw))


def test_record_oracle_color_matches_forward():
    sd = _cfg(scenes.test_scene_metal(W, H))
    t = jnp.uint32(1000)
    color, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    ref = render_color(sd.scene, sd.camera, sd.config, t)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref),
                               atol=1e-6, rtol=0)
    assert hits.shape == (3, H, W)
    assert int(hits.max()) >= 0 and int(hits.min()) == -1


@pytest.mark.parametrize("builder", [scenes.test_scene_metal,
                                     scenes.test_scene_complex])
def test_replay_forward_matches_oracle_spheres(builder):
    """Replaying the recorded hit stream reproduces the forward render —
    the same (t, normal, scatter) chain restricted to the known winner."""
    sd = _cfg(builder(W, H))
    t = jnp.uint32(1000)
    ref, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    img = replay_color(sd.scene, sd.camera, sd.config, t, hits)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_replay_forward_matches_oracle_triangles():
    sd = _cfg(scenes.scene_cube(W, H), bounces=2)
    t = jnp.uint32(1000)
    ref, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    img = replay_color(sd.scene, sd.camera, sd.config, t, hits)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_record_pallas_matches_oracle_spheres():
    """The recording kernel's color equals the render kernel's exactly, and
    its hit ids agree with the oracle's except FMA-contraction branch flips
    (bounded like the kernel parity tests)."""
    from rt.kernels.dispatch import render_color as k_render
    sd = _cfg(scenes.test_scene_metal(W, H))
    t = jnp.uint32(1000)
    color, hits = record_hits_pallas(sd.scene, sd.camera, sd.config, t,
                                     interpret=True)
    kcolor = k_render(sd.scene, sd.camera, sd.config, t, interpret=True)
    np.testing.assert_array_equal(np.asarray(color), np.asarray(kcolor))
    _, ohits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    agree = (np.asarray(hits) == np.asarray(ohits)).mean()
    assert agree > 0.95, f"hit-id agreement {agree:.3f}"


def test_record_pallas_matches_oracle_triangles():
    from rt.kernels.dispatch import render_color as k_render
    sd = _cfg(scenes.scene_cube(W, H), bounces=2)
    t = jnp.uint32(1000)
    color, hits = record_hits_pallas(sd.scene, sd.camera, sd.config, t,
                                     interpret=True)
    cfg_m = dataclasses.replace(sd.config, backend="pallas_mono")
    kcolor = k_render(sd.scene, sd.camera, cfg_m, t, interpret=True)
    np.testing.assert_array_equal(np.asarray(color), np.asarray(kcolor))
    _, ohits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    agree = (np.asarray(hits) == np.asarray(ohits)).mean()
    assert agree > 0.95, f"hit-id agreement {agree:.3f}"


def test_record_pallas_wave_matches_mono():
    """The wavefront recorder (large-mesh path) agrees with the monolithic
    recorder: bit-identical color (the wave==mono invariant extends to the
    recording variants) and the same hit-id streams up to measure-zero
    cross-chunk exact-t ties (none on this scene)."""
    sd = _cfg(scenes.scene_cube(W, H), bounces=3)
    t = jnp.uint32(1000)
    c_m, i_m = record_hits_pallas(sd.scene, sd.camera, sd.config, t,
                                  interpret=True, tris_backend="mono")
    c_w, i_w = record_hits_pallas(sd.scene, sd.camera, sd.config, t,
                                  interpret=True, tris_backend="wave")
    np.testing.assert_array_equal(np.asarray(c_w), np.asarray(c_m))
    np.testing.assert_array_equal(np.asarray(i_w), np.asarray(i_m))


def test_replay_from_wave_record_matches_forward():
    """Replaying the WAVE-recorded hit stream reproduces the kernel color —
    the end-to-end contract the large-mesh differentiable path rests on."""
    sd = _cfg(scenes.scene_cube(W, H), bounces=2)
    t = jnp.uint32(1000)
    color, hits = record_hits_pallas(sd.scene, sd.camera, sd.config, t,
                                     interpret=True, tris_backend="wave")
    img = replay_color(sd.scene, sd.camera, sd.config, t, hits)
    np.testing.assert_allclose(np.asarray(img), np.asarray(color),
                               atol=2e-5, rtol=0)


def test_replay_frozen_geometry_equals_in_graph():
    """The frozen-geometry fast path (triangle rows pre-gathered as scan
    inputs / loss-closure constants) is bit-equal to the in-graph gather in
    the forward, and material + camera gradients agree."""
    from rt.grad import CameraParams, TriangleParams
    sd = _cfg(scenes.scene_cube(W, H), bounces=3)
    t = jnp.uint32(1000)
    target, hits = record_hits_oracle(sd.scene, sd.camera, sd.config,
                                      jnp.uint32(2000))
    img_f = replay_color(sd.scene, sd.camera, sd.config, t, hits,
                         frozen_geometry=True)
    img_g = replay_color(sd.scene, sd.camera, sd.config, t, hits,
                         frozen_geometry=False)
    np.testing.assert_array_equal(np.asarray(img_f), np.asarray(img_g))

    cp = CameraParams.create(np.asarray(sd.camera.eye[:3]),
                             np.asarray(sd.camera.eye[:3])
                             + np.asarray(sd.camera.direction[:3]),
                             float(sd.camera.focal_length),
                             float(sd.camera.focal_blur),
                             float(sd.camera.fov))
    p0 = TriangleParams.from_scene(sd.scene, albedo=True, param=True)
    grads = {}
    for fg in (True, False):
        loss = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits,
                              t, frozen_geometry=fg)
        grads[fg] = jax.grad(lambda a: loss(a[0], a[1]))((p0, cp))
    for a, b in zip(jax.tree_util.tree_leaves(grads[True]),
                    jax.tree_util.tree_leaves(grads[False])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-5)


def test_gather_rows_bit_equal_to_native():
    """The MXU one-hot gather (rt/grad/gather.py) is bit-equal to table[idx]
    — single-block and blocked (lax.map) paths."""
    from rt.grad.gather import gather_rows
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.standard_normal((37, 9)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 37, size=(5, 201)), jnp.int32)
    np.testing.assert_array_equal(np.asarray(gather_rows(table, idx)),
                                  np.asarray(table[idx]))
    np.testing.assert_array_equal(
        np.asarray(gather_rows(table, idx, block=64)),
        np.asarray(table[idx]))


def test_gather_rows_nonfinite_rows_stay_isolated():
    """A NaN/Inf entry in the table must only reach rows that SELECT it —
    the native-gather semantics.  The naive one-hot matmul would poison the
    whole column (0.0 * NaN = NaN); this is reachable via the BVH build's
    NaN normals for degenerate triangles (ADVICE r2, rt/grad/gather.py)."""
    from rt.grad.gather import gather_rows
    rng = np.random.default_rng(11)
    table = np.asarray(rng.standard_normal((20, 5)), np.float32)
    table[3, 1] = np.nan
    table[7, 0] = np.inf
    table[7, 4] = -np.inf
    table = jnp.asarray(table)
    idx = jnp.asarray(rng.integers(0, 20, size=(97,)), jnp.int32)
    got = np.asarray(gather_rows(table, idx))
    want = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_array_equal(got, want)  # NaN == NaN positionally
    # rows not selecting 3 or 7 are finite
    clean = ~np.isin(np.asarray(idx), [3, 7])
    assert np.isfinite(got[clean]).all()
    # gradient through the guarded gather stays finite
    g = jax.grad(lambda t: jnp.sum(jnp.where(
        jnp.isfinite(gather_rows(t, idx)), gather_rows(t, idx), 0.0)))(table)
    assert np.isfinite(np.asarray(g)).all()


def test_gather_rows_grad_is_scatter_add():
    """d/dtable of sum(f(table[idx])) via the one-hot matmul equals the
    native gather's gradient (the scatter-add both paths must produce)."""
    from rt.grad.gather import gather_rows
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 16, size=(300,)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((300, 4)), jnp.float32)
    g1 = jax.grad(lambda t: jnp.sum(gather_rows(t, idx) * w))(table)
    g2 = jax.grad(lambda t: jnp.sum(t[idx] * w))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("builder,bounces", [
    (scenes.test_scene_metal, 3), (scenes.scene_cube, 2)])
def test_replay_onehot_equals_take(builder, bounces):
    """gather_mode='onehot' (MXU matmul rows) is bit-equal to 'take' (XLA
    gather) in the replay forward, and their gradients agree."""
    sd = _cfg(builder(W, H), bounces=bounces)
    t = jnp.uint32(1000)
    target, hits = record_hits_oracle(sd.scene, sd.camera, sd.config,
                                      jnp.uint32(2000))
    img_o = replay_color(sd.scene, sd.camera, sd.config, t, hits,
                         gather_mode="onehot")
    img_t = replay_color(sd.scene, sd.camera, sd.config, t, hits,
                         gather_mode="take")
    np.testing.assert_array_equal(np.asarray(img_o), np.asarray(img_t))

    loss_o = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits, t,
                            gather_mode="onehot")
    loss_t = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits, t,
                            gather_mode="take")
    if builder is scenes.test_scene_metal:
        p0 = SphereParams.from_scene(sd.scene, albedo=True, mat_param=True,
                                     center=True, radius=True)
    else:
        from rt.grad import TriangleParams
        p0 = TriangleParams.from_scene(sd.scene, albedo=True, param=True)
    g_o = jax.grad(lambda p: loss_o(p))(p0)
    g_t = jax.grad(lambda p: loss_t(p))(p0)
    for a, b in zip(jax.tree_util.tree_leaves(g_o),
                    jax.tree_util.tree_leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7, rtol=1e-5)


def test_replay_grads_match_diff_renderer_albedo():
    """At the recording point the replay loss and the full differentiable
    renderer take identical branches, so their albedo gradients agree."""
    sd = _cfg(scenes.test_scene_metal(W, H))
    t = jnp.uint32(1000)
    target = render_color_diff(sd.scene, sd.camera, sd.config,
                               jnp.uint32(2000))
    _, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)

    rloss = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits, t)

    def dloss(p):
        sc = apply_params(sd.scene, p)
        img = render_color_diff(sc, sd.camera, sd.config, t)
        return image_mse(img, target)

    p0 = SphereParams.from_scene(sd.scene, albedo=True, mat_param=True)
    g_r = jax.grad(lambda p: rloss(p))(p0)
    g_d = jax.grad(dloss)(p0)
    np.testing.assert_allclose(np.asarray(g_r.albedo), np.asarray(g_d.albedo),
                               atol=1e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_r.mat_param),
                               np.asarray(g_d.mat_param),
                               atol=1e-6, rtol=1e-4)


def test_replay_grads_match_diff_renderer_geometry():
    """Geometry gradients through the replay graph equal the full renderer's
    under the final-dir-sky transport (the mode where they are nonzero)."""
    sd = _cfg(scenes.test_scene_metal(W, H), sky_from_final_dir=True)
    t = jnp.uint32(1000)
    target = render_color_diff(sd.scene, sd.camera, sd.config,
                               jnp.uint32(2000))
    _, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)

    rloss = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits, t)

    def dloss(p):
        sc = apply_params(sd.scene, p)
        img = render_color_diff(sc, sd.camera, sd.config, t)
        return image_mse(img, target)

    p0 = SphereParams.from_scene(sd.scene, albedo=False, center=True,
                                 radius=True)
    g_r = jax.grad(lambda p: rloss(p))(p0)
    g_d = jax.grad(dloss)(p0)
    assert float(jnp.max(jnp.abs(g_r.center))) > 0.0
    np.testing.assert_allclose(np.asarray(g_r.center), np.asarray(g_d.center),
                               atol=5e-6, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g_r.radius), np.asarray(g_d.radius),
                               atol=5e-6, rtol=2e-3)


def test_replay_train_step_runs():
    """One optimization step on the replay objective (the BASELINE config 5
    train-step shape: record once, step on the frozen-path loss)."""
    import optax
    sd = _cfg(scenes.test_scene_metal(W, H))
    t = jnp.uint32(1000)
    target, _ = record_hits_oracle(sd.scene, sd.camera, sd.config,
                                   jnp.uint32(2000))
    _, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    loss = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits, t)

    params = SphereParams.from_scene(sd.scene, albedo=True)
    opt = optax.adam(1e-2)
    st = opt.init(params)

    @jax.jit
    def step(params, st):
        l, g = jax.value_and_grad(lambda p: loss(p))(params)
        upd, st = opt.update(g, st, params)
        return optax.apply_updates(params, upd), st, l

    p1, st, l0 = step(params, st)
    p2, st, l1 = step(p1, st)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert float(l1) < float(l0)


def test_replay_vertex_gradients_finite_difference():
    """Triangle VERTEX gradients through the replay objective, FD-verified —
    the mesh-geometry clause of BASELINE config 5 (requires
    frozen_geometry=False; the transport term that sees geometry is the
    final-dir sky, as with spheres)."""
    from rt.config import MAT_METAL
    from rt.grad import TriangleParams, finite_difference_check
    sd = _cfg(scenes.scene_cube(W, H), bounces=2, sky_from_final_dir=True)
    # metal (fuzz 0): the scatter direction is the pure reflect, smooth in
    # the face normal — lambertian's hemisphere bounce is a discrete sign
    # flip, so its vertex gradients are structurally zero (same reasoning
    # as test_camera_geometry_grads_are_structurally_sky_only)
    scene = sd.scene._replace(
        mat_kind=jnp.full_like(sd.scene.mat_kind, MAT_METAL),
        mat_param=jnp.zeros_like(sd.scene.mat_param))
    t = jnp.uint32(1000)
    target, _ = record_hits_oracle(scene, sd.camera, sd.config,
                                   jnp.uint32(2000))
    _, hits = record_hits_oracle(scene, sd.camera, sd.config, t)
    loss = replay_loss_fn(scene, sd.camera, sd.config, target, hits, t,
                          frozen_geometry=False)

    p0 = TriangleParams.from_scene(scene, albedo=False, vertices=True)
    g = jax.grad(lambda p: loss(p))(p0)
    assert float(jnp.max(jnp.abs(g.a))) > 0.0
    max_rel, _ = finite_difference_check(lambda p: loss(p), p0, eps=2e-3,
                                         num_coords=6, rtol=0.25)
    assert max_rel <= 0.25


def test_replay_vertex_params_need_unfrozen_geometry():
    """The frozen-geometry guard: vertex params under the fast path raise
    instead of silently returning zero gradients."""
    from rt.grad import TriangleParams
    sd = _cfg(scenes.scene_cube(W, H), bounces=2)
    t = jnp.uint32(1000)
    target, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    loss = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits, t)
    p0 = TriangleParams.from_scene(sd.scene, vertices=True)
    with pytest.raises(ValueError, match="frozen_geometry"):
        loss(p0)


def test_fit_replay_recovers_albedo():
    """The production record/replay loop (rt.grad.fit_replay): recover two
    perturbed sphere albedos from a target render — re-record every 15
    steps, inner steps scan-chained on device."""
    from rt.grad import fit_replay
    sd = _cfg(scenes.test_scene_metal(W, H))
    t = jnp.uint32(1000)
    target, _ = record_hits_oracle(sd.scene, sd.camera, sd.config, t)

    wrong = sd.scene.albedo.at[1].set(jnp.array([0.1, 0.9, 0.1])) \
                           .at[2].set(jnp.array([0.9, 0.2, 0.6]))
    init = {"scene": SphereParams(albedo=wrong)}
    params, losses = fit_replay(sd.scene, sd.camera, sd.config, target,
                                time=1000, steps=60, rerecord_every=15,
                                learning_rate=5e-2, init_params=init)
    assert losses[-1] < losses[0] * 0.05
    err = float(jnp.abs(params["scene"].albedo[1:3]
                        - sd.scene.albedo[1:3]).max())
    assert err < 0.08, f"albedo recovery error {err}"


def test_replay_loss_finite_difference():
    """Direct FD verification THROUGH the replay objective (not just
    equality with the diff renderer): albedo + fuzz coordinates."""
    from rt.grad import finite_difference_check
    sd = _cfg(scenes.test_scene_metal(W, H))
    t = jnp.uint32(1000)
    target, _ = record_hits_oracle(sd.scene, sd.camera, sd.config,
                                   jnp.uint32(2000))
    _, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    loss = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits, t)

    p0 = SphereParams.from_scene(sd.scene, albedo=True, mat_param=True)
    max_rel, _ = finite_difference_check(lambda p: loss(p), p0, eps=1e-2,
                                         num_coords=6, rtol=0.2)
    assert max_rel <= 0.2


def test_replay_camera_finite_difference_with_geometry():
    """Camera-pose gradients THROUGH the replay objective with geometry
    visible.  Under ``sky_from_final_dir`` the pose gradient flows through
    the recomputed per-bounce hit (t, point) and the scatter chain — not
    just the sky term — so this FD-verifies camera gradients in the exact
    regime the r1 verdict flagged as untested (the hard renderer's pose
    grads are structurally sky-only; replay freezes the discrete path, so
    the frozen objective is continuous in pose and FD is well-defined).
    Ref transport being differentiated: shader_sphere.wgsl:230-243 with the
    sky evaluated on the final scattered direction."""
    from rt.core.camera import look_at
    from rt.grad import CameraParams, finite_difference_check
    sd = _cfg(scenes.test_scene_metal(W, H), sky_from_final_dir=True)
    t = jnp.uint32(1000)
    # target rendered from a slightly DIFFERENT pose, so the loss sits off
    # its stationary point and the pose gradient carries real signal
    # (at a matching pose the grads are ~1e-5 and FD drowns in f32 noise)
    cam2 = look_at((0.06, 0.04, 3.45), (0.03, 0.02, 0.0), 3.5, 0.04,
                   np.pi * 0.2)
    target, _ = record_hits_oracle(sd.scene, cam2, sd.config, t)
    _, hits = record_hits_oracle(sd.scene, sd.camera, sd.config, t)
    loss = replay_loss_fn(sd.scene, sd.camera, sd.config, target, hits, t)
    cp = CameraParams.create((0.0, 0.0, 3.5), (0.0, 0.0, 0.0), 3.5, 0.04,
                             np.pi * 0.2)

    # x-pose coordinates must be ALIVE here (they are exactly zero in the
    # reference-transport hard renderer — test_grad.py's structural test)
    g = jax.grad(lambda p: loss(None, p))(cp)
    assert float(g.eye[0]) != 0.0 and float(g.target[0]) != 0.0

    max_rel, _ = finite_difference_check(lambda p: loss(None, p), cp,
                                         eps=1e-3, num_coords=8, rtol=0.2)
    assert max_rel <= 0.2


def test_fit_replay_accepts_camera_params():
    """fit_replay carries CameraParams through the scan-chained inner loop
    and re-records at the UPDATED camera each block (BASELINE config 5's
    parameter set includes the camera).

    Negative result, documented on purpose: pose RECOVERY through the
    frozen-path replay objective does not converge — at the recording point
    the pose gradient is ~1e-5 (the continuous mismatch is tiny; the real
    error is discrete pixel reassignment, which the frozen path cannot
    see), so adam's normalized steps random-walk the pose and every
    re-record locks the drift in (measured: loss 0.005 -> 0.15 over 40
    steps regardless of lr/rerecord_every).  Pose recovery is the soft
    surrogate's job (rt/grad/soft.py, test_soft_camera_recovery); replay
    owns material/geometry throughput and FD-verified camera GRADIENTS
    (test above).  This test pins the wiring only: camera params must flow,
    update, and stay finite."""
    from rt.grad import CameraParams, fit_replay
    sd = _cfg(scenes.test_scene_metal(W, H), sky_from_final_dir=True)
    target, _ = record_hits_oracle(sd.scene, sd.camera, sd.config,
                                   jnp.uint32(1000))
    cp0 = CameraParams.create((0.04, -0.02, 3.5), (0.0, 0.0, 0.0),
                              3.5, 0.04, np.pi * 0.2)
    params, losses = fit_replay(
        sd.scene, sd.camera, sd.config, target, time=1000, steps=10,
        rerecord_every=5, learning_rate=1e-3,
        scene_fields=dict(albedo=False), init_params={"camera": cp0})
    assert np.isfinite(losses).all()
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()) > 0.0,
        params["camera"], cp0)
    assert all(jax.tree_util.tree_leaves(moved)), "camera params frozen"


def test_fit_replay_loss_weight():
    """loss_weight=ones reproduces the unweighted loop exactly; a mask
    confined to the left half still recovers the albedo (interiors
    identify it) — the edge-downweighted polish mode of the config-5
    pipeline (tools/exp_config5_pose.py)."""
    import dataclasses

    import numpy as np

    from rt.grad.train import fit_replay
    from rt.render.renderer import render_color
    from rt.scene import scenes

    sd = scenes.test_scene_metal(64, 48)
    cfg = dataclasses.replace(sd.config, bounces=3)
    target = render_color(sd.scene, sd.camera, cfg, jnp.uint32(1000))
    bad = sd.scene._replace(
        albedo=sd.scene.albedo.at[1].set(jnp.asarray([0.9, 0.1, 0.1],
                                                     jnp.float32)))
    kw = dict(steps=4, rerecord_every=2, learning_rate=5e-2,
              recorder="oracle")
    _, l_ref = fit_replay(bad, sd.camera, cfg, target, **kw)
    _, l_ones = fit_replay(bad, sd.camera, cfg, target,
                           loss_weight=jnp.ones((48, 64)), **kw)
    np.testing.assert_allclose(l_ones, l_ref, rtol=1e-6, atol=0)

    w = jnp.zeros((48, 64)).at[:, :32].set(1.0)
    params, losses = fit_replay(bad, sd.camera, cfg, target, loss_weight=w,
                                steps=12, rerecord_every=4,
                                learning_rate=5e-2, recorder="oracle")
    assert losses[-1] < losses[0]
