"""Triangle intersection + BVH traversal semantics (shader_tris.wgsl)."""

import jax.numpy as jnp
import numpy as np

from rt.config import FLT_MAX
from rt.core import triangle as tri
from rt.scene import bvh, objloader, scenes


def _suzanne_scene():
    m = objloader.load_asset("suzanne.obj", bvh.material_lambertian((0.5, 0.5, 0.5)))
    return bvh.to_triangle_scene(bvh.build_tree([m]))


def test_moller_trumbore_basic():
    a = jnp.array([[0.0, 0.0, 0.0]])
    b = jnp.array([[1.0, 0.0, 0.0]])
    c = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    valid, t = tri.moller_trumbore(o, d, a, b, c, jnp.array([FLT_MAX]))
    assert bool(valid[0]) and abs(float(t[0]) - 1.0) < 1e-6
    # parallel ray rejected (det < EPSILON)
    d2 = jnp.array([[1.0, 0.0, 0.0]])
    valid2, _ = tri.moller_trumbore(o, d2, a, b, c, jnp.array([FLT_MAX]))
    assert not bool(valid2[0])
    # outside barycentric range rejected
    o3 = jnp.array([[2.0, 2.0, 1.0]])
    valid3, _ = tri.moller_trumbore(o3, d, a, b, c, jnp.array([FLT_MAX]))
    assert not bool(valid3[0])


def test_front_face_inverted_convention():
    # shader_tris.wgsl:201 — front_face = dot(normal, dir) > 0, no flip.
    # (ray slightly off-axis: exactly axis-aligned rays through node planes
    # at x==0 hit the slab-method NaN edge, in WGSL and here alike)
    scene = _suzanne_scene()
    o = jnp.array([[0.01, 0.02, 5.0]])
    d = jnp.array([[0.001, 0.002, -1.0]])
    t, idx = tri.intersect_all_bvh(scene, o, d)
    assert float(t[0]) < FLT_MAX
    hit = tri.hit_record(scene, o, d, t, idx)
    nrm = np.asarray(hit["normal"][0])
    ff = bool(hit["front_face"][0])
    assert ff == (float(np.dot(nrm, np.asarray(d[0]))) > 0)


def test_bvh_matches_bruteforce_on_random_rays():
    scene = _suzanne_scene()
    rng = np.random.default_rng(0)
    n = 256
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 2] = 4.0
    target = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = (target - o).astype(np.float32)
    t_bvh, i_bvh = tri.intersect_all_bvh(scene, jnp.asarray(o), jnp.asarray(d))
    t_bf, i_bf = tri.intersect_all_bruteforce(scene, jnp.asarray(o), jnp.asarray(d))
    t_bvh, t_bf = np.asarray(t_bvh), np.asarray(t_bf)
    hit_bvh = t_bvh != FLT_MAX
    hit_bf = t_bf != FLT_MAX
    np.testing.assert_array_equal(hit_bvh, hit_bf)
    np.testing.assert_allclose(t_bvh[hit_bvh], t_bf[hit_bf], rtol=1e-6)


def test_bvh_miss_gives_flt_max():
    scene = _suzanne_scene()
    o = jnp.array([[100.0, 100.0, 100.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    t, idx = tri.intersect_all_bvh(scene, o, d)
    assert np.float32(t[0]) == np.float32(FLT_MAX)
    assert int(idx[0]) == -1


def test_aabb_slab():
    bmin = jnp.array([[-1.0, -1.0, -1.0]])
    bmax = jnp.array([[1.0, 1.0, 1.0]])
    o = jnp.array([[0.0, 0.0, 5.0]])
    hit = tri.intersect_node_mask(o, jnp.array([[0.0, 0.0, -1.0]]), bmin, bmax)
    miss = tri.intersect_node_mask(o, jnp.array([[0.0, 0.0, 1.0]]), bmin, bmax)
    inside = tri.intersect_node_mask(jnp.array([[0.0, 0.0, 0.0]]),
                                     jnp.array([[0.0, 1.0, 0.0]]), bmin, bmax)
    assert bool(hit[0]) and not bool(miss[0]) and bool(inside[0])
    # axis-parallel ray exactly on the slab boundary: t0 = -inf, t1 = 0*inf
    # = NaN; NaN-forgiving fmin/fmax (== WGSL min/max) leave -inf for both,
    # so the box is MISSED — replicating the shader's slab-method edge case.
    edge = tri.intersect_node_mask(jnp.array([[1.0, 0.0, 5.0]]),
                                   jnp.array([[0.0, 0.0, -1.0]]), bmin, bmax)
    assert not bool(edge[0])


def test_trailing_ones():
    vals = np.array([0b0, 0b1, 0b111, 0b1011, 0b0110, 0xFFFFFFFE], np.uint32)
    got = np.asarray(tri._trailing_ones(jnp.asarray(vals)))
    np.testing.assert_array_equal(got, [0, 1, 3, 2, 0, 0])


def test_tris_smoke_render():
    """Smoke render analog of the reference's in-module tests
    (scene_tris.rs:204-244) — no goldens upstream either; assert sane output."""
    from rt.render.renderer import ProgressiveRenderer
    sd = scenes.scene_quad(96, 64)
    r = ProgressiveRenderer(sd)
    r.set_time(1000)
    r.draw()
    img = r.image
    assert np.isfinite(img).all()
    assert img.std() > 0.01  # not a constant image
