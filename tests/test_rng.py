"""RNG unit tests — pin the PCG stream down before anything else
(SURVEY.md hard part #1: golden matching requires a bit-exact u32 stream)."""

import jax.numpy as jnp
import numpy as np

from rt.core import rng


def test_jax_matches_scalar_replica():
    for seed in [0, 1, 12345, 0xDEADBEEF, (256 * 512 + 300) * 1000 % 2**32]:
        ref = rng.reference_stream(seed, 16)
        s = jnp.uint32(seed)
        got = []
        for _ in range(16):
            s, f = rng.next_float(s)
            got.append(float(f))
        np.testing.assert_array_equal(np.array(got, np.float32), ref)


def test_seed_layout():
    # (x * height + y) * time with u32 wraparound — shader_sphere.wgsl:253
    s = rng.seed(jnp.uint32(511), jnp.uint32(300), 512, 4_000_000_000)
    expected = np.uint32(
        (np.uint64(511 * 512 + 300) * np.uint64(4_000_000_000)) % (1 << 32))
    assert np.uint32(s) == expected


def test_stream_is_in_unit_interval_and_uniform():
    s = jnp.arange(1 << 14, dtype=jnp.uint32)
    s, v = rng.next_float(s)
    s, v2 = rng.next_float(s)
    v = np.asarray(jnp.concatenate([v, v2]))
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert abs(v.mean() - 0.5) < 0.01
    assert abs(np.var(v) - 1 / 12) < 0.01


def test_vec_helpers_consume_in_order():
    s0 = jnp.uint32(42)
    s1, a = rng.next_float(s0)
    s2, b = rng.next_float(s1)
    s3, c = rng.next_float(s2)
    sv, v3 = rng.next_vec3(s0)
    assert np.uint32(sv) == np.uint32(s3)
    np.testing.assert_array_equal(np.asarray(v3), np.array([a, b, c], np.float32))


def test_vectorized_matches_scalar():
    seeds = np.array([[0, 1], [9999, 123456]], np.uint32)
    s, v = rng.next_float(jnp.asarray(seeds))
    for i in range(2):
        for j in range(2):
            assert float(v[i, j]) == rng.reference_stream(seeds[i, j], 1)[0]
