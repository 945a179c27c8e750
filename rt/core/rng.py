"""Bit-exact vectorized replica of the reference's per-pixel PCG RNG.

Reference (WGSL): src/shaders/shader_sphere.wgsl:87-103 (identical copy at
shader_tris.wgsl:99-115)::

    fn rng_int(state) {
        let oldState = *state + 747796405u + 2891336453u;
        let word = ((oldState >> ((oldState >> 28u) + 4u)) ^ oldState) * 277803737u;
        *state = (word >> 22u) ^ word;
    }
    fn rng_float(state) -> f32 { rng_int(state); return f32(*state) / f32(0xffffffffu); }

Notes on exactness:

- all arithmetic is wrapping uint32 — jnp.uint32 ops wrap identically.
- ``f32(0xffffffffu)`` rounds to 2**32 exactly in IEEE f32, so the divisor is
  4294967296.0; ``f32(*state)`` is round-to-nearest-even u32→f32, which XLA's
  convert matches.  Outputs can therefore reach exactly 1.0.
- per-pixel seed layout: ``(x * resolution.y + y) * time`` (u32 wrap,
  shader_sphere.wgsl:253).

The state is carried functionally: every helper takes a uint32 array of any
shape and returns ``(new_state, value)``.  This makes per-lane divergent
consumption (the dielectric branch consumes 0 or 1 draws — see
materials.scatter) expressible with ``jnp.where`` over candidate states.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_INC = np.uint32(747796405)
_INC2 = np.uint32(2891336453)
_MULT = np.uint32(277803737)
# f32(0xffffffffu) == 2**32 after round-to-nearest (WGSL rng_float divisor).
_DENOM = np.float32(4294967296.0)


def seed(x: jnp.ndarray, y: jnp.ndarray, height, time) -> jnp.ndarray:
    """Per-pixel seed ``(x * height + y) * time`` — shader_sphere.wgsl:253."""
    x = x.astype(jnp.uint32)
    y = y.astype(jnp.uint32)
    h = jnp.uint32(height)
    t = jnp.asarray(time, jnp.uint32)
    return (x * h + y) * t


def step(state: jnp.ndarray) -> jnp.ndarray:
    """One rng_int step: uint32 state array -> new state array."""
    state = state.astype(jnp.uint32)
    old = state + _INC + _INC2
    shift = (old >> np.uint32(28)) + np.uint32(4)
    word = ((old >> shift) ^ old) * _MULT
    return (word >> np.uint32(22)) ^ word


def next_float(state: jnp.ndarray):
    """rng_float: returns (new_state, f32 in [0, 1])."""
    s = step(state)
    return s, s.astype(jnp.float32) / _DENOM


def next_vec2(state: jnp.ndarray):
    """rng_vec2: (new_state, (..., 2) f32)."""
    s, a = next_float(state)
    s, b = next_float(s)
    return s, jnp.stack([a, b], axis=-1)


def next_vec3(state: jnp.ndarray):
    """rng_vec3: (new_state, (..., 3) f32)."""
    s, a = next_float(state)
    s, b = next_float(s)
    s, c = next_float(s)
    return s, jnp.stack([a, b, c], axis=-1)


def reference_stream(seed_value: int, n: int) -> np.ndarray:
    """NumPy scalar replica used by unit tests to pin the stream down."""
    s = np.uint32(seed_value)
    out = []
    with np.errstate(over="ignore"):
        for _ in range(n):
            old = np.uint32(s + _INC + _INC2)
            shift = np.uint32((old >> np.uint32(28)) + np.uint32(4))
            word = np.uint32(np.uint32(old >> shift) ^ old) * _MULT
            s = np.uint32(np.uint32(word >> np.uint32(22)) ^ word)
            out.append(np.float32(s) / _DENOM)
    return np.array(out, np.float32)
