"""Checkpoint / resume for progressive renders and inverse-rendering runs.

The reference has no checkpoint files, but its progressive accumulator +
frame_count IS resumable state by construction (src/renderer.rs:249-257,
336-348; EMA at shader_sphere.wgsl:266-271) — pausing and resuming a
converging render only needs {image, frame_count, time}.  Here that state is
a pytree on device; checkpointing is a host round-trip to one .npz file.

Generic pytree save/load covers the optimizer state of rt.grad.fit as well
(params + optax state), giving preemption-safe training — the failure-
recovery story (SURVEY.md §5): fail fast in the renderer, resume from the
last checkpoint.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rt.render.renderer import RenderState


def _atomic_savez(path: str, **payload) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def save_pytree(path: str, tree) -> None:
    """Serialize a pytree of arrays to one .npz (leaves in flatten order)."""
    leaves = jax.tree_util.tree_leaves(tree)
    _atomic_savez(path, **{f"leaf_{i}": np.asarray(l)
                           for i, l in enumerate(leaves)})


def load_pytree(path: str, like):
    """Load leaves saved by save_pytree back into the structure of ``like``
    (the standard example-tree resume pattern — structure is code, data is
    the checkpoint)."""
    treedef = jax.tree_util.tree_structure(like)
    with np.load(path) as z:
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_render_state(path: str, state: RenderState, time: int) -> None:
    """Persist a paused progressive render (image + frame_count + time)."""
    _atomic_savez(path, image=np.asarray(state.image),
                  frame_count=np.asarray(state.frame_count),
                  time=np.uint32(time))


def load_render_state(path: str):
    """-> (RenderState, time).  Resume with ProgressiveRenderer by assigning
    .state and .set_time(time)."""
    with np.load(path) as z:
        state = RenderState(image=jnp.asarray(z["image"]),
                            frame_count=jnp.asarray(z["frame_count"]))
        time = int(z["time"])
    return state, time
