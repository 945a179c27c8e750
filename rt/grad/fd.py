"""Finite-difference verification of rendering gradients.

The acceptance criterion from BASELINE.json: "finite-difference-verified
pixel gradients w.r.t. camera/material/geometry parameters".  Central
differences on a handful of coordinates, compared against autodiff.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def finite_difference_check(loss_fn: Callable, params, *, eps: float = 1e-3,
                            num_coords: int = 8, seed: int = 0,
                            rtol: float = 0.15, atol: float = 1e-4):
    """Compare autodiff grads of ``loss_fn(params)`` against central FD.

    Samples up to ``num_coords`` scalar coordinates across the params pytree.
    Returns (max_rel_err, list of (path, idx, autodiff, fd)); raises
    AssertionError when a sampled coordinate disagrees beyond tolerance.

    Note eps must clear float32 quantization of the Monte-Carlo image:
    renders are f32, so |dL| ~ eps * g must exceed ~1e-6 relative noise —
    callers pick eps per parameter scale (1e-3 works for albedo/fuzz/camera).
    """
    loss64 = lambda p: jnp.asarray(loss_fn(p), jnp.float32)
    g = jax.grad(loss64)(params)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    g_leaves = jax.tree_util.tree_leaves(g)
    rng = np.random.default_rng(seed)

    checks = []
    flat_sizes = [int(np.prod(l.shape)) if l.shape else 1 for l in leaves]
    total = sum(flat_sizes)
    picks = rng.choice(total, size=min(num_coords, total), replace=False)

    base = float(loss64(params))
    max_rel = 0.0
    for flat_idx in np.sort(picks):
        li, off = 0, int(flat_idx)
        while off >= flat_sizes[li]:
            off -= flat_sizes[li]
            li += 1
        leaf = np.asarray(leaves[li], np.float64)
        shape = leaf.shape
        coord = np.unravel_index(off, shape) if shape else ()

        def perturbed(delta):
            l2 = leaf.copy()
            if shape:
                l2[coord] += delta
            else:
                l2 = l2 + delta
            new_leaves = list(leaves)
            new_leaves[li] = jnp.asarray(l2, leaves[li].dtype)
            return jax.tree_util.tree_unflatten(treedef, new_leaves)

        lp = float(loss64(perturbed(+eps)))
        lm = float(loss64(perturbed(-eps)))
        fd = (lp - lm) / (2.0 * eps)
        ad = float(np.asarray(g_leaves[li])[coord] if shape
                   else np.asarray(g_leaves[li]))
        denom = max(abs(fd), abs(ad), atol)
        rel = abs(fd - ad) / denom
        max_rel = max(max_rel, rel)
        checks.append((li, coord, ad, fd, rel))
        assert rel <= rtol or abs(fd - ad) <= atol, (
            f"grad mismatch at leaf {li}{coord}: autodiff={ad:.6g} "
            f"fd={fd:.6g} rel={rel:.3f} (loss base {base:.6g})")
    return max_rel, checks
