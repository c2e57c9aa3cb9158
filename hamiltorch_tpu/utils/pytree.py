"""Flat-vector <-> pytree utilities.

Replaces the reference's ``flatten``/``unflatten``/``update_model_params_in_place``
(reference: hamiltorch/util.py:121-141) and the entire ``make_functional``
module-rewriting machinery (reference: hamiltorch/util.py:253-376), which JAX
gets for free: models are already pure functions of parameter pytrees, so the
only work is raveling a pytree into the flat (D,) vector the samplers operate
on.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def ravel_pytree_fn(params: Any) -> Tuple[jnp.ndarray, Callable[[jnp.ndarray], Any]]:
    """Ravel ``params`` to a flat vector; returns (flat, unravel_fn)."""
    return ravel_pytree(params)


def param_sizes(params: Any) -> list[int]:
    """Number of elements per leaf, in pytree order."""
    return [leaf.size for leaf in jax.tree_util.tree_leaves(params)]


def param_shapes(params: Any) -> list[tuple]:
    """Shape of each leaf, in pytree order."""
    return [tuple(leaf.shape) for leaf in jax.tree_util.tree_leaves(params)]


def unravel_last_axis_fn(template: Any) -> Callable[[jnp.ndarray], Any]:
    """Split the LAST axis of a flat-stacked array back into ``template``'s
    leaves: the returned fn maps (..., D) -> tree of (..., *leaf.shape) in
    ``ravel_pytree``'s leaf order (per-leaf C-order flattens, tree order).
    The shared inverse for flat traces/statistics produced on raveled
    states (RMHMC's boundary ravel, per-leaf diagnostics, checkpoint
    assembly)."""
    leaves, tdef = jax.tree_util.tree_flatten(template)

    def unravel_last(mat):
        mat = jnp.asarray(mat)
        lead = mat.shape[:-1]
        parts, off = [], 0
        for l in leaves:
            parts.append(mat[..., off : off + l.size].reshape(lead + tuple(l.shape)))
            off += l.size
        return jax.tree_util.tree_unflatten(tdef, parts)

    return unravel_last


def is_param_tree(theta: Any) -> bool:
    """True when ``theta`` is a structured parameter pytree, not a flat vector.

    The samplers accept either a flat (D,) vector (the reference's
    convention, hamiltorch/util.py:121-141) or a parameter pytree (the
    pytree-native chain-state path, which avoids flat-layout slicing in the
    hot loop).  Arrays and plain sequences of PYTHON scalars are "flat"
    (``jnp.asarray`` handles them); any container holding an ARRAY leaf —
    including 0-d scalar arrays, e.g. ``{"mu": jnp.asarray(0.5)}`` — is a
    tree (``jnp.asarray(dict)`` would crash with a dtype-object error).
    """
    if isinstance(theta, jnp.ndarray) or hasattr(theta, "__array_interface__"):
        return False
    leaves = jax.tree_util.tree_leaves(theta)
    if len(leaves) == 1 and leaves[0] is theta:
        return False
    return any(hasattr(leaf, "ndim") for leaf in leaves)


def stack_param_tree(theta0, n: int, key=None, noise: float = 0.0,
                     stacked: bool | None = None):
    """(template, stacked_tree) for a pytree chain/replica/ensemble entry.

    Leaves already carrying a leading ``n`` axis are taken as per-member
    states (``stacked`` overrides the auto-detection when a single-state
    leaf's first dim happens to equal ``n``); otherwise the single state
    broadcasts to ``n`` copies — with ``noise > 0`` (and a ``key``) each
    copy is spread by per-leaf ``noise * N(0, 1)``, the ChEES convention
    (its cross-chain criterion needs distinct starting points).
    """
    theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
    leaves, tdef = jax.tree_util.tree_flatten(theta0)
    if stacked is None:
        stacked = all(l.shape[:1] == (n,) for l in leaves)
    if stacked:
        template = jax.tree_util.tree_unflatten(tdef, [l[0] for l in leaves])
        return template, theta0
    template = theta0
    if noise > 0.0:
        keys = jax.random.split(key, len(leaves))
        out = [
            l[None] + noise * jax.random.normal(k, (n,) + l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ]
    else:
        out = [jnp.broadcast_to(l, (n,) + l.shape) for l in leaves]
    return template, jax.tree_util.tree_unflatten(tdef, out)


def reject_param_tree(theta, entry_point: str, why: str, alternative: str) -> None:
    """Raise a uniform TypeError when a flat-layout-only entry point
    receives a parameter pytree (checkpointed carries and mesh specs are
    built for the flat layout; the pytree-native paths are local-only)."""
    if is_param_tree(theta):
        raise TypeError(
            f"{entry_point} takes a flat (D,) theta0 — {why}.  Ravel the "
            f"pytree (utils.pytree.ravel_pytree_fn) or {alternative}."
        )
