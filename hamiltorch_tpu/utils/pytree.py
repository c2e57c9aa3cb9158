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
