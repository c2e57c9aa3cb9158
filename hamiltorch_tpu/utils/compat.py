"""Parity shims for the reference's ``hamiltorch.util`` helpers.

Each maps a reference utility (reference: hamiltorch/util.py) onto the JAX
equivalent so ported user code keeps working:

* ``flatten`` / ``unflatten``       (util.py:121-136) — params <-> flat vector,
  accepting a params pytree, a flax variables dict, or a torch.nn.Module;
* ``gradient`` / ``hessian`` / ``jacobian`` (util.py:145-234) — thin wrappers
  over jax.grad/jax.hessian/jax.jacrev on flat vectors;
* ``has_nan_or_inf`` / ``LogProbError``   (util.py:92-104) — kept for user
  code that catches it, though the samplers themselves are branchless and
  never raise it;
* ``make_functional``               (util.py:253-359) — for torch modules,
  returns the translated pure apply function (interop bridge); JAX models
  are already functional;
* ``eval_print``                    (util.py:236-247) — debug printer.
"""

from __future__ import annotations

import inspect
import sys

import jax
import jax.numpy as jnp

from .pytree import ravel_pytree_fn


class LogProbError(Exception):
    """Parity exception type; the TPU samplers signal divergences as data
    (stats.divergent) instead of raising."""


def has_nan_or_inf(value) -> bool:
    value = jnp.asarray(value)
    return bool(jnp.isnan(value).any() | jnp.isinf(value).any())


def _params_of(model):
    if hasattr(model, "named_parameters") and hasattr(model, "forward"):
        # flatten/unflatten only need the parameters, not a translated
        # forward — works for ARBITRARY torch modules like the reference's
        # flatten (util.py:121-122)
        import jax.numpy as _jnp

        return [
            _jnp.asarray(p.detach().cpu().numpy()) for p in model.parameters()
        ]
    return model  # a pytree (list/dict/flax variables)


def flatten(model) -> jnp.ndarray:
    """Parameters of ``model`` (pytree or torch module) as a flat vector."""
    flat, _ = ravel_pytree_fn(_params_of(model))
    return flat


def unflatten(model, flattened_params):
    """Flat vector -> list/pytree of parameter arrays shaped like ``model``."""
    if jnp.asarray(flattened_params).ndim != 1:
        raise ValueError("Expecting a 1d flattened_params")
    _, unravel = ravel_pytree_fn(_params_of(model))
    return unravel(jnp.asarray(flattened_params))


def make_functional(model):
    """torch.nn.Module -> pure fn(x, params=...) (reference calling
    convention).  JAX/flax models are already pure; returned unchanged."""
    if hasattr(model, "named_parameters") and hasattr(model, "forward"):
        from ..models.interop import from_torch_module

        apply_fn, _ = from_torch_module(model)

        def fmodel(x, params):
            return apply_fn(params, x)

        return fmodel
    return model


def gradient(output_fn, inputs):
    """grad of a scalar function at ``inputs`` (flat vector)."""
    return jax.grad(output_fn)(jnp.asarray(inputs))


def hessian(output_fn, inputs):
    return jax.hessian(output_fn)(jnp.asarray(inputs))


def jacobian(output_fn, inputs):
    return jax.jacrev(output_fn)(jnp.asarray(inputs))


def eval_print(*expressions):
    """Evaluate expression strings in the caller's frame and pretty-print
    (reference: hamiltorch/util.py:236-247)."""
    frame = sys._getframe(1)
    print("\n" + inspect.stack()[1][3])
    width = max((len(e) for e in expressions), default=0)
    for expression in expressions:
        val = eval(expression, frame.f_globals, frame.f_locals)
        print(f"  {expression.ljust(width)} = {val!r}")
