"""Log-probability ("potential") plumbing.

The reference routes every gradient through ``collect_gradients`` which
dispatches on (tuple log_prob | user tensor | user callable | autograd)
(reference: hamiltorch/samplers.py:33-66) and signals bad evaluations with a
``LogProbError`` exception caught by the driver (reference:
hamiltorch/util.py:92-104, samplers.py:1045-1067).

TPU-native equivalents:

* gradients come from ``jax.value_and_grad``; a user-supplied gradient
  (``pass_grad``) is attached with ``jax.custom_vjp`` so the same
  ``value_and_grad`` call sites pick it up with zero branching;
* divergences are *data*, not control flow: non-finite log-probs/energies
  flow through as NaN and are folded into the Metropolis accept mask inside
  the scan (no exceptions exist under jit).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

LogProbFn = Callable[[jnp.ndarray], jnp.ndarray]

# Samplers take the potential as a STATIC jit argument, so the wrapper's
# identity is the compilation-cache key: building a fresh custom_vjp object
# per sample() call would recompile the whole scan every time pass_grad is
# used.  Memoize by (function, gradient) identity; the bounded strong-ref
# cache also keeps each pass_grad object alive so its id cannot be reused
# by a different object while the entry exists.
_WRAP_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_WRAP_CACHE_MAX = 32


def make_log_prob(
    log_prob_fn: LogProbFn,
    pass_grad=None,
) -> LogProbFn:
    """Wrap ``log_prob_fn`` so autodiff uses ``pass_grad`` when given.

    ``pass_grad`` may be a callable ``theta -> (D,) gradient`` or a constant
    gradient array, matching the reference's ``pass_grad`` contract
    (reference: hamiltorch/samplers.py:59-63).  Returns a scalar-valued
    function whose ``jax.grad`` is the user gradient; repeated calls with
    the same (log_prob_fn, pass_grad) return the SAME wrapper so jitted
    samplers hit their compilation cache.
    """
    if pass_grad is None:
        return log_prob_fn

    try:
        cache_key = (log_prob_fn, id(pass_grad))
        hit = _WRAP_CACHE.get(cache_key)
    except TypeError:  # unhashable log_prob_fn: skip memoization
        cache_key, hit = None, None
    if hit is not None and hit[0] is pass_grad:
        _WRAP_CACHE.move_to_end(cache_key)  # LRU, not FIFO: keep hot wrappers
        return hit[1]

    if callable(pass_grad):
        grad_fn = pass_grad
    else:
        const_grad = jnp.asarray(pass_grad)

        def grad_fn(theta):
            return const_grad

    @jax.custom_vjp
    def wrapped(theta):
        return log_prob_fn(theta)

    def fwd(theta):
        return log_prob_fn(theta), theta

    def bwd(theta, g):
        return (g * grad_fn(theta),)

    wrapped.defvjp(fwd, bwd)
    if cache_key is not None:
        _WRAP_CACHE[cache_key] = (pass_grad, wrapped)
        while len(_WRAP_CACHE) > _WRAP_CACHE_MAX:
            _WRAP_CACHE.popitem(last=False)
    return wrapped


def value_and_grad(log_prob_fn: LogProbFn) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """(theta) -> (logp, dlogp/dtheta), one fused forward+backward."""
    return jax.value_and_grad(log_prob_fn)


# Tree potentials adapt to flat (D,) samplers through a ravel boundary;
# the adapter must be identity-stable across calls for the same reason as
# _WRAP_CACHE above (fresh closure per call => whole-scan recompile, and
# implicit-RMHMC compiles were measured at 2-6 min on the remote service).
_TREE_POTENTIAL_CACHE: OrderedDict = OrderedDict()
_TREE_POTENTIAL_CACHE_MAX = 32


def make_flat_potential(log_prob_fn, template):
    """Identity-stable flat-theta wrapper of a pytree potential.

    ``template`` is the (unstacked) parameter pytree; the wrapper unravels
    its flat (D,) argument back to the tree before calling
    ``log_prob_fn``.  Repeated calls with the same (potential, leaf
    structure/shapes/dtypes) return the SAME wrapper object so jitted
    samplers (which take the potential as a static arg) hit their
    compilation cache.

    Honours the ``_raw_fn``/``_data`` jit-operand protocol: a dataset
    attached by models/bnn.py stays an OPERAND through the ravel boundary
    (baking it into the program as a closure constant overflows TPU
    program limits); ``_data`` is refreshed from ``log_prob_fn`` on every
    call — operands may change without recompiling.
    """
    from jax.flatten_util import ravel_pytree

    leaves, tdef = jax.tree_util.tree_flatten(template)
    struct = (tdef, tuple((tuple(l.shape), str(l.dtype)) for l in leaves))
    raw = getattr(log_prob_fn, "_raw_fn", None)
    base = raw if raw is not None else log_prob_fn
    try:
        cache_key = (base, struct)
        hit = _TREE_POTENTIAL_CACHE.get(cache_key)
    except TypeError:  # unhashable potential: skip memoization
        cache_key, hit = None, None
    if hit is None:
        _, unravel = ravel_pytree(template)
        if raw is None:

            def lp_flat(th):
                return log_prob_fn(unravel(th))

        else:

            def raw_flat(th, data):
                return raw(unravel(th), data)

            def lp_flat(th):
                return raw(unravel(th), lp_flat._data)

            lp_flat._raw_fn = raw_flat
        hit = lp_flat
        if cache_key is not None:
            _TREE_POTENTIAL_CACHE[cache_key] = hit
            while len(_TREE_POTENTIAL_CACHE) > _TREE_POTENTIAL_CACHE_MAX:
                _TREE_POTENTIAL_CACHE.popitem(last=False)
    else:
        _TREE_POTENTIAL_CACHE.move_to_end(cache_key)
    if raw is not None:
        hit._data = log_prob_fn._data  # operand refresh, not a cache key
    return hit


def resolve_potential(log_prob_fn, pass_grad=None):
    """Honour the ``_raw_fn``/``_data`` jit-operand protocol.

    Potentials built by models/bnn.py attach their dataset so samplers can
    pass it as a jit operand instead of baking it into the program as a
    constant (large datasets overflow TPU constant budgets).  Returns
    (fn, data): call ``fn(theta, data)`` when data is not None, else
    ``fn(theta)``.
    """
    raw = getattr(log_prob_fn, "_raw_fn", None)
    if raw is not None and pass_grad is None:
        return raw, getattr(log_prob_fn, "_data")
    return make_log_prob(log_prob_fn, pass_grad), None
