"""MAP estimation / chain warm-starting.

The reference has no optimizer in the package — its notebooks find MAP
inits with hand-rolled torch training loops before calling ``sample_model``
(e.g. notebooks/bayesian_hamiltorch_mnist.ipynb trains the net, then
samples around the fit).  This utility makes that workflow one call:
maximize any potential this framework's samplers accept (including the
``_raw_fn``/``_data`` jit-operand protocol of ``define_model_log_prob``)
with an optax optimizer inside one jitted ``lax.scan``.

TPU-first shape: no Python loop — ``num_steps`` optimizer updates compile
to a single scan; non-finite steps are branchless rejections (the carry
keeps the previous iterate and optimizer state); the best-so-far iterate
rides the carry so a late divergence cannot lose the optimum.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_tmap = jax.tree_util.tree_map


class MAPResult(NamedTuple):
    theta: object  # best-log-prob iterate seen (use this as the MAP)
    log_prob: jnp.ndarray  # log_prob at ``theta``
    final_theta: object  # last iterate (optimizer's end state)
    log_prob_trace: jnp.ndarray  # (num_steps,) pre-update log_prob values
    num_rejected: jnp.ndarray  # non-finite update steps (kept previous state)


def _all_finite(tree):
    ok = jnp.asarray(True)
    for l in jax.tree_util.tree_leaves(tree):
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(l)))
    return ok


@partial(jax.jit, static_argnames=("fn", "opt", "num_steps"))
def _map_jit(theta0, fn, opt, num_steps, data=None):
    if data is None:
        lp = fn
    else:
        lp = lambda t: fn(t, data)
    vg = jax.value_and_grad(lp)
    opt_state = opt.init(theta0)
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    def step(carry, _):
        theta, ostate, best_t, best_v, rejected = carry
        v, g = vg(theta)
        v32 = v.astype(jnp.float32)
        better = jnp.logical_and(v32 > best_v, jnp.isfinite(v32))
        best_t = _tmap(lambda b, t: jnp.where(better, t, b), best_t, theta)
        best_v = jnp.where(better, v32, best_v)
        updates, ostate_new = opt.update(_tmap(jnp.negative, g), ostate, theta)
        theta_new = _tmap(lambda t, u: t + u, theta, updates)
        ok = jnp.logical_and(_all_finite(theta_new), _all_finite(ostate_new))
        theta_sel = _tmap(lambda n, o: jnp.where(ok, n, o), theta_new, theta)
        ostate_sel = _tmap(lambda n, o: jnp.where(ok, n, o), ostate_new, ostate)
        return (theta_sel, ostate_sel, best_t, best_v,
                rejected + jnp.where(ok, 0, 1)), v32

    carry0 = (theta0, opt_state, theta0, neg_inf, jnp.zeros((), jnp.int32))
    (thetaF, _, best_t, best_v, rejected), trace = jax.lax.scan(
        step, carry0, None, length=num_steps
    )
    # the final iterate may beat every pre-update value in the trace
    vF = lp(thetaF).astype(jnp.float32)
    betterF = jnp.logical_and(vF > best_v, jnp.isfinite(vF))
    best_t = _tmap(lambda b, t: jnp.where(betterF, t, b), best_t, thetaF)
    best_v = jnp.where(betterF, vF, best_v)
    return MAPResult(
        theta=best_t, log_prob=best_v, final_theta=thetaF,
        log_prob_trace=trace, num_rejected=rejected,
    )


def map_estimate(
    log_prob_fn: Callable,
    theta0,
    num_steps: int = 1000,
    learning_rate: float = 1e-2,
    optimizer=None,
    data=None,
) -> MAPResult:
    """Maximize ``log_prob_fn`` from ``theta0`` — a MAP fit / warm start.

    Accepts exactly what the samplers accept: a plain ``fn(theta)``, a
    potential carrying the ``_raw_fn``/``_data`` operand protocol (the
    ``define_model_log_prob`` family — its dataset rides as a jit operand),
    or an explicit ``data=`` with ``fn(theta, data)``.  ``theta0`` may be
    flat or a parameter pytree.

    ``optimizer`` is any optax ``GradientTransformation`` (default
    ``optax.adam(learning_rate)``).  Use ``result.theta`` (best iterate,
    non-finite steps rejected branchlessly) to seed ``sample(...,
    params_init=...)`` or any ``run_*`` entry.

    reference: the notebooks' torch-optimizer warm starts, e.g.
    hamiltorch's MNIST notebook trains to a mode before sampling.
    """
    if num_steps < 1:
        raise ValueError(f"num_steps={num_steps}; must be >= 1")
    import optax

    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    from .ops.potential import resolve_potential

    if data is None:
        fn, data = resolve_potential(log_prob_fn)
    else:
        fn = log_prob_fn
    theta0 = _tmap(jnp.asarray, theta0)
    return _map_jit(theta0, fn, optimizer, num_steps, data)
