"""Riemannian-manifold HMC sampler (implicit, explicit, S3 integrators).

Behavioural spec: the RMHMC paths through the reference's ``sample`` —
momentum from N(0, G(theta)) (reference: hamiltorch/samplers.py:183-184),
the non-separable Hamiltonian (samplers.py:677-736), and the explicit-RMHMC
bias bookkeeping where the initial augmented energy 2H is halved before the
accept test and the proposal energy is a fresh unaugmented H
(samplers.py:822, 977, 989) — which is algebraically just H_old vs H_new of
the plain Riemannian Hamiltonian, the form used here.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..enums import Integrator, Metric
from ..integrators.explicit import explicit_leapfrog
from ..integrators.implicit import implicit_leapfrog
from ..integrators.midpoint import implicit_midpoint
from ..ops.metrics import RMOptions, make_rm_hamiltonian
from ..ops.potential import resolve_potential
from .driver import ChainState, MCMCConfig, MCMCResult, run_mcmc


@partial(
    jax.jit,
    static_argnames=("log_prob_fn", "config", "integrator", "opts", "ham_func",
                     "custom_metric"),
)
def _run_rmhmc_jit(key, theta0, log_prob_fn, config, integrator, opts, ham_func,
                   custom_metric=None, data=None, init_state=None,
                   init_da=None, start_iter=0):
    # data (when given) reaches the potential as a jit operand, not a baked
    # program constant; init_state/init_da/start_iter let chunked
    # (checkpoint/resume) sampling continue the schedule exactly
    if config.adapt_mass:
        raise ValueError(
            "adapt_mass is not supported for RMHMC: its metric G(theta) is "
            "position-dependent, there is no fixed mass matrix to estimate."
        )
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    semi = integrator == Integrator.S3
    rm = make_rm_hamiltonian(lp, opts, ham_func=ham_func,
                             semi_separable=semi, custom_metric=custom_metric)
    use_jitter = opts.jitter is not None
    d = theta0.shape[0]

    def transition(key, state: ChainState, step_size):
        k_mom, k_jit = jax.random.split(key)
        jitter_u = (
            jax.random.uniform(k_jit, (d,), state.theta.dtype) if use_jitter else None
        )
        p = rm.sample_momentum(k_mom, state.theta, jitter_u)
        h0 = rm.ham(state.theta, p, jitter_u)
        if integrator == Integrator.EXPLICIT:
            end = explicit_leapfrog(
                rm, opts, state.theta, p, step_size,
                config.num_steps_per_sample, jitter_u,
            )
            theta1, p1 = end.theta, end.p
            aux = {}
        elif integrator == Integrator.MIDPOINT:
            theta1, p1, fp_iters, fp_residual = implicit_midpoint(
                rm, opts, state.theta, p, step_size,
                config.num_steps_per_sample, jitter_u,
            )
            aux = {"fp_iters": fp_iters, "fp_residual": fp_residual}
        else:  # IMPLICIT or S3 use the generalized leapfrog
            theta1, p1, fp_iters, fp_residual = implicit_leapfrog(
                rm, opts, state.theta, p, step_size,
                config.num_steps_per_sample, jitter_u,
            )
            aux = {"fp_iters": fp_iters, "fp_residual": fp_residual}
        h1, logp1 = rm.ham_and_logp(theta1, p1, jitter_u)
        return ChainState(theta1, logp1, jnp.zeros_like(theta1)), h0, h1, aux

    if init_state is not None:
        state0 = init_state
    else:
        state0 = ChainState(theta0, lp(theta0), jnp.zeros_like(theta0))
    return run_mcmc(key, state0, transition, config, init_da=init_da,
                    start_iter=start_iter)


def resolve_rmhmc_options(kwargs: dict):
    """(integrator, opts, ham_func, custom_metric) from a kwargs dict —
    the keyword surface of run_rmhmc, shared by the checkpointed and
    sharded runners.  Raises TypeError on unknown keys and
    NotImplementedError on a non-RMHMC integrator."""
    kw = dict(kwargs)
    integrator = kw.pop("integrator", Integrator.IMPLICIT)
    ham_func = kw.pop("ham_func", None)
    custom_metric = kw.pop("custom_metric", None)
    softabs = kw.pop("softabs_const", None)
    opts = RMOptions(
        metric=kw.pop("metric", Metric.HESSIAN),
        jitter=kw.pop("jitter", None),
        softabs_const=softabs if softabs is not None else 1e6,
        explicit_binding_const=kw.pop("explicit_binding_const", 100.0),
        fixed_point_threshold=kw.pop("fixed_point_threshold", 1e-5),
        fixed_point_max_iterations=kw.pop("fixed_point_max_iterations", 1000),
    )
    if kw:
        raise TypeError(f"unknown RMHMC options: {sorted(kw)}")
    if integrator not in (Integrator.IMPLICIT, Integrator.EXPLICIT,
                          Integrator.S3, Integrator.MIDPOINT):
        raise NotImplementedError(f"RMHMC integrator {integrator}")
    return integrator, opts, ham_func, custom_metric


def run_rmhmc(
    key,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0,
    config: MCMCConfig,
    integrator: Integrator = Integrator.IMPLICIT,
    metric: Metric = Metric.HESSIAN,
    jitter: Optional[float] = None,
    softabs_const: Optional[float] = None,
    explicit_binding_const: float = 100.0,
    fixed_point_threshold: float = 1e-5,
    fixed_point_max_iterations: int = 1000,
    ham_func: Optional[Callable] = None,
    custom_metric: Optional[Callable] = None,
) -> MCMCResult:
    """Sample with RMHMC; fully jitted (while_loop fixed points inside scan).

    ``custom_metric``: analytic ``theta -> (D, D)`` SPD metric G(theta);
    replaces the Hessian/softabs pipeline (see ops/metrics.py).

    ``theta0`` may be a parameter PYTREE: RMHMC's metric pipeline
    (Hessian, eigendecomposition, Cholesky) is inherently flat — G is a
    dense (D, D) object — so the tree state ravels ONCE at the boundary
    and samples unravel back to (N, ...) leaves.  Unlike the Euclidean
    samplers there is no per-step flat tax to avoid: the O(D^2)/O(D^3)
    metric work dominates the O(D) ravel by orders of magnitude.
    ``ham_func``/``custom_metric``/``pass-through log_prob`` all receive
    the FLAT theta in this mode (wrap your tree potential before calling
    if you need leaf structure; see utils.pytree.ravel_pytree_fn).
    """
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
        return _run_rmhmc_tree(
            run_rmhmc, key, log_prob_fn, theta0, config,
            dict(integrator=integrator, metric=metric, jitter=jitter,
                 softabs_const=softabs_const,
                 explicit_binding_const=explicit_binding_const,
                 fixed_point_threshold=fixed_point_threshold,
                 fixed_point_max_iterations=fixed_point_max_iterations,
                 ham_func=ham_func, custom_metric=custom_metric),
        )
    theta0 = jnp.asarray(theta0)
    integrator, opts, ham_func, custom_metric = resolve_rmhmc_options(dict(
        integrator=integrator, metric=metric, jitter=jitter,
        softabs_const=softabs_const,
        explicit_binding_const=explicit_binding_const,
        fixed_point_threshold=fixed_point_threshold,
        fixed_point_max_iterations=fixed_point_max_iterations,
        ham_func=ham_func, custom_metric=custom_metric,
    ))
    lp, data = resolve_potential(log_prob_fn, None)
    return _run_rmhmc_jit(key, theta0, lp, config, integrator, opts,
                          ham_func, custom_metric, data=data)


def _run_rmhmc_tree(runner, key, log_prob_fn, theta0, config, kwargs,
                    num_chains=None, theta0_is_stacked=None):
    """Boundary-ravel adapter: run a flat RMHMC entry on a pytree state.

    The tree potential wraps as ``lp(unravel(theta))`` — evaluated once
    per Hamiltonian/gradient call, where the metric's O(D^2) AD dominates
    — and the flat (.., N, D) trace unravels back to (.., N, ...) leaves.
    The wrapper is identity-stable (make_flat_potential memo) so repeat
    calls reuse the compiled scan, and it preserves the ``_raw_fn/_data``
    operand protocol so pytree-BNN datasets ride as jit operands.
    """
    from ..ops.potential import make_flat_potential
    from ..utils.pytree import ravel_pytree_fn, stack_param_tree, unravel_last_axis_fn

    theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
    if num_chains is None:
        template = theta0
        flat0, _ = ravel_pytree_fn(template)
        runner_kwargs = {}
    else:
        template, stacked = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        # per-chain flat rows in ravel_pytree's leaf order (per-leaf
        # C-order flattens concatenated in tree order)
        flat0 = jnp.concatenate(
            [l.reshape(num_chains, -1)
             for l in jax.tree_util.tree_leaves(stacked)],
            axis=-1,
        )
        runner_kwargs = {"num_chains": num_chains}
    lp_flat = make_flat_potential(log_prob_fn, template)

    result = runner(key, lp_flat, flat0, config, **runner_kwargs, **kwargs)

    unravel_trace = unravel_last_axis_fn(template)

    return result._replace(
        samples=unravel_trace(result.samples),
        final_state=result.final_state._replace(
            theta=unravel_trace(result.final_state.theta),
            grad=unravel_trace(result.final_state.grad),
        ),
    )


def run_rmhmc_chains(
    key,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0,
    config: MCMCConfig,
    num_chains: int,
    integrator: Integrator = Integrator.IMPLICIT,
    metric: Metric = Metric.HESSIAN,
    jitter: Optional[float] = None,
    softabs_const: Optional[float] = None,
    explicit_binding_const: float = 100.0,
    fixed_point_threshold: float = 1e-5,
    fixed_point_max_iterations: int = 1000,
    ham_func: Optional[Callable] = None,
    custom_metric: Optional[Callable] = None,
    theta0_is_stacked: Optional[bool] = None,
) -> MCMCResult:
    """Vectorised independent RMHMC chains via vmap over (key, theta0).

    ``theta0``: (D,) broadcast to all chains, or (num_chains, D), or a
    parameter PYTREE (single state or (C, ...)-stacked leaves — ravelled
    once at the boundary, see :func:`run_rmhmc`).  When a SINGLE tree
    state's leading leaf dim happens to equal ``num_chains``, pass
    ``theta0_is_stacked=False`` to override the stacked auto-detection
    (same escape hatch as the SG-MCMC chain runners).  The fixed-point
    while_loops vectorise per lane (each lane iterates until the
    batch-wide condition clears), so chains in a batch wait for the slowest
    fixed point per step — still far cheaper than sequential chains.
    """
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
        return _run_rmhmc_tree(
            run_rmhmc_chains, key, log_prob_fn, theta0, config,
            dict(integrator=integrator, metric=metric, jitter=jitter,
                 softabs_const=softabs_const,
                 explicit_binding_const=explicit_binding_const,
                 fixed_point_threshold=fixed_point_threshold,
                 fixed_point_max_iterations=fixed_point_max_iterations,
                 ham_func=ham_func, custom_metric=custom_metric),
            num_chains=num_chains,
            theta0_is_stacked=theta0_is_stacked,
        )
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    keys = jax.random.split(key, num_chains)
    integrator, opts, ham_func, custom_metric = resolve_rmhmc_options(dict(
        integrator=integrator, metric=metric, jitter=jitter,
        softabs_const=softabs_const,
        explicit_binding_const=explicit_binding_const,
        fixed_point_threshold=fixed_point_threshold,
        fixed_point_max_iterations=fixed_point_max_iterations,
        ham_func=ham_func, custom_metric=custom_metric,
    ))
    lp, data = resolve_potential(log_prob_fn, None)
    return jax.vmap(
        lambda k, t: _run_rmhmc_jit(
            k, t, lp, config, integrator, opts, ham_func, custom_metric,
            data=data,
        )
    )(keys, theta0)
