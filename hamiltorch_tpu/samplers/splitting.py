"""Split-HMC sampler: driver scan over symmetric-splitting trajectories.

Behavioural spec: the splitting path through the reference's ``sample`` —
the Hamiltonian sums all M terms (reference: hamiltorch/samplers.py:787-796)
and the leapfrog dispatches to a splitting branch (samplers.py:465-603).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp

from ..enums import Integrator
from ..integrators.splitting import splitting_leapfrog
from ..ops.mass import make_mass
from .driver import ChainState, MCMCConfig, MCMCResult, run_mcmc


def terms_from_list(log_prob_funcs: Sequence[Callable]) -> Callable:
    """Normalise a Python list of per-subset closures (the reference's
    splitting contract, samplers.py:466-467) into one ``term_fn(theta, m)``
    via ``lax.switch`` — each closure traced once."""
    fns = [lambda t, f=f: f(t) for f in log_prob_funcs]

    def term_fn(theta, m):
        return jax.lax.switch(m, fns, theta)

    return term_fn


def stacked_total_logp(term_fn, num_terms: int, data):
    """Callable ``theta -> sum of all stacked terms`` (a lax.scan over the
    term axis) — the value that seeds and updates ``ChainState.logp``.
    Shared by the sampler and the checkpointed runner: the two must agree
    bit-exactly or a resumed chain's first Metropolis test would use a
    different cached log-prob than the uninterrupted run."""
    fn = term_fn if data is None else (lambda t, m: term_fn(t, m, data))

    def total_logp(theta):
        dtype = jax.tree_util.tree_leaves(theta)[0].dtype
        lp, _ = jax.lax.scan(
            lambda acc, m: (acc + fn(theta, m), None),
            jnp.zeros((), dtype), jnp.arange(num_terms),
        )
        return lp

    return total_logp


@partial(jax.jit, static_argnames=("raw_term_fn", "num_terms", "config",
                                   "integrator", "raw_pass_grad"))
def _run_split_jit(key, theta0, raw_term_fn, num_terms, config, integrator, mass,
                   data, raw_pass_grad=None, init_state=None, init_da=None,
                   start_iter=0):
    # ``data`` rides through jit as an operand so stacked minibatch arrays
    # are device buffers, not constants baked into the program.
    if config.adapt_mass:
        raise ValueError(
            "adapt_mass is not supported for splitting integrators — pass a "
            "fixed inv_mass, or estimate one with run_hmc(adapt_mass=True) "
            "first."
        )
    if data is None:
        term_fn = raw_term_fn
        pass_grad_fn = raw_pass_grad
    else:
        term_fn = lambda theta, m: raw_term_fn(theta, m, data)
        pass_grad_fn = (
            None if raw_pass_grad is None
            else (lambda theta, m: raw_pass_grad(theta, m, data))
        )
    # user-supplied per-term gradients replace autograd for the kicks (the
    # reference REFUSES pass_grad for splitting, samplers.py:468-469; this
    # is an extension); the MH energies still use exact term values
    grad_term = pass_grad_fn if pass_grad_fn is not None else jax.grad(term_fn, argnums=0)

    total_logp = stacked_total_logp(raw_term_fn, num_terms, data)

    _tmap = jax.tree_util.tree_map

    def transition(key, state: ChainState, step_size):
        k_mom, k_perm = jax.random.split(key)
        dtype = jax.tree_util.tree_leaves(state.theta)[0].dtype
        p = mass.sample(k_mom, dtype=dtype)
        h0 = -state.logp + mass.kinetic(p)
        perm = None
        if integrator == Integrator.SPLITTING_RAND:
            # one permutation per trajectory (reference draws it once per
            # leapfrog call, samplers.py:550)
            perm = jax.random.permutation(k_perm, num_terms)
        theta, p_new = splitting_leapfrog(
            grad_term, num_terms, mass, state.theta, p, step_size,
            config.num_steps_per_sample, integrator, perm=perm,
        )
        logp1 = total_logp(theta)
        h1 = -logp1 + mass.kinetic(p_new)
        return ChainState(theta, logp1, _tmap(jnp.zeros_like, theta)), h0, h1

    if init_state is not None:
        state0 = init_state
    else:
        state0 = ChainState(
            theta0, total_logp(theta0), _tmap(jnp.zeros_like, theta0)
        )
    return run_mcmc(key, state0, transition, config, init_da=init_da,
                    start_iter=start_iter)


def run_split_hmc_stacked(
    key,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config: MCMCConfig,
    integrator: Integrator = Integrator.SPLITTING,
    inv_mass=None,
    data=None,
    pass_grad=None,
) -> MCMCResult:
    """Split HMC over a stacked term function.

    ``term_fn(theta, m)`` when ``data is None``, else ``term_fn(theta, m,
    data)`` with ``data`` (e.g. stacked (M, B, ...) minibatch arrays)
    passed as a jit operand — large datasets must go through ``data``
    rather than a closure, or they are embedded as program constants.

    ``pass_grad``: optional user gradient for the kicks, same signature as
    ``term_fn`` but returning the (D,) per-term gradient.  Extension: the
    reference refuses pass_grad for splitting (samplers.py:468-469).

    ``theta0`` may also be a parameter PYTREE (with ``term_fn`` taking the
    tree) — the hot kick/drift sweeps then update leaves in their natural
    shapes, exactly where the no-flat-tax design pays most (splitting is
    the big-model minibatch sampler).  Diagonal metrics only (``inv_mass``
    None / flat (D,) / per-leaf pytree of diagonals), as every pytree
    entry point.
    """
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
        from ..ops.mass import make_diag_mass_tree

        theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
        mass = make_diag_mass_tree(inv_mass, theta0, "split HMC")
    else:
        theta0 = jnp.asarray(theta0)
        mass = make_mass(inv_mass, theta0.shape[0])
    return _run_split_jit(
        key, theta0, term_fn, num_terms, config, integrator, mass, data,
        raw_pass_grad=pass_grad,
    )


def run_split_hmc_chains(
    key,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config: MCMCConfig,
    num_chains: int,
    integrator: Integrator = Integrator.SPLITTING,
    inv_mass=None,
    data=None,
    pass_grad=None,
) -> MCMCResult:
    """Vectorised independent split-HMC chains via vmap over (key, theta0).

    Stacked-data contract as :func:`run_split_hmc_stacked`; the (M, B, ...)
    minibatch arrays are shared (not vmapped) across chains, so on TPU the
    chain axis batches every per-term matmul.  ``theta0`` may be a
    parameter PYTREE — single state (broadcast to ``num_chains``) or
    (C, ...)-stacked leaves.
    """
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
        from ..ops.mass import make_diag_mass_tree
        from ..utils.pytree import stack_param_tree

        template, theta0 = stack_param_tree(theta0, num_chains)
        mass = make_diag_mass_tree(inv_mass, template, "split HMC")
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        mass = make_mass(inv_mass, theta0.shape[-1])
    keys = jax.random.split(key, num_chains)
    return jax.vmap(
        lambda k, t: _run_split_jit(
            k, t, term_fn, num_terms, config, integrator, mass, data,
            raw_pass_grad=pass_grad,
        )
    )(keys, theta0)


def grads_from_list(grad_fns: Sequence[Callable]) -> Callable:
    """Per-term gradient closures -> one ``grad_fn(theta, m)`` via switch."""
    fns = [lambda t, f=f: f(t) for f in grad_fns]

    def grad_fn(theta, m):
        return jax.lax.switch(m, fns, theta)

    return grad_fn


def run_split_hmc(
    key,
    log_prob_funcs: List[Callable],
    theta0,
    config: MCMCConfig,
    integrator: Integrator = Integrator.SPLITTING,
    inv_mass=None,
    pass_grad=None,
) -> MCMCResult:
    """Split HMC over a list of per-subset log-prob closures (parity path).

    ``pass_grad``: optional list of per-term gradient callables (one per
    log-prob term); an extension past the reference's refusal.
    """
    term_fn = terms_from_list(log_prob_funcs)
    grad_fn = None
    if pass_grad is not None:
        if not isinstance(pass_grad, (list, tuple)) or len(pass_grad) != len(log_prob_funcs):
            raise RuntimeError(
                "For splitting, pass_grad must be a list of per-term gradient "
                "callables matching log_prob_funcs."
            )
        grad_fn = grads_from_list(pass_grad)
    return run_split_hmc_stacked(
        key, term_fn, len(log_prob_funcs), theta0, config,
        integrator=integrator, inv_mass=inv_mass, pass_grad=grad_fn,
    )
