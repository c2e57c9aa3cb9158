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


@partial(jax.jit, static_argnames=("raw_term_fn", "num_terms", "config", "integrator"))
def _run_split_jit(key, theta0, raw_term_fn, num_terms, config, integrator, mass, data):
    # ``data`` rides through jit as an operand so stacked minibatch arrays
    # are device buffers, not constants baked into the program.
    if data is None:
        term_fn = raw_term_fn
    else:
        term_fn = lambda theta, m: raw_term_fn(theta, m, data)
    grad_term = jax.grad(term_fn, argnums=0)

    def total_logp(theta):
        def body(acc, m):
            return acc + term_fn(theta, m), None

        lp, _ = jax.lax.scan(body, jnp.zeros((), theta.dtype), jnp.arange(num_terms))
        return lp

    def transition(key, state: ChainState, step_size):
        k_mom, k_perm = jax.random.split(key)
        p = mass.sample(k_mom, dtype=state.theta.dtype)
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
        return ChainState(theta, logp1, jnp.zeros_like(theta)), h0, h1

    state0 = ChainState(theta0, total_logp(theta0), jnp.zeros_like(theta0))
    return run_mcmc(key, state0, transition, config)


def run_split_hmc_stacked(
    key,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config: MCMCConfig,
    integrator: Integrator = Integrator.SPLITTING,
    inv_mass=None,
    data=None,
) -> MCMCResult:
    """Split HMC over a stacked term function.

    ``term_fn(theta, m)`` when ``data is None``, else ``term_fn(theta, m,
    data)`` with ``data`` (e.g. stacked (M, B, ...) minibatch arrays)
    passed as a jit operand — large datasets must go through ``data``
    rather than a closure, or they are embedded as program constants.
    """
    theta0 = jnp.asarray(theta0)
    mass = make_mass(inv_mass, theta0.shape[0])
    return _run_split_jit(
        key, theta0, term_fn, num_terms, config, integrator, mass, data
    )


def run_split_hmc(
    key,
    log_prob_funcs: List[Callable],
    theta0,
    config: MCMCConfig,
    integrator: Integrator = Integrator.SPLITTING,
    inv_mass=None,
) -> MCMCResult:
    """Split HMC over a list of per-subset log-prob closures (parity path)."""
    term_fn = terms_from_list(log_prob_funcs)
    return run_split_hmc_stacked(
        key, term_fn, len(log_prob_funcs), theta0, config,
        integrator=integrator, inv_mass=inv_mass,
    )
