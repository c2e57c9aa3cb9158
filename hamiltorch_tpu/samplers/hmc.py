"""Euclidean HMC (and step-size-adapting "NUTS" mode) on a flat potential.

Composes the driver scan with the leapfrog integrator and a mass operator.
Behavioural spec: the HMC paths of the reference's ``sample`` /
``hamiltonian`` / ``gibbs`` (reference: hamiltorch/samplers.py:850-1091,
779-816, 183-201).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..integrators.leapfrog import PhasePoint, leapfrog
from ..ops.mass import MassOperator, make_mass, make_mass_tree
from ..ops.potential import resolve_potential
from .driver import ChainState, MCMCConfig, MCMCResult, TransitionFn, run_mcmc


def hmc_transition(
    value_and_grad_fn,
    mass: MassOperator,
    num_steps: int,
) -> TransitionFn:
    """Build one HMC proposal: momentum refresh -> leapfrog -> energies."""

    def transition(key, state: ChainState, step_size):
        dtype = jax.tree_util.tree_leaves(state.theta)[0].dtype
        p = mass.sample(key, dtype=dtype)
        h0 = -state.logp + mass.kinetic(p)
        end = leapfrog(
            value_and_grad_fn,
            mass,
            PhasePoint(state.theta, p, state.logp, state.grad),
            step_size,
            num_steps,
        )
        h1 = -end.logp + mass.kinetic(end.momentum)
        return ChainState(end.theta, end.logp, end.grad), h0, h1

    return transition


def init_chain_state(log_prob_fn, theta0: jnp.ndarray) -> ChainState:
    logp, grad = jax.value_and_grad(log_prob_fn)(theta0)
    return ChainState(theta=theta0, logp=logp, grad=grad)


def _reject_tree_adapt_mass(config) -> None:
    """Dense windowed warmup accumulates flat (D, D) moments and runs a
    dense metric — flat-layout only.  Diagonal warmup works on pytree
    states (the Welford moments bridge through one flat view per draw,
    the same scheme as NUTS/ChEES)."""
    if config.adapt_mass == "dense":
        raise ValueError(
            "adapt_mass='dense' is not supported with a pytree chain state "
            "— the dense metric operates on the flat layout; pass a flat "
            "(D,) theta0, or use diagonal adaptation."
        )


@partial(jax.jit, static_argnames=("log_prob_fn", "config"))
def _run_hmc_jit(key, theta0, log_prob_fn, config, mass, init_state=None,
                 init_da=None, start_iter=0, data=None, init_warm=None,
                 collect_flags=None, end_flags=None):
    # ``data`` (when given) reaches the potential as a jit operand; closures
    # over large arrays would be embedded as program constants instead.
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    vg = jax.value_and_grad(lp)
    state = init_state if init_state is not None else init_chain_state(lp, theta0)
    windowed = bool(config.adapt_mass) and config.burn > 0
    if not windowed:
        transition = hmc_transition(vg, mass, config.num_steps_per_sample)
        return run_mcmc(key, state, transition, config, init_da=init_da,
                        start_iter=start_iter)

    # Stan-style windowed mass warmup: the metric lives in the scan carry,
    # so the transition is rebuilt from it each draw (same scheme as
    # nuts._run_nuts_jit; the machinery is samplers/warmup.py)
    from ..ops.mass import DenseMass, DiagMass, TreeMass, diag_tree_mass_view
    from ..utils.pytree import is_param_tree
    from .nuts import init_metric_seed

    dense = config.adapt_mass == "dense"
    dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
    d = sum(l.size for l in jax.tree_util.tree_leaves(theta0))
    is_tree = is_param_tree(theta0)
    seed_mass = mass.inner if isinstance(mass, TreeMass) else mass
    if init_warm is None:
        wf0, metric0 = init_metric_seed(seed_mass, d, dtype, dense)
        init_warm = (wf0, metric0, jnp.zeros((), jnp.int32))
    if is_tree:
        _leaves0 = jax.tree_util.tree_leaves(theta0)
        _tdef = jax.tree_util.tree_structure(theta0)
        _shapes = tuple(tuple(l.shape) for l in _leaves0)

    def make_transition(metric):
        if dense:
            cur = DenseMass(inv_mass=metric[0], chol_mass=metric[1])
        elif is_tree:
            # rebuild the per-leaf diagonal view once per draw (the flat
            # Welford bridge in the driver supplies the flat metric)
            cur = diag_tree_mass_view(metric, _tdef, _shapes)
        else:
            cur = DiagMass(inv_diag=metric)
        return hmc_transition(vg, cur, config.num_steps_per_sample)

    return run_mcmc(
        key, state, None, config, init_da=init_da, start_iter=start_iter,
        make_transition=make_transition, init_warm=init_warm,
        collect_flags=collect_flags, end_flags=end_flags,
    )


def run_hmc(
    key: jax.Array,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0: jnp.ndarray,
    config: MCMCConfig,
    inv_mass=None,
    pass_grad=None,
) -> MCMCResult:
    """Sample a single HMC chain; fully jit-compiled end to end.

    ``log_prob_fn`` must be hashable (a plain function or functools.partial)
    for jit caching; wrap data in closures created once.

    ``theta0`` may be a flat (D,) vector or a parameter *pytree*; with a
    pytree, the chain state (and the returned ``samples``, stacked along a
    leading draws axis per leaf) keeps the tree structure and the hot loop
    never ravels — on big models this removes the flat-layout slicing tax
    (docs/BENCHMARKS.md "Where the time goes").  ``inv_mass`` may then also
    be a matching pytree of per-leaf diagonals.
    """
    from ..utils.pytree import is_param_tree

    from .warmup import validate_adapt_mass

    if is_param_tree(theta0):
        _reject_tree_adapt_mass(config)
        theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
        mass = make_mass_tree(inv_mass, theta0)
        validate_adapt_mass(config.adapt_mass, mass.inner)
    else:
        theta0 = jnp.asarray(theta0)
        mass = make_mass(inv_mass, theta0.shape[0])
        validate_adapt_mass(config.adapt_mass, mass)
    lp, data = resolve_potential(log_prob_fn, pass_grad)
    return _run_hmc_jit(key, theta0, lp, config, mass, data=data)


def run_hmc_host_offload(
    key: jax.Array,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0: jnp.ndarray,
    config: MCMCConfig,
    inv_mass=None,
    pass_grad=None,
    chunk_size: int = 256,
) -> MCMCResult:
    """HMC whose trace streams to HOST memory chunk by chunk.

    The reference's ``store_on_GPU=False`` moves each sample to CPU per draw
    (reference: hamiltorch/samplers.py:956-959,1008-1012).  Per-draw host
    callbacks would stall the TPU pipeline, so the TPU-native equivalent
    samples in compiled chunks and offloads each chunk's trace to host,
    keeping only O(chunk) draws in HBM — a (draws x D) trace never has to
    fit on device.  The per-draw RNG folds the global draw index into the
    base key, so results are bit-identical to the unchunked run (with
    ``adapt_mass`` the chunked and unchunked programs compile differently
    and the warmup arithmetic can differ by ~1 ulp at window boundaries —
    equal to float tolerance there; re-running at the SAME chunking is
    always bitwise).

    Returns an MCMCResult whose ``samples``/``stats`` leaves are host numpy
    arrays.  Built on the sampler-agnostic chunk loop in
    ``samplers/offload.py`` (shared with the NUTS/RMHMC/splitting
    offload runners).
    """
    from ..utils.pytree import is_param_tree
    from .adaptation import da_init
    from .offload import host_offload_loop
    from .warmup import schedule_flags, validate_adapt_mass

    if is_param_tree(theta0):
        _reject_tree_adapt_mass(config)
        theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
        mass = make_mass_tree(inv_mass, theta0)
        dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
        validate_adapt_mass(config.adapt_mass, mass.inner)
    else:
        theta0 = jnp.asarray(theta0)
        mass = make_mass(inv_mass, theta0.shape[0])
        dtype = theta0.dtype
        validate_adapt_mass(config.adapt_mass, mass)
    lp, data = resolve_potential(log_prob_fn, pass_grad)
    state0 = init_chain_state(
        lp if data is None else (lambda t: lp(t, data)), theta0
    )
    windowed = bool(config.adapt_mass) and config.burn > 0
    carry0 = (state0, da_init(config.step_size, dtype=dtype), None)

    def run_chunk(cfg, n_done, carry):
        state, da, warm = carry
        cf = ef = None
        if windowed:
            # each chunk gets its slice of the GLOBAL warmup schedule; the
            # (welford, metric, da_t) carry rides result.final_warm
            cf, ef = schedule_flags(config.burn, n_done, cfg.num_samples)
        result = _run_hmc_jit(
            key, state.theta, lp, cfg, mass,
            init_state=state, init_da=da, start_iter=n_done, data=data,
            init_warm=warm, collect_flags=cf, end_flags=ef,
        )
        return result, (result.final_state, result.final_da, result.final_warm)

    return host_offload_loop(run_chunk, config, carry0, dtype, chunk_size)


def run_hmc_chains(
    key: jax.Array,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0: jnp.ndarray,
    config: MCMCConfig,
    num_chains: int,
    inv_mass=None,
    pass_grad=None,
    theta0_is_stacked: bool | None = None,
) -> MCMCResult:
    """Vectorised independent chains via vmap over (key, theta0).

    ``theta0`` may be (D,) (broadcast to all chains) or (num_chains, D), or
    a parameter pytree — single-chain (broadcast) or with a leading
    ``num_chains`` axis on every leaf.  ``theta0_is_stacked`` overrides the
    auto-detection when a single-chain leaf's first dim happens to equal
    ``num_chains``.  Replaces the reference's GIL-bound ThreadPoolExecutor
    multi-chain (reference: hamiltorch/util.py:392-404) with a single
    batched program: on TPU the chain axis becomes the leading batch
    dimension of every matmul, feeding the MXU.
    """
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
        # pytree params: leaves may be per-chain ((num_chains, ...) leading
        # axis) or single-chain (broadcast to all chains)
        from ..utils.pytree import stack_param_tree

        _reject_tree_adapt_mass(config)
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        mass = make_mass_tree(inv_mass, template)
        from .warmup import validate_adapt_mass

        validate_adapt_mass(config.adapt_mass, mass.inner)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        mass = make_mass(inv_mass, theta0.shape[-1])
        from .warmup import validate_adapt_mass

        validate_adapt_mass(config.adapt_mass, mass)
    keys = jax.random.split(key, num_chains)
    lp, data = resolve_potential(log_prob_fn, pass_grad)

    # with adapt_mass each chain runs its own windowed warmup (per-chain
    # Welford moments in the vmapped carry — single-chain Stan semantics);
    # cross-chain pooled estimation is the ensemble runners' job
    run = jax.vmap(
        lambda k, t: _run_hmc_jit(k, t, lp, config, mass, data=data),
        in_axes=(0, 0),
    )
    return run(keys, theta0)
