"""Chunked host offload of sample traces (``store_on_GPU=False``).

The reference moves every sample to CPU per draw
(reference: hamiltorch/samplers.py:956-959,1008-1012,1069-1076 — for ALL
its samplers).  Per-draw host callbacks would stall the TPU pipeline, so
the TPU-native equivalent samples in compiled chunks and offloads each
chunk's trace to host numpy, keeping only O(chunk) draws in HBM.  Per-draw
RNG folds the GLOBAL draw index into the base key, so the chunked stream is
identical to the unchunked one; re-running at the same chunking is bitwise.

This module holds the sampler-agnostic loop; each sampler exposes a thin
``run_*_host_offload`` built on it (``samplers/hmc.py`` for plain HMC,
:func:`run_nuts_host_offload`, :func:`run_rmhmc_host_offload`,
:func:`run_split_hmc_host_offload` here), and the façade routes
``hamiltorch_tpu.sample(..., store_on_GPU=False)`` through them for every
sampler the reference supports.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .driver import MCMCResult, MCMCStats


def host_offload_loop(
    run_chunk: Callable,
    config,
    carry,
    dtype,
    chunk_size: int = 256,
) -> MCMCResult:
    """Generic chunked offload driver.

    ``run_chunk(cfg, n_done, carry) -> (MCMCResult, new_carry)`` runs one
    compiled chunk of ``cfg.num_samples`` draws continuing from ``carry``
    at global draw offset ``n_done``.  Each chunk's samples/stats are
    fetched to host before the next chunk runs; the returned MCMCResult's
    ``samples``/``stats`` leaves are host numpy arrays.
    """
    import numpy as np

    thin = max(getattr(config, "thin", 1), 1)
    chunk_size = max(thin, (chunk_size // thin) * thin)
    host_samples, host_stats, chunk_accs = [], [], []
    n_done = 0
    result = None
    while n_done < config.num_samples:
        this_chunk = min(chunk_size, config.num_samples - n_done)
        cfg = dataclasses.replace(config, num_samples=this_chunk)
        result, carry = run_chunk(cfg, n_done, carry)
        host_samples.append(jax.device_get(result.samples))
        host_stats.append(jax.device_get(result.stats))
        chunk_accs.append((float(result.acc_rate), this_chunk))
        n_done += this_chunk

    samples = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs), *host_samples
    )
    stats = MCMCStats(
        *(np.concatenate([getattr(s, f) for s in host_stats])
          for f in MCMCStats._fields)
    )
    # transition-weighted mean of exact per-chunk rates (with thin > 1 the
    # stacked stats only carry each window's last transition)
    acc_rate = sum(a * n for a, n in chunk_accs) / max(config.num_samples, 1)
    return MCMCResult(
        samples=samples,
        stats=stats,
        final_step_size=result.final_step_size,
        acc_rate=jnp.asarray(acc_rate, dtype),
        final_state=result.final_state,
        final_da=result.final_da,
        final_warm=result.final_warm,
    )


def run_nuts_host_offload(
    key,
    log_prob_fn,
    theta0,
    config,  # NUTSConfig
    inv_mass=None,
    pass_grad=None,
    chunk_size: int = 256,
) -> MCMCResult:
    """Tree-doubling NUTS whose trace streams to host chunk by chunk
    (the reference's ``store_on_GPU=False`` for its NUTS mode,
    samplers.py:956-959).  ``adapt_mass`` windowed warmup threads its
    (Welford, metric, da_t) carry across chunks with each chunk's slice of
    the GLOBAL window schedule, exactly as ``run_nuts_checkpointed``.
    Returns an MCMCResult with host-numpy ``samples``/``stats``."""
    from ..ops.mass import make_mass
    from ..ops.potential import resolve_potential
    from .hmc import init_chain_state
    from .nuts import (
        _run_nuts_jit,
        _tree_nuts_mass,
        init_metric_seed,
        validate_nuts_mass,
    )
    from .warmup import schedule_flags
    from ..utils.pytree import is_param_tree
    from .adaptation import da_init

    if is_param_tree(theta0):
        theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
        mass = _tree_nuts_mass(inv_mass, theta0, config)
        seed_mass = mass.inner
    else:
        theta0 = jnp.asarray(theta0)
        mass = make_mass(inv_mass, theta0.shape[0])
        seed_mass = mass
        validate_nuts_mass(config, mass)
    lp, data = resolve_potential(log_prob_fn, pass_grad)
    leaves0 = jax.tree_util.tree_leaves(theta0)
    d = sum(int(l.size) for l in leaves0)
    dtype = leaves0[0].dtype
    windowed = bool(config.adapt_mass) and config.burn > 0
    # dense only when the warmup actually runs (burn > 0), matching
    # _run_nuts_jit — otherwise two dead (d, d) matrices would thread
    # through every chunk's carry (~120 GB at the flagship width)
    wf0, metric0 = init_metric_seed(
        seed_mass, d, dtype, dense=windowed and config.adapt_mass == "dense"
    )
    state0 = init_chain_state(
        lp if data is None else (lambda t: lp(t, data)), theta0
    )
    carry0 = (state0, da_init(config.step_size, dtype=dtype),
              (wf0, metric0, jnp.zeros((), jnp.int32)))

    def run_chunk(cfg, n_done, carry):
        state, da, warm = carry
        collect, end = schedule_flags(
            config.burn if windowed else 0, n_done, cfg.num_samples
        )
        result, _ = _run_nuts_jit(
            key, state.theta, lp, cfg, mass,
            init_state=state, init_da=da, start_iter=n_done, data=data,
            init_warm=warm, collect_flags=collect, end_flags=end,
        )
        return result, (result.final_state, result.final_da, result.final_warm)

    return host_offload_loop(run_chunk, config, carry0, dtype, chunk_size)


def run_rmhmc_host_offload(
    key,
    log_prob_fn,
    theta0,
    config,  # MCMCConfig
    chunk_size: int = 64,
    **rmhmc_kwargs,
) -> MCMCResult:
    """RMHMC with the trace streamed to host chunk by chunk (the
    reference's ``store_on_GPU=False`` for RMHMC, samplers.py:1008-1012).
    ``rmhmc_kwargs`` as ``run_rmhmc`` (integrator, metric, jitter, ...).
    Default chunk is smaller than HMC's: RMHMC draws are orders of
    magnitude more expensive, so chunks of 64 already amortise dispatch."""
    from ..ops.potential import resolve_potential
    from .adaptation import da_init
    from .driver import ChainState
    from .rmhmc import _run_rmhmc_jit, resolve_rmhmc_options

    theta0 = jnp.asarray(theta0)
    lp, data = resolve_potential(log_prob_fn, None)
    integrator, opts, ham_func, custom_metric = resolve_rmhmc_options(
        rmhmc_kwargs
    )
    fn = lp if data is None else (lambda t: lp(t, data))
    carry0 = (
        ChainState(theta0, fn(theta0), jnp.zeros_like(theta0)),
        da_init(config.step_size, dtype=theta0.dtype),
    )

    def run_chunk(cfg, n_done, carry):
        state, da = carry
        result = _run_rmhmc_jit(
            key, state.theta, lp, cfg, integrator, opts, ham_func,
            custom_metric, data=data, init_state=state, init_da=da,
            start_iter=n_done,
        )
        return result, (result.final_state, result.final_da)

    return host_offload_loop(run_chunk, config, carry0, theta0.dtype,
                             chunk_size)


def run_split_hmc_host_offload(
    key,
    term_fn,
    num_terms: int,
    theta0,
    config,  # MCMCConfig
    integrator=None,
    inv_mass=None,
    data=None,
    pass_grad=None,
    chunk_size: int = 256,
) -> MCMCResult:
    """Split HMC with the trace streamed to host chunk by chunk (the
    reference's ``store_on_GPU=False`` offload inside its splitting
    branches, samplers.py:542-547).  Contract as
    ``run_split_hmc_stacked``; ``theta0`` may be a parameter pytree."""
    from ..enums import Integrator
    from ..ops.mass import make_mass
    from .adaptation import da_init
    from .driver import ChainState
    from .splitting import _run_split_jit, stacked_total_logp
    from ..utils.pytree import is_param_tree

    integrator = Integrator.SPLITTING if integrator is None else integrator
    if is_param_tree(theta0):
        from ..ops.mass import make_diag_mass_tree

        theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
        mass = make_diag_mass_tree(inv_mass, theta0, "split HMC")
    else:
        theta0 = jnp.asarray(theta0)
        mass = make_mass(inv_mass, theta0.shape[0])
    dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
    total_logp = stacked_total_logp(term_fn, num_terms, data)
    carry0 = (
        ChainState(theta0, total_logp(theta0),
                   jax.tree_util.tree_map(jnp.zeros_like, theta0)),
        da_init(config.step_size, dtype=dtype),
    )

    def run_chunk(cfg, n_done, carry):
        state, da = carry
        result = _run_split_jit(
            key, state.theta, term_fn, num_terms, cfg, integrator, mass,
            data, raw_pass_grad=pass_grad, init_state=state, init_da=da,
            start_iter=n_done,
        )
        return result, (result.final_state, result.final_da)

    return host_offload_loop(run_chunk, config, carry0, dtype, chunk_size)
