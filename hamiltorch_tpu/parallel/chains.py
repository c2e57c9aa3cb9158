"""Multi-chain orchestration.

Behavioural spec: the reference's entire parallelism story is a GIL-bound
ThreadPoolExecutor over per-chain closures (reference:
hamiltorch/util.py:385-404) — its own notebook shows parallel=True is
*slower* than sequential (29.9 s vs 12.9 s for 8 chains).

TPU-native replacements, in increasing scale:

* ``run_hmc_chains`` (samplers/hmc.py): vmap over the chain axis — dozens
  of chains per chip, the chain axis batched into every matmul;
* ``sample_chains_sharded`` (parallel/sharding.py): chains + data sharded
  over a device mesh with psum-reduced likelihoods.

``setup_chain`` / ``multi_chain`` are kept for API parity.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax


def setup_chain(sampler: Callable, prior: Callable, kwargs: dict) -> Callable:
    """Bind sampler + prior + kwargs into a seed -> samples closure
    (reference: hamiltorch/util.py:385-390).

    ``prior`` may take a PRNG key (JAX style) or no arguments (reference
    style, drawing from its own source of randomness).
    """

    import inspect

    # signature-based dispatch: catching TypeError would swallow errors
    # raised INSIDE a keyed prior and silently retry it with no arguments
    try:
        takes_key = len(inspect.signature(prior).parameters) >= 1
    except (TypeError, ValueError):  # builtins/partials without signatures
        takes_key = True

    def chain(seed):
        key = jax.random.key(seed) if not hasattr(seed, "dtype") else seed
        k_init, k_run = jax.random.split(key)
        params_init = prior(k_init) if takes_key else prior()
        return sampler(params_init=params_init, key=k_run, **kwargs)

    return chain


def multi_chain(chain: Callable, num_workers: int, seeds: Sequence, parallel: bool = False):
    """Run ``chain`` over seeds (reference: hamiltorch/util.py:392-404).

    Chains run sequentially regardless of ``parallel`` — each chain is
    already a single fused device program, and host threads cannot speed
    that up (they could not in the reference either).  For true parallel
    chains use ``run_hmc_chains`` (vmap) or the mesh-sharded runner.
    """
    return [chain(s) for s in seeds]
