"""hamiltorch-compatible façade.

``sample`` mirrors the reference entry point's signature and semantics
(reference: hamiltorch/samplers.py:850-1091) so user code ports by changing
the import, while everything underneath is the jit/scan machinery.

Parity notes:

* returns include the initial params followed by the chain state for each
  post-burn draw (the reference appends for ``n > burn``; samplers.py:1007),
  so downstream ``samples[1:]`` slicing works unchanged.  The return type is
  a (num_kept, D) jax array — it supports ``len``/indexing/iteration like
  the reference's list of 1-d tensors;
* ``debug=2`` returns ``(samples, final_step_size)`` under NUTS and
  ``(samples, acc_rate)`` otherwise (samplers.py:1086-1089);
* randomness: pass ``key=`` explicitly, or the module-level seed set by
  ``set_random_seed`` is used (replacing the reference's global torch RNG).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .enums import Integrator, Metric, Sampler
from .samplers.driver import MCMCConfig, MCMCResult
from .samplers.hmc import run_hmc
from .utils.rng import next_key

_SPLITTING = (Integrator.SPLITTING, Integrator.SPLITTING_RAND, Integrator.SPLITTING_KMID)


def _kept_samples(params_init: jnp.ndarray, result: MCMCResult, burn: int,
                  thin: int = 1) -> jnp.ndarray:
    """[init] + states for draws n > burn (reference: samplers.py:1007).

    With ``thin > 1`` the result rows are already thinned: kept row ``b``
    holds the state after transition ``(b+1)*thin - 1``, so keep the rows
    whose transition index exceeds ``burn`` (smallest such b is
    ceil((burn+2)/thin) - 1; for thin=1 this is burn+1).
    """
    thin = max(thin, 1)
    keep_from = max(0, -(-(burn + 2) // thin) - 1)  # burn=-1: keep all
    import numpy as np

    if isinstance(result.samples, np.ndarray):  # host-offloaded trace stays on host
        return np.concatenate([np.asarray(params_init)[None, :],
                               result.samples[keep_from:]], axis=0)
    return jnp.concatenate([params_init[None, :], result.samples[keep_from:]], axis=0)


def sample(
    log_prob_func,
    params_init,
    num_samples: int = 10,
    num_steps_per_sample: int = 10,
    step_size: float = 0.1,
    burn: int = 0,
    jitter: Optional[float] = None,
    inv_mass=None,
    normalizing_const: float = 1.0,  # dead in the reference too: every use is commented out (samplers.py:106,109,126)
    softabs_const: Optional[float] = None,
    explicit_binding_const: float = 100.0,
    fixed_point_threshold: float = 1e-5,
    fixed_point_max_iterations: int = 1000,
    # accepted for signature parity, deliberately UNUSED: the reference
    # redraws metric jitter up to this many times on NaN gradients
    # (samplers.py:322-333,373-382); here jitter is fixed per transition and
    # a NaN energy is a rejection — statistically cleaner and branchless
    # (documented deviation, docs/DESIGN.md #2)
    jitter_max_tries: int = 10,
    sampler: Sampler = Sampler.HMC,
    integrator: Integrator = Integrator.IMPLICIT,
    metric: Metric = Metric.HESSIAN,
    debug: int = 0,
    desired_accept_rate: float = 0.8,
    store_on_GPU: bool = True,
    pass_grad=None,
    verbose: bool = True,
    key: Optional[jax.Array] = None,
    adapt_mass: bool = False,
    thin: int = 1,
    progress_every: int = 0,
):
    """Drop-in equivalent of the reference ``hamiltorch.sample``.

    Extensions past the reference signature (all optional, defaults match
    reference semantics): ``key`` (explicit PRNG key), ``adapt_mass``
    (Stan-style windowed mass warmup — ``Sampler.NUTS`` and the plain-HMC
    samplers; False/True/'diag'/'dense'), ``thin`` (keep every thin-th
    draw; ``num_samples`` counts transitions and must divide by thin, as
    must ``burn``), ``progress_every`` (host progress line every N draws).
    """
    params_init = jnp.asarray(params_init)
    if params_init.ndim != 1:
        raise RuntimeError("params_init must be a 1d array.")
    # a NaN/Inf start would 'run' to an all-NaN chain (every proposal has
    # NaN energy and rejects); catch the typo at the door when concrete
    if not isinstance(params_init, jax.core.Tracer) and not bool(
        jnp.all(jnp.isfinite(params_init))
    ):
        raise RuntimeError("params_init contains non-finite values.")
    if burn >= num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    if thin > 1 and burn > 0 and burn % thin:
        raise RuntimeError("burn must be divisible by thin.")
    if adapt_mass and (
        sampler == Sampler.RMHMC or integrator in _SPLITTING
    ):
        raise RuntimeError(
            "adapt_mass (windowed mass warmup) is available for Sampler.NUTS "
            "and the plain-HMC samplers (or the native run_hmc/run_nuts/"
            "run_chees APIs)."
        )
    if adapt_mass and sampler in (Sampler.HMC, Sampler.HMC_NUTS) and burn <= 0:
        raise RuntimeError("adapt_mass requires burn > 0 (the warmup phase).")
    if key is None:
        key = next_key()

    if sampler == Sampler.HMC_NUTS and burn == 0:
        raise RuntimeError("burn must be greater than 0 for NUTS.")
    adapt = sampler == Sampler.HMC_NUTS or (sampler == Sampler.NUTS and burn > 0)

    # tuple log-prob: the reference differentiates element [0] of a tuple
    # return (collect_gradients, samplers.py:54-58); probe the output
    # structure abstractly and unwrap, preserving the _raw_fn/_data
    # jit-operand protocol
    if callable(log_prob_func) and not isinstance(log_prob_func, (list, tuple)):
        try:
            out_struct = jax.eval_shape(log_prob_func, params_init)
        except Exception:
            out_struct = None
        if isinstance(out_struct, (tuple, list)) and len(out_struct) >= 1:
            orig = log_prob_func
            log_prob_func = lambda t: orig(t)[0]
            raw = getattr(orig, "_raw_fn", None)
            if raw is not None:
                log_prob_func._raw_fn = lambda t, data: raw(t, data)[0]
                log_prob_func._data = orig._data

    config = MCMCConfig(
        num_samples=num_samples,
        num_steps_per_sample=num_steps_per_sample,
        step_size=step_size,
        burn=burn,
        adapt_step_size=adapt,
        desired_accept_rate=desired_accept_rate,
        thin=thin,
        progress_every=progress_every,
        adapt_mass=adapt_mass,
    )

    if isinstance(log_prob_func, (list, tuple)) and not (
        sampler in (Sampler.HMC, Sampler.HMC_NUTS) and integrator in _SPLITTING
    ):
        raise RuntimeError(
            "A list of log_prob functions requires Sampler.HMC with a "
            "SPLITTING integrator (reference: samplers.py:466-467)."
        )

    if sampler == Sampler.NUTS:
        from .samplers.nuts import NUTSConfig, run_nuts

        nuts_config = NUTSConfig(
            num_samples=num_samples,
            step_size=step_size,
            burn=max(burn, 0),
            adapt_step_size=burn > 0,
            desired_accept_rate=desired_accept_rate,
            adapt_mass=adapt_mass,
            progress_every=progress_every,
            thin=thin,
        )
        if store_on_GPU:
            result, _ = run_nuts(
                key, log_prob_func, params_init, nuts_config,
                inv_mass=inv_mass, pass_grad=pass_grad,
            )
        else:
            # reference store_on_GPU=False streams every sampler's trace to
            # host per draw (samplers.py:956-959); here per compiled chunk
            from .samplers.offload import run_nuts_host_offload

            result = run_nuts_host_offload(
                key, log_prob_func, params_init, nuts_config,
                inv_mass=inv_mass, pass_grad=pass_grad,
            )
    elif sampler in (Sampler.HMC, Sampler.HMC_NUTS) and integrator not in _SPLITTING:
        if store_on_GPU:
            result = run_hmc(
                key, log_prob_func, params_init, config,
                inv_mass=inv_mass, pass_grad=pass_grad,
            )
        else:
            # reference store_on_GPU=False: stream the trace to host per
            # draw (samplers.py:956-959); here per compiled chunk
            from .samplers.hmc import run_hmc_host_offload

            result = run_hmc_host_offload(
                key, log_prob_func, params_init, config,
                inv_mass=inv_mass, pass_grad=pass_grad,
            )
    elif sampler in (Sampler.HMC, Sampler.HMC_NUTS) and integrator in _SPLITTING:
        if not isinstance(log_prob_func, (list, tuple)):
            raise RuntimeError("For splitting log_prob_func must be list of functions")
        if pass_grad is not None and not isinstance(pass_grad, (list, tuple)):
            # the reference refuses pass_grad for splitting outright
            # (samplers.py:468-469); the extension here accepts PER-TERM
            # gradients, which is the only well-defined form
            raise RuntimeError(
                "Passing user-determined gradients for splitting requires a "
                "list of per-term gradient callables (one per log_prob term)."
            )
        from .samplers.splitting import run_split_hmc

        if store_on_GPU:
            result = run_split_hmc(
                key, list(log_prob_func), params_init, config,
                integrator=integrator, inv_mass=inv_mass,
                pass_grad=None if pass_grad is None else list(pass_grad),
            )
        else:
            # chunked host offload of the trace (reference streams inside
            # its splitting branches, samplers.py:542-547)
            from .samplers.offload import run_split_hmc_host_offload
            from .samplers.splitting import grads_from_list, terms_from_list

            if pass_grad is not None and len(pass_grad) != len(log_prob_func):
                # same validation as run_split_hmc: lax.switch would CLAMP
                # out-of-range term indices onto the last gradient fn and
                # sample silently wrong
                raise RuntimeError(
                    "For splitting, pass_grad must be a list of per-term "
                    "gradient callables matching log_prob_funcs."
                )
            result = run_split_hmc_host_offload(
                key, terms_from_list(list(log_prob_func)),
                len(log_prob_func), params_init, config,
                integrator=integrator, inv_mass=inv_mass,
                pass_grad=(
                    None if pass_grad is None
                    else grads_from_list(list(pass_grad))
                ),
            )
    elif sampler == Sampler.RMHMC:
        if pass_grad is not None:
            # reference parity (samplers.py:309-310,389-390): a user-supplied
            # d logp/d theta cannot stand in for the Riemannian Hamiltonian's
            # gradient, which includes metric-derivative terms
            raise RuntimeError("Passing user-determined gradients not implemented for RMHMC")
        from .samplers.rmhmc import run_rmhmc

        rm_kwargs = dict(
            integrator=integrator, metric=metric,
            jitter=jitter, softabs_const=softabs_const,
            explicit_binding_const=explicit_binding_const,
            fixed_point_threshold=fixed_point_threshold,
            fixed_point_max_iterations=fixed_point_max_iterations,
        )
        if store_on_GPU:
            result = run_rmhmc(key, log_prob_func, params_init, config,
                               **rm_kwargs)
        else:
            # chunked host offload (reference RMHMC honours store_on_GPU
            # through the shared driver, samplers.py:1008-1012)
            from .samplers.offload import run_rmhmc_host_offload

            result = run_rmhmc_host_offload(
                key, log_prob_func, params_init, config, **rm_kwargs
            )
    else:
        raise NotImplementedError(f"sampler={sampler}, integrator={integrator}")

    samples = _kept_samples(params_init, result, burn, thin=thin)
    if debug == 1 and hasattr(result, "stats"):
        # the reference's debug=1 prints per-draw Hamiltonians in-loop
        # (samplers.py:1001-1006); printing from inside a scan would stall
        # the device, so the same lines are emitted from the stats afterwards
        import numpy as np

        h0s = np.asarray(result.stats.energy_old)
        h1s = np.asarray(result.stats.energy_new)
        accs = np.asarray(result.stats.accepted)
        for i in range(h0s.shape[0]):
            print(
                f"Step: {i}, Current Hamiltonian: {h0s[i]:.4f}, "
                f"Proposed Hamiltonian: {h1s[i]:.4f}, "
                f"{'accepted' if accs[i] else 'rejected'}"
            )
    if verbose:
        print(f"Acceptance Rate {float(result.acc_rate):.2f}")

    if adapt and debug == 2:
        return samples, float(result.final_step_size)
    if debug == 2:
        return samples, float(result.acc_rate)
    return samples
