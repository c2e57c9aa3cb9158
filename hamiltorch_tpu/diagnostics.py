"""Convergence diagnostics: effective sample size, split-R-hat, summaries.

The reference has no diagnostics at all (its only observability is a
progress bar and an acceptance-rate print — reference: hamiltorch/util.py:
25-89, samplers.py:1085).  These are the SURVEY.md §7 extensions: ESS via
FFT autocovariance with Geyer's initial-monotone-sequence truncation, and
split-R-hat (Gelman et al., BDA3 / Vehtari et al. 2021), all jittable.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def as_flat_samples(samples, like=None) -> jnp.ndarray:
    """Canonicalise a trace to a (C, N, D) / (N, D) matrix.

    Arrays pass through.  A parameter PYTREE trace (as the pytree-native
    ``run_hmc``/``run_hmc_chains`` return: leaves (N, *shape) or
    (C, N, *shape)) flattens each leaf's parameter dims and concatenates
    leaves in tree order — the same per-draw layout ``tree_ravel`` gives.

    ``like``: the theta0 pytree (or any same-structure template) pins how
    many leading axes are chain/draw axes.  Without it the split is
    inferred only when exactly ONE reading is consistent: leaves that
    disagree at their second dim (or any 1-d leaf) force the (N, …)
    reading; when every leaf also shares its first TWO dims, both
    (N, …) and (C, N, …) fit and the call raises — pass ``like=`` there
    (a one-leaf 2-d+ trace is always in that ambiguous class).

    Sub-f32 traces (``trace_dtype="bfloat16"`` storage) upcast to f32:
    the FFT autocovariances and rank statistics need full precision even
    when the stored samples don't.
    """

    def _f32_floor(x):
        if jnp.issubdtype(x.dtype, jnp.floating) and jnp.finfo(x.dtype).bits < 32:
            return x.astype(jnp.float32)
        return x

    if hasattr(samples, "ndim"):
        return _f32_floor(samples)
    leaves = jax.tree_util.tree_leaves(samples)
    if like is not None:
        t_leaves = jax.tree_util.tree_leaves(like)
        extra = leaves[0].ndim - t_leaves[0].ndim
        if extra not in (1, 2):
            raise ValueError(
                f"trace leaves have {extra} extra leading dims vs the "
                "template; expected 1 (draws) or 2 (chains, draws)"
            )
    else:
        lead2 = leaves[0].shape[:2]
        two = all(l.ndim >= 2 and l.shape[:2] == lead2 for l in leaves)
        if two:
            # the single-chain (N, …) reading also fits any such trace —
            # silently picking (C, N, …) misreads one-leaf and
            # coincidentally-aligned traces into garbage statistics
            raise ValueError(
                "ambiguous pytree trace (every leaf shares its first two "
                "dims, so both (N, ...) and (chains, N, ...) readings "
                "fit): pass like=theta0 to pin the chain/draw axes"
            )
        extra = 1
    if extra == 1:
        mats = [l.reshape(l.shape[0], -1) for l in leaves]
    else:
        mats = [l.reshape(l.shape[0], l.shape[1], -1) for l in leaves]
    return _f32_floor(jnp.concatenate(mats, axis=-1))


def _autocovariance(x: jnp.ndarray) -> jnp.ndarray:
    """Biased autocovariance of a 1-d series via FFT, lags 0..N-1."""
    n = x.shape[0]
    xc = x - jnp.mean(x)
    nfft = 2 * n  # zero-padding to avoid circular wrap
    f = jnp.fft.rfft(xc, nfft)
    acov = jnp.fft.irfft(f * jnp.conj(f), nfft)[:n]
    return acov / n


def effective_sample_size(samples: jnp.ndarray, like=None) -> jnp.ndarray:
    """ESS per dimension.

    ``samples``: (num_chains, num_draws, D) or (num_draws, D).  Uses the
    multi-chain estimator: mean of within-chain autocovariances combined
    with between-chain variance, Geyer initial positive/monotone sequence.
    ``like=theta0`` disambiguates a pytree trace's chain/draw axes.
    """
    samples = as_flat_samples(samples, like=like)
    if samples.ndim == 2:
        samples = samples[None]
    c, n, d = samples.shape

    acov = jax.vmap(jax.vmap(_autocovariance, in_axes=1, out_axes=1))(samples)  # (C,N,D)
    chain_var = acov[:, 0, :] * n / (n - 1.0)  # unbiased within-chain variance
    w = jnp.mean(chain_var, axis=0)  # (D,)
    mean_acov = jnp.mean(acov, axis=0)  # (N, D)

    if c > 1:
        chain_means = jnp.mean(samples, axis=1)  # (C, D)
        b_over_n = jnp.var(chain_means, axis=0, ddof=1)
        var_plus = w * (n - 1.0) / n + b_over_n
    else:
        var_plus = w * (n - 1.0) / n

    # rho_t = 1 - (W - mean_acov_t) / var_plus
    rho = 1.0 - (w[None, :] - mean_acov) / var_plus[None, :]  # (N, D)

    # Geyer: sum consecutive pairs; keep while positive, enforce monotone.
    n_pairs = n // 2
    pairs = rho[: 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)  # (P, D)
    positive = pairs > 0.0
    # first non-positive pair truncates the sum
    keep = jnp.cumprod(positive, axis=0).astype(bool)
    # monotone decreasing envelope
    mono = jax.lax.associative_scan(jnp.minimum, jnp.where(keep, pairs, jnp.inf), axis=0)
    mono = jnp.where(keep, jnp.minimum(pairs, mono), 0.0)
    # tau = -1 + 2 * sum of kept pair sums (pair 0 contains rho_0 + rho_1)
    tau = -1.0 + 2.0 * jnp.sum(mono, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(n, jnp.float32) + 1.0))
    return (c * n) / tau


def potential_scale_reduction(samples: jnp.ndarray, like=None) -> jnp.ndarray:
    """Split-R-hat per dimension; ``samples``: (num_chains, num_draws, D)."""
    samples = as_flat_samples(samples, like=like)
    if samples.ndim == 2:
        samples = samples[None]
    c, n, d = samples.shape
    half = n // 2
    split = jnp.concatenate(
        [samples[:, :half, :], samples[:, half : 2 * half, :]], axis=0
    )  # (2C, half, D)
    m, n2 = split.shape[0], split.shape[1]
    chain_means = jnp.mean(split, axis=1)
    chain_vars = jnp.var(split, axis=1, ddof=1)
    w = jnp.mean(chain_vars, axis=0)
    b = n2 * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = (n2 - 1.0) / n2 * w + b / n2
    return jnp.sqrt(var_plus / w)


def _rank_normalize(samples: jnp.ndarray) -> jnp.ndarray:
    """Fractional average ranks -> normal scores (Vehtari et al. 2021 §3.1).

    Ranks are pooled over chains and draws per dimension, ties get the
    average rank (rejected-draw duplicates are common in MCMC traces), and
    ranks map to z-scores through the inverse normal CDF with the Blom
    offset z = Phi^-1((r - 3/8) / (S + 1/4)).
    """
    c, n, d = samples.shape
    flat = samples.reshape(c * n, d)
    s = flat.shape[0]

    def ranks_1d(x):
        xs = jnp.sort(x)
        lo = jnp.searchsorted(xs, x, side="left")
        hi = jnp.searchsorted(xs, x, side="right")
        return 0.5 * (lo + hi + 1.0)  # average rank, 1-based

    r = jax.vmap(ranks_1d, in_axes=1, out_axes=1)(flat)
    z = jax.scipy.special.ndtri((r - 0.375) / (s + 0.25))
    return z.reshape(c, n, d).astype(samples.dtype)


def rank_normalized_rhat(samples: jnp.ndarray, z_bulk=None, like=None) -> jnp.ndarray:
    """Rank-normalized split-R-hat (Vehtari et al. 2021), per dimension.

    max(split-R-hat of the rank-normal scores, split-R-hat of the FOLDED
    scores |x - median|) — the folded half catches chains that agree in
    mean but disagree in variance, which classic split-R-hat misses.
    ``samples``: (num_chains, num_draws, D) or (num_draws, D).
    ``z_bulk`` optionally passes precomputed ``_rank_normalize(samples)``
    (``summary`` shares it with ``bulk_ess``).
    """
    samples = as_flat_samples(samples, like=like)
    if samples.ndim == 2:
        samples = samples[None]
    if z_bulk is None:
        z_bulk = _rank_normalize(samples)
    folded = jnp.abs(samples - jnp.median(samples, axis=(0, 1), keepdims=True))
    z_fold = _rank_normalize(folded)
    return jnp.maximum(
        potential_scale_reduction(z_bulk), potential_scale_reduction(z_fold)
    )


def bulk_ess(samples: jnp.ndarray, z_bulk=None, like=None) -> jnp.ndarray:
    """Rank-normalized ESS — mixing in the bulk of the distribution."""
    samples = as_flat_samples(samples, like=like)
    if samples.ndim == 2:
        samples = samples[None]
    if z_bulk is None:
        z_bulk = _rank_normalize(samples)
    return effective_sample_size(z_bulk)


def tail_ess(samples: jnp.ndarray, prob: float = 0.05, like=None) -> jnp.ndarray:
    """Tail ESS: min ESS of the 5%/95% quantile-exceedence indicators.

    Sampling efficiency in the tails (Vehtari et al. 2021 §4.3) — step-size
    pathologies that leave the bulk well-mixed but the tails sticky show up
    here first.  ``samples``: (num_chains, num_draws, D) or (num_draws, D).
    """
    samples = as_flat_samples(samples, like=like)
    if samples.ndim == 2:
        samples = samples[None]
    dtype = samples.dtype

    def ess_of_indicator(q):
        quant = jnp.quantile(samples.reshape(-1, samples.shape[-1]), q, axis=0)
        ind = (samples <= quant[None, None, :]).astype(dtype)
        return effective_sample_size(ind)

    return jnp.minimum(ess_of_indicator(prob), ess_of_indicator(1.0 - prob))


def mcse_mean(samples: jnp.ndarray, ess=None, like=None) -> jnp.ndarray:
    """Monte Carlo standard error of the posterior mean: sd / sqrt(ESS)."""
    samples = as_flat_samples(samples, like=like)
    if samples.ndim == 2:
        samples = samples[None]
    sd = jnp.std(samples.reshape(-1, samples.shape[-1]), axis=0, ddof=1)
    if ess is None:
        ess = effective_sample_size(samples)
    return sd / jnp.sqrt(ess)


def e_bfmi(energies: jnp.ndarray) -> jnp.ndarray:
    """Energy Bayesian fraction of missing information (Betancourt 2016).

    E-BFMI = sum_n (E_n - E_{n-1})^2 / sum_n (E_n - mean E)^2 per chain —
    how well the momentum resampling explores the marginal energy
    distribution.  Values below ~0.3 flag heavy-tailed / funnel-like
    pathologies that divergence counts can miss (the chain drifts slowly
    through energy levels instead of jumping between them).

    ``energies``: per-draw Hamiltonian at trajectory start with fresh
    momentum — ``NUTSInfo.energy`` / ``MCMCStats.energy_old`` — shaped
    (num_draws,) or (..., num_draws) (trailing draw axis, e.g. (C, N)).
    Returns a scalar or (...,) per-chain values.
    """
    energies = jnp.asarray(energies)
    de = jnp.diff(energies, axis=-1)
    num = jnp.sum(de**2, axis=-1)
    den = jnp.sum(
        (energies - jnp.mean(energies, axis=-1, keepdims=True)) ** 2, axis=-1
    )
    return num / den


def summary_by_leaf(samples, like, energies=None) -> Dict[str, object]:
    """Per-PARAMETER-LEAF posterior summary for a pytree trace.

    Same statistics as :func:`summary`, but each (D,)-vector statistic is
    split back into the parameter tree: ``out["ess"]`` is a pytree whose
    leaves have the parameter shapes — per-layer diagnostics for pytree
    BNN users, no manual offset bookkeeping.  ``like=theta0`` (required)
    supplies the structure and pins the trace's chain/draw axes.
    """
    from .utils.pytree import unravel_last_axis_fn

    flat = summary(samples, energies=energies, like=like)
    split = unravel_last_axis_fn(like)

    return {
        k: (v if k == "e_bfmi" else split(v)) for k, v in flat.items()
    }


def summary(samples, energies=None, like=None) -> Dict[str, jnp.ndarray]:
    """Per-dimension posterior summary: mean, std, ESS (raw + bulk + tail),
    split-R-hat (classic + rank-normalized), MCSE of the mean; pass the
    per-draw energy series (``MCMCStats.energy_old`` / ``NUTSInfo.energy``,
    draw axis last) to also get per-chain ``e_bfmi``.  ``samples`` may be
    a parameter-pytree trace (pytree-native chain state); ``like=theta0``
    disambiguates its chain/draw axes when needed (as_flat_samples).

    The FFT-ESS and rank-normalization passes dominate the cost (O(C*D*
    N log N)); each is computed once and shared across the statistics."""
    samples = as_flat_samples(samples, like=like)
    if samples.ndim == 2:
        samples = samples[None]
    flat = samples.reshape(-1, samples.shape[-1])
    ess = effective_sample_size(samples)
    z_bulk = _rank_normalize(samples)
    out = {
        "mean": jnp.mean(flat, axis=0),
        "std": jnp.std(flat, axis=0),
        "ess": ess,
        "ess_bulk": bulk_ess(samples, z_bulk=z_bulk),
        "ess_tail": tail_ess(samples),
        "r_hat": potential_scale_reduction(samples),
        "r_hat_rank": rank_normalized_rhat(samples, z_bulk=z_bulk),
        "mcse_mean": mcse_mean(samples, ess=ess),
    }
    if energies is not None:
        out["e_bfmi"] = e_bfmi(energies)
    return out


# ---------------------------------------------------------------------------
# ArviZ export
# ---------------------------------------------------------------------------

def _leaf_var_name(path) -> str:
    """Dotted variable name from a tree_flatten_with_path key path."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:  # pragma: no cover - future key types
            parts.append(str(p))
    return ".".join(parts) or "theta"


def _posterior_vars(samples, chains_first: bool) -> Dict[str, "jnp.ndarray"]:
    """{var_name: (C, N, *shape) array} from an array or pytree trace.

    ``chains_first=False`` marks a single-chain trace (leaves (N, *shape));
    a leading chain axis of 1 is added so every exported variable is
    ArviZ's canonical (chain, draw, *shape).
    """
    import numpy as np

    if hasattr(samples, "ndim"):
        arr = np.asarray(samples)
        return {"theta": arr if chains_first else arr[None]}
    flat, _ = jax.tree_util.tree_flatten_with_path(samples)
    out = {}
    for path, leaf in flat:
        arr = np.asarray(leaf)
        out[_leaf_var_name(path)] = arr if chains_first else arr[None]
    return out


def to_inference_dict(result, like=None, info=None) -> Dict[str, Dict]:
    """``{"posterior": ..., "sample_stats": ...}`` in ArviZ's from_dict
    layout — every array (chain, draw, *shape) — from any sampler result.

    Accepted ``result`` forms:

    - ``MCMCResult`` from ``run_hmc``/``run_rmhmc``/``run_split_hmc``/…
      (single chain) or their ``*_chains`` runners;
    - the ``(MCMCResult, NUTSInfo)`` tuple ``run_nuts``/``run_nuts_chains``
      return (or pass the info separately via ``info=``);
    - ``ChEESResult`` (``run_chees``);
    - ``PTResult`` (``run_parallel_tempering``/``run_pt_chains``) — the
      posterior is the cold (beta=1) chain; per-draw stats are the cold
      replica's, aligned to the post-burn draws the result keeps;
    - ``SGMCMCResult`` / ``CSGMCMCResult`` (``run_sgld``/``run_sghmc``/
      ``run_csgmcmc`` and their ``_chains`` runners) — stats carry
      ``grad_norm`` instead of energies (SG-MCMC has no Hamiltonian),
      and cyclical results add a per-snapshot ``cycle`` tag;
    - ``TIResult`` (``run_ti``/``run_ti_sharded``) — the posterior is
      the beta=1 rung's chain (a valid posterior sample); per-draw
      stats are that rung's acceptance and its adjacent-swap outcomes;
    - ``MCLMCResult`` (``run_mclmc``/``run_mclmc_chains``) — unadjusted,
      so there is no acceptance series; stats carry the per-draw
      ``energy_change`` plus the tuned per-chain ``step_size`` /
      ``trajectory_length`` broadcast over draws;
    - ``BarkerResult`` (``run_barker``/``run_barker_chains``) — MH
      acceptance series and per-draw step size (no Hamiltonian
      energies: the proposal is first-order);
    - ``SMCResult`` (``run_smc``) — the final-stage particles export as
      one "chain" of draws with their normalised ``log_weight`` as a
      sample stat: they are WEIGHTED (resample with
      ``smc_posterior_sample`` first for equal-weight draws; this
      export keeps the weights visible instead of silently dropping
      them).

    ``like=theta0`` is accepted for interface symmetry with ``summary``
    but the chain/draw split comes from the result's own stats shapes.
    Sample-stat names follow ArviZ conventions: ``diverging``,
    ``acceptance_rate``, ``energy``, ``step_size`` (+ ``tree_depth``/
    ``n_steps`` for NUTS, ``trajectory_length`` for ChEES).  The
    ``energy`` series is the E-BFMI one (trajectory-start Hamiltonian
    with fresh momentum — see :func:`e_bfmi`).
    """
    import numpy as np

    del like  # the stats shapes disambiguate; kept for API symmetry

    # run_nuts / run_nuts_chains return a plain (result, info) tuple
    if (not hasattr(result, "samples") and isinstance(result, tuple)
            and len(result) == 2):
        result, info = result

    def _cn(x, chains_first):
        arr = np.asarray(x)
        return arr if chains_first else arr[None]

    if hasattr(result, "final_trajectory_length"):  # ChEESResult
        info = result.info
        post = _posterior_vars(result.samples, chains_first=True)
        c, n = next(iter(post.values())).shape[:2]
        # ChEESInfo is draw-major (N, C); global scalars broadcast to (C, N)
        stats = {
            "acceptance_rate": np.asarray(info.accept_prob).T,
            "diverging": np.asarray(info.divergent).T,
            "step_size": np.broadcast_to(np.asarray(info.step_size), (c, n)),
            "trajectory_length": np.broadcast_to(
                np.asarray(info.trajectory_length), (c, n)
            ),
        }
        return {"posterior": post, "sample_stats": stats}

    if hasattr(result, "final_u"):  # MCLMCResult (before the final_theta
        # check: MCLMC results carry final_theta too, but their stats have
        # no grad_norm/step_size series — eps/L are per-run scalars)
        s = result.stats
        chains_first = np.asarray(s.energy_change).ndim == 2
        post = _posterior_vars(result.samples, chains_first=chains_first)
        shape = np.asarray(_cn(s.energy_change, chains_first)).shape
        stats = {
            "diverging": _cn(s.divergent, chains_first),
            "energy_change": _cn(s.energy_change, chains_first),
            # per-chain tuned scalars broadcast over draws
            "step_size": np.broadcast_to(
                np.reshape(np.asarray(result.step_size), (-1, 1)), shape
            ),
            "trajectory_length": np.broadcast_to(
                np.reshape(np.asarray(result.trajectory_length), (-1, 1)),
                shape,
            ),
        }
        return {"posterior": post, "sample_stats": stats}

    if hasattr(result, "final_walkers"):  # StretchResult (ensemble)
        # walkers export as chains: (N, K, ...) -> (K, N, ...); the
        # accept fraction is ensemble-wide per iteration, broadcast
        # across walker-chains
        s = result.stats
        samples = jax.tree_util.tree_map(
            lambda l: jnp.moveaxis(l, 0, 1), result.samples
        )
        post = _posterior_vars(samples, chains_first=True)
        n_kept = np.asarray(s.accept_frac).shape[0]
        k_walk = next(iter(post.values())).shape[0]
        stats = {
            "acceptance_rate": np.broadcast_to(
                np.asarray(s.accept_frac)[None, :], (k_walk, n_kept)
            ),
            "diverging": np.broadcast_to(
                np.asarray(s.divergent)[None, :], (k_walk, n_kept)
            ),
        }
        return {"posterior": post, "sample_stats": stats}

    if hasattr(result, "final_loglik"):  # EllipticalResult (slice: no
        # acceptance series; shrinks + the kept state's log-likelihood)
        s = result.stats
        chains_first = np.asarray(s.shrinks).ndim == 2
        post = _posterior_vars(result.samples, chains_first=chains_first)
        stats = {
            "diverging": _cn(s.divergent, chains_first),
            "n_shrinks": _cn(s.shrinks, chains_first),
            "loglik": _cn(s.loglik, chains_first),
        }
        return {"posterior": post, "sample_stats": stats}

    if hasattr(result, "final_welford"):  # BarkerResult (MH acceptance
        # series but no Hamiltonian energies; scale rides the result)
        s = result.stats
        chains_first = np.asarray(s.accept_prob).ndim == 2
        post = _posterior_vars(result.samples, chains_first=chains_first)
        stats = {
            "acceptance_rate": _cn(s.accept_prob, chains_first),
            "diverging": _cn(s.divergent, chains_first),
            "step_size": _cn(s.step_size, chains_first),
        }
        return {"posterior": post, "sample_stats": stats}

    if hasattr(result, "final_da") and hasattr(result, "final_theta"):
        # MAMSResult (MCMCResult carries final_da but no final_theta;
        # SG-MCMC carries final_theta but no final_da)
        s = result.stats
        chains_first = np.asarray(s.accept_prob).ndim == 2
        post = _posterior_vars(result.samples, chains_first=chains_first)
        stats = {
            "acceptance_rate": _cn(s.accept_prob, chains_first),
            "diverging": _cn(s.divergent, chains_first),
            "energy_change": _cn(s.energy_change, chains_first),
            "step_size": _cn(s.step_size, chains_first),
        }
        return {"posterior": post, "sample_stats": stats}

    if hasattr(result, "final_theta"):  # SGMCMCResult / CSGMCMCResult
        s = result.stats
        chains_first = np.asarray(s.step_size).ndim == 2
        post = _posterior_vars(result.samples, chains_first=chains_first)
        stats = {
            "diverging": _cn(s.divergent, chains_first),
            "step_size": _cn(s.step_size, chains_first),
            "grad_norm": _cn(s.grad_norm, chains_first),
        }
        if hasattr(result, "cycle"):  # cyclical: tag each snapshot's cycle
            stats["cycle"] = _cn(result.cycle, chains_first)
        return {"posterior": post, "sample_stats": stats}

    if hasattr(result, "loglik_draws"):  # TIResult
        info = result.info
        post = _posterior_vars(result.samples, chains_first=False)
        return {
            "posterior": post,
            "sample_stats": {
                # the kept samples are the beta=1 (last) rung's
                "acceptance_rate": _cn(info.accept_prob[:, -1], False),
                "swap_accepted": _cn(info.swap_accept[:, -1], False),
            },
        }

    if hasattr(result, "log_weights"):  # SMCResult (weighted particles)
        post = _posterior_vars(result.particles, chains_first=False)
        return {
            "posterior": post,
            "sample_stats": {
                "log_weight": _cn(result.log_weights, False),
            },
        }

    if hasattr(result, "replica_samples"):  # PTResult
        info = result.info
        acc = np.asarray(info.accept_prob)
        ensemble = acc.ndim == 3  # (E, N, K) from run_pt_chains
        post = _posterior_vars(result.samples, chains_first=ensemble)
        n_kept = next(iter(post.values())).shape[1]
        cold_acc = acc[..., -n_kept:, 0]  # stats include burn; samples don't
        return {
            "posterior": post,
            "sample_stats": {
                "acceptance_rate": _cn(cold_acc, ensemble),
            },
        }

    # MCMCResult (optionally with a NUTSInfo)
    stats_src = info if info is not None else result.stats
    acc = np.asarray(stats_src.accept_prob)
    chains_first = acc.ndim == 2
    post = _posterior_vars(result.samples, chains_first=chains_first)
    if info is not None:  # NUTS
        stats = {
            "acceptance_rate": _cn(info.accept_prob, chains_first),
            "diverging": _cn(info.divergent, chains_first),
            "energy": _cn(info.energy, chains_first),
            "step_size": _cn(info.step_size, chains_first),
            "tree_depth": _cn(info.tree_depth, chains_first),
            "n_steps": _cn(info.num_leapfrogs, chains_first),
        }
    else:
        s = result.stats
        stats = {
            "acceptance_rate": _cn(s.accept_prob, chains_first),
            "diverging": _cn(s.divergent, chains_first),
            "energy": _cn(s.energy_old, chains_first),
            "step_size": _cn(s.step_size, chains_first),
        }
    return {"posterior": post, "sample_stats": stats}


def to_arviz(result, like=None, info=None):
    """ArviZ ``InferenceData`` (posterior + sample_stats) from any sampler
    result — the modern equivalent of the reference notebooks' hand-rolled
    trace plotting (reference: hamiltorch notebooks; the reference library
    itself ships no diagnostics, util.py:25-89).  Requires the optional
    ``arviz`` dependency; see :func:`to_inference_dict` for the accepted
    result forms and the raw-dict export that needs no extra dependency.
    """
    try:
        import arviz
    except ImportError as e:  # pragma: no cover - depends on environment
        raise ImportError(
            "to_arviz requires the optional dependency arviz "
            "(pip install arviz); to_inference_dict gives the same "
            "layout as plain dicts without it"
        ) from e
    return arviz.from_dict(**to_inference_dict(result, like=like, info=info))
