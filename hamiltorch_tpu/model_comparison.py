"""Predictive model comparison: WAIC, PSIS-LOO, and compare().

No counterpart in the reference — ``predict_model`` (reference:
hamiltorch/samplers.py:1468-1562) returns predictions and whole-dataset
log-probs but offers nothing to CHOOSE between models.  This module adds
the standard Bayesian workflow tools on top of any sampler's trace:

* :func:`waic` — the widely applicable information criterion (Watanabe
  2010; Gelman, Hwang & Vehtari 2014): ``elpd_i = log E_s[p(y_i|th_s)] -
  Var_s[log p(y_i|th_s)]``;
* :func:`psis_loo` — Pareto-smoothed importance-sampling leave-one-out
  cross-validation (Vehtari, Gelman & Gabry 2017, arXiv:1507.02646, with
  the Zhang & Stephens 2009 generalized-Pareto fit): the per-point
  ``pareto_k`` diagnostics flag exactly which observations the
  importance approximation cannot handle (k > 0.7);
* :func:`compare` — rank fitted models by elpd with paired standard
  errors of the differences (the elpd differences share the same data
  points, so the SE is computed on the pointwise difference, not by
  adding variances).

Everything consumes one (S, N) pointwise log-likelihood matrix —
``S`` posterior draws x ``N`` observations — built by
:func:`pointwise_log_lik` (vmap over the trace; the matrix build is the
accelerator part, the smoothing is cheap host numpy).  For BNN traces,
:func:`pointwise_log_lik_from_predictions` decomposes the likelihood zoo
of models/bnn.py per observation (NOTE: unlike the sampling-time
``log_likelihood``, the regression branch INCLUDES the Gaussian
normalisation constant — constants cancel inside one model's MCMC but
matter when comparing models with different ``tau_out``).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pointwise_log_lik",
    "pointwise_log_lik_from_predictions",
    "waic",
    "psis_loo",
    "compare",
    "WAICResult",
    "LOOResult",
]


class WAICResult(NamedTuple):
    elpd: float  # expected log pointwise predictive density (sum over i)
    p_eff: float  # effective number of parameters (sum of pointwise vars)
    se: float  # standard error of elpd
    pointwise: np.ndarray  # (N,) per-observation elpd contributions


class LOOResult(NamedTuple):
    elpd: float
    p_eff: float
    se: float
    pointwise: np.ndarray  # (N,)
    pareto_k: np.ndarray  # (N,) GPD shape diagnostics (k > 0.7 = unreliable)


# ---------------------------------------------------------------------------
# pointwise log-likelihood matrices


def pointwise_log_lik(
    log_lik_fn: Callable,
    samples,
    data=None,
    block_size: int | None = None,
) -> jnp.ndarray:
    """(S, N) pointwise log-likelihood matrix from a posterior trace.

    ``log_lik_fn(theta[, data]) -> (N,)`` returns the PER-OBSERVATION log
    likelihood at one parameter value; ``samples`` is a flat (S, D) trace
    or a parameter pytree with (S, ...) leaves (chain axes reshape away
    first: ``tree_map(lambda l: l.reshape((-1,) + l.shape[2:]), samples)``).

    ``block_size`` bounds memory for long traces: the vmap runs in
    ``lax.map`` blocks of that many draws instead of all S at once.
    """
    fn = log_lik_fn if data is None else (lambda t: log_lik_fn(t, data))
    one = jax.vmap(fn)
    if block_size is None:
        return one(samples)
    leaves = jax.tree_util.tree_leaves(samples)
    s = leaves[0].shape[0]
    if s % block_size:
        raise ValueError(
            f"block_size={block_size} must divide the number of draws {s}"
        )
    blocks = jax.tree_util.tree_map(
        lambda l: l.reshape((s // block_size, block_size) + l.shape[1:]),
        samples,
    )
    out = jax.lax.map(one, blocks)
    return out.reshape((s,) + out.shape[2:])


def pointwise_log_lik_from_predictions(
    preds, y, model_loss, tau_out: float = 1.0
) -> jnp.ndarray:
    """(S, N) matrix from a (S, N, O) prediction stack (``predict_model``'s
    output) and targets ``y``, decomposing the models/bnn.py likelihood zoo
    per observation.

    Deviations from the sampling-time ``log_likelihood`` (documented):
    ``regression`` includes the Gaussian normalisation constant, and
    ``multi_class_log_softmax_output`` drops the reference's
    ``reduction='mean'`` quirk — WAIC/LOO need true per-observation log
    densities, not loss conventions.
    """
    preds = jnp.asarray(preds)
    y = jnp.asarray(y)
    if model_loss == "binary_class_linear_output":
        z, t = preds, y[None]
        bce = jnp.maximum(z, 0.0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))
        return -tau_out * jnp.sum(bce, axis=-1)
    if model_loss == "multi_class_linear_output":
        logits = jax.nn.log_softmax(preds, axis=-1)
        labels = y.reshape(-1).astype(jnp.int32)
        return tau_out * jnp.take_along_axis(
            logits, labels[None, :, None], axis=-1
        )[..., 0]
    if model_loss == "multi_class_log_softmax_output":
        labels = y.reshape(-1).astype(jnp.int32)
        return tau_out * jnp.take_along_axis(
            preds, labels[None, :, None], axis=-1
        )[..., 0]
    if model_loss == "regression":
        o = preds.shape[-1]
        const = 0.5 * o * (jnp.log(tau_out) - jnp.log(2.0 * jnp.pi))
        return const - 0.5 * tau_out * jnp.sum((preds - y[None]) ** 2, axis=-1)
    if callable(model_loss):
        return -jnp.sum(model_loss(preds, y[None]), axis=-1)
    raise NotImplementedError(f"Unknown model_loss: {model_loss!r}")


# ---------------------------------------------------------------------------
# WAIC


def waic(loglik) -> WAICResult:
    """WAIC from an (S, N) pointwise log-likelihood matrix."""
    ll = jnp.asarray(loglik)
    if ll.ndim != 2:
        raise ValueError(f"loglik must be (S, N); got {ll.shape}")
    s = ll.shape[0]
    lppd = jax.scipy.special.logsumexp(ll, axis=0) - jnp.log(s)
    p_i = jnp.var(ll, axis=0, ddof=1)
    pw = np.asarray(lppd - p_i)
    n = pw.shape[0]
    return WAICResult(
        elpd=float(pw.sum()),
        p_eff=float(jnp.sum(p_i)),
        se=float(np.sqrt(n * pw.var(ddof=1))) if n > 1 else float("nan"),
        pointwise=pw,
    )


# ---------------------------------------------------------------------------
# PSIS-LOO


def _gpd_fit(z: np.ndarray):
    """Generalized-Pareto (k, sigma) fit per column of ascending-sorted
    exceedances ``z`` (M, N) — Zhang & Stephens (2009) quadrature over the
    profile likelihood, with the weak k-prior regularisation of Vehtari et
    al. (arXiv:1507.02646 appendix): k <- (M k + 5) / (M + 10)."""
    m, n = z.shape
    grid = 30 + int(np.sqrt(m))
    j = np.arange(1, grid + 1, dtype=np.float64)[:, None]  # (grid, 1)
    quart = z[max(int(m / 4.0 + 0.5) - 1, 0), :][None, :]  # (1, N)
    b = (1.0 - np.sqrt(grid / (j - 0.5))) / (3.0 * quart) + 1.0 / z[-1, :][None, :]
    # k(b) = -mean log(1 - b z); (grid, M, N) contraction blocked over N
    # happens at the caller's column-block granularity
    k_b = -np.mean(np.log1p(-b[:, None, :] * z[None, :, :]), axis=1)  # (grid, N)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = b / k_b
        l_b = m * (np.where(ratio > 0, np.log(ratio), -np.inf) + k_b - 1.0)
    l_b = np.where(np.isfinite(l_b), l_b, -np.inf)
    # normalised profile weights w_j = 1 / sum_i exp(l_i - l_j)
    w = 1.0 / np.sum(np.exp(l_b[None, :, :] - l_b[:, None, :]), axis=1)
    w = w / np.sum(w, axis=0, keepdims=True)
    b_hat = np.sum(w * b, axis=0)  # (N,)
    k_zs = -np.mean(np.log1p(-b_hat[None, :] * z), axis=0)
    sigma = np.where(b_hat != 0.0, k_zs / b_hat, np.nan)
    # Zhang & Stephens parameterise F(z) = 1 - (1 - k z/sigma)^(1/k): their
    # k is the NEGATIVE of the Pareto shape xi that PSIS thresholds on
    # (heavy tail = xi > 0).  Flip at the boundary, then apply the weak
    # prior shrinking xi toward 0.5 (Vehtari et al. appendix)
    xi = -k_zs
    xi = (m * xi + 5.0) / (m + 10.0)
    return xi, sigma


def _gpd_quantiles(q: np.ndarray, k: np.ndarray, sigma: np.ndarray):
    """GPD inverse CDF at probabilities ``q`` (M,) for per-column (k, sigma)."""
    q = q[:, None]
    k = k[None, :]
    sigma = sigma[None, :]
    small = np.abs(k) < 1e-8
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(
            small,
            -np.log1p(-q),
            np.expm1(-k * np.log1p(-q)) / np.where(small, 1.0, k),
        )
    return sigma * out


def psis_smooth_weights(loglik, block: int = 1024):
    """(log_weights (S, N) normalised per column, pareto_k (N,)) — the
    PSIS-LOO importance weights for an (S, N) log-likelihood matrix.

    Raw LOO log-weights are ``-loglik``; the largest
    M = min(0.2 S, 3 sqrt(S)) per column are replaced by the quantiles of
    a generalized-Pareto fit to their exceedances, then capped at the
    column max (Vehtari et al., arXiv:1507.02646 — the truncation that
    bounds the estimator's variance).  Columns whose tail is too short
    (M < 5) or whose fit fails are left unsmoothed with ``pareto_k =
    inf`` so the caller sees the diagnostic, not a silent fallback.
    """
    lw_all = -np.asarray(loglik, dtype=np.float64)
    s, n = lw_all.shape
    m = int(min(0.2 * s, 3.0 * np.sqrt(s)))
    ks = np.full((n,), np.inf)
    lw_all = lw_all - lw_all.max(axis=0, keepdims=True)
    if m >= 5:
        for c0 in range(0, n, block):  # bound the (grid, M, block) temporary
            lw = lw_all[:, c0 : c0 + block]
            nb = lw.shape[1]
            order = np.argsort(lw, axis=0)
            tail_idx = order[s - m :, :]  # ascending top-M per column
            cols = np.arange(nb)[None, :]
            cutoff = lw[order[s - m - 1, :], np.arange(nb)]  # just below tail
            tail = lw[tail_idx, cols]
            z = np.exp(tail) - np.exp(cutoff)[None, :]
            # guard zero/degenerate exceedances (ties at the cutoff)
            ok = z[-1, :] > 1e-12
            z = np.maximum(z, 1e-300)
            k_hat, sigma = _gpd_fit(z)
            ok &= np.isfinite(k_hat) & np.isfinite(sigma) & (sigma > 0)
            q = (np.arange(1, m + 1) - 0.5) / m
            smoothed = np.log(
                np.maximum(
                    _gpd_quantiles(q, k_hat, sigma) + np.exp(cutoff)[None, :],
                    1e-300,
                )
            )
            smoothed = np.minimum(smoothed, 0.0)  # cap at the column max
            new_tail = np.where(ok[None, :], smoothed, tail)
            lw[tail_idx, cols] = new_tail
            lw_all[:, c0 : c0 + block] = lw
            ks[c0 : c0 + block] = np.where(ok, k_hat, np.inf)
    # normalise per column
    col_max = lw_all.max(axis=0, keepdims=True)
    lw_all = lw_all - (
        col_max + np.log(np.exp(lw_all - col_max).sum(axis=0, keepdims=True))
    )
    return lw_all, ks


def psis_loo(loglik) -> LOOResult:
    """PSIS-LOO from an (S, N) pointwise log-likelihood matrix.

    ``pointwise[i] = log sum_s exp(lw_norm[s, i] + loglik[s, i])`` — the
    importance-weighted leave-one-out predictive density.  Check
    ``pareto_k``: values above 0.7 mean the weights for that observation
    are too heavy-tailed for the approximation (refit without the point,
    or use waic with caution).
    """
    ll = np.asarray(loglik, dtype=np.float64)
    if ll.ndim != 2:
        raise ValueError(f"loglik must be (S, N); got {ll.shape}")
    s, n = ll.shape
    lw, ks = psis_smooth_weights(ll)
    a = lw + ll
    a_max = a.max(axis=0, keepdims=True)
    pw = (a_max + np.log(np.exp(a - a_max).sum(axis=0, keepdims=True)))[0]
    lppd = jax.scipy.special.logsumexp(jnp.asarray(ll), axis=0) - np.log(s)
    return LOOResult(
        elpd=float(pw.sum()),
        p_eff=float(np.sum(np.asarray(lppd) - pw)),
        se=float(np.sqrt(n * pw.var(ddof=1))) if n > 1 else float("nan"),
        pointwise=pw,
        pareto_k=ks,
    )


# ---------------------------------------------------------------------------
# ranking


def compare(results: Dict[str, WAICResult | LOOResult]):
    """Rank fitted models by elpd (best first).

    Returns a list of dicts with ``name``, ``elpd``, ``se``, ``p_eff``,
    ``d_elpd`` (difference to the best model) and ``d_se`` — the PAIRED
    standard error ``sqrt(N * var(pw_best - pw_m))``, which accounts for
    the shared data points (adding independent SEs overstates the
    uncertainty of the difference).
    """
    if not results:
        raise ValueError("compare() needs at least one result")
    lens = {len(r.pointwise) for r in results.values()}
    if len(lens) != 1:
        raise ValueError(
            f"all models must score the same observations; got N in {lens}"
        )
    ranked = sorted(results.items(), key=lambda kv: kv[1].elpd, reverse=True)
    best = ranked[0][1]
    n = len(best.pointwise)
    out = []
    for name, r in ranked:
        d = best.pointwise - r.pointwise
        out.append(
            {
                "name": name,
                "elpd": r.elpd,
                "se": r.se,
                "p_eff": r.p_eff,
                "d_elpd": best.elpd - r.elpd,
                "d_se": float(np.sqrt(n * d.var(ddof=1))) if n > 1 else 0.0,
            }
        )
    return out
