"""Stan-style windowed warmup: in-scan diagonal mass-matrix estimation.

Nothing like this exists in the reference (its only adaptation is step-size
dual averaging).  Schedule (Stan defaults): an initial fast interval
(step-size only), doubling slow windows that accumulate posterior variance
via Welford statistics, a terminal fast interval.  At every slow-window
boundary the inverse mass becomes the regularised variance estimate,
Welford resets, and dual averaging restarts recentred on the current step
size.

Everything runs inside the sampling scan: the schedule is precomputed as
static per-draw flags (an xs input), the Welford state and the diagonal
inverse mass are carried arrays, and window switches are `jnp.where` masks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class WelfordState(NamedTuple):
    count: jnp.ndarray  # scalar
    mean: jnp.ndarray  # (D,)
    m2: jnp.ndarray  # (D,)


def welford_init(dim: int, dtype=jnp.float32) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim,), dtype),
    )


def welford_update(state: WelfordState, x: jnp.ndarray) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(count, mean, m2)


def welford_merge_batch(state: WelfordState, xs: jnp.ndarray,
                        gsum=None, count=None) -> WelfordState:
    """Chan parallel merge of a (B, D) batch into the running stats.

    ``gsum``/``count`` generalise the batch moments to a sharded batch:
    ``gsum(x)`` must sum over the batch axis across ALL shards and ``count``
    is the global batch size (defaults: local sum / local size).
    """
    if gsum is None:
        gsum = lambda x: jnp.sum(x, axis=0)
    n_b = (
        jnp.asarray(float(xs.shape[0]), state.count.dtype)
        if count is None
        else jnp.asarray(count, state.count.dtype)
    )
    mean_b = gsum(xs) / n_b
    m2_b = gsum((xs - mean_b) ** 2)
    n_new = state.count + n_b
    delta = mean_b - state.mean
    mean = state.mean + delta * n_b / n_new
    m2 = state.m2 + m2_b + delta**2 * state.count * n_b / n_new
    return WelfordState(n_new, mean, m2)


def welford_variance(state: WelfordState) -> jnp.ndarray:
    """Regularised variance: (n/(n+5))*var + 1e-3*(5/(n+5)) (Stan)."""
    n = jnp.maximum(state.count, 2.0)
    var = state.m2 / (n - 1.0)
    return (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))


class WelfordCovState(NamedTuple):
    """Full-covariance accumulator for DENSE metric warmup."""

    count: jnp.ndarray  # scalar
    mean: jnp.ndarray  # (D,)
    m2: jnp.ndarray  # (D, D) sum of outer-product deviations


def welford_cov_init(dim: int, dtype=jnp.float32) -> WelfordCovState:
    return WelfordCovState(
        count=jnp.zeros((), dtype),
        mean=jnp.zeros((dim,), dtype),
        m2=jnp.zeros((dim, dim), dtype),
    )


def welford_cov_update(state: WelfordCovState, x: jnp.ndarray) -> WelfordCovState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + jnp.outer(delta, x - mean)
    return WelfordCovState(count, mean, m2)


def welford_cov_merge_batch(state: WelfordCovState, xs: jnp.ndarray,
                            gsum=None, count=None) -> WelfordCovState:
    """Chan parallel merge of a (B, D) batch into the covariance stats.

    ``gsum``/``count`` generalise to a device-sharded batch exactly as in
    :func:`welford_merge_batch`: ``gsum`` must reduce over the batch axis
    across all shards and ``count`` is the global batch size.
    """
    if gsum is None:
        gsum = lambda x: jnp.sum(x, axis=0)
    n_b = (
        jnp.asarray(float(xs.shape[0]), state.count.dtype)
        if count is None
        else jnp.asarray(count, state.count.dtype)
    )
    mean_b = gsum(xs) / n_b
    dev = xs - mean_b
    m2_b = gsum(dev[:, :, None] * dev[:, None, :])
    n_new = state.count + n_b
    delta = mean_b - state.mean
    mean = state.mean + delta * n_b / n_new
    m2 = state.m2 + m2_b + jnp.outer(delta, delta) * state.count * n_b / n_new
    return WelfordCovState(n_new, mean, m2)


def welford_covariance(state: WelfordCovState) -> jnp.ndarray:
    """Stan's regularised dense estimate:
    (n/(n+5))*cov + 1e-3*(5/(n+5))*I — shrinkage toward a small identity
    keeps the metric SPD through early windows with few draws."""
    n = jnp.maximum(state.count, 2.0)
    cov = state.m2 / (n - 1.0)
    cov = 0.5 * (cov + cov.T)
    d = cov.shape[0]
    return (n / (n + 5.0)) * cov + (1e-3 * 5.0 / (n + 5.0)) * jnp.eye(
        d, dtype=cov.dtype
    )


def windowed_step(wf, metric, da, collect, window_end, wf_upd, dense: bool,
                  d: int, dtype):
    """One draw of the windowed-warmup carry transition, shared by the
    single-chain and ensemble NUTS scans (`nuts._run_nuts_jit` /
    `nuts._run_nuts_ensemble_jit`): mask the accumulator update in on
    collect draws, and at a slow-window boundary adopt the metric estimate,
    reset the accumulator, and restart dual averaging recentred on the
    current step size.  ``wf_upd`` is the caller's already-accumulated
    candidate state (single observation or Chan batch merge — possibly
    psum'd across a mesh).  Returns (wf, metric, da).
    """
    import jax

    from .adaptation import DualAveragingState

    wf = jax.tree_util.tree_map(lambda a, b: jnp.where(collect, a, b), wf_upd, wf)
    if dense:
        # the O(D^3) inverse + Cholesky run only at boundaries
        def adopt(args):
            wf_, _ = args
            inv_cov = welford_covariance(wf_)
            m = jnp.linalg.inv(inv_cov)
            chol = jnp.linalg.cholesky(0.5 * (m + m.T))
            return inv_cov, chol

        metric = jax.lax.cond(
            window_end, adopt, lambda args: args[1], (wf, metric)
        )
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(window_end, a, b),
            welford_cov_init(d, dtype), wf,
        )
    else:
        metric = jnp.where(window_end, welford_variance(wf), metric)
        wf = jax.tree_util.tree_map(
            lambda a, b: jnp.where(window_end, a, b),
            welford_init(d, dtype), wf,
        )
    da_reset = DualAveragingState(
        step_size=da.step_size,
        log_eps_bar=jnp.zeros_like(da.log_eps_bar),
        h_t=jnp.zeros_like(da.h_t),
        mu=jnp.log(10.0 * da.step_size),
    )
    da = jax.tree_util.tree_map(
        lambda a, b: jnp.where(window_end, a, b), da_reset, da
    )
    return wf, metric, da


def validate_adapt_mass(adapt_mass, mass) -> None:
    """adapt_mass mode vs user inv_mass compatibility — shared by every
    sampler with a windowed-warmup path (NUTS, ChEES, plain HMC)."""
    from ..ops.mass import DenseMass, DiagMass, IdentityMass

    if adapt_mass not in (False, True, "diag", "dense"):
        raise ValueError(
            f"adapt_mass={adapt_mass!r}; expected False, True, "
            "'diag' or 'dense'"
        )
    if adapt_mass == "dense":
        if not isinstance(mass, (DenseMass, DiagMass, IdentityMass)):
            raise ValueError(
                "adapt_mass='dense' cannot seed from a block-diagonal "
                "inv_mass — pass a dense or diagonal inv_mass, or none."
            )
    elif adapt_mass and not isinstance(mass, (DiagMass, IdentityMass)):
        raise ValueError(
            "adapt_mass estimates a DIAGONAL inverse mass; combining it with "
            "a dense or block inv_mass is not supported — pass a diagonal "
            "inv_mass (used to seed the adaptation), none, or "
            "adapt_mass='dense'."
        )


def build_schedule(
    burn: int,
    init_buffer: int = 75,
    term_buffer: int = 50,
    base_window: int = 25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-draw static flags: (collect[n], window_end[n]) over burn draws.

    Mirrors Stan's warmup windowing; degenerates gracefully for short burn
    (no windows when burn < init+term+base).
    """
    collect = np.zeros(max(burn, 0), dtype=bool)
    window_end = np.zeros(max(burn, 0), dtype=bool)
    if burn >= init_buffer + term_buffer + base_window:
        pos = init_buffer
        window = base_window
        last_slow = burn - term_buffer
        while pos < last_slow:
            end = pos + window
            if end + 2 * window > last_slow:
                end = last_slow  # final window absorbs the remainder
            collect[pos:end] = True
            window_end[end - 1] = True
            pos = end
            window *= 2
    return collect, window_end


def schedule_flags(burn: int, start: int, length: int):
    """(collect, window_end) jnp flags for draws [start, start+length) of a
    run whose warmup spans ``burn`` draws — lets chunked (checkpoint/resume)
    sampling hand each chunk the correct slice of the GLOBAL schedule."""
    import jax.numpy as jnp

    collect_np, end_np = build_schedule(burn)
    tail = max(length + start - max(burn, 0), 0)
    full_c = np.concatenate([collect_np, np.zeros(tail, bool)])
    full_e = np.concatenate([end_np, np.zeros(tail, bool)])
    return (
        jnp.asarray(full_c[start : start + length]),
        jnp.asarray(full_e[start : start + length]),
    )
