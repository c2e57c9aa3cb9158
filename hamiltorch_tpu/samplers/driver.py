"""The MCMC driver: one jitted ``lax.scan`` over draws.

Behavioural spec: the reference's 242-line Python sampling loop (reference:
hamiltorch/samplers.py:850-1091): per draw — momentum refresh, Hamiltonian,
integrate, new Hamiltonian, Metropolis test against log U(0,1), burn/adapt
bookkeeping.

TPU-first redesign:

* the whole loop is a single ``lax.scan`` inside jit: the device never
  returns control to Python between draws;
* divergences are branchless — the reference's try/except LogProbError
  auto-reject path (samplers.py:1045-1067) becomes an ``isfinite`` mask
  folded into the accept test;
* the potential evaluation (logp, grad) at the current state is cached in
  the carry, so each draw costs exactly L gradient evaluations;
* dual-averaging adaptation is carried state, updated with ``jnp.where``
  masks reproducing the reference's adapt-while-n<burn / freeze-at-eps_bar
  schedule (samplers.py:1030-1035);
* every draw emits a stats row (acceptance prob, energies, divergence flag,
  step size) — cheap under scan, replacing debug prints.

Deviations from the reference (documented, intentional):

* on a post-burn rejection the chain stays at its current state; the
  reference rewinds to the last *stored* sample, which teleports the chain
  back to ``params_init`` if the first post-burn draw rejects
  (samplers.py:1017-1026) — a bug this design does not reproduce.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .adaptation import DualAveragingState, da_init, da_update


class ChainState(NamedTuple):
    """Current chain position with its cached potential evaluation."""

    theta: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


class MCMCStats(NamedTuple):
    """Per-draw diagnostics, stacked over the scan."""

    accept_prob: jnp.ndarray  # alpha = min(1, exp(H0 - H1)), 0 on divergence
    # bool MH outcome; for NUTS (no MH reject) it reports whether the chain
    # MOVED this draw (multinomial selection left the initial point)
    accepted: jnp.ndarray
    divergent: jnp.ndarray  # bool, non-finite energy
    energy_old: jnp.ndarray
    energy_new: jnp.ndarray
    step_size: jnp.ndarray  # step size used for this draw
    # generalized-leapfrog fixed-point diagnostics (implicit RMHMC/S3 only;
    # zero elsewhere): max iteration count and max final squared residual
    # over the trajectory — saturation at fixed_point_max_iterations means
    # the implicit solves did not converge (reference debug-prints these,
    # samplers.py:339-340,358-359)
    fp_iters: jnp.ndarray
    fp_residual: jnp.ndarray


class MCMCResult(NamedTuple):
    samples: jnp.ndarray  # (num_samples, D) chain state after each draw
    stats: MCMCStats
    final_step_size: jnp.ndarray
    acc_rate: jnp.ndarray
    final_state: "ChainState"  # carry for chunked/resumable sampling
    final_da: DualAveragingState
    # windowed-warmup carry (Welford state, inv mass diag, window-relative
    # DA counter) for samplers with adapt_mass; None elsewhere
    final_warm: object = None


def validate_common_config(config) -> None:
    """Shared sanity checks for all sampler configs: a zero/negative step
    size 'samples' without ever moving and a non-positive draw count is
    always a bug — catch both at construction, not after a silent run."""
    if config.num_samples < 1:
        raise ValueError(f"num_samples={config.num_samples}; must be >= 1")
    if not config.step_size > 0:
        raise ValueError(
            f"step_size={config.step_size}; must be positive (a zero step "
            "size leaves every draw at the initial point)"
        )
    # NOTE: negative burn is deliberately allowed — the reference's
    # notebooks use burn=-1 as "no burn" and the façade preserves that


@dataclasses.dataclass(frozen=True)
class MCMCConfig:
    """Static (trace-time) sampling configuration."""

    num_samples: int
    num_steps_per_sample: int = 10
    step_size: float = 0.1
    burn: int = 0
    adapt_step_size: bool = False  # the reference's "HMC_NUTS" mode
    desired_accept_rate: float = 0.8
    progress_every: int = 0  # >0: host progress line every N draws
    # thin > 1: keep every thin-th draw; num_samples counts TOTAL transitions
    # (must be divisible by thin). Stats are aggregated per kept draw: bools
    # become any-within-window, energies/step size are the kept draw's.
    thin: int = 1
    # Stan-style windowed mass warmup (samplers/warmup.py), as
    # NUTSConfig.adapt_mass: False/True/"diag" estimates a diagonal inverse
    # mass from in-scan Welford variances over doubling slow windows during
    # burn; "dense" estimates the full posterior covariance.  Honoured by
    # the HMC runners (run_hmc / run_hmc_chains / checkpointed); samplers
    # without a warmup path (RMHMC — its metric is position-dependent;
    # splitting) reject it loudly rather than dropping it.
    adapt_mass: bool | str = False

    def __post_init__(self):
        validate_common_config(self)
        if self.adapt_mass not in (False, True, "diag", "dense"):
            raise ValueError(
                f"adapt_mass={self.adapt_mass!r}; expected False, True, "
                "'diag' or 'dense'"
            )


# A transition proposes a new state and returns the two Hamiltonians the
# Metropolis test needs: (key, state, step_size) -> (proposal, H0, H1).
# It may append a 4th element — a dict of extra per-draw diagnostics
# ({'fp_iters', 'fp_residual'}) — which the driver folds into MCMCStats.
TransitionFn = Callable[
    [jax.Array, ChainState, jnp.ndarray],
    Tuple[ChainState, jnp.ndarray, jnp.ndarray],
]


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def run_mcmc(
    key: jax.Array,
    init_state: ChainState,
    transition: TransitionFn,
    config: MCMCConfig,
    init_da: DualAveragingState | None = None,
    start_iter: int = 0,
    make_transition=None,
    init_warm=None,
    collect_flags=None,
    end_flags=None,
) -> MCMCResult:
    """Run ``config.num_samples`` draws of ``transition`` from ``init_state``.

    Pure and jittable (jit with ``transition``/``config`` static); vmap over
    ``(key, init_state)`` for multiple chains.  ``init_da``/``start_iter``
    let chunked (checkpoint/resume) sampling continue the adaptation
    schedule exactly where a previous chunk stopped.

    Windowed mass warmup (``config.adapt_mass`` with ``burn > 0``) needs a
    metric-dependent transition: the caller passes ``make_transition(metric)
    -> TransitionFn`` (``transition`` is then ignored), a
    ``(welford, metric, da_t)`` warmup carry seed via ``init_warm``, and
    per-draw ``collect_flags``/``end_flags`` schedule arrays (len
    ``num_samples``; defaults to the draws' slice of the global Stan
    schedule).  Dual averaging then runs on the window-relative counter and
    restarts at each slow-window boundary, exactly as the NUTS scan does
    (nuts._run_nuts_jit).
    """
    # theta may be a flat vector or a parameter pytree (the pytree-native
    # chain-state path); scalars below use the first leaf's dtype
    dtype = jax.tree_util.tree_leaves(init_state.theta)[0].dtype
    da0 = init_da if init_da is not None else da_init(config.step_size, dtype=dtype)

    windowed = make_transition is not None
    dense = windowed and config.adapt_mass == "dense"
    if windowed:
        from .warmup import (
            schedule_flags,
            welford_cov_update,
            welford_update,
            windowed_step,
        )

        d = sum(l.size for l in jax.tree_util.tree_leaves(init_state.theta))
        if collect_flags is None:
            collect_flags, end_flags = schedule_flags(
                config.burn, 0, config.num_samples
            )
        if init_warm is None:
            raise ValueError("make_transition requires an init_warm carry seed")
        warm0 = init_warm
    else:
        warm0 = ()

    progress_hook = None
    if config.progress_every > 0:
        from ..utils.progress import scan_progress

        progress_hook = scan_progress(config.num_samples, config.progress_every)

    def one_transition(state, da, warm, n):
        if progress_hook is not None:
            progress_hook(n - start_iter)  # bar is sized per-run, not global
        # per-draw keys derive from (base key, global draw index): the random
        # stream is identical no matter how the run is chunked for resume
        k_prop, k_mh = jax.random.split(jax.random.fold_in(key, n))

        if windowed:
            wf, metric, da_t = warm
            trans = make_transition(metric)
        else:
            trans = transition
        out = trans(k_prop, state, da.step_size)
        proposal, h0, h1 = out[:3]
        aux = out[3] if len(out) > 3 else {}
        log_ratio = h0 - h1
        finite = jnp.isfinite(log_ratio)
        rho = jnp.minimum(0.0, jnp.where(finite, log_ratio, -jnp.inf))
        log_u = jnp.log(jax.random.uniform(k_mh, (), dtype))
        accept = finite & (rho >= log_u)

        state = _tree_where(accept, proposal, state)

        alpha = jnp.where(finite, jnp.exp(rho), 0.0)
        stats = MCMCStats(
            accept_prob=alpha,
            accepted=accept,
            divergent=~finite,
            energy_old=h0,
            energy_new=h1,
            step_size=da.step_size,
            fp_iters=aux.get("fp_iters", jnp.zeros((), jnp.int32)),
            fp_residual=aux.get("fp_residual", jnp.zeros((), dtype)),
        )

        # adaptation needs a warmup phase: with burn <= 0 the freeze branch
        # would fire at draw 0 and clobber step_size with exp(log_eps_bar)=1
        if config.adapt_step_size and config.burn > 0:
            # Adapt while n < burn; at n == burn freeze to the averaged
            # step size; afterwards hold (reference: samplers.py:1030-1035).
            # Windowed warmup restarts dual averaging at each slow-window
            # boundary, so its iteration counter is window-relative.
            da_upd = da_update(
                da,
                jnp.where(finite, log_ratio, jnp.nan),
                da_t if windowed else n,
                desired_accept_rate=config.desired_accept_rate,
            )
            adapting = n < config.burn
            da = DualAveragingState(
                step_size=jnp.where(
                    adapting,
                    da_upd.step_size,
                    jnp.where(n == config.burn, jnp.exp(da.log_eps_bar), da.step_size),
                ),
                log_eps_bar=jnp.where(adapting, da_upd.log_eps_bar, da.log_eps_bar),
                h_t=jnp.where(adapting, da_upd.h_t, da.h_t),
                mu=da.mu,
            )

        if windowed:
            idx = n - start_iter
            collect = collect_flags[idx]
            window_end = end_flags[idx]
            # pytree chain state: warmup moments accumulate in the flat
            # layout, bridged once per draw (same scheme as NUTS/ChEES)
            from ..ops.mass import tree_ravel
            from ..utils.pytree import is_param_tree

            theta_flat = (
                tree_ravel(state.theta) if is_param_tree(state.theta)
                else state.theta
            )
            wf_upd = (welford_cov_update if dense else welford_update)(
                wf, theta_flat
            )
            wf, metric, da = windowed_step(
                wf, metric, da, collect, window_end, wf_upd, dense, d, dtype
            )
            warm = (wf, metric, jnp.where(window_end, 0, da_t + 1))

        return state, da, warm, stats

    if config.thin <= 1:
        def step(carry, n):
            state, da, warm = carry
            state, da, warm, stats = one_transition(state, da, warm, n)
            return (state, da, warm), (state.theta, stats)

        (final_state, final_da, final_warm), (thetas, stats) = jax.lax.scan(
            step,
            (init_state, da0, warm0),
            start_iter + jnp.arange(config.num_samples),
        )
        acc_rate = jnp.mean(stats.accepted.astype(dtype))
    else:
        if config.num_samples % config.thin:
            raise ValueError("num_samples must be divisible by thin")
        kept = config.num_samples // config.thin

        def outer(carry, k):
            def inner(c, j):
                state, da, warm, div_any, alpha_sum, acc_cnt = c
                n = start_iter + k * config.thin + j
                state, da, warm, stats = one_transition(state, da, warm, n)
                return (
                    state, da, warm,
                    div_any | stats.divergent,
                    alpha_sum + stats.accept_prob,
                    acc_cnt + stats.accepted.astype(dtype),
                ), stats

            state, da, warm = carry
            (state, da, warm, div_any, alpha_sum, acc_cnt), window = jax.lax.scan(
                inner,
                (state, da, warm, jnp.asarray(False), jnp.zeros((), dtype), jnp.zeros((), dtype)),
                jnp.arange(config.thin),
            )
            last = jax.tree_util.tree_map(lambda s: s[-1], window)
            kept_stats = MCMCStats(
                accept_prob=alpha_sum / config.thin,
                accepted=last.accepted,
                divergent=div_any,
                energy_old=last.energy_old,
                energy_new=last.energy_new,
                step_size=last.step_size,
                fp_iters=jnp.max(window.fp_iters),
                fp_residual=jnp.max(window.fp_residual),
            )
            return (state, da, warm), (state.theta, kept_stats, acc_cnt / config.thin)

        (final_state, final_da, final_warm), (thetas, stats, acc_fracs) = jax.lax.scan(
            outer, (init_state, da0, warm0), jnp.arange(kept)
        )
        acc_rate = jnp.mean(acc_fracs)
    return MCMCResult(
        samples=thetas,
        stats=stats,
        final_step_size=final_da.step_size,
        acc_rate=acc_rate,
        final_state=final_state,
        final_da=final_da,
        final_warm=final_warm if windowed else None,
    )
