"""Barker proposal MCMC (Livingstone & Zanella 2022).

No counterpart in the reference — the Barker proposal (JRSS-B 2022,
arXiv:1908.11812) is the robust member of the first-order family: each
coordinate proposes a symmetric increment ``z_i ~ N(0, (eps*s_i)^2)``
and keeps it with probability ``sigmoid(z_i * g_i)`` (else flips its
sign), where ``g = grad log p``.  The resulting skew-symmetric kernel is
a valid Metropolis--Hastings proposal whose acceptance correction is a
sum of softplus terms — and, unlike MALA's unbounded ``eps^2 * g``
drift, the gradient only ever enters through a BOUNDED probability, so
the chain cannot be catapulted by one large gradient: the paper proves
geometric ergodicity under tails where MALA fails and shows an order-of-
magnitude lower sensitivity to step-size and preconditioning
misspecification.  That robustness is exactly what the repo's
Hamiltonian samplers lack during rough warmups, and what makes Barker
the recommended driver for targets with locally exploding curvature
(funnel necks, cliffs, phase boundaries) where HMC diverges and RWM
crawls.

Position in the family here:

- :mod:`.stretch` / :mod:`.elliptical`  gradient-free
- :func:`run_barker` (this)             one gradient per draw, robust
- :mod:`.hmc` / :mod:`.nuts`            L gradients per draw, fastest
  mixing when well-tuned

TPU-first shape: one jitted ``lax.scan`` over draws — one fused
``value_and_grad`` per draw, elementwise sigmoid/softplus algebra (VPU
work that XLA fuses into the gradient's epilogue), no data-dependent
control flow; rejections are ``where`` masks, divergences are
``stats.divergent``.  Step size adapts by the repo's dual averaging
(:mod:`.adaptation`) toward ``desired_accept_rate`` (default 0.574 —
the Barker-optimal acceptance from the paper's scaling limit) during
``burn``; with ``adapt_scale=True`` a Welford estimate of per-coordinate
posterior stds accumulates over the middle half of burn and becomes the
proposal preconditioner at the 3/4-burn switch point, leaving the last
quarter for dual averaging to re-tune eps against the new scales (the
Stan windowed-warmup shape, without the dense option — Barker
preconditioning is diagonal by construction).  Per-draw RNG folds the
GLOBAL draw index (bit-exact chunked resume, repo convention).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .adaptation import DualAveragingState, da_init, da_update
from .mclmc import _prep_flat
from .warmup import WelfordState, welford_init, welford_update, welford_variance

_tmap = jax.tree_util.tree_map


@dataclasses.dataclass(frozen=True)
class BarkerConfig:
    """Static configuration for :func:`run_barker`.

    ``num_samples`` counts TOTAL draws; the trace includes the ``burn``
    adaptation draws (discard downstream, as with
    :class:`~.driver.MCMCConfig`).  ``adapt_step_size`` requires
    ``burn > 0``; ``adapt_scale`` additionally requires ``burn >= 8``
    (the Welford window is the middle half of burn — shorter burns
    leave it too few draws to estimate a variance).
    """

    num_samples: int
    step_size: float = 0.5
    burn: int = 0
    adapt_step_size: bool = True
    desired_accept_rate: float = 0.574
    adapt_scale: bool = False
    thin: int = 1

    def __post_init__(self):
        if self.num_samples < 1:
            raise ValueError(f"num_samples={self.num_samples}; must be >= 1")
        if not self.step_size > 0:
            raise ValueError("step_size must be positive")
        if self.burn < 0:
            # burn is a GLOBAL draw index (resumed chunks legitimately run
            # with burn >= this chunk's num_samples); fresh runs check
            # burn < num_samples at the run_barker door instead
            raise ValueError(f"burn={self.burn} must be >= 0")
        if self.adapt_step_size and self.burn == 0:
            raise ValueError(
                "adapt_step_size requires burn > 0 (no draws to adapt on); "
                "set adapt_step_size=False to run at the given step_size"
            )
        if self.adapt_scale and self.burn < 8:
            raise ValueError(
                "adapt_scale requires burn >= 8 (the Welford window is "
                "burn/4..3*burn/4)"
            )
        if not 0.0 < self.desired_accept_rate < 1.0:
            raise ValueError("desired_accept_rate must be in (0, 1)")
        if self.thin < 1:
            raise ValueError("thin must be >= 1")
        if self.num_samples % self.thin:
            raise ValueError(
                f"num_samples={self.num_samples} must be divisible by "
                f"thin={self.thin}"
            )


class BarkerStats(NamedTuple):
    """Per-kept-draw diagnostics (window-last transition when thinned)."""

    accept_prob: jnp.ndarray  # min(1, exp(log MH ratio))
    accepted: jnp.ndarray  # bool MH outcome
    divergent: jnp.ndarray  # any non-finite proposal eval in the window
    step_size: jnp.ndarray  # eps the draw ran at


class BarkerResult(NamedTuple):
    samples: jnp.ndarray  # (N_kept, D) or tree of (N_kept, ...) leaves
    stats: BarkerStats
    step_size: jnp.ndarray  # scalar: frozen (averaged) eps after burn
    acc_rate: jnp.ndarray  # mean post-burn acceptance probability
    final_theta: object  # last state (resume)
    final_da: DualAveragingState  # adaptation carry (resume)
    final_welford: WelfordState  # scale-adaptation carry (resume)
    final_step: jnp.ndarray  # global draw counter after the run
    scale: jnp.ndarray  # (D,) proposal stds the post-burn phase uses


@partial(jax.jit, static_argnames=("log_prob_fn", "config"))
def _run_barker_jit(key, theta0, log_prob_fn, config: BarkerConfig, scale,
                    data=None, init_da=None, init_welford=None, start_step=0):
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    vg = jax.value_and_grad(lp)
    dims = theta0.shape[0]
    dtype = theta0.dtype
    n_kept = config.num_samples // config.thin

    logp0, g0 = vg(theta0)
    da0 = init_da if init_da is not None else da_init(config.step_size)
    wf0 = (init_welford if init_welford is not None
           else welford_init(dims, dtype))
    scale_arr = jnp.broadcast_to(jnp.asarray(scale, dtype), (dims,))
    w_start = config.burn // 4  # Welford window: the middle half of burn
    w_end = (3 * config.burn) // 4  # scale switch point

    def draw_scale(wf, g_idx):
        if not config.adapt_scale:
            return scale_arr
        var = jnp.maximum(welford_variance(wf), 1e-20)
        use = (g_idx >= w_end) & (wf.count > 2)
        return jnp.where(use, jnp.sqrt(var).astype(dtype), scale_arr)

    def one_draw(carry, g_idx):
        theta, logp, g, da, wf = carry
        k = jax.random.fold_in(key, g_idx)
        k_z, k_b, k_mh = jax.random.split(k, 3)
        eps = jnp.where(
            g_idx < config.burn, da.step_size,
            jnp.exp(da.log_eps_bar) if config.adapt_step_size
            else da.step_size,
        ).astype(dtype)
        s = draw_scale(wf, g_idx)
        z = eps * s * jax.random.normal(k_z, (dims,), dtype)
        # keep +z with prob sigmoid(z * g), else flip — the Barker skew
        keep = (jax.random.uniform(k_b, (dims,), dtype)
                < jax.nn.sigmoid(z * g))
        d = jnp.where(keep, z, -z)
        y = theta + d
        lpy, gy = vg(y)
        # lpy == -inf is a HARD-SUPPORT step-out: a clean rejection, not
        # a divergence (matching .stretch's semantics); NaN/+inf values
        # or a non-finite gradient at a finite lpy flag stats.divergent
        neg_inf = jnp.isneginf(lpy)
        bad = (jnp.isnan(lpy) | jnp.isposinf(lpy)
               | (~neg_inf & ~jnp.all(jnp.isfinite(gy))))
        # q(x|y)/q(y|x) per coord: log sig(-d*gy) - log sig(d*g)
        #                        = softplus(-d*g) - softplus(d*gy)
        corr = jnp.sum(jax.nn.softplus(-d * g) - jax.nn.softplus(d * gy))
        log_ratio = jnp.where(
            bad | neg_inf, -jnp.inf,
            (lpy - logp).astype(jnp.float32) + corr,
        )
        alpha = jnp.exp(jnp.minimum(0.0, log_ratio))
        accept = (jnp.log(jax.random.uniform(k_mh, (), jnp.float32))
                  < log_ratio)
        theta = jnp.where(accept, y, theta)
        logp = jnp.where(accept, lpy, logp)
        g = jnp.where(accept, gy, g)
        if config.adapt_step_size:
            da_new = da_update(
                da, jnp.where(bad, jnp.nan, log_ratio), g_idx,
                desired_accept_rate=config.desired_accept_rate,
            )
            da = _tmap(
                lambda n, o: jnp.where(g_idx < config.burn, n, o),
                da_new, da,
            )
        if config.adapt_scale:
            wf_new = welford_update(wf, theta)
            in_window = (g_idx >= w_start) & (g_idx < w_end)
            wf = _tmap(lambda n, o: jnp.where(in_window, n, o), wf_new, wf)
        stats = BarkerStats(
            accept_prob=alpha,
            accepted=accept,
            divergent=bad,
            step_size=eps.astype(jnp.float32),
        )
        return (theta, logp, g, da, wf), stats

    def kept_draw(carry, b):
        theta, logp, g, da, wf, _ = carry
        gs = start_step + b * config.thin + jnp.arange(config.thin)

        def body(i, c_and_s):
            (th, lpv, gv, dav, wfv, div), _ = c_and_s
            (th, lpv, gv, dav, wfv), s = one_draw(
                (th, lpv, gv, dav, wfv), gs[i]
            )
            return (th, lpv, gv, dav, wfv,
                    jnp.logical_or(div, s.divergent)), s

        zero_s = BarkerStats(
            accept_prob=jnp.zeros((), jnp.float32),
            accepted=jnp.asarray(False),
            divergent=jnp.asarray(False),
            step_size=jnp.zeros((), jnp.float32),
        )
        (theta, logp, g, da, wf, div), s = jax.lax.fori_loop(
            0, config.thin, body,
            ((theta, logp, g, da, wf, jnp.asarray(False)), zero_s),
        )
        s = s._replace(divergent=div)
        return (theta, logp, g, da, wf, jnp.asarray(False)), (theta, s)

    carry0 = (theta0, logp0, g0, da0, wf0, jnp.asarray(False))
    (thetaF, _, _, daF, wfF, _), (samples, stats) = jax.lax.scan(
        kept_draw, carry0, jnp.arange(n_kept)
    )
    burn_kept = config.burn // config.thin
    acc_rate = jnp.mean(
        stats.accept_prob[burn_kept:]
        if n_kept > burn_kept else stats.accept_prob
    )
    eps_final = (jnp.exp(daF.log_eps_bar) if config.adapt_step_size
                 else daF.step_size)
    end = jnp.asarray(start_step + config.num_samples, jnp.int32)
    return BarkerResult(
        samples=samples, stats=stats, step_size=eps_final,
        acc_rate=acc_rate, final_theta=thetaF, final_da=daF,
        final_welford=wfF,
        final_step=end,
        scale=draw_scale(wfF, jnp.maximum(end, config.burn)),
    )


def _ravel_scale(scale, theta0_tree):
    """A per-leaf scale pytree ravels to (D,) in state leaf order; plain
    scalars/arrays pass through."""
    from jax.flatten_util import ravel_pytree

    if scale is None:
        return 1.0
    if hasattr(scale, "ndim") or isinstance(scale, (int, float)):
        arr = jnp.asarray(scale)
        if arr.ndim <= 1:
            return arr
    tree = _tmap(
        lambda l, s: jnp.broadcast_to(jnp.asarray(s, l.dtype), l.shape),
        theta0_tree, scale,
    )
    return ravel_pytree(tree)[0]


def run_barker(
    key: jax.Array,
    log_prob_fn: Callable,
    theta0,
    config: BarkerConfig,
    scale=None,
    data=None,
    init_da: DualAveragingState | None = None,
    init_welford: WelfordState | None = None,
    start_step: int = 0,
    pass_grad=None,
) -> BarkerResult:
    """Barker proposal sampling — see the module docstring.

    ``theta0`` may be flat (D,) or a parameter pytree (samples keep leaf
    shapes).  ``scale``: per-coordinate proposal stds — a scalar, a (D,)
    array, or (pytree states) a per-leaf pytree; seed it from
    ``advi(...)`` stds or ``laplace_approx`` when available, or pass
    ``config.adapt_scale=True`` to learn it during burn.  Potentials
    follow the ``_raw_fn``/``_data`` jit-operand protocol, or pass
    ``data=`` explicitly for ``log_prob_fn(theta, data)``.

    Chunked runs resume bit-exactly: feed ``final_theta`` / ``final_da``
    / ``final_welford`` / ``final_step`` back with the same key and
    config (post-burn global indices freeze adaptation automatically).
    """
    if start_step == 0 and config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    scale_f = (_ravel_scale(scale, theta0)
               if not hasattr(theta0, "ndim") else
               (1.0 if scale is None else scale))
    theta0f, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0, pass_grad)
    if data is None:
        data = data_r
    # adaptation states ride as jit OPERANDS even on the first chunk:
    # baked-constant da/welford zeros constant-fold under the HLO
    # evaluator with different rounding than the compiled TPU program,
    # which would make checkpoint.run_barker_checkpointed's chunks (which
    # must pass the carries as operands) drift from the straight run
    # (measured on v5e: draws diverge in the 6th decimal from draw ~4)
    if init_da is None:
        init_da = da_init(config.step_size)
    if init_welford is None:
        init_welford = welford_init(theta0f.shape[0], theta0f.dtype)
    r = _run_barker_jit(key, theta0f, fn, config, scale_f, data=data,
                        init_da=init_da, init_welford=init_welford,
                        start_step=start_step)
    if unravel is not None:
        r = r._replace(samples=jax.vmap(unravel)(r.samples),
                       final_theta=unravel(r.final_theta))
    return r


def run_barker_chains(
    key: jax.Array,
    log_prob_fn: Callable,
    theta0,
    config: BarkerConfig,
    num_chains: int,
    scale=None,
    data=None,
    theta0_is_stacked=None,
) -> BarkerResult:
    """Vectorised independent Barker chains (vmap over keys/initial
    states; each chain adapts its own step size and, with
    ``adapt_scale``, its own preconditioner; samples gain a leading
    (num_chains,) axis)."""
    from jax.flatten_util import ravel_pytree

    from ..utils.pytree import is_param_tree, stack_param_tree

    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        scale_f = _ravel_scale(scale, template)
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, template, None)
        theta0 = jax.vmap(lambda t: ravel_pytree(t)[0])(theta0)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        scale_f = 1.0 if scale is None else scale
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0[0], None)
    if data is None:
        data = data_r
    keys = jax.random.split(key, num_chains)
    # operand-not-constant adaptation inits: see run_barker
    da0 = da_init(config.step_size)
    wf0 = welford_init(theta0.shape[1], theta0.dtype)
    r = jax.vmap(
        lambda k, t: _run_barker_jit(k, t, fn, config, scale_f, data=data,
                                     init_da=da0, init_welford=wf0)
    )(keys, theta0)
    if unravel is not None:
        r = r._replace(
            samples=jax.vmap(jax.vmap(unravel))(r.samples),
            final_theta=jax.vmap(unravel)(r.final_theta),
        )
    return r
