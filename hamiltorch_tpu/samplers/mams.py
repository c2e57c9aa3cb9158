"""MAMS: Metropolis-Adjusted Microcanonical Sampler.

No counterpart in the reference — this is the EXACT (asymptotically
unbiased) member of the microcanonical family (Robnik, Cohn-Gordon &
Seljak 2025, arXiv:2503.01707): run the same isokinetic dynamics as
MCLMC (:mod:`.mclmc` — unit-sphere velocity, exact exponential-map
updates), but propose a WHOLE ``num_steps_per_sample``-step trajectory
and Metropolis-accept it on the accumulated energy error, with a full
momentum refresh between trajectories.  The MH test removes MCLMC's
O(eps^2) stationary bias; what survives from the microcanonical design
is the integrator: the isokinetic minimal-norm scheme tolerates much
larger step sizes than velocity-Verlet at equal energy error (the paper
reports ~2-4x fewer gradients than NUTS at equal min-ESS in
high-dimensional, well-conditioned targets — with exactness kept, unlike
MCLMC).

Relationship to the family here:

- :func:`~.hmc.run_hmc`          Euclidean leapfrog + MH   (exact)
- :func:`~.mclmc.run_mclmc`      isokinetic, unadjusted    (biased, fastest)
- :func:`run_mams` (this)        isokinetic + MH           (exact)

Detailed balance: one trajectory is a composition of reversible,
measure-preserving isokinetic steps (each V-X-V stage is self-adjoint
under velocity negation, arXiv:2503.01707 §2); with the accumulated
energy change dE = sum(dK) - dlogp as the MH log-ratio and a FULL
momentum refresh each draw (velocity negation on rejection is then
immaterial, as in standard HMC), the chain targets exp(log_prob)
exactly.

TPU-first shape: the sampler is ONE jitted ``lax.scan`` over draws with
a ``fori_loop`` trajectory inside — 2 (mclachlan) or 1 (leapfrog) fresh
gradients per step, no branches (rejections are ``where`` masks,
divergences are ``stats.divergent``).  Step size adapts by the repo's
dual averaging (:mod:`.adaptation`) toward ``desired_accept_rate``
(default 0.9 — trajectories are long, so the optimal acceptance sits
higher than HMC's 0.8; arXiv:2503.01707 §3) during ``burn`` draws and is
frozen to the averaged iterate after.  Per-draw RNG folds the GLOBAL
draw index into the base key, so chunked runs resume bit-exactly
(repo convention).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .adaptation import DualAveragingState, da_init, da_update
from .mclmc import _make_step, _prep_flat, _unit

_tmap = jax.tree_util.tree_map


@dataclasses.dataclass(frozen=True)
class MAMSConfig:
    """Static configuration for :func:`run_mams`.

    ``num_samples`` counts TOTAL draws (trajectories); the trace includes
    the ``burn`` adaptation draws (discard them downstream, as with
    :class:`~.driver.MCMCConfig`).  ``num_steps_per_sample`` is the
    static trajectory length in integrator steps — the effective
    distance per draw is ``num_steps_per_sample * eps`` and eps is what
    adapts.  ``adapt_step_size`` requires ``burn > 0``; with it off the
    sampler runs at the given ``step_size`` unchanged (the resume path).
    """

    num_samples: int
    num_steps_per_sample: int = 10
    step_size: float = 0.2
    burn: int = 0
    adapt_step_size: bool = True
    desired_accept_rate: float = 0.9
    integrator: str = "mclachlan"  # "mclachlan" | "leapfrog"
    thin: int = 1

    def __post_init__(self):
        if self.num_samples < 1:
            raise ValueError(f"num_samples={self.num_samples}; must be >= 1")
        if self.num_steps_per_sample < 1:
            raise ValueError("num_steps_per_sample must be >= 1")
        if not self.step_size > 0:
            raise ValueError("step_size must be positive")
        if self.burn < 0:
            # burn is a GLOBAL draw index (resumed chunks legitimately run
            # with burn >= this chunk's num_samples); fresh runs check
            # burn < num_samples at the run_mams door instead
            raise ValueError(f"burn={self.burn} must be >= 0")
        if self.adapt_step_size and self.burn == 0:
            raise ValueError(
                "adapt_step_size requires burn > 0 (no draws to adapt on); "
                "set adapt_step_size=False to run at the given step_size"
            )
        if not 0.0 < self.desired_accept_rate < 1.0:
            raise ValueError("desired_accept_rate must be in (0, 1)")
        if self.integrator not in ("mclachlan", "leapfrog"):
            raise ValueError(
                f"integrator={self.integrator!r}; must be 'mclachlan' or "
                "'leapfrog'"
            )
        if self.thin < 1:
            raise ValueError("thin must be >= 1")
        if self.num_samples % self.thin:
            raise ValueError(
                f"num_samples={self.num_samples} must be divisible by "
                f"thin={self.thin}"
            )


class MAMSStats(NamedTuple):
    """Per-kept-draw diagnostics (window-last transition when thinned)."""

    accept_prob: jnp.ndarray  # min(1, exp(-dE)) of the trajectory
    accepted: jnp.ndarray  # bool MH outcome
    energy_change: jnp.ndarray  # trajectory dE (f32)
    divergent: jnp.ndarray  # any non-finite trajectory in the window
    step_size: jnp.ndarray  # eps the draw ran at


class MAMSResult(NamedTuple):
    samples: jnp.ndarray  # (N_kept, D) or tree of (N_kept, ...) leaves
    stats: MAMSStats
    step_size: jnp.ndarray  # scalar: frozen (averaged) eps after burn
    acc_rate: jnp.ndarray  # mean post-burn acceptance
    final_theta: object  # last state (resume)
    final_da: DualAveragingState  # adaptation carry (resume)
    final_step: jnp.ndarray  # global draw counter after the run


@partial(jax.jit, static_argnames=("log_prob_fn", "config"))
def _run_mams_jit(key, theta0, log_prob_fn, config: MAMSConfig, data=None,
                  init_da=None, start_step=0):
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    vg = jax.value_and_grad(lp)
    dims = theta0.shape[0]
    dtype = theta0.dtype
    step = _make_step(vg, dims, config.integrator)
    n_kept = config.num_samples // config.thin

    logp0, g0 = vg(theta0)
    da0 = init_da if init_da is not None else da_init(config.step_size)

    def one_draw(carry, g_idx):
        theta, logp, g, da = carry
        k = jax.random.fold_in(key, g_idx)
        k_u, k_mh = jax.random.split(k)
        # full momentum refresh: u uniform on S^{d-1}
        u = _unit(jax.random.normal(k_u, (dims,), dtype))
        eps = jnp.where(
            g_idx < config.burn, da.step_size,
            jnp.exp(da.log_eps_bar) if config.adapt_step_size
            else da.step_size,
        ).astype(dtype)

        def body(i, c):
            x, u, lpv, gv, de = c
            x, u, lpv, gv, d = step(x, u, lpv, gv, eps)
            return (x, u, lpv, gv, de + d)

        xn, un, lpn, gn, de = jax.lax.fori_loop(
            0, config.num_steps_per_sample, body,
            (theta, u, logp, g, jnp.zeros((), jnp.float32)),
        )
        finite = (jnp.isfinite(de)
                  & jnp.all(jnp.isfinite(xn)) & jnp.all(jnp.isfinite(gn)))
        log_ratio = jnp.where(finite, -de, -jnp.inf)
        alpha = jnp.exp(jnp.minimum(0.0, log_ratio))
        accept = (jnp.log(jax.random.uniform(k_mh, (), jnp.float32))
                  < log_ratio)
        theta = jnp.where(accept, xn, theta)
        logp = jnp.where(accept, lpn, logp)
        g = jnp.where(accept, gn, g)
        if config.adapt_step_size:
            da_new = da_update(
                da, jnp.where(finite, log_ratio, jnp.nan), g_idx,
                desired_accept_rate=config.desired_accept_rate,
            )
            da = _tmap(
                lambda n, o: jnp.where(g_idx < config.burn, n, o),
                da_new, da,
            )
        stats = MAMSStats(
            accept_prob=alpha,
            accepted=accept,
            energy_change=de,
            divergent=~finite,
            step_size=eps.astype(jnp.float32),
        )
        return (theta, logp, g, da), stats

    def kept_draw(carry, b):
        theta, logp, g, da, _ = carry
        gs = start_step + b * config.thin + jnp.arange(config.thin)

        def body(i, c_and_s):
            (th, lpv, gv, dav, div), _ = c_and_s
            (th, lpv, gv, dav), s = one_draw((th, lpv, gv, dav), gs[i])
            return (th, lpv, gv, dav, jnp.logical_or(div, s.divergent)), s

        zero_s = MAMSStats(
            accept_prob=jnp.zeros((), jnp.float32),
            accepted=jnp.asarray(False),
            energy_change=jnp.zeros((), jnp.float32),
            divergent=jnp.asarray(False),
            step_size=jnp.zeros((), jnp.float32),
        )
        (theta, logp, g, da, div), s = jax.lax.fori_loop(
            0, config.thin, body,
            ((theta, logp, g, da, jnp.asarray(False)), zero_s),
        )
        s = s._replace(divergent=div)
        return (theta, logp, g, da, jnp.asarray(False)), (theta, s)

    carry0 = (theta0, logp0, g0, da0, jnp.asarray(False))
    (thetaF, _, _, daF, _), (samples, stats) = jax.lax.scan(
        kept_draw, carry0, jnp.arange(n_kept)
    )
    burn_kept = config.burn // config.thin
    acc_rate = jnp.mean(
        stats.accept_prob[burn_kept:]
        if n_kept > burn_kept else stats.accept_prob
    )
    eps_final = (jnp.exp(daF.log_eps_bar) if config.adapt_step_size
                 else daF.step_size)
    return MAMSResult(
        samples=samples, stats=stats, step_size=eps_final,
        acc_rate=acc_rate, final_theta=thetaF, final_da=daF,
        final_step=jnp.asarray(start_step + config.num_samples, jnp.int32),
    )


def run_mams(
    key: jax.Array,
    log_prob_fn: Callable,
    theta0,
    config: MAMSConfig,
    data=None,
    init_da: DualAveragingState | None = None,
    start_step: int = 0,
    pass_grad=None,
) -> MAMSResult:
    """Metropolis-adjusted microcanonical sampling — see module docstring.

    ``theta0`` may be flat (D,) or a parameter pytree (samples keep leaf
    shapes).  Potentials follow the ``_raw_fn``/``_data`` jit-operand
    protocol, or pass ``data=`` explicitly for ``log_prob_fn(theta,
    data)``.  EXACT: unlike :func:`~.mclmc.run_mclmc` the MH test removes
    the discretisation bias; unlike :func:`~.hmc.run_hmc` the isokinetic
    trajectory tolerates larger step sizes at equal energy error.

    Chunked runs resume bit-exactly: feed ``final_theta`` / ``final_da``
    / ``final_step`` back (keep the same ``config``; post-burn global
    indices freeze adaptation automatically).
    """
    if start_step == 0 and config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    theta0f, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0, pass_grad)
    if data is None:
        data = data_r
    r = _run_mams_jit(key, theta0f, fn, config, data=data, init_da=init_da,
                      start_step=start_step)
    if unravel is not None:
        r = r._replace(samples=jax.vmap(unravel)(r.samples),
                       final_theta=unravel(r.final_theta))
    return r


def run_mams_chains(
    key: jax.Array,
    log_prob_fn: Callable,
    theta0,
    config: MAMSConfig,
    num_chains: int,
    data=None,
    theta0_is_stacked=None,
) -> MAMSResult:
    """Vectorised independent MAMS chains (vmap over keys/initial states;
    each chain adapts its own step size; samples gain a leading
    (num_chains,) axis)."""
    from jax.flatten_util import ravel_pytree

    from ..utils.pytree import is_param_tree, stack_param_tree

    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, template, None)
        theta0 = jax.vmap(lambda t: ravel_pytree(t)[0])(theta0)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0[0], None)
    if data is None:
        data = data_r
    keys = jax.random.split(key, num_chains)
    r = jax.vmap(
        lambda k, t: _run_mams_jit(k, t, fn, config, data=data)
    )(keys, theta0)
    if unravel is not None:
        r = r._replace(
            samples=jax.vmap(jax.vmap(unravel))(r.samples),
            final_theta=jax.vmap(unravel)(r.final_theta),
        )
    return r
