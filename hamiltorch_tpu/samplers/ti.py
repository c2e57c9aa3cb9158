"""Thermodynamic integration / power posteriors: model evidence from a
replica ladder.

No counterpart in the reference.  A power-posterior run samples the path
``pi_beta ∝ prior * lik^beta`` on a FIXED ladder 0 = beta_0 < ... <
beta_{K-1} = 1 (Friel & Pettitt 2008) — one HMC replica per rung, adjacent
replica exchange for mixing — and estimates the model evidence two ways
from the same draws:

* **stepping stone** (Xie et al. 2011): ``log Z = sum_k log
  E_{beta_k}[lik^(beta_{k+1}-beta_k)]`` — importance sampling between
  adjacent rungs; consistent for any fixed ladder as draws grow (the
  headline ``log_evidence``);
* **thermodynamic integration**: ``log Z = ∫_0^1 E_beta[log lik] dbeta``
  by the variance-corrected trapezoid of Friel, Hurn & Wyse 2014
  (``-(dbeta^2/12)(V_{k+1}-V_k)`` correction; the plain trapezoid is
  returned alongside as a discretization diagnostic).

Together with :func:`~.smc.run_smc` (a moving population over the same
path) and ``optim.laplace_approx`` (a curvature estimate at the mode) this
gives three independent evidence estimators to cross-check — the Bayesian
model-comparison toolkit MCMC chains alone cannot provide.

TPU-first shape: the rung axis is ONE batch dimension — every replica's
leapfrog is the same fused program at a different beta (the parallel-
tempering argument, samplers/tempering.py) — so a K-rung run costs one
K-lane vmapped chain, not K sequential runs.  One jitted ``lax.scan`` over
draws; per-draw RNG folds the draw index (repo convention); swaps are
gathers; divergences are branchless rejections.  Flat (K, D) blocks or
parameter pytrees with (K, ...) leaves both run (the tempering broadcast
helpers).  Each draw spends one extra fused value_and_grad refreshing the
post-swap state — the price of keeping the swap a pure gather (a swap
moves a state to a new beta, which changes its tempered value AND
gradient; recomputing once per draw beats caching split prior/lik
gradients through the hot loop).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.potential import resolve_potential
from .adaptation import DualAveragingState, da_update
from .tempering import _r_where, _rbcast, _tmap


@dataclasses.dataclass(frozen=True)
class TIConfig:
    """Static configuration for :func:`run_ti`.

    ``num_temps`` rungs at ``beta_k = (k / (K-1)) ** schedule_power``
    (k = 0..K-1; power ~5 crowds rungs near beta=0 where E[log lik] moves
    fastest — Friel & Pettitt's c=5 recommendation).

    ``burn`` draws are dropped from every estimator and bound the
    step-size adaptation window (per-rung dual averaging, on by default:
    the beta=0 prior endpoint and the beta=1 posterior endpoint rarely
    share a good step size).
    """

    num_samples: int
    num_steps_per_sample: int = 10
    step_size: float = 0.1
    num_temps: int = 16
    schedule_power: float = 5.0
    burn: int = 0
    swap: bool = True  # adjacent replica exchange (even/odd alternation)
    adapt_step_size: bool = True
    desired_accept_rate: float = 0.8

    def __post_init__(self):
        from .driver import validate_common_config

        validate_common_config(self)
        if self.num_temps < 2:
            raise ValueError("num_temps must be >= 2 (endpoints beta=0, 1)")
        if not self.schedule_power > 0:
            raise ValueError("schedule_power must be positive")
        if not 0.0 < self.desired_accept_rate < 1.0:
            raise ValueError("desired_accept_rate must be in (0, 1)")
        if self.adapt_step_size and self.burn < 1:
            raise ValueError(
                "adapt_step_size needs burn >= 1 (the adaptation window)"
            )


class TIInfo(NamedTuple):
    betas: jnp.ndarray  # (K,) ladder
    accept_prob: jnp.ndarray  # (N - burn, K) per-rung HMC acceptance
    swap_accept: jnp.ndarray  # (N - burn, K-1) adjacent swap outcomes
    step_sizes: jnp.ndarray  # (K,) final per-rung step sizes
    rung_mean_loglik: jnp.ndarray  # (K,) post-burn E_beta[log lik]
    rung_var_loglik: jnp.ndarray  # (K,) post-burn Var_beta[log lik]


class TIResult(NamedTuple):
    log_evidence: jnp.ndarray  # stepping-stone estimate (headline)
    log_evidence_ti: jnp.ndarray  # variance-corrected trapezoid
    log_evidence_ti_plain: jnp.ndarray  # plain trapezoid (diagnostic)
    samples: jnp.ndarray  # (N - burn, ...) the beta=1 (posterior) chain
    loglik_draws: jnp.ndarray  # (N - burn, K) per-rung log-lik trace
    info: TIInfo


def ti_ladder(num_temps: int, power: float, dtype=jnp.float32) -> jnp.ndarray:
    """``beta_k = (k/(K-1))**power`` — endpoints exactly 0 and 1."""
    return (jnp.arange(num_temps, dtype=dtype) / (num_temps - 1)) ** power


@partial(jax.jit, static_argnames=("log_prior_fn", "log_lik_fn", "config"))
def _run_ti_jit(key, theta0s, log_prior_fn, log_lik_fn, config: TIConfig,
                data=None, init_da=None, start_iter=0):
    """One compiled TI scan of ``config.num_samples`` draws.

    ``init_da``/``start_iter`` let chunked (checkpoint/resume) runs
    continue the per-rung adaptation and RNG stream exactly where a
    previous chunk stopped (per-draw RNG folds the GLOBAL draw index)."""
    lik = log_lik_fn if data is None else (lambda t: log_lik_fn(t, data))
    _l0 = jax.tree_util.tree_leaves(theta0s)[0]
    k_temps, dtype = _l0.shape[0], _l0.dtype
    betas = ti_ladder(k_temps, config.schedule_power, dtype)

    def tempered(t, beta):
        ll = lik(t)
        return log_prior_fn(t) + beta * ll, ll

    # one fused forward+backward per rung lane; aux carries log lik for the
    # swaps and the evidence estimators (no second likelihood pass)
    vg = jax.vmap(jax.value_and_grad(tempered, has_aux=True), in_axes=(0, 0))

    def kinetic(ps):
        parts = [
            0.5 * jnp.sum((pl * pl).reshape(k_temps, -1), axis=-1)
            for pl in jax.tree_util.tree_leaves(ps)
        ]
        return sum(parts)

    idx = jnp.arange(k_temps)
    partner_even = jnp.clip(
        jnp.where(idx % 2 == 0, idx + 1, idx - 1), 0, k_temps - 1
    )
    partner_odd = jnp.clip(
        jnp.where(idx % 2 == 1, idx + 1, idx - 1), 0, k_temps - 1
    )
    partner_odd = partner_odd.at[0].set(0)
    if k_temps % 2 == 0:
        partner_odd = partner_odd.at[-1].set(k_temps - 1)

    eps0 = jnp.full((k_temps,), config.step_size, dtype)
    da0 = init_da if init_da is not None else DualAveragingState(
        step_size=eps0,
        log_eps_bar=jnp.zeros((k_temps,), dtype),
        h_t=jnp.zeros((k_temps,), dtype),
        mu=jnp.log(10.0 * eps0),
    )

    def step(carry, n):
        thetas, da = carry
        # fresh tempered value/grad at the slot's OWN beta — includes any
        # state moved here by last draw's swap (see module docstring)
        (vals, lliks), grads = vg(thetas, betas)
        if config.adapt_step_size:
            # every estimator-visible draw (n >= burn, feeding alphas[burn:]
            # and llik_tr[burn:]) runs at the dual-averaged step size;
            # log_eps_bar is frozen post-burn, so this is chunk-stable
            eps_k = jnp.where(
                n >= config.burn, jnp.exp(da.log_eps_bar), da.step_size
            )
        else:
            eps_k = eps0
        kn = jax.random.fold_in(key, n)
        k_mom, k_mh, k_swap = jax.random.split(kn, 3)

        # --- one HMC transition per rung (batched, identity mass) ----------
        mom_keys = jax.random.split(k_mom, len(jax.tree_util.tree_leaves(thetas)))
        ps = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(thetas),
            [
                jax.random.normal(mk, l.shape, dtype)
                for mk, l in zip(mom_keys, jax.tree_util.tree_leaves(thetas))
            ],
        )
        h0 = -vals + kinetic(ps)

        p = _tmap(lambda pl, gl: pl + 0.5 * _rbcast(eps_k, pl) * gl, ps, grads)
        th, v, ll, g = thetas, vals, lliks, grads

        def leap(i, c):
            th, p, v, ll, g = c
            th = _tmap(lambda tl, pl: tl + _rbcast(eps_k, tl) * pl, th, p)
            (v, ll), g = vg(th, betas)
            p = _tmap(lambda pl, gl: pl + _rbcast(eps_k, pl) * gl, p, g)
            return (th, p, v, ll, g)

        th, p, v, ll, g = jax.lax.fori_loop(
            0, config.num_steps_per_sample, leap, (th, p, v, ll, g)
        )
        p = _tmap(lambda pl, gl: pl - 0.5 * _rbcast(eps_k, pl) * gl, p, g)

        h1 = -v + kinetic(p)
        log_ratio = h0 - h1
        finite = jnp.isfinite(log_ratio)
        alpha = jnp.where(finite, jnp.exp(jnp.minimum(0.0, log_ratio)), 0.0)
        accept = finite & (
            jnp.log(jax.random.uniform(k_mh, (k_temps,), dtype)) < log_ratio
        )
        thetas = _r_where(accept, th, thetas)
        lliks = jnp.where(accept, ll, lliks)

        if config.adapt_step_size:
            # per-rung dual averaging during burn, frozen to the averaged
            # step at n == burn (the PT schedule, samplers/tempering.py)
            da_upd = da_update(
                da, jnp.where(finite, log_ratio, jnp.nan), n,
                desired_accept_rate=config.desired_accept_rate,
            )
            adapting = n < config.burn
            da = DualAveragingState(
                step_size=jnp.where(
                    adapting, da_upd.step_size,
                    jnp.where(n == config.burn, jnp.exp(da.log_eps_bar),
                              da.step_size),
                ),
                log_eps_bar=jnp.where(adapting, da_upd.log_eps_bar,
                                      da.log_eps_bar),
                h_t=jnp.where(adapting, da_upd.h_t, da.h_t),
                mu=da.mu,
            )

        # --- adjacent replica exchange on the split potential ---------------
        # pi_k ∝ prior * lik^beta_k, so the swap ratio depends only on the
        # LIKELIHOOD gap: (beta_i - beta_p)(ll_p - ll_i); states move as a
        # pure gather, values/grads refresh at the top of the next draw
        if config.swap:
            partner = jnp.where(n % 2 == 0, partner_even, partner_odd)
            log_swap = (betas - betas[partner]) * (lliks[partner] - lliks)
            u = jax.random.uniform(k_swap, (k_temps,), dtype)
            u_pair = u[jnp.minimum(idx, partner)]  # one uniform per pair
            do_swap = (partner != idx) & (jnp.log(u_pair) < log_swap)
            src = jnp.where(do_swap, partner, idx)
            thetas = _tmap(lambda l: l[src], thetas)
            lliks = lliks[src]
            swap_mask = do_swap[:-1] & (partner[:-1] == idx[:-1] + 1)
        else:
            swap_mask = jnp.zeros((k_temps - 1,), bool)

        return (
            (thetas, da),
            (_tmap(lambda l: l[-1], thetas), lliks, alpha, swap_mask),
        )

    (thetas_f, da_f), (cold, llik_tr, alphas, swaps) = jax.lax.scan(
        step, (theta0s, da0), start_iter + jnp.arange(config.num_samples)
    )
    return cold, llik_tr, alphas, swaps, betas, da_f.step_size, thetas_f, da_f


def evidence_from_loglik_draws(llik: jnp.ndarray, betas: jnp.ndarray):
    """(stepping_stone, corrected_trapezoid, plain_trapezoid) from a
    (N, K) post-burn log-likelihood trace on ladder ``betas``.

    Stepping stone uses rung k's draws to bridge to rung k+1:
    ``sum_k [logsumexp(dbeta_k * ll_k) - log N]``; TI integrates the
    per-rung means by trapezoid with the Friel-Hurn-Wyse variance
    correction ``-(dbeta^2/12)(V_{k+1} - V_k)``.
    """
    llik = jnp.asarray(llik)
    n = llik.shape[0]
    dbeta = jnp.diff(betas)
    means = jnp.mean(llik, axis=0)
    varis = jnp.var(llik, axis=0)
    ss = jnp.sum(
        jax.scipy.special.logsumexp(dbeta[None, :] * llik[:, :-1], axis=0)
        - jnp.log(n)
    )
    plain = jnp.sum(0.5 * dbeta * (means[:-1] + means[1:]))
    corrected = plain - jnp.sum(dbeta**2 / 12.0 * (varis[1:] - varis[:-1]))
    return ss, corrected, plain


def run_ti(
    key,
    log_prior_fn,
    log_lik_fn,
    theta0,
    config: TIConfig,
    data=None,
) -> TIResult:
    """Power-posterior evidence estimation — see the module docstring.

    * ``log_prior_fn(theta)`` — log prior density (the beta=0 endpoint;
      must be proper, or log Z is meaningless);
    * ``log_lik_fn(theta[, data])`` — log likelihood (large datasets ride
      through ``data`` as a jit operand);
    * ``theta0`` — one initial state, broadcast to every rung: a flat (D,)
      vector or a parameter pytree (leaves may also carry a leading
      ``num_temps`` axis for per-rung starts).

    Returns a :class:`TIResult`; ``log_evidence`` is the stepping-stone
    estimate, with both trapezoid forms alongside (a large gap between
    the plain and corrected trapezoids flags too coarse a ladder).  The
    ``samples`` trace is the beta=1 rung — a valid posterior chain, so a
    TI run doubles as a sampling run.
    """
    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    theta0s = stack_ti_rungs(theta0, config)
    lik, data_r = resolve_potential(log_lik_fn, None)
    if data is None:
        data = data_r
    out = _run_ti_jit(key, theta0s, log_prior_fn, lik, config, data=data)
    return assemble_ti_result(out, config)


def stack_ti_rungs(theta0, config: TIConfig):
    """One initial state broadcast to every rung (or per-rung leaves with
    a leading ``num_temps`` axis) — shared by the local, sharded and
    checkpointed runners."""
    from ..utils.pytree import is_param_tree, stack_param_tree

    if is_param_tree(theta0):
        _, theta0s = stack_param_tree(theta0, config.num_temps)
        return theta0s
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        return jnp.broadcast_to(theta0, (config.num_temps,) + theta0.shape)
    if theta0.shape[0] != config.num_temps:
        raise ValueError(
            f"theta0 provides {theta0.shape[0]} rungs but "
            f"config.num_temps={config.num_temps}"
        )
    return theta0


def assemble_ti_result(out, config: TIConfig, burn=None) -> TIResult:
    """Burn-slice a (possibly chunk-concatenated) TI trajectory and run the
    evidence estimators — shared by all the runners."""
    cold, llik_tr, alphas, swaps, betas, eps_f = out[:6]
    burn = max(config.burn if burn is None else burn, 0)
    llik_post = llik_tr[burn:]
    ss, corr, plain = evidence_from_loglik_draws(llik_post, betas)
    return TIResult(
        log_evidence=ss,
        log_evidence_ti=corr,
        log_evidence_ti_plain=plain,
        samples=_tmap(lambda l: l[burn:], cold),
        loglik_draws=llik_post,
        info=TIInfo(
            betas=betas,
            accept_prob=alphas[burn:],
            swap_accept=swaps[burn:],
            step_sizes=eps_f,
            rung_mean_loglik=jnp.mean(llik_post, axis=0),
            rung_var_loglik=jnp.var(llik_post, axis=0),
        ),
    )
