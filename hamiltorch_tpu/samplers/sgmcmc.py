"""Stochastic-gradient MCMC: SGLD, pSGLD, and SGHMC.

No counterpart in the reference — its answer to minibatch sampling is
symmetric-split HMC (reference: hamiltorch/samplers.py:465-603), which
still evaluates EVERY batch inside every trajectory.  SG-MCMC is the other
classical large-data regime: one random minibatch gradient per step and no
Metropolis correction, asymptotically exact as the step size decays —

* SGLD (Welling & Teh 2011):   theta += (eps/2) P ghat + N(0, eps*T*P)
* pSGLD (Li et al. 2016):      P from an RMSProp accumulator of ghat^2
* SGHMC (Chen, Fox & Guestrin 2014), SGD-with-momentum form:
      v <- (1 - friction) v + eps P ghat + N(0, 2*friction*eps*T*P)
      theta <- theta + v
  (P both scales the kick and the injected noise — the unique diagonal
  placement satisfying fluctuation-dissipation for the v-marginal
  N(0, eps*T*P), so the theta-marginal stays exp(log p) for ANY P;
  preconditioning theta += P v instead would inflate each coordinate's
  variance by P, a bug this repo's statistics tests catch.)

where ``ghat = num_terms * grad(term_fn(theta, m))`` is the unbiased
full-gradient estimate from one uniformly drawn term — the SAME
``term_fn(theta, m[, data])`` protocol as split HMC
(``define_split_model_log_prob`` / ``define_split_model_tree_log_prob``
build it from a model + DataLoader), so a reference split-HMC workload
moves to SG-MCMC by swapping the runner.

TPU-first shape: one jitted ``lax.scan`` over kept draws with the
``thin``-step inner loop threading state through the CARRY (never stacking
a (thin, D) block — the tracebuf lesson); per-step RNG folds the GLOBAL
step index into the base key (bit-exact under chunking); minibatch
selection is a random index into the stacked (M, B, ...) data operand —
a gather, static shapes.  Non-finite updates are branchless rejections
(the step is skipped, ``stats.divergent`` records it) — exceptions never
cross the scan.

Deviations from the exact papers (documented):

* pSGLD omits the Gamma(theta) preconditioner-drift correction term, as
  do all common implementations (its contribution is O(1/sqrt(a)) drift
  curvature and the original paper reports it negligible).
* SGHMC's noise term uses the full 2*friction*eps (no Bhat subtraction;
  Bhat = 0 is the paper's own practical recommendation).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_tmap = jax.tree_util.tree_map


@dataclasses.dataclass(frozen=True)
class SGLDConfig:
    """Static configuration for :func:`run_sgld`.

    ``num_samples`` counts TOTAL transitions; with ``thin > 1`` every
    thin-th state is kept (``num_samples`` must be divisible by ``thin``)
    — the same convention as :class:`~.driver.MCMCConfig`.

    ``step_size`` may decay polynomially: ``eps_t = step_size * (1 + t /
    decay_t0) ** (-decay_gamma)`` (Welling & Teh's schedule with gamma in
    (0.5, 1] gives the asymptotic-exactness guarantee; gamma=0 keeps it
    constant, the common practical choice).

    ``temperature`` scales the injected noise (T=1 targets the posterior;
    T<1 sharpens toward a MAP trajectory — "cold posterior" runs).

    ``preconditioner="rmsprop"`` enables pSGLD; ``inv_mass`` (a static
    diagonal preconditioner) and rmsprop are mutually exclusive.
    """

    num_samples: int
    step_size: float
    thin: int = 1
    decay_gamma: float = 0.0
    decay_t0: float = 1.0
    temperature: float = 1.0
    preconditioner: str = "none"  # "none" | "rmsprop"
    rmsprop_alpha: float = 0.99
    rmsprop_eps: float = 1e-5

    def __post_init__(self):
        _validate_sg_common(self)
        if self.preconditioner not in ("none", "rmsprop"):
            raise ValueError(
                f"preconditioner={self.preconditioner!r}; must be 'none' or 'rmsprop'"
            )
        if not 0.0 < self.rmsprop_alpha < 1.0:
            raise ValueError("rmsprop_alpha must be in (0, 1)")
        if not self.rmsprop_eps > 0:
            raise ValueError("rmsprop_eps must be positive")
        if self.decay_gamma < 0 or not self.decay_t0 > 0:
            raise ValueError("decay_gamma must be >= 0 and decay_t0 > 0")


@dataclasses.dataclass(frozen=True)
class SGHMCConfig:
    """Static configuration for :func:`run_sghmc`.

    ``friction`` is the per-step momentum decay alpha in (0, 1]
    (alpha = eps * C / M in the paper's continuous-time notation); the
    injected noise variance is ``2 * friction * step_size * temperature *
    P`` per coordinate (P = inv_mass, default 1), the paper's Bhat=0
    recommendation.

    ``resample_momentum_every=k`` refreshes v from its stationary marginal
    N(0, step_size * temperature * P) every k steps (0 = persistent
    momentum).
    """

    num_samples: int
    step_size: float
    thin: int = 1
    friction: float = 0.05
    temperature: float = 1.0
    resample_momentum_every: int = 0

    def __post_init__(self):
        _validate_sg_common(self)
        if not 0.0 < self.friction <= 1.0:
            raise ValueError("friction must be in (0, 1]")
        if self.resample_momentum_every < 0:
            raise ValueError("resample_momentum_every must be >= 0")


def _validate_sg_common(config) -> None:
    if config.num_samples < 1:
        raise ValueError(f"num_samples={config.num_samples}; must be >= 1")
    if not config.step_size > 0:
        raise ValueError("step_size must be positive")
    if config.thin < 1:
        raise ValueError("thin must be >= 1")
    if config.num_samples % config.thin:
        raise ValueError(
            f"num_samples={config.num_samples} must be divisible by "
            f"thin={config.thin}"
        )
    if not config.temperature > 0:
        raise ValueError("temperature must be positive")


class SGMCMCStats(NamedTuple):
    """Per-kept-draw diagnostics."""

    step_size: jnp.ndarray  # eps_t at the kept step
    grad_norm: jnp.ndarray  # l2 norm of the gradient ESTIMATE at the kept step
    divergent: jnp.ndarray  # bool: any non-finite (skipped) step in the window


class SGMCMCResult(NamedTuple):
    samples: jnp.ndarray  # (N, D) or tree of (N, ...) leaves
    stats: SGMCMCStats
    final_theta: object
    final_aux: object  # SGHMC momentum / pSGLD accumulator carry (resume)
    final_step: jnp.ndarray  # global step counter after the run


def _leaf_noise(key, template):
    """One standard normal per leaf, keys folded per leaf index."""
    leaves, tdef = jax.tree_util.tree_flatten(template)
    outs = [
        jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype)
        for i, l in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(tdef, outs)


def _resolve_precond(inv_mass, theta0, what: str):
    """None or a diagonal preconditioner matching theta's structure."""
    if inv_mass is None:
        return None
    if hasattr(theta0, "ndim"):  # flat chain state
        pre = jnp.asarray(inv_mass)
        if pre.shape != theta0.shape:
            raise ValueError(
                f"{what}: inv_mass shape {pre.shape} != theta {theta0.shape} "
                "(diagonal preconditioners only)"
            )
        return pre
    # pytree chain state: per-leaf diagonals (scalars broadcast)
    return _tmap(lambda l, m: jnp.broadcast_to(jnp.asarray(m, l.dtype), l.shape),
                 theta0, inv_mass)


def _make_ghat(term_fn, num_terms: int, data, psum_axis=None, prior_fn=None):
    """Unbiased grad-log-posterior estimate from one uniform term index.

    With ``psum_axis`` (inside shard_map), ``term_fn`` sees only its
    device's batch shard and the term gradient is psum-completed across
    the axis BEFORE the ``num_terms`` scaling; ``prior_fn`` then enters
    once, locally (each device holds the full replicated theta) — the
    prior must NOT ride the psum or it is counted once per device."""
    if data is None:
        term = term_fn
    else:
        term = lambda t, m: term_fn(t, m, data)
    scale = float(num_terms)

    def ghat(theta, m):
        g = jax.grad(term)(theta, m)
        if psum_axis is not None:
            g = jax.lax.psum(g, psum_axis)
        g = _tmap(lambda l: scale * l, g)
        if prior_fn is not None:
            gp = jax.grad(prior_fn)(theta)
            g = _tmap(jnp.add, g, gp)
        return g

    return ghat


def _step_eps(config, t):
    """Polynomial decay eps_t (constant when decay_gamma == 0)."""
    gamma = getattr(config, "decay_gamma", 0.0)
    if gamma == 0.0:
        return jnp.asarray(config.step_size, jnp.float32)
    t0 = getattr(config, "decay_t0", 1.0)
    return config.step_size * (1.0 + t.astype(jnp.float32) / t0) ** (-gamma)


def _finite_select(new_tree, old_tree):
    """(selected_tree, ok): keep old when ANY new leaf is non-finite."""
    ok = jnp.asarray(True)
    for l in jax.tree_util.tree_leaves(new_tree):
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(l)))
    sel = _tmap(lambda n, o: jnp.where(ok, n, o), new_tree, old_tree)
    return sel, ok


@partial(jax.jit, static_argnames=("term_fn", "num_terms", "config",
                                   "psum_axis", "prior_fn"))
def _run_sgld_jit(key, theta0, term_fn, num_terms, config: SGLDConfig,
                  pre=None, data=None, init_aux=None, start_step=0,
                  psum_axis=None, prior_fn=None):
    ghat = _make_ghat(term_fn, num_terms, data, psum_axis, prior_fn)
    rmsprop = config.preconditioner == "rmsprop"
    temp = config.temperature
    n_kept = config.num_samples // config.thin

    if init_aux is None and rmsprop:
        init_aux = _tmap(jnp.zeros_like, theta0)

    def one_step(carry, g_idx):
        theta, aux, div = carry
        k = jax.random.fold_in(key, g_idx)
        k_batch, k_noise = jax.random.split(k)
        m = jax.random.randint(k_batch, (), 0, num_terms)
        g = ghat(theta, m)
        gnorm2 = sum(jnp.sum(l.astype(jnp.float32) ** 2)
                     for l in jax.tree_util.tree_leaves(g))
        eps = _step_eps(config, g_idx)
        if rmsprop:
            a = config.rmsprop_alpha
            aux_new = _tmap(lambda v, gl: a * v + (1 - a) * gl * gl, aux, g)
            p_tree = _tmap(
                lambda v: 1.0 / (jnp.sqrt(v) + config.rmsprop_eps), aux_new
            )
        else:
            aux_new = aux
            p_tree = pre  # None or static diagonal
        z = _leaf_noise(k_noise, theta)
        # eps is a strong f32 scalar (the decay schedule computes in f32);
        # the update runs in the promoted precision, then lands back in the
        # leaf dtype so sub-f32 chain states keep their scan-carry dtype
        if p_tree is None:
            new = _tmap(
                lambda t, gl, zl: (t + 0.5 * eps * gl
                                   + jnp.sqrt(eps * temp) * zl).astype(t.dtype),
                theta, g, z,
            )
        else:
            new = _tmap(
                lambda t, gl, zl, pl: (t + 0.5 * eps * pl * gl
                                       + jnp.sqrt(eps * temp * pl) * zl
                                       ).astype(t.dtype),
                theta, g, z, p_tree,
            )
        new, ok = _finite_select(new, theta)
        aux_sel = aux_new if not rmsprop else _tmap(
            lambda n, o: jnp.where(ok, n, o), aux_new, aux
        )
        return (new, aux_sel, jnp.logical_or(div, ~ok)), (eps, jnp.sqrt(gnorm2))

    def kept_draw(carry, b):
        theta, aux, _ = carry
        inner0 = (theta, aux, jnp.asarray(False))
        gs = start_step + b * config.thin + jnp.arange(config.thin)

        def body(i, c_and_last):
            c, _ = c_and_last
            c2, out = one_step(c, gs[i])
            return c2, out

        (theta, aux, div), (eps, gn) = jax.lax.fori_loop(
            0, config.thin, body,
            (inner0, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))),
        )
        stats = SGMCMCStats(step_size=eps, grad_norm=gn, divergent=div)
        return (theta, aux, jnp.asarray(False)), (theta, stats)

    carry0 = (theta0, init_aux, jnp.asarray(False))
    (thetaF, auxF, _), (samples, stats) = jax.lax.scan(
        kept_draw, carry0, jnp.arange(n_kept)
    )
    return SGMCMCResult(
        samples=samples, stats=stats, final_theta=thetaF, final_aux=auxF,
        final_step=jnp.asarray(start_step + config.num_samples, jnp.int32),
    )


@partial(jax.jit, static_argnames=("term_fn", "num_terms", "config",
                                   "psum_axis", "prior_fn"))
def _run_sghmc_jit(key, theta0, term_fn, num_terms, config: SGHMCConfig,
                   pre=None, data=None, init_aux=None, start_step=0,
                   psum_axis=None, prior_fn=None):
    ghat = _make_ghat(term_fn, num_terms, data, psum_axis, prior_fn)
    eps = config.step_size
    alpha = config.friction
    temp = config.temperature
    noise_std = (2.0 * alpha * eps * temp) ** 0.5  # x sqrt(P) per leaf below
    v_std = (eps * temp) ** 0.5  # stationary marginal of v is N(0, eps*T*P)
    n_kept = config.num_samples // config.thin
    every = config.resample_momentum_every

    if init_aux is None:
        init_aux = _tmap(jnp.zeros_like, theta0)

    def one_step(carry, g_idx):
        theta, v, div = carry
        k = jax.random.fold_in(key, g_idx)
        k_batch, k_noise, k_mom = jax.random.split(k, 3)
        if every:
            fresh = _leaf_noise(k_mom, theta)
            if pre is None:
                fresh = _tmap(lambda zl: v_std * zl, fresh)
            else:
                fresh = _tmap(
                    lambda zl, pl: v_std * jnp.sqrt(pl) * zl, fresh, pre
                )
            refresh = (g_idx % every) == 0
            v = _tmap(lambda f, o: jnp.where(refresh, f, o), fresh, v)
        m = jax.random.randint(k_batch, (), 0, num_terms)
        g = ghat(theta, m)
        gnorm2 = sum(jnp.sum(l.astype(jnp.float32) ** 2)
                     for l in jax.tree_util.tree_leaves(g))
        z = _leaf_noise(k_noise, theta)
        if pre is None:
            v_new = _tmap(
                lambda vl, gl, zl: (1.0 - alpha) * vl + eps * gl
                + noise_std * zl,
                v, g, z,
            )
        else:
            v_new = _tmap(
                lambda vl, gl, zl, pl: (1.0 - alpha) * vl + eps * pl * gl
                + noise_std * jnp.sqrt(pl) * zl,
                v, g, z, pre,
            )
        t_new = _tmap(lambda t, vl: t + vl, theta, v_new)
        (t_new, v_new), ok = _finite_select((t_new, v_new), (theta, v))
        return (
            (t_new, v_new, jnp.logical_or(div, ~ok)),
            (jnp.asarray(eps, jnp.float32), jnp.sqrt(gnorm2)),
        )

    def kept_draw(carry, b):
        theta, v, _ = carry
        inner0 = (theta, v, jnp.asarray(False))
        gs = start_step + b * config.thin + jnp.arange(config.thin)

        def body(i, c_and_last):
            c, _ = c_and_last
            c2, out = one_step(c, gs[i])
            return c2, out

        (theta, v, div), (e, gn) = jax.lax.fori_loop(
            0, config.thin, body,
            (inner0, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))),
        )
        stats = SGMCMCStats(step_size=e, grad_norm=gn, divergent=div)
        return (theta, v, jnp.asarray(False)), (theta, stats)

    carry0 = (theta0, init_aux, jnp.asarray(False))
    (thetaF, vF, _), (samples, stats) = jax.lax.scan(
        kept_draw, carry0, jnp.arange(n_kept)
    )
    return SGMCMCResult(
        samples=samples, stats=stats, final_theta=thetaF, final_aux=vF,
        final_step=jnp.asarray(start_step + config.num_samples, jnp.int32),
    )


def _prep(key, term_fn, num_terms, theta0, config, inv_mass, data, what):
    if num_terms < 1:
        raise ValueError(f"num_terms={num_terms}; must be >= 1")
    theta0 = _tmap(jnp.asarray, theta0)
    pre = _resolve_precond(inv_mass, theta0, what)
    if pre is not None and getattr(config, "preconditioner", "none") == "rmsprop":
        raise ValueError(
            "inv_mass (static preconditioner) and preconditioner='rmsprop' "
            "are mutually exclusive — pSGLD estimates its own"
        )
    if data is not None:
        data = _tmap(jnp.asarray, data)
    return theta0, pre, data


def run_sgld(
    key: jax.Array,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config: SGLDConfig,
    inv_mass=None,
    data=None,
    init_aux=None,
    start_step: int = 0,
) -> SGMCMCResult:
    """Stochastic-gradient Langevin dynamics over a term-decomposed target.

    ``term_fn(theta, m)`` (or ``term_fn(theta, m, data)`` when ``data`` is
    given — large datasets must ride the jit-operand path) returns one term
    of ``log p(theta) = sum_m term(theta, m)`` — the split-HMC protocol, so
    ``define_split_model_log_prob`` / ``define_split_model_tree_log_prob``
    feed it directly.  ``num_terms=1`` with a full-batch potential wrapped
    as ``lambda t, m: lp(t)`` gives unadjusted Langevin (ULA).

    ``theta0`` may be flat (D,) or a parameter pytree (samples keep leaf
    shapes with a leading kept-draws axis).

    Chunked runs resume bit-exactly: feed a chunk's ``final_theta`` /
    ``final_aux`` / ``final_step`` back as ``theta0`` / ``init_aux`` /
    ``start_step`` (per-step RNG folds the GLOBAL step index, so the
    concatenated trace equals one straight run with the same key).
    """
    theta0, pre, data = _prep(
        key, term_fn, num_terms, theta0, config, inv_mass, data, "run_sgld"
    )
    return _run_sgld_jit(key, theta0, term_fn, num_terms, config, pre, data,
                         init_aux, start_step)


def run_sghmc(
    key: jax.Array,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config: SGHMCConfig,
    inv_mass=None,
    data=None,
    init_aux=None,
    start_step: int = 0,
) -> SGMCMCResult:
    """Stochastic-gradient HMC (momentum form) — see module docstring.

    Same ``term_fn`` protocol and chunked-resume contract as
    :func:`run_sgld` (``init_aux`` carries the momentum)."""
    theta0, pre, data = _prep(
        key, term_fn, num_terms, theta0, config, inv_mass, data, "run_sghmc"
    )
    return _run_sghmc_jit(key, theta0, term_fn, num_terms, config, pre, data,
                          init_aux, start_step)


def _run_chains(jit_fn, key, term_fn, num_terms, theta0, config, inv_mass,
                data, num_chains, theta0_is_stacked, what):
    from ..utils.pytree import is_param_tree, stack_param_tree

    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
    else:
        theta0 = jnp.asarray(theta0)
        template = theta0 if theta0.ndim == 1 else theta0[0]
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    _, pre, data = _prep(
        key, term_fn, num_terms, template, config, inv_mass, data, what
    )
    keys = jax.random.split(key, num_chains)
    run = jax.vmap(
        lambda k, t: jit_fn(k, t, term_fn, num_terms, config, pre, data),
        in_axes=(0, 0),
    )
    return run(keys, theta0)


def run_sgld_chains(key, term_fn, num_terms, theta0, config: SGLDConfig,
                    num_chains: int, inv_mass=None, data=None,
                    theta0_is_stacked=None) -> SGMCMCResult:
    """Vectorised independent SGLD chains (vmap over keys/initial states;
    samples gain a leading (num_chains,) axis)."""
    return _run_chains(_run_sgld_jit, key, term_fn, num_terms, theta0,
                       config, inv_mass, data, num_chains,
                       theta0_is_stacked, "run_sgld_chains")


def run_sghmc_chains(key, term_fn, num_terms, theta0, config: SGHMCConfig,
                     num_chains: int, inv_mass=None, data=None,
                     theta0_is_stacked=None) -> SGMCMCResult:
    """Vectorised independent SGHMC chains."""
    return _run_chains(_run_sghmc_jit, key, term_fn, num_terms, theta0,
                       config, inv_mass, data, num_chains,
                       theta0_is_stacked, "run_sghmc_chains")


# ---------------------------------------------------------------------------
# Cyclical SG-MCMC (cSGLD / cSGHMC)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CSGMCMCConfig:
    """Static configuration for :func:`run_csgmcmc` (Zhang et al. 2020,
    "Cyclical Stochastic Gradient MCMC for Bayesian Deep Learning").

    The run is ``num_cycles`` cycles of ``cycle_length`` steps under the
    cosine step-size schedule

        eps_t = (step_size / 2) * (cos(pi * (t mod L) / L) + 1),  L = cycle_length

    Each cycle starts hot (eps ~ step_size: big jumps that relocate the
    chain to a new mode) and cools to ~0.  The first
    ``exploration_frac`` of every cycle is the EXPLORATION stage — pure
    preconditioned stochastic gradient ascent, no noise injection, no
    samples kept; the remainder is the SAMPLING stage, running the chosen
    base dynamics (``base="sgld"`` or ``"sghmc"``) with every ``thin``-th
    state kept as a snapshot.  Snapshots from different cycles land in
    different modes of a multimodal posterior — feed them to
    ``diagnostics.summary`` / ``model_comparison`` the same way as any
    chain trace.

    ``num_samples`` is implied: ``num_cycles * sampling_steps / thin``
    snapshots, ``sampling_steps = cycle_length - exploration_steps``.
    """

    num_cycles: int
    cycle_length: int
    step_size: float
    exploration_frac: float = 0.8
    thin: int = 1
    temperature: float = 1.0
    base: str = "sgld"  # "sgld" | "sghmc"
    friction: float = 0.05  # sghmc base only

    def __post_init__(self):
        if self.num_cycles < 1 or self.cycle_length < 2:
            raise ValueError(
                f"num_cycles={self.num_cycles} (>=1) and cycle_length="
                f"{self.cycle_length} (>=2) required"
            )
        if not self.step_size > 0:
            raise ValueError("step_size must be positive")
        if not 0.0 <= self.exploration_frac < 1.0:
            raise ValueError("exploration_frac must be in [0, 1)")
        if self.base not in ("sgld", "sghmc"):
            raise ValueError(f"base={self.base!r}; must be 'sgld' or 'sghmc'")
        if not 0.0 < self.friction <= 1.0:
            raise ValueError("friction must be in (0, 1]")
        if not self.temperature > 0:
            raise ValueError("temperature must be positive")
        if self.thin < 1:
            raise ValueError("thin must be >= 1")
        # exploration_steps floors, so exploration_frac < 1 always leaves
        # >= 1 sampling step — no empty-sampling-stage case to guard
        if self.sampling_steps % self.thin:
            raise ValueError(
                f"sampling steps per cycle ({self.sampling_steps}) must be "
                f"divisible by thin={self.thin}"
            )

    @property
    def exploration_steps(self) -> int:
        return int(self.exploration_frac * self.cycle_length)

    @property
    def sampling_steps(self) -> int:
        return self.cycle_length - self.exploration_steps


class CSGMCMCResult(NamedTuple):
    samples: jnp.ndarray  # (K, ...) snapshots, K = num_cycles * kept/cycle
    cycle: jnp.ndarray  # (K,) int32 — which cycle each snapshot came from
    stats: SGMCMCStats  # per-snapshot (step_size at kept step, grad norm, div)
    final_theta: object
    final_aux: object  # momentum (sghmc) or None


@partial(jax.jit, static_argnames=("term_fn", "num_terms", "config",
                                   "psum_axis", "prior_fn"))
def _run_csgmcmc_jit(key, theta0, term_fn, num_terms, config: CSGMCMCConfig,
                     pre=None, data=None, psum_axis=None, prior_fn=None):
    ghat = _make_ghat(term_fn, num_terms, data, psum_axis, prior_fn)
    ell = config.cycle_length
    temp = config.temperature
    alpha = config.friction
    sghmc = config.base == "sghmc"
    kept_per_cycle = config.sampling_steps // config.thin

    def eps_at(t):
        pos = jnp.mod(t, ell).astype(jnp.float32)
        return (config.step_size / 2.0) * (jnp.cos(jnp.pi * pos / ell) + 1.0)

    def one_step(carry, g_idx, with_noise):
        """One update at global step g_idx; with_noise is STATIC (the
        exploration stage is deterministic ascent — Zhang et al. §3.2)."""
        theta, v, div = carry
        k = jax.random.fold_in(key, g_idx)
        k_batch, k_noise = jax.random.split(k)
        m = jax.random.randint(k_batch, (), 0, num_terms)
        g = ghat(theta, m)
        gnorm2 = sum(jnp.sum(l.astype(jnp.float32) ** 2)
                     for l in jax.tree_util.tree_leaves(g))
        eps = eps_at(g_idx)
        z = (_leaf_noise(k_noise, theta) if with_noise
             else _tmap(jnp.zeros_like, theta))

        def _p(leaf_fn_nopre, leaf_fn_pre, *trees):
            if pre is None:
                return _tmap(leaf_fn_nopre, *trees)
            return _tmap(leaf_fn_pre, *trees, pre)

        if sghmc:
            ns = jnp.sqrt(2.0 * alpha * eps * temp)
            v_new = _p(
                lambda vl, gl, zl: (1.0 - alpha) * vl + eps * gl + ns * zl,
                lambda vl, gl, zl, pl: ((1.0 - alpha) * vl + eps * pl * gl
                                        + ns * jnp.sqrt(pl) * zl),
                v, g, z,
            )
            t_new = _tmap(
                lambda t, vl: (t + vl).astype(t.dtype), theta, v_new
            )
            (t_new, v_new), ok = _finite_select((t_new, v_new), (theta, v))
        else:
            t_new = _p(
                lambda t, gl, zl: (t + 0.5 * eps * gl
                                   + jnp.sqrt(eps * temp) * zl).astype(t.dtype),
                lambda t, gl, zl, pl: (t + 0.5 * eps * pl * gl
                                       + jnp.sqrt(eps * temp * pl) * zl
                                       ).astype(t.dtype),
                theta, g, z,
            )
            t_new, ok = _finite_select(t_new, theta)
            v_new = v
        return ((t_new, v_new, jnp.logical_or(div, ~ok)),
                (eps, jnp.sqrt(gnorm2)))

    def one_cycle(carry, c_idx):
        base_step = c_idx * ell

        # exploration stage: deterministic ascent, nothing collected
        def explore_body(i, c):
            c2, _ = one_step(c, base_step + i, with_noise=False)
            return c2

        carry = jax.lax.fori_loop(0, config.exploration_steps, explore_body,
                                  carry)

        # sampling stage: base dynamics with noise, keep every thin-th
        def kept_draw(c, b):
            theta, v, _ = c
            inner0 = (theta, v, jnp.asarray(False))
            gs = (base_step + config.exploration_steps + b * config.thin
                  + jnp.arange(config.thin))

            def body(i, c_and_last):
                cc, _ = c_and_last
                c2, out = one_step(cc, gs[i], with_noise=True)
                return c2, out

            (theta, v, div), (eps, gn) = jax.lax.fori_loop(
                0, config.thin, body,
                (inner0,
                 (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))),
            )
            stats = SGMCMCStats(step_size=eps, grad_norm=gn, divergent=div)
            return (theta, v, jnp.asarray(False)), (theta, stats)

        carry, (snaps, stats) = jax.lax.scan(
            kept_draw, carry, jnp.arange(kept_per_cycle)
        )
        return carry, (snaps, stats, jnp.full((kept_per_cycle,), c_idx,
                                              jnp.int32))

    carry0 = (theta0, _tmap(jnp.zeros_like, theta0), jnp.asarray(False))
    (thetaF, vF, _), (samples, stats, cycles) = jax.lax.scan(
        one_cycle, carry0, jnp.arange(config.num_cycles)
    )

    # (num_cycles, kept, ...) -> (num_cycles * kept, ...) snapshot axis
    def _merge(l):
        return l.reshape((l.shape[0] * l.shape[1],) + l.shape[2:])

    return CSGMCMCResult(
        samples=_tmap(_merge, samples),
        cycle=_merge(cycles),
        stats=_tmap(_merge, stats),
        final_theta=thetaF,
        final_aux=vF if sghmc else None,
    )


def run_csgmcmc(
    key: jax.Array,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config: CSGMCMCConfig,
    inv_mass=None,
    data=None,
) -> CSGMCMCResult:
    """Cyclical SG-MCMC (cSGLD / cSGHMC) over a term-decomposed target.

    Same ``term_fn(theta, m[, data])`` protocol as :func:`run_sgld` /
    split HMC (``define_split_model_log_prob`` feeds it directly), so a
    workload moves between constant-step SG-MCMC and the cyclical
    schedule by swapping the runner.  No reference counterpart (the
    reference's minibatch story stops at split HMC); the cyclical
    schedule is the standard recipe for MULTIMODAL BNN posteriors —
    each cycle's hot restart relocates the chain, each cool-down collects
    locally mixed snapshots (Zhang et al. 2020).
    """
    theta0, pre, data = _prep(
        key, term_fn, num_terms, theta0, config, inv_mass, data,
        "run_csgmcmc",
    )
    return _run_csgmcmc_jit(key, theta0, term_fn, num_terms, config, pre,
                            data)


def run_csgmcmc_chains(key, term_fn, num_terms, theta0,
                       config: CSGMCMCConfig, num_chains: int, inv_mass=None,
                       data=None, theta0_is_stacked=None) -> CSGMCMCResult:
    """Vectorised independent cyclical SG-MCMC chains (vmap over keys /
    initial states; samples and stats gain a leading (num_chains,) axis)."""
    from ..utils.pytree import is_param_tree, stack_param_tree

    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
    else:
        theta0 = jnp.asarray(theta0)
        template = theta0 if theta0.ndim == 1 else theta0[0]
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    _, pre, data = _prep(
        key, term_fn, num_terms, template, config, inv_mass, data,
        "run_csgmcmc_chains",
    )
    keys = jax.random.split(key, num_chains)
    return jax.vmap(
        lambda k, t: _run_csgmcmc_jit(k, t, term_fn, num_terms, config, pre,
                                      data),
        in_axes=(0, 0),
    )(keys, theta0)


def _csgmcmc_sharded_adapter(key, theta0, term_fn, num_terms, config, pre=None,
                             data=None, init_aux=None, start_step=0,
                             psum_axis=None, prior_fn=None):
    """Arity adapter for parallel.sharding._run_sgmcmc_sharded, which
    threads (init_aux, start_step) resume slots the cyclical sampler does
    not have (a cycle's exploration stage re-derives its state; there is
    no chunked-resume contract)."""
    if init_aux is not None or start_step:
        raise ValueError(
            "cyclical SG-MCMC has no chunked-resume contract "
            "(init_aux/start_step unsupported)"
        )
    return _run_csgmcmc_jit(key, theta0, term_fn, num_terms, config, pre,
                            data, psum_axis, prior_fn)
