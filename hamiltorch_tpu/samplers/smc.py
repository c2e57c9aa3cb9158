"""Tempered Sequential Monte Carlo with HMC mutations (SMC sampler).

No counterpart in the reference.  An SMC sampler moves a POPULATION of
particles from the prior to the posterior through a tempered path
``pi_k ∝ prior * lik^beta_k``: at each stage the particles reweight by the
likelihood increment, resample when the weights degenerate, and mutate
with a few jittered-HMC steps targeting the current tempered posterior.

Why it earns a place next to HMC/NUTS/ChEES/PT here:

* it is multi-particle by construction — the particle axis is one batch
  dimension through every matmul, exactly the regime this framework's
  vmapped/batched execution is built for (the same argument as ChEES-HMC;
  the retrieved ChEES-SMC paper, arXiv:2504.02627, combines the two);
* it estimates the MODEL EVIDENCE log Z as a by-product (the running sum
  of log-mean incremental weights) — a quantity no MCMC chain in this
  framework (or the reference) can produce;
* like parallel tempering it crosses energy barriers (the early, hot
  stages are nearly the prior), but with a normalising-constant estimate
  and an embarrassingly parallel population.

TPU-first shape: one ``lax.scan`` over a FIXED tempering ladder; each
stage is (reweight -> branchless conditional systematic resampling ->
R batched-leapfrog mutations).  Resampling is a gather — data-dependent
indices but static shapes.  The mutation step size adapts across stages
by a Robbins-Monro update toward the jittered-HMC optimum, and trajectory
lengths are jittered per stage (shared across particles, the ChEES
convention — lanes never diverge).  With ``adapt_trajectory=True`` the
trajectory TIME additionally follows the ChEES criterion across every
mutation (ChEES-SMC, arXiv:2504.02627): the particle population plays
the role of the chain ensemble, so the criterion's cross-chain mean is
free — no extra collective, no extra gradient evaluations.

Particles may be flat (N, D) blocks or parameter PYTREES with (N, ...)
leaves; the hot loops reuse the ChEES batched-leapfrog kernels, so the
tree path pays no flat-layout tax.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .chees import _batched_leapfrog, _batched_leapfrog_tree

_tmap = jax.tree_util.tree_map


@dataclasses.dataclass(frozen=True)
class SMCConfig:
    num_particles: int
    # tempering stages: beta_k = (k / num_temps)**temp_power, k = 1..num_temps
    # (power > 1 spends more stages at small beta, where the likelihood
    # reshapes the prior fastest — the usual SMC schedule choice)
    num_temps: int = 20
    temp_power: float = 3.0
    mcmc_steps: int = 5  # HMC mutations per stage
    leapfrog_steps: int = 10  # leapfrog steps per mutation
    step_size: float = 0.1
    # resample when ESS / N drops below this fraction (branchless select;
    # 1.0 = every stage, 0.0 = never)
    resample_threshold: float = 0.5
    # Robbins-Monro step-size adaptation across stages toward the
    # jittered-HMC optimum (Hoffman et al. 2021)
    adapt_step_size: bool = True
    desired_accept_rate: float = 0.651
    # ChEES trajectory-length adaptation (the retrieved ChEES-SMC paper,
    # arXiv:2504.02627, puts the ChEES criterion inside an SMC sampler):
    # the trajectory TIME T follows Adam on the ChEES gradient computed
    # from the particle population at every mutation, and each mutation
    # runs ceil(u * T / eps) leapfrog steps (u ~ U(0,1) shared across
    # particles) capped at ``leapfrog_steps``.  Off by default: the fixed
    # randint-jittered lengths above stay bit-identical.
    adapt_trajectory: bool = False
    # initial trajectory time T_0; None = step_size * leapfrog_steps / 2
    # (the midpoint of the fixed-jitter scheme's range)
    init_trajectory_length: float | None = None
    adam_lr: float = 0.025  # ChEESConfig's default

    def __post_init__(self):
        if self.num_particles < 2:
            raise ValueError("num_particles must be >= 2")
        if self.num_temps < 1:
            raise ValueError("num_temps must be >= 1")
        if self.mcmc_steps < 1:
            raise ValueError("mcmc_steps must be >= 1")
        if self.leapfrog_steps < 1:
            raise ValueError("leapfrog_steps must be >= 1")
        if not self.temp_power > 0:
            raise ValueError("temp_power must be positive")
        if not self.step_size > 0:
            raise ValueError("step_size must be positive")
        if not 0.0 <= self.resample_threshold <= 1.0:
            raise ValueError("resample_threshold must be in [0, 1]")
        if not 0.0 < self.desired_accept_rate < 1.0:
            raise ValueError("desired_accept_rate must be in (0, 1)")
        if self.init_trajectory_length is not None and not (
            self.init_trajectory_length > 0
        ):
            raise ValueError("init_trajectory_length must be positive")
        if not self.adam_lr > 0:
            raise ValueError("adam_lr must be positive")


class SMCInfo(NamedTuple):
    betas: jnp.ndarray  # (K,) tempering ladder
    ess_fraction: jnp.ndarray  # (K,) ESS/N before each resample decision
    resampled: jnp.ndarray  # (K,) bool
    accept_prob: jnp.ndarray  # (K,) mean mutation acceptance per stage
    step_size: jnp.ndarray  # (K,) step size used at each stage
    # (K,) ChEES trajectory time T each stage mutated with (exp(log_t) at
    # stage entry); constant at T_0 unless config.adapt_trajectory
    trajectory_length: jnp.ndarray


class SMCResult(NamedTuple):
    particles: jnp.ndarray  # (N, D) or tree of (N, ...) leaves — FINAL stage
    log_weights: jnp.ndarray  # (N,) normalised log-weights of the particles
    log_evidence: jnp.ndarray  # scalar: estimate of log Z = log p(data)
    info: SMCInfo


def _systematic_resample(key, logw, n):
    """Systematic resampling: indices (N,) int32 from normalised log-weights.

    One uniform offsets a stratified comb — O(N log N) via searchsorted on
    the weight cumsum; static shapes, jit-safe."""
    w = jax.nn.softmax(logw)
    positions = (jax.random.uniform(key, ()) + jnp.arange(n)) / n
    return jnp.searchsorted(jnp.cumsum(w), positions).astype(jnp.int32)


@partial(jax.jit, static_argnames=("log_prior_fn", "log_lik_fn", "config"))
def _run_smc_jit(key, particles0, log_prior_fn, log_lik_fn, config: SMCConfig,
                 data=None):
    lik = log_lik_fn if data is None else (lambda t: log_lik_fn(t, data))
    is_tree = not hasattr(particles0, "ndim")
    leaves0 = jax.tree_util.tree_leaves(particles0)
    n = leaves0[0].shape[0]
    dtype = leaves0[0].dtype

    betas = (jnp.arange(1, config.num_temps + 1, dtype=dtype)
             / config.num_temps) ** config.temp_power
    prev_betas = jnp.concatenate([jnp.zeros((1,), dtype), betas[:-1]])

    lik_vec = jax.vmap(lik)
    prior_vec = jax.vmap(log_prior_fn)

    def gather(tree, idx):
        return _tmap(lambda l: l[idx], tree)

    def where_n(mask, new, old):
        return _tmap(
            lambda nl, ol: jnp.where(
                mask.reshape((n,) + (1,) * (nl.ndim - 1)), nl, ol
            ),
            new, old,
        )

    lf = _batched_leapfrog_tree if is_tree else _batched_leapfrog

    def dot_n(a, b):
        """Per-particle inner product over all leaves: (N,)."""
        terms = [
            jnp.sum((al * bl).reshape(n, -1), axis=-1)
            for al, bl in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            )
        ]
        return sum(terms)

    def mutate(key, parts, beta, eps, traj):
        """R jittered-HMC transitions targeting prior * lik^beta.

        ``traj = (log_t, adam_m, adam_v, adam_t)`` is the ChEES
        trajectory-adaptation state; it rides unchanged unless
        ``config.adapt_trajectory`` (arXiv:2504.02627's criterion, the
        same gradient as samplers/chees.py with the particle population
        as the chain ensemble and an identity mass).
        """

        def tempered(t):
            return log_prior_fn(t) + beta * lik(t)

        vg = jax.vmap(jax.value_and_grad(tempered))

        def velocity(p):
            return p

        def kinetic(p):
            return 0.5 * dot_n(p, p)

        def one_step(carry, k_step):
            parts, logps, grads, traj = carry
            log_t, adam_m, adam_v, adam_t = traj
            k_mom, k_jit, k_mh = jax.random.split(k_step, 3)
            p_leaves, p_tdef = jax.tree_util.tree_flatten(parts)
            mom_keys = jax.random.split(k_mom, len(p_leaves))
            ps = jax.tree_util.tree_unflatten(p_tdef, [
                jax.random.normal(mk, l.shape, dtype)
                for mk, l in zip(mom_keys, p_leaves)
            ])
            # shared jittered trajectory length (the ChEES convention:
            # every particle runs the same L, lanes never diverge)
            if config.adapt_trajectory:
                u = jax.random.uniform(k_jit, (), dtype)
                traj_t = u * jnp.exp(log_t)
                num_steps = jnp.minimum(
                    jnp.maximum(1, jnp.ceil(traj_t / eps).astype(jnp.int32)),
                    config.leapfrog_steps,
                )
            else:
                num_steps = 1 + (
                    jax.random.randint(k_jit, (), 0, config.leapfrog_steps)
                )
            h0 = -logps + kinetic(ps)
            th, p1, logp1, grad1 = lf(
                vg, velocity, parts, ps, logps, grads, eps, num_steps,
                config.leapfrog_steps,
            )
            h1 = -logp1 + kinetic(p1)
            log_ratio = h0 - h1
            finite = jnp.isfinite(log_ratio)
            alpha = jnp.where(finite, jnp.exp(jnp.minimum(0.0, log_ratio)), 0.0)
            accept = finite & (
                jnp.log(jax.random.uniform(k_mh, (n,), dtype)) < log_ratio
            )
            parts_out = where_n(accept, th, parts)
            logps_out = jnp.where(accept, logp1, logps)
            grads_out = where_n(accept, grad1, grads)

            if config.adapt_trajectory:
                # ChEES gradient wrt log T, exactly the ensemble criterion
                # in samplers/chees.py:429-458 with N particles as the
                # chain axis and identity mass (v_end = p1): proposals vs
                # previous states around the post-accept population centre,
                # alpha-weighted, non-finite contributions masked, total
                # bounded (the criterion is fourth order in theta)
                mu = _tmap(lambda l: jnp.mean(l, axis=0), parts_out)
                diff_new = _tmap(lambda a, m_: a - m_, th, mu)
                diff_old = _tmap(lambda a, m_: a - m_, parts, mu)
                per = (dot_n(diff_new, diff_new) - dot_n(diff_old, diff_old)
                       ) * dot_n(diff_new, p1)
                w = alpha / jnp.maximum(jnp.sum(alpha), 1e-6)
                contrib = jnp.where(finite, w * per, 0.0)
                contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
                grad_log_t = jnp.clip(traj_t * jnp.sum(contrib), -1e6, 1e6)
                t1 = (adam_t + 1).astype(dtype)
                adam_m = 0.9 * adam_m + 0.1 * grad_log_t
                adam_v = 0.999 * adam_v + 0.001 * grad_log_t**2
                m_hat = adam_m / (1.0 - 0.9**t1)
                v_hat = adam_v / (1.0 - 0.999**t1)
                log_t = log_t + config.adam_lr * m_hat / (
                    jnp.sqrt(v_hat) + 1e-8
                )
                # keep trajectories sane: T in [eps, eps * leapfrog_steps]
                log_t = jnp.clip(
                    log_t, jnp.log(eps), jnp.log(eps * config.leapfrog_steps)
                )
                traj = (log_t, adam_m, adam_v, adam_t + 1)
            return (parts_out, logps_out, grads_out, traj), jnp.mean(alpha)

        logps, grads = vg(parts)
        (parts, _, _, traj), alphas = jax.lax.scan(
            one_step, (parts, logps, grads, traj),
            jax.random.split(key, config.mcmc_steps),
        )
        return parts, jnp.mean(alphas), traj

    def stage(carry, xs):
        parts, logw, log_z, eps, traj = carry
        k_idx, beta, beta_prev = xs
        # per-stage RNG = fold_in(base_key, stage_index), the repo-wide
        # convention (no carried split keys: keeps any future chunked/
        # checkpointed SMC bit-exact against a straight run)
        stage_key = jax.random.fold_in(key, k_idx)
        k_res, k_mut = jax.random.split(stage_key)

        # --- reweight: incremental likelihood tempering -------------------
        incr = (beta - beta_prev) * lik_vec(parts)
        # log-evidence increment: log E_w[exp(incr)] under the CURRENT
        # normalised weights
        logw_n = logw - jax.scipy.special.logsumexp(logw)
        log_z = log_z + jax.scipy.special.logsumexp(logw_n + incr)
        logw = logw_n + incr

        # --- conditional systematic resampling (branchless select) --------
        w = jax.nn.softmax(logw)
        ess_frac = 1.0 / (n * jnp.sum(w * w))
        do_resample = ess_frac < config.resample_threshold
        idx = _systematic_resample(k_res, logw, n)
        idx = jnp.where(do_resample, idx, jnp.arange(n, dtype=jnp.int32))
        parts = gather(parts, idx)
        logw = jnp.where(do_resample, jnp.zeros_like(logw), logw)

        # --- mutate at the current temperature -----------------------------
        t_used = jnp.exp(traj[0])  # the T THIS stage's mutations start at
        parts, acc, traj = mutate(k_mut, parts, beta, eps, traj)
        eps_used = eps  # info records the value THIS stage mutated with
        if config.adapt_step_size:
            # Robbins-Monro toward the jittered-HMC optimal acceptance;
            # bounded multiplicative steps keep eps positive and stable
            eps = eps * jnp.exp(
                0.5 * jnp.clip(acc - config.desired_accept_rate, -0.5, 0.5)
            )

        info = (ess_frac, do_resample, acc, eps_used, t_used)
        return (parts, logw, log_z, eps, traj), info

    logw0 = jnp.zeros((n,), dtype)
    t0 = (
        config.init_trajectory_length
        if config.init_trajectory_length is not None
        else config.step_size * config.leapfrog_steps / 2.0
    )
    traj0 = (
        jnp.log(jnp.asarray(t0, dtype)),
        jnp.zeros((), dtype), jnp.zeros((), dtype),
        jnp.zeros((), jnp.int32),
    )
    carry0 = (
        particles0, logw0, jnp.zeros((), dtype),
        jnp.asarray(config.step_size, dtype), traj0,
    )
    (parts, logw, log_z, _, _), (ess_f, res, accs, epss, ts) = jax.lax.scan(
        stage, carry0,
        (jnp.arange(config.num_temps, dtype=jnp.int32), betas, prev_betas),
    )
    return SMCResult(
        particles=parts,
        log_weights=logw - jax.scipy.special.logsumexp(logw),
        log_evidence=log_z,
        info=SMCInfo(
            betas=betas, ess_fraction=ess_f, resampled=res,
            accept_prob=accs, step_size=epss, trajectory_length=ts,
        ),
    )


def run_smc(
    key,
    log_prior_fn,
    log_lik_fn,
    prior_sample_fn,
    config: SMCConfig,
    data=None,
) -> SMCResult:
    """Tempered SMC from the prior to the posterior.

    * ``log_prior_fn(theta)`` — log prior density (the beta=0 endpoint);
    * ``log_lik_fn(theta[, data])`` — log likelihood (tempered by beta;
      large datasets ride through ``data`` as a jit operand);
    * ``prior_sample_fn(key, n)`` — n draws from the prior: a (N, D) block
      or a pytree with (N, ...) leaves (sets the particle layout).

    Returns an :class:`SMCResult`: the final particle population with
    normalised ``log_weights`` (use
    ``gather(particles, systematic indices)`` or weighted statistics),
    the ``log_evidence`` estimate of log p(data) — the quantity MCMC
    chains cannot produce — and per-stage diagnostics.
    """
    from ..ops.potential import resolve_potential

    k_init, key = jax.random.split(key)
    particles0 = prior_sample_fn(k_init, config.num_particles)
    leaves = jax.tree_util.tree_leaves(particles0)
    if any(l.shape[:1] != (config.num_particles,) for l in leaves):
        raise ValueError(
            "prior_sample_fn must return leaves with a leading "
            f"num_particles={config.num_particles} axis"
        )
    # honour the _raw_fn/_data operand protocol (define_model_prior_and_lik
    # attaches the dataset): it must ride as a jit operand, not a closure
    lik, data_r = resolve_potential(log_lik_fn, None)
    if data is None:
        data = data_r
    return _run_smc_jit(key, particles0, log_prior_fn, lik, config,
                        data=data)


def smc_posterior_sample(key, result: SMCResult):
    """Equal-weight posterior draws: one systematic resample of the final
    population under its normalised log-weights."""
    n = jax.tree_util.tree_leaves(result.particles)[0].shape[0]
    idx = _systematic_resample(key, result.log_weights, n)
    return _tmap(lambda l: l[idx], result.particles)
