"""Microcanonical Langevin Monte Carlo (MCLMC).

No counterpart in the reference — this is the modern unadjusted sampler
family (Robnik, De Luca, Silverstein & Seljak 2022, arXiv:2212.08549;
tuning scheme: Robnik & Seljak 2023, arXiv:2303.18221).  The dynamics are
ISOKINETIC: the velocity u lives on the unit sphere S^{d-1}, positions
drift as dx/dt = u and the gradient bends u toward increasing log p,

    du/dt = P(u) grad(log p)(x) / (d - 1),    P(u) = I - u u^T,

so the stationary x-marginal is exp(log p) WITHOUT a Metropolis test.
Every gradient evaluation moves the chain — no rejected trajectories, no
U-turn bookkeeping — which is why MCLMC reports multi-x gradient-budget
wins over NUTS in high dimension.  A weak O(eps^2) discretisation bias
remains; it is controlled by tuning eps so the per-dimension energy-error
variance Var[dE]/d sits at ``desired_energy_var`` (the papers' knob, 5e-4
default ~ negligible bias on benchmark posteriors).

The "Langevin" part is a PARTIAL momentum refresh after every step,

    u <- (u + nu z) / |u + nu z|,  z ~ N(0, I),
    nu = sqrt(expm1(2 eps / L) / d),

equivalent to an Ornstein-Uhlenbeck decorrelation with momentum-coherence
time L — the second tuned hyperparameter (L ~ sqrt(tr Sigma) of the
posterior, measured during tuning).

TPU-first shape: every phase is one jitted ``lax.scan`` whose hot loop is
(1-2 gradient evaluations + axpy-scale vector algebra) — no branches, no
MH bookkeeping; chains vmap.  Velocity updates run the exact exponential-
map form (exp/log1p), not a truncated series.  Per-step RNG folds the
GLOBAL step index into the base key (chunked runs resume bit-exactly, the
repo-wide convention).  Non-finite steps are branchless rejections
(``stats.divergent``), exceptions never cross the scan.

Integrators: ``"mclachlan"`` (default) is the 2nd-order minimal-norm
scheme V(b1 e) X(e/2) V((1-2 b1) e) X(e/2) V(b1 e) with b1 = 0.19318...
— two fresh gradients per step, the MCLMC papers' recommendation (its
larger stability region beats leapfrog's one-gradient steps at equal
energy error); ``"leapfrog"`` V(e/2) X(e) V(e/2) costs one.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_tmap = jax.tree_util.tree_map

# minimal-norm (McLachlan) velocity coefficient
_B1 = 0.1931833275037836


@dataclasses.dataclass(frozen=True)
class MCLMCConfig:
    """Static configuration for :func:`run_mclmc`.

    ``num_samples`` counts TOTAL post-tuning transitions; with ``thin > 1``
    every thin-th state is kept (``num_samples`` divisible by ``thin``).

    ``tune_steps > 0`` runs a tuning scan first: the step size follows a
    log-space Robbins-Monro update toward ``desired_energy_var`` (the
    per-dimension energy-error variance Var[dE]/d; energy error ~ eps^6
    for the minimal-norm integrator, hence the 1/6 exponent), and — when
    ``trajectory_length`` is None — the momentum-coherence time is set to
    L = sqrt(tr Sigma_hat) from second-half Welford statistics of the
    tuning trajectory (arXiv:2303.18221's heuristic).  ``tune_steps = 0``
    runs at the given (``step_size``, ``trajectory_length``) unchanged —
    the resume path.
    """

    num_samples: int
    step_size: float = 0.2
    trajectory_length: float | None = None  # L; None = tuned / sqrt(d) seed
    tune_steps: int = 500
    desired_energy_var: float = 5e-4
    integrator: str = "mclachlan"  # "mclachlan" | "leapfrog"
    thin: int = 1

    def __post_init__(self):
        if self.num_samples < 1:
            raise ValueError(f"num_samples={self.num_samples}; must be >= 1")
        if not self.step_size > 0:
            raise ValueError("step_size must be positive")
        if self.trajectory_length is not None and not self.trajectory_length > 0:
            raise ValueError("trajectory_length must be positive")
        if self.tune_steps < 0:
            raise ValueError("tune_steps must be >= 0")
        if not self.desired_energy_var > 0:
            raise ValueError("desired_energy_var must be positive")
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


class MCLMCStats(NamedTuple):
    """Per-kept-draw diagnostics."""

    energy_change: jnp.ndarray  # dE of the kept step (f32)
    divergent: jnp.ndarray  # bool: any non-finite (skipped) step in window


class MCLMCResult(NamedTuple):
    samples: jnp.ndarray  # (N, D) or tree of (N, ...) leaves
    stats: MCLMCStats
    step_size: jnp.ndarray  # scalar: eps the main phase ran at (post-tune)
    trajectory_length: jnp.ndarray  # scalar: L the main phase ran at
    final_theta: object  # last state (resume)
    final_u: jnp.ndarray  # last unit velocity, flat (D,) (resume)
    final_step: jnp.ndarray  # global step counter after the run


def _unit(v):
    return v / jnp.sqrt(jnp.sum(v * v))


def _velocity_update(u, g, coef, dims):
    """Exact isokinetic velocity update (ESH dynamics, arXiv:2212.08549
    eq. 6; the same closed form blackjax ships): rotate u toward the
    gradient direction e by the exponential map, returning the kinetic
    energy change (d-1) * log-factor so dE tracking is exact."""
    g32 = g.astype(jnp.float32)
    g_norm = jnp.sqrt(jnp.sum(g32 * g32))
    # zero gradient (a chain seeded exactly at a mode): delta -> 0 makes
    # the rotation the identity, but e = g/|g| is 0/0 — guard the division
    e = (g32 / jnp.maximum(g_norm, 1e-30)).astype(u.dtype)
    delta = (coef * g_norm / (dims - 1)).astype(u.dtype)
    # rounding can push the unit-vector dot a hair outside [-1, 1]; and at
    # ue = -1 with zeta -> 0 (u antiparallel to a huge gradient) the log
    # argument touches 0 — floor it so dK is large-but-finite, not NaN
    # (one NaN would cascade through the tuner's halving rule)
    ue = jnp.clip(jnp.sum(u * e), -1.0, 1.0)
    zeta = jnp.exp(-delta)
    u_new = e * ((1.0 - zeta) * (1.0 + zeta + ue * (1.0 - zeta))) + 2.0 * zeta * u
    d_kinetic = (dims - 1.0) * (
        delta - jnp.log(2.0)
        + jnp.log(jnp.maximum(1.0 + ue + (1.0 - ue) * zeta * zeta, 1e-12))
    )
    return _unit(u_new), d_kinetic.astype(jnp.float32)


def _make_step(vg, dims, integrator: str):
    """One deterministic dynamics step: (x, u, logp, g) -> updated + dE.

    The trailing velocity half-update of step k happens at the same x as
    the leading one of step k+1, so its gradient rides the carry — the
    net cost is 2 (mclachlan) or 1 (leapfrog) fresh gradients per step.
    """

    if integrator == "mclachlan":

        def step(x, u, logp, g, eps):
            de = jnp.zeros((), jnp.float32)
            u, dk = _velocity_update(u, g, _B1 * eps, dims)
            de += dk
            x = x + (0.5 * eps) * u
            logp1, g1 = vg(x)
            u, dk = _velocity_update(u, g1, (1.0 - 2.0 * _B1) * eps, dims)
            de += dk
            x = x + (0.5 * eps) * u
            logp2, g2 = vg(x)
            u, dk = _velocity_update(u, g2, _B1 * eps, dims)
            de += dk
            de += (logp - logp2).astype(jnp.float32)  # potential change
            return x, u, logp2, g2, de

    else:  # leapfrog

        def step(x, u, logp, g, eps):
            u, dk1 = _velocity_update(u, g, 0.5 * eps, dims)
            x = x + eps * u
            logp1, g1 = vg(x)
            u, dk2 = _velocity_update(u, g1, 0.5 * eps, dims)
            de = dk1 + dk2 + (logp - logp1).astype(jnp.float32)
            return x, u, logp1, g1, de

    return step


def _refresh(u, key, eps, length, dims):
    """Partial momentum refresh: OU decorrelation with coherence time L."""
    nu = jnp.sqrt(jnp.expm1(2.0 * eps / length) / dims).astype(u.dtype)
    z = jax.random.normal(key, u.shape, u.dtype)
    return _unit(u + nu * z)


@partial(jax.jit, static_argnames=("log_prob_fn", "config"))
def _run_mclmc_jit(key, theta0, eps0, length0, log_prob_fn,
                   config: MCLMCConfig, data=None, init_u=None, start_step=0):
    # eps0/length0 ride in as OPERANDS, not compile-time constants: a baked
    # constant lets XLA fold the refresh's expm1/sqrt in the HLO evaluator,
    # whose rounding differs one ulp from the runtime kernels — which broke
    # bit-exact resume (tune_steps=0 vs the tuned run's traced eps).
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    vg = jax.value_and_grad(lp)
    dims = theta0.shape[0]
    dtype = theta0.dtype
    step = _make_step(vg, dims, config.integrator)
    n_kept = config.num_samples // config.thin

    # RNG namespaces (fold_in data is uint32): main steps use the global
    # step index < 2**31; tuning uses 2**31 + i; velocity init 2**32 - 1
    if init_u is None:
        u0 = _unit(jax.random.normal(
            jax.random.fold_in(key, 2**32 - 1), (dims,), dtype
        ))
    else:
        u0 = init_u
    logp0, g0 = vg(theta0)

    # ---- tuning phase ----------------------------------------------------
    if config.tune_steps > 0:
        half = config.tune_steps // 2
        target = jnp.asarray(config.desired_energy_var, jnp.float32)
        beta = 0.99  # dE^2 EMA decay (~100-step window)
        log_eps_lo = math.log(config.step_size) - 7.0  # sanity bounds: the
        log_eps_hi = math.log(config.step_size) + 7.0  # seed +- factor ~1100

        def tune_step(carry, i):
            x, u, logp, g, log_eps, varE, ema_t, w_cnt, w_mean, w_m2 = carry
            eps = jnp.exp(log_eps)
            xn, un, logpn, gn, de = step(x, u, logp, g, eps.astype(dtype))
            ok = (jnp.isfinite(de)
                  & jnp.all(jnp.isfinite(xn)) & jnp.all(jnp.isfinite(un)))
            x = jnp.where(ok, xn, x)
            u = jnp.where(ok, un, u)
            logp = jnp.where(ok, logpn, logp)
            g = jnp.where(ok, gn, g)
            # Robbins-Monro toward the energy-variance target on a LINEAR
            # EMA of dE^2/d (per-step log(dE^2) equilibrates at the
            # geometric mean — Jensen — and overshoots eps badly); dE^2 ~
            # eps^6 for the minimal-norm scheme, hence the 1/6 exponent.
            # Non-finite steps halve eps (arXiv:2303.18221's nan-handling).
            varE = jnp.where(ok, beta * varE + (1 - beta) * de * de / dims,
                             varE)
            ema_t = ema_t + jnp.where(ok, 1.0, 0.0)
            corrected = varE / jnp.maximum(1.0 - beta**ema_t, 1e-6)
            # lr/6 * window must stay well under 1 or the RM loop
            # oscillates against the EMA lag (measured: a 0.2 lr with a
            # 50-step window parked varE ~4x off target)
            upd = jnp.clip(
                0.03 / 6.0 * (jnp.log(target) - jnp.log(corrected + 1e-20)),
                -0.25, 0.25,
            )
            log_eps = jnp.where(ok, log_eps + upd, log_eps + jnp.log(0.5))
            log_eps = jnp.clip(log_eps, log_eps_lo, log_eps_hi)
            # second-half Welford of x -> L = sqrt(tr Sigma_hat)
            collect = i >= half
            cnt = w_cnt + jnp.where(collect, 1.0, 0.0)
            x32 = x.astype(jnp.float32)
            delta = x32 - w_mean
            w_mean = jnp.where(collect, w_mean + delta / jnp.maximum(cnt, 1.0),
                               w_mean)
            w_m2 = jnp.where(collect, w_m2 + delta * (x32 - w_mean), w_m2)
            # partial refresh (the current L estimate only sets nu here)
            u = _refresh(u, jax.random.fold_in(key, jnp.uint32(2**31) + i),
                         eps, length0, dims)
            return (x, u, logp, g, log_eps, varE, ema_t, cnt, w_mean, w_m2), None

        carry0 = (theta0, u0, logp0, g0, jnp.log(eps0),
                  jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                  jnp.zeros((), jnp.float32),
                  jnp.zeros((dims,), jnp.float32),
                  jnp.zeros((dims,), jnp.float32))
        (x, u0, logp0, g0, log_eps, _, _, cnt, _, m2), _ = jax.lax.scan(
            tune_step, carry0, jnp.arange(config.tune_steps, dtype=jnp.uint32)
        )
        theta0 = x
        eps = jnp.exp(log_eps)
        if config.trajectory_length is None:
            var = m2 / jnp.maximum(cnt, 1.0)
            length = jnp.maximum(jnp.sqrt(jnp.sum(var)), 2.0 * eps)
        else:
            length = length0
    else:
        eps, length = eps0, length0

    # ---- main phase --------------------------------------------------------
    eps_d = eps.astype(dtype)

    def one_step(carry, g_idx):
        x, u, logp, g, div = carry
        xn, un, logpn, gn, de = step(x, u, logp, g, eps_d)
        ok = (jnp.isfinite(de)
              & jnp.all(jnp.isfinite(xn)) & jnp.all(jnp.isfinite(un)))
        x = jnp.where(ok, xn, x)
        u = jnp.where(ok, un, u)
        logp = jnp.where(ok, logpn, logp)
        g = jnp.where(ok, gn, g)
        u = _refresh(u, jax.random.fold_in(key, g_idx), eps, length, dims)
        return (x, u, logp, g, jnp.logical_or(div, ~ok)), de

    def kept_draw(carry, b):
        x, u, logp, g, _ = carry
        gs = start_step + b * config.thin + jnp.arange(config.thin)

        def body(i, c_and_de):
            c, _ = c_and_de
            c2, de = one_step(c, gs[i])
            return c2, de

        (x, u, logp, g, div), de = jax.lax.fori_loop(
            0, config.thin, body,
            ((x, u, logp, g, jnp.asarray(False)), jnp.zeros((), jnp.float32)),
        )
        stats = MCLMCStats(energy_change=de, divergent=div)
        return (x, u, logp, g, jnp.asarray(False)), (x, stats)

    carry0 = (theta0, u0, logp0, g0, jnp.asarray(False))
    (xF, uF, _, _, _), (samples, stats) = jax.lax.scan(
        kept_draw, carry0, jnp.arange(n_kept)
    )
    return MCLMCResult(
        samples=samples, stats=stats, step_size=eps,
        trajectory_length=length, final_theta=xF, final_u=uF,
        final_step=jnp.asarray(start_step + config.num_samples, jnp.int32),
    )


def _seed_scales(config: MCLMCConfig, dims: int):
    eps0 = jnp.asarray(config.step_size, jnp.float32)
    if config.trajectory_length is not None:
        length0 = jnp.asarray(config.trajectory_length, jnp.float32)
    else:
        length0 = jnp.asarray(math.sqrt(float(dims)), jnp.float32)
    return eps0, length0


def _prep_flat(log_prob_fn, theta0, pass_grad):
    """Boundary ravel: pytree states run the flat kernel (the dynamics
    need whole-vector norms anyway), samples unravel on the way out."""
    from jax.flatten_util import ravel_pytree

    from ..ops.potential import make_flat_potential, resolve_potential

    if hasattr(theta0, "ndim"):
        theta0 = jnp.asarray(theta0)
        if theta0.ndim != 1:
            raise ValueError(
                f"theta0 must be 1-d (got shape {theta0.shape}); "
                "pass pytree states as a pytree, not a matrix"
            )
        if theta0.shape[0] < 2:
            raise ValueError(
                "MCLMC needs dimension >= 2 (the isokinetic velocity lives "
                "on S^{d-1}; for 1-d targets use run_hmc/run_nuts)"
            )
        fn, data = resolve_potential(log_prob_fn, pass_grad)
        return theta0, fn, data, None
    if pass_grad is not None:
        raise ValueError(
            "pass_grad expects a flat (D,) state (a user gradient for a "
            "pytree state would need a matching ravel); flatten the state "
            "or drop pass_grad"
        )
    theta0 = _tmap(jnp.asarray, theta0)
    flat0, unravel = ravel_pytree(theta0)
    if flat0.shape[0] < 2:
        raise ValueError("MCLMC needs dimension >= 2")
    lp_flat = make_flat_potential(log_prob_fn, theta0)
    fn, data = resolve_potential(lp_flat, None)
    return flat0, fn, data, unravel


def run_mclmc(
    key: jax.Array,
    log_prob_fn: Callable,
    theta0,
    config: MCLMCConfig,
    data=None,
    init_u=None,
    start_step: int = 0,
    pass_grad=None,
) -> MCLMCResult:
    """Microcanonical Langevin Monte Carlo — see the module docstring.

    ``theta0`` may be flat (D,) or a parameter pytree (samples keep leaf
    shapes with a leading kept-draws axis).  Potentials follow the
    ``_raw_fn``/``_data`` jit-operand protocol (models/bnn.py factories
    plug in directly), or pass ``data=`` explicitly for
    ``log_prob_fn(theta, data)``.

    MCLMC is UNADJUSTED: there is no Metropolis test, and a small
    O(eps^2) stationary bias remains, controlled by
    ``config.desired_energy_var`` — trade bias for the 100%-of-gradients
    utilisation that makes it fast in high dimension.  For exactness
    guarantees use run_hmc/run_nuts/run_chees.

    Chunked runs resume bit-exactly at fixed tuning: run the first chunk
    with ``tune_steps > 0``, then feed ``final_theta`` / ``final_u`` /
    ``final_step`` back with ``tune_steps=0`` and
    ``step_size=float(result.step_size)``,
    ``trajectory_length=float(result.trajectory_length)``.
    """
    theta0f, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0, pass_grad)
    if data is None:
        data = data_r
    eps0, length0 = _seed_scales(config, theta0f.shape[0])
    r = _run_mclmc_jit(key, theta0f, eps0, length0, fn, config, data=data,
                       init_u=init_u, start_step=start_step)
    if unravel is not None:
        r = r._replace(samples=jax.vmap(unravel)(r.samples),
                       final_theta=unravel(r.final_theta))
    return r


def run_mclmc_chains(
    key: jax.Array,
    log_prob_fn: Callable,
    theta0,
    config: MCLMCConfig,
    num_chains: int,
    data=None,
    theta0_is_stacked=None,
    resume_from: MCLMCResult | None = None,
) -> MCLMCResult:
    """Vectorised independent MCLMC chains (vmap over keys/initial states;
    each chain tunes its own (eps, L); samples gain a leading
    (num_chains,) axis).

    ``resume_from``: a previous ``run_mclmc_chains`` result — continues
    every chain from its ``final_theta``/``final_u``/``final_step`` at
    its OWN tuned per-chain (eps, L), which a scalar config cannot carry.
    Requires ``config.tune_steps == 0`` (the tuning already happened) and
    the SAME ``key`` as the original call (per-chain streams fold the
    global step index into the chain key, so the glued trace is
    bit-identical to one straight run); ``theta0`` is ignored.
    """
    from ..utils.pytree import is_param_tree, stack_param_tree

    if resume_from is not None:
        if config.tune_steps != 0:
            raise ValueError(
                "resume_from continues at the ALREADY-tuned per-chain "
                "(eps, L); set tune_steps=0 (re-tuning would fork the "
                "chains from their carried state)"
            )
        prev_theta = resume_from.final_theta
        if is_param_tree(prev_theta):
            from jax.flatten_util import ravel_pytree

            template = _tmap(lambda l: l[0], prev_theta)
            _, fn, data_r, unravel = _prep_flat(log_prob_fn, template, None)
            thetas = jax.vmap(lambda t: ravel_pytree(t)[0])(prev_theta)
        else:
            thetas = jnp.asarray(prev_theta)
            _, fn, data_r, unravel = _prep_flat(log_prob_fn, thetas[0], None)
        if data is None:
            data = data_r
        keys = jax.random.split(key, num_chains)
        r = jax.vmap(
            lambda k, t, u, e, l, s: _run_mclmc_jit(
                k, t, e, l, fn, config, data=data, init_u=u, start_step=s
            )
        )(keys, thetas, resume_from.final_u,
          jnp.asarray(resume_from.step_size, jnp.float32),
          jnp.asarray(resume_from.trajectory_length, jnp.float32),
          jnp.asarray(resume_from.final_step))
        if unravel is not None:
            r = r._replace(
                samples=jax.vmap(jax.vmap(unravel))(r.samples),
                final_theta=jax.vmap(unravel)(r.final_theta),
            )
        return r

    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, template, None)
        from jax.flatten_util import ravel_pytree
        theta0 = jax.vmap(lambda t: ravel_pytree(t)[0])(theta0)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        template = theta0[0]
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, template, None)
    if data is None:
        data = data_r
    keys = jax.random.split(key, num_chains)
    eps0, length0 = _seed_scales(config, theta0.shape[1])
    r = jax.vmap(
        lambda k, t: _run_mclmc_jit(k, t, eps0, length0, fn, config,
                                    data=data)
    )(keys, theta0)
    if unravel is not None:
        r = r._replace(
            samples=jax.vmap(jax.vmap(unravel))(r.samples),
            final_theta=jax.vmap(unravel)(r.final_theta),
        )
    return r
