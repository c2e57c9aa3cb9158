"""Affine-invariant ensemble sampler (the parallel stretch move).

No counterpart in the reference — this is the Goodman & Weare (2010)
ensemble sampler as popularised by emcee (Foreman-Mackey et al. 2013,
arXiv:1202.3665), the standard GRADIENT-FREE MCMC: the only thing it
asks of the target is log-density evaluations, so it samples potentials
autodiff cannot touch (black-box simulators, non-differentiable priors,
quantised likelihoods) — a capability the gradient-based samplers in
this package (HMC/NUTS/ChEES/MCLMC/...) cannot offer.  Affine
invariance means performance is unchanged under any linear
reparameterisation: badly scaled or strongly correlated posteriors need
no mass-matrix tuning — the walker cloud IS the preconditioner.

Parallel ("red-black") stretch move, emcee's default: the K walkers
split into two fixed halves; half A proposes through partners drawn
from half B (then B through the UPDATED A), which keeps detailed
balance while evaluating K/2 proposals as one batch.  For walker x_k
with partner x_j and z ~ g(z) prop. 1/sqrt(z) on [1/a, a]:

    y = x_j + z (x_k - x_j),      accept with  min(1, z^(d-1) p(y)/p(x_k)).

TPU-first shape: one jitted ``lax.scan`` over iterations; each
iteration is two half-ensemble batches — a vmapped log_prob over K/2
proposals plus O(K d) vector algebra; no branches (rejections are
``where`` masks, non-finite proposals auto-reject and flag
``stats.divergent``).  Per-iteration RNG folds the GLOBAL iteration
index into the base key, so chunked runs resume bit-exactly (repo
convention).  Walker recommendation: K >= 2 d (and always even).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_tmap = jax.tree_util.tree_map


@dataclasses.dataclass(frozen=True)
class StretchConfig:
    """Static configuration for :func:`run_stretch`.

    ``num_samples`` counts TOTAL iterations (each iteration moves every
    walker once); with ``thin > 1`` every thin-th ensemble state is
    kept.  ``a`` is the stretch scale (emcee's default 2.0; larger =
    bolder moves, lower acceptance).
    """

    num_samples: int
    a: float = 2.0
    thin: int = 1

    def __post_init__(self):
        if self.num_samples < 1:
            raise ValueError(f"num_samples={self.num_samples}; must be >= 1")
        if not self.a > 1.0:
            raise ValueError(
                f"a={self.a}; the stretch scale must be > 1 (a=1 never moves)"
            )
        if self.thin < 1:
            raise ValueError("thin must be >= 1")
        if self.num_samples % self.thin:
            raise ValueError(
                f"num_samples={self.num_samples} must be divisible by "
                f"thin={self.thin}"
            )


class StretchStats(NamedTuple):
    """Per-kept-iteration diagnostics."""

    accept_frac: jnp.ndarray  # fraction of walkers that moved
    divergent: jnp.ndarray  # any non-finite proposal logp in the window


class StretchResult(NamedTuple):
    samples: jnp.ndarray  # (N_kept, K, D) or tree of (N_kept, K, ...) leaves
    stats: StretchStats
    acc_rate: jnp.ndarray  # mean walker acceptance over the run
    final_walkers: object  # (K, D) or tree (resume)
    final_logp: jnp.ndarray  # (K,) cached log-densities (resume)
    final_step: jnp.ndarray  # global iteration counter after the run


def _sample_z(key, n, a, dtype):
    """z ~ g(z) prop. 1/sqrt(z) on [1/a, a]: z = ((a-1) u + 1)^2 / a."""
    u = jax.random.uniform(key, (n,), dtype)
    return ((a - 1.0) * u + 1.0) ** 2 / a


@partial(jax.jit, static_argnames=("log_prob_fn", "config", "num_walkers"))
def _run_stretch_jit(key, walkers0, log_prob_fn, config: StretchConfig,
                     num_walkers: int, data=None, init_logp=None,
                     start_step=0):
    lp1 = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    lp = jax.vmap(lp1)
    half = num_walkers // 2
    dims = walkers0.shape[-1]
    dtype = walkers0.dtype
    a = float(config.a)
    n_kept = config.num_samples // config.thin

    logp0 = init_logp if init_logp is not None else lp(walkers0)

    def half_move(x_move, lp_move, x_other, k):
        """Stretch-update one half against the (fixed) other half."""
        k_z, k_j, k_u = jax.random.split(k, 3)
        z = _sample_z(k_z, half, a, dtype)
        j = jax.random.randint(k_j, (half,), 0, half)
        partners = x_other[j]
        prop = partners + z[:, None] * (x_move - partners)
        lp_prop = lp(prop)
        finite = jnp.isfinite(lp_prop)
        log_ratio = (dims - 1.0) * jnp.log(z) + lp_prop - lp_move
        log_ratio = jnp.where(finite, log_ratio, -jnp.inf)
        accept = (jnp.log(jax.random.uniform(k_u, (half,), jnp.float32))
                  < log_ratio)
        x_new = jnp.where(accept[:, None], prop, x_move)
        lp_new = jnp.where(accept, lp_prop, lp_move)
        return x_new, lp_new, accept, ~jnp.all(finite)

    def one_iter(carry, g_idx):
        x, lpx = carry
        k = jax.random.fold_in(key, g_idx)
        k0, k1 = jax.random.split(k)
        x0, lp0_, x1, lp1_ = x[:half], lpx[:half], x[half:], lpx[half:]
        x0, lp0_, acc0, div0 = half_move(x0, lp0_, x1, k0)
        x1, lp1_, acc1, div1 = half_move(x1, lp1_, x0, k1)
        x = jnp.concatenate([x0, x1])
        lpx = jnp.concatenate([lp0_, lp1_])
        frac = (jnp.sum(acc0) + jnp.sum(acc1)) / num_walkers
        return (x, lpx), (frac.astype(jnp.float32),
                          jnp.logical_or(div0, div1))

    def kept_iter(carry, b):
        x, lpx, _ = carry
        gs = start_step + b * config.thin + jnp.arange(config.thin)

        def body(i, c):
            (x, lpx, div), _ = c
            (x, lpx), (frac, d) = one_iter((x, lpx), gs[i])
            return (x, lpx, jnp.logical_or(div, d)), frac

        (x, lpx, div), frac = jax.lax.fori_loop(
            0, config.thin, body,
            ((x, lpx, jnp.asarray(False)), jnp.zeros((), jnp.float32)),
        )
        stats = StretchStats(accept_frac=frac, divergent=div)
        return (x, lpx, jnp.asarray(False)), (x, stats)

    carry0 = (walkers0, logp0, jnp.asarray(False))
    (xF, lpF, _), (samples, stats) = jax.lax.scan(
        kept_iter, carry0, jnp.arange(n_kept)
    )
    return StretchResult(
        samples=samples, stats=stats,
        acc_rate=jnp.mean(stats.accept_frac),
        final_walkers=xF, final_logp=lpF,
        final_step=jnp.asarray(start_step + config.num_samples, jnp.int32),
    )


def _prep_walkers(key, log_prob_fn, theta0, num_walkers, init_jitter,
                  pass_grad=None):
    """Walker matrix + flat potential.  ``theta0`` may be (K, D) explicit
    walkers, a flat (D,) center (walkers = center + jitter ball), or a
    parameter pytree / (K, ...)-stacked tree (boundary ravel)."""
    from jax.flatten_util import ravel_pytree

    from ..ops.potential import make_flat_potential, resolve_potential

    if num_walkers < 4 or num_walkers % 2:
        raise ValueError(
            f"num_walkers={num_walkers}; the parallel stretch move needs an "
            "EVEN ensemble of >= 4 (recommended: >= 2 * dim)"
        )
    if hasattr(theta0, "ndim"):
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 2:
            if theta0.shape[0] != num_walkers:
                raise ValueError(
                    f"theta0 has {theta0.shape[0]} rows but "
                    f"num_walkers={num_walkers}"
                )
            walkers = theta0
        elif theta0.ndim == 1:
            noise = jax.random.normal(
                jax.random.fold_in(key, 2**32 - 1),
                (num_walkers,) + theta0.shape, theta0.dtype,
            )
            walkers = theta0[None, :] + init_jitter * noise
        else:
            raise ValueError(
                f"theta0 must be (D,) or (num_walkers, D); got {theta0.shape}"
            )
        fn, data = resolve_potential(log_prob_fn, pass_grad)
        return walkers, fn, data, None
    # pytree: single state or (K, ...)-stacked leaves
    theta0 = _tmap(jnp.asarray, theta0)
    from ..utils.pytree import stack_param_tree

    template, stacked = stack_param_tree(theta0, num_walkers, stacked=None)
    flat_template, unravel = ravel_pytree(template)
    flat = jax.vmap(lambda t: ravel_pytree(t)[0])(stacked)
    if bool(jnp.all(flat[0] == flat)):  # broadcast single state: jitter
        noise = jax.random.normal(
            jax.random.fold_in(key, 2**32 - 1), flat.shape, flat.dtype
        )
        flat = flat + init_jitter * noise
    lp_flat = make_flat_potential(log_prob_fn, template)
    fn, data = resolve_potential(lp_flat, None)
    return flat, fn, data, unravel


def run_stretch(
    key: jax.Array,
    log_prob_fn: Callable,
    theta0,
    config: StretchConfig,
    num_walkers: int = 64,
    data=None,
    init_jitter: float = 1e-2,
    init_logp=None,
    start_step: int = 0,
) -> StretchResult:
    """Affine-invariant ensemble sampling — see the module docstring.

    GRADIENT-FREE: ``log_prob_fn`` is only ever evaluated, never
    differentiated — any black-box (non-differentiable) log-density
    works.  ``theta0`` may be an explicit ``(num_walkers, D)`` walker
    matrix, a flat (D,) center (walkers start in an ``init_jitter``
    Gaussian ball around it — distinct walkers are REQUIRED or the
    stretch move degenerates), or a parameter pytree (single state or
    (K, ...)-stacked leaves; samples keep leaf shapes with leading
    ``(kept, K)`` axes).  Potentials follow the ``_raw_fn``/``_data``
    operand protocol, or pass ``data=`` for ``log_prob_fn(theta, data)``.

    Chunked runs resume bit-exactly: feed ``final_walkers`` /
    ``final_logp`` / ``final_step`` back with the same key and config.
    """
    walkers, fn, data_r, unravel = _prep_walkers(
        key, log_prob_fn, theta0, num_walkers, init_jitter
    )
    if data is None:
        data = data_r
    r = _run_stretch_jit(key, walkers, fn, config, num_walkers, data=data,
                         init_logp=init_logp, start_step=start_step)
    if unravel is not None:
        r = r._replace(
            samples=jax.vmap(jax.vmap(unravel))(r.samples),
            final_walkers=jax.vmap(unravel)(r.final_walkers),
        )
    return r
