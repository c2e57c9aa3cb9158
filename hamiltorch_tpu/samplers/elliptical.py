"""Elliptical slice sampling (Murray, Adams & MacKay 2010).

No counterpart in the reference — ESS is the standard sampler for
models with a GAUSSIAN PRIOR and an arbitrary likelihood (GP latents,
BNNs with Gaussian weight priors, latent Gaussian fields): each draw
moves along the ellipse through the current state and a fresh prior
sample,

    f' = (f - mu) cos(t) + (nu - mu) sin(t) + mu,    nu ~ N(mu, Sigma),

slice-sampling the angle t — which leaves N(mu, Sigma) L(f) invariant
with NO step size, NO tuning, and NO gradients: only likelihood
evaluations.  The angle bracket shrinks toward t = 0 on rejection, so
termination is guaranteed (t = 0 reproduces f itself, which always lies
above the slice level).  It complements the package's other
gradient-free sampler (:mod:`.stretch`): the stretch move assumes
nothing but needs many walkers; ESS exploits the Gaussian-prior
structure and runs a single chain with ~1-3 likelihood calls per draw.

Plugs directly into the BNN evidence split:
``models.define_model_prior_and_lik`` returns exactly the
(zero-mean-Gaussian prior, likelihood) pair this sampler consumes — set
``prior_scale`` from the per-leaf ``tau_list`` (std = 1/sqrt(tau)).

TPU-first shape: one jitted ``lax.scan`` over draws; the angle-shrink
loop is a bounded ``lax.while_loop`` (the only data-dependent loop in
the package's samplers — legitimate here because the iteration count is
the algorithm, not a convergence heuristic; capped at
``max_shrink``, cap hits flag ``stats.divergent``).  Per-draw RNG folds
the GLOBAL draw index (bit-exact chunked resume, repo convention).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_tmap = jax.tree_util.tree_map


@dataclasses.dataclass(frozen=True)
class EllipticalConfig:
    """Static configuration for :func:`run_elliptical`.

    ``max_shrink`` caps the angle-shrink loop per draw (the expected
    count is 1-3; the mathematical algorithm always terminates — the
    cap only guards numerically degenerate likelihoods, and hitting it
    flags ``stats.divergent``).
    """

    num_samples: int
    thin: int = 1
    max_shrink: int = 64

    def __post_init__(self):
        if self.num_samples < 1:
            raise ValueError(f"num_samples={self.num_samples}; must be >= 1")
        if self.thin < 1:
            raise ValueError("thin must be >= 1")
        if self.num_samples % self.thin:
            raise ValueError(
                f"num_samples={self.num_samples} must be divisible by "
                f"thin={self.thin}"
            )
        if self.max_shrink < 1:
            raise ValueError("max_shrink must be >= 1")


class EllipticalStats(NamedTuple):
    """Per-kept-draw diagnostics."""

    shrinks: jnp.ndarray  # angle-shrink iterations the draw needed
    loglik: jnp.ndarray  # log-likelihood of the kept state
    divergent: jnp.ndarray  # shrink cap hit in the window


class EllipticalResult(NamedTuple):
    samples: jnp.ndarray  # (N_kept, D) or tree of (N_kept, ...) leaves
    stats: EllipticalStats
    final_theta: object  # last state (resume)
    final_loglik: jnp.ndarray  # cached L(final_theta) (resume)
    final_step: jnp.ndarray  # global draw counter after the run


def _coerce_prior(prior_scale, prior_mean, dims, dtype):
    """Scale/mean as jit OPERANDS (a fresh closure per call would be a
    fresh static jit key -> recompile every resume chunk); the ndim of
    the scale picks the draw form at trace time."""
    scale = jnp.asarray(prior_scale, dtype)
    if scale.ndim > 2:
        raise ValueError(
            f"prior_scale must be a scalar, (D,) diag stds, or (D, D) "
            f"lower-Cholesky factor; got shape {scale.shape}"
        )
    mean = (jnp.zeros((dims,), dtype) if prior_mean is None
            else jnp.asarray(prior_mean, dtype))
    return scale, mean


@partial(jax.jit, static_argnames=("log_lik_fn", "config"))
def _run_elliptical_jit(key, theta0, log_lik_fn, config: EllipticalConfig,
                        prior_scale, prior_mean, data=None, init_loglik=None,
                        start_step=0):
    dims = theta0.shape[0]
    dtype = theta0.dtype

    def prior_draw(k):
        z = jax.random.normal(k, (dims,), dtype)
        if prior_scale.ndim == 2:
            return prior_mean + prior_scale @ z
        return prior_mean + prior_scale * z

    ll_fn_raw = (log_lik_fn if data is None
                 else (lambda t: log_lik_fn(t, data)))

    def ll_fn(t):  # -inf outside the support: proposals there auto-shrink
        v = ll_fn_raw(t)
        return jnp.where(jnp.isfinite(v), v, -jnp.inf)

    n_kept = config.num_samples // config.thin
    two_pi = 2.0 * jnp.pi
    ll0 = init_loglik if init_loglik is not None else ll_fn(theta0)

    def one_draw(carry, g_idx):
        f, llf = carry
        k = jax.random.fold_in(key, g_idx)
        k_nu, k_u, k_t = jax.random.split(k, 3)
        nu = prior_draw(k_nu)
        log_y = llf + jnp.log(jax.random.uniform(k_u, (), jnp.float32))
        t0 = jax.random.uniform(k_t, (), jnp.float32, 0.0, two_pi)

        f_c = f - prior_mean
        nu_c = nu - prior_mean

        def propose(t):
            td = t.astype(f.dtype)
            return f_c * jnp.cos(td) + nu_c * jnp.sin(td) + prior_mean

        def cond(c):
            t, lo, hi, fp, llp, n = c
            return (llp <= log_y) & (n < config.max_shrink)

        def body(c):
            t, lo, hi, fp, llp, n = c
            # shrink the bracket toward 0 past the rejected angle
            lo = jnp.where(t < 0.0, t, lo)
            hi = jnp.where(t < 0.0, hi, t)
            t = jax.random.uniform(
                jax.random.fold_in(k_t, n + 1), (), jnp.float32, lo, hi
            )
            fp = propose(t)
            return (t, lo, hi, fp, ll_fn(fp).astype(jnp.float32), n + 1)

        fp0 = propose(t0)
        t, lo, hi, fp, llp, n = jax.lax.while_loop(
            cond, body,
            (t0, t0 - two_pi, t0, fp0, ll_fn(fp0).astype(jnp.float32),
             jnp.zeros((), jnp.int32)),
        )
        ok = llp > log_y  # False only at the shrink cap: hold the state
        f = jnp.where(ok, fp, f)
        llf = jnp.where(ok, llp, llf)
        return (f, llf), (n, ~ok)

    def kept_draw(carry, b):
        f, llf, _ = carry
        gs = start_step + b * config.thin + jnp.arange(config.thin)

        def body(i, c):
            (f, llf, div), _ = c
            (f, llf), (n, d) = one_draw((f, llf), gs[i])
            return (f, llf, jnp.logical_or(div, d)), n

        (f, llf, div), n = jax.lax.fori_loop(
            0, config.thin, body,
            ((f, llf, jnp.asarray(False)), jnp.zeros((), jnp.int32)),
        )
        stats = EllipticalStats(shrinks=n, loglik=llf.astype(jnp.float32),
                                divergent=div)
        return (f, llf, jnp.asarray(False)), (f, stats)

    carry0 = (theta0, ll0.astype(jnp.float32), jnp.asarray(False))
    (fF, llF, _), (samples, stats) = jax.lax.scan(
        kept_draw, carry0, jnp.arange(n_kept)
    )
    return EllipticalResult(
        samples=samples, stats=stats, final_theta=fF, final_loglik=llF,
        final_step=jnp.asarray(start_step + config.num_samples, jnp.int32),
    )


def _prep_elliptical(log_lik_fn, theta0, prior_scale, prior_mean):
    """Boundary ravel for pytree states; per-leaf scale/mean trees ravel
    alongside the state."""
    from jax.flatten_util import ravel_pytree

    from ..ops.potential import make_flat_potential, resolve_potential

    if hasattr(theta0, "ndim"):
        theta0 = jnp.asarray(theta0)
        if theta0.ndim != 1:
            raise ValueError(
                f"theta0 must be 1-d (got shape {theta0.shape}); pass "
                "pytree states as a pytree, not a matrix"
            )
        fn, data = resolve_potential(log_lik_fn, None)
        return theta0, fn, data, None, prior_scale, prior_mean
    theta0 = _tmap(jnp.asarray, theta0)
    flat0, unravel = ravel_pytree(theta0)

    def _ravel_like(spec):
        # a pytree of per-leaf values (scalar or leaf-shaped) ravels to
        # (D,) in the state's leaf order; a plain scalar passes through
        if spec is None:
            return None
        if hasattr(spec, "ndim") or isinstance(spec, (int, float)):
            arr = jnp.asarray(spec)
            if arr.ndim == 0:
                return arr
        tree = _tmap(
            lambda l, s: jnp.broadcast_to(jnp.asarray(s, l.dtype), l.shape),
            theta0, spec,
        )
        return ravel_pytree(tree)[0]

    prior_scale = _ravel_like(prior_scale)
    prior_mean = _ravel_like(prior_mean)
    lp_flat = make_flat_potential(log_lik_fn, theta0)
    fn, data = resolve_potential(lp_flat, None)
    return flat0, fn, data, unravel, prior_scale, prior_mean


def run_elliptical(
    key: jax.Array,
    log_lik_fn: Callable,
    theta0,
    config: EllipticalConfig,
    prior_scale=1.0,
    prior_mean=None,
    data=None,
    init_loglik=None,
    start_step: int = 0,
) -> EllipticalResult:
    """Elliptical slice sampling — see the module docstring.

    ``log_lik_fn`` is the LIKELIHOOD alone (the Gaussian prior enters
    through ``prior_scale``/``prior_mean``, exactly the split
    ``models.define_model_prior_and_lik`` returns); it is only ever
    EVALUATED, never differentiated.  ``prior_scale``: scalar std, (D,)
    per-dimension stds, a (D, D) lower-Cholesky factor of the prior
    covariance — or, for pytree states, a pytree of per-leaf stds
    (e.g. ``1/sqrt(tau)`` per layer).  ``theta0`` may be flat (D,) or a
    parameter pytree.  Potentials follow the ``_raw_fn``/``_data``
    operand protocol, or pass ``data=``.

    Chunked runs resume bit-exactly: feed ``final_theta`` /
    ``final_loglik`` / ``final_step`` back with the same key and config.
    """
    theta0f, fn, data_r, unravel, scale_f, mean_f = _prep_elliptical(
        log_lik_fn, theta0, prior_scale, prior_mean
    )
    if data is None:
        data = data_r
    scale_a, mean_a = _coerce_prior(scale_f, mean_f, theta0f.shape[0],
                                    theta0f.dtype)
    r = _run_elliptical_jit(key, theta0f, fn, config, scale_a, mean_a,
                            data=data, init_loglik=init_loglik,
                            start_step=start_step)
    if unravel is not None:
        r = r._replace(samples=jax.vmap(unravel)(r.samples),
                       final_theta=unravel(r.final_theta))
    return r


def run_elliptical_chains(
    key: jax.Array,
    log_lik_fn: Callable,
    theta0,
    config: EllipticalConfig,
    num_chains: int,
    prior_scale=1.0,
    prior_mean=None,
    data=None,
    theta0_is_stacked=None,
) -> EllipticalResult:
    """Vectorised independent elliptical-slice chains (vmap over
    keys/initial states; samples gain a leading (num_chains,) axis).
    Under vmap the shrink loop runs each batch step until every lane's
    draw terminates (lane walls equalise to the slowest — still 1-3
    likelihood calls in expectation)."""
    from jax.flatten_util import ravel_pytree

    from ..utils.pytree import is_param_tree, stack_param_tree

    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        _, fn, data_r, unravel, scale_f, mean_f = _prep_elliptical(
            log_lik_fn, template, prior_scale, prior_mean
        )
        theta0 = jax.vmap(lambda t: ravel_pytree(t)[0])(theta0)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        _, fn, data_r, unravel, scale_f, mean_f = _prep_elliptical(
            log_lik_fn, theta0[0], prior_scale, prior_mean
        )
    if data is None:
        data = data_r
    scale_a, mean_a = _coerce_prior(scale_f, mean_f, theta0.shape[1],
                                    theta0.dtype)
    keys = jax.random.split(key, num_chains)
    r = jax.vmap(
        lambda k, t: _run_elliptical_jit(k, t, fn, config, scale_a, mean_a,
                                         data=data)
    )(keys, theta0)
    if unravel is not None:
        r = r._replace(
            samples=jax.vmap(jax.vmap(unravel))(r.samples),
            final_theta=jax.vmap(unravel)(r.final_theta),
        )
    return r
