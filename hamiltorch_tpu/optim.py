"""MAP estimation, Laplace approximation, and chain warm-starting.

The reference has no optimizer in the package — its notebooks find MAP
inits with hand-rolled torch training loops before calling ``sample_model``
(e.g. notebooks/bayesian_hamiltorch_mnist.ipynb trains the net, then
samples around the fit).  This utility makes that workflow one call:
maximize any potential this framework's samplers accept (including the
``_raw_fn``/``_data`` jit-operand protocol of ``define_model_log_prob``)
with an optax optimizer inside one jitted ``lax.scan``.

TPU-first shape: no Python loop — ``num_steps`` optimizer updates compile
to a single scan; non-finite steps are branchless rejections (the carry
keeps the previous iterate and optimizer state); the best-so-far iterate
rides the carry so a late divergence cannot lose the optimum.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

_tmap = jax.tree_util.tree_map


class MAPResult(NamedTuple):
    theta: object  # best-log-prob iterate seen (use this as the MAP)
    log_prob: jnp.ndarray  # log_prob at ``theta``
    final_theta: object  # last iterate (optimizer's end state)
    log_prob_trace: jnp.ndarray  # (num_steps,) pre-update log_prob values
    num_rejected: jnp.ndarray  # non-finite update steps (kept previous state)


def _all_finite(tree):
    ok = jnp.asarray(True)
    for l in jax.tree_util.tree_leaves(tree):
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(l)))
    return ok


@partial(jax.jit, static_argnames=("fn", "opt", "num_steps"))
def _map_jit(theta0, fn, opt, num_steps, data=None):
    if data is None:
        lp = fn
    else:
        lp = lambda t: fn(t, data)
    vg = jax.value_and_grad(lp)
    opt_state = opt.init(theta0)
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    def step(carry, _):
        theta, ostate, best_t, best_v, rejected = carry
        v, g = vg(theta)
        v32 = v.astype(jnp.float32)
        better = jnp.logical_and(v32 > best_v, jnp.isfinite(v32))
        best_t = _tmap(lambda b, t: jnp.where(better, t, b), best_t, theta)
        best_v = jnp.where(better, v32, best_v)
        updates, ostate_new = opt.update(_tmap(jnp.negative, g), ostate, theta)
        theta_new = _tmap(lambda t, u: t + u, theta, updates)
        ok = jnp.logical_and(_all_finite(theta_new), _all_finite(ostate_new))
        theta_sel = _tmap(lambda n, o: jnp.where(ok, n, o), theta_new, theta)
        ostate_sel = _tmap(lambda n, o: jnp.where(ok, n, o), ostate_new, ostate)
        return (theta_sel, ostate_sel, best_t, best_v,
                rejected + jnp.where(ok, 0, 1)), v32

    carry0 = (theta0, opt_state, theta0, neg_inf, jnp.zeros((), jnp.int32))
    (thetaF, _, best_t, best_v, rejected), trace = jax.lax.scan(
        step, carry0, None, length=num_steps
    )
    # the final iterate may beat every pre-update value in the trace
    vF = lp(thetaF).astype(jnp.float32)
    betterF = jnp.logical_and(vF > best_v, jnp.isfinite(vF))
    best_t = _tmap(lambda b, t: jnp.where(betterF, t, b), best_t, thetaF)
    best_v = jnp.where(betterF, vF, best_v)
    return MAPResult(
        theta=best_t, log_prob=best_v, final_theta=thetaF,
        log_prob_trace=trace, num_rejected=rejected,
    )


def map_estimate(
    log_prob_fn: Callable,
    theta0,
    num_steps: int = 1000,
    learning_rate: float = 1e-2,
    optimizer=None,
    data=None,
) -> MAPResult:
    """Maximize ``log_prob_fn`` from ``theta0`` — a MAP fit / warm start.

    Accepts exactly what the samplers accept: a plain ``fn(theta)``, a
    potential carrying the ``_raw_fn``/``_data`` operand protocol (the
    ``define_model_log_prob`` family — its dataset rides as a jit operand),
    or an explicit ``data=`` with ``fn(theta, data)``.  ``theta0`` may be
    flat or a parameter pytree.

    ``optimizer`` is any optax ``GradientTransformation`` (default
    ``optax.adam(learning_rate)``).  Use ``result.theta`` (best iterate,
    non-finite steps rejected branchlessly) to seed ``sample(...,
    params_init=...)`` or any ``run_*`` entry.

    reference: the notebooks' torch-optimizer warm starts, e.g.
    hamiltorch's MNIST notebook trains to a mode before sampling.
    """
    if num_steps < 1:
        raise ValueError(f"num_steps={num_steps}; must be >= 1")
    import optax

    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    from .ops.potential import resolve_potential

    if data is None:
        fn, data = resolve_potential(log_prob_fn)
    else:
        fn = log_prob_fn
    theta0 = _tmap(jnp.asarray, theta0)
    return _map_jit(theta0, fn, optimizer, num_steps, data)


class LaplaceResult(NamedTuple):
    """Gaussian approximation N(mean, cov) of the posterior at a mode."""

    mean: jnp.ndarray  # flat (D,) mode (ravel of a pytree theta_map)
    cov: jnp.ndarray  # (D, D) posterior covariance (PD-projected)
    prec: jnp.ndarray  # (D, D) precision = clipped negative Hessian
    log_evidence: jnp.ndarray  # Laplace log Z: lp(mode) + D/2 log 2pi - logdet(prec)/2
    unravel: object  # flat -> original theta structure (None for flat modes)


def laplace_approx(
    log_prob_fn: Callable,
    theta_map,
    data=None,
    min_eig_ratio: float = 1e-8,
) -> LaplaceResult:
    """Laplace (Gaussian) approximation of the posterior around a mode.

    Complements :func:`map_estimate`: fit the mode, then approximate the
    local curvature.  Three production uses —

    * ``log_evidence``: the Laplace model-evidence estimate
      ``lp(mode) + D/2 log 2pi - 0.5 logdet(-H)`` — the cheap counterpart
      of the SMC evidence (``run_smc``) for model comparison;
    * ``jnp.diag(cov)`` (or the dense ``cov``) as ``inv_mass`` — a
      curvature-matched (pre)conditioner for any sampler here;
    * :func:`laplace_sample` for instant approximate posterior draws.

    The negative Hessian is symmetrized and its spectrum clipped to
    ``min_eig_ratio * max_eig`` (a mode on a flat/indefinite direction
    would otherwise have no Gaussian), mirroring the softabs degeneracy
    handling in ops/metrics.py.  ``theta_map`` may be flat or a pytree
    (``unravel`` maps draws back).  Accepts the same potential forms as
    :func:`map_estimate`.  O(D^2) memory / O(D^3) eigh — for full-network
    BNN posteriors prefer the samplers; this is for the low-dimensional /
    last-layer / model-comparison regimes.

    reference: no counterpart in hamiltorch; included because MAP +
    curvature warm starts are the notebooks' manual workflow endpoint.
    """
    from .ops.potential import resolve_potential

    if data is None:
        fn, data = resolve_potential(log_prob_fn)
    else:
        fn = log_prob_fn
    lp = fn if data is None else (lambda t: fn(t, data))

    from .utils.pytree import ravel_pytree_fn

    theta_map = _tmap(jnp.asarray, theta_map)
    if hasattr(theta_map, "ndim"):
        flat0, unravel = theta_map, None
        lp_flat = lp
    else:
        flat0, unravel = ravel_pytree_fn(theta_map)
        lp_flat = lambda v: lp(unravel(v))
    d = int(flat0.shape[0])

    # TPU f32 matmuls default to bf16 passes (~1% error) — measured to
    # corrupt the Hessian of even a 2x2 quadratic (eigenvalues came back
    # bf16-quantized on v5e).  Curvature is a second derivative: force
    # float32 matmuls for the Hessian, the potential value, and the
    # eigenvector reconstructions.
    with jax.default_matmul_precision("float32"):
        h = jax.hessian(lp_flat)(flat0)
        neg_h = -0.5 * (h + h.T)  # symmetrize; precision candidate
        eigs, vecs = jnp.linalg.eigh(neg_h)
        floor = jnp.maximum(jnp.max(eigs), 0.0) * min_eig_ratio + 1e-30
        eigs_c = jnp.maximum(eigs, floor)
        mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
        prec = mm(vecs * eigs_c, vecs.T)
        cov = mm(vecs / eigs_c, vecs.T)
        log_det_prec = jnp.sum(jnp.log(eigs_c))
        log_z = (
            lp_flat(flat0)
            + 0.5 * d * jnp.log(2.0 * jnp.pi)
            - 0.5 * log_det_prec
        )
    return LaplaceResult(mean=flat0, cov=cov, prec=prec,
                         log_evidence=log_z, unravel=unravel)


def laplace_sample(key, result: LaplaceResult, num_samples: int):
    """Draws from the Laplace Gaussian; pytree modes come back as stacked
    pytrees (leading ``num_samples`` axis), flat modes as (N, D)."""
    chol = jnp.linalg.cholesky(result.cov)
    z = jax.random.normal(key, (num_samples, result.mean.shape[0]),
                          result.mean.dtype)
    flat = result.mean[None, :] + jnp.matmul(
        z, chol.T, precision=jax.lax.Precision.HIGHEST
    )
    if result.unravel is None:
        return flat
    return jax.vmap(result.unravel)(flat)


class ADVIResult(NamedTuple):
    """Gaussian variational fit.

    Mean-field: q = N(mean, diag(exp(2 log_std))), ``scale_tril`` None.
    Full-rank: q = N(mean, L L^T) with ``scale_tril = L`` (lower
    triangular; ``log_std`` then holds ``log(diag(L))`` so the diagonal
    reading stays meaningful either way).
    """

    mean: jnp.ndarray  # flat (D,) variational mean
    log_std: jnp.ndarray  # flat (D,) variational log-stddev / log diag(L)
    elbo_trace: jnp.ndarray  # (num_steps,) one-sample ELBO estimates
    elbo: jnp.ndarray  # mean of the last 10% of the trace
    unravel: object  # flat -> original theta structure (None for flat)
    scale_tril: object = None  # (D, D) lower-triangular L (full-rank only)


def advi_cov(result: ADVIResult) -> jnp.ndarray:
    """The fitted covariance — ``diag(exp(2 log_std))`` (mean-field) or
    ``L L^T`` (full-rank).  Feed the diagonal (or the dense matrix) to a
    sampler's ``inv_mass`` for a VI-preconditioned chain."""
    if result.scale_tril is None:
        return jnp.diag(jnp.exp(2.0 * result.log_std))
    l_mat = result.scale_tril
    return jnp.matmul(l_mat, l_mat.T, precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("fn", "opt", "num_steps", "num_mc"))
def _advi_jit(key, mean0, log_std0, fn, opt, num_steps, num_mc, data=None):
    if data is None:
        lp = fn
    else:
        lp = lambda t: fn(t, data)
    d = mean0.shape[0]

    def neg_elbo(params, k):
        mean, log_std = params
        z = jax.random.normal(k, (num_mc, d), mean.dtype)
        theta = mean[None, :] + jnp.exp(log_std)[None, :] * z
        e_lp = jnp.mean(jax.vmap(lp)(theta))
        entropy = jnp.sum(log_std) + 0.5 * d * (1.0 + jnp.log(2 * jnp.pi))
        return -(e_lp + entropy)

    vg = jax.value_and_grad(neg_elbo)
    params0 = (mean0, log_std0)
    opt_state = opt.init(params0)
    # tail-averaged iterates: the SGD-converged fit wanders around the
    # optimum under MC-gradient noise; Polyak-style averaging of the last
    # 10% of steps is the standard variance killer
    tail = max(num_steps // 10, 1)
    cutoff = num_steps - tail

    def step(carry, i):
        params, ostate, acc = carry
        v, g = vg(params, jax.random.fold_in(key, i))
        updates, ostate_new = opt.update(g, ostate, params)
        new = _tmap(lambda p, u: p + u, params, updates)
        ok = jnp.logical_and(
            _all_finite(new), jnp.isfinite(v)
        )
        params = _tmap(lambda n, o: jnp.where(ok, n, o), new, params)
        ostate = _tmap(lambda n, o: jnp.where(ok, n, o), ostate_new, ostate)
        in_tail = (i >= cutoff).astype(mean0.dtype)
        acc = _tmap(lambda a, p: a + in_tail * p, acc, params)
        return (params, ostate, acc), -v

    acc0 = _tmap(jnp.zeros_like, params0)
    (_, _, acc), elbos = jax.lax.scan(
        step, (params0, opt_state, acc0), jnp.arange(num_steps)
    )
    params = _tmap(lambda a: a / tail, acc)
    return params[0], params[1], elbos, jnp.mean(elbos[-tail:])


@partial(jax.jit, static_argnames=("fn", "opt", "num_steps", "num_mc"))
def _advi_fullrank_jit(key, mean0, log_std0, fn, opt, num_steps, num_mc,
                       data=None):
    if data is None:
        lp = fn
    else:
        lp = lambda t: fn(t, data)
    d = mean0.shape[0]

    def build_l(log_diag, low):
        return jnp.tril(low, -1) + jnp.diag(jnp.exp(log_diag))

    def neg_elbo(params, k):
        mean, log_diag, low = params
        z = jax.random.normal(k, (num_mc, d), mean.dtype)
        theta = mean[None, :] + z @ build_l(log_diag, low).T
        e_lp = jnp.mean(jax.vmap(lp)(theta))
        entropy = jnp.sum(log_diag) + 0.5 * d * (1.0 + jnp.log(2 * jnp.pi))
        return -(e_lp + entropy)

    vg = jax.value_and_grad(neg_elbo)
    params0 = (mean0, log_std0, jnp.zeros((d, d), mean0.dtype))
    opt_state = opt.init(params0)
    tail = max(num_steps // 10, 1)
    cutoff = num_steps - tail

    def step(carry, i):
        params, ostate, acc = carry
        v, g = vg(params, jax.random.fold_in(key, i))
        updates, ostate_new = opt.update(g, ostate, params)
        new = _tmap(lambda p, u: p + u, params, updates)
        ok = jnp.logical_and(_all_finite(new), jnp.isfinite(v))
        params = _tmap(lambda n, o: jnp.where(ok, n, o), new, params)
        ostate = _tmap(lambda n, o: jnp.where(ok, n, o), ostate_new, ostate)
        in_tail = (i >= cutoff).astype(mean0.dtype)
        acc = _tmap(lambda a, p: a + in_tail * p, acc, params)
        return (params, ostate, acc), -v

    acc0 = _tmap(jnp.zeros_like, params0)
    (_, _, acc), elbos = jax.lax.scan(
        step, (params0, opt_state, acc0), jnp.arange(num_steps)
    )
    mean, log_diag, low = _tmap(lambda a: a / tail, acc)
    return mean, log_diag, build_l(log_diag, low), elbos, jnp.mean(elbos[-tail:])


def advi(
    log_prob_fn: Callable,
    theta0,
    num_steps: int = 2000,
    learning_rate: float = 1e-2,
    num_mc_samples: int = 4,
    init_log_std: float = -2.0,
    optimizer=None,
    data=None,
    key=None,
    method: str = "meanfield",
) -> ADVIResult:
    """ADVI (Kucukelbir et al. 2017): maximize the ELBO of a Gaussian q
    over the same potentials the samplers take.

    The third rung of the approximate ladder here — MAP point
    (:func:`map_estimate`), local curvature (:func:`laplace_approx`), and
    this: a GLOBAL fit by stochastic optimization, robust where the
    Hessian is indefinite or too big for eigh.  Production uses:
    ``exp(2 * log_std)`` (or :func:`advi_cov`) as the sampler
    ``inv_mass`` (the same estimate Stan's warmup converges to), ``mean``
    as a chain init, and :func:`advi_sample` for instant approximate
    draws.

    ``method="meanfield"`` fits a diagonal Gaussian;
    ``method="fullrank"`` fits N(mean, L L^T) with a lower-triangular
    scale — exact on correlated Gaussians where the mean-field fit
    underestimates every marginal variance, at O(D^2) parameters (use it
    in the same low-dimensional regimes as :func:`laplace_approx`; the
    tail-averaged L is returned as ``scale_tril`` and ``advi_cov`` gives
    the dense ``inv_mass``).

    Reparameterization gradients (``theta = mean + scale @ z``) with
    ``num_mc_samples`` draws per step, one jitted scan, non-finite steps
    rejected branchlessly.  ``theta0`` may be flat or a pytree.

    reference: no counterpart in hamiltorch (its approximate story ends
    at minibatch splitting); included as the standard VI baseline every
    production PPL ships.
    """
    if num_steps < 1:
        raise ValueError(f"num_steps={num_steps}; must be >= 1")
    if num_mc_samples < 1:
        raise ValueError(f"num_mc_samples={num_mc_samples}; must be >= 1")
    if method not in ("meanfield", "fullrank"):
        raise ValueError(
            f"method={method!r}; must be 'meanfield' or 'fullrank'"
        )
    import optax

    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    from .ops.potential import resolve_potential
    from .utils.pytree import ravel_pytree_fn

    if data is None:
        fn, data = resolve_potential(log_prob_fn)
    else:
        fn = log_prob_fn
    theta0 = _tmap(jnp.asarray, theta0)
    if hasattr(theta0, "ndim"):
        flat0, unravel = theta0, None
        lp_flat = fn
    else:
        flat0, unravel = ravel_pytree_fn(theta0)
        raw = fn
        if data is None:
            lp_flat = lambda v: raw(unravel(v))
        else:
            lp_flat = lambda v, d: raw(unravel(v), d)
    if key is None:
        key = jax.random.PRNGKey(0)
    log_std0 = jnp.full_like(flat0, init_log_std)
    if method == "fullrank":
        mean, log_std, l_mat, trace, elbo = _advi_fullrank_jit(
            key, flat0, log_std0, lp_flat, optimizer, num_steps,
            num_mc_samples, data
        )
        return ADVIResult(mean=mean, log_std=log_std, elbo_trace=trace,
                          elbo=elbo, unravel=unravel, scale_tril=l_mat)
    mean, log_std, trace, elbo = _advi_jit(
        key, flat0, log_std0, lp_flat, optimizer, num_steps,
        num_mc_samples, data
    )
    return ADVIResult(mean=mean, log_std=log_std, elbo_trace=trace,
                      elbo=elbo, unravel=unravel)


def advi_sample(key, result: ADVIResult, num_samples: int):
    """Draws from the fitted Gaussian (diagonal or full-rank); pytree
    fits come back as stacked pytrees."""
    z = jax.random.normal(key, (num_samples, result.mean.shape[0]),
                          result.mean.dtype)
    if result.scale_tril is None:
        flat = result.mean[None, :] + jnp.exp(result.log_std)[None, :] * z
    else:
        flat = result.mean[None, :] + jnp.matmul(
            z, result.scale_tril.T, precision=jax.lax.Precision.HIGHEST
        )
    if result.unravel is None:
        return flat
    return jax.vmap(result.unravel)(flat)
