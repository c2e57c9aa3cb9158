"""Riemannian metric pipeline and non-separable Hamiltonian.

Behavioural spec: the reference's ``fisher`` / ``cholesky_inverse`` /
``rm_hamiltonian`` (reference: hamiltorch/samplers.py:69-149, 677-736):

* HESSIAN metric:        G = -H[log p]           (samplers.py:108-109)
* JACOBIAN_DIAG metric:  G = diag(grad^2)        (samplers.py:100-106)
* SOFTABS:               eigh, lambda' = lambda*coth(alpha*lambda),
                         reconstruct              (samplers.py:118-122)
* jitter:                G += diag(U(0,1)*jitter) (samplers.py:113-115)
* H = -log p + D/2 log 2pi + 1/2 log|G| + 1/2 p^T G^-1 p   (samplers.py:731)

TPU-first design decisions:

* one Cholesky factorisation per Hamiltonian evaluation serves both the
  quadratic form and the log-determinant (2*sum(log diag(L))); the reference
  factorises for the solve and separately calls slogdet (samplers.py:728-729).
  A non-SPD metric yields NaN through the factorisation, which the driver's
  accept mask treats as a divergence — replacing the LogProbError exception;
* the stochastic diagonal jitter is a uniform vector drawn ONCE per
  transition and held fixed along the trajectory, giving a well-defined
  Hamiltonian for the accept ratio.  (The reference redraws jitter inside
  every ``fisher`` call and again on NaN gradients — samplers.py:115,
  322-333 — so its H_old and H_new use different metrics; deviation
  documented in SURVEY.md §7 "hard parts".)
* softabs is guarded at lambda -> 0 (limit 1/alpha); the reference's
  ``coth(alpha*lambda)*lambda`` is 0*inf = NaN there.

``dH/dp = G^{-1} p`` is computed analytically (one triangular solve pair);
``dH/dtheta`` is JAX autodiff through the whole pipeline — including
third-order derivatives of log p when the metric is the Hessian, matching
the reference's ``create_graph=True`` use of autograd (samplers.py:108).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..enums import Metric


@dataclasses.dataclass(frozen=True)
class RMOptions:
    """Static RMHMC configuration (hashable, participates in jit keys)."""

    metric: Metric = Metric.HESSIAN
    jitter: Optional[float] = None
    softabs_const: float = 1e6
    explicit_binding_const: float = 100.0
    fixed_point_threshold: float = 1e-5
    fixed_point_max_iterations: int = 1000


def softabs_eigenvalues(eigs: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """lambda * coth(alpha * lambda), guarded at 0 (limit 1/alpha)."""
    x = alpha * eigs
    small = jnp.abs(x) < 1e-8
    safe = jnp.where(small, 1.0, x)
    coth = 1.0 / jnp.tanh(safe)
    return jnp.where(small, 1.0 / alpha, eigs * coth)


def _softabs_derivative(eigs: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """d/dlambda [lambda*coth(alpha*lambda)] = coth(x) - x/sinh^2(x), x=alpha*lambda.

    Guarded: -> 2x/(3alpha)*alpha = 2x/3 ... i.e. ~ (2/3)*alpha*lambda near 0,
    -> sign(lambda) for |x| large (sinh overflow)."""
    x = alpha * eigs
    small = jnp.abs(x) < 1e-4
    big = jnp.abs(x) > 20.0
    xs = jnp.where(small | big, 1.0, x)
    core = 1.0 / jnp.tanh(xs) - xs / jnp.sinh(xs) ** 2
    return jnp.where(small, 2.0 * x / 3.0, jnp.where(big, jnp.sign(x), core))


from functools import partial as _partial


@_partial(jax.custom_jvp, nondiff_argnums=(1,))
def softabs_transform(a: jnp.ndarray, alpha: float):
    """Spectral softabs: A -> (V f(L) V^T, f(L)) with f = softabs.

    Differentiating through ``eigh`` directly is NaN when eigenvalues
    repeat (the 1/(li-lj) terms of the eigenvector JVP) — exactly the
    situation on targets like Neal's funnel whose Hessian x-block is a
    scaled identity.  A spectral *function* is nonetheless smooth there;
    this custom JVP implements the Daleckii-Krein formula
    dG = V (F o (V^T dA V)) V^T with F_ij the divided difference
    (f(li)-f(lj))/(li-lj), -> f'(l) on the diagonal/degenerate pairs.
    The reference inherits torch's NaN behaviour and papers over it with
    stochastic jitter retries (reference: hamiltorch/samplers.py:322-333).
    """
    eigs, vecs = jnp.linalg.eigh(a)
    lam = softabs_eigenvalues(eigs, alpha)
    g = (vecs * lam[None, :]) @ vecs.T
    return g, lam


@softabs_transform.defjvp
def _softabs_transform_jvp(alpha, primals, tangents):
    (a,) = primals
    (da,) = tangents
    eigs, vecs = jnp.linalg.eigh(a)
    lam = softabs_eigenvalues(eigs, alpha)
    g = (vecs * lam[None, :]) @ vecs.T

    m = vecs.T @ da @ vecs  # tangent in the eigenbasis
    li, lj = eigs[:, None], eigs[None, :]
    fi, fj = lam[:, None], lam[None, :]
    denom = li - lj
    close = jnp.abs(denom) < 1e-8 * (1.0 + jnp.abs(li) + jnp.abs(lj))
    fprime = _softabs_derivative(0.5 * (li + lj), alpha)
    fmat = jnp.where(close, fprime, (fi - fj) / jnp.where(close, 1.0, denom))
    dg = vecs @ (fmat * m) @ vecs.T
    dlam = _softabs_derivative(eigs, alpha) * jnp.diagonal(m)
    return (g, lam), (dg, dlam)


class MetricResult(NamedTuple):
    g: jnp.ndarray  # (D, D) metric tensor
    abs_eigs: Optional[jnp.ndarray]  # softabs eigenvalues, else None


def make_metric_fn(
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    opts: RMOptions,
) -> Callable[[jnp.ndarray, Optional[jnp.ndarray]], MetricResult]:
    """Build G(theta); ``jitter_u`` is the per-transition U(0,1) vector.

    The metric is computed under float32 matmul precision: TPU f32
    matmuls default to single-bf16 passes (measured on v5e to quantize
    the Hessian of even a 2x2 quadratic to bf16 values), and a corrupted
    G enters the STATIONARY density through its logdet — unlike gradient
    noise, MH cannot correct it.  The per-step cost is negligible next to
    the eigh/cholesky the metric already pays."""

    def metric_fn(theta: jnp.ndarray, jitter_u: Optional[jnp.ndarray]) -> MetricResult:
        with jax.default_matmul_precision("float32"):
            if opts.metric == Metric.JACOBIAN_DIAG:
                g_vec = jax.grad(log_prob_fn)(theta)
                fish = jnp.diag(g_vec * g_vec)
            else:
                fish = -jax.hessian(log_prob_fn)(theta)
            if opts.jitter is not None and jitter_u is not None:
                fish = fish + jnp.diag(jitter_u * opts.jitter)
            if opts.metric == Metric.SOFTABS:
                fish, abs_eigs = softabs_transform(fish, opts.softabs_const)
                return MetricResult(fish, abs_eigs)
            return MetricResult(fish, None)

    return metric_fn


class RMHamiltonian(NamedTuple):
    """Bundled Riemannian-Hamiltonian operations for one potential."""

    ham: Callable  # (theta, p, jitter_u) -> H
    ham_and_logp: Callable  # (theta, p, jitter_u) -> (H, logp)
    grad_theta: Callable  # (theta, p, jitter_u) -> dH/dtheta
    grad_p: Callable  # (theta, p, jitter_u) -> G^-1 p
    metric: Callable  # (theta, jitter_u) -> MetricResult
    sample_momentum: Callable  # (key, theta, jitter_u) -> p ~ N(0, G)


def make_rm_hamiltonian(
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    opts: RMOptions,
    ham_func: Optional[Callable] = None,
    semi_separable: bool = False,
    custom_metric: Optional[Callable] = None,
) -> RMHamiltonian:
    """Assemble the RMHMC operation set for ``log_prob_fn``.

    ``semi_separable`` selects the reference's S3 Hamiltonian
    H = -logp + 1/2 p^T G^-1 p + ham_func(theta) (samplers.py:830-842).

    ``custom_metric``: user-supplied analytic ``theta -> (D, D)`` SPD metric.
    Skips the Hessian/eigh pipeline entirely — dH/dtheta then needs only
    first-order AD through the closed form, which compiles and runs far
    faster than third-order AD through jax.hessian.  softabs/jitter options
    do not apply to a custom metric.
    """
    if custom_metric is not None:
        def metric_fn(theta, jitter_u):
            return MetricResult(custom_metric(theta), None)
    else:
        metric_fn = make_metric_fn(log_prob_fn, opts)

    def ham_and_logp(theta, p, jitter_u):
        logp = log_prob_fn(theta)
        g, abs_eigs = metric_fn(theta, jitter_u)
        chol = jnp.linalg.cholesky(g)
        y = jax.scipy.linalg.solve_triangular(chol, p, lower=True)
        quad = jnp.dot(y, y)
        if semi_separable:
            extra = ham_func(theta) if ham_func is not None else 0.0
            h = -logp + 0.5 * quad + extra
            return h, logp
        if abs_eigs is not None:
            logdet = jnp.sum(jnp.log(abs_eigs))
        else:
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        d = theta.shape[0]
        h = -logp + 0.5 * d * math.log(2 * math.pi) + 0.5 * logdet + 0.5 * quad
        return h, logp

    def ham(theta, p, jitter_u):
        return ham_and_logp(theta, p, jitter_u)[0]

    grad_theta = jax.grad(ham, argnums=0)

    def grad_p(theta, p, jitter_u):
        g, _ = metric_fn(theta, jitter_u)
        chol = jnp.linalg.cholesky(g)
        y = jax.scipy.linalg.solve_triangular(chol, p, lower=True)
        return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)

    def sample_momentum(key, theta, jitter_u):
        g, _ = metric_fn(theta, jitter_u)
        chol = jnp.linalg.cholesky(g)
        z = jax.random.normal(key, theta.shape, theta.dtype)
        return chol @ z

    return RMHamiltonian(
        ham=ham,
        ham_and_logp=ham_and_logp,
        grad_theta=grad_theta,
        grad_p=grad_p,
        metric=metric_fn,
        sample_momentum=sample_momentum,
    )
