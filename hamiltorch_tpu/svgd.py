"""Stein variational gradient descent (SVGD): particle-ensemble VI.

No counterpart in the reference — hamiltorch's only posterior machinery
is MCMC (reference: hamiltorch/samplers.py:850-1091); its notebooks reach
for hand-rolled torch loops when they want a cheap deterministic
approximation.  SVGD (Liu & Wang 2016) closes the gap between this
package's point estimates (``map_estimate``), parametric VI (``advi``)
and full MCMC: ``n`` interacting particles follow the kernelized
Wasserstein gradient of KL(q || p),

    phi(x_i) = (1/n) sum_j [ k(x_j, x_i) grad log p(x_j)
                             + grad_{x_j} k(x_j, x_i) ],

so the ensemble drifts toward the posterior while the kernel-repulsion
term keeps it spread — a mixture-shaped posterior that collapses
mean-field ADVI stays covered.

TPU-first shape: the whole update is MXU work — the pairwise squared
distances come from one ``X @ X.T`` Gram matmul, the attraction term is
``K @ G``, and the repulsion term is ``diag(K 1) X - K X`` — three
(n, n) x (n, d) contractions per step, no per-pair loop.  The step loop
is one jitted ``lax.scan``; updates are deterministic (the key only
draws the initial cloud), so chunked runs resume bit-exactly by passing
``particles0=result.particles, init_aux=result.final_aux,
start_step=result.final_step`` — no RNG stream to thread.  Non-finite
updates are branchless rejections (the step is skipped and counted);
exceptions never cross the scan.

The RBF bandwidth follows the median heuristic exactly as in Liu &
Wang's reference implementation (median of the full squared-distance
matrix, diagonal zeros included, scaled by ``log(n + 1)``), recomputed
every step on device; a fixed ``bandwidth`` (an RBF lengthscale ``l``,
kernel ``exp(-D2 / (2 l^2))``) switches the heuristic off.  The
optimizer is their AdaGrad with momentum (fudge factor + decaying
accumulator of ``phi**2``).

Pytree parameters take the boundary-ravel path (like RMHMC): the kernel
needs one flat coordinate vector per particle, so tree particles ravel
once at entry and unravel once at exit; the flat wrapper is
identity-stable (memoized) so repeat calls hit jit's compilation cache.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


@dataclasses.dataclass(frozen=True)
class SVGDConfig:
    """Static configuration for :func:`run_svgd`.

    ``bandwidth=None`` (default) re-estimates the RBF bandwidth every
    step with the median heuristic; a positive float fixes the RBF
    lengthscale instead.  ``step_size``/``adagrad_alpha``/``fudge`` are
    Liu & Wang's AdaGrad-with-momentum knobs; ``optimizer="sgd"``
    disables the accumulator (plain ``x += step_size * phi``).
    ``init_scale`` is the stddev of the initial cloud around ``theta0``.
    """

    num_steps: int
    step_size: float = 1e-1
    bandwidth: Optional[float] = None
    optimizer: str = "adagrad"  # "adagrad" | "sgd"
    adagrad_alpha: float = 0.9
    fudge: float = 1e-6
    init_scale: float = 0.1

    def __post_init__(self):
        if self.num_steps <= 0:
            raise ValueError("num_steps must be positive")
        if self.optimizer not in ("adagrad", "sgd"):
            raise ValueError(
                f"optimizer must be 'adagrad' or 'sgd', got {self.optimizer!r}"
            )
        if self.bandwidth is not None and not self.bandwidth > 0:
            raise ValueError("bandwidth must be positive (or None)")
        if not self.step_size > 0:
            raise ValueError("step_size must be positive")


class SVGDResult(NamedTuple):
    particles: object  # (n, ...) final cloud — flat (n, D) or tree leaves
    phi_norm_trace: jnp.ndarray  # (num_steps,) mean per-particle |phi|
    bandwidth_trace: jnp.ndarray  # (num_steps,) kernel scale h (= 2 l^2)
    num_rejected: jnp.ndarray  # non-finite (skipped) steps
    final_aux: jnp.ndarray  # AdaGrad accumulator, flat (n, D) f32 (resume)
    final_step: jnp.ndarray  # global step counter after the run


def _pairwise_sq(x32):
    """(n, n) squared Euclidean distances from one Gram matmul."""
    sq = jnp.sum(x32 * x32, axis=1)
    return jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (x32 @ x32.T), 0.0)


def _median_h(d2, n):
    """Liu & Wang's heuristic: exponent ``-d2 * log(n + 1) / median(d2)``
    (median over the FULL matrix, diagonal zeros included, matching
    their reference implementation)."""
    return jnp.maximum(jnp.median(d2) / jnp.log(n + 1.0), 1e-12)


def _svgd_phi(x32, g32, d2, h, n):
    """Stein direction: attraction ``K G`` + repulsion ``(2/h)(K1 . X - K X)``."""
    k = jnp.exp(-d2 / h)
    attract = k @ g32
    repulse = (2.0 / h) * (jnp.sum(k, axis=1, keepdims=True) * x32 - k @ x32)
    return (attract + repulse) / n


@partial(jax.jit, static_argnames=("log_prob", "config"))
def _run_svgd_jit(particles0, log_prob, config: SVGDConfig,
                  data=None, init_aux=None, start_step=0):
    if data is None:
        lp = log_prob
    else:
        lp = lambda t: log_prob(t, data)
    grad_all = jax.vmap(jax.grad(lp))
    n = particles0.shape[0]
    fixed_h = (
        None if config.bandwidth is None
        else 2.0 * float(config.bandwidth) ** 2
    )
    if init_aux is None:
        init_aux = jnp.zeros(particles0.shape, jnp.float32)

    def one_step(carry, t):
        x, aux, rej = carry
        x32 = x.astype(jnp.float32)
        g32 = grad_all(x).astype(jnp.float32)
        d2 = _pairwise_sq(x32)
        h = _median_h(d2, n) if fixed_h is None else jnp.float32(fixed_h)
        phi = _svgd_phi(x32, g32, d2, h, n)
        if config.optimizer == "adagrad":
            # global step 0 seeds the accumulator with phi^2 outright
            # (Liu & Wang's iter==0 branch); resumed chunks have t > 0
            aux_new = jnp.where(
                t == 0,
                phi * phi,
                config.adagrad_alpha * aux
                + (1.0 - config.adagrad_alpha) * phi * phi,
            )
            step = config.step_size * phi / (config.fudge + jnp.sqrt(aux_new))
        else:
            aux_new = aux
            step = config.step_size * phi
        x_new = (x32 + step).astype(x.dtype)
        ok = jnp.all(jnp.isfinite(x_new))
        x_sel = jnp.where(ok, x_new, x)
        aux_sel = jnp.where(ok, aux_new, aux)
        phi_norm = jnp.mean(jnp.sqrt(jnp.sum(phi * phi, axis=1)))
        return (x_sel, aux_sel, rej + (~ok).astype(jnp.int32)), (phi_norm, h)

    steps = start_step + jnp.arange(config.num_steps)
    (x, aux, rej), (phi_tr, h_tr) = jax.lax.scan(
        one_step, (particles0, init_aux, jnp.zeros((), jnp.int32)), steps
    )
    return x, phi_tr, h_tr, rej, aux, steps[-1] + 1


# Fresh flat-wrapper closures per call would make every run_svgd call on a
# tree state recompile the whole scan (potentials are STATIC jit args);
# memoize by (potential identity, leaf structure) like ops/potential.py's
# _TREE_POTENTIAL_CACHE.
_FLAT_LP_CACHE: OrderedDict = OrderedDict()
_FLAT_LP_CACHE_MAX = 32


def _flat_log_prob(log_prob, template, with_data: bool):
    leaves, tdef = jax.tree_util.tree_flatten(template)
    struct = (tdef, tuple((tuple(l.shape), str(l.dtype)) for l in leaves))
    try:
        key = (log_prob, struct, with_data)
        hit = _FLAT_LP_CACHE.get(key)
    except TypeError:  # unhashable potential: skip memoization
        key, hit = None, None
    if hit is None:
        _, unravel = ravel_pytree(template)
        if with_data:
            hit = lambda v, d: log_prob(unravel(v), d)
        else:
            hit = lambda v: log_prob(unravel(v))
        if key is not None:
            _FLAT_LP_CACHE[key] = hit
            while len(_FLAT_LP_CACHE) > _FLAT_LP_CACHE_MAX:
                _FLAT_LP_CACHE.popitem(last=False)
    return hit


def run_svgd(
    key,
    log_prob: Callable,
    theta0,
    config: SVGDConfig,
    num_particles: int = 100,
    *,
    data=None,
    particles0=None,
    init_aux=None,
    start_step=0,
) -> SVGDResult:
    """Transport ``num_particles`` particles toward ``log_prob``'s target.

    ``theta0`` may be a flat vector or any pytree (boundary-raveled); the
    initial cloud is ``theta0 + init_scale * N(0, I)`` unless
    ``particles0`` (a previous result's ``.particles``) resumes a run —
    pass ``init_aux=result.final_aux, start_step=result.final_step`` with
    it for a bit-exact continuation.  ``data`` is forwarded as a jit
    operand, reaching the potential as ``log_prob(theta, data)`` (large
    datasets must not ride closures — same rule as the samplers).
    """
    flat0, unravel = ravel_pytree(theta0)
    is_tree = not hasattr(theta0, "ndim")
    if num_particles < 2:
        raise ValueError("num_particles must be >= 2 (the kernel-repulsion "
                         "term needs an interacting ensemble)")

    if particles0 is None:
        noise = jax.random.normal(key, (num_particles,) + flat0.shape,
                                  flat0.dtype)
        particles = flat0[None, :] + config.init_scale * noise
    else:
        if is_tree:
            particles = jax.vmap(lambda t: ravel_pytree(t)[0])(particles0)
        else:
            particles = jnp.asarray(particles0)
        if particles.shape != (num_particles, flat0.shape[0]):
            raise ValueError(
                f"particles0 shape {particles.shape} != "
                f"({num_particles}, {flat0.shape[0]})"
            )

    lp = _flat_log_prob(log_prob, theta0, data is not None) if is_tree \
        else log_prob

    x, phi_tr, h_tr, rej, aux, last = _run_svgd_jit(
        particles, lp, config, data=data,
        init_aux=init_aux, start_step=start_step,
    )
    out = jax.vmap(unravel)(x) if is_tree else x
    return SVGDResult(out, phi_tr, h_tr, rej, aux, last)
