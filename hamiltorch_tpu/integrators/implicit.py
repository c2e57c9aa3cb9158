"""Generalized (implicit) leapfrog for non-separable Hamiltonians.

Behavioural spec: the implicit-RMHMC branch of the reference's leapfrog
(reference: hamiltorch/samplers.py:305-387):

* implicit momentum half-step solved by fixed-point iteration
  p* = p0 - eps/2 * dH/dtheta(theta, p*)            (samplers.py:312-341);
* implicit position step
  theta* = theta0 + eps/2 * (dH/dp(theta0, p) + dH/dp(theta*, p))
                                                     (samplers.py:343-360);
* explicit final momentum half-step                  (samplers.py:369-383).

The reference's Python ``for`` + break becomes ``lax.while_loop`` with the
same convergence rule (max squared successive difference below threshold,
iteration cap).  The jitter-resample-on-NaN retry loops (samplers.py:322-333,
373-382) have no traced equivalent: the metric jitter is fixed per
transition, and NaNs propagate to the energies where the driver's accept
mask rejects the draw.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.metrics import RMHamiltonian, RMOptions


def _fixed_point(update_fn, x0, threshold: float, max_iters: int):
    """Iterate x <- update_fn(x) until max (x_new - x)^2 < threshold.

    Returns ``(x, iters, residual)`` — the iteration count and final squared
    successive difference make non-convergence visible data (the reference
    debug-prints them, samplers.py:339-340,358-359; here they flow into
    MCMCStats.fp_iters / fp_residual).

    NaNs in the iterate exit the loop immediately (the comparison is
    arranged so a NaN diff fails the 'continue' condition), letting the
    divergence reach the driver instead of spinning to the cap.
    """

    def cond(carry):
        i, _, diff = carry
        return (i < max_iters) & (diff > threshold)

    def body(carry):
        i, x, _ = carry
        x_new = update_fn(x)
        diff = jnp.max((x_new - x) ** 2)
        # NaN diff -> not (> threshold) is False already; also force exit
        # by mapping NaN to -inf so cond fails.
        diff = jnp.where(jnp.isnan(diff), -jnp.inf, diff)
        return (i + 1, x_new, diff)

    init = (jnp.zeros((), jnp.int32), x0, jnp.asarray(jnp.inf, x0.dtype))
    iters, x, diff = jax.lax.while_loop(cond, body, init)
    return x, iters, diff


def implicit_leapfrog_step(
    rm: RMHamiltonian,
    opts: RMOptions,
    theta: jnp.ndarray,
    p: jnp.ndarray,
    step_size,
    jitter_u,
):
    """One generalized-leapfrog step.

    Returns ``(theta', p', fp_iters, fp_residual)`` where ``fp_iters`` is
    the larger of the two fixed-point iteration counts and ``fp_residual``
    the larger final squared successive difference — a count saturating at
    ``opts.fixed_point_max_iterations`` (or a residual above the threshold)
    means the solve did not converge.
    """
    eps = step_size
    thr = opts.fixed_point_threshold
    iters = opts.fixed_point_max_iterations

    # implicit momentum half-step
    p_half, it_p, res_p = _fixed_point(
        lambda p_cur: p - 0.5 * eps * rm.grad_theta(theta, p_cur, jitter_u),
        p, thr, iters,
    )

    # implicit position full-step
    v_old = rm.grad_p(theta, p_half, jitter_u)
    theta_new, it_t, res_t = _fixed_point(
        lambda th_cur: theta + 0.5 * eps * (v_old + rm.grad_p(th_cur, p_half, jitter_u)),
        theta, thr, iters,
    )

    # explicit momentum half-step
    p_new = p_half - 0.5 * eps * rm.grad_theta(theta_new, p_half, jitter_u)
    return theta_new, p_new, jnp.maximum(it_p, it_t), jnp.maximum(res_p, res_t)


def implicit_leapfrog(
    rm: RMHamiltonian,
    opts: RMOptions,
    theta: jnp.ndarray,
    p: jnp.ndarray,
    step_size,
    num_steps: int,
    jitter_u,
):
    """Integrate ``num_steps`` generalized-leapfrog steps.

    Returns ``(theta, p, fp_iters, fp_residual)`` with the fixed-point
    diagnostics maxed over the trajectory's steps.
    """

    def body(carry, _):
        th, mom = carry
        th, mom, fp_it, fp_res = implicit_leapfrog_step(
            rm, opts, th, mom, step_size, jitter_u
        )
        return (th, mom), (fp_it, fp_res)

    (theta, p), (fp_its, fp_ress) = jax.lax.scan(
        body, (theta, p), None, length=num_steps
    )
    return theta, p, jnp.max(fp_its), jnp.max(fp_ress)
