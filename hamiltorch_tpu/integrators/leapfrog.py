"""Velocity-Verlet (leapfrog) integrator as a single ``lax.scan``.

Behavioural spec: the standard-leapfrog branch of the reference's 400-line
``leapfrog`` dispatcher (reference: hamiltorch/samplers.py:269-304): one
half-step momentum kick, L full drift+kick steps, and a trailing half-kick
correction on the final momentum.

TPU-first differences:

* the L-step Python loop becomes ``lax.scan`` — one traced step body,
  compiled once, no per-step dispatch;
* the gradient at the current point is *carried* between samples, so a
  trajectory costs exactly L fused ``value_and_grad`` evaluations (the
  reference re-evaluates the starting gradient every trajectory);
* only the endpoint is materialised — the reference returns the whole
  trajectory as Python lists though the driver consumes just the last state
  (reference: hamiltorch/samplers.py:993-994), an O(L·D) memory cost this
  design does not reproduce;
* no data-dependent control flow: NaNs propagate through the state and are
  resolved by the driver's accept mask.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PhasePoint(NamedTuple):
    """Endpoint of a trajectory with its cached potential evaluation."""

    theta: jnp.ndarray
    momentum: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


def leapfrog(
    value_and_grad_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    mass,
    start: PhasePoint,
    step_size: jnp.ndarray,
    num_steps: int,
) -> PhasePoint:
    """Integrate Hamilton's equations for ``num_steps`` leapfrog steps.

    ``start`` must carry ``logp``/``grad`` evaluated at ``start.theta``;
    the returned PhasePoint carries them at the endpoint, so the caller can
    form both Hamiltonians without extra potential evaluations.
    """
    eps = step_size
    tmap = jax.tree_util.tree_map  # theta/p may be flat vectors or pytrees

    p = tmap(lambda p, g: p + 0.5 * eps * g, start.momentum, start.grad)

    def body(carry, _):
        theta, p, _, _ = carry
        theta = tmap(lambda t, v: t + eps * v, theta, mass.velocity(p))
        logp, grad = value_and_grad_fn(theta)
        p = tmap(lambda p, g: p + eps * g, p, grad)
        return (theta, p, logp, grad), None

    (theta, p, logp, grad), _ = jax.lax.scan(
        body, (start.theta, p, start.logp, start.grad), None, length=num_steps
    )
    # The scan applies a full kick at the endpoint; pull half of it back.
    p = tmap(lambda p, g: p - 0.5 * eps * g, p, grad)
    return PhasePoint(theta=theta, momentum=p, logp=logp, grad=grad)
