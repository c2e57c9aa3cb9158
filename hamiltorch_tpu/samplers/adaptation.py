"""Dual-averaging step-size adaptation (Hoffman & Gelman 2014, Algorithm 5).

Behavioural spec: the reference's ``adaptation`` (reference:
hamiltorch/samplers.py:629-674) with its hard-coded gamma=0.05, t0=10,
kappa=0.75 and the NaN-acceptance -> alpha=0 rule (samplers.py:660-661).

Here the adaptation state is a small pytree carried through the sampling
scan — pure arrays, no Python floats — so adaptation runs inside jit at
zero cost.  All quantities are kept in log space for f32 stability.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

GAMMA = 0.05
T0 = 10.0
KAPPA = 0.75


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DualAveragingState:
    step_size: jnp.ndarray  # current step size (traced scalar)
    log_eps_bar: jnp.ndarray  # running log averaged step size
    h_t: jnp.ndarray  # running statistic H_t
    mu: jnp.ndarray  # log(10 * eps0), fixed shrinkage target


def da_init(step_size_init: float, dtype=jnp.float32) -> DualAveragingState:
    eps0 = jnp.asarray(step_size_init, dtype)
    return DualAveragingState(
        step_size=eps0,
        log_eps_bar=jnp.zeros((), dtype),  # eps_bar = 1.0 (reference init, samplers.py:939)
        h_t=jnp.zeros((), dtype),
        mu=jnp.log(10.0 * eps0),
    )


def da_update(
    state: DualAveragingState,
    log_accept_ratio: jnp.ndarray,
    t: jnp.ndarray,
    desired_accept_rate: float = 0.8,
) -> DualAveragingState:
    """One dual-averaging update; ``t`` is the 0-based iteration index.

    Non-finite ``log_accept_ratio`` (a divergence) counts as alpha = 0,
    matching the reference's NaN rule.
    """
    t = (t + 1).astype(state.h_t.dtype)
    alpha = jnp.where(
        jnp.isfinite(log_accept_ratio),
        jnp.minimum(1.0, jnp.exp(jnp.minimum(log_accept_ratio, 0.0))),
        0.0,
    )
    eta = 1.0 / (t + T0)
    h_t = (1.0 - eta) * state.h_t + eta * (desired_accept_rate - alpha)
    log_eps = state.mu - jnp.sqrt(t) / GAMMA * h_t
    w = t ** (-KAPPA)
    log_eps_bar = w * log_eps + (1.0 - w) * state.log_eps_bar
    return DualAveragingState(
        step_size=jnp.exp(log_eps),
        log_eps_bar=log_eps_bar,
        h_t=h_t,
        mu=state.mu,
    )
