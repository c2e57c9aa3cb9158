"""Flagship benchmark model: a ~100k-parameter regression BNN.

This is the BASELINE.json north-star workload: a 784 -> 128 -> 1 MLP
(100,609 parameters) with Gaussian prior and regression likelihood, sampled
with 64 vmapped chains.  The apply function is written directly against the
raveled parameter vector — two matmuls per forward — so the entire leapfrog
force evaluation is a pair of MXU contractions with the chain axis batched
in front.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

IN_DIM = 784
HIDDEN = 128
N_DATA = 1024


def flagship_dims(in_dim: int = IN_DIM, hidden: int = HIDDEN) -> int:
    return in_dim * hidden + hidden + hidden + 1


def make_flagship_potential(
    in_dim: int = IN_DIM,
    hidden: int = HIDDEN,
    n_data: int = N_DATA,
    tau_out: float = 10.0,
    dtype=jnp.float32,
    seed: int = 0,
) -> Tuple[Callable[[jnp.ndarray], jnp.ndarray], jnp.ndarray]:
    """Returns (log_prob_fn, theta0) for the flagship BNN on synthetic data."""
    k_x, k_w, k_init = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(k_x, (n_data, in_dim), dtype)
    w_teacher = jax.random.normal(k_w, (in_dim,), dtype) / jnp.sqrt(in_dim)
    y = jnp.tanh(x @ w_teacher)[:, None]

    d = flagship_dims(in_dim, hidden)
    s0, s1 = in_dim * hidden, in_dim * hidden + hidden
    s2 = s1 + hidden

    def apply_fn(theta, xb):
        w1 = theta[:s0].reshape(in_dim, hidden)
        b1 = theta[s0:s1]
        w2 = theta[s1:s2].reshape(hidden, 1)
        b2 = theta[s2:]
        h = jnp.tanh(xb @ w1 + b1)
        return h @ w2 + b2

    def log_prob_fn(theta):
        prior = -0.5 * jnp.dot(theta, theta)
        out = apply_fn(theta, x)
        ll = -0.5 * tau_out * jnp.sum((out - y) ** 2)
        return prior + ll

    theta0 = 0.01 * jax.random.normal(k_init, (d,), dtype)
    return log_prob_fn, theta0


def make_flagship_potential_tree(
    in_dim: int = IN_DIM,
    hidden: int = HIDDEN,
    n_data: int = N_DATA,
    tau_out: float = 10.0,
    dtype=jnp.float32,
    seed: int = 0,
):
    """Pytree-native flagship potential: params stay {w1, b1, w2, b2}.

    Same posterior, data, and initial point as ``make_flagship_potential``
    (identical seeds; the init is the flat draw split into leaves), but the
    parameters never ravel: each leapfrog step updates the four leaves in
    their natural shapes and the backward pass emits per-leaf gradients.
    This removes the flat-theta slice/concat traffic that cost ~24% of the
    flat path's step time (docs/BENCHMARKS.md "Where the time goes").
    """
    k_x, k_w, k_init = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(k_x, (n_data, in_dim), dtype)
    w_teacher = jax.random.normal(k_w, (in_dim,), dtype) / jnp.sqrt(in_dim)
    y = jnp.tanh(x @ w_teacher)[:, None]

    d = flagship_dims(in_dim, hidden)
    s0, s1 = in_dim * hidden, in_dim * hidden + hidden
    s2 = s1 + hidden
    theta0 = 0.01 * jax.random.normal(k_init, (d,), dtype)
    params0 = {
        "w1": theta0[:s0].reshape(in_dim, hidden),
        "b1": theta0[s0:s1],
        "w2": theta0[s1:s2].reshape(hidden, 1),
        "b2": theta0[s2:],
    }

    def log_prob_fn(params):
        prior = -0.5 * sum(
            jnp.vdot(l, l) for l in jax.tree_util.tree_leaves(params)
        )
        h = jnp.tanh(x @ params["w1"] + params["b1"])
        out = h @ params["w2"] + params["b2"]
        ll = -0.5 * tau_out * jnp.sum((out - y) ** 2)
        return prior + ll

    return log_prob_fn, params0


def make_tiny_potential(
    in_dim: int = 8, hidden: int = 4, n_data: int = 16, seed: int = 0
):
    """Small-shape version for compile checks and multi-chip dry runs.

    Returns (loglik_shard_fn, log_prior_fn, x, y, theta0) in the
    data-sharded potential contract of parallel/sharding.py.
    """
    k_x, k_init = jax.random.split(jax.random.key(seed))
    x = jax.random.normal(k_x, (n_data, in_dim), jnp.float32)
    y = jnp.sum(x, axis=1, keepdims=True)
    d = flagship_dims(in_dim, hidden)
    s0, s1 = in_dim * hidden, in_dim * hidden + hidden
    s2 = s1 + hidden

    def apply_fn(theta, xb):
        w1 = theta[:s0].reshape(in_dim, hidden)
        h = jnp.tanh(xb @ w1 + theta[s0:s1])
        return h @ theta[s1:s2].reshape(hidden, 1) + theta[s2:]

    def loglik_shard_fn(theta, x_shard, y_shard):
        out = apply_fn(theta, x_shard)
        return -0.5 * jnp.sum((out - y_shard) ** 2)

    def log_prior_fn(theta):
        return -0.5 * jnp.dot(theta, theta)

    theta0 = jnp.zeros((d,), jnp.float32)
    return loglik_shard_fn, log_prior_fn, x, y, theta0
