"""Sampling generic log-probabilities: every sampler on a 3-D Gaussian and
Neal's funnel.

Port of the reference tutorial notebooks/hamiltorch_log_prob_examples.ipynb
(cells 9-30) — same targets and hyperparameters, JAX API.
"""

import time

import jax
import jax.numpy as jnp

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch

hamiltorch.set_random_seed(123)


def log_prob(omega):
    mean = jnp.zeros(3)
    stddev = jnp.array([0.5, 1.0, 2.0])
    return jnp.sum(-0.5 * ((omega - mean) / stddev) ** 2)


def funnel_ll(w):
    v, x = w[0], w[1:]
    return -0.5 * v**2 / 9.0 - 0.5 * jnp.sum(x**2) * jnp.exp(-v) - 0.5 * (w.shape[0] - 1) * v


def timed(name, fn):
    t0 = time.time()
    out = fn()
    out = jax.block_until_ready(out)
    n = out.shape[0] if hasattr(out, "shape") else len(out[0])
    print(f"{name}: {n / (time.time() - t0):8.1f} samples/sec")
    return out


params_init = jnp.zeros(3)

# --- plain HMC (notebook cell 9: 400 samples, L=5, eps=0.3) ---
s_hmc = timed("HMC            ", lambda: hamiltorch.sample(
    log_prob, params_init, num_samples=budget(400, 40), step_size=0.3,
    num_steps_per_sample=5, verbose=False))
print("   emp std:", jnp.std(s_hmc[budget(50, 5):], axis=0), "(true [0.5, 1, 2])")

# --- step-size-adapting NUTS (cell 11: 900 samples, 500 burn) ---
s_nuts, eps = hamiltorch.sample(
    log_prob, params_init, num_samples=budget(900, 60), burn=budget(500, 30),
    step_size=1.0,
    num_steps_per_sample=5, sampler=hamiltorch.Sampler.HMC_NUTS, debug=2,
    verbose=False)
print(f"NUTS (adapt)    : adapted step size {eps:.3f}, emp std:",
      jnp.std(s_nuts[1:], axis=0))

# --- implicit RMHMC (cell 13) ---
s_irm = timed("implicit RMHMC ", lambda: hamiltorch.sample(
    log_prob, params_init, num_samples=budget(200, 15), step_size=0.3,
    num_steps_per_sample=5, sampler=hamiltorch.Sampler.RMHMC,
    integrator=hamiltorch.Integrator.IMPLICIT,
    fixed_point_max_iterations=6, fixed_point_threshold=1e-20, verbose=False))
print("   emp std:", jnp.std(s_irm[20:], axis=0))

# --- explicit RMHMC (cell 15) ---
s_erm = timed("explicit RMHMC ", lambda: hamiltorch.sample(
    log_prob, params_init, num_samples=budget(200, 15), step_size=0.3,
    num_steps_per_sample=5, sampler=hamiltorch.Sampler.RMHMC,
    integrator=hamiltorch.Integrator.EXPLICIT, verbose=False))
print("   emp std:", jnp.std(s_erm[20:], axis=0))

# --- Neal's funnel, HMC (cell 24: 10+1 dims, L=25, eps=0.2) ---
s_fun = timed("HMC funnel     ", lambda: hamiltorch.sample(
    funnel_ll, jnp.zeros(11), num_samples=budget(1000, 60), step_size=0.2,
    num_steps_per_sample=25, verbose=False))
print("   v std:", float(jnp.std(s_fun[budget(100, 10):, 0])),
      "(true 3; HMC undercounts)")

# --- funnel, softabs implicit RMHMC (cells 28-30) ---
s_sa = timed("softabs iRMHMC ", lambda: hamiltorch.sample(
    funnel_ll, 0.1 * jnp.ones(11), num_samples=budget(25, 6), step_size=0.14,
    num_steps_per_sample=10, sampler=hamiltorch.Sampler.RMHMC,
    metric=hamiltorch.Metric.SOFTABS, softabs_const=10.0,
    fixed_point_max_iterations=6, fixed_point_threshold=1e-8, verbose=False))

# --- extension: true tree-doubling NUTS handles the funnel properly ---
s_tree = timed("tree NUTS      ", lambda: hamiltorch.sample(
    funnel_ll, jnp.zeros(11), num_samples=budget(2000, 100),
    burn=budget(500, 40), step_size=0.3,
    sampler=hamiltorch.Sampler.NUTS, verbose=False))
print("   v std:", float(jnp.std(s_tree[1:, 0])), "(true 3)")
