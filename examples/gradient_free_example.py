"""Gradient-free sampling: the affine-invariant ensemble (stretch move).

Every other sampler in this package consumes gradients.  The Goodman &
Weare (2010) stretch move — emcee's algorithm — only ever EVALUATES the
log-density, so it samples targets autodiff cannot touch.  Two demos:

1. A quantised (staircase) log-likelihood: its gradient is zero almost
   everywhere, so HMC proposals never bend toward the mode — the
   ensemble samples it without noticing.
2. Affine invariance: a condition-number-1e4 correlated Gaussian mixes
   exactly like its whitened twin with NO tuning — the walker cloud is
   the preconditioner.

Run: python examples/gradient_free_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch

key = jax.random.key(0)

# --- 1. a non-differentiable target ---------------------------------------
def staircase_lp(t):
    # piecewise-constant: grad is 0 a.e. -> gradient samplers stall
    return -0.5 * jnp.floor(jnp.sum(t**2) * 4.0) / 4.0

g = jax.grad(staircase_lp)(jnp.ones(2))
print(f"autodiff gradient of the staircase target at (1,1): {np.asarray(g)}"
      f"  <- zero a.e.; HMC cannot move")

cfg = hamiltorch.StretchConfig(num_samples=budget(4000, 60))
r = hamiltorch.run_stretch(key, staircase_lp, jnp.zeros(2), cfg,
                           num_walkers=32)
burn = budget(1000, 20)
pooled = np.asarray(r.samples[burn:]).reshape(-1, 2)
print(f"stretch move, 32 walkers x {cfg.num_samples} iterations: "
      f"std {np.round(pooled.std(0), 3).tolist()} (smooth-limit 1.0), "
      f"acceptance {float(r.acc_rate):.2f}")

# --- 2. affine invariance ---------------------------------------------------
rot = jnp.array([[0.8, -0.6], [0.6, 0.8]])
A = rot @ jnp.diag(jnp.array([10.0, 0.1]))  # condition number 1e4
prec = jnp.linalg.inv(A @ A.T)
hard_lp = lambda t: -0.5 * t @ prec @ t
white_lp = lambda t: -0.5 * jnp.sum(t**2)

cfg2 = hamiltorch.StretchConfig(num_samples=budget(3000, 60))
r_hard = hamiltorch.run_stretch(key, hard_lp, jnp.zeros(2), cfg2,
                                num_walkers=32, init_jitter=1.0)
r_white = hamiltorch.run_stretch(key, white_lp, jnp.zeros(2), cfg2,
                                 num_walkers=32, init_jitter=1.0)
print(f"\naffine invariance (same seed, no retuning):")
print(f"  condition-1e4 Gaussian acceptance: {float(r_hard.acc_rate):.3f}")
print(f"  whitened twin acceptance:          {float(r_white.acc_rate):.3f}")

# --- 3. elliptical slice: Gaussian prior + any likelihood, no tuning ------
# ESS exploits prior structure the stretch move ignores: with a N(0, I)
# prior it needs no walkers, no step size, and ~1-3 likelihood calls per
# draw (the analytic posterior here: mean 0.8, var 0.2 per dim).
ll = lambda t: -0.5 * jnp.sum(((t - 1.0) / 0.5) ** 2)
re = hamiltorch.run_elliptical(key, ll, jnp.zeros(3),
                               hamiltorch.EllipticalConfig(
                                   num_samples=budget(3000, 80)))
eb = budget(500, 20)
es = np.asarray(re.samples[eb:])
print("\nelliptical slice on the analytic Gaussian-prior posterior:")
print(f"  mean {np.round(es.mean(0), 3).tolist()} (exact 0.8), "
      f"var {np.round(es.var(0), 3).tolist()} (exact 0.2), "
      f"{float(np.asarray(re.stats.shrinks, float).mean()):.1f} "
      f"likelihood calls shrunk per draw")

# ArviZ export: walkers land as chains
from hamiltorch_tpu.diagnostics import to_inference_dict

d = to_inference_dict(r_hard)
print(f"\nArviZ layout: posterior theta {d['posterior']['theta'].shape} "
      f"(walkers as chains), stats {sorted(d['sample_stats'])}")
