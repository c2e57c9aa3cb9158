"""SVGD: particle-ensemble VI that keeps multimodal posteriors covered.

Stein variational gradient descent (Liu & Wang 2016) transports an
interacting particle cloud along the kernelized Stein direction — the
attraction term pulls particles up the posterior, the kernel-repulsion
term keeps them apart.  Two demos:

1. A correlated 2-D Gaussian: 200 particles reproduce the mean and the
   full covariance (including the off-diagonal mean-field ADVI cannot
   represent).
2. A well-separated mixture: SVGD particles split across both modes
   while mean-field ADVI fits one Gaussian (a basin or the saddle) —
   the capability gap the repulsion term closes.

Every update is MXU work (one Gram matmul for pairwise distances, two
(n, n) x (n, d) contractions for attraction/repulsion) inside a single
jitted ``lax.scan``.  No reference counterpart (the reference's only
posterior machinery is MCMC).  Run: python examples/svgd_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch

key = jax.random.key(0)

# --- 1. correlated Gaussian: full-covariance recovery -------------------
COV = jnp.array([[1.0, 0.8], [0.8, 2.0]])
PREC = jnp.linalg.inv(COV)
gauss_lp = lambda t: -0.5 * t @ PREC @ t

cfg = hamiltorch.SVGDConfig(num_steps=budget(500, 40), step_size=0.2)
r = hamiltorch.run_svgd(key, gauss_lp, jnp.zeros(2), cfg,
                        num_particles=budget(200, 32))
x = np.asarray(r.particles)
print(f"SVGD on N(0, [[1, .8], [.8, 2]]), {x.shape[0]} particles, "
      f"{cfg.num_steps} steps:")
print(f"  mean {np.round(x.mean(0), 3).tolist()}")
print(f"  cov  {np.round(np.cov(x.T), 3).tolist()}")
print(f"  final mean |phi|: {float(r.phi_norm_trace[-1]):.4f} "
      f"(from {float(r.phi_norm_trace[0]):.3f})")

# --- 2. mixture: mode coverage vs mean-field ADVI ------------------------
def mix_lp(t):
    return jnp.logaddexp(-0.5 * jnp.sum((t - 3.0) ** 2),
                         -0.5 * jnp.sum((t + 3.0) ** 2))

mcfg = hamiltorch.SVGDConfig(num_steps=budget(600, 40), step_size=0.3,
                             init_scale=1.0)
rm = hamiltorch.run_svgd(jax.random.key(1), mix_lp, jnp.zeros(1), mcfg,
                         num_particles=budget(100, 24))
z = np.asarray(rm.particles)[:, 0]
frac = float(np.mean(z > 0))
print(f"\nmixture at +-3: SVGD positive-mode fraction {frac:.2f} "
      f"(both modes kept)")

adv = hamiltorch.advi(mix_lp, jnp.zeros(1), num_steps=budget(800, 40),
                      key=jax.random.key(2))
mu = float(np.asarray(adv.mean)[0])
sd = float(np.exp(np.asarray(adv.log_std))[0])
print(f"mean-field ADVI on the same target: N({mu:.2f}, {sd:.2f}^2) "
      f"— a single Gaussian cannot keep both modes (it locks onto one "
      f"basin or the saddle between them); the particle ensemble can")
