"""Cyclical SG-MCMC on a multimodal posterior (Zhang et al. 2020).

Constant-step SG-MCMC inherits HMC's failure mode on well-separated
modes: the chain never leaves the basin it starts in.  The cyclical
cosine schedule restarts each cycle hot — big noisy steps relocate the
chain — then cools into a sampling stage that collects locally mixed
snapshots.  Here: a +-4 two-mode posterior with minibatch gradient noise
(zero-sum per-term tilts, the stochastic-gradient setting the schedule
was designed for); cSGLD visits both modes from a one-mode start while
plain SGLD stays trapped, and the per-cycle snapshots feed the same
diagnostics as any chain trace.

No reference counterpart (the reference's minibatch story stops at
symmetric-split HMC).  Run: python examples/csgld_multimodal_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch
from hamiltorch_tpu.diagnostics import summary

# two unit modes at +-4 split into 4 minibatch terms; the zero-sum tilts
# C[m] make each term's gradient an unbiased but noisy estimate
C = jnp.array([2.0, -2.0, 1.0, -1.0])


def mix_term(t, m):
    lp = jnp.logaddexp(-0.5 * jnp.sum((t - 4.0) ** 2),
                       -0.5 * jnp.sum((t + 4.0) ** 2))
    return 0.25 * lp + C[m] * jnp.sum(t)


start = jnp.full((1,), 4.0)  # every chain starts in the + mode
key = jax.random.key(1)

ccfg = hamiltorch.CSGMCMCConfig(
    num_cycles=budget(8, 4), cycle_length=budget(300, 120), step_size=1.0,
    exploration_frac=0.6, thin=2,
)
rc = hamiltorch.run_csgmcmc_chains(key, mix_term, 4, start, ccfg,
                                   num_chains=8)
pos = np.asarray(rc.samples)[..., 0] > 0
print(f"cSGLD ({ccfg.num_cycles} cycles x {ccfg.cycle_length} steps, "
      f"{rc.samples.shape[1]} snapshots/chain):")
print(f"  positive-mode fraction, pooled: {pos.mean():.2f}  "
      f"per chain: {np.round(pos.mean(1), 2).tolist()}")
s = summary(rc.samples)
print(f"  rank-normalized R-hat: {float(np.asarray(s['r_hat_rank'])[0]):.3f}"
      f"  (chains agree on the mixture)")

scfg = hamiltorch.SGLDConfig(num_samples=budget(2400, 600), step_size=0.02,
                             thin=2)
rs = hamiltorch.run_sgld_chains(key, mix_term, 4, start, scfg, num_chains=8)
print(f"plain SGLD, same start/terms: positive-mode fraction "
      f"{float((np.asarray(rs.samples)[..., 0] > 0).mean()):.2f}  "
      f"<- trapped in the start mode")

# the same config drops onto a cSGHMC base with persistent momentum
hcfg = hamiltorch.CSGMCMCConfig(
    num_cycles=budget(8, 4), cycle_length=budget(300, 120), step_size=0.5,
    exploration_frac=0.6, thin=2, base="sghmc", friction=0.1,
)
rh = hamiltorch.run_csgmcmc_chains(key, mix_term, 4, start, hcfg,
                                   num_chains=8)
print(f"cSGHMC: positive-mode fraction "
      f"{float((np.asarray(rh.samples)[..., 0] > 0).mean()):.2f}")
