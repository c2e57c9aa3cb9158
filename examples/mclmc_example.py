"""MCLMC: the unadjusted gradient-budget winner, tuned automatically.

Microcanonical Langevin Monte Carlo (Robnik et al., arXiv:2212.08549;
tuning: arXiv:2303.18221) runs isokinetic dynamics on the unit velocity
sphere with NO Metropolis test: every gradient evaluation moves the
chain.  The price is a small O(eps^2) bias, controlled by tuning the
step size so the per-dimension energy-error variance sits at a target.
Three demos:

1. A 50-d ill-conditioned Gaussian: auto-tuned (eps, L) recover every
   marginal std; the realised Var[dE]/d lands at the tuning target.
2. Gradient-budget head-to-head vs NUTS on the same target: ESS per
   gradient evaluation — MCLMC spends 2 gradients per kept draw where
   NUTS spends ~2^depth per draw and discards rejected trees.
3. The mesh runner: chains sharded over every device, each tuning its
   own scales (run on the virtual 8-device CPU mesh or a TPU pod slice).

No reference counterpart (the reference predates the method).
Run: python examples/mclmc_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch

key = jax.random.key(0)

# --- 1. 50-d ill-conditioned Gaussian: auto-tuned recovery ---------------
D = budget(50, 8)
STDS = jnp.linspace(0.2, 5.0, D)
lp = lambda t: -0.5 * jnp.sum((t / STDS) ** 2)

cfg = hamiltorch.MCLMCConfig(num_samples=budget(4000, 60),
                             tune_steps=budget(2000, 40))
r = hamiltorch.run_mclmc_chains(key, lp, jnp.zeros(D) + 0.1, cfg,
                                num_chains=8)
pooled = np.asarray(r.samples).reshape(-1, D)
err = np.abs(pooled.std(0) / np.asarray(STDS) - 1.0)
var_e = float(np.var(np.asarray(r.stats.energy_change)) / D)
print(f"MCLMC on a {D}-d Gaussian (stds 0.2..5.0), 8 chains x "
      f"{cfg.num_samples} draws, {cfg.tune_steps} tuning steps:")
print(f"  worst marginal-std error: {err.max():.1%}")
print(f"  tuned eps per chain: {np.round(np.asarray(r.step_size), 3).tolist()}")
print(f"  tuned L (median): {float(np.median(np.asarray(r.trajectory_length))):.2f}")
print(f"  realised Var[dE]/d: {var_e:.2e} (target {cfg.desired_energy_var:.0e})")

# --- 2. gradient budget vs NUTS ------------------------------------------
# MCLMC (mclachlan): 2 gradients per transition, every transition kept.
# NUTS: ~2^depth gradients per draw.  Compare min-ESS per 1000 gradients.
from hamiltorch_tpu.diagnostics import effective_sample_size

n_draws = budget(2000, 40)
mc = hamiltorch.run_mclmc_chains(jax.random.key(1), lp, jnp.zeros(D) + 0.1,
                                 hamiltorch.MCLMCConfig(
                                     num_samples=n_draws,
                                     tune_steps=budget(2000, 40)),
                                 num_chains=4)
mclmc_grads = 4 * (2 * n_draws + 2 * budget(2000, 40))

nuts_cfg = hamiltorch.NUTSConfig(num_samples=n_draws,
                                 burn=budget(500, 20), max_tree_depth=8)
nt_result, nt_info = hamiltorch.run_nuts_chains(
    jax.random.key(2), lp, jnp.zeros(D) + 0.1, nuts_cfg, num_chains=4
)
nuts_grads = float(np.sum(np.asarray(nt_info.num_leapfrogs)))

def min_ess(samples):  # (C, N, D) -> scalar
    s = jnp.asarray(np.asarray(samples))
    per_dim = [effective_sample_size(s[:, :, d].T) for d in range(s.shape[-1])]
    return float(np.min([np.sum(np.asarray(e)) for e in per_dim]))

e_mc = min_ess(mc.samples)
e_nt = min_ess(nt_result.samples[:, nuts_cfg.burn:])
print(f"\ngradient-budget head-to-head (min ESS per 1000 gradients):")
print(f"  MCLMC: {1000 * e_mc / mclmc_grads:.1f}   "
      f"(ESS {e_mc:.0f} / {mclmc_grads:.0f} grads)")
print(f"  NUTS:  {1000 * e_nt / nuts_grads:.1f}   "
      f"(ESS {e_nt:.0f} / {nuts_grads:.0f} grads)")

# --- 3. the exact sibling: MAMS at the same gradient accounting -----------
# MAMS proposes whole isokinetic trajectories and MH-accepts on the
# accumulated energy error — exact where MCLMC carries an O(eps^2) bias.
n_steps = 10
mams_cfg = hamiltorch.MAMSConfig(num_samples=budget(1000, 30),
                                 num_steps_per_sample=n_steps,
                                 burn=budget(200, 10))
ma = hamiltorch.run_mams_chains(jax.random.key(4), lp, jnp.zeros(D) + 0.1,
                                mams_cfg, num_chains=4)
mams_grads = 4 * mams_cfg.num_samples * n_steps * 2
e_ma = min_ess(ma.samples[:, mams_cfg.burn:])
print(f"  MAMS:  {1000 * e_ma / mams_grads:.1f}   "
      f"(ESS {e_ma:.0f} / {mams_grads} grads; exact, acceptance "
      f"{float(np.mean(np.asarray(ma.acc_rate))):.2f})")

# --- 4. mesh-sharded chains ----------------------------------------------
n_dev = len(jax.devices())
if n_dev > 1:
    from hamiltorch_tpu.parallel.sharding import make_mesh, run_mclmc_sharded

    mesh = make_mesh(chains=n_dev, data=1)
    rs = run_mclmc_sharded(jax.random.key(3), lp, jnp.zeros(D) + 0.1,
                           hamiltorch.MCLMCConfig(
                               num_samples=budget(1000, 30),
                               tune_steps=budget(500, 30)),
                           mesh, num_chains=2 * n_dev)
    ps = np.asarray(rs.samples).reshape(-1, D)
    print(f"\nmesh runner: {2 * n_dev} chains over {n_dev} devices, "
          f"worst std error {np.abs(ps.std(0) / np.asarray(STDS) - 1).max():.1%}")
else:
    print(f"\n(one device visible; skip the mesh demo — run under "
          f"XLA_FLAGS=--xla_force_host_platform_device_count=8 to see it)")
