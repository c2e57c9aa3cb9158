"""Multimodal sampling + modern convergence diagnostics, end to end.

TPU-native capabilities with no reference counterpart (the reference's only
observability is a progress bar and an acceptance print):

1. A well-separated Gaussian mixture defeats plain HMC (one mode, R-hat
   looks "converged" per chain but rank-normalized R-hat across chains
   flags it).
2. Ensemble parallel tempering (``run_pt_chains``) crosses the barrier —
   E independent ladders run as one vmapped scan.
3. Dense-metric NUTS (``adapt_mass='dense'``) handles strong correlation
   with ~2-3x shorter trajectories than the diagonal metric.
4. ``diagnostics.summary`` reports ESS (raw/bulk/tail), classic + rank-
   normalized split-R-hat, and the MCSE of the mean (Vehtari et al. 2021).

Run: python examples/multimodal_diagnostics_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from _smoke_budget import budget

from hamiltorch_tpu.diagnostics import summary
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc_chains
from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts
from hamiltorch_tpu.samplers.tempering import PTConfig, run_pt_chains


def mixture_log_prob(t):
    """Two unit Gaussians at +/- (3, 3): a ~9-sigma barrier."""
    return jnp.logaddexp(
        -0.5 * jnp.sum((t - 3.0) ** 2), -0.5 * jnp.sum((t + 3.0) ** 2)
    )


def main():
    key = jax.random.key(0)

    # --- 1. plain HMC: each chain is trapped in its starting mode ---------
    cfg = MCMCConfig(num_samples=budget(1000, 100), num_steps_per_sample=8,
                     step_size=0.25)
    starts = jnp.asarray([[3.0, 3.0], [3.0, 3.0], [-3.0, -3.0], [-3.0, -3.0]])
    r = run_hmc_chains(key, mixture_log_prob, starts, cfg, num_chains=4)
    s = summary(r.samples)
    print("plain HMC on the mixture (chains started in both modes):")
    print("  r_hat_rank =", np.round(np.asarray(s["r_hat_rank"]), 2).tolist(),
          " <- far above 1.01: chains never mixed between modes")

    # --- 2. ensemble parallel tempering crosses the barrier ---------------
    pt_cfg = PTConfig(num_samples=budget(1500, 150), num_steps_per_sample=8,
                      step_size=0.25, num_temps=budget(6, 4), max_temp=60.0,
                      burn=budget(300, 40), adapt_ladder=True)
    rp = run_pt_chains(key, mixture_log_prob, jnp.zeros(2), pt_cfg,
                       num_ensembles=4)
    sp = summary(rp.samples)
    frac = np.asarray((rp.samples[..., 0] > 0).mean(axis=1))
    print("\nensemble parallel tempering (4 ladders x 6 replicas):")
    print("  per-ensemble positive-mode fraction =", np.round(frac, 2).tolist())
    print("  r_hat_rank =", np.round(np.asarray(sp["r_hat_rank"]), 3).tolist())
    print("  ess_bulk   =", np.round(np.asarray(sp["ess_bulk"]), 0).tolist())
    print("  adapted ladder (ensemble 0, betas) =",
          np.round(np.asarray(rp.info.betas[0]), 4).tolist())

    # --- 3. dense-metric NUTS on a strongly correlated Gaussian -----------
    cov = 0.95 * jnp.ones((4, 4)) + 0.05 * jnp.eye(4)
    prec = jnp.linalg.inv(cov)
    corr_lp = lambda t: -0.5 * t @ prec @ t
    n_nuts, b_nuts = budget(1200, 150), budget(500, 60)
    rd, infod = run_nuts(key, corr_lp, jnp.zeros(4),
                         NUTSConfig(num_samples=n_nuts, step_size=0.2,
                                    burn=b_nuts, adapt_mass="dense"))
    rg, infog = run_nuts(key, corr_lp, jnp.zeros(4),
                         NUTSConfig(num_samples=n_nuts, step_size=0.2,
                                    burn=b_nuts, adapt_mass=True))
    ld = float(jnp.mean(infod.num_leapfrogs[b_nuts:]))
    lg = float(jnp.mean(infog.num_leapfrogs[b_nuts:]))
    print("\ndense vs diagonal metric on a rho=0.95 Gaussian:")
    print(f"  leapfrogs/draw: dense={ld:.1f}  diag={lg:.1f}"
          f"  ({lg / ld:.1f}x fewer gradient evaluations)")
    _, metric, _ = rd.final_warm
    ic = np.asarray(metric[0])
    corr = ic[0, 1] / np.sqrt(ic[0, 0] * ic[1, 1])
    print(f"  learned metric correlation = {corr:.3f} (target 0.95)")


if __name__ == "__main__":
    main()
