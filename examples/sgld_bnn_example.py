"""Stochastic-gradient MCMC on a regression BNN: MAP warm start, then
SGLD and SGHMC on the split-term protocol, vs exact split HMC.

No reference-notebook counterpart — the reference's minibatch story stops
at symmetric-split HMC (hamiltorch/samplers.py:465-603), which still
touches EVERY batch inside every trajectory.  SG-MCMC takes one minibatch
gradient per step: the same `define_split_model_log_prob` potential feeds
it, so moving a workload between the exact and stochastic regimes is a
runner swap.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch
from hamiltorch_tpu.models.bnn import define_split_model_log_prob


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(100)(x))
        x = jnp.tanh(nn.Dense(100)(x))
        return nn.Dense(1)(x)


rng = np.random.RandomState(0)
x = np.linspace(-1, 1, budget(400, 100))[:, None].astype(np.float32)
y = (np.sin(4 * x) + 0.1 * rng.randn(*x.shape)).astype(np.float32)
tau_out = 100.0

batches = [(x[i::4], y[i::4]) for i in range(4)]
term_fn, m, flat_init, unravel, data = define_split_model_log_prob(
    MLP(), "regression", batches, num_splits=4, tau_out=tau_out,
    verbose=False,
)

# --- MAP warm start (the notebooks' torch-optimizer loop, one call) ---
map_fit = hamiltorch.map_estimate(
    lambda t: term_fn(t, 0, data) + term_fn(t, 1, data)
    + term_fn(t, 2, data) + term_fn(t, 3, data),
    flat_init, num_steps=budget(800, 150), learning_rate=5e-3,
)
print(f"MAP: log_prob {float(map_fit.log_prob):.1f} "
      f"(init {float(map_fit.log_prob_trace[0]):.1f})")


def rmse_of(samples, tail):
    pred, _ = hamiltorch.predict_model(
        MLP(), samples[tail:], x=jnp.asarray(x), y=jnp.asarray(y),
        model_loss="regression", tau_out=tau_out,
    )
    return float(jnp.sqrt(jnp.mean((pred.mean(0) - y) ** 2)))


# --- SGLD: one minibatch gradient per step, thin to 500 kept draws ---
n_sg = budget(5000, 400)
cfg = hamiltorch.SGLDConfig(num_samples=n_sg, step_size=2e-6,
                            thin=budget(10, 4))
t0 = time.perf_counter()
sgld = hamiltorch.run_sgld(
    jax.random.key(1), term_fn, m, map_fit.theta, cfg, data=data
)
_ = float(jnp.sum(sgld.final_theta))  # hard sync
t_sgld = time.perf_counter() - t0
print(f"SGLD   {n_sg} steps: {t_sgld:.1f}s, train RMSE "
      f"{rmse_of(sgld.samples, budget(100, 20)):.3f}, divergent "
      f"{int(np.asarray(sgld.stats.divergent).sum())}")

# --- SGHMC: persistent momentum smooths the gradient noise ---
cfgh = hamiltorch.SGHMCConfig(num_samples=n_sg, step_size=2e-6,
                              thin=budget(10, 4), friction=0.05)
t0 = time.perf_counter()
sghmc = hamiltorch.run_sghmc(
    jax.random.key(2), term_fn, m, map_fit.theta, cfgh, data=data
)
_ = float(jnp.sum(sghmc.final_theta))
t_sghmc = time.perf_counter() - t0
print(f"SGHMC  {n_sg} steps: {t_sghmc:.1f}s, train RMSE "
      f"{rmse_of(sghmc.samples, budget(100, 20)):.3f}, divergent "
      f"{int(np.asarray(sghmc.stats.divergent).sum())}")

# --- exact split HMC on the same potential, for reference ---
params_split = hamiltorch.sample_split_model(
    MLP(), batches, num_splits=4, model_loss="regression",
    num_samples=budget(100, 10), num_steps_per_sample=budget(30, 5),
    step_size=0.0005,
    tau_out=tau_out, key=jax.random.key(3), verbose=False,
    params_init=map_fit.theta,
)
print(f"split HMC (exact, {budget(100, 10)} draws x {budget(30, 5)} x 4 "
      f"batches): train RMSE "
      f"{rmse_of(jnp.asarray(params_split), budget(20, 2)):.3f}")
