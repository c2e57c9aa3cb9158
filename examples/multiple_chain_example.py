"""Multi-chain sampling and convergence diagnostics.

Port of notebooks/hamiltorch_multiple_chain_example.ipynb — where the
reference demonstrates a thread pool that is *slower* than sequential, the
TPU-native path is a single vmapped program over the chain axis.
"""

import time

import jax
import jax.numpy as jnp

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch
from hamiltorch_tpu.diagnostics import summary
from hamiltorch_tpu.parallel.chains import multi_chain, setup_chain

hamiltorch.set_random_seed(1)


def log_prob(omega):
    stddev = jnp.array([0.5, 1.0, 2.0])
    return jnp.sum(-0.5 * (omega / stddev) ** 2)


n_draws = budget(400, 60)
kwargs = dict(
    log_prob_func=log_prob, num_samples=n_draws, step_size=0.3,
    num_steps_per_sample=5, verbose=False,
)

# --- reference-style per-seed chains (util.py:385-404 equivalent) ---
prior = lambda key: jax.random.normal(key, (3,))
chain = setup_chain(hamiltorch.sample, prior, kwargs)
t0 = time.time()
results = multi_chain(chain, num_workers=4, seeds=list(range(budget(8, 4))))
print(f"8 sequential chains: {time.time() - t0:.2f}s")

# --- TPU-native: one vmapped program (timed warm: the sequential loop
# above reuses one compiled program 8 times, so a fair comparison gives
# the vmapped program its one compile too) ---
config = hamiltorch.MCMCConfig(num_samples=n_draws, num_steps_per_sample=5,
                               step_size=0.3)
jax.block_until_ready(hamiltorch.run_hmc_chains(
    jax.random.key(0), log_prob, jnp.zeros(3), config, num_chains=8
).samples)
t0 = time.time()
result = hamiltorch.run_hmc_chains(
    jax.random.key(0), log_prob, jnp.zeros(3), config, num_chains=8
)
jax.block_until_ready(result.samples)
print(f"8 vmapped chains  : {time.time() - t0:.2f}s (warm)")

stats = summary(result.samples[:, 50:])
print("posterior std :", stats["std"], "(true [0.5, 1, 2])")
print("ESS           :", stats["ess"])
print("split R-hat   :", stats["r_hat"])
