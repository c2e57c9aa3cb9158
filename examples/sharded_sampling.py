"""Mesh-sharded sampling: chains x data over a device mesh.

Runs anywhere: on a multi-chip TPU slice it uses the real mesh; on CPU it
demonstrates the identical SPMD program on a virtual 8-device mesh
(set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).

The likelihood is sharded over the dataset: each device evaluates its shard
and one psum of (value, gradient) per potential evaluation reconstructs the
exact full-batch log-posterior — full-batch HMC on datasets larger than one
device's memory.
"""

import jax

# _smoke_budget honours a requested JAX_PLATFORMS=cpu even under site hooks
# that force a TPU platform (only jax.config.update wins; see CLAUDE.md).
from _smoke_budget import budget

if len(jax.devices()) == 1:
    print(
        "Only 1 device visible. For the virtual-mesh demo run with:\n"
        "  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "python examples/sharded_sampling.py"
    )
    raise SystemExit(0)

import jax.numpy as jnp
import numpy as np

from hamiltorch_tpu.diagnostics import summary
from hamiltorch_tpu.parallel.sharding import make_mesh, sample_chains_sharded
from hamiltorch_tpu.samplers.driver import MCMCConfig

# Bayesian linear regression, data sharded over 4 devices, chains over 2
rng = np.random.RandomState(0)
n, d = 4096, 8
x = rng.randn(n, d).astype(np.float32)
w_true = rng.randn(d).astype(np.float32)
y = (x @ w_true + 0.1 * rng.randn(n)).astype(np.float32)


def loglik_shard(theta, x_shard, y_shard):
    return -0.5 * 100.0 * jnp.sum((x_shard @ theta - y_shard) ** 2)


def log_prior(theta):
    return -0.5 * jnp.dot(theta, theta)


mesh = make_mesh(chains=2, data=len(jax.devices()) // 2)
print("mesh:", dict(mesh.shape))

config = MCMCConfig(num_samples=budget(500, 80), num_steps_per_sample=10,
                    step_size=0.0008)
result = sample_chains_sharded(
    jax.random.key(0), loglik_shard, log_prior, x, y,
    jnp.zeros(d), config, mesh, num_chains=8,
)
stats = summary(result.samples[:, budget(100, 20):])
err = float(jnp.max(jnp.abs(stats["mean"] - jnp.asarray(w_true))))
print(f"posterior mean vs true weights: max abs error {err:.4f}")
print("split R-hat:", np.asarray(stats["r_hat"]).round(3))
print("acceptance per chain:", np.asarray(result.acc_rate).round(2))
