"""Symmetric-split minibatch HMC on a regression BNN.

Port of notebooks/hamiltorch_split_HMC_BNN_example.ipynb: full-batch HMC vs
the three splitting schemes on a 1 -> 100 -> 100 -> 1 regression MLP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch

hamiltorch.set_random_seed(0)


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(100)(x))
        x = jnp.tanh(nn.Dense(100)(x))
        return nn.Dense(1)(x)


rng = np.random.RandomState(0)
x = np.linspace(-1, 1, 400)[:, None].astype(np.float32)
y = (np.sin(4 * x) + 0.1 * rng.randn(*x.shape)).astype(np.float32)
tau_out = 100.0

# --- full-batch HMC (notebook cell 14) ---
params_full = hamiltorch.sample_model(
    MLP(), jnp.asarray(x), jnp.asarray(y), model_loss="regression",
    num_samples=budget(200, 12), num_steps_per_sample=budget(30, 5),
    step_size=0.0005,
    tau_out=tau_out, key=jax.random.key(0),
)
pred_full, _ = hamiltorch.predict_model(
    MLP(), params_full[budget(50, 3):], x=jnp.asarray(x), y=jnp.asarray(y),
    model_loss="regression", tau_out=tau_out,
)
rmse = float(jnp.sqrt(jnp.mean((pred_full.mean(0) - y) ** 2)))
print(f"full-batch HMC: train RMSE {rmse:.3f}")

# --- split HMC, batches of 100 (cells 25/30/35) ---
batches = [(x[i::4], y[i::4]) for i in range(4)]
for integ in (
    hamiltorch.Integrator.SPLITTING,
    hamiltorch.Integrator.SPLITTING_RAND,
    hamiltorch.Integrator.SPLITTING_KMID,
):
    params_split = hamiltorch.sample_split_model(
        MLP(), batches, num_splits=4, model_loss="regression",
        num_samples=budget(100, 8), num_steps_per_sample=budget(30, 5),
        step_size=0.0005,
        integrator=integ, tau_out=tau_out, key=jax.random.key(1),
        verbose=False,
    )
    pred, _ = hamiltorch.predict_model(
        MLP(), params_split[budget(20, 2):], x=jnp.asarray(x), y=jnp.asarray(y),
        model_loss="regression", tau_out=tau_out,
    )
    rmse = float(jnp.sqrt(jnp.mean((pred.mean(0) - y) ** 2)))
    print(f"{integ.name:15s}: train RMSE {rmse:.3f}")
