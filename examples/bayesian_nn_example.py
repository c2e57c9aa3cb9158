"""Bayesian neural network classification (iris-style).

Port of notebooks/hamiltorch_Bayesian_NN_example.ipynb: a small linear BNN
sampled with HMC and RMHMC, posterior predictive via predict_model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch

hamiltorch.set_random_seed(0)


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(3)(x)  # 4 features -> 3 classes, linear (iris setup)


# iris-like synthetic data: 3 clusters in 4-D
rng = np.random.RandomState(0)
centers = rng.randn(3, 4) * 2.0
x = jnp.asarray(
    np.concatenate([centers[i] + 0.5 * rng.randn(30, 4) for i in range(3)]),
    jnp.float32,
)
y = jnp.asarray(np.repeat(np.arange(3), 30))

tau_list = [1.0, 1.0]  # per-layer prior precision (kernel, bias)

# --- HMC (notebook cell 8: 300 samples, L=20) ---
params_hmc = hamiltorch.sample_model(
    Net(), x, y, model_loss="multi_class_linear_output",
    num_samples=budget(300, 20), num_steps_per_sample=budget(20, 5),
    step_size=0.01,
    tau_out=1.0, tau_list=tau_list, key=jax.random.key(1),
)

pred, log_probs = hamiltorch.predict_model(
    Net(), params_hmc[budget(100, 5):], x=x, y=y,
    model_loss="multi_class_linear_output", tau_out=1.0, tau_list=tau_list,
)
acc = float((pred.mean(0).argmax(-1) == y).mean())
print(f"HMC: posterior-mean train accuracy {acc:.3f}, pred shape {pred.shape}")

# --- implicit RMHMC (cell 13) ---
# Works (verified on v5e: acceptance 0.90, accuracy 0.84) but third-order AD
# through the model is a heavy one-time XLA compile (minutes on
# remote-compile TPU setups); opt in with --rmhmc.
import sys

if "--rmhmc" not in sys.argv:
    print("(skipping implicit RMHMC section; run with --rmhmc to include it)")
    raise SystemExit(0)

params_rm = hamiltorch.sample_model(
    Net(), x, y, model_loss="multi_class_linear_output",
    num_samples=50, num_steps_per_sample=10, step_size=0.02,
    sampler=hamiltorch.Sampler.RMHMC, integrator=hamiltorch.Integrator.IMPLICIT,
    fixed_point_max_iterations=6, fixed_point_threshold=1e-8,
    tau_out=1.0, tau_list=tau_list, key=jax.random.key(2),
)
pred_rm, _ = hamiltorch.predict_model(
    Net(), params_rm[10:], x=x, y=y,
    model_loss="multi_class_linear_output", tau_out=1.0, tau_list=tau_list,
)
print(f"implicit RMHMC: train accuracy {float((pred_rm.mean(0).argmax(-1) == y).mean()):.3f}")
