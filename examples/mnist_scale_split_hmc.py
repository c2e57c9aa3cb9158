"""MNIST-scale split HMC (BASELINE.json config 5).

A 784 -> 256 -> 10 classification BNN (~203k parameters) on MNIST-shaped
synthetic data, sampled with symmetric-split minibatch HMC — the workload
class where the reference drops to ~1.8 samples/sec (BASELINE.md).  The
stacked-minibatch splitting integrator keeps every kick a full-width MXU
matmul.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(256)(x))
        return nn.Dense(10)(x)


# MNIST-shaped synthetic data: 10 classes, 6000 images of 784 pixels
rng = np.random.RandomState(0)
n_img = budget(6000, 600)
prototypes = rng.randn(10, 784).astype(np.float32)
labels = rng.randint(0, 10, n_img)
x = (prototypes[labels] + 0.5 * rng.randn(n_img, 784)).astype(np.float32)

num_splits = budget(6, 3)
batches = [
    (x[i::num_splits], labels[i::num_splits].astype(np.float32))
    for i in range(num_splits)
]

# The parity entry point (one-line port of the reference's
# sample_split_model call):
n_draws = budget(100, 6)
samples = hamiltorch.sample_split_model(
    Net(), batches, num_splits=num_splits,
    model_loss="multi_class_linear_output",
    num_samples=n_draws, num_steps_per_sample=budget(10, 3), step_size=2e-4,
    tau_out=1.0, key=jax.random.key(0), verbose=False,
)
print(f"split HMC, {samples.shape[1]:,}-param BNN, {num_splits} splits of "
      f"{x.shape[0] // num_splits} images")

n_eval = budget(1000, 200)
preds, _ = hamiltorch.predict_model(
    Net(), samples[budget(20, 2):], x=jnp.asarray(x[:n_eval]),
    y=jnp.asarray(labels[:n_eval]),
    model_loss="multi_class_linear_output",
)
acc = float((preds.mean(0).argmax(-1) == jnp.asarray(labels[:n_eval])).mean())
print(f"  posterior-mean accuracy on {n_eval} train images: {acc:.3f}")

# --- steady-state timing, flat vs pytree chain state ----------------------
# Timing rules that matter on the remote TPU service: build each potential
# factory ONCE (a fresh closure per call is a fresh jit key -> recompile
# every run), and sync by FETCHING a device-reduced scalar (the client's
# block_until_ready was observed returning before some programs finished).
# Big-model minibatch splitting is exactly where the no-flat-tax pytree
# state pays: each kick's per-leaf gradients land directly on the momentum
# leaves instead of round-tripping through a 203k-element concat/slice.
from hamiltorch_tpu.models.bnn import (
    define_split_model_log_prob,
    define_split_model_tree_log_prob,
)
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.splitting import run_split_hmc_stacked

cfg = MCMCConfig(num_samples=n_draws, num_steps_per_sample=budget(10, 3),
                 step_size=2e-4)
nonce = int(time.time_ns() % (1 << 30))  # defeat the service result cache

term_flat, m_terms, flat0, _, data_f = define_split_model_log_prob(
    Net(), "multi_class_linear_output", batches, num_splits, verbose=False,
)
term_tree, _, template, data_t = define_split_model_tree_log_prob(
    Net(), "multi_class_linear_output", batches, num_splits, verbose=False,
)

def steady(run_once):
    run_once(nonce)  # compile + warm up
    times = []
    for rep in range(budget(3, 1)):
        t0 = time.perf_counter()
        run_once(nonce + rep + 1)
        times.append(time.perf_counter() - t0)
    return n_draws / float(np.median(times))

def run_flat(seed):
    r = run_split_hmc_stacked(jax.random.key(seed), term_flat, m_terms,
                              flat0, cfg, data=data_f)
    float(jnp.sum(r.samples[-1]))  # hard sync

def run_tree(seed):
    r = run_split_hmc_stacked(jax.random.key(seed), term_tree, m_terms,
                              template, cfg, data=data_t)
    for l in jax.tree_util.tree_leaves(r.samples):
        float(jnp.sum(l[-1]))

rate_flat = steady(run_flat)
rate_tree = steady(run_tree)
print(f"  flat chain state:   {rate_flat:.1f} samples/sec steady-state "
      f"(reference anchor: ~1.8/s on a 10k-param BNN)")
print(f"  pytree chain state: {rate_tree:.1f} samples/sec steady-state "
      f"({rate_tree / rate_flat:.2f}x — no per-kick ravel/unravel)")
