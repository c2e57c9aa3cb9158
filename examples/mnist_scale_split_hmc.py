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

import hamiltorch_tpu as hamiltorch


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(256)(x))
        return nn.Dense(10)(x)


# MNIST-shaped synthetic data: 10 classes, 6000 images of 784 pixels
rng = np.random.RandomState(0)
prototypes = rng.randn(10, 784).astype(np.float32)
labels = rng.randint(0, 10, 6000)
x = (prototypes[labels] + 0.5 * rng.randn(6000, 784)).astype(np.float32)

num_splits = 6
batches = [
    (x[i::num_splits], labels[i::num_splits].astype(np.float32))
    for i in range(num_splits)
]

def run(key):
    return hamiltorch.sample_split_model(
        Net(), batches, num_splits=num_splits,
        model_loss="multi_class_linear_output",
        num_samples=100, num_steps_per_sample=10, step_size=2e-4,
        tau_out=1.0, key=key, verbose=False,
    )

samples = jax.block_until_ready(run(jax.random.key(0)))  # compile + warm up
t0 = time.time()
samples = jax.block_until_ready(run(jax.random.key(1)))
dt = time.time() - t0
print(f"split HMC, {samples.shape[1]:,}-param BNN, {num_splits} splits of "
      f"{x.shape[0] // num_splits} images:")
print(f"  {100 / dt:.1f} samples/sec steady-state "
      f"(reference anchor: ~1.8 samples/sec on a 10k-param BNN)")

preds, _ = hamiltorch.predict_model(
    Net(), samples[20:], x=jnp.asarray(x[:1000]), y=jnp.asarray(labels[:1000]),
    model_loss="multi_class_linear_output",
)
acc = float((preds.mean(0).argmax(-1) == jnp.asarray(labels[:1000])).mean())
print(f"  posterior-mean accuracy on 1000 train images: {acc:.3f}")
