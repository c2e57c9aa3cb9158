"""Convolutional BNN classification (the reference's CNN model family).

The reference's make_functional machinery exists largely to support conv
nets (hamiltorch/util.py:262-316 patches Conv/BatchNorm methods); here a
flax CNN — or a torch Sequential CNN via the interop bridge — drops
straight into sample_model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch


class ConvNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # x: (N, 8, 8, 1)
        x = nn.Conv(4, (3, 3))(x)
        x = nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(3)(x)


# synthetic 8x8 images: 3 classes with distinct spatial patterns
rng = np.random.RandomState(0)
templates = rng.randn(3, 8, 8, 1).astype(np.float32)
n_img = budget(120, 48)
labels = rng.randint(0, 3, n_img)
x = jnp.asarray(templates[labels]
                + 0.4 * rng.randn(n_img, 8, 8, 1).astype(np.float32))
y = jnp.asarray(labels)

samples = hamiltorch.sample_model(
    ConvNet(), x, y, model_loss="multi_class_linear_output",
    num_samples=budget(200, 12), num_steps_per_sample=budget(15, 5),
    step_size=0.003, key=jax.random.key(0), verbose=False,
)
preds, _ = hamiltorch.predict_model(
    ConvNet(), samples[budget(50, 3):], x=x, y=y,
    model_loss="multi_class_linear_output",
)
acc = float((preds.mean(0).argmax(-1) == y).mean())
print(f"CNN BNN: {samples.shape[1]:,} params, posterior-mean train accuracy {acc:.3f}")

# the same family through the torch interop bridge
try:
    import torch

    tnet = torch.nn.Sequential(
        torch.nn.Conv2d(1, 4, 3, padding=1), torch.nn.ReLU(),
        torch.nn.AvgPool2d(2), torch.nn.Flatten(), torch.nn.Linear(4 * 4 * 4, 3),
    )
    x_nchw = jnp.transpose(x, (0, 3, 1, 2))
    s2 = hamiltorch.sample_model(
        tnet, x_nchw, y, model_loss="multi_class_linear_output",
        num_samples=budget(100, 8), num_steps_per_sample=budget(10, 3),
        step_size=0.003, key=jax.random.key(1), verbose=False,
    )
    print(f"torch Conv2d via interop: sampled {s2.shape[0]} draws of {s2.shape[1]:,} params")
except ImportError:
    pass
