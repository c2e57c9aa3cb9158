"""Round-3 capabilities: windowed mass warmup for plain HMC and the
torch-bridge escape hatches.

1. ``MCMCConfig(adapt_mass=True)``: Stan-style windowed warmup inside
   plain HMC — on a 400:1 badly scaled Gaussian the warmed-up chain
   recovers both scales while the unit-metric chain cannot move the wide
   direction at all (reference HMC has no mass adaptation anywhere).
2. ``adapt_mass='dense'`` learns the full covariance of a rho=0.95 target.
3. A torch CNN with GroupNorm/adaptive pooling ports through the
   structural bridge unchanged.
4. A torch forward with data-dependent Python control flow — fx-untraceable
   by construction — samples via the concrete ``torch.jit.trace`` fallback
   (``sample_model`` passes ``x`` as the trace example automatically).

Run: python examples/warmup_and_interop_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from _smoke_budget import budget

from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc


def main():
    key = jax.random.key(0)

    # --- 1. windowed diagonal warmup on a badly scaled Gaussian -----------
    scales = jnp.array([0.05, 20.0])
    lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
    n_hmc, b_hmc = budget(1500, 200), budget(700, 100)
    base = dict(num_samples=n_hmc, step_size=0.5, burn=b_hmc,
                num_steps_per_sample=8)
    r_plain = run_hmc(key, lp, jnp.zeros(2), MCMCConfig(**base))
    r_warm = run_hmc(key, lp, jnp.zeros(2), MCMCConfig(**base, adapt_mass=True))
    tail = (n_hmc + b_hmc) // 2
    print("badly scaled Gaussian, true stds [0.05, 20]:")
    print("  fixed unit metric :", np.asarray(r_plain.samples[tail:]).std(0).round(3),
          " <- wide direction frozen")
    print("  adapt_mass=True   :", np.asarray(r_warm.samples[tail:]).std(0).round(3))
    print("  learned inv_mass  :", np.asarray(r_warm.final_warm[1]).round(4),
          " (~ the marginal variances)")

    # --- 2. dense warmup learns correlation -------------------------------
    rho = 0.95
    prec = jnp.linalg.inv(jnp.array([[1.0, rho], [rho, 1.0]]))
    lp_corr = lambda t: -0.5 * t @ prec @ t
    r_dense = run_hmc(
        key, lp_corr, jnp.zeros(2),
        MCMCConfig(num_samples=n_hmc, step_size=0.2, burn=b_hmc,
                   num_steps_per_sample=8, adapt_mass="dense",
                   adapt_step_size=True),
    )
    inv = np.asarray(r_dense.final_warm[1][0])
    print(f"\nrho={rho} Gaussian, adapt_mass='dense':")
    print("  learned metric correlation:",
          round(float(inv[0, 1] / np.sqrt(inv[0, 0] * inv[1, 1])), 3))

    # --- 3 + 4. torch bridge ----------------------------------------------
    try:
        import torch
    except ImportError:
        print("\n(torch not installed; skipping the bridge sections)")
        return
    from hamiltorch_tpu.models.bnn import predict_model, sample_model

    torch.manual_seed(5)
    rs = np.random.RandomState(5)

    cnn = torch.nn.Sequential(
        torch.nn.Conv1d(1, 4, 3, padding=1), torch.nn.GroupNorm(2, 4),
        torch.nn.Hardswish(), torch.nn.AdaptiveAvgPool1d(2),
        torch.nn.Flatten(), torch.nn.Linear(8, 2),
    ).eval()
    x = rs.randn(24, 1, 8).astype(np.float32)
    ylab = (x.sum((1, 2)) > 0).astype(np.int64)
    samples = sample_model(
        cnn, jnp.asarray(x), jnp.asarray(ylab),
        model_loss="multi_class_linear_output", num_samples=budget(150, 12),
        num_steps_per_sample=budget(10, 3), step_size=0.01,
        key=jax.random.key(2),
        verbose=False,
    )
    preds, _ = predict_model(
        cnn, samples[budget(50, 3):], x=jnp.asarray(x), y=jnp.asarray(ylab),
        model_loss="multi_class_linear_output",
    )
    acc = float(jnp.mean(preds.mean(0).argmax(-1) == jnp.asarray(ylab)))
    print("\nGroupNorm CNN through the structural bridge: train acc =", acc)

    class Gated(torch.nn.Module):
        """Data-dependent branch: the reference executes it eagerly; here
        torch.jit.trace freezes the branch taken on the example input."""

        def __init__(self):
            super().__init__()
            self.l = torch.nn.Linear(2, 1)

        def forward(self, x):
            h = self.l(x)
            if h.abs().sum() >= 0:  # fx-untraceable
                return h
            return h * 2.0

    xg = rs.randn(32, 2).astype(np.float32)
    w = np.array([1.5, -0.8], np.float32)
    yg = (xg @ w[:, None] + 0.05 * rs.randn(32, 1)).astype(np.float32)
    sg = sample_model(
        Gated().eval(), jnp.asarray(xg), jnp.asarray(yg),
        model_loss="regression", num_samples=budget(150, 12),
        num_steps_per_sample=budget(10, 3),
        step_size=0.002, tau_out=100.0, key=jax.random.key(3), verbose=False,
    )
    post = np.asarray(sg[budget(50, 3):]).mean(0)
    print("concrete-trace forward, posterior weights:", post[:2].round(3),
          "(true", w, ")")


if __name__ == "__main__":
    main()
