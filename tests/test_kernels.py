"""Pallas fused-HMC kernel tests.

Statistical tests need the real on-core PRNG and only run on TPU
(pltpu.InterpretParams' CPU emulation returns constant random bits, so
interpret mode covers shapes/lowering only).  The TPU statistics were
verified on hardware: 1024 chains x 400 draws on the diag([0.5,1,2]^-2)
Gaussian recover stds [0.468, 0.997, 2.003] at 0.99 acceptance,
~597M chain-draws/sec (326x the scan path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.kernels.gaussian_hmc import gaussian_hmc

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU


class TestKernelLowering:
    def test_shapes_and_finiteness(self):
        prec = jnp.array([4.0, 1.0, 0.25])
        samples, acc = gaussian_hmc(
            0, jnp.zeros((16, 3)), prec, num_samples=20, num_steps=5,
            step_size=0.3, interpret=INTERPRET,
        )
        assert samples.shape == (16, 20, 3)
        assert acc.shape == (16,)
        assert bool(jnp.all(jnp.isfinite(samples)))

    def test_dense_precision_lowering(self):
        cov = np.array([[1.0, 0.6], [0.6, 1.0]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov))
        samples, _ = gaussian_hmc(
            3, jnp.zeros((8, 2)), prec, num_samples=10, num_steps=4,
            step_size=0.25, interpret=INTERPRET,
        )
        assert samples.shape == (8, 10, 2)
        assert bool(jnp.all(jnp.isfinite(samples)))


@pytest.mark.skipif(not ON_TPU, reason="on-core PRNG requires real TPU")
class TestKernelStatistics:
    def test_diagonal_precision_moments(self):
        # trajectory time 6*0.2=1.2 avoids the t ~ pi*sigma resonance of the
        # sigma=0.5 dim that t=1.5 sits on (slow variance convergence)
        prec = jnp.array([4.0, 1.0, 0.25])
        samples, acc = gaussian_hmc(
            0, jnp.zeros((256, 3)), prec, num_samples=600, num_steps=6, step_size=0.2
        )
        s = np.asarray(samples[:, 150:]).reshape(-1, 3)
        np.testing.assert_allclose(s.mean(0), np.zeros(3), atol=0.1)
        np.testing.assert_allclose(s.std(0), [0.5, 1.0, 2.0], rtol=0.1)
        assert float(acc.mean()) > 0.8

    def test_dense_precision_moments(self):
        # eigen-stds are 1.265 and 0.632: trajectory time 6*0.2=1.2 keeps
        # both rotation angles well off pi (t=2.0 would sit exactly on the
        # fast mode's pi*sigma=1.99 resonance, where the momentum refresh
        # contributes ~sin(pi)=0 and the mode never mixes)
        cov = np.array([[1.0, 0.6], [0.6, 1.0]], np.float32)
        prec = jnp.asarray(np.linalg.inv(cov))
        samples, acc = gaussian_hmc(
            3, jnp.zeros((64, 2)), prec, num_samples=500, num_steps=6, step_size=0.2
        )
        s = np.asarray(samples[:, 100:]).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(s.T), cov, atol=0.12)

    def test_chains_differ_and_deterministic(self):
        prec = jnp.ones(3)
        s1, _ = gaussian_hmc(7, jnp.zeros((16, 3)), prec, 50, 5, 0.3)
        s2, _ = gaussian_hmc(7, jnp.zeros((16, 3)), prec, 50, 5, 0.3)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        assert not np.allclose(np.asarray(s1[0]), np.asarray(s1[1]))


class TestKernelMean:
    def test_nonzero_mean_lowering(self):
        prec = jnp.array([1.0, 4.0])
        mean = jnp.array([3.0, -2.0])
        samples, _ = gaussian_hmc(
            0, jnp.zeros((8, 2)) + mean, prec, num_samples=20, num_steps=5,
            step_size=0.3, interpret=INTERPRET, mean=mean,
        )
        assert samples.shape == (8, 20, 2)
        assert bool(jnp.all(jnp.isfinite(samples)))


@pytest.mark.skipif(not ON_TPU, reason="on-core PRNG requires real TPU")
class TestKernelMeanStatistics:
    def test_mean_recovery(self):
        prec = jnp.array([1.0, 4.0])
        mean = jnp.array([3.0, -2.0])
        samples, acc = gaussian_hmc(
            0, jnp.zeros((64, 2)) + mean, prec, num_samples=400,
            num_steps=5, step_size=0.3, mean=mean,
        )
        s = np.asarray(samples[:, 100:]).reshape(-1, 2)
        np.testing.assert_allclose(s.mean(0), np.asarray(mean), atol=0.1)
