"""Parallel-tempering tests: mode hopping a plain HMC chain cannot do."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc
from hamiltorch_tpu.samplers.tempering import PTConfig, run_parallel_tempering


def bimodal_logprob(theta):
    """Mixture of N(-4, 0.5^2) and N(+4, 0.5^2), equal weights, 1-D-per-dim."""
    lp1 = -0.5 * jnp.sum(((theta + 4.0) / 0.5) ** 2)
    lp2 = -0.5 * jnp.sum(((theta - 4.0) / 0.5) ** 2)
    return jnp.logaddexp(lp1, lp2)


class TestParallelTempering:
    def test_mode_hopping(self, key):
        """Plain HMC started in one mode stays there; PT visits both."""
        cfg_hmc = MCMCConfig(num_samples=2000, num_steps_per_sample=10, step_size=0.1)
        r_hmc = run_hmc(key, bimodal_logprob, jnp.full(1, -4.0), cfg_hmc)
        hmc_frac_right = float((np.asarray(r_hmc.samples[:, 0]) > 0).mean())
        assert hmc_frac_right < 0.01  # trapped in the left mode

        cfg_pt = PTConfig(num_samples=4000, num_steps_per_sample=10,
                          step_size=0.1, num_temps=8, max_temp=50.0)
        r_pt = run_parallel_tempering(key, bimodal_logprob, jnp.full(1, -4.0), cfg_pt)
        cold = np.asarray(r_pt.samples[500:, 0])
        frac_right = float((cold > 0).mean())
        assert 0.2 < frac_right < 0.8  # both modes visited
        # modes in the right places
        assert abs(cold[cold > 0].mean() - 4.0) < 0.3
        assert abs(cold[cold < 0].mean() + 4.0) < 0.3

    def test_swaps_occur(self, key):
        cfg = PTConfig(num_samples=500, num_steps_per_sample=5, step_size=0.1,
                       num_temps=6, max_temp=20.0)
        r = run_parallel_tempering(key, bimodal_logprob, jnp.zeros(1), cfg)
        swap_rate = float(np.asarray(r.info.swap_accept).mean())
        assert swap_rate > 0.05
        assert r.replica_samples.shape == (500, 6, 1)
        np.testing.assert_allclose(float(r.info.betas[0]), 1.0)
        np.testing.assert_allclose(float(r.info.betas[-1]), 1 / 20.0, rtol=1e-5)

    def test_unimodal_moments_still_correct(self, key):
        """Exchange moves must preserve the cold chain's stationary dist."""
        lp = lambda t: -0.5 * jnp.dot(t, t)
        cfg = PTConfig(num_samples=3000, num_steps_per_sample=10, step_size=0.25,
                       num_temps=4, max_temp=10.0)
        r = run_parallel_tempering(key, lp, jnp.zeros(2), cfg)
        cold = np.asarray(r.samples[500:])
        np.testing.assert_allclose(cold.mean(0), [0, 0], atol=0.12)
        np.testing.assert_allclose(cold.std(0), [1, 1], atol=0.12)
