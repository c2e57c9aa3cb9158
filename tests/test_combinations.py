"""Combination matrix: the parity API across samplers x integrators x mass
forms, tiny budgets — catches cross-feature breakage no focused test hits."""

import jax.numpy as jnp
import numpy as np
import pytest

import hamiltorch_tpu as ht


def lp(theta):
    return -0.5 * jnp.dot(theta, theta)


MASSES = {
    "none": None,
    "diag": jnp.array([0.5, 2.0]),
    "dense": jnp.array([[1.0, 0.2], [0.2, 1.0]]),
    "blocks": [jnp.eye(1), jnp.array([[2.0]])],
}


@pytest.mark.slow
class TestSampleCombinations:
    @pytest.mark.parametrize("mass_name", list(MASSES))
    @pytest.mark.parametrize(
        "sampler,extra",
        [
            (ht.Sampler.HMC, {}),
            (ht.Sampler.HMC_NUTS, {"burn": 5}),
            (ht.Sampler.NUTS, {"burn": 5}),
        ],
    )
    def test_hmc_family_all_masses(self, key, sampler, extra, mass_name):
        samples = ht.sample(
            lp, jnp.zeros(2), num_samples=12, num_steps_per_sample=3,
            step_size=0.2, sampler=sampler, inv_mass=MASSES[mass_name],
            key=key, verbose=False, **extra,
        )
        assert bool(jnp.all(jnp.isfinite(samples)))

    @pytest.mark.parametrize(
        "integrator", [ht.Integrator.IMPLICIT, ht.Integrator.EXPLICIT]
    )
    @pytest.mark.parametrize("metric", list(ht.Metric))
    def test_rmhmc_metric_matrix(self, key, integrator, metric):
        samples = ht.sample(
            lp, 0.5 * jnp.ones(2), num_samples=8, num_steps_per_sample=3,
            step_size=0.1, sampler=ht.Sampler.RMHMC, integrator=integrator,
            metric=metric, jitter=0.1, softabs_const=1e2,
            fixed_point_max_iterations=4, fixed_point_threshold=1e-6,
            key=key, verbose=False,
        )
        assert bool(jnp.all(jnp.isfinite(samples)))

    @pytest.mark.parametrize(
        "integrator",
        [ht.Integrator.SPLITTING, ht.Integrator.SPLITTING_RAND,
         ht.Integrator.SPLITTING_KMID],
    )
    @pytest.mark.parametrize("mass_name", ["none", "diag", "dense"])
    def test_splitting_mass_matrix(self, key, integrator, mass_name):
        fns = [lambda t: -0.25 * jnp.dot(t, t)] * 2
        samples = ht.sample(
            fns, jnp.zeros(2), num_samples=10, num_steps_per_sample=3,
            step_size=0.2, integrator=integrator, inv_mass=MASSES[mass_name],
            key=key, verbose=False,
        )
        assert bool(jnp.all(jnp.isfinite(samples)))

    @pytest.mark.parametrize("burn", [-1, 0, 5])
    def test_burn_variants(self, key, burn):
        samples = ht.sample(
            lp, jnp.zeros(2), num_samples=10, step_size=0.2, burn=burn,
            key=key, verbose=False,
        )
        expected = 1 + max(0, 10 - burn - 1)
        assert samples.shape == (expected, 2)

    def test_num_samples_one(self, key):
        samples = ht.sample(
            lp, jnp.zeros(2), num_samples=1, step_size=0.2, key=key, verbose=False
        )
        assert samples.shape == (1, 2)  # init only; draw 0 not stored (n > burn=0)
