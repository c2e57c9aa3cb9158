"""Tempered-SMC tests: analytic evidence, posterior moments, multimodal
coverage, and the pytree particle path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.smc import (
    SMCConfig,
    run_smc,
    smc_posterior_sample,
)


def gaussian_setup(d=3, lam=4.0):
    """Prior N(0, I_d), likelihood exp(-0.5 * lam * ||theta||^2):
    posterior N(0, I/(1+lam)), log Z = -d/2 * log(1 + lam) exactly."""

    def log_prior(t):
        return -0.5 * jnp.sum(t**2) - 0.5 * d * jnp.log(2 * jnp.pi)

    def log_lik(t):
        return -0.5 * lam * jnp.sum(t**2)

    def prior_sample(key, n):
        return jax.random.normal(key, (n, d))

    log_z_true = -0.5 * d * np.log(1.0 + lam)
    post_std = 1.0 / np.sqrt(1.0 + lam)
    return log_prior, log_lik, prior_sample, log_z_true, post_std


class TestSMCEvidence:
    def test_gaussian_log_evidence_and_moments(self, key):
        """The headline capability: log Z matches the analytic value (no
        MCMC chain in this framework or the reference can produce it)."""
        log_prior, log_lik, prior_sample, log_z_true, post_std = gaussian_setup()
        cfg = SMCConfig(num_particles=2048, num_temps=25, mcmc_steps=5,
                        leapfrog_steps=8, step_size=0.5)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        assert np.isfinite(float(r.log_evidence))
        np.testing.assert_allclose(float(r.log_evidence), log_z_true,
                                   atol=0.15)
        draws = np.asarray(smc_posterior_sample(jax.random.key(9), r))
        np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.05)
        np.testing.assert_allclose(draws.std(0), post_std, rtol=0.12)

    @pytest.mark.slow
    def test_evidence_pooled_over_seeds(self, key):
        """Median over independent runs tightens the estimator (SMC logZ
        has a small negative bias at finite N; pooled it must sit within
        a tenth of a nat here)."""
        log_prior, log_lik, prior_sample, log_z_true, _ = gaussian_setup(
            d=2, lam=9.0)
        cfg = SMCConfig(num_particles=1024, num_temps=25, mcmc_steps=4,
                        leapfrog_steps=8, step_size=0.4)
        zs = [
            float(run_smc(k, log_prior, log_lik, prior_sample, cfg).log_evidence)
            for k in jax.random.split(key, 4)
        ]
        np.testing.assert_allclose(np.median(zs), log_z_true, atol=0.1)

    def test_data_operand_plumbs_through(self, key):
        """Large datasets ride as jit operands (the _raw_fn convention)."""
        x = jnp.linspace(-1, 1, 50)[:, None]
        y = 2.0 * x[:, 0]

        def log_prior(t):
            return -0.5 * jnp.sum(t**2)

        def log_lik(t, data):
            x_, y_ = data
            return -0.5 * 25.0 * jnp.sum((x_[:, 0] * t[0] - y_) ** 2)

        cfg = SMCConfig(num_particles=512, num_temps=15, mcmc_steps=4,
                        leapfrog_steps=6, step_size=0.1)
        r = run_smc(key, log_prior, log_lik,
                    lambda k, n: jax.random.normal(k, (n, 1)), cfg,
                    data=(x, y))
        draws = np.asarray(smc_posterior_sample(jax.random.key(1), r))
        # posterior concentrates on the true slope 2.0
        assert abs(draws.mean() - 2.0) < 0.1


class TestSMCMultimodal:
    @pytest.mark.slow
    def test_bimodal_mode_weights(self, key):
        """SMC keeps BOTH modes with their correct mass — the hot early
        stages are nearly the prior, so the population never collapses
        into one basin the way a single HMC chain does."""

        def log_prior(t):
            return -0.5 * jnp.sum((t / 6.0) ** 2)

        def log_lik(t):
            # 2:1 mixture at +-3 once tempered in
            return jnp.logaddexp(
                jnp.log(2.0 / 3.0) - 0.5 * jnp.sum(((t - 3.0) / 0.4) ** 2),
                jnp.log(1.0 / 3.0) - 0.5 * jnp.sum(((t + 3.0) / 0.4) ** 2),
            )

        cfg = SMCConfig(num_particles=4096, num_temps=30, mcmc_steps=5,
                        leapfrog_steps=8, step_size=0.3)
        r = run_smc(key, log_prior, log_lik,
                    lambda k, n: 6.0 * jax.random.normal(k, (n, 1)), cfg)
        draws = np.asarray(smc_posterior_sample(jax.random.key(3), r)).ravel()
        frac_right = float((draws > 0).mean())
        assert 0.55 < frac_right < 0.78, frac_right  # true mass 2/3
        assert abs(draws[draws > 0].mean() - 3.0) < 0.15
        assert abs(draws[draws < 0].mean() + 3.0) < 0.2


class TestSMCPytree:
    def test_single_leaf_tree_matches_flat_bitwise(self, key):
        def log_prior_f(t):
            return -0.5 * jnp.sum(t**2)

        def log_lik_f(t):
            return -1.0 * jnp.sum(t**2)

        cfg = SMCConfig(num_particles=256, num_temps=10, mcmc_steps=3,
                        leapfrog_steps=5, step_size=0.4)
        r_flat = run_smc(key, log_prior_f, log_lik_f,
                         lambda k, n: jax.random.normal(k, (n, 2)), cfg)
        r_tree = run_smc(
            key, lambda t: log_prior_f(t["x"]), lambda t: log_lik_f(t["x"]),
            lambda k, n: {"x": jax.random.normal(k, (n, 2))}, cfg,
        )
        np.testing.assert_array_equal(
            np.asarray(r_tree.particles["x"]), np.asarray(r_flat.particles)
        )
        np.testing.assert_array_equal(
            float(r_tree.log_evidence), float(r_flat.log_evidence)
        )

    def test_multi_leaf_tree_shapes_and_evidence(self, key):
        lam = 4.0

        def log_prior(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2)) \
                - 0.5 * 3 * jnp.log(2 * jnp.pi)

        def log_lik(t):
            return -0.5 * lam * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2))

        def prior_sample(k, n):
            k1, k2 = jax.random.split(k)
            return {"a": jax.random.normal(k1, (n, 1)),
                    "b": jax.random.normal(k2, (n, 2, 1))}

        cfg = SMCConfig(num_particles=2048, num_temps=25, mcmc_steps=5,
                        leapfrog_steps=8, step_size=0.5)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        assert r.particles["a"].shape == (2048, 1)
        assert r.particles["b"].shape == (2048, 2, 1)
        np.testing.assert_allclose(
            float(r.log_evidence), -0.5 * 3 * np.log(1 + lam), atol=0.15
        )

    def test_bad_prior_sample_shape_rejected(self, key):
        cfg = SMCConfig(num_particles=64, num_temps=5)
        with pytest.raises(ValueError, match="num_particles"):
            run_smc(key, lambda t: -jnp.sum(t**2), lambda t: -jnp.sum(t**2),
                    lambda k, n: jax.random.normal(k, (32, 2)), cfg)


class TestSMCMechanics:
    def test_resampling_triggers_and_never_mode(self, key):
        log_prior, log_lik, prior_sample, _, _ = gaussian_setup(d=2, lam=9.0)
        cfg = SMCConfig(num_particles=256, num_temps=12, mcmc_steps=3,
                        leapfrog_steps=5, step_size=0.4)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        assert bool(np.asarray(r.info.resampled).any())
        import dataclasses

        r0 = run_smc(key, log_prior, log_lik, prior_sample,
                     dataclasses.replace(cfg, resample_threshold=0.0))
        assert not bool(np.asarray(r0.info.resampled).any())
        # weights then carry the full degeneracy but stay normalised
        np.testing.assert_allclose(
            float(jax.scipy.special.logsumexp(r0.log_weights)), 0.0, atol=1e-4
        )

    def test_step_size_adapts_toward_target(self, key):
        log_prior, log_lik, prior_sample, _, _ = gaussian_setup(d=3, lam=24.0)
        cfg = SMCConfig(num_particles=512, num_temps=25, mcmc_steps=4,
                        leapfrog_steps=8, step_size=2.0)  # far too big
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        acc = np.asarray(r.info.accept_prob)
        eps = np.asarray(r.info.step_size)
        assert eps[-1] < 0.5 * eps[0]  # shrank from the bad seed
        assert acc[-5:].mean() > 0.4  # late-stage acceptance recovered

    def test_config_validation(self):
        with pytest.raises(ValueError):
            SMCConfig(num_particles=1)
        with pytest.raises(ValueError):
            SMCConfig(num_particles=8, resample_threshold=1.5)
        with pytest.raises(ValueError):
            SMCConfig(num_particles=8, step_size=0.0)
        with pytest.raises(ValueError, match="mcmc_steps"):
            SMCConfig(num_particles=8, mcmc_steps=0)
        with pytest.raises(ValueError, match="leapfrog_steps"):
            SMCConfig(num_particles=8, leapfrog_steps=0)
        with pytest.raises(ValueError, match="temp_power"):
            SMCConfig(num_particles=8, temp_power=0.0)
        with pytest.raises(ValueError, match="desired_accept_rate"):
            SMCConfig(num_particles=8, desired_accept_rate=1.0)

    def test_default_path_has_constant_trajectory_info(self, key):
        """adapt_trajectory defaults off: info.trajectory_length rides at
        T0 = step_size * leapfrog_steps / 2 for every stage (and the
        randint-jittered mutation lengths are untouched)."""
        log_prior, log_lik, prior_sample, _, _ = gaussian_setup(d=2, lam=4.0)
        cfg = SMCConfig(num_particles=64, num_temps=6, mcmc_steps=2,
                        leapfrog_steps=4, step_size=0.3)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        ts = np.asarray(r.info.trajectory_length)
        np.testing.assert_allclose(ts, 0.3 * 4 / 2, rtol=1e-6)

    def test_info_step_size_is_the_one_used(self, key):
        """info.step_size[k] is the eps stage k's mutations ran with — the
        first entry equals the configured seed value, not its
        post-adaptation update."""
        log_prior, log_lik, prior_sample, _, _ = gaussian_setup(d=2, lam=4.0)
        cfg = SMCConfig(num_particles=64, num_temps=6, mcmc_steps=2,
                        leapfrog_steps=4, step_size=0.3)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        assert float(r.info.step_size[0]) == pytest.approx(0.3)


class TestChEESSMC:
    """ChEES-SMC (arXiv:2504.02627): the ChEES criterion adapts the
    mutation trajectory time inside the SMC sampler, with the particle
    population as the chain ensemble."""

    def test_trajectory_adapts_and_estimates_hold(self, key):
        log_prior, log_lik, prior_sample, log_z_true, post_std = \
            gaussian_setup()
        cfg = SMCConfig(num_particles=2048, num_temps=25, mcmc_steps=5,
                        leapfrog_steps=16, step_size=0.5,
                        adapt_trajectory=True)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        ts = np.asarray(r.info.trajectory_length)
        assert ts.shape == (25,)
        # stage 0 mutates at the seed T0 = eps * L / 2
        assert float(ts[0]) == pytest.approx(0.5 * 16 / 2)
        assert not np.allclose(ts, ts[0])  # the criterion moved T
        assert np.all(ts > 0) and np.all(np.isfinite(ts))
        # estimator quality is preserved under adaptation
        np.testing.assert_allclose(float(r.log_evidence), log_z_true,
                                   atol=0.15)
        draws = np.asarray(smc_posterior_sample(jax.random.key(9), r))
        np.testing.assert_allclose(draws.std(0), post_std, rtol=0.12)

    def test_grows_trajectories_seeded_too_short(self, key):
        """Seed T far below the target scale: the ChEES gradient must push
        trajectories longer (the criterion rewards proposals that move
        squared distance from the population centre)."""
        log_prior, log_lik, prior_sample, _, _ = gaussian_setup(d=3, lam=4.0)
        cfg = SMCConfig(num_particles=1024, num_temps=30, mcmc_steps=5,
                        leapfrog_steps=32, step_size=0.1,
                        adapt_trajectory=True, init_trajectory_length=0.05)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        ts = np.asarray(r.info.trajectory_length)
        assert ts[-1] > 3.0 * ts[0], ts
        # and T respects the [eps, eps * L] sanity clip
        eps = np.asarray(r.info.step_size)
        assert np.all(ts[1:] <= eps[:-1].max() * cfg.leapfrog_steps * 1.01)

    def test_pytree_particles_adapt_too(self, key):
        lam = 4.0

        def log_prior(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2)) \
                - 0.5 * 3 * jnp.log(2 * jnp.pi)

        def log_lik(t):
            return -0.5 * lam * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2))

        def prior_sample(k, n):
            k1, k2 = jax.random.split(k)
            return {"a": jax.random.normal(k1, (n, 1)),
                    "b": jax.random.normal(k2, (n, 2, 1))}

        cfg = SMCConfig(num_particles=2048, num_temps=25, mcmc_steps=5,
                        leapfrog_steps=16, step_size=0.5,
                        adapt_trajectory=True)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        ts = np.asarray(r.info.trajectory_length)
        assert not np.allclose(ts, ts[0])
        np.testing.assert_allclose(
            float(r.log_evidence), -0.5 * 3 * np.log(1 + lam), atol=0.15
        )

    def test_config_validation(self):
        with pytest.raises(ValueError, match="init_trajectory_length"):
            SMCConfig(num_particles=8, init_trajectory_length=0.0)
        with pytest.raises(ValueError, match="adam_lr"):
            SMCConfig(num_particles=8, adam_lr=0.0)
