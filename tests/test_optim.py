"""MAP estimation tests: analytic optimum, pytree states, the BNN
potential's operand protocol, non-finite rejection, and warm-started
sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.optim import map_estimate

MU = jnp.array([1.0, -2.0, 0.5])
S2 = jnp.array([0.5, 1.0, 2.0])


def log_prob(t):
    return -0.5 * jnp.sum((t - MU) ** 2 / S2)


class TestMAP:
    def test_gaussian_map_is_mean(self):
        r = map_estimate(log_prob, jnp.zeros(3), num_steps=500,
                         learning_rate=0.05)
        np.testing.assert_allclose(np.asarray(r.theta), np.asarray(MU),
                                   atol=1e-3)
        assert float(r.log_prob) > -1e-5
        assert int(r.num_rejected) == 0
        assert r.log_prob_trace.shape == (500,)
        # trace ascends overall
        assert float(r.log_prob_trace[-1]) > float(r.log_prob_trace[0])

    def test_pytree_theta(self):
        def lp(t):
            return -0.5 * (
                jnp.sum((t["a"] - 1.0) ** 2) + jnp.sum((t["b"] + 2.0) ** 2)
            )

        r = map_estimate(lp, {"a": jnp.zeros(()), "b": jnp.zeros(2)},
                         num_steps=400, learning_rate=0.05)
        assert abs(float(r.theta["a"]) - 1.0) < 1e-3
        np.testing.assert_allclose(np.asarray(r.theta["b"]), [-2.0, -2.0],
                                   atol=1e-3)

    def test_custom_optimizer(self):
        optax = pytest.importorskip("optax")
        r = map_estimate(log_prob, jnp.zeros(3), num_steps=2000,
                         optimizer=optax.sgd(0.05))
        np.testing.assert_allclose(np.asarray(r.theta), np.asarray(MU),
                                   atol=1e-3)

    def test_bnn_potential_operand_protocol(self):
        """define_model_log_prob potentials carry _raw_fn/_data; the fit
        must route the dataset as a jit operand and improve the posterior
        density."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.bnn import define_model_log_prob

        torch.manual_seed(0)
        net = torch.nn.Sequential(torch.nn.Linear(2, 8), torch.nn.Tanh(),
                                  torch.nn.Linear(8, 1))
        x = torch.randn(32, 2)
        y = torch.randn(32, 1)
        lp, flat0, _ = define_model_log_prob(net, "regression", x, y)
        r = map_estimate(lp, flat0, num_steps=300, learning_rate=1e-2)
        assert float(r.log_prob) > float(r.log_prob_trace[0])
        assert bool(np.isfinite(np.asarray(r.theta)).all())

    def test_nonfinite_steps_rejected_best_kept(self):
        """A cliff beyond |t| > 1 produces non-finite values; the best
        iterate stays finite and the rejection counter reports."""

        def cliff(t):
            return jnp.where(
                jnp.max(jnp.abs(t)) < 1.0,
                -0.5 * jnp.sum((t - 0.9) ** 2),
                jnp.asarray(jnp.nan),
            )

        r = map_estimate(cliff, jnp.zeros(2), num_steps=200,
                         learning_rate=0.2)
        assert bool(np.isfinite(np.asarray(r.theta)).all())
        assert bool(np.isfinite(float(r.log_prob)))

    def test_warm_start_sampling(self, key):
        """The round trip the notebooks do by hand: MAP fit, then sample
        from the optimum."""
        from hamiltorch_tpu.samplers import MCMCConfig, run_hmc

        r = map_estimate(log_prob, jnp.zeros(3), num_steps=300,
                         learning_rate=0.05)
        cfg = MCMCConfig(num_samples=200, num_steps_per_sample=5,
                         step_size=0.3)
        out = run_hmc(key, log_prob, r.theta, cfg)
        assert bool(np.isfinite(np.asarray(out.samples)).all())
        # chain starts at the mode: no burn needed for a sane mean
        np.testing.assert_allclose(
            np.asarray(out.samples).mean(0), np.asarray(MU), atol=0.5
        )

    def test_validation(self):
        with pytest.raises(ValueError, match="num_steps"):
            map_estimate(log_prob, jnp.zeros(3), num_steps=0)


class TestLaplace:
    def test_gaussian_is_exact(self):
        """For a Gaussian target the Laplace approximation is exact:
        cov = diag(S2) and log_evidence = sum 0.5 log(2 pi s2)."""
        from hamiltorch_tpu.optim import laplace_approx, laplace_sample

        r = map_estimate(log_prob, jnp.zeros(3), num_steps=500,
                         learning_rate=0.05)
        lap = laplace_approx(log_prob, r.theta)
        np.testing.assert_allclose(np.asarray(lap.cov),
                                   np.diag(np.asarray(S2)), atol=1e-3)
        log_z_true = float(np.sum(0.5 * np.log(2 * np.pi * np.asarray(S2))))
        np.testing.assert_allclose(float(lap.log_evidence), log_z_true,
                                   atol=1e-3)
        draws = laplace_sample(jax.random.PRNGKey(0), lap, 4000)
        np.testing.assert_allclose(draws.mean(0), np.asarray(MU), atol=0.1)
        np.testing.assert_allclose(draws.std(0), np.sqrt(np.asarray(S2)),
                                   rtol=0.1)

    def test_evidence_matches_smc(self, key):
        """Laplace and SMC estimate the SAME quantity on a Gaussian
        model: log Z from two entirely different algorithms agree."""
        from hamiltorch_tpu.optim import laplace_approx
        from hamiltorch_tpu.samplers.smc import SMCConfig, run_smc

        d, lam = 3, 4.0

        def log_prior(t):
            return -0.5 * jnp.sum(t**2) - 0.5 * d * jnp.log(2 * jnp.pi)

        def log_lik(t):
            return -0.5 * lam * jnp.sum(t**2)

        log_z_true = -0.5 * d * np.log(1.0 + lam)
        lap = laplace_approx(lambda t: log_prior(t) + log_lik(t), jnp.zeros(d))
        np.testing.assert_allclose(float(lap.log_evidence), log_z_true,
                                   atol=1e-4)
        cfg = SMCConfig(num_particles=1024, num_temps=20, mcmc_steps=4,
                        leapfrog_steps=6, step_size=0.4)
        smc = run_smc(key, log_prior, log_lik,
                      lambda k, n: jax.random.normal(k, (n, d)), cfg)
        np.testing.assert_allclose(float(smc.log_evidence),
                                   float(lap.log_evidence), atol=0.15)

    def test_pytree_mode_and_draws(self):
        from hamiltorch_tpu.optim import laplace_approx, laplace_sample

        def lp(t):
            return -0.5 * (
                jnp.sum((t["a"] - 1.0) ** 2) + jnp.sum(4.0 * (t["b"] + 2.0) ** 2)
            )

        mode = {"a": jnp.ones(()), "b": -2.0 * jnp.ones(2)}
        lap = laplace_approx(lp, mode)
        assert lap.cov.shape == (3, 3)
        draws = laplace_sample(jax.random.PRNGKey(1), lap, 1000)
        assert draws["a"].shape == (1000,)
        assert draws["b"].shape == (1000, 2)
        np.testing.assert_allclose(float(draws["b"].std()), 0.5, rtol=0.15)

    def test_indefinite_hessian_clipped(self):
        """A saddle (negative curvature direction) still yields a PD
        covariance and finite evidence."""
        from hamiltorch_tpu.optim import laplace_approx

        lp = lambda t: -0.5 * t[0] ** 2 + 0.5 * t[1] ** 2  # saddle at 0
        lap = laplace_approx(lp, jnp.zeros(2))
        eigs = np.linalg.eigvalsh(np.asarray(lap.cov))
        assert (eigs > 0).all()
        assert bool(np.isfinite(float(lap.log_evidence)))

    def test_advi_exact_on_diagonal_gaussian(self, key):
        """Mean-field VI is exact for a diagonal Gaussian: the fit
        recovers (MU, sqrt(S2)) and the ELBO converges to log Z."""
        from hamiltorch_tpu.optim import advi, advi_sample

        r = advi(log_prob, jnp.zeros(3), num_steps=3000, learning_rate=0.02,
                 num_mc_samples=8, key=key)
        np.testing.assert_allclose(np.asarray(r.mean), np.asarray(MU),
                                   atol=0.1)
        np.testing.assert_allclose(np.exp(np.asarray(r.log_std)),
                                   np.sqrt(np.asarray(S2)), rtol=0.15)
        log_z_true = float(np.sum(0.5 * np.log(2 * np.pi * np.asarray(S2))))
        np.testing.assert_allclose(float(r.elbo), log_z_true, atol=0.2)
        draws = advi_sample(jax.random.PRNGKey(2), r, 2000)
        np.testing.assert_allclose(draws.mean(0), np.asarray(MU), atol=0.15)

    def test_advi_pytree_and_mass_seed(self, key):
        """Pytree fit; exp(2 log_std) seeds a diagonal inv_mass."""
        from hamiltorch_tpu.optim import advi, advi_sample
        from hamiltorch_tpu.samplers import MCMCConfig, run_hmc

        def lp(t):
            return -0.5 * (
                jnp.sum((t["a"] - 1.0) ** 2 / 0.25)
                + jnp.sum((t["b"] + 2.0) ** 2 / 4.0)
            )

        t0 = {"a": jnp.zeros(()), "b": jnp.zeros(2)}
        r = advi(lp, t0, num_steps=3000, learning_rate=0.02,
                 num_mc_samples=8, key=key)
        draws = advi_sample(jax.random.PRNGKey(3), r, 500)
        assert draws["a"].shape == (500,)
        assert draws["b"].shape == (500, 2)
        inv_mass = jnp.exp(2.0 * r.log_std)
        np.testing.assert_allclose(np.asarray(inv_mass),
                                   [0.25, 4.0, 4.0], rtol=0.35)
        out = run_hmc(key, lp, r.unravel(r.mean),
                      MCMCConfig(num_samples=100, num_steps_per_sample=5,
                                 step_size=0.3),
                      inv_mass={"a": inv_mass[0], "b": inv_mass[1:]})
        assert bool(np.isfinite(np.asarray(out.samples["a"])).all())

    def test_fullrank_advi_exact_on_correlated_gaussian(self, key):
        """Full-rank VI is exact for ANY Gaussian: L L^T recovers the full
        covariance of a rho=0.8 target, where the mean-field fit cannot
        represent the off-diagonal at all (and its marginal variances
        shrink toward the conditional ones)."""
        from hamiltorch_tpu.optim import advi, advi_cov, advi_sample

        rho = 0.8
        cov = np.array([[1.0, rho], [rho, 1.0]])
        prec = jnp.asarray(np.linalg.inv(cov).astype(np.float32))
        mu = jnp.array([1.0, -1.0])
        lp = lambda t: -0.5 * (t - mu) @ prec @ (t - mu)

        r = advi(lp, jnp.zeros(2), num_steps=4000, learning_rate=0.02,
                 num_mc_samples=8, key=key, method="fullrank")
        assert r.scale_tril is not None and r.scale_tril.shape == (2, 2)
        fit_cov = np.asarray(advi_cov(r))
        np.testing.assert_allclose(fit_cov, cov, atol=0.15)
        np.testing.assert_allclose(np.asarray(r.mean), np.asarray(mu),
                                   atol=0.1)
        # its ELBO beats the mean-field fit's (KL gap of the diagonal q)
        r_mf = advi(lp, jnp.zeros(2), num_steps=4000, learning_rate=0.02,
                    num_mc_samples=8, key=key)
        assert float(r.elbo) > float(r_mf.elbo) + 0.1
        # draws carry the correlation; dense cov seeds an inv_mass
        draws = np.asarray(advi_sample(jax.random.PRNGKey(5), r, 4000))
        emp = np.cov(draws.T)
        np.testing.assert_allclose(emp, cov, atol=0.2)

    def test_fullrank_dense_mass_seed(self, key):
        """advi_cov(fullrank) as the dense inv_mass of an HMC run."""
        from hamiltorch_tpu.optim import advi, advi_cov
        from hamiltorch_tpu.samplers import MCMCConfig, run_hmc

        prec = jnp.asarray(
            np.linalg.inv([[1.0, 0.9], [0.9, 1.0]]).astype(np.float32)
        )
        lp = lambda t: -0.5 * t @ prec @ t
        r = advi(lp, jnp.zeros(2), num_steps=3000, learning_rate=0.02,
                 num_mc_samples=8, key=key, method="fullrank")
        out = run_hmc(key, lp, r.mean,
                      MCMCConfig(num_samples=300, num_steps_per_sample=5,
                                 step_size=0.5),
                      inv_mass=advi_cov(r))
        assert float(jnp.mean(out.stats.accepted)) > 0.6

    def test_advi_validation(self):
        from hamiltorch_tpu.optim import advi

        with pytest.raises(ValueError, match="num_steps"):
            advi(log_prob, jnp.zeros(3), num_steps=0)
        with pytest.raises(ValueError, match="num_mc_samples"):
            advi(log_prob, jnp.zeros(3), num_mc_samples=0)
        with pytest.raises(ValueError, match="method"):
            advi(log_prob, jnp.zeros(3), method="structured")

    def test_warm_start_dense_mass(self, key):
        """The production loop: MAP -> Laplace cov -> dense inv_mass HMC
        on a correlated Gaussian."""
        from hamiltorch_tpu.optim import laplace_approx
        from hamiltorch_tpu.samplers import MCMCConfig, run_hmc

        prec = jnp.asarray([[2.0, 1.8], [1.8, 2.0]])  # rho = 0.9
        lp = lambda t: -0.5 * t @ prec @ t
        r = map_estimate(lp, jnp.ones(2), num_steps=300, learning_rate=0.1)
        lap = laplace_approx(lp, r.theta)
        cfg = MCMCConfig(num_samples=500, num_steps_per_sample=5,
                         step_size=0.5)
        out = run_hmc(key, lp, r.theta, cfg, inv_mass=lap.cov)
        cov_emp = np.cov(np.asarray(out.samples[100:]).T)
        np.testing.assert_allclose(cov_emp, np.asarray(lap.cov), atol=0.35)
