"""Elliptical slice sampling tests: analytic Gaussian-posterior exactness,
the BNN prior/likelihood-split integration, resume bit-exactness, pytree
states with per-leaf prior scales, support handling, ArviZ export, and
validation.

No reference counterpart — ESS (Murray, Adams & MacKay 2010) is the
standard tuning-free, gradient-free sampler for Gaussian-prior models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.elliptical import (
    EllipticalConfig,
    run_elliptical,
    run_elliptical_chains,
)


class TestStatistics:
    @pytest.mark.slow
    def test_analytic_gaussian_posterior(self, key):
        """N(0, 1) prior x N(1, 0.5^2) likelihood per dim: the posterior
        is analytic (mean 0.8, var 0.2) — pooled chains must hit it."""
        ll = lambda t: -0.5 * jnp.sum(((t - 1.0) / 0.5) ** 2)
        r = run_elliptical_chains(key, ll, jnp.zeros(3),
                                  EllipticalConfig(num_samples=3000),
                                  num_chains=4)
        s = np.asarray(r.samples[:, 500:]).reshape(-1, 3)
        np.testing.assert_allclose(s.mean(0), 0.8, atol=0.05)
        np.testing.assert_allclose(s.var(0), 0.2, atol=0.03)
        # the shrink loop stays in its textbook 1-3 band
        assert 0.5 < float(np.asarray(r.stats.shrinks, float).mean()) < 5.0
        assert not bool(np.asarray(r.stats.divergent).any())

    @pytest.mark.slow
    def test_diag_and_dense_prior_scales(self, key):
        """(D,) stds and the equivalent (D, D) Cholesky factor target the
        identical posterior."""
        stds = jnp.array([0.5, 2.0])
        ll = lambda t: -0.5 * jnp.sum((t - 1.0) ** 2)
        cfg = EllipticalConfig(num_samples=4000)
        r_diag = run_elliptical_chains(key, ll, jnp.zeros(2), cfg,
                                       num_chains=4, prior_scale=stds)
        r_dense = run_elliptical_chains(key, ll, jnp.zeros(2), cfg,
                                        num_chains=4,
                                        prior_scale=jnp.diag(stds))
        a = np.asarray(r_diag.samples[:, 500:]).reshape(-1, 2)
        b = np.asarray(r_dense.samples[:, 500:]).reshape(-1, 2)
        # diag draw (scale * z) and dense draw (diag(scale) @ z) round
        # differently; compare the posteriors statistically
        np.testing.assert_allclose(a.mean(0), b.mean(0), atol=0.05)
        np.testing.assert_allclose(a.var(0), b.var(0), rtol=0.12)
        # analytic check for the first dim: var = (1/s^2 + 1)^-1
        v0 = 1.0 / (1.0 / 0.25 + 1.0)
        np.testing.assert_allclose(a.var(0)[0], v0, rtol=0.12)

    @pytest.mark.slow
    def test_bnn_prior_lik_split(self, key):
        """The models.define_model_prior_and_lik split feeds ESS directly:
        a small flax-free regression BNN sampled WITHOUT gradients gives
        predictions agreeing with pytree NUTS on the same model."""
        from hamiltorch_tpu.models.bnn import define_model_prior_and_lik

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(32, 1).astype(np.float32))
        y = jnp.asarray((np.sin(3 * np.asarray(x)) + 0.05
                         * rng.randn(32, 1)).astype(np.float32))

        def apply_fn(params, xb):
            h = jnp.tanh(xb @ params["w1"] + params["b1"])
            return h @ params["w2"] + params["b2"]

        template = {
            "w1": jnp.zeros((1, 16)), "b1": jnp.zeros((16,)),
            "w2": jnp.zeros((16, 1)), "b2": jnp.zeros((1,)),
        }
        log_prior, log_lik, prior_sample, tmpl = define_model_prior_and_lik(
            apply_fn, "regression", x, y, tau_out=100.0,
            params_template=template,
        )
        # per-leaf prior std 1/sqrt(tau)=1 (default tau_list of ones)
        r = run_elliptical(key, log_lik, tmpl,
                           EllipticalConfig(num_samples=2000),
                           prior_scale=1.0)
        preds = jax.vmap(lambda p: apply_fn(p, x))(
            jax.tree_util.tree_map(lambda l: l[1000:], r.samples)
        )
        rmse = float(jnp.sqrt(jnp.mean((preds.mean(0) - y) ** 2)))
        assert rmse < 0.25, rmse


class TestMechanics:
    def test_resume_bit_exact(self, key):
        ll = lambda t: -0.5 * jnp.sum(((t - 1.0) / 0.5) ** 2)
        cfg = EllipticalConfig(num_samples=200)
        full = run_elliptical(key, ll, jnp.zeros(3), cfg)
        import dataclasses

        c1 = run_elliptical(key, ll, jnp.zeros(3),
                            dataclasses.replace(cfg, num_samples=120))
        c2 = run_elliptical(key, ll, c1.final_theta,
                            dataclasses.replace(cfg, num_samples=80),
                            init_loglik=c1.final_loglik,
                            start_step=int(c1.final_step))
        cat = jnp.concatenate([c1.samples, c2.samples])
        assert jnp.array_equal(cat, full.samples)

    def test_thin(self, key):
        ll = lambda t: -0.5 * jnp.sum((t - 1.0) ** 2)
        cfg = EllipticalConfig(num_samples=120)
        full = run_elliptical(key, ll, jnp.zeros(3), cfg)
        import dataclasses

        thinned = run_elliptical(key, ll, jnp.zeros(3),
                                 dataclasses.replace(cfg, thin=2))
        assert thinned.samples.shape == (60, 3)
        assert jnp.array_equal(thinned.samples, full.samples[1::2])

    def test_pytree_per_leaf_scales(self, key):
        tree0 = {"a": jnp.zeros((2,)), "b": jnp.zeros(())}
        ll = lambda t: -0.5 * (jnp.sum((t["a"] - 1.0) ** 2)
                               + (t["b"] + 1.0) ** 2)
        r = run_elliptical(key, ll, tree0,
                           EllipticalConfig(num_samples=1500),
                           prior_scale={"a": 1.0, "b": 3.0})
        assert r.samples["a"].shape == (1500, 2)
        # b has a nearly-flat prior (std 3): posterior mean near the
        # likelihood's -1; a's posterior mean = 0.5 (unit prior x unit lik)
        np.testing.assert_allclose(
            np.asarray(r.samples["b"][300:]).mean(), -0.9, atol=0.25
        )
        np.testing.assert_allclose(
            np.asarray(r.samples["a"][300:]).mean(0), 0.5, atol=0.15
        )

    def test_prior_mean(self, key):
        """A nonzero prior mean shifts the ellipse center: with a flat
        likelihood the chain samples the prior itself."""
        ll = lambda t: jnp.zeros(())
        r = run_elliptical(key, ll, jnp.zeros(2),
                           EllipticalConfig(num_samples=2000),
                           prior_scale=0.5, prior_mean=jnp.array([2.0, -1.0]))
        s = np.asarray(r.samples[300:])
        np.testing.assert_allclose(s.mean(0), [2.0, -1.0], atol=0.1)
        np.testing.assert_allclose(s.std(0), 0.5, rtol=0.15)

    def test_hard_support_auto_shrinks(self, key):
        """-inf / NaN likelihood outside a hard support: proposals there
        shrink away; the chain stays inside and never diverges."""

        def ll(t):
            return jnp.where(jnp.all(t > 0.0), -0.5 * jnp.sum(t**2),
                             -jnp.inf)

        r = run_elliptical(key, ll, jnp.full((2,), 0.5),
                           EllipticalConfig(num_samples=500))
        s = np.asarray(r.samples)
        assert (s > 0).all()
        assert not bool(np.asarray(r.stats.divergent).any())

    def test_chains_distinct(self, key):
        ll = lambda t: -0.5 * jnp.sum((t - 1.0) ** 2)
        r = run_elliptical_chains(key, ll, jnp.zeros(3),
                                  EllipticalConfig(num_samples=40),
                                  num_chains=2)
        assert r.samples.shape == (2, 40, 3)
        assert not jnp.array_equal(r.samples[0], r.samples[1])


class TestValidation:
    def test_bad_config(self):
        with pytest.raises(ValueError, match="num_samples"):
            EllipticalConfig(num_samples=0)
        with pytest.raises(ValueError, match="divisible"):
            EllipticalConfig(num_samples=10, thin=3)
        with pytest.raises(ValueError, match="max_shrink"):
            EllipticalConfig(num_samples=10, max_shrink=0)

    def test_bad_scale_shape(self, key):
        ll = lambda t: -0.5 * jnp.sum(t**2)
        with pytest.raises(ValueError, match="prior_scale"):
            run_elliptical(key, ll, jnp.zeros(3),
                           EllipticalConfig(num_samples=5),
                           prior_scale=jnp.zeros((2, 2, 2)))

    def test_matrix_theta_rejected(self, key):
        ll = lambda t: -0.5 * jnp.sum(t**2)
        with pytest.raises(ValueError, match="1-d"):
            run_elliptical(key, ll, jnp.zeros((4, 3)),
                           EllipticalConfig(num_samples=5))


class TestArviz:
    def test_inference_dict(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict

        ll = lambda t: -0.5 * jnp.sum((t - 1.0) ** 2)
        r = run_elliptical_chains(key, ll, jnp.zeros(3),
                                  EllipticalConfig(num_samples=30),
                                  num_chains=3)
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (3, 30, 3)
        assert d["sample_stats"]["n_shrinks"].shape == (3, 30)
        assert d["sample_stats"]["loglik"].shape == (3, 30)
        assert d["sample_stats"]["diverging"].shape == (3, 30)
