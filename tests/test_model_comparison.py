"""WAIC / PSIS-LOO tests against analytic leave-one-out ground truth.

The conjugate Gaussian-mean model admits EXACT leave-one-out predictive
densities, so psis_loo/waic are validated against closed forms, not just
against each other.  (No reference counterpart — the reference offers no
model-comparison machinery.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.model_comparison import (
    compare,
    pointwise_log_lik,
    pointwise_log_lik_from_predictions,
    psis_loo,
    waic,
)

RNG = np.random.default_rng(7)
N_OBS = 40
Y_OBS = (0.7 + RNG.normal(size=N_OBS)).astype(np.float32)


def _posterior(y):
    """mu ~ N(0,1), y_i ~ N(mu, 1): posterior N(s/(n+1), 1/(n+1))."""
    n = len(y)
    return y.sum() / (n + 1), 1.0 / (n + 1)


def _exact_loo_elpd(y):
    """log p(y_i | y_{-i}) = log N(y_i; m_{-i}, v_{-i} + 1) exactly."""
    out = []
    for i in range(len(y)):
        y_rest = np.delete(y, i)
        m, v = _posterior(y_rest)
        var = v + 1.0
        out.append(-0.5 * np.log(2 * np.pi * var) - 0.5 * (y[i] - m) ** 2 / var)
    return np.array(out)


def _loglik_matrix(y, num_draws=20000, seed=0):
    m, v = _posterior(y)
    mus = m + np.sqrt(v) * np.random.default_rng(seed).normal(size=num_draws)
    ll = -0.5 * np.log(2 * np.pi) - 0.5 * (y[None, :] - mus[:, None]) ** 2
    return jnp.asarray(ll.astype(np.float64))


class TestAgainstExactLOO:
    def test_psis_loo_matches_analytic(self):
        ll = _loglik_matrix(Y_OBS)
        r = psis_loo(ll)
        exact = _exact_loo_elpd(Y_OBS)
        np.testing.assert_allclose(r.pointwise, exact, atol=0.01)
        assert abs(r.elpd - exact.sum()) < 0.15
        # well-specified model, plenty of draws: every k comfortably < 0.7
        assert (r.pareto_k < 0.7).all()
        # p_eff ~ the one free parameter
        assert 0.5 < r.p_eff < 2.0

    def test_waic_matches_loo_and_analytic(self):
        ll = _loglik_matrix(Y_OBS)
        r_w, r_l = waic(ll), psis_loo(ll)
        exact = _exact_loo_elpd(Y_OBS).sum()
        assert abs(r_w.elpd - exact) < 0.2
        assert abs(r_w.elpd - r_l.elpd) < 0.1
        assert 0.5 < r_w.p_eff < 2.0
        assert r_w.se == pytest.approx(r_l.se, rel=0.2)

    def test_compare_ranks_the_true_model_first(self):
        ll_good = _loglik_matrix(Y_OBS)
        # a mis-specified rival: fixed mean far from the data
        mus_bad = -2.0 + 0.05 * np.random.default_rng(1).normal(size=2000)
        ll_bad = jnp.asarray(
            -0.5 * np.log(2 * np.pi)
            - 0.5 * (Y_OBS[None, :] - mus_bad[:, None]) ** 2
        )
        rows = compare({"good": psis_loo(ll_good), "bad": psis_loo(ll_bad)})
        assert rows[0]["name"] == "good"
        assert rows[0]["d_elpd"] == 0.0
        assert rows[1]["d_elpd"] > 10.0
        # the gap is many paired SEs wide
        assert rows[1]["d_elpd"] > 4 * rows[1]["d_se"]

    def test_compare_rejects_mismatched_n(self):
        r1 = waic(_loglik_matrix(Y_OBS))
        r2 = waic(_loglik_matrix(Y_OBS[:10]))
        with pytest.raises(ValueError, match="same observations"):
            compare({"a": r1, "b": r2})


class TestMatrixBuilders:
    def test_pointwise_log_lik_blocked_matches_full(self, key):
        samples = jax.random.normal(key, (64, 3))
        x = jnp.linspace(-1, 1, 11)[:, None]
        y = 0.5 * x[:, 0]

        def ll(t, data):
            xx, yy = data
            pred = xx[:, 0] * t[0] + t[1]
            return -0.5 * (yy - pred) ** 2 * jnp.exp(t[2])

        full = pointwise_log_lik(ll, samples, data=(x, y))
        blocked = pointwise_log_lik(ll, samples, data=(x, y), block_size=16)
        assert full.shape == (64, 11)
        # lax.map and vmap fuse differently: tiny f32 reassociation diffs
        np.testing.assert_allclose(np.asarray(full), np.asarray(blocked),
                                   rtol=1e-5, atol=1e-4)
        with pytest.raises(ValueError, match="block_size"):
            pointwise_log_lik(ll, samples, data=(x, y), block_size=7)

    def test_regression_branch_sums_to_zoo_plus_constant(self, key):
        """Summing the pointwise regression matrix over observations equals
        the sampling-time log_likelihood up to the (documented) Gaussian
        normalisation constant."""
        from hamiltorch_tpu.models.bnn import log_likelihood

        preds = jax.random.normal(key, (5, 12, 2))
        y = jax.random.normal(jax.random.fold_in(key, 1), (12, 2))
        tau = 2.5
        mat = pointwise_log_lik_from_predictions(preds, y, "regression", tau)
        assert mat.shape == (5, 12)
        const = 0.5 * 2 * (np.log(tau) - np.log(2 * np.pi)) * 12
        for s in range(5):
            zoo = float(log_likelihood(preds[s], y, "regression", tau))
            assert float(mat[s].sum()) == pytest.approx(zoo + const, rel=1e-5)

    def test_multiclass_branch_matches_zoo_exactly(self, key):
        from hamiltorch_tpu.models.bnn import log_likelihood

        logits = jax.random.normal(key, (4, 9, 3))
        labels = jnp.asarray(np.random.default_rng(2).integers(0, 3, size=9))
        mat = pointwise_log_lik_from_predictions(
            logits, labels, "multi_class_linear_output", 1.0
        )
        for s in range(4):
            zoo = float(
                log_likelihood(logits[s], labels, "multi_class_linear_output", 1.0)
            )
            assert float(mat[s].sum()) == pytest.approx(zoo, rel=1e-5)

    def test_bce_branch_matches_zoo_exactly(self, key):
        from hamiltorch_tpu.models.bnn import log_likelihood

        z = jax.random.normal(key, (3, 7, 1))
        t = (jax.random.uniform(jax.random.fold_in(key, 3), (7, 1)) > 0.5
             ).astype(jnp.float32)
        mat = pointwise_log_lik_from_predictions(
            z, t, "binary_class_linear_output", 1.5
        )
        for s in range(3):
            zoo = float(
                log_likelihood(z[s], t, "binary_class_linear_output", 1.5)
            )
            assert float(mat[s].sum()) == pytest.approx(zoo, rel=1e-5)


class TestDiagnostics:
    def test_gpd_fit_recovers_shape(self):
        """The Zhang-Stephens fit recovers (k, sigma) from exact GPD
        quantile exceedances (k=0.5 is the regularisation's fixed point,
        so the shrinkage prior is neutral here)."""
        from hamiltorch_tpu.model_comparison import _gpd_fit

        m, k_true, sigma_true = 2000, 0.5, 1.3
        q = (np.arange(1, m + 1) - 0.5) / m
        z = sigma_true * (np.power(1 - q, -k_true) - 1.0) / k_true
        k_hat, sigma_hat = _gpd_fit(np.sort(z)[:, None])
        assert abs(k_hat[0] - k_true) < 0.05
        assert abs(sigma_hat[0] - sigma_true) < 0.15

    def test_pareto_k_flags_heavy_tails(self):
        """A column whose importance ratios have a Pareto(alpha=1) tail
        (k=1 — infinite weight variance) is flagged above the 0.7
        threshold; well-behaved Gaussian columns stay below it."""
        rng = np.random.default_rng(3)
        s = 4000
        u = rng.uniform(size=s)
        lw_pareto = -np.log1p(-u)  # w = (1-u)^{-1}: GPD tail with k = 1
        ll = np.concatenate(
            [-lw_pareto[:, None], rng.normal(size=(s, 10))], axis=1
        )
        r = psis_loo(jnp.asarray(ll))
        assert r.pareto_k[0] > 0.7
        assert (r.pareto_k[1:] < 0.7).all()

    def test_short_tail_is_not_smoothed(self):
        ll = _loglik_matrix(Y_OBS, num_draws=12)  # M < 5: no smoothing
        r = psis_loo(ll)
        assert np.isinf(r.pareto_k).all()
        assert np.isfinite(r.elpd)

    def test_input_validation(self):
        with pytest.raises(ValueError, match="S, N"):
            waic(jnp.zeros((4,)))
        with pytest.raises(ValueError, match="S, N"):
            psis_loo(jnp.zeros((4, 3, 2)))
