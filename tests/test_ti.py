"""Thermodynamic integration / power-posterior evidence tests.

No reference counterpart (the reference has no evidence machinery); the
ground truth is the analytic conjugate-Gaussian log Z and cross-agreement
with the SMC estimator (tests/test_smc.py uses the same setup).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.ti import (
    TIConfig,
    evidence_from_loglik_draws,
    run_ti,
    ti_ladder,
)


def gaussian_setup(d=3, lam=4.0):
    """prior N(0, I), likelihood ∝ exp(-lam/2 |t|^2):
    log Z = -d/2 log(1 + lam)."""
    log_prior = lambda t: -0.5 * jnp.sum(t**2) - 0.5 * d * jnp.log(2 * jnp.pi)
    log_lik = lambda t: -0.5 * lam * jnp.sum(t**2)
    lz = -0.5 * d * np.log(1.0 + lam)
    return log_prior, log_lik, lz


class TestTIEvidence:
    @pytest.mark.slow
    def test_gaussian_evidence_all_estimators(self, key):
        log_prior, log_lik, lz = gaussian_setup(d=3, lam=4.0)
        cfg = TIConfig(num_samples=1500, num_steps_per_sample=6,
                       step_size=0.4, num_temps=12, burn=400)
        r = run_ti(key, log_prior, log_lik, jnp.zeros(3), cfg)
        assert abs(float(r.log_evidence) - lz) < 0.06
        assert abs(float(r.log_evidence_ti) - lz) < 0.10
        # the PLAIN trapezoid carries discretization bias the corrected
        # form removes; it should still be in the neighbourhood
        assert abs(float(r.log_evidence_ti_plain) - lz) < 0.3

    @pytest.mark.slow
    def test_agrees_with_smc(self, key):
        from hamiltorch_tpu.samplers.smc import SMCConfig, run_smc

        log_prior, log_lik, lz = gaussian_setup(d=2, lam=9.0)
        r_ti = run_ti(key, log_prior, log_lik, jnp.zeros(2),
                      TIConfig(num_samples=1500, num_steps_per_sample=6,
                               step_size=0.4, num_temps=12, burn=400))
        prior_sample = lambda k, n: jax.random.normal(k, (n, 2))
        r_smc = run_smc(jax.random.fold_in(key, 1), log_prior, log_lik,
                        prior_sample,
                        SMCConfig(num_particles=1024, num_temps=16,
                                  mcmc_steps=3, leapfrog_steps=6,
                                  step_size=0.3))
        assert abs(float(r_ti.log_evidence) - lz) < 0.08
        assert abs(float(r_ti.log_evidence) - float(r_smc.log_evidence)) < 0.15

    @pytest.mark.slow
    def test_posterior_rung_is_a_valid_chain(self, key):
        """The beta=1 rung's trace recovers the tempered-product posterior
        N(0, 1/(1+lam)) — a TI run doubles as a sampling run."""
        log_prior, log_lik, _ = gaussian_setup(d=3, lam=4.0)
        cfg = TIConfig(num_samples=2500, num_steps_per_sample=6,
                       step_size=0.4, num_temps=8, burn=500)
        r = run_ti(key, log_prior, log_lik, jnp.zeros(3), cfg)
        assert r.samples.shape == (2000, 3)
        std = np.asarray(r.samples).std(0)
        np.testing.assert_allclose(std, 1.0 / np.sqrt(5.0), rtol=0.12)

    def test_pytree_state(self, key):
        """Pytree particles: per-leaf Gaussian prior/likelihood."""
        lam = 4.0
        d_total = 3

        def log_prior(t):
            return (-0.5 * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2))
                    - 0.5 * d_total * jnp.log(2 * jnp.pi))

        def log_lik(t):
            return -0.5 * lam * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2))

        lz = -0.5 * d_total * np.log(1.0 + lam)
        t0 = {"a": jnp.zeros(1), "b": jnp.zeros((2, 1))}
        cfg = TIConfig(num_samples=900, num_steps_per_sample=5,
                       step_size=0.4, num_temps=10, burn=300)
        r = run_ti(key, log_prior, log_lik, t0, cfg)
        assert r.samples["a"].shape == (600, 1)
        assert r.samples["b"].shape == (600, 2, 1)
        assert abs(float(r.log_evidence) - lz) < 0.15


class TestTIMechanics:
    def test_ladder_endpoints_and_monotonicity(self):
        b = np.asarray(ti_ladder(16, 5.0))
        assert b[0] == 0.0 and b[-1] == 1.0
        assert (np.diff(b) > 0).all()
        # power > 1 crowds rungs near beta=0
        assert b[8] < 0.5

    def test_estimators_on_synthetic_draws(self):
        """On CONSTANT per-rung log-lik draws every estimator reduces to
        the exact integral of a known function."""
        betas = ti_ladder(6, 1.0)  # uniform ladder
        c = -2.5
        llik = jnp.full((100, 6), c)
        ss, corr, plain = evidence_from_loglik_draws(llik, betas)
        # E_beta[log lik] = c for all beta -> integral = c; zero variance
        for v in (ss, corr, plain):
            assert abs(float(v) - c) < 1e-5

    def test_swap_accepts_recorded_and_help_mixing(self, key):
        log_prior, log_lik, _ = gaussian_setup(d=2, lam=4.0)
        cfg = TIConfig(num_samples=300, num_steps_per_sample=4,
                       step_size=0.4, num_temps=6, burn=100)
        r = run_ti(key, log_prior, log_lik, jnp.zeros(2), cfg)
        assert r.info.swap_accept.shape == (200, 5)
        assert bool(np.asarray(r.info.swap_accept).any())
        r_ns = run_ti(key, log_prior, log_lik, jnp.zeros(2),
                      TIConfig(num_samples=300, num_steps_per_sample=4,
                               step_size=0.4, num_temps=6, burn=100,
                               swap=False))
        assert not bool(np.asarray(r_ns.info.swap_accept).any())

    def test_per_rung_step_sizes_adapt_apart(self, key):
        """lam >> 1 shrinks the posterior 3x vs the prior: the beta=1
        rung's adapted step must come out smaller than the beta=0 rung's."""
        log_prior, log_lik, _ = gaussian_setup(d=3, lam=24.0)
        cfg = TIConfig(num_samples=600, num_steps_per_sample=5,
                       step_size=0.5, num_temps=8, burn=300)
        r = run_ti(key, log_prior, log_lik, jnp.zeros(3), cfg)
        eps = np.asarray(r.info.step_sizes)
        assert eps[-1] < eps[0]
        acc = np.asarray(r.info.accept_prob).mean(0)
        assert (acc > 0.5).all()

    def test_validation(self, key):
        with pytest.raises(ValueError, match="num_temps"):
            TIConfig(num_samples=10, num_temps=1, burn=1)
        with pytest.raises(ValueError, match="schedule_power"):
            TIConfig(num_samples=10, schedule_power=0.0, burn=1)
        with pytest.raises(ValueError, match="burn"):
            TIConfig(num_samples=10, adapt_step_size=True, burn=0)
        log_prior, log_lik, _ = gaussian_setup()
        with pytest.raises(RuntimeError, match="burn"):
            run_ti(key, log_prior, log_lik, jnp.zeros(3),
                   TIConfig(num_samples=10, burn=10))
        with pytest.raises(ValueError, match="rungs"):
            run_ti(key, log_prior, log_lik, jnp.zeros((3, 3)),
                   TIConfig(num_samples=10, num_temps=8, burn=1))

    def test_data_rides_as_operand(self, key):
        """log_lik_fn(theta, data) with an explicit data operand."""
        x = jnp.linspace(-1, 1, 32)[:, None]
        y = 2.0 * x[:, 0]

        def log_lik(t, data):
            xx, yy = data
            return -0.5 * 25.0 * jnp.sum((yy - xx[:, 0] * t[0]) ** 2)

        log_prior = lambda t: -0.5 * jnp.sum(t**2) - 0.5 * jnp.log(2 * jnp.pi)
        cfg = TIConfig(num_samples=400, num_steps_per_sample=5,
                       step_size=0.2, num_temps=8, burn=200)
        r = run_ti(key, log_prior, log_lik, jnp.zeros(1), cfg, data=(x, y))
        # posterior for the slope concentrates near 2
        assert abs(float(jnp.mean(r.samples)) - 2.0) < 0.2
        assert np.isfinite(float(r.log_evidence))


class TestTICheckpoint:
    def test_chunked_bit_exact_and_resume(self, key, tmp_path):
        """Checkpointed TI == straight run (global-draw RNG folding, DA
        state in the carry), and an interrupted run resumes bit-exactly."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_ti_checkpointed

        log_prior, log_lik, lz = gaussian_setup(d=2, lam=4.0)
        cfg = TIConfig(num_samples=120, num_steps_per_sample=4,
                       step_size=0.4, num_temps=6, burn=40)
        r = run_ti(key, log_prior, log_lik, jnp.zeros(2), cfg)
        r_ck = run_ti_checkpointed(key, log_prior, log_lik, jnp.zeros(2),
                                   cfg, str(tmp_path / "a"), chunk_size=50)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_ck.samples))
        np.testing.assert_array_equal(np.asarray(r.loglik_draws),
                                      np.asarray(r_ck.loglik_draws))
        assert float(r.log_evidence) == pytest.approx(
            float(r_ck.log_evidence), abs=1e-6
        )
        np.testing.assert_array_equal(np.asarray(r.info.step_sizes),
                                      np.asarray(r_ck.info.step_sizes))
        # interrupt after 60 draws, then resume to completion
        half = dataclasses.replace(cfg, num_samples=60)
        run_ti_checkpointed(key, log_prior, log_lik, jnp.zeros(2), half,
                            str(tmp_path / "b"), chunk_size=50)
        r_res = run_ti_checkpointed(key, log_prior, log_lik, jnp.zeros(2),
                                    cfg, str(tmp_path / "b"), chunk_size=50)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_res.samples))

    def test_resume_from_longer_completed_run_truncates(self, key, tmp_path):
        """num_samples is a cosmetic fingerprint field: pointing a SHORTER
        request at a directory left by a longer completed run must return
        exactly the requested draws (and evidence over them), not the
        longer run's."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_ti_checkpointed

        log_prior, log_lik, _ = gaussian_setup(d=2, lam=4.0)
        cfg = TIConfig(num_samples=120, num_steps_per_sample=4,
                       step_size=0.4, num_temps=6, burn=40)
        run_ti_checkpointed(key, log_prior, log_lik, jnp.zeros(2), cfg,
                            str(tmp_path / "long"), chunk_size=50)
        short = dataclasses.replace(cfg, num_samples=80)
        r_short = run_ti_checkpointed(key, log_prior, log_lik, jnp.zeros(2),
                                      short, str(tmp_path / "long"),
                                      chunk_size=50)
        r_ref = run_ti(key, log_prior, log_lik, jnp.zeros(2), short)
        assert r_short.samples.shape == r_ref.samples.shape == (40, 2)
        np.testing.assert_array_equal(np.asarray(r_short.samples),
                                      np.asarray(r_ref.samples))
        np.testing.assert_array_equal(np.asarray(r_short.loglik_draws),
                                      np.asarray(r_ref.loglik_draws))
        assert float(r_short.log_evidence) == pytest.approx(
            float(r_ref.log_evidence), abs=1e-6
        )

    def test_bf16_state_bit_exact(self, key, tmp_path):
        """Chunk files upcast sub-f32 arrays to f32 on disk; the assembled
        result must restore the chain-state dtype so a bf16-state run is
        bit-identical to the straight run (incl. log_evidence)."""
        from hamiltorch_tpu.checkpoint import run_ti_checkpointed

        log_prior, log_lik, _ = gaussian_setup(d=2, lam=4.0)
        cfg = TIConfig(num_samples=90, num_steps_per_sample=4,
                       step_size=0.4, num_temps=6, burn=30)
        t0 = jnp.zeros(2, jnp.bfloat16)
        r = run_ti(key, log_prior, log_lik, t0, cfg)
        r_ck = run_ti_checkpointed(key, log_prior, log_lik, t0, cfg,
                                   str(tmp_path / "bf"), chunk_size=40)
        assert r_ck.samples.dtype == r.samples.dtype == jnp.bfloat16
        assert r_ck.loglik_draws.dtype == r.loglik_draws.dtype
        np.testing.assert_array_equal(
            np.asarray(r.samples, np.float32),
            np.asarray(r_ck.samples, np.float32),
        )
        np.testing.assert_array_equal(
            np.asarray(r.loglik_draws, np.float32),
            np.asarray(r_ck.loglik_draws, np.float32),
        )
        assert float(r.log_evidence) == float(r_ck.log_evidence)

    def test_pytree_checkpointed(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_ti_checkpointed

        def log_prior(t):
            return (-0.5 * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2))
                    - 1.5 * jnp.log(2 * jnp.pi))

        def log_lik(t):
            return -2.0 * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2))

        t0 = {"a": jnp.zeros(1), "b": jnp.zeros(2)}
        cfg = TIConfig(num_samples=90, num_steps_per_sample=4,
                       step_size=0.4, num_temps=6, burn=30)
        r = run_ti(key, log_prior, log_lik, t0, cfg)
        r_ck = run_ti_checkpointed(key, log_prior, log_lik, t0, cfg,
                                   str(tmp_path / "t"), chunk_size=40)
        for a, b in zip(jax.tree_util.tree_leaves(r.samples),
                        jax.tree_util.tree_leaves(r_ck.samples)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(r.log_evidence) == pytest.approx(
            float(r_ck.log_evidence), abs=1e-6
        )


class TestBNNEvidenceHelper:
    """define_model_prior_and_lik: the prior/likelihood split for torch
    models, validated against the ANALYTIC Bayesian-linear-regression
    marginal likelihood (y ~ N(0, tau^-1 Phi Phi^T + tau_out^-1 I))."""

    def _setup(self, tau=1.0, tau_out=25.0, n=24):
        import torch

        from hamiltorch_tpu.models.bnn import define_model_prior_and_lik

        rng = np.random.default_rng(4)
        x = rng.uniform(-1, 1, size=(n, 1)).astype(np.float32)
        y = (0.8 * x[:, 0] - 0.3 + 0.2 * rng.normal(size=n)).astype(
            np.float32
        )[:, None]
        torch.manual_seed(0)
        net = torch.nn.Linear(1, 1)
        lp, ll, ps, template = define_model_prior_and_lik(
            net, "regression", x, y, tau_list=tau, tau_out=tau_out
        )
        phi = np.concatenate([x, np.ones_like(x)], axis=1)  # weight, bias
        k_mat = phi @ phi.T / tau + np.eye(n) / tau_out
        sign, logdet = np.linalg.slogdet(2 * np.pi * k_mat)
        lz = float(
            -0.5 * y[:, 0] @ np.linalg.solve(k_mat, y[:, 0]) - 0.5 * logdet
        )
        return lp, ll, ps, template, lz

    @pytest.mark.slow
    def test_ti_matches_analytic_marginal_likelihood(self, key):
        lp, ll, ps, template, lz = self._setup()
        cfg = TIConfig(num_samples=1800, num_steps_per_sample=6,
                       step_size=0.3, num_temps=12, burn=600)
        r = run_ti(key, lp, ll, template, cfg)
        assert abs(float(r.log_evidence) - lz) < 0.15
        assert abs(float(r.log_evidence_ti) - lz) < 0.25

    @pytest.mark.slow
    def test_smc_consumes_the_same_split(self, key):
        from hamiltorch_tpu.samplers.smc import SMCConfig, run_smc

        lp, ll, ps, template, lz = self._setup()
        r = run_smc(key, lp, ll, ps,
                    SMCConfig(num_particles=1024, num_temps=20,
                              mcmc_steps=4, leapfrog_steps=6, step_size=0.3))
        assert abs(float(r.log_evidence) - lz) < 0.2

    def test_prior_sampler_and_protocol(self, key):
        lp, ll, ps, template, _ = self._setup(tau=4.0)
        draws = ps(key, 4000)
        leaves = jax.tree_util.tree_leaves(draws)
        assert leaves[0].shape[:1] == (4000,)
        for l in leaves:
            assert abs(float(jnp.std(l)) - 0.5) < 0.05  # tau=4 -> std 1/2
        # the dataset rides the operand protocol, not a closure
        assert hasattr(ll, "_raw_fn") and ll._data is not None
        # prior log-density is properly normalised (evidence needs it):
        # integral check at a point vs the analytic N(0, tau^-1) pdf
        z0 = jax.tree_util.tree_map(lambda l: jnp.zeros_like(l[0]), draws)
        d = sum(l[0].size for l in leaves)
        expect = 0.5 * d * (np.log(4.0) - np.log(2 * np.pi))
        assert float(lp(z0)) == pytest.approx(expect, rel=1e-5)
