"""RMHMC tests: metric pipeline, Riemannian Hamiltonian, generalized and
explicit leapfrog, statistics on Gaussian and funnel targets."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hamiltorch_tpu as ht
from hamiltorch_tpu.enums import Integrator, Metric
from hamiltorch_tpu.integrators.implicit import implicit_leapfrog
from hamiltorch_tpu.ops.metrics import (
    RMOptions,
    make_metric_fn,
    make_rm_hamiltonian,
    softabs_eigenvalues,
)
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.rmhmc import run_rmhmc

PREC = jnp.array([[2.0, 0.6], [0.6, 1.0]])  # target precision


def gaussian_logprob(theta):
    return -0.5 * theta @ PREC @ theta


def funnel_logprob(theta, dim=5):
    """Neal's funnel: v ~ N(0,3), x_i ~ N(0, exp(v)) (notebook target)."""
    v = theta[0]
    x = theta[1:]
    lp_v = -0.5 * v**2 / 9.0
    lp_x = -0.5 * jnp.sum(x**2) * jnp.exp(-v) - 0.5 * (dim - 1) * v
    return lp_v + lp_x


class TestSoftabs:
    def test_matches_coth_formula(self):
        lam = jnp.array([-2.0, -0.5, 0.5, 3.0])
        alpha = 1.5
        expected = lam / np.tanh(alpha * np.asarray(lam))
        np.testing.assert_allclose(
            np.asarray(softabs_eigenvalues(lam, alpha)), expected, rtol=1e-6
        )

    def test_zero_guard(self):
        alpha = 2.0
        out = softabs_eigenvalues(jnp.array([0.0, 1e-12]), alpha)
        np.testing.assert_allclose(np.asarray(out), [1 / alpha, 1 / alpha], rtol=1e-5)

    def test_large_alpha_is_abs(self):
        lam = jnp.array([-3.0, 2.0])
        out = softabs_eigenvalues(lam, 1e6)
        np.testing.assert_allclose(np.asarray(out), [3.0, 2.0], rtol=1e-5)


class TestMetric:
    def test_hessian_metric_of_gaussian_is_precision(self):
        opts = RMOptions(metric=Metric.HESSIAN)
        g, abs_eigs = make_metric_fn(gaussian_logprob, opts)(jnp.array([0.3, -0.7]), None)
        np.testing.assert_allclose(np.asarray(g), np.asarray(PREC), rtol=1e-5)
        assert abs_eigs is None

    def test_softabs_metric_spd(self):
        # a log-prob with an indefinite Hessian away from the mode
        lp = lambda t: -0.25 * jnp.sum(t**4)
        opts = RMOptions(metric=Metric.SOFTABS, softabs_const=1e3)
        g, abs_eigs = make_metric_fn(lp, opts)(jnp.array([0.1, 2.0]), None)
        assert bool(jnp.all(abs_eigs > 0))
        assert bool(jnp.all(jnp.isfinite(jnp.linalg.cholesky(g))))

    def test_jacobian_diag_metric(self):
        opts = RMOptions(metric=Metric.JACOBIAN_DIAG)
        theta = jnp.array([0.5, -1.0])
        g, _ = make_metric_fn(gaussian_logprob, opts)(theta, None)
        grad = -PREC @ theta
        np.testing.assert_allclose(np.asarray(g), np.diag(np.asarray(grad) ** 2), rtol=1e-5)

    def test_jitter_adds_bounded_diagonal(self):
        opts = RMOptions(metric=Metric.HESSIAN, jitter=0.1)
        theta = jnp.array([0.0, 0.0])
        u = jnp.array([0.5, 1.0])
        g, _ = make_metric_fn(gaussian_logprob, opts)(theta, u)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(PREC) + np.diag([0.05, 0.1]), rtol=1e-5
        )


class TestRMHamiltonian:
    def test_value_matches_hand_formula(self):
        opts = RMOptions(metric=Metric.HESSIAN)
        rm = make_rm_hamiltonian(gaussian_logprob, opts)
        theta = jnp.array([0.4, -0.2])
        p = jnp.array([1.0, 0.5])
        h = float(rm.ham(theta, p, None))
        g = np.asarray(PREC)
        expected = (
            -float(gaussian_logprob(theta))
            + 0.5 * 2 * math.log(2 * math.pi)
            + 0.5 * math.log(np.linalg.det(g))
            + 0.5 * float(np.asarray(p) @ np.linalg.inv(g) @ np.asarray(p))
        )
        np.testing.assert_allclose(h, expected, rtol=1e-5)

    def test_grad_p_is_g_inverse_p(self):
        opts = RMOptions(metric=Metric.HESSIAN)
        rm = make_rm_hamiltonian(gaussian_logprob, opts)
        theta, p = jnp.array([0.4, -0.2]), jnp.array([1.0, 0.5])
        expected = np.linalg.solve(np.asarray(PREC), np.asarray(p))
        np.testing.assert_allclose(np.asarray(rm.grad_p(theta, p, None)), expected, rtol=1e-5)
        # autodiff of H wrt p must agree
        auto = jax.grad(rm.ham, argnums=1)(theta, p, None)
        np.testing.assert_allclose(np.asarray(auto), expected, rtol=1e-5)

    def test_momentum_sample_covariance(self, key):
        opts = RMOptions(metric=Metric.HESSIAN)
        rm = make_rm_hamiltonian(gaussian_logprob, opts)
        theta = jnp.zeros(2)
        ps = jax.vmap(lambda k: rm.sample_momentum(k, theta, None))(
            jax.random.split(key, 20000)
        )
        np.testing.assert_allclose(np.asarray(jnp.cov(ps.T)), np.asarray(PREC), atol=0.1)


class TestImplicitLeapfrog:
    def test_reversibility_on_funnel(self):
        """Generalized leapfrog is time-reversible when fixed points converge."""
        opts = RMOptions(
            metric=Metric.SOFTABS, softabs_const=10.0,
            fixed_point_threshold=1e-12, fixed_point_max_iterations=100,
        )
        rm = make_rm_hamiltonian(funnel_logprob, opts)
        theta0 = jnp.array([0.5, 0.3, -0.2, 0.1, 0.4])
        p0 = jnp.array([0.2, -0.1, 0.3, 0.0, -0.2])
        th, p, _, _ = implicit_leapfrog(rm, opts, theta0, p0, 0.1, 10, None)
        th_b, p_b, _, _ = implicit_leapfrog(rm, opts, th, -p, 0.1, 10, None)
        np.testing.assert_allclose(np.asarray(th_b), np.asarray(theta0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(-p_b), np.asarray(p0), atol=1e-4)

    def test_energy_conservation_gaussian(self):
        opts = RMOptions(metric=Metric.HESSIAN, fixed_point_threshold=1e-14,
                         fixed_point_max_iterations=50)
        rm = make_rm_hamiltonian(gaussian_logprob, opts)
        theta0, p0 = jnp.array([1.0, -0.5]), jnp.array([0.7, 0.3])
        h0 = float(rm.ham(theta0, p0, None))
        th, p, _, _ = implicit_leapfrog(rm, opts, theta0, p0, 0.05, 100, None)
        h1 = float(rm.ham(th, p, None))
        assert abs(h1 - h0) < 1e-2


@pytest.mark.slow
class TestRMHMCStatistics:
    def test_implicit_gaussian_moments(self, key):
        config = MCMCConfig(num_samples=600, num_steps_per_sample=8, step_size=0.3)
        result = run_rmhmc(
            key, gaussian_logprob, jnp.zeros(2), config,
            integrator=Integrator.IMPLICIT,
            fixed_point_threshold=1e-10, fixed_point_max_iterations=20,
        )
        samples = np.asarray(result.samples[100:])
        cov_target = np.linalg.inv(np.asarray(PREC))
        np.testing.assert_allclose(samples.mean(0), [0, 0], atol=0.15)
        np.testing.assert_allclose(np.cov(samples.T), cov_target, atol=0.2)
        assert float(result.acc_rate) > 0.8

    def test_explicit_gaussian_moments(self, key):
        config = MCMCConfig(num_samples=600, num_steps_per_sample=8, step_size=0.3)
        pooled = []
        for k in jax.random.split(key, 3):
            result = run_rmhmc(
                k, gaussian_logprob, jnp.zeros(2), config,
                integrator=Integrator.EXPLICIT, explicit_binding_const=100.0,
            )
            pooled.append(np.asarray(result.samples[100:]))
            assert float(result.acc_rate) > 0.7
        samples = np.concatenate(pooled)
        cov_target = np.linalg.inv(np.asarray(PREC))
        np.testing.assert_allclose(samples.mean(0), [0, 0], atol=0.12)
        np.testing.assert_allclose(np.cov(samples.T), cov_target, atol=0.22)

    def test_softabs_funnel_runs(self, key):
        """Notebook config 28: implicit RMHMC + softabs on the funnel."""
        config = MCMCConfig(num_samples=25, num_steps_per_sample=10, step_size=0.1)
        result = run_rmhmc(
            key, funnel_logprob, jnp.zeros(5) + 0.1, config,
            integrator=Integrator.IMPLICIT, metric=Metric.SOFTABS,
            softabs_const=10.0, fixed_point_threshold=1e-8,
            fixed_point_max_iterations=10,
        )
        assert bool(jnp.all(jnp.isfinite(result.samples)))
        assert float(result.acc_rate) > 0.2

    def test_jacobian_diag_with_jitter(self, key):
        config = MCMCConfig(num_samples=200, num_steps_per_sample=5, step_size=0.1)
        result = run_rmhmc(
            key, gaussian_logprob, jnp.ones(2), config,
            integrator=Integrator.IMPLICIT, metric=Metric.JACOBIAN_DIAG,
            jitter=0.5, fixed_point_max_iterations=10,
        )
        assert bool(jnp.all(jnp.isfinite(result.samples)))

    def test_api_rmhmc(self, key):
        samples = ht.sample(
            gaussian_logprob, jnp.zeros(2), num_samples=50,
            num_steps_per_sample=5, step_size=0.2,
            sampler=ht.Sampler.RMHMC, integrator=Integrator.IMPLICIT,
            fixed_point_max_iterations=10, fixed_point_threshold=1e-8,
            key=key, verbose=False,
        )
        assert samples.shape == (50, 2)

    def test_api_rmhmc_rejects_pass_grad(self):
        with pytest.raises(RuntimeError):
            ht.sample(
                gaussian_logprob, jnp.zeros(2), num_samples=10,
                sampler=ht.Sampler.RMHMC, pass_grad=lambda t: -t,
            )


class TestS3Integrator:
    def test_semi_separable_with_ham_func(self, key):
        """S3: H = -logp + 0.5 p^T G^-1 p + ham_func(theta)
        (reference: samplers.py:830-842)."""
        ham_func = lambda t: 0.5 * jnp.dot(t, t)
        config = MCMCConfig(num_samples=100, num_steps_per_sample=5, step_size=0.1)
        result = run_rmhmc(
            key, gaussian_logprob, jnp.zeros(2), config,
            integrator=Integrator.S3, jitter=0.1,
            fixed_point_max_iterations=10, fixed_point_threshold=1e-8,
            ham_func=ham_func,
        )
        assert bool(jnp.all(jnp.isfinite(result.samples)))
        assert float(result.acc_rate) > 0.3


def banana_logprob(theta, b=0.1):
    """Banana posterior (BASELINE.json config 3): curved ridge via the
    Rosenbrock-style warp of a Gaussian."""
    x, y = theta[0], theta[1]
    return -0.5 * (x**2 / 4.0) - 0.5 * ((y - b * (x**2 - 4.0)) ** 2) / 0.5


@pytest.mark.slow
class TestBananaRMHMC:
    @pytest.mark.parametrize("integ", [Integrator.IMPLICIT, Integrator.EXPLICIT])
    def test_softabs_banana(self, key, integ):
        """Explicit + implicit RMHMC with softabs metric on the banana
        (the Hessian is indefinite along the ridge, so softabs is required)."""
        config = MCMCConfig(num_samples=150, num_steps_per_sample=6, step_size=0.15)
        result = run_rmhmc(
            key, banana_logprob, jnp.array([0.0, 0.0]), config,
            integrator=integ, metric=Metric.SOFTABS, softabs_const=1e2,
            fixed_point_max_iterations=8, fixed_point_threshold=1e-8,
        )
        assert bool(jnp.all(jnp.isfinite(result.samples)))
        assert float(result.acc_rate) > 0.5
        samples = np.asarray(result.samples[30:])
        # the ridge: y should track b*(x^2 - 4)
        assert abs(samples[:, 0].mean()) < 1.0
        resid = samples[:, 1] - 0.1 * (samples[:, 0] ** 2 - 4.0)
        assert resid.std() < 1.5


class TestCustomMetric:
    def test_analytic_metric_matches_hessian_pipeline(self, key):
        """For a Gaussian, G(theta) = P analytically; a custom metric must
        reproduce the Hessian pipeline's chains exactly."""
        config = MCMCConfig(num_samples=80, num_steps_per_sample=5, step_size=0.3)
        kwargs = dict(integrator=Integrator.IMPLICIT,
                      fixed_point_threshold=1e-10, fixed_point_max_iterations=20)
        r_auto = run_rmhmc(key, gaussian_logprob, jnp.zeros(2), config, **kwargs)
        r_custom = run_rmhmc(
            key, gaussian_logprob, jnp.zeros(2), config,
            custom_metric=lambda t: PREC, **kwargs,
        )
        np.testing.assert_allclose(
            np.asarray(r_custom.samples), np.asarray(r_auto.samples), atol=1e-4
        )

    def test_funnel_analytic_metric(self, key):
        """Position-dependent analytic metric on the funnel (the classic
        RMHMC use case) — no third-order AD anywhere."""
        def funnel_metric(theta):
            # diag approximation of the funnel's Fisher-style metric
            v = theta[0]
            d = theta.shape[0]
            diag = jnp.concatenate([
                jnp.array([1.0 / 9.0 + (d - 1) / 2.0]),
                jnp.full((d - 1,), jnp.exp(-v)),
            ])
            return jnp.diag(diag)

        config = MCMCConfig(num_samples=150, num_steps_per_sample=8, step_size=0.2)
        result = run_rmhmc(
            key, funnel_logprob, jnp.zeros(5), config,
            integrator=Integrator.IMPLICIT, custom_metric=funnel_metric,
            fixed_point_threshold=1e-8, fixed_point_max_iterations=10,
        )
        assert bool(jnp.all(jnp.isfinite(result.samples)))
        assert float(result.acc_rate) > 0.5
        v = np.asarray(result.samples[30:, 0])
        assert v.std() > 1.0  # explores the funnel's v axis


class TestFixedPointDiagnostics:
    def test_fp_iters_saturate_when_cap_too_low(self, key):
        """An absurdly low iteration cap must be visible in stats.fp_iters
        (the solve cannot converge in 1 step on a curved metric)."""
        config = MCMCConfig(num_samples=10, num_steps_per_sample=4, step_size=0.2)
        result = run_rmhmc(
            key, funnel_logprob, 0.3 * jnp.ones(5), config,
            integrator=Integrator.IMPLICIT, metric=Metric.SOFTABS,
            softabs_const=10.0,
            fixed_point_threshold=1e-12, fixed_point_max_iterations=1,
        )
        assert result.stats.fp_iters.shape == (10,)
        assert int(jnp.max(result.stats.fp_iters)) == 1
        assert float(jnp.max(result.stats.fp_residual)) > 1e-12

    def test_fp_iters_report_convergence(self, key):
        config = MCMCConfig(num_samples=10, num_steps_per_sample=4, step_size=0.1)
        result = run_rmhmc(
            key, gaussian_logprob, jnp.zeros(2), config,
            integrator=Integrator.IMPLICIT,
            fixed_point_threshold=1e-10, fixed_point_max_iterations=50,
        )
        its = np.asarray(result.stats.fp_iters)
        assert np.all(its >= 1) and np.all(its < 50)
        assert float(jnp.max(result.stats.fp_residual)) <= 1e-10


@pytest.mark.slow
class TestRMHMCChains:
    def test_vmapped_chains_match_single(self, key):
        """Chain 0 of the vmapped batch equals a single run with its key."""
        config = MCMCConfig(num_samples=30, num_steps_per_sample=5, step_size=0.3)
        from hamiltorch_tpu.samplers.rmhmc import run_rmhmc_chains

        r_batch = run_rmhmc_chains(
            key, gaussian_logprob, jnp.zeros(2), config, num_chains=4,
            integrator=Integrator.IMPLICIT,
            fixed_point_threshold=1e-10, fixed_point_max_iterations=20,
        )
        assert r_batch.samples.shape == (4, 30, 2)
        k0 = jax.random.split(key, 4)[0]
        r_single = run_rmhmc(
            k0, gaussian_logprob, jnp.zeros(2), config,
            integrator=Integrator.IMPLICIT,
            fixed_point_threshold=1e-10, fixed_point_max_iterations=20,
        )
        np.testing.assert_allclose(
            np.asarray(r_batch.samples[0]), np.asarray(r_single.samples), atol=1e-5
        )

    def test_pooled_moments(self, key):
        from hamiltorch_tpu.samplers.rmhmc import run_rmhmc_chains

        config = MCMCConfig(num_samples=200, num_steps_per_sample=8, step_size=0.3)
        r = run_rmhmc_chains(
            key, gaussian_logprob, jnp.zeros(2), config, num_chains=8,
            fixed_point_threshold=1e-10, fixed_point_max_iterations=20,
        )
        pooled = np.asarray(r.samples[:, 50:]).reshape(-1, 2)
        cov = np.cov(pooled.T)
        np.testing.assert_allclose(cov, np.linalg.inv(np.asarray(PREC)), atol=0.15)


@pytest.mark.slow
class TestRMHMCCheckpoint:
    def test_resume_matches_direct(self, key, tmp_path):
        """Chunked + resumed RMHMC reproduces the uninterrupted run exactly
        (fold_in RNG lineage; dual averaging continues across chunks)."""
        from hamiltorch_tpu.checkpoint import run_rmhmc_checkpointed

        config = MCMCConfig(num_samples=40, num_steps_per_sample=4,
                            step_size=0.3, burn=10)
        half = MCMCConfig(num_samples=15, num_steps_per_sample=4,
                          step_size=0.3, burn=10)
        kw = dict(integrator=Integrator.IMPLICIT,
                  fixed_point_threshold=1e-10,
                  fixed_point_max_iterations=20)
        ck = str(tmp_path / "ck")
        run_rmhmc_checkpointed(key, gaussian_logprob, jnp.zeros(2), half, ck,
                               chunk_size=15, **kw)
        r_res = run_rmhmc_checkpointed(key, gaussian_logprob, jnp.zeros(2),
                                       config, ck, chunk_size=15, **kw)
        r_dir = run_rmhmc(key, gaussian_logprob, jnp.zeros(2), config, **kw)
        np.testing.assert_allclose(
            np.asarray(r_res.samples), np.asarray(r_dir.samples), atol=1e-5
        )
        np.testing.assert_allclose(
            float(r_res.final_step_size), float(r_dir.final_step_size),
            rtol=1e-5,
        )

    def test_option_change_refuses_resume(self, key, tmp_path):
        """RMHMC options are part of the checkpoint fingerprint."""
        import pytest

        from hamiltorch_tpu.checkpoint import run_rmhmc_checkpointed

        config = MCMCConfig(num_samples=10, num_steps_per_sample=3,
                            step_size=0.3)
        ck = str(tmp_path / "ck")
        run_rmhmc_checkpointed(key, gaussian_logprob, jnp.zeros(2), config, ck,
                               chunk_size=5, integrator=Integrator.IMPLICIT,
                               fixed_point_max_iterations=20)
        with pytest.raises(ValueError, match="fingerprint"):
            run_rmhmc_checkpointed(key, gaussian_logprob, jnp.zeros(2),
                                   config, ck, chunk_size=5,
                                   integrator=Integrator.EXPLICIT,
                                   fixed_point_max_iterations=20)

    def test_unknown_option_rejected(self, key, tmp_path):
        import pytest

        from hamiltorch_tpu.checkpoint import run_rmhmc_checkpointed

        with pytest.raises(TypeError, match="unknown RMHMC options"):
            run_rmhmc_checkpointed(key, gaussian_logprob, jnp.zeros(2),
                                   MCMCConfig(num_samples=4), str(tmp_path),
                                   bogus=1)


@pytest.mark.slow
class TestImplicitMidpoint:
    """Integrator.MIDPOINT (integrators/midpoint.py) — extension per
    Brofos & Lederman (arXiv:2102.07139): one joint fixed point per step,
    symplectic for any Hamiltonian."""

    def test_reversibility_on_funnel(self):
        """The midpoint rule is symmetric: forward then momentum-flipped
        backward recovers the start when the fixed points converge."""
        from hamiltorch_tpu.integrators.midpoint import implicit_midpoint

        opts = RMOptions(
            metric=Metric.SOFTABS, softabs_const=10.0,
            fixed_point_threshold=1e-12, fixed_point_max_iterations=100,
        )
        rm = make_rm_hamiltonian(funnel_logprob, opts)
        theta0 = jnp.array([0.5, 0.3, -0.2, 0.1, 0.4])
        p0 = jnp.array([0.2, -0.1, 0.3, 0.0, -0.2])
        th, p, _, _ = implicit_midpoint(rm, opts, theta0, p0, 0.1, 10, None)
        th_b, p_b, _, _ = implicit_midpoint(rm, opts, th, -p, 0.1, 10, None)
        np.testing.assert_allclose(np.asarray(th_b), np.asarray(theta0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(-p_b), np.asarray(p0), atol=1e-4)

    def test_energy_conservation_beats_generalized_leapfrog(self):
        """On the Gaussian-Hessian Hamiltonian at equal step size the
        midpoint rule's energy drift is measurably below the generalized
        leapfrog's (the paper's headline observation)."""
        from hamiltorch_tpu.integrators.midpoint import implicit_midpoint

        opts = RMOptions(metric=Metric.HESSIAN, fixed_point_threshold=1e-14,
                         fixed_point_max_iterations=50)
        rm = make_rm_hamiltonian(gaussian_logprob, opts)
        theta0, p0 = jnp.array([1.0, -0.5]), jnp.array([0.7, 0.3])
        h0 = float(rm.ham(theta0, p0, None))
        th_m, p_m, _, _ = implicit_midpoint(rm, opts, theta0, p0, 0.05, 100, None)
        err_mid = abs(float(rm.ham(th_m, p_m, None)) - h0)
        th_l, p_l, _, _ = implicit_leapfrog(rm, opts, theta0, p0, 0.05, 100, None)
        err_lf = abs(float(rm.ham(th_l, p_l, None)) - h0)
        assert err_mid < 1e-2
        assert err_mid < err_lf

    def test_gaussian_moments(self, key):
        config = MCMCConfig(num_samples=600, num_steps_per_sample=8, step_size=0.3)
        r = run_rmhmc(key, gaussian_logprob, jnp.zeros(2), config,
                      integrator=Integrator.MIDPOINT, metric=Metric.HESSIAN)
        s = np.asarray(r.samples[100:])
        cov_target = np.linalg.inv(np.asarray(PREC))
        np.testing.assert_allclose(np.cov(s.T), cov_target, atol=0.25)
        assert float(r.acc_rate) > 0.9
        # fixed-point diagnostics populated
        assert int(np.asarray(r.stats.fp_iters).max()) >= 1

    def test_api_dispatch_and_checkpoint_roundtrip(self, key, tmp_path):
        s = ht.sample(gaussian_logprob, jnp.zeros(2), num_samples=40,
                      num_steps_per_sample=5, step_size=0.2,
                      sampler=ht.Sampler.RMHMC,
                      integrator=ht.Integrator.MIDPOINT,
                      verbose=False, key=key)
        assert np.asarray(s).shape == (40, 2)  # [init] + draws n > 0, minus n=0
        from hamiltorch_tpu.checkpoint import run_rmhmc_checkpointed

        cfg = MCMCConfig(num_samples=40, num_steps_per_sample=5, step_size=0.2)
        r_direct = run_rmhmc(key, gaussian_logprob, jnp.zeros(2), cfg,
                             integrator=Integrator.MIDPOINT)
        r_ck = run_rmhmc_checkpointed(
            key, gaussian_logprob, jnp.zeros(2), cfg, str(tmp_path),
            chunk_size=15, integrator=Integrator.MIDPOINT,
        )
        np.testing.assert_array_equal(
            np.asarray(r_direct.samples), np.asarray(r_ck.samples)
        )


class TestPytreeRMHMC:
    """Pytree states through RMHMC (boundary ravel: the metric pipeline is
    inherently flat — G is dense (D, D) — so the tree ravels ONCE per
    potential call, negligible next to the Hessian/eigh work)."""

    def test_single_leaf_tree_matches_flat_bitwise(self, key):
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.rmhmc import run_rmhmc

        lp_flat = lambda t: -0.5 * jnp.sum(t**2)
        lp_tree = lambda t: -0.5 * jnp.sum(t["x"] ** 2)
        cfg = MCMCConfig(num_samples=20, num_steps_per_sample=3, step_size=0.2)
        r_flat = run_rmhmc(key, lp_flat, jnp.zeros(2), cfg)
        r_tree = run_rmhmc(key, lp_tree, {"x": jnp.zeros(2)}, cfg)
        np.testing.assert_array_equal(
            np.asarray(r_tree.samples["x"]), np.asarray(r_flat.samples)
        )
        assert r_tree.final_state.theta["x"].shape == (2,)

    def test_multi_leaf_tree_chains_shapes(self, key):
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.rmhmc import run_rmhmc_chains

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2))

        t0 = {"a": jnp.zeros(2), "b": jnp.zeros((2, 1))}
        cfg = MCMCConfig(num_samples=15, num_steps_per_sample=3, step_size=0.2)
        r = run_rmhmc_chains(key, lp, t0, cfg, num_chains=3)
        assert r.samples["a"].shape == (3, 15, 2)
        assert r.samples["b"].shape == (3, 15, 2, 1)
        assert bool(np.isfinite(np.asarray(r.samples["a"])).all())
        # moments sane on the pooled trace
        pooled = np.asarray(r.samples["a"][:, 5:]).reshape(-1, 2)
        assert abs(pooled.mean()) < 0.6

    def test_repeat_calls_reuse_the_compiled_scan(self, key):
        """The boundary-ravel adapter is identity-stable: a second
        run_rmhmc call with the same tree potential must NOT retrace the
        scan (CLAUDE.md: potentials are static jit args; implicit-RMHMC
        compiles were measured at minutes on the remote service)."""
        from hamiltorch_tpu.ops.potential import make_flat_potential
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.rmhmc import _run_rmhmc_jit, run_rmhmc

        def lp(t):
            return -0.5 * jnp.sum(t["x"] ** 2)

        tpl = {"x": jnp.zeros(2)}
        assert make_flat_potential(lp, tpl) is make_flat_potential(lp, tpl)
        cfg = MCMCConfig(num_samples=5, num_steps_per_sample=2, step_size=0.2)
        run_rmhmc(key, lp, {"x": jnp.zeros(2)}, cfg)
        n0 = _run_rmhmc_jit._cache_size()
        run_rmhmc(jax.random.fold_in(key, 1), lp, {"x": jnp.zeros(2)}, cfg)
        assert _run_rmhmc_jit._cache_size() == n0

    def test_stacked_ambiguity_override(self, key):
        """A single tree state whose leading leaf dim equals num_chains
        broadcasts (not misreads as per-chain) under
        theta0_is_stacked=False."""
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.rmhmc import run_rmhmc_chains

        def lp(t):
            return -0.5 * jnp.sum(t["w"] ** 2)

        t0 = {"w": jnp.zeros((3, 2))}  # ONE state, first dim == num_chains
        cfg = MCMCConfig(num_samples=6, num_steps_per_sample=2, step_size=0.2)
        r = run_rmhmc_chains(key, lp, t0, cfg, num_chains=3,
                             theta0_is_stacked=False)
        assert r.samples["w"].shape == (3, 6, 3, 2)
        # default auto-detect keeps treating the (3, ...) leaf as stacked
        r2 = run_rmhmc_chains(key, lp, t0, cfg, num_chains=3)
        assert r2.samples["w"].shape == (3, 6, 2)

    def test_tree_bnn_data_rides_as_operand(self, key):
        """make_flat_potential preserves the _raw_fn/_data jit-operand
        protocol through the ravel boundary — pytree-BNN datasets must not
        bake into the RMHMC program as closure constants (CLAUDE.md)."""
        import torch

        from hamiltorch_tpu.models.bnn import define_model_tree_log_prob
        from hamiltorch_tpu.ops.potential import make_flat_potential
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.rmhmc import run_rmhmc

        torch.manual_seed(0)
        net = torch.nn.Linear(2, 1)
        x = np.random.default_rng(0).normal(size=(8, 2)).astype("float32")
        y = (x @ [[1.0], [-1.0]]).astype("float32")
        lp, template = define_model_tree_log_prob(net, "regression", x, y)
        flat = make_flat_potential(lp, template)
        assert hasattr(flat, "_raw_fn")
        assert flat._data is lp._data
        cfg = MCMCConfig(num_samples=5, num_steps_per_sample=2,
                         step_size=0.05)
        r = run_rmhmc(key, lp, template, cfg)
        leaves = jax.tree_util.tree_leaves(r.samples)
        assert leaves[0].shape == (5, 1, 2)  # weight leaf, draws leading
        assert bool(np.isfinite(np.asarray(r.stats.energy_new)).all())
