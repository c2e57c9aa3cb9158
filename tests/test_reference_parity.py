"""Behavioural parity against the actual reference library (CPU oracle).

The reference (AdamCobb/hamiltorch v0.4.1) is mounted read-only and
importable with CPU torch, so these tests compare our components against
its *running behaviour*, not just our reading of its code.  Skipped
automatically when the reference checkout is absent.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="module")
def reference():
    torch = pytest.importorskip("torch")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    ref = pytest.importorskip("hamiltorch")
    return ref


class TestAdaptationParity:
    def test_dual_averaging_sequence_matches(self, reference):
        """Feed identical accept-ratio sequences through both dual-averaging
        implementations (reference: samplers.py:629-674) and compare the
        full (step_size, eps_bar, H_t) trajectories."""
        from hamiltorch_tpu.samplers.adaptation import da_init, da_update

        rng = np.random.RandomState(0)
        rhos = np.minimum(0.0, rng.randn(50) * 0.5)
        step_size_init = 0.3

        h_t, eps_bar = 0.0, 1.0
        ours = da_init(step_size_init, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        for t, rho in enumerate(rhos):
            ref_ss, eps_bar, h_t = reference.samplers.adaptation(
                float(rho), t, step_size_init, h_t, eps_bar
            )
            ours = da_update(ours, jnp.asarray(rho), jnp.asarray(t))
            np.testing.assert_allclose(float(ours.step_size), ref_ss, rtol=2e-3)
            np.testing.assert_allclose(float(jnp.exp(ours.log_eps_bar)), eps_bar, rtol=2e-3)
            np.testing.assert_allclose(float(ours.h_t), h_t, rtol=2e-3, atol=1e-6)

    def test_nan_rho_handling_matches(self, reference):
        from hamiltorch_tpu.samplers.adaptation import da_init, da_update

        ref_ss, ref_eb, ref_ht = reference.samplers.adaptation(
            float("nan"), 0, 0.3, 0.0, 1.0
        )
        ours = da_update(da_init(0.3), jnp.asarray(jnp.nan), jnp.asarray(0))
        np.testing.assert_allclose(float(ours.step_size), ref_ss, rtol=2e-3)
        np.testing.assert_allclose(float(ours.h_t), ref_ht, rtol=2e-3)


class TestSofabsParity:
    def test_fisher_softabs_matches(self, reference):
        """Same input matrix -> same softabs metric as the reference's
        fisher() eigen pipeline (reference: samplers.py:118-122)."""
        import torch

        from hamiltorch_tpu.ops.metrics import softabs_transform

        rng = np.random.RandomState(1)
        a = rng.randn(5, 5).astype(np.float32)
        a = (a + a.T) / 2

        eigs, vecs = torch.linalg.eigh(torch.tensor(a), UPLO="L")
        alpha = 5.0
        abs_eigs_ref = (1.0 / torch.tanh(alpha * eigs)) * eigs
        fish_ref = (vecs @ torch.diag(abs_eigs_ref) @ vecs.t()).numpy()

        g_ours, abs_ours = softabs_transform(jnp.asarray(a), alpha)
        np.testing.assert_allclose(np.asarray(g_ours), fish_ref, atol=1e-4)
        np.testing.assert_allclose(
            np.sort(np.asarray(abs_ours)), np.sort(abs_eigs_ref.numpy()), atol=1e-4
        )


class TestLeapfrogParity:
    def test_trajectory_endpoint_matches_reference(self, reference):
        """Identical (theta0, p0, Gaussian target) -> identical leapfrog
        endpoint as the reference's standard branch (samplers.py:269-304)."""
        import torch

        from hamiltorch_tpu.integrators.leapfrog import PhasePoint, leapfrog
        from hamiltorch_tpu.ops.mass import IdentityMass

        prec = np.array([[2.0, 0.5], [0.5, 1.0]], np.float32)

        def log_prob_torch(theta):
            P = torch.tensor(prec)
            return -0.5 * theta @ P @ theta

        def log_prob_jax(theta):
            return -0.5 * theta @ jnp.asarray(prec) @ theta

        theta0 = np.array([1.0, -0.5], np.float32)
        p0 = np.array([0.3, 0.8], np.float32)

        params = torch.tensor(theta0, requires_grad=True)
        momentum = torch.tensor(p0)
        ret_p, ret_m = reference.samplers.leapfrog(
            params, momentum, log_prob_torch, steps=25, step_size=0.1,
            sampler=reference.Sampler.HMC,
            integrator=reference.Integrator.IMPLICIT,
        )
        ref_theta = ret_p[-1].detach().numpy()
        ref_mom = ret_m[-1].detach().numpy()

        vg = jax.value_and_grad(log_prob_jax)
        lp0, g0 = vg(jnp.asarray(theta0))
        end = leapfrog(
            vg, IdentityMass(dim=2),
            PhasePoint(jnp.asarray(theta0), jnp.asarray(p0), lp0, g0), 0.1, 25,
        )
        np.testing.assert_allclose(np.asarray(end.theta), ref_theta, atol=1e-5)
        np.testing.assert_allclose(np.asarray(end.momentum), ref_mom, atol=1e-5)


class TestBNNLogProbParity:
    def test_log_prob_value_matches_reference(self, reference):
        """define_model_log_prob on the same linear model, data and flat
        parameter vector returns the same log-probability."""
        import torch

        from hamiltorch_tpu.models.bnn import define_model_log_prob

        torch.manual_seed(0)
        net = torch.nn.Sequential(torch.nn.Linear(4, 3))
        rng = np.random.RandomState(0)
        x = rng.randn(12, 4).astype(np.float32)
        y = rng.randint(0, 3, 12)

        shapes = [w.shape for w in net.parameters()]
        sizes = [w.numel() for w in net.parameters()]
        tau_list = [torch.tensor(1.5), torch.tensor(0.5)]
        ref_lp_fn = reference.samplers.define_model_log_prob(
            net, "multi_class_linear_output", torch.tensor(x),
            torch.tensor(y), sizes, shapes, tau_list, tau_out=2.0,
        )
        flat = torch.cat([p.flatten() for p in net.parameters()]).detach()
        ref_val = float(ref_lp_fn(flat.clone().requires_grad_()).detach())

        ours_fn, flat_ours, _ = define_model_log_prob(
            net, "multi_class_linear_output", jnp.asarray(x), jnp.asarray(y),
            tau_list=[1.5, 0.5], tau_out=2.0,
        )
        ours_val = float(ours_fn(jnp.asarray(flat.numpy())))
        np.testing.assert_allclose(ours_val, ref_val, rtol=1e-4)

    def test_regression_log_prob_matches(self, reference):
        import torch

        from hamiltorch_tpu.models.bnn import define_model_log_prob

        torch.manual_seed(1)
        net = torch.nn.Sequential(torch.nn.Linear(2, 1))
        rng = np.random.RandomState(2)
        x = rng.randn(9, 2).astype(np.float32)
        y = rng.randn(9, 1).astype(np.float32)
        shapes = [w.shape for w in net.parameters()]
        sizes = [w.numel() for w in net.parameters()]
        tau_list = [torch.tensor(1.0), torch.tensor(1.0)]
        ref_lp_fn = reference.samplers.define_model_log_prob(
            net, "regression", torch.tensor(x), torch.tensor(y),
            sizes, shapes, tau_list, tau_out=10.0,
        )
        flat = torch.cat([p.flatten() for p in net.parameters()]).detach()
        ref_val = float(ref_lp_fn(flat.clone().requires_grad_()).detach())
        ours_fn, _, _ = define_model_log_prob(
            net, "regression", jnp.asarray(x), jnp.asarray(y),
            tau_list=[1.0, 1.0], tau_out=10.0,
        )
        np.testing.assert_allclose(
            float(ours_fn(jnp.asarray(flat.numpy()))), ref_val, rtol=1e-4
        )


class TestStatisticalParity:
    def test_gaussian_posterior_moments_match(self, reference):
        """Both samplers on the 3-D Gaussian notebook target recover the
        same moments to statistical tolerance."""
        import torch

        stddev = np.array([0.5, 1.0, 2.0], np.float32)

        def lp_torch(w):
            return torch.sum(-0.5 * (w / torch.tensor(stddev)) ** 2)

        def lp_jax(w):
            return jnp.sum(-0.5 * (w / jnp.asarray(stddev)) ** 2)

        torch.manual_seed(0)
        ref_samples = reference.sample(
            lp_torch, torch.zeros(3), num_samples=600, step_size=0.3,
            num_steps_per_sample=5, verbose=False,
        )
        ref_arr = torch.stack(ref_samples[50:]).numpy()

        import hamiltorch_tpu as ht

        ours = ht.sample(
            lp_jax, jnp.zeros(3), num_samples=600, step_size=0.3,
            num_steps_per_sample=5, key=jax.random.key(0), verbose=False,
        )
        ours_arr = np.asarray(ours[50:])
        # independent chains: tolerance ~3 standard errors of the slowest-
        # mixing dimension (std 2, a few hundred effective draws)
        np.testing.assert_allclose(ref_arr.mean(0), ours_arr.mean(0), atol=0.45)
        np.testing.assert_allclose(ref_arr.std(0), ours_arr.std(0), atol=0.35)
