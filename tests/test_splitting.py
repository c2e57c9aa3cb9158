"""Symmetric-split HMC tests: reversibility, equivalence to full-batch HMC
in distribution, the three splitting schemes, and the split-BNN flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

import hamiltorch_tpu as ht
from hamiltorch_tpu.enums import Integrator
from hamiltorch_tpu.integrators.splitting import splitting_leapfrog
from hamiltorch_tpu.ops.mass import IdentityMass
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.splitting import run_split_hmc, terms_from_list


def make_split_gaussian(num_terms=4):
    """Std normal split into num_terms equal potential shares."""
    def term(theta):
        return -0.5 * jnp.dot(theta, theta) / num_terms

    return [term] * num_terms


class TestSplittingIntegrator:
    @pytest.mark.parametrize(
        "integ", [Integrator.SPLITTING, Integrator.SPLITTING_KMID]
    )
    def test_reversibility(self, integ):
        fns = make_split_gaussian(3)
        term_fn = terms_from_list(fns)
        grad_term = jax.grad(term_fn, argnums=0)
        mass = IdentityMass(dim=2)
        theta0, p0 = jnp.array([1.0, -0.5]), jnp.array([0.3, 0.8])
        th, p = splitting_leapfrog(grad_term, 3, mass, theta0, p0, 0.1, 50, integ)
        th_b, p_b = splitting_leapfrog(grad_term, 3, mass, th, -p, 0.1, 50, integ)
        np.testing.assert_allclose(np.asarray(th_b), np.asarray(theta0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(-p_b), np.asarray(p0), atol=1e-4)

    def test_kmid_matches_plain_leapfrog(self):
        """KMID with terms summing to U is algebraically plain leapfrog."""
        from hamiltorch_tpu.integrators.leapfrog import PhasePoint, leapfrog

        fns = make_split_gaussian(2)
        term_fn = terms_from_list(fns)
        grad_term = jax.grad(term_fn, argnums=0)
        mass = IdentityMass(dim=2)
        theta0, p0 = jnp.array([1.0, -0.5]), jnp.array([0.3, 0.8])
        th_s, p_s = splitting_leapfrog(
            grad_term, 2, mass, theta0, p0, 0.1, 20, Integrator.SPLITTING_KMID
        )
        full = lambda t: -0.5 * jnp.dot(t, t)
        vg = jax.value_and_grad(full)
        lp0, g0 = vg(theta0)
        end = leapfrog(vg, mass, PhasePoint(theta0, p0, lp0, g0), 0.1, 20)
        np.testing.assert_allclose(np.asarray(th_s), np.asarray(end.theta), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p_s), np.asarray(end.momentum), atol=1e-5)


@pytest.mark.slow
class TestSplitHMCStatistics:
    @pytest.mark.parametrize(
        "integ",
        [Integrator.SPLITTING, Integrator.SPLITTING_RAND, Integrator.SPLITTING_KMID],
    )
    def test_gaussian_moments(self, key, integ):
        fns = make_split_gaussian(4)
        config = MCMCConfig(num_samples=1500, num_steps_per_sample=10, step_size=0.3)
        # pool several independent chains: single short chains have large
        # moment noise from HMC autocorrelation
        pooled = []
        for k in jax.random.split(key, 4):
            result = run_split_hmc(k, fns, jnp.zeros(2), config, integrator=integ)
            pooled.append(np.asarray(result.samples[200:]))
            assert float(result.acc_rate) > 0.6
        samples = np.concatenate(pooled)
        np.testing.assert_allclose(samples.mean(0), [0, 0], atol=0.12)
        np.testing.assert_allclose(samples.std(0), [1, 1], atol=0.15)

    def test_api_sample_with_list(self, key):
        fns = make_split_gaussian(3)
        samples = ht.sample(
            fns, jnp.zeros(2), num_samples=100, num_steps_per_sample=5,
            step_size=0.2, integrator=Integrator.SPLITTING, key=key, verbose=False,
        )
        assert samples.shape == (100, 2)

    def test_api_rejects_non_list(self):
        with pytest.raises(RuntimeError):
            ht.sample(
                lambda t: -jnp.dot(t, t), jnp.zeros(2), num_samples=10,
                integrator=Integrator.SPLITTING,
            )

    def test_single_term_splitting_rejected(self, key):
        fns = make_split_gaussian(1)
        config = MCMCConfig(num_samples=10, num_steps_per_sample=5, step_size=0.2)
        with pytest.raises(RuntimeError):
            run_split_hmc(key, fns, jnp.zeros(2), config, integrator=Integrator.SPLITTING)


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(8)(x))
        return nn.Dense(1)(x)


@pytest.mark.slow
class TestSplitModelFlow:
    def test_sample_split_model(self, key):
        rng = np.random.RandomState(0)
        x = np.linspace(-1, 1, 40)[:, None].astype(np.float32)
        y = np.sin(2 * x) + 0.05 * rng.randn(40, 1).astype(np.float32)
        batches = [(x[i::4], y[i::4]) for i in range(4)]  # 4 equal splits
        samples = ht.sample_split_model(
            MLP(), batches, num_splits=4, model_loss="regression",
            num_samples=100, num_steps_per_sample=10, step_size=0.001,
            tau_out=50.0, key=key, verbose=False,
        )
        assert samples.ndim == 2 and samples.shape[0] == 100
        assert bool(jnp.all(jnp.isfinite(samples)))

    def test_split_matches_fullbatch_distribution(self, key):
        """Split-HMC on a quadratic target matches full-batch moments."""
        def make_term(shift):
            def term(theta):
                return -0.25 * jnp.sum((theta - shift) ** 2)

            return term

        # two terms: -(1/4)|θ-1|² -(1/4)|θ+1|² = -(1/2)(θ²+1) → N(0, sqrt(2)... )
        fns = [make_term(1.0), make_term(-1.0)]
        config = MCMCConfig(num_samples=3000, num_steps_per_sample=10, step_size=0.4)
        result = run_split_hmc(key, fns, jnp.zeros(2), config)
        samples = np.asarray(result.samples[500:])
        # precision = 1 → std 1·I, mean 0
        np.testing.assert_allclose(samples.mean(0), [0, 0], atol=0.15)
        np.testing.assert_allclose(samples.std(0), [1.0, 1.0], atol=0.2)


@pytest.mark.slow
class TestSplittingPassGrad:
    """Extension past the reference: per-term user gradients for splitting
    (the reference refuses pass_grad here, samplers.py:468-469)."""

    def test_analytic_grads_match_autograd(self, key):
        num_terms = 4
        terms = make_split_gaussian(num_terms)
        grads = [lambda t: -t / num_terms] * num_terms
        config = MCMCConfig(num_samples=50, num_steps_per_sample=5, step_size=0.2)
        r_auto = run_split_hmc(key, terms, jnp.zeros(3), config)
        r_user = run_split_hmc(key, terms, jnp.zeros(3), config, pass_grad=grads)
        np.testing.assert_allclose(
            np.asarray(r_user.samples), np.asarray(r_auto.samples), atol=1e-6
        )

    def test_api_sample_splitting_pass_grad(self, key):
        num_terms = 3
        terms = make_split_gaussian(num_terms)
        grads = [lambda t: -t / num_terms] * num_terms
        s = ht.sample(
            terms, jnp.zeros(2), num_samples=30, num_steps_per_sample=5,
            step_size=0.2, sampler=ht.Sampler.HMC,
            integrator=Integrator.SPLITTING, pass_grad=grads,
            verbose=False, key=key,
        )
        assert s.shape == (30, 2)  # [init] + draws[burn+1:]
        assert bool(jnp.all(jnp.isfinite(s)))

    def test_api_sample_splitting_scalar_pass_grad_rejected(self, key):
        terms = make_split_gaussian(3)
        with pytest.raises(RuntimeError, match="per-term"):
            ht.sample(
                terms, jnp.zeros(2), num_samples=10,
                integrator=Integrator.SPLITTING, pass_grad=lambda t: -t,
                verbose=False, key=key,
            )

    def test_wrong_length_list_rejected(self, key):
        terms = make_split_gaussian(3)
        with pytest.raises(RuntimeError, match="per-term"):
            run_split_hmc(
                key, terms, jnp.zeros(2),
                MCMCConfig(num_samples=10), pass_grad=[lambda t: -t],
            )


class TestTupleLogProb:
    """Reference collect_gradients tuple branch (samplers.py:54-58): a
    log-prob returning (scalar, aux) is differentiated through element 0."""

    def test_tuple_output_sampled(self, key):
        def lp_tuple(theta):
            return -0.5 * jnp.dot(theta, theta), theta * 2.0  # (logp, aux)

        def lp_plain(theta):
            return -0.5 * jnp.dot(theta, theta)

        s_tuple = ht.sample(lp_tuple, jnp.zeros(2), num_samples=40,
                            num_steps_per_sample=5, step_size=0.3,
                            verbose=False, key=key)
        s_plain = ht.sample(lp_plain, jnp.zeros(2), num_samples=40,
                            num_steps_per_sample=5, step_size=0.3,
                            verbose=False, key=key)
        np.testing.assert_allclose(
            np.asarray(s_tuple), np.asarray(s_plain), atol=1e-6
        )


class TestSplitChains:
    def test_vmapped_split_chains(self, key):
        from hamiltorch_tpu.samplers.splitting import (
            run_split_hmc_chains, run_split_hmc_stacked, terms_from_list,
        )

        terms = make_split_gaussian(4)
        term_fn = terms_from_list(terms)
        config = MCMCConfig(num_samples=60, num_steps_per_sample=5, step_size=0.25)
        r = run_split_hmc_chains(key, term_fn, 4, jnp.zeros(2), config,
                                 num_chains=8)
        assert r.samples.shape == (8, 60, 2)
        # chain 0 of the batch equals a single run with its key
        k0 = jax.random.split(key, 8)[0]
        r0 = run_split_hmc_stacked(k0, term_fn, 4, jnp.zeros(2), config)
        np.testing.assert_allclose(
            np.asarray(r.samples[0]), np.asarray(r0.samples), atol=1e-6
        )
        pooled = np.asarray(r.samples[:, 20:]).reshape(-1, 2)
        np.testing.assert_allclose(pooled.std(0), [1, 1], atol=0.15)


class TestSplitCheckpoint:
    def test_resume_matches_direct(self, key, tmp_path):
        """Chunked + resumed split HMC reproduces the uninterrupted run."""
        import pytest

        from hamiltorch_tpu.checkpoint import run_split_hmc_checkpointed
        from hamiltorch_tpu.samplers.splitting import (
            run_split_hmc_stacked, terms_from_list,
        )

        term_fn = terms_from_list(make_split_gaussian(4))
        config = MCMCConfig(num_samples=60, num_steps_per_sample=5,
                            step_size=0.25, burn=20)
        half = MCMCConfig(num_samples=25, num_steps_per_sample=5,
                          step_size=0.25, burn=20)
        ck = str(tmp_path / "ck")
        run_split_hmc_checkpointed(key, term_fn, 4, jnp.zeros(2), half, ck,
                                   chunk_size=25)
        r_res = run_split_hmc_checkpointed(key, term_fn, 4, jnp.zeros(2),
                                           config, ck, chunk_size=25)
        r_dir = run_split_hmc_stacked(key, term_fn, 4, jnp.zeros(2), config)
        np.testing.assert_allclose(
            np.asarray(r_res.samples), np.asarray(r_dir.samples), atol=1e-5
        )
        # a different splitting scheme refuses to resume the directory
        with pytest.raises(ValueError, match="fingerprint"):
            run_split_hmc_checkpointed(
                key, term_fn, 4, jnp.zeros(2), config, ck, chunk_size=25,
                integrator=Integrator.SPLITTING_KMID,
            )


class TestPytreeSplitHMC:
    """Pytree chain state through the splitting integrators (VERDICT r3
    item 4): leaves update in their natural shapes in the kick/drift
    sweeps; single-leaf trees match the flat layout bitwise."""

    def test_single_leaf_tree_matches_flat_bitwise(self, key):
        from hamiltorch_tpu.samplers.splitting import run_split_hmc_stacked

        def term_flat(theta, m):
            return -0.25 * jnp.dot(theta, theta)

        def term_tree(params, m):
            return -0.25 * jnp.dot(params["x"], params["x"])

        cfg = MCMCConfig(num_samples=50, num_steps_per_sample=5, step_size=0.3)
        r_flat = run_split_hmc_stacked(key, term_flat, 2, jnp.zeros(3), cfg)
        r_tree = run_split_hmc_stacked(
            key, term_tree, 2, {"x": jnp.zeros(3)}, cfg
        )
        np.testing.assert_array_equal(
            np.asarray(r_tree.samples["x"]), np.asarray(r_flat.samples)
        )
        np.testing.assert_array_equal(
            np.asarray(r_tree.stats.accepted), np.asarray(r_flat.stats.accepted)
        )

    @pytest.mark.slow
    @pytest.mark.parametrize(
        "integ",
        [Integrator.SPLITTING, Integrator.SPLITTING_RAND, Integrator.SPLITTING_KMID],
    )
    def test_tree_bnn_matches_flat_factory(self, key, integ):
        """define_split_model_tree_log_prob + tree state reproduces the
        flat factory's trajectories on the same split BNN (same priors,
        likelihood, and prior/num_splits accounting)."""
        from hamiltorch_tpu.models.bnn import (
            define_split_model_log_prob,
            define_split_model_tree_log_prob,
        )
        from hamiltorch_tpu.samplers.splitting import run_split_hmc_stacked
        from hamiltorch_tpu.utils.pytree import ravel_pytree_fn

        rng = np.random.RandomState(0)
        x = np.linspace(-1, 1, 32)[:, None].astype(np.float32)
        y = np.sin(2 * x) + 0.05 * rng.randn(32, 1).astype(np.float32)
        batches = [(x[i::4], y[i::4]) for i in range(4)]
        term_flat, m, flat_init, _, data = define_split_model_log_prob(
            MLP(), "regression", batches, 4, tau_out=10.0, verbose=False
        )
        term_tree, m2, template, data2 = define_split_model_tree_log_prob(
            MLP(), "regression", batches, 4, tau_out=10.0, verbose=False
        )
        assert m == m2 == 4
        cfg = MCMCConfig(num_samples=40, num_steps_per_sample=5,
                         step_size=1e-3)
        r_flat = run_split_hmc_stacked(key, term_flat, m, flat_init, cfg,
                                       integrator=integ, data=data)
        r_tree = run_split_hmc_stacked(key, term_tree, m, template, cfg,
                                       integrator=integ, data=data2)
        flat_of_tree = jnp.stack([
            ravel_pytree_fn(
                jax.tree_util.tree_map(lambda l: l[i], r_tree.samples)
            )[0]
            for i in range(40)
        ])
        np.testing.assert_allclose(
            np.asarray(flat_of_tree), np.asarray(r_flat.samples), atol=1e-5
        )

    def test_tree_split_chains_and_per_leaf_inv_mass(self, key):
        from hamiltorch_tpu.samplers.splitting import run_split_hmc_chains

        def term_tree(params, m):
            return -0.25 * (
                jnp.dot(params["a"], params["a"]) + jnp.sum(params["b"] ** 2)
            )

        t0 = {"a": jnp.zeros(2), "b": jnp.zeros((3, 1))}
        im = {"a": jnp.full((2,), 0.5), "b": jnp.ones((3, 1))}
        cfg = MCMCConfig(num_samples=60, num_steps_per_sample=5, step_size=0.3)
        r = run_split_hmc_chains(key, term_tree, 2, t0, cfg, num_chains=4,
                                 inv_mass=im)
        assert r.samples["a"].shape == (4, 60, 2)
        assert r.samples["b"].shape == (4, 60, 3, 1)
        assert bool(np.isfinite(np.asarray(r.samples["a"])).all())

    def test_tree_checkpoint_resume_bit_exact(self, key, tmp_path):
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_split_hmc_checkpointed
        from hamiltorch_tpu.samplers.splitting import run_split_hmc_stacked

        def term_tree(params, m):
            return -0.25 * jnp.dot(params["x"], params["x"])

        t0 = {"x": jnp.zeros(3)}
        cfg = MCMCConfig(num_samples=60, num_steps_per_sample=5,
                         step_size=0.25, burn=20)
        ck = str(tmp_path / "ck")
        run_split_hmc_checkpointed(
            key, term_tree, 2, t0, dataclasses.replace(cfg, num_samples=25),
            ck, chunk_size=25,
        )
        r_res = run_split_hmc_checkpointed(key, term_tree, 2, t0, cfg, ck,
                                           chunk_size=25)
        r_dir = run_split_hmc_stacked(key, term_tree, 2, t0, cfg)
        np.testing.assert_array_equal(
            np.asarray(r_res.samples["x"]), np.asarray(r_dir.samples["x"])
        )

    def test_tree_host_offload_matches_device(self, key):
        from hamiltorch_tpu.samplers.offload import run_split_hmc_host_offload
        from hamiltorch_tpu.samplers.splitting import run_split_hmc_stacked

        def term_tree(params, m):
            return -0.25 * jnp.dot(params["x"], params["x"])

        t0 = {"x": jnp.zeros(3)}
        cfg = MCMCConfig(num_samples=70, num_steps_per_sample=5, step_size=0.3)
        r_dev = run_split_hmc_stacked(key, term_tree, 2, t0, cfg)
        r_host = run_split_hmc_host_offload(key, term_tree, 2, t0, cfg,
                                            chunk_size=32)
        assert isinstance(r_host.samples["x"], np.ndarray)
        np.testing.assert_array_equal(
            r_host.samples["x"], np.asarray(r_dev.samples["x"])
        )


class TestSplittingOffloadValidation:
    def test_offload_rejects_wrong_length_pass_grad(self, key):
        """Review finding: the store_on_GPU=False branch must validate the
        pass_grad list length like the device path — lax.switch would
        clamp the term index and sample silently wrong."""
        fns = make_split_gaussian(2)
        grad = [lambda t: -0.5 * t]  # one fn for two terms
        with pytest.raises(RuntimeError, match="matching"):
            ht.sample(fns, jnp.zeros(2), num_samples=10,
                      num_steps_per_sample=3, step_size=0.2,
                      integrator=Integrator.SPLITTING, pass_grad=grad,
                      store_on_GPU=False, key=key, verbose=False)
