"""SG-MCMC tests: SGLD/pSGLD/SGHMC posterior recovery (pooled chains),
chunked-resume bit-exactness, pytree states, the split-model term_fn
protocol, divergence handling, and config validation.

No reference counterpart — the reference's minibatch answer is split HMC
(reference: hamiltorch/samplers.py:465-603); these samplers cover the
one-minibatch-gradient-per-step regime with the SAME term_fn protocol.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.sgmcmc import (
    SGHMCConfig,
    SGLDConfig,
    run_sghmc,
    run_sghmc_chains,
    run_sgld,
    run_sgld_chains,
)

MU = jnp.array([1.0, -2.0, 0.5])
S2 = jnp.array([0.5, 1.0, 2.0])


def exact_term(t, m):
    """Four identical terms summing to log N(MU, diag(S2)) — ghat is exact
    (plain ULA / HMC dynamics), isolating the integrator from gradient
    noise."""
    return -0.125 * jnp.sum((t - MU) ** 2 / S2)


_DELTA = jnp.array(
    [[1.0, -1.0, 0.5], [-1.0, 1.0, -0.5], [0.5, 0.5, 1.0], [-0.5, -0.5, -1.0]]
)
_CS = MU + _DELTA  # term centers averaging to MU -> noisy minibatch grads


def noisy_term(t, m):
    return -0.125 * jnp.sum((t - _CS[m]) ** 2 / S2)


class TestSGLDStatistics:
    @pytest.mark.slow
    def test_preconditioned_gaussian_recovery(self, key):
        """inv_mass = S2 equalizes per-coordinate mixing; pooled chains
        match the analytic posterior."""
        cfg = SGLDConfig(num_samples=6000, step_size=0.02)
        r = run_sgld_chains(key, exact_term, 4, MU, cfg, num_chains=8,
                            inv_mass=S2)
        assert r.samples.shape == (8, 6000, 3)
        pooled = np.asarray(r.samples[:, 1000:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.12)
        np.testing.assert_allclose(
            pooled.std(0), np.sqrt(np.asarray(S2)), rtol=0.12
        )
        assert not bool(np.asarray(r.stats.divergent).any())

    @pytest.mark.slow
    def test_noisy_gradients_still_target_posterior(self, key):
        """Distinct term centers: the minibatch gradient is genuinely
        stochastic yet unbiased; means still land on MU."""
        cfg = SGLDConfig(num_samples=8000, step_size=0.02)
        r = run_sgld_chains(key, noisy_term, 4, MU, cfg, num_chains=8,
                            inv_mass=S2)
        pooled = np.asarray(r.samples[:, 2000:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.15)

    @pytest.mark.slow
    def test_psgld_rmsprop_preconditioner(self, key):
        """pSGLD self-preconditions from the gradient-noise floor.  Loose
        std tolerance: the omitted Gamma drift (module docstring) inflates
        heavy-curvature tails for low-dim synthetic targets."""
        cfg = SGLDConfig(num_samples=20000, step_size=8e-3, thin=2,
                         preconditioner="rmsprop", rmsprop_eps=1e-2)
        r = run_sgld_chains(key, noisy_term, 4, MU, cfg, num_chains=8)
        pooled = np.asarray(r.samples[:, 2000:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.2)
        np.testing.assert_allclose(
            pooled.std(0), np.sqrt(np.asarray(S2)), rtol=0.35
        )

    def test_step_decay_schedule(self, key):
        """decay_gamma > 0: recorded step sizes follow the polynomial
        schedule exactly."""
        cfg = SGLDConfig(num_samples=100, step_size=0.01, decay_gamma=0.55,
                         decay_t0=10.0)
        r = run_sgld(key, exact_term, 4, jnp.zeros(3), cfg)
        t = np.arange(100, dtype=np.float32)
        expect = 0.01 * (1.0 + t / 10.0) ** (-0.55)
        np.testing.assert_allclose(np.asarray(r.stats.step_size), expect,
                                   rtol=1e-5)


class TestSGHMCStatistics:
    @pytest.mark.slow
    def test_gaussian_recovery(self, key):
        cfg = SGHMCConfig(num_samples=6000, step_size=5e-3, friction=0.1)
        r = run_sghmc_chains(key, exact_term, 4, MU, cfg, num_chains=8,
                             inv_mass=S2)
        pooled = np.asarray(r.samples[:, 1000:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.15)
        np.testing.assert_allclose(
            pooled.std(0), np.sqrt(np.asarray(S2)), rtol=0.2
        )

    @pytest.mark.slow
    def test_momentum_resampling(self, key):
        """resample_momentum_every breaks long-range momentum coherence;
        the posterior is unchanged."""
        cfg = SGHMCConfig(num_samples=6000, step_size=5e-3, friction=0.1,
                          resample_momentum_every=50)
        r = run_sghmc_chains(key, exact_term, 4, MU, cfg, num_chains=8,
                             inv_mass=S2)
        pooled = np.asarray(r.samples[:, 1000:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.15)


class TestResume:
    def test_sgld_chunked_resume_bit_exact(self, key):
        full = SGLDConfig(num_samples=2000, step_size=0.02, thin=2)
        half = SGLDConfig(num_samples=1000, step_size=0.02, thin=2)
        r = run_sgld(key, exact_term, 4, jnp.zeros(3), full)
        a = run_sgld(key, exact_term, 4, jnp.zeros(3), half)
        b = run_sgld(key, exact_term, 4, a.final_theta, half,
                     init_aux=a.final_aux, start_step=int(a.final_step))
        joined = np.concatenate([np.asarray(a.samples), np.asarray(b.samples)])
        np.testing.assert_array_equal(joined, np.asarray(r.samples))

    def test_psgld_resume_carries_accumulator(self, key):
        full = SGLDConfig(num_samples=400, step_size=5e-3,
                          preconditioner="rmsprop", rmsprop_eps=1e-2)
        half = SGLDConfig(num_samples=200, step_size=5e-3,
                          preconditioner="rmsprop", rmsprop_eps=1e-2)
        r = run_sgld(key, noisy_term, 4, MU, full)
        a = run_sgld(key, noisy_term, 4, MU, half)
        b = run_sgld(key, noisy_term, 4, a.final_theta, half,
                     init_aux=a.final_aux, start_step=int(a.final_step))
        joined = np.concatenate([np.asarray(a.samples), np.asarray(b.samples)])
        np.testing.assert_array_equal(joined, np.asarray(r.samples))

    def test_sghmc_resume_carries_momentum(self, key):
        full = SGHMCConfig(num_samples=400, step_size=5e-3, friction=0.1)
        half = SGHMCConfig(num_samples=200, step_size=5e-3, friction=0.1)
        r = run_sghmc(key, exact_term, 4, MU, full)
        a = run_sghmc(key, exact_term, 4, MU, half)
        b = run_sghmc(key, exact_term, 4, a.final_theta, half,
                      init_aux=a.final_aux, start_step=int(a.final_step))
        joined = np.concatenate([np.asarray(a.samples), np.asarray(b.samples)])
        np.testing.assert_array_equal(joined, np.asarray(r.samples))


class TestPytreeAndData:
    def test_pytree_state_and_data_operand(self, key):
        data = {"mu": MU, "s2": S2}

        def term_d(t, m, d):
            return -0.125 * (
                jnp.sum((t["a"] - d["mu"][0]) ** 2 / d["s2"][0])
                + jnp.sum((t["b"] - d["mu"][1:]) ** 2 / d["s2"][1:])
            )

        t0 = {"a": jnp.zeros(()), "b": jnp.zeros(2)}
        cfg = SGLDConfig(num_samples=6000, step_size=0.01)
        r = run_sgld_chains(key, term_d, 4, t0, cfg, num_chains=8, data=data)
        assert r.samples["a"].shape == (8, 6000)
        assert r.samples["b"].shape == (8, 6000, 2)
        a_mean = float(np.asarray(r.samples["a"][:, 2000:]).mean())
        assert abs(a_mean - 1.0) < 0.15

    def test_pytree_inv_mass_broadcast(self, key):
        t0 = {"a": jnp.zeros(()), "b": jnp.zeros(2)}

        def term_d(t, m):
            return -0.125 * (
                jnp.sum((t["a"] - MU[0]) ** 2) + jnp.sum((t["b"] - MU[1:]) ** 2)
            )

        cfg = SGHMCConfig(num_samples=200, step_size=5e-3, friction=0.1)
        r = run_sghmc(key, term_d, 4, t0, cfg,
                      inv_mass={"a": 1.0, "b": jnp.array([0.5, 2.0])})
        assert r.samples["a"].shape == (200,)
        assert r.samples["b"].shape == (200, 2)

    def test_split_model_term_fn_protocol(self, key):
        """define_split_model_log_prob output drives run_sgld directly —
        the reference split-HMC workload moves over by swapping the runner
        (reference: hamiltorch/samplers.py:1203-1258)."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.bnn import define_split_model_log_prob

        torch.manual_seed(0)
        net = torch.nn.Sequential(torch.nn.Linear(2, 8), torch.nn.Tanh(),
                                  torch.nn.Linear(8, 1))
        x = torch.randn(32, 2)
        y = torch.randn(32, 1)
        loader = [(x[i : i + 8], y[i : i + 8]) for i in range(0, 32, 8)]
        term_fn, m, flat_init, _, data = define_split_model_log_prob(
            net, "regression", loader, num_splits=4, verbose=False
        )
        cfg = SGLDConfig(num_samples=50, step_size=1e-4)
        r = run_sgld(key, term_fn, m, flat_init, cfg, data=data)
        assert r.samples.shape == (50, flat_init.shape[0])
        assert bool(np.isfinite(np.asarray(r.samples)).all())


class TestCheckpointedSGMCMC:
    def test_sgld_chunked_bit_exact_and_resume(self, key, tmp_path):
        """Checkpointed == straight (global-step RNG folding), and an
        interrupted run resumed from the state file is bitwise equal."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_sgld_checkpointed

        cfg = SGLDConfig(num_samples=300, step_size=0.02, thin=3)
        r = run_sgld(key, exact_term, 4, jnp.zeros(3), cfg)
        r_ck = run_sgld_checkpointed(
            key, exact_term, 4, jnp.zeros(3), cfg, str(tmp_path / "a"),
            chunk_size=90,
        )
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_ck.samples))
        np.testing.assert_array_equal(np.asarray(r.stats.step_size),
                                      np.asarray(r_ck.stats.step_size))
        half = dataclasses.replace(cfg, num_samples=120)
        run_sgld_checkpointed(key, exact_term, 4, jnp.zeros(3), half,
                              str(tmp_path / "b"), chunk_size=90)
        r_res = run_sgld_checkpointed(key, exact_term, 4, jnp.zeros(3), cfg,
                                      str(tmp_path / "b"), chunk_size=90)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_res.samples))

    def test_psgld_pytree_checkpointed(self, key, tmp_path):
        """The RMSProp accumulator rides the state file; pytree states
        chunk per leaf."""
        from hamiltorch_tpu.checkpoint import run_sgld_checkpointed

        def term_tree(t, m):
            return -0.125 * (
                jnp.sum((t["a"] - MU[0]) ** 2) + jnp.sum((t["b"] - MU[1:]) ** 2)
            )

        t0 = {"a": jnp.zeros(()), "b": jnp.zeros(2)}
        cfg = SGLDConfig(num_samples=200, step_size=5e-3,
                         preconditioner="rmsprop", rmsprop_eps=1e-2)
        r = run_sgld(key, term_tree, 4, t0, cfg)
        r_ck = run_sgld_checkpointed(key, term_tree, 4, t0, cfg,
                                     str(tmp_path / "t"), chunk_size=50)
        for a, b in zip(jax.tree_util.tree_leaves(r.samples),
                        jax.tree_util.tree_leaves(r_ck.samples)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(r.final_aux),
                        jax.tree_util.tree_leaves(r_ck.final_aux)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_checkpointed_matches_straight(self, key, tmp_path):
        """Chunk files store bf16 upcast to f32 (_np_savable); the assembly
        must cast back so a bf16-state run returns bf16 samples bit-equal
        to the straight run."""
        from hamiltorch_tpu.checkpoint import run_sghmc_checkpointed

        cfg = SGHMCConfig(num_samples=120, step_size=5e-3, friction=0.1)
        t0 = MU.astype(jnp.bfloat16)
        r = run_sghmc(key, exact_term, 4, t0, cfg)
        assert r.samples.dtype == jnp.bfloat16
        r_ck = run_sghmc_checkpointed(key, exact_term, 4, t0, cfg,
                                      str(tmp_path / "bf"), chunk_size=40)
        assert r_ck.samples.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(r.samples.astype(jnp.float32)),
            np.asarray(r_ck.samples.astype(jnp.float32)),
        )

    def test_sghmc_momentum_rides_state_file(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_sghmc_checkpointed

        cfg = SGHMCConfig(num_samples=200, step_size=5e-3, friction=0.1)
        r = run_sghmc(key, exact_term, 4, MU, cfg)
        r_ck = run_sghmc_checkpointed(key, exact_term, 4, MU, cfg,
                                      str(tmp_path / "h"), chunk_size=60)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_ck.samples))
        np.testing.assert_array_equal(np.asarray(r.final_aux),
                                      np.asarray(r_ck.final_aux))


class TestShardedSGMCMC:
    """chains x data mesh: the minibatch gradient is psum-completed across
    the 'data' axis; sharded == local (same keys) up to f32 summation
    order."""

    def setup_method(self, _):
        rng = np.random.RandomState(3)
        self.xs = jnp.asarray(rng.randn(4, 16, 3).astype(np.float32))
        w = np.array([1.0, -2.0, 0.5], np.float32)
        self.ys = jnp.asarray(
            (np.asarray(self.xs) @ w + 0.1 * rng.randn(4, 16)).astype(np.float32)
        )
        self.data = (self.xs, self.ys)

    @staticmethod
    def term_shard(theta, m, d):
        xs, ys = d
        return -0.5 * jnp.sum((xs[m] @ theta - ys[m]) ** 2)

    @staticmethod
    def log_prior(theta):
        return -0.5 * jnp.dot(theta, theta)

    def term_local(self, theta, m, d):
        return self.term_shard(theta, m, d) + self.log_prior(theta) / 4.0

    def test_sgld_sharded_matches_local(self, key):
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_sgld_sharded

        cfg = SGLDConfig(num_samples=50, step_size=1e-3)
        mesh = make_mesh(chains=2, data=4)
        r_shard = run_sgld_sharded(key, self.term_shard, self.log_prior, 4,
                                   jnp.zeros(3), cfg, mesh, num_chains=4,
                                   data=self.data)
        r_local = run_sgld_chains(key, self.term_local, 4, jnp.zeros(3), cfg,
                                  num_chains=4, data=self.data)
        assert r_shard.samples.shape == (4, 50, 3)
        np.testing.assert_allclose(np.asarray(r_shard.samples),
                                   np.asarray(r_local.samples), atol=1e-4)

    def test_sghmc_sharded_matches_local(self, key):
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_sghmc_sharded

        cfg = SGHMCConfig(num_samples=50, step_size=1e-3, friction=0.1)
        mesh = make_mesh(chains=4, data=2)
        r_shard = run_sghmc_sharded(key, self.term_shard, self.log_prior, 4,
                                    jnp.zeros(3), cfg, mesh, num_chains=4,
                                    data=self.data)
        r_local = run_sghmc_chains(key, self.term_local, 4, jnp.zeros(3), cfg,
                                   num_chains=4, data=self.data)
        np.testing.assert_allclose(np.asarray(r_shard.samples),
                                   np.asarray(r_local.samples), atol=1e-4)

    @pytest.mark.slow
    def test_sgld_sharded_posterior_concentrates(self, key):
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_sgld_sharded

        cfg = SGLDConfig(num_samples=4000, step_size=2e-3)
        mesh = make_mesh(chains=2, data=4)
        r = run_sgld_sharded(key, self.term_shard, self.log_prior, 4,
                             jnp.zeros(3), cfg, mesh, num_chains=4,
                             data=self.data)
        post = np.asarray(r.samples[:, 1000:]).reshape(-1, 3).mean(0)
        np.testing.assert_allclose(post, [1.0, -2.0, 0.5], atol=0.15)

    def test_pytree_theta_sharded(self, key):
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_sgld_sharded

        def term_tree(theta, m, d):
            xs, ys = d
            return -0.5 * jnp.sum(
                (xs[m] @ theta["w"] + theta["b"] - ys[m]) ** 2
            )

        def prior_tree(theta):
            return -0.5 * (jnp.dot(theta["w"], theta["w"]) + theta["b"] ** 2)

        cfg = SGLDConfig(num_samples=20, step_size=1e-3)
        mesh = make_mesh(chains=2, data=4)
        t0 = {"w": jnp.zeros(3), "b": jnp.zeros(())}
        r = run_sgld_sharded(key, term_tree, prior_tree, 4, t0, cfg, mesh,
                             num_chains=4, data=self.data)
        assert r.samples["w"].shape == (4, 20, 3)
        assert r.samples["b"].shape == (4, 20)

    def test_validation(self, key):
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_sgld_sharded

        cfg = SGLDConfig(num_samples=10, step_size=1e-3)
        mesh = make_mesh(chains=2, data=4)
        with pytest.raises(ValueError, match="not divisible"):
            run_sgld_sharded(key, self.term_shard, self.log_prior, 4,
                             jnp.zeros(3), cfg, mesh, num_chains=3,
                             data=self.data)
        with pytest.raises(ValueError, match="data is required"):
            run_sgld_sharded(key, self.term_shard, self.log_prior, 4,
                             jnp.zeros(3), cfg, mesh, num_chains=4, data=None)
        bad = (self.xs[:, :15], self.ys[:, :15])
        with pytest.raises(ValueError, match="divisible by mesh data"):
            run_sgld_sharded(key, self.term_shard, self.log_prior, 4,
                             jnp.zeros(3), cfg, mesh, num_chains=4, data=bad)


class TestRobustness:
    def test_nonfinite_step_is_rejected_not_raised(self, key):
        """A term that overflows marks stats.divergent and keeps the last
        finite state — divergences are data, never exceptions."""

        def bad_term(t, m):
            return -jnp.sum(jnp.exp(80.0 * t**2))  # inf gradient away from 0

        cfg = SGLDConfig(num_samples=50, step_size=10.0)
        r = run_sgld(key, bad_term, 2, jnp.ones(3), cfg)
        assert bool(np.asarray(r.stats.divergent).any())
        assert bool(np.isfinite(np.asarray(r.samples)).all())
        assert bool(np.isfinite(np.asarray(r.final_theta)).all())

    def test_sub_f32_chain_state(self, key):
        """bf16 chain states survive the scan carry: the theta update
        computes in the promoted precision (eps is a strong f32 scalar from
        the decay schedule) and lands back in the leaf dtype."""
        t0 = jnp.zeros(3, jnp.bfloat16)
        for cfg in (
            SGLDConfig(num_samples=20, step_size=0.01),
            SGLDConfig(num_samples=20, step_size=0.01, decay_gamma=0.55),
            SGLDConfig(num_samples=20, step_size=0.01,
                       preconditioner="rmsprop"),
        ):
            r = run_sgld(key, exact_term, 4, t0, cfg)
            assert r.samples.dtype == jnp.bfloat16
            assert r.final_theta.dtype == jnp.bfloat16
        r = run_sgld(key, exact_term, 4, t0,
                     SGLDConfig(num_samples=20, step_size=0.01),
                     inv_mass=jnp.ones(3))
        assert r.samples.dtype == jnp.bfloat16
        r = run_sghmc(key, exact_term, 4, t0,
                      SGHMCConfig(num_samples=20, step_size=0.01))
        assert r.samples.dtype == jnp.bfloat16

    def test_validation(self, key):
        with pytest.raises(ValueError, match="num_samples"):
            SGLDConfig(num_samples=0, step_size=0.1)
        with pytest.raises(ValueError, match="divisible"):
            SGLDConfig(num_samples=10, step_size=0.1, thin=3)
        with pytest.raises(ValueError, match="step_size"):
            SGLDConfig(num_samples=10, step_size=-1.0)
        with pytest.raises(ValueError, match="preconditioner"):
            SGLDConfig(num_samples=10, step_size=0.1, preconditioner="adam")
        with pytest.raises(ValueError, match="friction"):
            SGHMCConfig(num_samples=10, step_size=0.1, friction=2.0)
        with pytest.raises(ValueError, match="num_terms"):
            run_sgld(key, exact_term, 0, jnp.zeros(3),
                     SGLDConfig(num_samples=10, step_size=0.1))
        with pytest.raises(ValueError, match="mutually exclusive"):
            run_sgld(key, exact_term, 4, jnp.zeros(3),
                     SGLDConfig(num_samples=10, step_size=0.1,
                                preconditioner="rmsprop"),
                     inv_mass=jnp.ones(3))
        with pytest.raises(ValueError, match="inv_mass shape"):
            run_sgld(key, exact_term, 4, jnp.zeros(3),
                     SGLDConfig(num_samples=10, step_size=0.1),
                     inv_mass=jnp.ones(4))


class TestCyclicalSGMCMC:
    """cSGLD/cSGHMC (Zhang et al. 2020): cosine cycles, exploration stage,
    snapshot collection, and the multimodal capability the constant-step
    samplers lack."""

    @pytest.mark.slow
    def test_csgld_gaussian_recovery(self, key):
        from hamiltorch_tpu.samplers.sgmcmc import (
            CSGMCMCConfig,
            run_csgmcmc_chains,
        )

        cfg = CSGMCMCConfig(num_cycles=4, cycle_length=1000, step_size=0.05,
                            exploration_frac=0.2, thin=4)
        r = run_csgmcmc_chains(key, exact_term, 4, MU, cfg, num_chains=8,
                               inv_mass=S2)
        kept = 4 * cfg.sampling_steps // 4
        assert r.samples.shape == (8, kept, 3)
        assert r.cycle.shape == (8, kept)
        assert int(r.cycle.max()) == 3 and int(r.cycle.min()) == 0
        pooled = np.asarray(r.samples).reshape(-1, 3)
        np.testing.assert_allclose(pooled.mean(0), np.asarray(MU), atol=0.15)
        np.testing.assert_allclose(
            pooled.std(0), np.sqrt(np.asarray(S2)), rtol=0.15
        )
        assert not bool(np.asarray(r.stats.divergent).any())

    @pytest.mark.slow
    def test_csgld_crosses_modes_where_constant_step_cannot(self, key):
        """The capability claim: on a +-4 mixture with minibatch gradient
        noise (zero-sum per-term tilts), cyclical hot restarts relocate
        every chain across the barrier while constant-step SGLD started in
        one mode never leaves it."""
        from hamiltorch_tpu.samplers.sgmcmc import (
            CSGMCMCConfig,
            run_csgmcmc_chains,
        )

        c_tilt = jnp.array([2.0, -2.0, 1.0, -1.0])

        def mix_term(t, m):
            lp = jnp.logaddexp(-0.5 * jnp.sum((t - 4.0) ** 2),
                               -0.5 * jnp.sum((t + 4.0) ** 2))
            return 0.25 * lp + c_tilt[m] * jnp.sum(t)

        start = jnp.full((1,), 4.0)
        ccfg = CSGMCMCConfig(num_cycles=8, cycle_length=300, step_size=1.0,
                             exploration_frac=0.6, thin=2)
        rc = run_csgmcmc_chains(key, mix_term, 4, start, ccfg, num_chains=8)
        frac_pos = float((np.asarray(rc.samples)[..., 0] > 0).mean())
        assert 0.2 < frac_pos < 0.8, frac_pos
        # every chain individually visited both modes
        per_chain = (np.asarray(rc.samples)[..., 0] > 0).mean(axis=1)
        assert (per_chain > 0.05).all() and (per_chain < 0.95).all()

        scfg = SGLDConfig(num_samples=2400, step_size=0.02, thin=2)
        rs = run_sgld_chains(key, mix_term, 4, start, scfg, num_chains=8)
        assert float((np.asarray(rs.samples)[..., 0] > 0).mean()) > 0.99

    def test_csghmc_runs_and_keeps_shapes(self, key):
        from hamiltorch_tpu.samplers.sgmcmc import CSGMCMCConfig, run_csgmcmc

        cfg = CSGMCMCConfig(num_cycles=3, cycle_length=40, step_size=0.02,
                            exploration_frac=0.5, thin=2, base="sghmc",
                            friction=0.1)
        r = run_csgmcmc(key, exact_term, 4, MU, cfg)
        assert r.samples.shape == (3 * 10, 3)
        assert r.final_aux is not None  # sghmc momentum carried out
        # cosine schedule: kept-step eps values live in (0, step_size]
        eps = np.asarray(r.stats.step_size)
        assert (eps > 0).all() and (eps <= cfg.step_size + 1e-7).all()

    def test_pytree_state_and_data_operand(self, key):
        from hamiltorch_tpu.samplers.sgmcmc import CSGMCMCConfig, run_csgmcmc

        data = jnp.arange(4.0)

        def term(t, m, d):
            return (-0.25 * jnp.sum((t["a"] - 1.0) ** 2)
                    - 0.25 * jnp.sum(t["b"] ** 2) + 0.0 * d[m])

        cfg = CSGMCMCConfig(num_cycles=2, cycle_length=30, step_size=0.05,
                            exploration_frac=0.5, thin=3)
        r = run_csgmcmc(key, term, 4, {"a": jnp.zeros(2), "b": jnp.zeros(3)},
                        cfg, data=data)
        assert r.samples["a"].shape == (2 * 5, 2)
        assert r.samples["b"].shape == (2 * 5, 3)

    def test_config_validation(self):
        from hamiltorch_tpu.samplers.sgmcmc import CSGMCMCConfig

        with pytest.raises(ValueError, match="base"):
            CSGMCMCConfig(num_cycles=2, cycle_length=10, step_size=0.1,
                          base="nuts")
        with pytest.raises(ValueError, match="divisible"):
            CSGMCMCConfig(num_cycles=2, cycle_length=10, step_size=0.1,
                          exploration_frac=0.5, thin=3)
        with pytest.raises(ValueError, match="exploration_frac"):
            CSGMCMCConfig(num_cycles=2, cycle_length=10, step_size=0.1,
                          exploration_frac=1.0)


class TestShardedCyclicalSGMCMC:
    """chains x data mesh for the cyclical sampler: sharded == local."""

    def test_csgld_sharded_matches_local(self, key):
        from hamiltorch_tpu.parallel.sharding import (
            make_mesh,
            run_csgmcmc_sharded,
        )
        from hamiltorch_tpu.samplers.sgmcmc import (
            CSGMCMCConfig,
            run_csgmcmc_chains,
        )

        rng = np.random.RandomState(3)
        xs = jnp.asarray(rng.randn(4, 16, 3).astype(np.float32))
        w = np.array([1.0, -2.0, 0.5], np.float32)
        ys = jnp.asarray(
            (np.asarray(xs) @ w + 0.1 * rng.randn(4, 16)).astype(np.float32)
        )
        data = (xs, ys)

        def term_shard(theta, m, d):
            x_s, y_s = d
            return -0.5 * jnp.sum((x_s[m] @ theta - y_s[m]) ** 2)

        log_prior = lambda t: -0.5 * jnp.dot(t, t)

        def term_local(theta, m, d):
            return term_shard(theta, m, d) + log_prior(theta) / 4.0

        cfg = CSGMCMCConfig(num_cycles=2, cycle_length=30, step_size=1e-3,
                            exploration_frac=0.5, thin=3)
        mesh = make_mesh(chains=2, data=4)
        r_shard = run_csgmcmc_sharded(key, term_shard, log_prior, 4,
                                      jnp.zeros(3), cfg, mesh, num_chains=4,
                                      data=data)
        r_local = run_csgmcmc_chains(key, term_local, 4, jnp.zeros(3), cfg,
                                     num_chains=4, data=data)
        assert r_shard.samples.shape == (4, 10, 3)
        np.testing.assert_allclose(np.asarray(r_shard.samples),
                                   np.asarray(r_local.samples), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(r_shard.cycle),
                                      np.asarray(r_local.cycle))
