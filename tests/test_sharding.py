"""Mesh-sharding tests on the virtual 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.parallel.sharding import (
    make_mesh,
    run_hmc_chains_sharded,
    sample_chains_sharded,
)
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc_chains


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def std_normal(theta):
    return -0.5 * jnp.dot(theta, theta)


class TestChainSharding:
    def test_sharded_chains_match_vmap(self, key):
        config = MCMCConfig(num_samples=20, num_steps_per_sample=5, step_size=0.2)
        mesh = make_mesh(chains=8, data=1)
        r_shard = run_hmc_chains_sharded(
            key, std_normal, jnp.zeros(3), config, mesh, num_chains=16
        )
        r_vmap = run_hmc_chains(key, std_normal, jnp.zeros(3), config, num_chains=16)
        np.testing.assert_allclose(
            np.asarray(r_shard.samples), np.asarray(r_vmap.samples), atol=1e-5
        )

    def test_sharded_moments(self, key):
        config = MCMCConfig(num_samples=400, num_steps_per_sample=10, step_size=0.3)
        mesh = make_mesh(chains=4, data=2)
        result = run_hmc_chains_sharded(
            key, std_normal, jnp.zeros(2), config, mesh, num_chains=8
        )
        assert result.samples.shape == (8, 400, 2)
        pooled = np.asarray(result.samples[:, 100:]).reshape(-1, 2)
        np.testing.assert_allclose(pooled.mean(0), [0, 0], atol=0.15)
        np.testing.assert_allclose(pooled.std(0), [1, 1], atol=0.2)


class TestDataSharding:
    def setup_method(self, _):
        rng = np.random.RandomState(0)
        self.x = rng.randn(64, 3).astype(np.float32)
        self.w_true = np.array([1.0, -2.0, 0.5], np.float32)
        self.y = (self.x @ self.w_true + 0.1 * rng.randn(64)).astype(np.float32)

    def loglik_shard(self, theta, x_shard, y_shard, tau=100.0):
        pred = x_shard @ theta
        return -0.5 * tau * jnp.sum((pred - y_shard) ** 2)

    def log_prior(self, theta):
        return -0.5 * jnp.dot(theta, theta)

    def full_log_prob(self, theta):
        return self.log_prior(theta) + self.loglik_shard(theta, jnp.asarray(self.x), jnp.asarray(self.y))

    def test_data_sharded_matches_fullbatch(self, key):
        """Same keys -> same chains; a tame posterior (tau=1) keeps f32
        summation-order noise from amplifying chaotically over steps."""
        tame_ll = lambda t, xs, ys: self.loglik_shard(t, xs, ys, tau=1.0)
        tame_full = lambda t: self.log_prior(t) + tame_ll(
            t, jnp.asarray(self.x), jnp.asarray(self.y)
        )
        config = MCMCConfig(num_samples=5, num_steps_per_sample=3, step_size=0.01)
        mesh = make_mesh(chains=2, data=4)
        r_shard = sample_chains_sharded(
            key, tame_ll, self.log_prior, self.x, self.y,
            jnp.zeros(3), config, mesh, num_chains=4,
        )
        r_full = run_hmc_chains(key, tame_full, jnp.zeros(3), config, num_chains=4)
        np.testing.assert_allclose(
            np.asarray(r_shard.samples), np.asarray(r_full.samples), atol=1e-4
        )

    def test_data_sharded_posterior_concentrates(self, key):
        config = MCMCConfig(num_samples=300, num_steps_per_sample=10, step_size=0.01)
        mesh = make_mesh(chains=2, data=4)
        result = sample_chains_sharded(
            key, self.loglik_shard, self.log_prior, self.x, self.y,
            jnp.zeros(3), config, mesh, num_chains=4,
        )
        post_mean = np.asarray(result.samples[:, 100:]).reshape(-1, 3).mean(0)
        np.testing.assert_allclose(post_mean, self.w_true, atol=0.1)

    def test_bad_mesh_shape_raises(self):
        with pytest.raises(ValueError):
            make_mesh(chains=3, data=2)

    def test_chains_not_divisible_raises(self, key):
        config = MCMCConfig(num_samples=5)
        mesh = make_mesh(chains=4, data=2)
        with pytest.raises(ValueError):
            sample_chains_sharded(
                key, self.loglik_shard, self.log_prior, self.x, self.y,
                jnp.zeros(3), config, mesh, num_chains=6,
            )


@pytest.mark.slow
class TestChEESSharding:
    def test_sharded_chees_matches_local(self, key):
        """Same per-chain keys -> same draws: the only difference between the
        mesh run and the local run is psum vs local-sum reduction order."""
        from hamiltorch_tpu.ops.mass import make_mass
        from hamiltorch_tpu.parallel.sharding import run_chees_sharded
        from hamiltorch_tpu.samplers.chees import ChEESConfig, _run_chees_jit

        config = ChEESConfig(num_samples=40, burn=20, step_size=0.2)
        mesh = make_mesh(chains=4, data=2)
        theta0 = 0.1 * jax.random.normal(jax.random.key(42), (8, 3))
        r_shard = run_chees_sharded(
            key, std_normal, theta0, config, mesh, num_chains=8
        )
        chain_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), 8)
        r_local = _run_chees_jit(
            key, theta0, std_normal, config, make_mass(None, 3),
            chain_keys=chain_keys,
        )
        # early draws agree to float noise; later draws drift as psum-vs-local
        # f32 reduction-order differences amplify through the adaptive dynamics
        np.testing.assert_allclose(
            np.asarray(r_shard.samples[:, :10]),
            np.asarray(r_local.samples[:, :10]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(r_shard.samples), np.asarray(r_local.samples), atol=2e-2
        )
        np.testing.assert_allclose(
            float(r_shard.final_trajectory_length),
            float(r_local.final_trajectory_length),
            rtol=0.05,
        )

    def test_sharded_thinned_matches_unthinned_subsample(self, key):
        """thin=k under shard_map (the trace buffer's windowed inner-carry
        path inside a mesh program): kept rows are exactly every k-th state
        of the unthinned sharded run, bit-for-bit."""
        import dataclasses

        from hamiltorch_tpu.parallel.sharding import run_chees_sharded
        from hamiltorch_tpu.samplers.chees import ChEESConfig

        config = ChEESConfig(num_samples=24, burn=12, step_size=0.2)
        mesh = make_mesh(chains=4, data=2)
        theta0 = 0.1 * jax.random.normal(jax.random.key(7), (8, 3))
        r_full = run_chees_sharded(key, std_normal, theta0, config, mesh,
                                   num_chains=8)
        r_thin = run_chees_sharded(
            key, std_normal, theta0,
            dataclasses.replace(config, thin=3), mesh, num_chains=8,
        )
        assert r_thin.samples.shape == (8, 8, 3)
        np.testing.assert_array_equal(
            np.asarray(r_thin.samples), np.asarray(r_full.samples[:, 2::3])
        )

    def test_sharded_chees_checkpoint_resume_matches_direct(self, key, tmp_path):
        """run_chees_checkpointed(mesh=...): chunked + resumed sharded runs
        reproduce the uninterrupted run_chees_sharded stream, and a sharded
        checkpoint refuses to resume into an unsharded run."""
        import pytest

        from hamiltorch_tpu.checkpoint import run_chees_checkpointed
        from hamiltorch_tpu.parallel.sharding import run_chees_sharded
        from hamiltorch_tpu.samplers.chees import ChEESConfig

        full = ChEESConfig(num_samples=60, burn=30, step_size=0.2)
        half = ChEESConfig(num_samples=25, burn=30, step_size=0.2)
        mesh = make_mesh(chains=4, data=2)
        theta0 = 0.1 * jax.random.normal(jax.random.key(42), (8, 3))
        ck = str(tmp_path / "ck")
        # interrupted run, then resume to completion in 25-draw chunks
        run_chees_checkpointed(key, std_normal, theta0, half, ck,
                               num_chains=8, chunk_size=25, mesh=mesh)
        r_resumed = run_chees_checkpointed(key, std_normal, theta0, full, ck,
                                           num_chains=8, chunk_size=25,
                                           mesh=mesh)
        r_direct = run_chees_sharded(key, std_normal, theta0, full, mesh,
                                     num_chains=8)
        np.testing.assert_allclose(
            np.asarray(r_resumed.samples), np.asarray(r_direct.samples),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            float(r_resumed.final_trajectory_length),
            float(r_direct.final_trajectory_length),
            rtol=1e-5,
        )
        # the sharded stream is NOT the unsharded stream: refuse the splice
        with pytest.raises(ValueError, match="fingerprint"):
            run_chees_checkpointed(key, std_normal, theta0, full, ck,
                                   num_chains=8, chunk_size=25)

    def test_sharded_chees_adapt_mass_moments(self, key):
        """Windowed cross-chain mass adaptation under the mesh: the Welford
        merge psums across devices; the badly scaled target still mixes."""
        from hamiltorch_tpu.parallel.sharding import run_chees_sharded
        from hamiltorch_tpu.samplers.chees import ChEESConfig

        scales = jnp.asarray([0.1, 1.0, 10.0])

        def scaled(theta):
            return -0.5 * jnp.sum((theta / scales) ** 2)

        config = ChEESConfig(num_samples=500, burn=300, step_size=0.1,
                             adapt_mass=True)
        mesh = make_mesh(chains=8, data=1)
        result = run_chees_sharded(
            key, scaled, jnp.zeros(3), config, mesh, num_chains=16
        )
        kept = np.asarray(result.samples[:, 300:]).reshape(-1, 3)
        np.testing.assert_allclose(kept.mean(0), [0, 0, 0], atol=0.6)
        np.testing.assert_allclose(kept.std(0), np.asarray(scales), rtol=0.35)
        # the adapted inverse mass should track the marginal variances
        inv_diag = np.asarray(result.final_carry.metric)
        assert inv_diag[2] / inv_diag[0] > 50.0


@pytest.mark.slow
class TestChEESDataSharding:
    def test_chains_by_data_matches_local_fullbatch(self, key):
        """ChEES over BOTH axes (chains-sharded ensemble x data-sharded
        likelihood) matches a local full-batch run with the same chain keys."""
        from hamiltorch_tpu.ops.mass import make_mass
        from hamiltorch_tpu.parallel.sharding import sample_chees_sharded
        from hamiltorch_tpu.samplers.chees import ChEESConfig, _run_chees_jit

        rng = np.random.RandomState(1)
        x = rng.randn(64, 3).astype(np.float32)
        w_true = np.array([1.0, -2.0, 0.5], np.float32)
        y = (x @ w_true + 0.3 * rng.randn(64)).astype(np.float32)

        def loglik_shard(theta, xs, ys):
            return -0.5 * jnp.sum((xs @ theta - ys) ** 2)

        def log_prior(theta):
            return -0.5 * jnp.dot(theta, theta)

        config = ChEESConfig(num_samples=30, burn=15, step_size=0.05,
                             init_trajectory_length=0.3)
        mesh = make_mesh(chains=4, data=2)
        theta0 = 0.1 * jax.random.normal(jax.random.key(5), (8, 3))
        r_shard = sample_chees_sharded(
            key, loglik_shard, log_prior, x, y, theta0, config, mesh,
            num_chains=8,
        )

        def full_lp(theta):
            return log_prior(theta) + loglik_shard(theta, jnp.asarray(x), jnp.asarray(y))

        chain_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), 8)
        r_local = _run_chees_jit(
            key, theta0, full_lp, config, make_mass(None, 3),
            chain_keys=chain_keys,
        )
        np.testing.assert_allclose(
            np.asarray(r_shard.samples[:, :10]),
            np.asarray(r_local.samples[:, :10]), atol=1e-4,
        )
        # posterior should concentrate near the true weights
        post = np.asarray(r_shard.samples[:, 15:]).reshape(-1, 3)
        np.testing.assert_allclose(post.mean(0), w_true, atol=0.25)


@pytest.mark.slow
class TestNUTSSharding:
    def test_sharded_nuts_matches_vmap(self, key):
        from hamiltorch_tpu.parallel.sharding import run_nuts_chains_sharded
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_chains

        config = NUTSConfig(num_samples=30, step_size=0.4, burn=10)
        mesh = make_mesh(chains=4, data=2)
        r_shard, i_shard = run_nuts_chains_sharded(
            key, std_normal, jnp.zeros(2), config, mesh, num_chains=8
        )
        r_vmap, i_vmap = run_nuts_chains(key, std_normal, jnp.zeros(2), config, num_chains=8)
        # sharded vs unsharded compilations reorder f32 ops slightly
        np.testing.assert_allclose(
            np.asarray(r_shard.samples), np.asarray(r_vmap.samples), atol=1e-3
        )
        depths_equal = np.mean(
            np.asarray(i_shard.tree_depth) == np.asarray(i_vmap.tree_depth)
        )
        assert depths_equal > 0.9

    def test_sharded_ensemble_matches_local(self, key):
        """Same per-chain keys -> same pooled-adaptation stream: the mesh
        run only swaps local reductions for psums."""
        from hamiltorch_tpu.ops.mass import make_mass
        from hamiltorch_tpu.parallel.sharding import run_nuts_ensemble_sharded
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, _run_nuts_ensemble_jit

        config = NUTSConfig(num_samples=60, step_size=0.3, burn=30,
                            adapt_mass=True)
        mesh = make_mesh(chains=8, data=1)
        theta0 = 0.1 * jax.random.normal(jax.random.key(5), (8, 3))
        r_shard, i_shard = run_nuts_ensemble_sharded(
            key, std_normal, theta0, config, mesh, num_chains=8
        )
        chain_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), 8)
        r_local, i_local = _run_nuts_ensemble_jit(
            key, theta0, std_normal, config, make_mass(None, 3),
            chain_keys=chain_keys,
        )
        # early draws agree to f32 reduction-order noise (psum vs local sum);
        # later draws drift as the shared adaptive step size amplifies it
        np.testing.assert_allclose(
            np.asarray(r_shard.samples[:, :10]),
            np.asarray(r_local.samples[:, :10]),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(r_shard.final_warm[1]),
            np.asarray(r_local.final_warm[1]),
            rtol=0.05,
        )

    def test_sharded_ensemble_checkpoint_matches_direct(self, key, tmp_path):
        """run_nuts_ensemble_checkpointed(mesh=...): chunked + resumed
        sharded pooled runs reproduce the direct sharded stream."""
        from hamiltorch_tpu.checkpoint import run_nuts_ensemble_checkpointed
        from hamiltorch_tpu.parallel.sharding import run_nuts_ensemble_sharded
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        full = NUTSConfig(num_samples=60, step_size=0.3, burn=30,
                          adapt_mass=True)
        half = NUTSConfig(num_samples=25, step_size=0.3, burn=30,
                          adapt_mass=True)
        mesh = make_mesh(chains=8, data=1)
        theta0 = 0.1 * jax.random.normal(jax.random.key(5), (8, 3))
        ck = str(tmp_path / "ck")
        run_nuts_ensemble_checkpointed(key, std_normal, theta0, half, ck,
                                       num_chains=8, chunk_size=25, mesh=mesh)
        r_res, _ = run_nuts_ensemble_checkpointed(
            key, std_normal, theta0, full, ck, num_chains=8, chunk_size=25,
            mesh=mesh,
        )
        r_dir, _ = run_nuts_ensemble_sharded(
            key, std_normal, theta0, full, mesh, num_chains=8
        )
        np.testing.assert_allclose(
            np.asarray(r_res.samples), np.asarray(r_dir.samples), atol=1e-5
        )

    def test_sharded_ensemble_pooled_dense_adaptation(self, key):
        """adapt_mass='dense' across the mesh: the psum'd covariance merge
        learns a rho=0.95 metric from 8 chains x 160 burn draws."""
        from hamiltorch_tpu.parallel.sharding import run_nuts_ensemble_sharded
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        cov = jnp.asarray([[1.0, 0.95], [0.95, 1.0]])
        prec = jnp.linalg.inv(cov)
        lp = lambda t: -0.5 * t @ prec @ t
        config = NUTSConfig(num_samples=300, step_size=0.2, burn=160,
                            adapt_mass="dense")
        mesh = make_mesh(chains=8, data=1)
        r, info = run_nuts_ensemble_sharded(
            key, lp, jnp.zeros(2), config, mesh, num_chains=16
        )
        inv_cov = np.asarray(r.final_warm[1][0])
        corr = inv_cov[0, 1] / np.sqrt(inv_cov[0, 0] * inv_cov[1, 1])
        assert corr > 0.8, corr
        kept = np.asarray(r.samples[:, 160:]).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(kept.T), np.asarray(cov), atol=0.2)


@pytest.mark.slow
class TestNUTSDataSharding:
    def test_pooled_ensemble_chains_by_data(self, key):
        """Pooled ensemble NUTS over BOTH axes: the data psum rebuilds the
        exact potential while pooled adaptation psums over chains."""
        from hamiltorch_tpu.parallel.sharding import (
            sample_nuts_ensemble_sharded,
        )
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_ensemble

        x = jax.random.normal(jax.random.key(1), (32, 3))
        y = jnp.sum(x, axis=1, keepdims=True)

        def loglik_shard(theta, xs, ys):
            return -0.5 * jnp.sum((xs @ theta[:, None] - ys) ** 2)

        def log_prior(theta):
            return -0.5 * jnp.dot(theta, theta)

        def full_lp(theta):
            return log_prior(theta) + loglik_shard(theta, x, y)

        config = NUTSConfig(num_samples=40, step_size=0.1, burn=20,
                            adapt_mass=True)
        mesh = make_mesh(chains=4, data=2)
        theta0 = 0.1 * jax.random.normal(jax.random.key(5), (8, 3))
        r_mesh, _ = sample_nuts_ensemble_sharded(
            key, loglik_shard, log_prior, x, y, theta0, config, mesh,
            num_chains=8,
        )
        r_ref, _ = run_nuts_ensemble(key, full_lp, theta0, config,
                                     num_chains=8)
        assert r_mesh.samples.shape == (8, 40, 3)
        # raw trajectories are chaotic under psum-vs-local f32 reduction
        # order (one flipped tree decision makes them diverge O(1)), so
        # compare the pooled ADAPTATION PRODUCTS and posterior statistics
        np.testing.assert_allclose(
            np.asarray(r_mesh.final_warm[1]),
            np.asarray(r_ref.final_warm[1]), rtol=0.1,
        )
        np.testing.assert_allclose(
            float(r_mesh.final_step_size), float(r_ref.final_step_size),
            rtol=0.1,
        )
        post_mesh = np.asarray(r_mesh.samples[:, 20:]).reshape(-1, 3)
        post_ref = np.asarray(r_ref.samples[:, 20:]).reshape(-1, 3)
        np.testing.assert_allclose(
            post_mesh.mean(0), post_ref.mean(0), atol=0.1
        )

    def test_chains_by_data_matches_replicated(self, key):
        """NUTS over the chains x data mesh == replicated-potential NUTS on
        the same full batch (psum'd likelihood value and gradient)."""
        from hamiltorch_tpu.parallel.sharding import (
            run_nuts_chains_sharded,
            sample_nuts_chains_sharded,
        )
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        x = jax.random.normal(jax.random.key(1), (32, 3))
        y = jnp.sum(x, axis=1, keepdims=True)

        def loglik_shard(theta, xs, ys):
            out = xs @ theta[:, None]
            return -0.5 * jnp.sum((out - ys) ** 2)

        def log_prior(theta):
            return -0.5 * jnp.dot(theta, theta)

        def full_lp(theta):
            return log_prior(theta) + loglik_shard(theta, x, y)

        config = NUTSConfig(num_samples=25, step_size=0.1, burn=10)
        mesh = make_mesh(chains=4, data=2)
        r_data, i_data = sample_nuts_chains_sharded(
            key, loglik_shard, log_prior, x, y, jnp.zeros(3), config, mesh,
            num_chains=8,
        )
        r_rep, i_rep = run_nuts_chains_sharded(
            key, full_lp, jnp.zeros(3), config, mesh, num_chains=8
        )
        assert r_data.samples.shape == (8, 25, 3)
        np.testing.assert_allclose(
            np.asarray(r_data.samples), np.asarray(r_rep.samples), atol=1e-3
        )


@pytest.mark.slow
class TestRMHMCSharding:
    def test_sharded_rmhmc_matches_vmap(self, key):
        from hamiltorch_tpu.parallel.sharding import run_rmhmc_chains_sharded
        from hamiltorch_tpu.samplers.rmhmc import run_rmhmc_chains

        prec = jnp.asarray([[1.5625, -0.9375], [-0.9375, 1.5625]])
        lp = lambda t: -0.5 * t @ prec @ t
        config = MCMCConfig(num_samples=30, num_steps_per_sample=4,
                            step_size=0.3)
        kw = dict(fixed_point_threshold=1e-10, fixed_point_max_iterations=20)
        mesh = make_mesh(chains=8, data=1)
        r_shard = run_rmhmc_chains_sharded(
            key, lp, jnp.zeros(2), config, mesh, num_chains=8, **kw
        )
        r_vmap = run_rmhmc_chains(key, lp, jnp.zeros(2), config,
                                  num_chains=8, **kw)
        assert r_shard.samples.shape == (8, 30, 2)
        np.testing.assert_allclose(
            np.asarray(r_shard.samples), np.asarray(r_vmap.samples), atol=1e-4
        )

    def test_unknown_option_rejected(self, key):
        import pytest

        from hamiltorch_tpu.parallel.sharding import run_rmhmc_chains_sharded

        mesh = make_mesh(chains=8, data=1)
        with pytest.raises(TypeError, match="unknown RMHMC options"):
            run_rmhmc_chains_sharded(
                key, std_normal, jnp.zeros(2), MCMCConfig(num_samples=4),
                mesh, num_chains=8, bogus=1,
            )


class TestMultihostHelpers:
    """Single-process surface of parallel/multihost.py.  The actual
    jax.distributed wiring is exercised on a real 2-process localhost
    cluster in tests/test_multihost.py."""

    def test_initialize_single_process_noop(self):
        from hamiltorch_tpu.parallel.multihost import initialize_multihost

        info = initialize_multihost()
        assert info["process_count"] == 1
        assert info["global_devices"] == 8

    def test_global_chain_mesh_geometry(self):
        from hamiltorch_tpu.parallel.multihost import global_chain_mesh

        mesh = global_chain_mesh(data_parallelism=2)
        assert mesh.shape == {"chains": 4, "data": 2}
        with pytest.raises(ValueError):
            global_chain_mesh(data_parallelism=3)

    def test_global_mesh_runs_chains(self, key):
        from hamiltorch_tpu.parallel.multihost import global_chain_mesh
        from hamiltorch_tpu.parallel.sharding import run_hmc_chains_sharded

        mesh = global_chain_mesh(data_parallelism=1)
        config = MCMCConfig(num_samples=10, num_steps_per_sample=3, step_size=0.2)
        r = run_hmc_chains_sharded(key, std_normal, jnp.zeros(2), config, mesh,
                                   num_chains=8)
        assert r.samples.shape == (8, 10, 2)


@pytest.mark.slow
class TestPTSharding:
    def test_sharded_matches_vmapped(self, key):
        """Mesh-sharded ensembles == the single-device vmapped runner."""
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_pt_sharded
        from hamiltorch_tpu.samplers.tempering import PTConfig, run_pt_chains

        lp = lambda t: jnp.logaddexp(
            -0.5 * jnp.sum((t - 2.0) ** 2), -0.5 * jnp.sum((t + 2.0) ** 2)
        )
        cfg = PTConfig(num_samples=24, num_steps_per_sample=5, step_size=0.3,
                       num_temps=4, burn=8, adapt_ladder=True)
        mesh = make_mesh(chains=8)
        r_sharded = run_pt_sharded(key, lp, jnp.zeros(2), cfg, mesh,
                                   num_ensembles=8)
        r_vmap = run_pt_chains(key, lp, jnp.zeros(2), cfg, num_ensembles=8)
        assert r_sharded.samples.shape == (8, 16, 2)
        np.testing.assert_allclose(
            np.asarray(r_sharded.replica_samples),
            np.asarray(r_vmap.replica_samples), atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(r_sharded.info.betas), np.asarray(r_vmap.info.betas),
            rtol=1e-5,
        )

    def test_pytree_sharded_matches_vmapped(self, key):
        """Pytree ladders over the mesh (VERDICT r3 item 4): leaves shard
        along the ensemble axis; matches the local vmapped pytree run."""
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_pt_sharded
        from hamiltorch_tpu.samplers.tempering import PTConfig, run_pt_chains

        def lp(t):
            return jnp.logaddexp(
                -0.5 * jnp.sum((t["a"] - 2.0) ** 2),
                -0.5 * jnp.sum((t["a"] + 2.0) ** 2),
            ) - 0.5 * jnp.sum(t["b"] ** 2)

        t0 = {"a": jnp.zeros(1), "b": jnp.zeros((2, 1))}
        cfg = PTConfig(num_samples=24, num_steps_per_sample=5, step_size=0.3,
                       num_temps=4, burn=8, adapt_ladder=True)
        mesh = make_mesh(chains=8)
        r_sharded = run_pt_sharded(key, lp, t0, cfg, mesh, num_ensembles=8)
        r_vmap = run_pt_chains(key, lp, t0, cfg, num_ensembles=8)
        assert r_sharded.samples["a"].shape == (8, 16, 1)
        assert r_sharded.replica_samples["b"].shape == (8, 16, 4, 2, 1)
        for k in ("a", "b"):
            np.testing.assert_allclose(
                np.asarray(r_sharded.replica_samples[k]),
                np.asarray(r_vmap.replica_samples[k]), atol=1e-4,
            )

    def test_data_sharded_pt_matches_local_full_batch(self, key):
        """sample_pt_sharded (ladders over 'chains', likelihood psum over
        'data') == run_pt_chains on the equivalent full-data potential —
        exact replica exchange on partitioned datasets."""
        from hamiltorch_tpu.parallel.sharding import make_mesh, sample_pt_sharded
        from hamiltorch_tpu.samplers.tempering import PTConfig, run_pt_chains

        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.randn(64, 2), jnp.float32)
        y = jnp.asarray(
            (x @ np.array([1.0, -1.0], np.float32) + 0.3 * rs.randn(64)), jnp.float32
        )

        def loglik_shard(theta, xs, ys):
            pred = xs @ theta
            return -0.5 * 10.0 * jnp.sum((pred - ys) ** 2)

        log_prior = lambda t: -0.5 * jnp.sum(t**2)
        full_lp = lambda t: log_prior(t) + loglik_shard(t, x, y)

        cfg = PTConfig(num_samples=24, num_steps_per_sample=5, step_size=0.05,
                       num_temps=4, burn=8, adapt_ladder=True)
        mesh = make_mesh(chains=4, data=2)
        r_sharded = sample_pt_sharded(
            key, loglik_shard, log_prior, x, y, jnp.zeros(2), cfg, mesh,
            num_ensembles=4,
        )
        r_local = run_pt_chains(key, full_lp, jnp.zeros(2), cfg, num_ensembles=4)
        assert r_sharded.samples.shape == (4, 16, 2)
        np.testing.assert_allclose(
            np.asarray(r_sharded.replica_samples),
            np.asarray(r_local.replica_samples), atol=1e-4,
        )
        # psum reduction order differs from the local sum by ~1 ulp, which
        # the Vousden ladder adaptation amplifies slightly
        np.testing.assert_allclose(
            np.asarray(r_sharded.info.betas), np.asarray(r_local.info.betas),
            rtol=1e-4,
        )


@pytest.mark.slow
class TestPytreeChEESSharding:
    def test_sharded_tree_matches_local_tree(self, key):
        """Pytree ensemble over the mesh: leaves shard along their chain
        axis; same per-chain keys -> same draws up to psum-vs-local
        reduction order."""
        from hamiltorch_tpu.ops.mass import make_mass_tree
        from hamiltorch_tpu.parallel.sharding import run_chees_sharded
        from hamiltorch_tpu.samplers.chees import ChEESConfig, _run_chees_jit

        def lp(t):
            return (-0.5 * jnp.sum(t["w"] ** 2)
                    - 0.5 * jnp.sum((t["b"] / 2.0) ** 2))

        config = ChEESConfig(num_samples=40, burn=20, step_size=0.2,
                             adapt_mass=True)
        mesh = make_mesh(chains=4, data=2)
        t0 = {"w": 0.1 * jax.random.normal(jax.random.key(42), (8, 3)),
              "b": 0.1 * jax.random.normal(jax.random.key(43), (8, 2, 1))}
        r_shard = run_chees_sharded(key, lp, t0, config, mesh, num_chains=8)
        assert r_shard.samples["w"].shape == (8, 40, 3)
        assert r_shard.samples["b"].shape == (8, 40, 2, 1)
        chain_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), 8)
        mass = make_mass_tree(None, {"w": jnp.zeros(3), "b": jnp.zeros((2, 1))})
        r_local = _run_chees_jit(key, t0, lp, config, mass,
                                 chain_keys=chain_keys)
        for k in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(r_shard.samples[k][:, :10]),
                np.asarray(r_local.samples[k][:, :10]), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(r_shard.samples[k]),
                np.asarray(r_local.samples[k]), atol=2e-2)
        np.testing.assert_allclose(
            float(r_shard.final_trajectory_length),
            float(r_local.final_trajectory_length), rtol=0.05)


@pytest.mark.slow
class TestPytreeNUTSSharding:
    def tree_lp(self, t):
        return (-0.5 * jnp.sum(t["w"] ** 2)
                - 0.5 * jnp.sum((t["b"] / 2.0) ** 2))

    def test_sharded_pooled_ensemble_matches_local(self, key):
        from hamiltorch_tpu.parallel.sharding import run_nuts_ensemble_sharded
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_ensemble

        cfg = NUTSConfig(num_samples=40, burn=20, step_size=0.3,
                         adapt_mass=True)
        mesh = make_mesh(chains=4, data=2)
        t0 = {"w": jnp.zeros(3), "b": jnp.zeros((2, 1))}
        r_sh, _ = run_nuts_ensemble_sharded(key, self.tree_lp, t0, cfg, mesh,
                                            num_chains=8)
        assert r_sh.samples["w"].shape == (8, 40, 3)
        assert r_sh.samples["b"].shape == (8, 40, 2, 1)
        r_lo, _ = run_nuts_ensemble(key, self.tree_lp, t0, cfg, num_chains=8)
        for k in ("w", "b"):
            np.testing.assert_allclose(
                np.asarray(r_sh.samples[k][:, :10]),
                np.asarray(r_lo.samples[k][:, :10]), atol=1e-5)

    def test_sharded_tree_chains_statistics(self, key):
        from hamiltorch_tpu.parallel.sharding import (
            run_hmc_chains_sharded,
            run_nuts_chains_sharded,
        )
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        mesh = make_mesh(chains=4, data=2)
        t0 = {"w": jnp.zeros(3), "b": jnp.zeros((2, 1))}
        r, _ = run_nuts_chains_sharded(
            key, self.tree_lp, t0, NUTSConfig(num_samples=400, burn=100,
                                              step_size=0.3),
            mesh, num_chains=8)
        b = np.asarray(r.samples["b"][:, 200:]).reshape(-1, 2)
        np.testing.assert_allclose(b.std(0), 2.0, rtol=0.3)
        r2 = run_hmc_chains_sharded(
            key, self.tree_lp, t0,
            MCMCConfig(num_samples=400, num_steps_per_sample=5, step_size=0.3),
            mesh, num_chains=8)
        b2 = np.asarray(r2.samples["b"][:, 200:]).reshape(-1, 2)
        np.testing.assert_allclose(b2.std(0), 2.0, rtol=0.3)


class TestTISharding:
    def test_data_sharded_ti_matches_local(self, key):
        """run_ti_sharded (likelihood psum over 'data', ladder replicated)
        == local run_ti on the gathered dataset: identical draws and
        identical evidence estimates up to f32 summation order."""
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_ti_sharded
        from hamiltorch_tpu.samplers.ti import TIConfig, run_ti

        rs = np.random.RandomState(11)
        x = jnp.asarray(rs.randn(64, 2), jnp.float32)
        y = jnp.asarray(
            (x @ np.array([0.5, -1.0], np.float32) + 0.2 * rs.randn(64)),
            jnp.float32,
        )

        def loglik_shard(theta, xs, ys):
            return -0.5 * 10.0 * jnp.sum((xs @ theta - ys) ** 2)

        log_prior = lambda t: -0.5 * jnp.sum(t**2) - jnp.log(2 * jnp.pi)
        full_lik = lambda t: loglik_shard(t, x, y)

        # short window: the psum reduction order differs from the local
        # sum by ~1 ulp of an O(100) log-lik, which chaotic trajectories
        # amplify over long runs (verified 1-ulp draw agreement at 8
        # draws; the PT data-sharding test uses the same budget)
        cfg = TIConfig(num_samples=24, num_steps_per_sample=5, step_size=0.1,
                       num_temps=6, burn=8)
        mesh = make_mesh(chains=2, data=4)
        r_sh = run_ti_sharded(key, log_prior, loglik_shard, x, y,
                              jnp.zeros(2), cfg, mesh)
        r_lo = run_ti(key, log_prior, full_lik, jnp.zeros(2), cfg)
        np.testing.assert_allclose(np.asarray(r_sh.samples),
                                   np.asarray(r_lo.samples), atol=1e-3)
        np.testing.assert_allclose(float(r_sh.log_evidence),
                                   float(r_lo.log_evidence), atol=0.1)
        np.testing.assert_allclose(np.asarray(r_sh.info.step_sizes),
                                   np.asarray(r_lo.info.step_sizes),
                                   rtol=2e-3)

    def test_indivisible_data_rejected(self, key):
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_ti_sharded
        from hamiltorch_tpu.samplers.ti import TIConfig

        mesh = make_mesh(chains=2, data=4)
        with pytest.raises(ValueError, match="divisible"):
            run_ti_sharded(
                key, lambda t: 0.0, lambda t, xs, ys: 0.0,
                jnp.zeros((6, 1)), jnp.zeros(6), jnp.zeros(2),
                TIConfig(num_samples=10, num_temps=4, burn=2), mesh,
            )


@pytest.mark.slow
class TestMCLMCSharding:
    def test_sharded_chains_match_local(self, key):
        """Chain-only mesh sharding matches the local vmapped run on the
        same chain keys up to f32 rounding (shard_map compiles a different
        XLA program; the chaotic dynamics amplify ~1-ulp fusion
        differences, so keep the horizon short)."""
        from hamiltorch_tpu.parallel.sharding import run_mclmc_sharded
        from hamiltorch_tpu.samplers.mclmc import MCLMCConfig, run_mclmc_chains

        cfg = MCLMCConfig(num_samples=10, tune_steps=0, step_size=0.1,
                          trajectory_length=1.5)
        mesh = make_mesh(chains=8, data=1)
        r_shard = run_mclmc_sharded(key, std_normal, jnp.zeros(3) + 0.2,
                                    cfg, mesh, num_chains=16)
        r_local = run_mclmc_chains(key, std_normal, jnp.zeros(3) + 0.2,
                                   cfg, num_chains=16)
        np.testing.assert_allclose(np.asarray(r_shard.samples),
                                   np.asarray(r_local.samples), atol=1e-4)

    def test_sharded_pytree(self, key):
        from hamiltorch_tpu.parallel.sharding import run_mclmc_sharded
        from hamiltorch_tpu.samplers.mclmc import MCLMCConfig, run_mclmc_chains

        tree0 = {"a": jnp.zeros((3,)), "b": jnp.ones(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + t["b"] ** 2)

        cfg = MCLMCConfig(num_samples=30, tune_steps=0, step_size=0.1,
                          trajectory_length=1.5)
        mesh = make_mesh(chains=4, data=2)
        r_shard = run_mclmc_sharded(key, lp, tree0, cfg, mesh, num_chains=8)
        r_local = run_mclmc_chains(key, lp, tree0, cfg, num_chains=8)
        assert r_shard.samples["a"].shape == (8, 30, 3)
        for a, b in zip(jax.tree_util.tree_leaves(r_shard.samples),
                        jax.tree_util.tree_leaves(r_local.samples)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)

    def test_data_sharded_matches_fullbatch(self, key):
        """chains x data mesh: the psum-completed full-batch gradient
        reproduces the local gathered-data run (f32 summation order is
        the only difference; a tame posterior keeps it from amplifying)."""
        from hamiltorch_tpu.parallel.sharding import sample_mclmc_sharded
        from hamiltorch_tpu.samplers.mclmc import MCLMCConfig, run_mclmc_chains

        rng = np.random.RandomState(1)
        x = rng.randn(64, 3).astype(np.float32)
        w = np.array([1.0, -2.0, 0.5], np.float32)
        y = (x @ w + 0.5 * rng.randn(64)).astype(np.float32)

        def ll(theta, xs, ys):
            return -0.5 * jnp.sum((xs @ theta - ys) ** 2)

        def prior(theta):
            return -0.5 * jnp.dot(theta, theta)

        full = lambda t: prior(t) + ll(t, jnp.asarray(x), jnp.asarray(y))
        # fixed (eps, L): the comparison isolates the psum'd gradient from
        # tuning-path rounding drift; short horizon bounds amplification
        cfg = MCLMCConfig(num_samples=10, tune_steps=0, step_size=0.02,
                          trajectory_length=1.0)
        mesh = make_mesh(chains=2, data=4)
        r_shard = sample_mclmc_sharded(key, ll, prior, x, y, jnp.zeros(3),
                                       cfg, mesh, num_chains=4)
        r_local = run_mclmc_chains(key, full, jnp.zeros(3), cfg,
                                   num_chains=4)
        np.testing.assert_allclose(np.asarray(r_shard.samples),
                                   np.asarray(r_local.samples), atol=2e-4)

    def test_sharded_tuned_moments(self, key):
        """Per-chain (eps, L) tuning under shard_map: pooled sharded
        chains recover the target's marginals."""
        from hamiltorch_tpu.parallel.sharding import run_mclmc_sharded
        from hamiltorch_tpu.samplers.mclmc import MCLMCConfig

        stds = jnp.array([0.5, 1.0, 2.0])
        lp = lambda t: -0.5 * jnp.sum((t / stds) ** 2)
        cfg = MCLMCConfig(num_samples=800, tune_steps=400)
        mesh = make_mesh(chains=4, data=2)
        r = run_mclmc_sharded(key, lp, jnp.zeros(3) + 0.1, cfg, mesh,
                              num_chains=8)
        assert r.samples.shape == (8, 800, 3)
        pooled = np.asarray(r.samples).reshape(-1, 3)
        np.testing.assert_allclose(pooled.std(0), np.asarray(stds),
                                   rtol=0.15)
        assert r.step_size.shape == (8,)
        assert bool(np.all(np.asarray(r.step_size) > 0))

    def test_chains_not_divisible_raises(self, key):
        from hamiltorch_tpu.parallel.sharding import run_mclmc_sharded
        from hamiltorch_tpu.samplers.mclmc import MCLMCConfig

        mesh = make_mesh(chains=4, data=2)
        with pytest.raises(ValueError, match="divisible"):
            run_mclmc_sharded(key, std_normal, jnp.zeros(3),
                              MCLMCConfig(num_samples=10), mesh,
                              num_chains=6)


@pytest.mark.slow
class TestMAMSSharding:
    def test_sharded_chains_match_local(self, key):
        """Chain-only mesh sharding matches the local vmapped run (fixed
        step, short horizon — same f32 cross-program caveat as MCLMC)."""
        from hamiltorch_tpu.parallel.sharding import run_mams_sharded
        from hamiltorch_tpu.samplers.mams import MAMSConfig, run_mams_chains

        cfg = MAMSConfig(num_samples=10, num_steps_per_sample=4,
                         step_size=0.5, adapt_step_size=False)
        mesh = make_mesh(chains=8, data=1)
        r_shard = run_mams_sharded(key, std_normal, jnp.zeros(3) + 0.2,
                                   cfg, mesh, num_chains=16)
        r_local = run_mams_chains(key, std_normal, jnp.zeros(3) + 0.2,
                                  cfg, num_chains=16)
        np.testing.assert_allclose(np.asarray(r_shard.samples),
                                   np.asarray(r_local.samples), atol=1e-4)

    def test_sharded_adapted_moments(self, key):
        """Per-chain dual averaging under shard_map: pooled sharded
        chains recover the target's marginals at the 0.9 acceptance."""
        from hamiltorch_tpu.parallel.sharding import run_mams_sharded
        from hamiltorch_tpu.samplers.mams import MAMSConfig

        stds = jnp.array([0.5, 1.0, 2.0])
        lp = lambda t: -0.5 * jnp.sum((t / stds) ** 2)
        cfg = MAMSConfig(num_samples=800, num_steps_per_sample=8, burn=200)
        mesh = make_mesh(chains=4, data=2)
        r = run_mams_sharded(key, lp, jnp.zeros(3) + 0.1, cfg, mesh,
                             num_chains=8)
        pooled = np.asarray(r.samples[:, 200:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.std(0), np.asarray(stds),
                                   rtol=0.15)
        assert 0.7 < float(np.mean(np.asarray(r.acc_rate))) <= 1.0

    def test_data_sharded_matches_fullbatch(self, key):
        from hamiltorch_tpu.parallel.sharding import sample_mams_sharded
        from hamiltorch_tpu.samplers.mams import MAMSConfig, run_mams_chains

        rng = np.random.RandomState(2)
        x = rng.randn(64, 3).astype(np.float32)
        w = np.array([1.0, -2.0, 0.5], np.float32)
        y = (x @ w + 0.5 * rng.randn(64)).astype(np.float32)

        def ll(theta, xs, ys):
            return -0.5 * jnp.sum((xs @ theta - ys) ** 2)

        def prior(theta):
            return -0.5 * jnp.dot(theta, theta)

        full = lambda t: prior(t) + ll(t, jnp.asarray(x), jnp.asarray(y))
        cfg = MAMSConfig(num_samples=10, num_steps_per_sample=3,
                         step_size=0.02, adapt_step_size=False)
        mesh = make_mesh(chains=2, data=4)
        r_shard = sample_mams_sharded(key, ll, prior, x, y, jnp.zeros(3),
                                      cfg, mesh, num_chains=4)
        r_local = run_mams_chains(key, full, jnp.zeros(3), cfg,
                                  num_chains=4)
        np.testing.assert_allclose(np.asarray(r_shard.samples),
                                   np.asarray(r_local.samples), atol=2e-4)


@pytest.mark.slow
class TestStretchSharding:
    def test_sharded_ensembles_match_local(self, key):
        """Ensemble-level sharding is embarrassingly parallel: each
        sharded ensemble equals a local run from the same ensemble key
        and walker block."""
        from hamiltorch_tpu.parallel.sharding import run_stretch_sharded
        from hamiltorch_tpu.samplers.stretch import (
            StretchConfig,
            run_stretch,
        )

        lp = lambda t: -0.5 * jnp.sum(t**2)
        cfg = StretchConfig(num_samples=20)
        mesh = make_mesh(chains=8, data=1)
        w0 = jax.random.normal(jax.random.PRNGKey(3), (8, 8, 3))
        r = run_stretch_sharded(key, lp, w0, cfg, mesh, num_ensembles=8,
                                num_walkers=8)
        assert r.samples.shape == (8, 20, 8, 3)
        keys = jax.random.split(key, 8)
        r0 = run_stretch(keys[0], lp, w0[0], cfg, num_walkers=8)
        np.testing.assert_allclose(np.asarray(r.samples[0]),
                                   np.asarray(r0.samples), atol=1e-5)

    def test_sharded_moments(self, key):
        from hamiltorch_tpu.parallel.sharding import run_stretch_sharded
        from hamiltorch_tpu.samplers.stretch import StretchConfig

        stds = jnp.array([0.5, 1.0, 2.0])
        lp = lambda t: -0.5 * jnp.sum((t / stds) ** 2)
        mesh = make_mesh(chains=4, data=2)
        r = run_stretch_sharded(key, lp, jnp.zeros(3),
                                StretchConfig(num_samples=1500), mesh,
                                num_ensembles=8, num_walkers=16)
        pooled = np.asarray(r.samples[:, 500:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.std(0), np.asarray(stds),
                                   rtol=0.12)


class TestBarkerSharding:
    def test_sharded_chains_match_local(self, key):
        """Chain-only mesh sharding matches the local vmapped run (fixed
        step, short horizon — same f32 cross-program caveat as MCLMC)."""
        from hamiltorch_tpu.parallel.sharding import run_barker_sharded
        from hamiltorch_tpu.samplers.barker import (
            BarkerConfig,
            run_barker_chains,
        )

        cfg = BarkerConfig(num_samples=20, step_size=0.6,
                           adapt_step_size=False)
        mesh = make_mesh(chains=8, data=1)
        r_shard = run_barker_sharded(key, std_normal, jnp.zeros(3) + 0.2,
                                     cfg, mesh, num_chains=16)
        r_local = run_barker_chains(key, std_normal, jnp.zeros(3) + 0.2,
                                    cfg, num_chains=16)
        np.testing.assert_allclose(np.asarray(r_shard.samples),
                                   np.asarray(r_local.samples), atol=1e-4)

    def test_sharded_adapted_moments(self, key):
        """Per-chain dual averaging + Welford preconditioning under
        shard_map: pooled sharded chains recover anisotropic marginals
        near the 0.574 acceptance target."""
        from hamiltorch_tpu.parallel.sharding import run_barker_sharded
        from hamiltorch_tpu.samplers.barker import BarkerConfig

        stds = jnp.array([0.5, 1.0, 2.0])
        lp = lambda t: -0.5 * jnp.sum((t / stds) ** 2)
        cfg = BarkerConfig(num_samples=4000, burn=1000, adapt_scale=True)
        mesh = make_mesh(chains=4, data=2)
        r = run_barker_sharded(key, lp, jnp.zeros(3) + 0.1, cfg, mesh,
                               num_chains=8)
        pooled = np.asarray(r.samples[:, 1000:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.std(0), np.asarray(stds),
                                   rtol=0.15)
        acc = float(np.mean(np.asarray(r.acc_rate)))
        assert 0.45 < acc < 0.70, acc
