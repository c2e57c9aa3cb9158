"""Tree-doubling NUTS tests: dyadic machinery, statistics, adaptation,
tree-termination behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.nuts import (
    NUTSConfig,
    _popcount,
    run_nuts,
    run_nuts_chains,
)

COV = np.array([[1.0, 0.9], [0.9, 1.0]])
PREC = np.linalg.inv(COV)


def corr_gaussian(theta):
    return -0.5 * theta @ jnp.asarray(PREC, jnp.float32) @ theta


def funnel(theta):
    v, x = theta[0], theta[1:]
    return -0.5 * v**2 / 9.0 - 0.5 * jnp.sum(x**2) * jnp.exp(-v) - 0.5 * (theta.shape[0] - 1) * v


class TestPopcount:
    def test_matches_python(self):
        vals = jnp.arange(0, 1024, dtype=jnp.int32)
        expected = np.array([bin(int(v)).count("1") for v in np.asarray(vals)])
        np.testing.assert_array_equal(np.asarray(jax.vmap(_popcount)(vals)), expected)


@pytest.mark.slow
class TestNUTSStatistics:
    def test_correlated_gaussian_moments(self, key):
        config = NUTSConfig(num_samples=2000, step_size=0.5, burn=500)
        result, info = run_nuts_chains(key, corr_gaussian, jnp.zeros(2), config, num_chains=4)
        samples = np.asarray(result.samples[:, 500:]).reshape(-1, 2)
        np.testing.assert_allclose(samples.mean(0), [0, 0], atol=0.1)
        np.testing.assert_allclose(np.cov(samples.T), COV, atol=0.12)

    def test_tree_depth_dynamic(self, key):
        """Trees must actually terminate via U-turns, not the depth cap."""
        config = NUTSConfig(num_samples=300, step_size=0.25, burn=100, max_tree_depth=10)
        result, info = run_nuts(key, corr_gaussian, jnp.zeros(2), config)
        depths = np.asarray(info.tree_depth[100:])
        assert depths.mean() > 1.0  # trajectories longer than plain 1-step
        assert depths.max() < 10  # U-turn fires before the cap
        assert np.asarray(info.num_leapfrogs[100:]).max() <= 2**10

    def test_adaptation_targets_accept_rate(self, key):
        config = NUTSConfig(num_samples=1200, step_size=2.0, burn=600,
                            desired_accept_rate=0.8)
        result, info = run_nuts(key, corr_gaussian, jnp.zeros(2), config)
        post_alpha = float(np.asarray(info.accept_prob[600:]).mean())
        assert 0.6 < post_alpha < 0.95
        # step size frozen after burn
        ss = np.asarray(info.step_size)
        assert np.allclose(ss[602:], ss[602])

    def test_funnel_explores_neck(self, key):
        """Dynamic trajectories reach the funnel's wide mouth (v > 2) and
        the neck (v < -2); fixed-L HMC at one step size typically cannot."""
        config = NUTSConfig(num_samples=2500, step_size=0.2, burn=500, max_tree_depth=10)
        result, info = run_nuts(key, funnel, jnp.zeros(6), config)
        v = np.asarray(result.samples[500:, 0])
        assert v.max() > 2.0 and v.min() < -2.0
        assert abs(v.mean()) < 1.0
        assert v.std() > 1.5  # true std is 3

    def test_divergences_flagged_on_huge_step(self, key):
        config = NUTSConfig(num_samples=100, step_size=100.0, burn=0,
                            adapt_step_size=False)
        result, info = run_nuts(key, funnel, 0.1 * jnp.ones(4), config)
        assert int(np.asarray(info.divergent).sum()) > 0
        assert bool(jnp.all(jnp.isfinite(result.samples)))

    def test_deterministic_given_key(self, key):
        config = NUTSConfig(num_samples=50, step_size=0.5, burn=10)
        r1, _ = run_nuts(key, corr_gaussian, jnp.zeros(2), config)
        r2, _ = run_nuts(key, corr_gaussian, jnp.zeros(2), config)
        np.testing.assert_array_equal(np.asarray(r1.samples), np.asarray(r2.samples))

    def test_mass_matrix_adaptation_improves_scale(self, key):
        """With adapt_mass the second pass uses warmup variances; on a badly
        scaled Gaussian the adapted run should mix in the narrow direction."""
        scales = jnp.array([0.1, 10.0])

        def lp(theta):
            return -0.5 * jnp.sum((theta / scales) ** 2)

        config = NUTSConfig(num_samples=1200, step_size=0.5, burn=600, adapt_mass=True)
        result, _ = run_nuts(key, lp, jnp.zeros(2), config)
        s = np.asarray(result.samples[700:])
        np.testing.assert_allclose(s.std(0), [0.1, 10.0], rtol=0.35)


@pytest.mark.slow
class TestNUTSChains:
    def test_vmapped_chains(self, key):
        config = NUTSConfig(num_samples=400, step_size=0.5, burn=100)
        result, info = run_nuts_chains(
            key, corr_gaussian, jnp.zeros(2), config, num_chains=4
        )
        assert result.samples.shape == (4, 400, 2)
        pooled = np.asarray(result.samples[:, 100:]).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(pooled.T), COV, atol=0.25)


class TestNUTSViaAPI:
    def test_sample_with_nuts_sampler(self, key):
        import hamiltorch_tpu as ht

        samples, ss = ht.sample(
            corr_gaussian, jnp.zeros(2), num_samples=300, burn=100,
            step_size=0.5, sampler=ht.Sampler.NUTS, debug=2, key=key,
            verbose=False,
        )
        assert samples.shape == (1 + 300 - 100 - 1, 2)
        assert ss > 0.0


class TestWindowedWarmup:
    def test_schedule_structure(self):
        from hamiltorch_tpu.samplers.warmup import build_schedule

        collect, end = build_schedule(600)
        assert not collect[:75].any()  # initial fast interval
        assert not collect[550:].any()  # terminal fast interval
        assert collect[75:550].all()  # slow windows cover the middle
        ends = list(end.nonzero()[0])
        assert ends[0] == 75 + 25 - 1  # first base window
        assert ends[-1] == 549  # last slow draw closes the final window
        # doubling: window lengths 25, 50, 100, then remainder
        assert not build_schedule(100)[0].any()  # too short -> no windows

    def test_welford_matches_numpy(self, key):
        from hamiltorch_tpu.samplers.warmup import (
            welford_init, welford_update, welford_variance,
        )

        xs = np.asarray(jax.random.normal(key, (200, 3))) * np.array([0.5, 1, 2])
        st = welford_init(3)
        for x in xs:
            st = welford_update(st, jnp.asarray(x))
        var_np = xs.var(0, ddof=1)
        reg = (200 / 205) * var_np + 1e-3 * (5 / 205)
        np.testing.assert_allclose(np.asarray(welford_variance(st)), reg, rtol=1e-4)

    def test_welford_cov_batch_merge_matches_sequential(self, key):
        """Chan batch merges (the ensemble pooling path) must agree with
        one-observation-at-a-time covariance updates."""
        from hamiltorch_tpu.samplers.warmup import (
            welford_cov_init,
            welford_cov_merge_batch,
            welford_cov_update,
        )

        xs = np.asarray(jax.random.normal(key, (96, 3))) * np.array([0.5, 1, 2])
        seq = welford_cov_init(3)
        for x in xs:
            seq = welford_cov_update(seq, jnp.asarray(x))
        merged = welford_cov_init(3)
        for chunk in np.split(xs, 8):  # 8 batches of 12, as 8 chains/draw
            merged = welford_cov_merge_batch(merged, jnp.asarray(chunk))
        np.testing.assert_allclose(float(merged.count), float(seq.count))
        np.testing.assert_allclose(
            np.asarray(merged.mean), np.asarray(seq.mean), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(merged.m2), np.asarray(seq.m2), rtol=1e-4, atol=1e-4
        )

    def test_mass_adaptation_fixes_bad_scaling(self, key):
        """On a badly scaled Gaussian, windowed warmup should recover both
        scales; without it the narrow direction dominates the step size."""
        scales = jnp.array([0.05, 20.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        config = NUTSConfig(num_samples=1500, step_size=0.5, burn=700, adapt_mass=True)
        result, info = run_nuts(key, lp, jnp.zeros(2), config)
        s = np.asarray(result.samples[800:])
        np.testing.assert_allclose(s.std(0), [0.05, 20.0], rtol=0.3)
        # adapted trees should be shallow (good preconditioning)
        assert float(np.asarray(info.tree_depth[800:]).mean()) < 6


@pytest.mark.slow
class TestReviewRegressions:
    def test_burn0_default_keeps_step_size(self, key):
        """burn=0 with adaptation enabled must not clobber step_size with
        exp(log_eps_bar)=1 at draw 0 (code-review finding)."""
        config = NUTSConfig(num_samples=30, step_size=0.01)  # burn=0, adapt on
        result, info = run_nuts(key, corr_gaussian, jnp.zeros(2), config)
        ss = np.asarray(info.step_size)
        assert np.allclose(ss, 0.01)

    def test_chees_burn0_default_keeps_step_size(self, key):
        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        config = ChEESConfig(num_samples=20, step_size=0.01)  # burn=0
        result = run_chees(key, corr_gaussian, jnp.zeros(2), config, num_chains=8)
        assert np.allclose(np.asarray(result.info.step_size), 0.01)

    def test_nuts_honors_raw_fn_data_protocol(self, key):
        """Potentials from define_model_log_prob must reach NUTS as jit
        operands (the _raw_fn protocol), not closure constants."""
        from hamiltorch_tpu.ops.potential import resolve_potential

        def raw(theta, data):
            return -0.5 * jnp.dot(theta, theta) * data

        lp = lambda t: raw(t, 2.0)
        lp._raw_fn = raw
        lp._data = jnp.asarray(2.0)
        fn, data = resolve_potential(lp)
        assert fn is raw and float(data) == 2.0
        config = NUTSConfig(num_samples=20, step_size=0.3, burn=5)
        result, _ = run_nuts(key, lp, jnp.zeros(2), config)
        assert bool(jnp.all(jnp.isfinite(result.samples)))

    def test_adapt_mass_seeded_from_diag_inv_mass(self, key):
        """User-provided diagonal inv_mass seeds the adaptive diagonal."""
        scales = jnp.array([0.1, 10.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        config = NUTSConfig(num_samples=60, step_size=0.1, burn=30, adapt_mass=True)
        # burn too short for any window -> inv_diag stays at the seed
        result, info = run_nuts(
            key, lp, jnp.zeros(2), config, inv_mass=jnp.array([0.01, 100.0])
        )
        assert bool(jnp.all(jnp.isfinite(result.samples)))

    def test_adapt_mass_rejects_dense_inv_mass(self, key):
        config = NUTSConfig(num_samples=10, burn=5, adapt_mass=True)
        with pytest.raises(ValueError):
            run_nuts(key, corr_gaussian, jnp.zeros(2), config, inv_mass=jnp.eye(2))


@pytest.mark.slow
class TestEnsembleNUTS:
    def test_pooled_warmup_beats_single_chain_on_short_burn(self, key):
        """With only 120 burn draws, the pooled Welford estimate (16 chains
        -> 16 observations/draw) nails a 100:1 scale ratio that per-chain
        adaptation cannot resolve this fast."""
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_ensemble

        scales = jnp.asarray([0.1, 1.0, 10.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        config = NUTSConfig(num_samples=300, step_size=0.5, burn=160,
                            adapt_mass=True)
        result, info = run_nuts_ensemble(key, lp, jnp.zeros(3), config,
                                         num_chains=16)
        assert result.samples.shape == (16, 300, 3)
        inv = np.asarray(result.final_warm[1])
        assert inv[2] / inv[0] > 100.0  # tracks the 1e4 variance ratio
        kept = np.asarray(result.samples[:, 160:]).reshape(-1, 3)
        np.testing.assert_allclose(kept.std(0), np.asarray(scales), rtol=0.35)

    def test_pooled_dense_warmup_learns_correlation_fast(self, key):
        """adapt_mass='dense' pools the FULL-covariance Welford estimate
        across the ensemble: 8 chains x 160 burn draws resolve a rho=0.95
        metric that a single chain needs ~400 draws for."""
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_ensemble

        cov = jnp.asarray([[1.0, 0.95], [0.95, 1.0]])
        prec = jnp.linalg.inv(cov)
        lp = lambda t: -0.5 * t @ prec @ t
        dense_cfg = NUTSConfig(num_samples=400, step_size=0.2, burn=160,
                               adapt_mass="dense")
        diag_cfg = NUTSConfig(num_samples=400, step_size=0.2, burn=160,
                              adapt_mass=True)
        r, info = run_nuts_ensemble(key, lp, jnp.zeros(2), dense_cfg,
                                    num_chains=8)
        rg, infog = run_nuts_ensemble(key, lp, jnp.zeros(2), diag_cfg,
                                      num_chains=8)
        inv_cov = np.asarray(r.final_warm[1][0])
        corr = inv_cov[0, 1] / np.sqrt(inv_cov[0, 0] * inv_cov[1, 1])
        assert corr > 0.8, corr
        # the matched metric needs far shorter trajectories post-warmup
        leap_dense = float(jnp.mean(info.num_leapfrogs[160:]))
        leap_diag = float(jnp.mean(infog.num_leapfrogs[160:]))
        assert leap_dense < 0.6 * leap_diag, (leap_dense, leap_diag)
        pooled = np.asarray(r.samples[:, 160:]).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(pooled.T), np.asarray(cov), atol=0.2)

    def test_ensemble_progress_every_emits(self, key, capfd):
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_ensemble

        run_nuts_ensemble(key, lambda t: -0.5 * jnp.sum(t**2), jnp.zeros(2),
                          NUTSConfig(num_samples=8, burn=2, progress_every=2),
                          num_chains=4)
        captured = capfd.readouterr()
        assert "Sampling" in captured.out and "Progress" in captured.out

    def test_chees_progress_every_emits(self, key, capfd):
        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        run_chees(key, lambda t: -0.5 * jnp.sum(t**2), jnp.zeros(2),
                  ChEESConfig(num_samples=8, burn=2, progress_every=2),
                  num_chains=4)
        captured = capfd.readouterr()
        assert "Sampling" in captured.out and "Progress" in captured.out

    def test_sharded_runners_warn_not_crash_on_progress(self, key, capfd):
        """Under shard_map progress_every is LOUDLY ignored, not dropped."""
        from hamiltorch_tpu.parallel.sharding import (
            make_mesh,
            run_nuts_chains_sharded,
        )
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        mesh = make_mesh(chains=8, data=1)
        r, _ = run_nuts_chains_sharded(
            key, lambda t: -0.5 * jnp.sum(t**2), jnp.zeros(2),
            NUTSConfig(num_samples=4, burn=2, progress_every=2),
            mesh, num_chains=8,
        )
        assert r.samples.shape == (8, 4, 2)
        captured = capfd.readouterr()
        assert "ignored under shard_map" in captured.err
        assert "Progress" not in captured.out  # no per-device bars

    def test_ensemble_checkpoint_resume_matches_direct(self, key, tmp_path):
        """Chunked + resumed pooled-ensemble NUTS (dense metric) reproduces
        the uninterrupted run draw-for-draw, including the Chan-merged
        covariance warmup."""
        from hamiltorch_tpu.checkpoint import run_nuts_ensemble_checkpointed
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_ensemble

        cov = jnp.asarray([[1.0, 0.9], [0.9, 1.0]])
        prec = jnp.linalg.inv(cov)
        lp = lambda t: -0.5 * t @ prec @ t
        full = NUTSConfig(num_samples=220, step_size=0.3, burn=180,
                          adapt_mass="dense")
        half = NUTSConfig(num_samples=90, step_size=0.3, burn=180,
                          adapt_mass="dense")
        ck = str(tmp_path / "ck")
        run_nuts_ensemble_checkpointed(key, lp, jnp.zeros(2), half, ck,
                                       num_chains=8, chunk_size=40)
        r_res, _ = run_nuts_ensemble_checkpointed(key, lp, jnp.zeros(2), full,
                                                  ck, num_chains=8,
                                                  chunk_size=40)
        r_dir, _ = run_nuts_ensemble(key, lp, jnp.zeros(2), full,
                                     num_chains=8)
        np.testing.assert_allclose(
            np.asarray(r_res.samples), np.asarray(r_dir.samples), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(r_res.final_warm[1][0]),
            np.asarray(r_dir.final_warm[1][0]), rtol=1e-5,
        )

    def test_ensemble_moments_match_target(self, key):
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_ensemble

        config = NUTSConfig(num_samples=400, step_size=0.4, burn=100)
        result, info = run_nuts_ensemble(key, corr_gaussian, jnp.zeros(2),
                                         config, num_chains=8)
        pooled = np.asarray(result.samples[:, 100:]).reshape(-1, 2)
        cov_target = np.linalg.inv(np.asarray(PREC))
        np.testing.assert_allclose(np.cov(pooled.T), cov_target, atol=0.12)
        # chains share one adapted step size (broadcast by the vmapped
        # transition: identical across the chain axis)
        ss = np.asarray(result.stats.step_size)
        assert ss.shape == (400, 8)
        np.testing.assert_array_equal(ss, np.broadcast_to(ss[:, :1], ss.shape))


@pytest.mark.slow
class TestDenseMassWarmup:
    """adapt_mass='dense': full-covariance Stan-style windowed warmup."""

    def setup_method(self):
        cov = jnp.asarray([[1.0, 0.95], [0.95, 1.0]])
        self.prec = jnp.linalg.inv(cov)

    def lp(self, t):
        return -0.5 * t @ self.prec @ t

    def test_learns_correlation_and_beats_diag(self, key):
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts

        dense_cfg = NUTSConfig(num_samples=700, step_size=0.2, burn=400,
                               adapt_mass="dense")
        diag_cfg = NUTSConfig(num_samples=700, step_size=0.2, burn=400,
                              adapt_mass=True)
        r, info = run_nuts(key, self.lp, jnp.zeros(2), dense_cfg)
        rd, infod = run_nuts(key, self.lp, jnp.zeros(2), diag_cfg)
        _, metric, _ = r.final_warm
        inv_cov = np.asarray(metric[0])
        # the adapted metric is the posterior covariance: strong off-diagonal
        corr = inv_cov[0, 1] / np.sqrt(inv_cov[0, 0] * inv_cov[1, 1])
        assert corr > 0.8, corr
        # a metric matched to the correlation needs far shorter trajectories
        leap_dense = float(jnp.mean(info.num_leapfrogs[400:]))
        leap_diag = float(jnp.mean(infod.num_leapfrogs[400:]))
        assert leap_dense < 0.6 * leap_diag, (leap_dense, leap_diag)
        kept = np.asarray(r.samples[400:])
        assert np.all(np.isfinite(kept))

    def test_dense_resume_matches_direct(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_nuts_checkpointed
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts

        full = NUTSConfig(num_samples=220, step_size=0.3, burn=180,
                          adapt_mass="dense")
        half = NUTSConfig(num_samples=90, step_size=0.3, burn=180,
                          adapt_mass="dense")
        ck = str(tmp_path / "ck")
        run_nuts_checkpointed(key, self.lp, jnp.zeros(2), half, ck, chunk_size=40)
        r_resumed = run_nuts_checkpointed(key, self.lp, jnp.zeros(2), full, ck,
                                          chunk_size=40)
        r_direct, _ = run_nuts(key, self.lp, jnp.zeros(2), full)
        np.testing.assert_allclose(
            np.asarray(r_resumed.samples), np.asarray(r_direct.samples),
            atol=1e-5,
        )
        _, m_res, _ = r_resumed.final_warm
        _, m_dir, _ = r_direct.final_warm
        np.testing.assert_allclose(
            np.asarray(m_res[0]), np.asarray(m_dir[0]), rtol=1e-5
        )

    def test_validation(self, key):
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts

        with pytest.raises(ValueError, match="expected False"):
            run_nuts(key, self.lp, jnp.zeros(2),
                     NUTSConfig(num_samples=4, burn=2, adapt_mass="banana"))
        dense_seed = jnp.asarray([[1.0, 0.2], [0.2, 1.0]])
        with pytest.raises(ValueError, match="DIAGONAL"):
            run_nuts(key, self.lp, jnp.zeros(2),
                     NUTSConfig(num_samples=4, burn=2, adapt_mass=True),
                     inv_mass=dense_seed)
        # dense adaptation SEEDS from a dense inv_mass instead of rejecting
        r, _ = run_nuts(key, self.lp, jnp.zeros(2),
                        NUTSConfig(num_samples=8, burn=4, adapt_mass="dense"),
                        inv_mass=dense_seed)
        assert bool(jnp.all(jnp.isfinite(r.samples)))


class TestEntryPointValidation:
    def test_ensemble_rejects_bad_string(self, key):
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_ensemble

        with pytest.raises(ValueError, match="expected False"):
            run_nuts_ensemble(key, lambda t: -0.5 * jnp.sum(t**2), jnp.zeros(2),
                              NUTSConfig(num_samples=4, burn=2, adapt_mass="Dense"),
                              num_chains=4)

    def test_sharded_chains_reject_dense_seed_with_diag_mode(self, key):
        from hamiltorch_tpu.parallel.sharding import make_mesh, run_nuts_chains_sharded
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        mesh = make_mesh(chains=8)
        dense = jnp.eye(2) + 0.1
        with pytest.raises(ValueError, match="DIAGONAL"):
            run_nuts_chains_sharded(key, lambda t: -0.5 * jnp.sum(t**2),
                                    jnp.zeros(2),
                                    NUTSConfig(num_samples=4, burn=2, adapt_mass=True),
                                    mesh, num_chains=8, inv_mass=dense)


@pytest.mark.slow
class TestNUTSThinning:
    def test_thin_matches_full_run_subsample(self, key):
        """thin=k keeps every k-th draw of the identical transition stream."""
        full = NUTSConfig(num_samples=120, step_size=0.4, burn=40)
        thin = NUTSConfig(num_samples=120, step_size=0.4, burn=40, thin=4)
        r_full, _ = run_nuts(key, corr_gaussian, jnp.zeros(2), full)
        r_thin, info_t = run_nuts(key, corr_gaussian, jnp.zeros(2), thin)
        assert r_thin.samples.shape == (30, 2)
        np.testing.assert_array_equal(
            np.asarray(r_thin.samples), np.asarray(r_full.samples[3::4])
        )
        # the same transitions ran: adaptation end state identical
        np.testing.assert_allclose(
            float(r_thin.final_step_size), float(r_full.final_step_size),
            rtol=1e-6,
        )
        # per-window aggregates: leapfrog counts sum over the window
        assert np.asarray(info_t.num_leapfrogs).sum() > 0

    def test_ensemble_trace_shrinks(self, key):
        from hamiltorch_tpu.samplers.nuts import run_nuts_ensemble

        full = NUTSConfig(num_samples=80, step_size=0.4, burn=40,
                          adapt_mass=True)
        thin = NUTSConfig(num_samples=80, step_size=0.4, burn=40,
                          adapt_mass=True, thin=4)
        r_full, _ = run_nuts_ensemble(key, corr_gaussian, jnp.zeros(2), full,
                                      num_chains=6)
        r_thin, _ = run_nuts_ensemble(key, corr_gaussian, jnp.zeros(2), thin,
                                      num_chains=6)
        assert r_thin.samples.shape == (6, 20, 2)
        np.testing.assert_array_equal(
            np.asarray(r_thin.samples), np.asarray(r_full.samples[:, 3::4])
        )

    def test_thin_divisibility_validated(self):
        with pytest.raises(ValueError, match="divisible by thin"):
            NUTSConfig(num_samples=10, thin=3)

    def test_thin_via_facade(self, key):
        import hamiltorch_tpu as ht
        from hamiltorch_tpu.enums import Sampler

        samples = ht.sample(
            corr_gaussian, jnp.zeros(2), num_samples=120, step_size=0.4,
            burn=40, sampler=Sampler.NUTS, key=key, thin=4, verbose=False,
        )
        # [init] + kept rows whose transition index exceeds burn
        assert samples.shape == (21, 2)

    def test_thin_checkpoint_resume(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_nuts_checkpointed

        full = NUTSConfig(num_samples=120, step_size=0.4, burn=40, thin=4)
        half = NUTSConfig(num_samples=48, step_size=0.4, burn=40, thin=4)
        ck = str(tmp_path / "ck")
        run_nuts_checkpointed(key, corr_gaussian, jnp.zeros(2), half, ck,
                              chunk_size=48)
        r_res = run_nuts_checkpointed(key, corr_gaussian, jnp.zeros(2), full,
                                      ck, chunk_size=48)
        r_dir, _ = run_nuts(key, corr_gaussian, jnp.zeros(2), full)
        assert r_res.samples.shape == (30, 2)
        np.testing.assert_allclose(
            np.asarray(r_res.samples), np.asarray(r_dir.samples), atol=1e-5
        )


class TestNUTSEnergyAccounting:
    def test_energy_new_is_accepted_state_hamiltonian(self, key):
        cfg = NUTSConfig(num_samples=200, step_size=0.4, burn=0,
                         adapt_step_size=False)
        result, info = run_nuts(key, corr_gaussian, jnp.zeros(2), cfg)
        e_old = np.asarray(result.stats.energy_old)
        e_new = np.asarray(result.stats.energy_new)
        moved = np.asarray(result.stats.accepted)
        # when the chain moved, the selected leaf's H differs from H0
        assert np.any(moved)
        assert np.all(e_new[moved] != e_old[moved])
        # when it stayed, the energy error is exactly zero
        if np.any(~moved):
            np.testing.assert_array_equal(e_new[~moved], e_old[~moved])
        # trajectory energy errors are small for a well-tuned chain
        assert np.median(np.abs(e_new - e_old)[moved]) < 1.0


@pytest.mark.slow
class TestPytreeNUTS:
    """Pytree-native NUTS: the shape-polymorphic core runs the tree-building
    loop over parameter leaves in their natural shapes (no flat-layout
    slicing tax); warmup moments bridge through one flat view per draw."""

    def tree_lp(self, t):
        prec = jnp.asarray(PREC, jnp.float32)
        return -0.5 * (t["xy"] @ prec @ t["xy"]) - 0.5 * jnp.sum(t["w"] ** 2)

    def test_tree_statistics_single_chain(self, key):
        cfg = NUTSConfig(num_samples=2500, step_size=0.4, burn=500)
        r, info = run_nuts(key, self.tree_lp,
                           {"w": jnp.zeros((1, 3)), "xy": jnp.zeros(2)}, cfg)
        assert r.samples["w"].shape == (2500, 1, 3)
        xy = np.asarray(r.samples["xy"][500:])
        np.testing.assert_allclose(np.cov(xy.T), COV, atol=0.15)
        w = np.asarray(r.samples["w"][500:]).reshape(-1, 3)
        np.testing.assert_allclose(w.std(0), [1, 1, 1], rtol=0.15)
        assert np.asarray(info.tree_depth).max() > 1

    def test_first_draw_matches_flat(self, key):
        """One transition from the same start under the same key: the tree
        and flat paths integrate the same trajectory (float tolerance —
        per-leaf reductions reassociate the flat sums)."""
        flat_lp = lambda v: -0.5 * jnp.sum(v[:3] ** 2) + corr_gaussian(v[3:])
        cfg = NUTSConfig(num_samples=3, step_size=0.3, burn=0,
                         adapt_step_size=False)
        r_flat, _ = run_nuts(key, flat_lp, jnp.zeros(5), cfg)
        r_tree, _ = run_nuts(
            key, self.tree_lp, {"w": jnp.zeros(3), "xy": jnp.zeros(2)}, cfg
        )
        flat_tree = np.concatenate(
            [np.asarray(r_tree.samples["w"]), np.asarray(r_tree.samples["xy"])],
            axis=-1,
        )
        np.testing.assert_allclose(
            flat_tree[0], np.asarray(r_flat.samples)[0], rtol=1e-4, atol=1e-5
        )

    def test_tree_adapt_mass_fixes_bad_scaling(self, key):
        """Windowed diag warmup on a tree state: the flat Welford bridge
        learns per-leaf scales that fixed-metric NUTS at this budget misses."""
        lp = lambda t: (-0.5 * jnp.sum((t["a"] / 0.05) ** 2)
                        - 0.5 * jnp.sum((t["b"] / 20.0) ** 2))
        t0 = {"a": jnp.zeros(2), "b": jnp.zeros((2, 1))}
        cfg = NUTSConfig(num_samples=1200, step_size=0.3, burn=600,
                         adapt_mass=True)
        r, info = run_nuts(key, lp, t0, cfg)
        a = np.asarray(r.samples["a"][800:])
        b = np.asarray(r.samples["b"][800:]).reshape(-1, 2)
        np.testing.assert_allclose(a.std(0), [0.05, 0.05], rtol=0.3)
        np.testing.assert_allclose(b.std(0), [20.0, 20.0], rtol=0.3)
        # the learned flat diagonal (tree-ravel order: a then b) is wildly
        # anisotropic, matching the target scales
        inv = np.asarray(r.final_warm[1])
        assert inv.shape == (4,)
        assert inv[2] / inv[0] > 1e3

    def test_tree_ensemble_pooled_warmup(self, key):
        from hamiltorch_tpu.samplers.nuts import run_nuts_ensemble

        cfg = NUTSConfig(num_samples=600, step_size=0.4, burn=300,
                         adapt_mass=True)
        r, info = run_nuts_ensemble(
            key, self.tree_lp, {"w": jnp.zeros(3), "xy": jnp.zeros(2)}, cfg,
            num_chains=8,
        )
        assert r.samples["w"].shape == (8, 600, 3)
        assert r.samples["xy"].shape == (8, 600, 2)
        xy = np.asarray(r.samples["xy"][:, 400:]).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(xy.T), COV, atol=0.15)

    def test_tree_chains_per_leaf_inv_mass_and_stacked(self, key):
        lp = lambda t: (-0.5 * jnp.sum((t["a"] / 0.1) ** 2)
                        - 0.5 * jnp.sum((t["b"] / 10.0) ** 2))
        inv_mass = {"a": jnp.full((2,), 0.01), "b": jnp.full((2, 1), 100.0)}
        t0 = {"a": jnp.zeros((4, 2)), "b": jnp.zeros((4, 2, 1))}  # stacked
        cfg = NUTSConfig(num_samples=800, step_size=0.5, burn=200)
        r, info = run_nuts_chains(key, lp, t0, cfg, num_chains=4,
                                  inv_mass=inv_mass)
        assert r.samples["a"].shape == (4, 800, 2)
        a = np.asarray(r.samples["a"][:, 300:]).reshape(-1, 2)
        b = np.asarray(r.samples["b"][:, 300:]).reshape(-1, 2)
        np.testing.assert_allclose(a.std(0), [0.1, 0.1], rtol=0.3)
        np.testing.assert_allclose(b.std(0), [10.0, 10.0], rtol=0.3)

    def test_tree_thin(self, key):
        cfg = NUTSConfig(num_samples=300, step_size=0.4, burn=100, thin=3)
        r, info = run_nuts(key, self.tree_lp,
                           {"w": jnp.zeros(3), "xy": jnp.zeros(2)}, cfg)
        assert r.samples["w"].shape == (100, 3)
        assert r.samples["xy"].shape == (100, 2)
        assert bool(np.isfinite(np.asarray(r.samples["xy"])).all())

    def test_tree_rejections(self, key):
        t0 = {"w": jnp.zeros(3), "xy": jnp.zeros(2)}
        with pytest.raises(ValueError, match="dense|pytree"):
            run_nuts(key, self.tree_lp, t0,
                     NUTSConfig(num_samples=10, burn=5, adapt_mass="dense"))
        with pytest.raises(ValueError, match="diagonal"):
            run_nuts(key, self.tree_lp, t0, NUTSConfig(num_samples=10),
                     inv_mass=jnp.eye(5))
        # (pytree PT ensembles were flat-only until round 4; they now run —
        # covered by test_tempering.TestPytreePT)

    def test_tree_ensemble_checkpoint_resume_bit_exact(self, key, tmp_path):
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_nuts_ensemble_checkpointed
        from hamiltorch_tpu.samplers.nuts import run_nuts_ensemble

        t0 = {"w": jnp.zeros(3), "xy": jnp.zeros(2)}
        cfg = NUTSConfig(num_samples=80, step_size=0.3, burn=40,
                         adapt_mass=True)
        r_direct, _ = run_nuts_ensemble(key, self.tree_lp, t0, cfg,
                                        num_chains=8)
        r_ck, _ = run_nuts_ensemble_checkpointed(
            key, self.tree_lp, t0, cfg, str(tmp_path / "a"), num_chains=8,
            chunk_size=40)
        for k in ("w", "xy"):
            np.testing.assert_array_equal(
                np.asarray(r_ck.samples[k]), np.asarray(r_direct.samples[k]))
        run_nuts_ensemble_checkpointed(
            key, self.tree_lp, t0, dataclasses.replace(cfg, num_samples=40),
            str(tmp_path / "b"), num_chains=8, chunk_size=40)
        r_res, _ = run_nuts_ensemble_checkpointed(
            key, self.tree_lp, t0, cfg, str(tmp_path / "b"), num_chains=8,
            chunk_size=40)
        for k in ("w", "xy"):
            np.testing.assert_array_equal(
                np.asarray(r_res.samples[k]), np.asarray(r_direct.samples[k]))

    def test_tree_checkpoint_resume_bit_exact(self, key, tmp_path):
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_nuts_checkpointed

        t0 = {"w": jnp.zeros(3), "xy": jnp.zeros(2)}
        cfg = NUTSConfig(num_samples=90, step_size=0.3, burn=40,
                         adapt_mass=True)
        r_direct, _ = run_nuts(key, self.tree_lp, t0, cfg)
        r_ck = run_nuts_checkpointed(key, self.tree_lp, t0, cfg,
                                     str(tmp_path / "a"), chunk_size=40)
        for k in ("w", "xy"):
            np.testing.assert_array_equal(
                np.asarray(r_ck.samples[k]), np.asarray(r_direct.samples[k]))
        # interrupt (shorter first run) then resume to the full length
        run_nuts_checkpointed(key, self.tree_lp, t0,
                              dataclasses.replace(cfg, num_samples=40),
                              str(tmp_path / "b"), chunk_size=40)
        r_res = run_nuts_checkpointed(key, self.tree_lp, t0, cfg,
                                      str(tmp_path / "b"), chunk_size=40)
        for k in ("w", "xy"):
            np.testing.assert_array_equal(
                np.asarray(r_res.samples[k]), np.asarray(r_direct.samples[k]))
