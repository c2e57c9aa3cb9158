"""Diagnostics and checkpoint/resume tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.diagnostics import (
    effective_sample_size,
    potential_scale_reduction,
    summary,
)
from hamiltorch_tpu.samplers.driver import MCMCConfig


@pytest.mark.slow
class TestESS:
    def test_iid_samples(self, key):
        x = jax.random.normal(key, (4, 1000, 3))
        ess = np.asarray(effective_sample_size(x))
        # iid: ESS should be near the total draw count
        assert np.all(ess > 2000) and np.all(ess < 8000)

    def test_ar1_autocorrelation(self, key):
        """AR(1) with coefficient phi has ESS ~ N (1-phi)/(1+phi)."""
        phi = 0.9
        n, c = 4000, 4
        eps = np.asarray(jax.random.normal(key, (c, n)))
        x = np.zeros((c, n))
        for t in range(1, n):
            x[:, t] = phi * x[:, t - 1] + np.sqrt(1 - phi**2) * eps[:, t]
        ess = float(effective_sample_size(jnp.asarray(x)[..., None])[0])
        expected = c * n * (1 - phi) / (1 + phi)
        assert 0.4 * expected < ess < 2.5 * expected

    def test_anticorrelated_exceeds_n(self, key):
        n = 2000
        eps = np.asarray(jax.random.normal(key, (n,)))
        x = np.zeros(n)
        for t in range(1, n):
            x[t] = -0.5 * x[t - 1] + eps[t]
        ess = float(effective_sample_size(jnp.asarray(x)[None, :, None])[0])
        assert ess > n  # antithetic chains super-efficient


@pytest.mark.slow
class TestRhat:
    def test_converged_chains(self, key):
        x = jax.random.normal(key, (4, 500, 2))
        rhat = np.asarray(potential_scale_reduction(x))
        assert np.all(rhat < 1.05)

    def test_diverged_chains(self, key):
        x = np.asarray(jax.random.normal(key, (4, 500, 1)))
        x = x + np.arange(4)[:, None, None] * 5.0  # chains at different means
        rhat = float(potential_scale_reduction(jnp.asarray(x))[0])
        assert rhat > 2.0

    def test_summary_keys(self, key):
        x = jax.random.normal(key, (2, 300, 3))
        s = summary(x)
        assert set(s) == {
            "mean", "std", "ess", "ess_bulk", "ess_tail",
            "r_hat", "r_hat_rank", "mcse_mean",
        }
        assert s["mean"].shape == (3,)


@pytest.mark.slow
class TestRankNormalizedDiagnostics:
    """Vehtari et al. 2021 rank-normalized R-hat / bulk-ESS / tail-ESS."""

    def test_converged_chains_near_one(self, key):
        from hamiltorch_tpu.diagnostics import bulk_ess, rank_normalized_rhat, tail_ess

        x = jax.random.normal(key, (4, 500, 2))
        assert np.all(np.asarray(rank_normalized_rhat(x)) < 1.05)
        assert np.all(np.asarray(bulk_ess(x)) > 1000)
        assert np.all(np.asarray(tail_ess(x)) > 500)

    def test_variance_mismatch_caught_by_folded_rhat(self, key):
        """Chains sharing a mean but not a variance: classic split-R-hat is
        blind (between-chain variance of MEANS is zero), the folded
        rank-normalized half must flag it."""
        from hamiltorch_tpu.diagnostics import rank_normalized_rhat

        x = np.array(jax.random.normal(key, (4, 800, 1)))
        x *= np.asarray([0.2, 1.0, 3.0, 9.0])[:, None, None]
        classic = float(potential_scale_reduction(jnp.asarray(x))[0])
        ranked = float(rank_normalized_rhat(jnp.asarray(x))[0])
        assert classic < 1.1  # the failure mode: classic looks converged
        assert ranked > 1.2

    def test_heavy_tail_robustness(self, key):
        """Cauchy chains: moment-based R-hat is erratic (infinite variance);
        rank normalization keeps the diagnostic meaningful and near 1 for
        genuinely identical chains."""
        from hamiltorch_tpu.diagnostics import rank_normalized_rhat

        x = np.asarray(jax.random.cauchy(key, (4, 1000, 1)))
        ranked = float(rank_normalized_rhat(jnp.asarray(x))[0])
        assert ranked < 1.05

    def test_sticky_tail_low_tail_ess(self, key):
        """A chain that mixes in the bulk but freezes beyond the 90% quantile
        should show tail-ESS far below bulk-ESS."""
        from hamiltorch_tpu.diagnostics import bulk_ess, tail_ess

        k1, k2 = jax.random.split(key)
        x = np.array(jax.random.normal(k1, (2, 2000)))
        q = 1.64  # ~95th percentile of N(0,1)
        # freeze: once a draw exceeds q, hold it for 30 steps (sticky tail)
        for c in range(2):
            t = 0
            while t < 2000:
                if x[c, t] > q:
                    x[c, t : t + 30] = x[c, t]
                    t += 30
                else:
                    t += 1
        x = jnp.asarray(x)[..., None]
        assert float(tail_ess(x)[0]) < 0.75 * float(bulk_ess(x)[0])

    def test_average_ranks_for_ties(self):
        """Duplicate draws (MH rejections) must share an average rank: a
        constant series rank-normalizes to all zeros, not a ramp."""
        from hamiltorch_tpu.diagnostics import _rank_normalize

        x = jnp.ones((1, 64, 1))
        z = np.asarray(_rank_normalize(x))
        np.testing.assert_allclose(z, 0.0, atol=1e-6)


class TestCheckpoint:
    def lp(self, theta):
        return -0.5 * jnp.dot(theta, theta)

    def test_chunked_matches_single_run(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed
        from hamiltorch_tpu.samplers.hmc import run_hmc

        config = MCMCConfig(num_samples=60, num_steps_per_sample=5, step_size=0.2)
        r_chunked = run_hmc_checkpointed(
            key, self.lp, jnp.zeros(2), config, str(tmp_path / "ck"), chunk_size=25
        )
        assert r_chunked.samples.shape == (60, 2)
        assert bool(jnp.all(jnp.isfinite(r_chunked.samples)))

    def test_resume_continues_exactly(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        ck = str(tmp_path / "ck")
        config_full = MCMCConfig(num_samples=50, num_steps_per_sample=5, step_size=0.2)
        config_half = MCMCConfig(num_samples=20, num_steps_per_sample=5, step_size=0.2)
        # run the first 20 draws, "crash", then resume to 50
        run_hmc_checkpointed(key, self.lp, jnp.zeros(2), config_half, ck, chunk_size=10)
        r_resumed = run_hmc_checkpointed(key, self.lp, jnp.zeros(2), config_full, ck, chunk_size=10)
        # compare against an uninterrupted chunked run
        r_direct = run_hmc_checkpointed(
            key, self.lp, jnp.zeros(2), config_full, str(tmp_path / "ck2"), chunk_size=10
        )
        np.testing.assert_allclose(
            np.asarray(r_resumed.samples), np.asarray(r_direct.samples), atol=1e-6
        )

    def test_adaptation_survives_resume(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        config = MCMCConfig(
            num_samples=80, num_steps_per_sample=5, step_size=1.0, burn=40,
            adapt_step_size=True,
        )
        half = MCMCConfig(
            num_samples=30, num_steps_per_sample=5, step_size=1.0, burn=40,
            adapt_step_size=True,
        )
        ck = str(tmp_path / "ck")
        run_hmc_checkpointed(key, self.lp, jnp.zeros(2), half, ck, chunk_size=15)
        r_resumed = run_hmc_checkpointed(key, self.lp, jnp.zeros(2), config, ck, chunk_size=15)
        r_direct = run_hmc_checkpointed(
            key, self.lp, jnp.zeros(2), config, str(tmp_path / "ck2"), chunk_size=15
        )
        np.testing.assert_allclose(
            float(r_resumed.final_step_size), float(r_direct.final_step_size), rtol=1e-5
        )


@pytest.mark.slow
class TestNUTSCheckpoint:
    def test_nuts_resume_matches_direct(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_nuts_checkpointed
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        lp = lambda t: -0.5 * jnp.dot(t, t)
        full = NUTSConfig(num_samples=40, step_size=0.5, burn=20)
        half = NUTSConfig(num_samples=15, step_size=0.5, burn=20)
        ck = str(tmp_path / "nuts_ck")
        run_nuts_checkpointed(key, lp, jnp.zeros(2), half, ck, chunk_size=10)
        r_resumed = run_nuts_checkpointed(key, lp, jnp.zeros(2), full, ck, chunk_size=10)
        r_direct = run_nuts_checkpointed(
            key, lp, jnp.zeros(2), full, str(tmp_path / "nuts_ck2"), chunk_size=10
        )
        np.testing.assert_allclose(
            np.asarray(r_resumed.samples), np.asarray(r_direct.samples), atol=1e-6
        )


@pytest.mark.slow
class TestAdaptiveCheckpoint:
    """Round-2 resume coverage: windowed warmup, ChEES, vmapped chains."""

    def lp(self, theta):
        return -0.5 * jnp.dot(theta, theta)

    def test_nuts_adapt_mass_resumable(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_nuts_checkpointed
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts

        scales = jnp.asarray([0.3, 3.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        full = NUTSConfig(num_samples=220, step_size=0.5, burn=180, adapt_mass=True)
        half = NUTSConfig(num_samples=90, step_size=0.5, burn=180, adapt_mass=True)
        ck = str(tmp_path / "ck")
        run_nuts_checkpointed(key, lp, jnp.zeros(2), half, ck, chunk_size=40)
        r_resumed = run_nuts_checkpointed(key, lp, jnp.zeros(2), full, ck, chunk_size=40)
        # oracle: the UNCHUNKED sampler — resume must be bit-compatible with
        # a straight-through run, windowed Welford/mass carry included
        r_direct, _ = run_nuts(key, lp, jnp.zeros(2), full)
        np.testing.assert_allclose(
            np.asarray(r_resumed.samples), np.asarray(r_direct.samples), atol=1e-5
        )
        wf_res, inv_res, _ = r_resumed.final_warm
        _, inv_dir, _ = r_direct.final_warm
        np.testing.assert_allclose(np.asarray(inv_res), np.asarray(inv_dir), rtol=1e-5)
        # the adapted inverse mass must reflect the scale anisotropy
        assert float(inv_res[1] / inv_res[0]) > 10.0

    def test_chees_resume_matches_direct(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_chees_checkpointed
        from hamiltorch_tpu.samplers.chees import ChEESConfig

        config = ChEESConfig(num_samples=60, burn=30, step_size=0.2)
        half = ChEESConfig(num_samples=25, burn=30, step_size=0.2)
        ck = str(tmp_path / "ck")
        run_chees_checkpointed(key, self.lp, jnp.zeros(2), half, ck,
                               num_chains=8, chunk_size=10)
        r_resumed = run_chees_checkpointed(key, self.lp, jnp.zeros(2), config, ck,
                                           num_chains=8, chunk_size=10)
        r_direct = run_chees_checkpointed(
            key, self.lp, jnp.zeros(2), config, str(tmp_path / "ck2"),
            num_chains=8, chunk_size=10,
        )
        assert r_resumed.samples.shape == (8, 60, 2)
        np.testing.assert_allclose(
            np.asarray(r_resumed.samples), np.asarray(r_direct.samples), atol=1e-5
        )
        np.testing.assert_allclose(
            float(r_resumed.final_trajectory_length),
            float(r_direct.final_trajectory_length), rtol=1e-5,
        )

    def test_hmc_chains_checkpointed(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_chains_checkpointed
        from hamiltorch_tpu.samplers.hmc import run_hmc_chains

        config = MCMCConfig(num_samples=40, num_steps_per_sample=5, step_size=0.2)
        half = MCMCConfig(num_samples=15, num_steps_per_sample=5, step_size=0.2)
        ck = str(tmp_path / "ck")
        run_hmc_chains_checkpointed(key, self.lp, jnp.zeros(2), half, ck,
                                    num_chains=4, chunk_size=10)
        r_resumed = run_hmc_chains_checkpointed(key, self.lp, jnp.zeros(2), config,
                                                ck, num_chains=4, chunk_size=10)
        r_vmap = run_hmc_chains(key, self.lp, jnp.zeros(2), config, num_chains=4)
        assert r_resumed.samples.shape == (4, 40, 2)
        np.testing.assert_allclose(
            np.asarray(r_resumed.samples), np.asarray(r_vmap.samples), atol=1e-5
        )

    def test_pt_resume_matches_direct(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_pt_checkpointed
        from hamiltorch_tpu.samplers.tempering import (
            PTConfig,
            run_parallel_tempering,
        )

        config = PTConfig(num_samples=60, num_steps_per_sample=5, step_size=0.3,
                          num_temps=4, burn=30, adapt_ladder=True)
        half = PTConfig(num_samples=25, num_steps_per_sample=5, step_size=0.3,
                        num_temps=4, burn=30, adapt_ladder=True)
        ck = str(tmp_path / "ck")
        run_pt_checkpointed(key, self.lp, jnp.zeros(2), half, ck, chunk_size=10)
        r_resumed = run_pt_checkpointed(key, self.lp, jnp.zeros(2), config, ck,
                                        chunk_size=10)
        # oracle: the UNCHUNKED sampler — ladder adaptation, swap parity and
        # RNG stream must continue across the interrupt exactly
        r_direct = run_parallel_tempering(key, self.lp, jnp.zeros(2), config)
        assert r_resumed.samples.shape == (30, 2)
        np.testing.assert_allclose(
            np.asarray(r_resumed.replica_samples),
            np.asarray(r_direct.replica_samples), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(r_resumed.info.betas), np.asarray(r_direct.info.betas),
            rtol=1e-5,
        )

    def test_fingerprint_mismatch_raises(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        ck = str(tmp_path / "ck")
        a = MCMCConfig(num_samples=20, num_steps_per_sample=5, step_size=0.2)
        b = MCMCConfig(num_samples=30, num_steps_per_sample=5, step_size=0.5)
        run_hmc_checkpointed(key, self.lp, jnp.zeros(2), a, ck, chunk_size=10)
        with pytest.raises(ValueError, match="fingerprint"):
            run_hmc_checkpointed(key, self.lp, jnp.zeros(2), b, ck, chunk_size=10)
        # resume=False wipes and restarts cleanly
        r = run_hmc_checkpointed(key, self.lp, jnp.zeros(2), b, ck,
                                 chunk_size=10, resume=False)
        assert r.samples.shape == (30, 2)

    def test_chunked_thin_rounds_chunk_size(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        config = MCMCConfig(num_samples=60, num_steps_per_sample=5,
                            step_size=0.2, thin=3)
        r = run_hmc_checkpointed(key, self.lp, jnp.zeros(2), config,
                                 str(tmp_path / "ck"), chunk_size=25)
        assert r.samples.shape == (20, 2)


class TestCheckpointReviewRegressions:
    def test_resume_with_smaller_num_samples_returns_requested(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        lp = lambda t: -0.5 * jnp.dot(t, t)
        ck = str(tmp_path / "ck")
        big = MCMCConfig(num_samples=50, num_steps_per_sample=5, step_size=0.2)
        small = MCMCConfig(num_samples=20, num_steps_per_sample=5, step_size=0.2)
        run_hmc_checkpointed(key, lp, jnp.zeros(2), big, ck, chunk_size=10)
        r = run_hmc_checkpointed(key, lp, jnp.zeros(2), small, ck, chunk_size=10)
        assert r.samples.shape == (20, 2)
        assert r.stats.accepted.shape == (20,)


class TestCheckpointCodeReviewFixes:
    def lp(self, theta):
        return -0.5 * jnp.dot(theta, theta)

    def test_cosmetic_config_change_resumes(self, key, tmp_path):
        """progress_every does not affect the stream; changing it between
        resumes must not trip the fingerprint."""
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        ck = str(tmp_path / "ck")
        a = MCMCConfig(num_samples=20, num_steps_per_sample=5, step_size=0.2)
        b = MCMCConfig(num_samples=40, num_steps_per_sample=5, step_size=0.2,
                       progress_every=0)
        run_hmc_checkpointed(key, self.lp, jnp.zeros(2), a, ck, chunk_size=10)
        r = run_hmc_checkpointed(key, self.lp, jnp.zeros(2), b, ck, chunk_size=10)
        assert r.samples.shape == (40, 2)

    def test_thin_acc_rate_matches_direct(self, key, tmp_path):
        """With thin>1 the chunked acc_rate must equal the direct run's
        all-transition rate, not a thin-fold subsample."""
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed
        from hamiltorch_tpu.samplers.hmc import run_hmc

        config = MCMCConfig(num_samples=90, num_steps_per_sample=5,
                            step_size=0.6, thin=3)
        r_ck = run_hmc_checkpointed(key, self.lp, jnp.zeros(2), config,
                                    str(tmp_path / "ck"), chunk_size=30)
        r_direct = run_hmc(key, self.lp, jnp.zeros(2), config)
        np.testing.assert_allclose(
            float(r_ck.acc_rate), float(r_direct.acc_rate), atol=1e-6
        )

    def test_nuts_checkpointed_dense_mass_adapt_raises(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_nuts_checkpointed
        from hamiltorch_tpu.samplers.nuts import NUTSConfig

        cfg = NUTSConfig(num_samples=20, burn=10, adapt_mass=True)
        dense = np.eye(2, dtype=np.float32)
        with pytest.raises(ValueError, match="DIAGONAL"):
            run_nuts_checkpointed(key, self.lp, jnp.zeros(2), cfg,
                                  str(tmp_path / "ck"), inv_mass=jnp.asarray(dense))


class TestPartialDirectoryReuse:
    def lp(self, theta):
        return -0.5 * jnp.dot(theta, theta)

    def test_shorter_request_acc_rate_uncontaminated(self, key, tmp_path):
        """A directory from a longer completed run, re-read with a smaller
        num_samples: acc_rate must cover ONLY the requested transitions."""
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        ck = str(tmp_path / "ck")
        long_cfg = MCMCConfig(num_samples=60, num_steps_per_sample=5, step_size=0.2)
        short_cfg = MCMCConfig(num_samples=40, num_steps_per_sample=5, step_size=0.2)
        run_hmc_checkpointed(key, self.lp, jnp.zeros(2), long_cfg, ck, chunk_size=25)
        r_short = run_hmc_checkpointed(key, self.lp, jnp.zeros(2), short_cfg, ck,
                                       chunk_size=25)
        r_direct = run_hmc_checkpointed(key, self.lp, jnp.zeros(2), short_cfg,
                                        str(tmp_path / "ck2"), chunk_size=25)
        assert r_short.samples.shape == (40, 2)
        np.testing.assert_allclose(
            float(r_short.acc_rate), float(r_direct.acc_rate), atol=1e-6
        )


@pytest.mark.slow
class TestEBFMI:
    """Betancourt 2016 energy-BFMI: Var(dE)/Var(E) per chain."""

    def test_iid_energies_near_two(self, key):
        # independent draws: E[(E_n - E_{n-1})^2] = 2 Var(E) => e_bfmi ~ 2
        from hamiltorch_tpu.diagnostics import e_bfmi

        e = jax.random.normal(key, (4, 4000))
        vals = np.asarray(e_bfmi(e))
        assert vals.shape == (4,)
        np.testing.assert_allclose(vals, 2.0, atol=0.25)

    def test_flags_funnel_pathology(self, key):
        """Low E-BFMI flags the funnel where divergence counts are weak:
        the chain drifts through energy levels instead of jumping."""
        from hamiltorch_tpu.diagnostics import e_bfmi
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_chains

        def funnel(theta):
            v, x = theta[0], theta[1:]
            return (
                -0.5 * v**2 / 9.0
                - 0.5 * jnp.sum(x**2) * jnp.exp(-v)
                - 0.5 * (theta.shape[0] - 1) * v
            )

        def corr_gaussian(theta):
            prec = jnp.asarray([[5.263158, -4.736842], [-4.736842, 5.263158]])
            return -0.5 * theta @ prec @ theta

        cfg = NUTSConfig(num_samples=1000, step_size=0.3, burn=300)
        _, info_g = run_nuts_chains(
            key, corr_gaussian, jnp.zeros(2), cfg, num_chains=4
        )
        bfmi_g = np.asarray(e_bfmi(info_g.energy[:, 300:]))
        assert bfmi_g.min() > 0.5, bfmi_g  # healthy target: no flag

        _, info_f = run_nuts_chains(key, funnel, jnp.zeros(11), cfg, num_chains=4)
        bfmi_f = np.asarray(e_bfmi(info_f.energy[:, 300:]))
        # at least one chain far below the ~0.3 pathology threshold, while
        # per-chain divergence rates stay in single-digit percent
        assert bfmi_f.min() < 0.3, bfmi_f
        assert float(jnp.mean(info_f.divergent[:, 300:])) < 0.1

    def test_summary_surfaces_e_bfmi(self, key):
        from hamiltorch_tpu.diagnostics import summary

        samples = jax.random.normal(key, (2, 200, 3))
        energies = jax.random.normal(jax.random.key(1), (2, 200))
        out = summary(samples, energies=energies)
        assert out["e_bfmi"].shape == (2,)
        assert "e_bfmi" not in summary(samples)


@pytest.mark.slow
class TestPytreeDiagnostics:
    """Diagnostics accept pytree traces from the pytree-native chain state
    (as_flat_samples canonicalisation)."""

    def test_summary_on_tree_traces(self, key):
        from hamiltorch_tpu.diagnostics import as_flat_samples, summary
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.hmc import run_hmc, run_hmc_chains

        lp = lambda t: -0.5 * (jnp.sum(t["a"] ** 2) + jnp.sum(t["b"] ** 2))
        t0 = {"a": jnp.zeros(2), "b": jnp.zeros((2, 2))}
        cfg = MCMCConfig(num_samples=200, num_steps_per_sample=5, step_size=0.3)
        r = run_hmc_chains(key, lp, t0, cfg, num_chains=4)
        s = summary(r.samples, like=t0)
        assert s["ess"].shape == (6,)  # 2 + 4 flattened dims, tree order
        assert bool(jnp.all(s["r_hat"] < 1.2))
        # flat layout matches per-leaf flatten in tree order
        mat = as_flat_samples(r.samples, like=t0)
        np.testing.assert_array_equal(
            np.asarray(mat[:, :, :2]), np.asarray(r.samples["a"])
        )
        # single-chain trace disambiguated by like=
        r1 = run_hmc(key, lp, t0, cfg)
        s1 = summary(r1.samples, like=t0)
        assert s1["ess"].shape == (6,)
        # without like= the single-chain trace is in the ambiguous class
        # (every leaf shares its first two dims): it must raise, not
        # silently read the draws axis as chains
        with pytest.raises(ValueError, match="like="):
            summary(r1.samples)
        # one-leaf 2-d trace: always ambiguous
        with pytest.raises(ValueError, match="like="):
            as_flat_samples({"w": jnp.zeros((200, 5))})
        # leaves that disagree at dim 1 infer (N, ...) unambiguously
        out = as_flat_samples({"a": jnp.zeros((50, 2)), "b": jnp.zeros((50, 3))})
        assert out.shape == (50, 5)

    def test_ambiguous_tree_raises(self):
        from hamiltorch_tpu.diagnostics import as_flat_samples

        with pytest.raises(ValueError, match="like="):
            as_flat_samples({"a": jnp.zeros((10, 3)), "b": jnp.zeros((10, 3))})
        # like= resolves it
        out = as_flat_samples(
            {"a": jnp.zeros((10, 3)), "b": jnp.zeros((10, 3))},
            like={"a": jnp.zeros(3), "b": jnp.zeros(3)},
        )
        assert out.shape == (10, 6)


class TestSummaryByLeaf:
    def test_per_leaf_stats_match_flat_offsets(self, key):
        from hamiltorch_tpu.diagnostics import summary, summary_by_leaf
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.hmc import run_hmc_chains

        def lp(t):
            return -0.5 * (jnp.sum(t["w"] ** 2) + jnp.sum((t["b"] / 2.0) ** 2))

        t0 = {"w": jnp.zeros((2, 3)), "b": jnp.zeros(2)}
        cfg = MCMCConfig(num_samples=200, num_steps_per_sample=5, step_size=0.4)
        r = run_hmc_chains(key, lp, t0, cfg, num_chains=4)
        s_leaf = summary_by_leaf(r.samples, like=t0)
        s_flat = summary(r.samples, like=t0)
        assert s_leaf["mean"]["w"].shape == (2, 3)
        assert s_leaf["ess"]["b"].shape == (2,)
        # the per-leaf view is exactly the flat vector re-split: tree order
        # is b (dict-sorted) then w, so b takes the first 2 entries
        np.testing.assert_array_equal(
            np.asarray(s_leaf["std"]["b"]), np.asarray(s_flat["std"][:2])
        )
        np.testing.assert_array_equal(
            np.asarray(s_leaf["r_hat"]["w"]).ravel(),
            np.asarray(s_flat["r_hat"][2:]),
        )
        # sanity: the wide-prior leaf reports the wider posterior std
        assert float(np.asarray(s_leaf["std"]["b"]).mean()) > \
            float(np.asarray(s_leaf["std"]["w"]).mean())


class TestArvizExport:
    """to_inference_dict / to_arviz: every result family lands in ArviZ's
    (chain, draw, *shape) from_dict layout."""

    def _lp(self, t):
        return -0.5 * jnp.sum(t**2)

    def test_hmc_single_chain(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict
        from hamiltorch_tpu.samplers.hmc import run_hmc

        r = run_hmc(key, self._lp, jnp.zeros(3),
                    MCMCConfig(num_samples=20, num_steps_per_sample=3,
                               step_size=0.3))
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (1, 20, 3)
        for name in ("acceptance_rate", "diverging", "energy", "step_size"):
            assert d["sample_stats"][name].shape == (1, 20), name
        assert d["sample_stats"]["diverging"].dtype == bool

    def test_hmc_chains_pytree(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict
        from hamiltorch_tpu.samplers.hmc import run_hmc_chains

        theta0 = {"a": jnp.zeros(2), "b": {"c": jnp.zeros((2, 2))}}

        def lp(t):
            return -0.5 * sum(jnp.sum(l**2)
                              for l in jax.tree_util.tree_leaves(t))

        r = run_hmc_chains(key, lp, theta0,
                           MCMCConfig(num_samples=10, num_steps_per_sample=3,
                                      step_size=0.3), num_chains=4)
        d = to_inference_dict(r)
        assert d["posterior"]["a"].shape == (4, 10, 2)
        assert d["posterior"]["b.c"].shape == (4, 10, 2, 2)
        assert d["sample_stats"]["energy"].shape == (4, 10)

    def test_nuts_tuple(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts

        out = run_nuts(key, self._lp, jnp.zeros(3),
                       NUTSConfig(num_samples=15, step_size=0.5, burn=5))
        d = to_inference_dict(out)  # the (result, info) tuple directly
        assert d["posterior"]["theta"].shape == (1, 15, 3)
        for name in ("tree_depth", "n_steps", "energy"):
            assert d["sample_stats"][name].shape == (1, 15), name

    def test_chees(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict
        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        r = run_chees(key, self._lp, jnp.zeros(3),
                      ChEESConfig(num_samples=12, step_size=0.3, burn=6),
                      num_chains=4)
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (4, 12, 3)
        # ChEESInfo is draw-major (N, C); export must transpose
        assert d["sample_stats"]["acceptance_rate"].shape == (4, 12)
        assert d["sample_stats"]["trajectory_length"].shape == (4, 12)

    def test_pt_single_and_ensemble(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict
        from hamiltorch_tpu.samplers.tempering import (
            PTConfig,
            run_parallel_tempering,
            run_pt_chains,
        )

        cfg = PTConfig(num_samples=16, num_steps_per_sample=3, step_size=0.3,
                       num_temps=3, max_temp=10.0, burn=4)
        r1 = run_parallel_tempering(key, self._lp, jnp.zeros(2), cfg)
        d1 = to_inference_dict(r1)
        assert d1["posterior"]["theta"].shape == (1, 12, 2)
        assert d1["sample_stats"]["acceptance_rate"].shape == (1, 12)

        r2 = run_pt_chains(key, self._lp, jnp.zeros(2), cfg, num_ensembles=3)
        d2 = to_inference_dict(r2)
        assert d2["posterior"]["theta"].shape == (3, 12, 2)
        assert d2["sample_stats"]["acceptance_rate"].shape == (3, 12)

    def test_arviz_round_trip(self, key):
        arviz = pytest.importorskip("arviz")
        from hamiltorch_tpu.diagnostics import to_arviz
        from hamiltorch_tpu.samplers.hmc import run_hmc_chains

        r = run_hmc_chains(key, self._lp, jnp.zeros(3),
                           MCMCConfig(num_samples=10, num_steps_per_sample=3,
                                      step_size=0.3), num_chains=4)
        idata = to_arviz(r)
        assert idata.posterior["theta"].sizes["chain"] == 4
        assert idata.posterior["theta"].sizes["draw"] == 10
        assert bool(np.isfinite(
            arviz.ess(idata, var_names=["theta"]).theta
        ).all())

    def test_to_arviz_without_arviz_raises(self, key, monkeypatch):
        import builtins
        import sys

        if "arviz" in sys.modules or __import__("importlib").util.find_spec(
            "arviz"
        ):
            pytest.skip("arviz installed; the ImportError path is moot")
        from hamiltorch_tpu.diagnostics import to_arviz
        from hamiltorch_tpu.samplers.hmc import run_hmc

        r = run_hmc(key, self._lp, jnp.zeros(2),
                    MCMCConfig(num_samples=5, num_steps_per_sample=2,
                               step_size=0.3))
        with pytest.raises(ImportError, match="arviz"):
            to_arviz(r)

    def test_ti_posterior_rung(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict
        from hamiltorch_tpu.samplers.ti import TIConfig, run_ti

        log_prior = lambda t: -0.5 * jnp.sum(t**2)
        log_lik = lambda t: -0.5 * jnp.sum((t - 1.0) ** 2)
        cfg = TIConfig(num_samples=30, num_steps_per_sample=3,
                       step_size=0.3, num_temps=4, burn=10)
        r = run_ti(key, log_prior, log_lik, jnp.zeros(2), cfg)
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (1, 20, 2)
        assert d["sample_stats"]["acceptance_rate"].shape == (1, 20)
        assert d["sample_stats"]["swap_accepted"].shape == (1, 20)

    def test_smc_weighted_particles(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict
        from hamiltorch_tpu.samplers.smc import SMCConfig, run_smc

        log_prior = lambda t: -0.5 * jnp.sum(t**2)
        log_lik = lambda t: -0.5 * jnp.sum((t - 1.0) ** 2)
        prior_sample = lambda k, n: jax.random.normal(k, (n, 2))
        cfg = SMCConfig(num_particles=64, num_temps=5, mcmc_steps=2,
                        leapfrog_steps=3, step_size=0.5)
        r = run_smc(key, log_prior, log_lik, prior_sample, cfg)
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (1, 64, 2)
        assert d["sample_stats"]["log_weight"].shape == (1, 64)
        # normalised weights: logsumexp == 0
        lw = d["sample_stats"]["log_weight"][0]
        assert abs(float(jax.scipy.special.logsumexp(jnp.asarray(lw)))) < 1e-3

    def test_sgmcmc_and_cyclical(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict
        from hamiltorch_tpu.samplers.sgmcmc import (
            CSGMCMCConfig,
            SGLDConfig,
            run_csgmcmc_chains,
            run_sgld,
        )

        term = lambda t, m: -0.125 * jnp.sum(t**2)
        r = run_sgld(key, term, 4, jnp.zeros(3),
                     SGLDConfig(num_samples=20, step_size=1e-3))
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (1, 20, 3)
        assert d["sample_stats"]["grad_norm"].shape == (1, 20)

        cfg = CSGMCMCConfig(num_cycles=2, cycle_length=20, step_size=1e-3,
                            exploration_frac=0.5, thin=2)
        rc = run_csgmcmc_chains(key, term, 4, jnp.zeros(3), cfg, num_chains=3)
        dc = to_inference_dict(rc)
        assert dc["posterior"]["theta"].shape == (3, 10, 3)
        assert dc["sample_stats"]["cycle"].shape == (3, 10)
        assert int(dc["sample_stats"]["cycle"].max()) == 1
