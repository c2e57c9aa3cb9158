"""Parallel-tempering tests: mode hopping a plain HMC chain cannot do."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc
from hamiltorch_tpu.samplers.tempering import PTConfig, run_parallel_tempering


def bimodal_logprob(theta):
    """Mixture of N(-4, 0.5^2) and N(+4, 0.5^2), equal weights, 1-D-per-dim."""
    lp1 = -0.5 * jnp.sum(((theta + 4.0) / 0.5) ** 2)
    lp2 = -0.5 * jnp.sum(((theta - 4.0) / 0.5) ** 2)
    return jnp.logaddexp(lp1, lp2)


@pytest.mark.slow
class TestParallelTempering:
    def test_mode_hopping(self, key):
        """Plain HMC started in one mode stays there; PT visits both."""
        cfg_hmc = MCMCConfig(num_samples=2000, num_steps_per_sample=10, step_size=0.1)
        r_hmc = run_hmc(key, bimodal_logprob, jnp.full(1, -4.0), cfg_hmc)
        hmc_frac_right = float((np.asarray(r_hmc.samples[:, 0]) > 0).mean())
        assert hmc_frac_right < 0.01  # trapped in the left mode

        cfg_pt = PTConfig(num_samples=4000, num_steps_per_sample=10,
                          step_size=0.1, num_temps=8, max_temp=50.0)
        r_pt = run_parallel_tempering(key, bimodal_logprob, jnp.full(1, -4.0), cfg_pt)
        cold = np.asarray(r_pt.samples[500:, 0])
        frac_right = float((cold > 0).mean())
        assert 0.2 < frac_right < 0.8  # both modes visited
        # modes in the right places
        assert abs(cold[cold > 0].mean() - 4.0) < 0.3
        assert abs(cold[cold < 0].mean() + 4.0) < 0.3

    def test_swaps_occur(self, key):
        cfg = PTConfig(num_samples=500, num_steps_per_sample=5, step_size=0.1,
                       num_temps=6, max_temp=20.0)
        r = run_parallel_tempering(key, bimodal_logprob, jnp.zeros(1), cfg)
        swap_rate = float(np.asarray(r.info.swap_accept).mean())
        assert swap_rate > 0.05
        assert r.replica_samples.shape == (500, 6, 1)
        np.testing.assert_allclose(float(r.info.betas[0]), 1.0)
        np.testing.assert_allclose(float(r.info.betas[-1]), 1 / 20.0, rtol=1e-5)

    def test_burn_dropped_from_returns(self, key):
        cfg = PTConfig(num_samples=200, num_steps_per_sample=5, step_size=0.1,
                       num_temps=4, max_temp=10.0, burn=50)
        r = run_parallel_tempering(key, bimodal_logprob, jnp.zeros(1), cfg)
        assert r.samples.shape == (150, 1)
        assert r.replica_samples.shape == (150, 4, 1)
        assert r.info.accept_prob.shape == (150, 4)
        assert r.info.swap_accept.shape == (150, 3)

    def test_burn_ge_num_samples_raises(self, key):
        cfg = PTConfig(num_samples=50, burn=50)
        with pytest.raises(RuntimeError):
            run_parallel_tempering(key, bimodal_logprob, jnp.zeros(1), cfg)


@pytest.mark.slow
class TestLadderAdaptation:
    def test_adaptation_equalises_swap_rates(self, key):
        """On a heavy-tailed target a geometric ladder gives lopsided
        adjacent swap rates; the Vousden dynamics should even them out."""

        def lp(theta):  # student-t-ish heavy tails
            return -2.5 * jnp.sum(jnp.log1p(theta**2 / 3.0))

        base = dict(num_samples=1500, num_steps_per_sample=5, step_size=0.25,
                    num_temps=6, max_temp=100.0, burn=800)
        r_static = run_parallel_tempering(
            key, lp, jnp.zeros(1), PTConfig(**base))
        r_adapt = run_parallel_tempering(
            key, lp, jnp.zeros(1), PTConfig(**base, adapt_ladder=True))

        def pair_rates(r):
            return np.asarray(r.info.swap_accept).mean(0)  # post-burn rates

        spread_static = pair_rates(r_static).std()
        spread_adapt = pair_rates(r_adapt).std()
        assert spread_adapt < spread_static
        # endpoints stay pinned
        np.testing.assert_allclose(float(r_adapt.info.betas[0]), 1.0, rtol=1e-6)
        np.testing.assert_allclose(
            float(r_adapt.info.betas[-1]), 1 / 100.0, rtol=1e-5
        )
        # the ladder actually moved
        geo = np.exp(np.linspace(0, -np.log(100.0), 6))
        assert not np.allclose(np.asarray(r_adapt.info.betas), geo, rtol=0.02)

    def test_unimodal_moments_still_correct(self, key):
        """Exchange moves must preserve the cold chain's stationary dist."""
        lp = lambda t: -0.5 * jnp.dot(t, t)
        cfg = PTConfig(num_samples=3000, num_steps_per_sample=10, step_size=0.25,
                       num_temps=4, max_temp=10.0)
        r = run_parallel_tempering(key, lp, jnp.zeros(2), cfg)
        cold = np.asarray(r.samples[500:])
        np.testing.assert_allclose(cold.mean(0), [0, 0], atol=0.12)
        np.testing.assert_allclose(cold.std(0), [1, 1], atol=0.12)


@pytest.mark.slow
class TestStepSizeAdaptation:
    def lp_narrow(self, t):
        """Badly scaled bimodal: modes at +-1 with sd 0.02 — a 0.25 step
        overshoots the mode width 12-fold and every proposal is rejected."""
        return jnp.logaddexp(
            -0.5 * jnp.sum(((t - 1.0) / 0.02) ** 2),
            -0.5 * jnp.sum(((t + 1.0) / 0.02) ** 2),
        )

    def test_adaptation_rescues_collapsed_acceptance(self, key):
        base = dict(num_samples=900, num_steps_per_sample=5, step_size=0.25,
                    num_temps=4, max_temp=25.0, burn=500)
        r_fixed = run_parallel_tempering(
            key, self.lp_narrow, jnp.full(1, 1.0), PTConfig(**base))
        r_adapt = run_parallel_tempering(
            key, self.lp_narrow, jnp.full(1, 1.0),
            PTConfig(**base, adapt_step_size=True))
        # post-burn per-replica acceptance: collapsed without adaptation,
        # held near the 0.8 target with it
        acc_fixed = np.asarray(r_fixed.info.accept_prob).mean(0)
        acc_adapt = np.asarray(r_adapt.info.accept_prob).mean(0)
        assert acc_fixed.max() < 0.05, acc_fixed
        assert acc_adapt.min() > 0.5, acc_adapt
        # the adapted steps shrank far below the eps/sqrt(beta) seed
        betas = np.asarray(r_adapt.info.betas)
        seeds = 0.25 / np.sqrt(betas)
        assert np.all(np.asarray(r_adapt.info.step_sizes) < 0.2 * seeds)

    def test_well_scaled_target_unchanged_when_off(self, key):
        """adapt_step_size=False is the exact pre-existing stream."""
        cfg = PTConfig(num_samples=60, num_steps_per_sample=5, step_size=0.3,
                       num_temps=4, burn=20)
        lp = lambda t: -0.5 * jnp.sum(t**2)
        r0 = run_parallel_tempering(key, lp, jnp.zeros(2), cfg)
        r1 = run_parallel_tempering(key, lp, jnp.zeros(2), cfg)
        np.testing.assert_array_equal(np.asarray(r0.samples),
                                      np.asarray(r1.samples))
        # and the fixed schedule is reported as the step sizes
        np.testing.assert_allclose(
            np.asarray(r0.info.step_sizes),
            0.3 / np.sqrt(np.asarray(r0.info.betas)), rtol=1e-5)

    def test_adapted_checkpoint_resume_bit_exact(self, key, tmp_path):
        """Chunked+resumed adapted PT == the uninterrupted run (DA state
        rides PTCarry; global draw indices keep RNG and freeze aligned)."""
        from hamiltorch_tpu.checkpoint import run_pt_checkpointed

        full = PTConfig(num_samples=40, num_steps_per_sample=5, step_size=0.3,
                        num_temps=4, burn=16, adapt_step_size=True,
                        adapt_ladder=True)
        half = dataclasses_replace(full, num_samples=15)
        ck = str(tmp_path / "ck")
        run_pt_checkpointed(key, self.lp_narrow, jnp.zeros(1), half, ck,
                            chunk_size=15)
        r_res = run_pt_checkpointed(key, self.lp_narrow, jnp.zeros(1), full,
                                    ck, chunk_size=15)
        r_direct = run_parallel_tempering(key, self.lp_narrow, jnp.zeros(1),
                                          full)
        np.testing.assert_allclose(
            np.asarray(r_res.replica_samples),
            np.asarray(r_direct.replica_samples), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(r_res.info.step_sizes),
            np.asarray(r_direct.info.step_sizes), rtol=1e-6)


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


@pytest.mark.slow
class TestEnsemblePT:
    def lp(self, t):
        return jnp.logaddexp(
            -0.5 * jnp.sum((t - 2.0) ** 2), -0.5 * jnp.sum((t + 2.0) ** 2)
        )

    def test_matches_per_ensemble_runs(self, key):
        """vmapped ladders == the same ladders run one at a time."""
        from hamiltorch_tpu.samplers.tempering import run_pt_chains, _run_pt_jit
        from hamiltorch_tpu.ops.mass import make_mass

        cfg = PTConfig(num_samples=30, num_steps_per_sample=5, step_size=0.3,
                       num_temps=4, burn=10)
        r = run_pt_chains(key, self.lp, jnp.zeros(2), cfg, num_ensembles=3)
        assert r.samples.shape == (3, 20, 2)
        assert r.replica_samples.shape == (3, 20, 4, 2)
        keys = jax.random.split(key, 3)
        mass = make_mass(None, 2)
        theta0s = jnp.zeros((4, 2))
        for e in range(3):
            traj, _, _, _ = _run_pt_jit(keys[e], theta0s, self.lp, cfg, mass)
            np.testing.assert_allclose(
                np.asarray(r.replica_samples[e]), np.asarray(traj[10:]),
                atol=1e-5,
            )

    def test_pt_progress_every_emits(self, key, capfd):
        from hamiltorch_tpu.samplers.tempering import run_parallel_tempering

        r = run_parallel_tempering(
            key, self.lp, jnp.zeros(2),
            PTConfig(num_samples=8, num_steps_per_sample=3, num_temps=3,
                     progress_every=2),
        )
        # the ordered=False callbacks ride the async computation: sync
        # before reading the captured stream
        jax.block_until_ready(r.samples)
        captured = capfd.readouterr()
        assert "Sampling" in captured.out and "Progress" in captured.out

    def test_ensemble_checkpoint_resume_matches_vmapped(self, key, tmp_path):
        """Chunked + resumed ensemble PT reproduces run_pt_chains exactly
        (same per-ensemble keys, global draw indices drive RNG + parity)."""
        from hamiltorch_tpu.checkpoint import run_pt_checkpointed
        from hamiltorch_tpu.samplers.tempering import run_pt_chains

        full = PTConfig(num_samples=40, num_steps_per_sample=5, step_size=0.3,
                        num_temps=4, burn=10, adapt_ladder=True)
        half = PTConfig(num_samples=15, num_steps_per_sample=5, step_size=0.3,
                        num_temps=4, burn=10, adapt_ladder=True)
        ck = str(tmp_path / "ck")
        run_pt_checkpointed(key, self.lp, jnp.zeros(2), half, ck,
                            chunk_size=15, num_ensembles=3)
        r_res = run_pt_checkpointed(key, self.lp, jnp.zeros(2), full, ck,
                                    chunk_size=15, num_ensembles=3)
        r_direct = run_pt_chains(key, self.lp, jnp.zeros(2), full,
                                 num_ensembles=3)
        assert r_res.samples.shape == (3, 30, 2)
        np.testing.assert_allclose(
            np.asarray(r_res.replica_samples),
            np.asarray(r_direct.replica_samples), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(r_res.info.betas), np.asarray(r_direct.info.betas),
            rtol=1e-5,
        )

    def test_ensemble_checkpoint_sharded_matches_vmapped(self, key, tmp_path):
        """mesh= shards the checkpointed ensembles; stream is unchanged."""
        import pytest

        from hamiltorch_tpu.checkpoint import run_pt_checkpointed
        from hamiltorch_tpu.parallel.sharding import make_mesh
        from hamiltorch_tpu.samplers.tempering import run_pt_chains

        cfg = PTConfig(num_samples=30, num_steps_per_sample=4, step_size=0.3,
                       num_temps=4, burn=10)
        mesh = make_mesh(chains=8, data=1)
        ck = str(tmp_path / "ck")
        r_shard = run_pt_checkpointed(key, self.lp, jnp.zeros(2), cfg, ck,
                                      chunk_size=12, num_ensembles=8,
                                      mesh=mesh)
        r_vmap = run_pt_chains(key, self.lp, jnp.zeros(2), cfg,
                               num_ensembles=8)
        np.testing.assert_allclose(
            np.asarray(r_shard.replica_samples),
            np.asarray(r_vmap.replica_samples), atol=1e-4,
        )
        with pytest.raises(ValueError, match="num_ensembles"):
            run_pt_checkpointed(key, self.lp, jnp.zeros(2), cfg, ck,
                                mesh=mesh)

    def test_cross_ensemble_rhat_on_bimodal(self, key):
        """E independent cold chains feed the multimodal convergence check
        that a single ladder cannot provide."""
        from hamiltorch_tpu.diagnostics import potential_scale_reduction
        from hamiltorch_tpu.samplers.tempering import run_pt_chains

        cfg = PTConfig(num_samples=1200, num_steps_per_sample=8, step_size=0.3,
                       num_temps=6, max_temp=50.0, burn=200)
        r = run_pt_chains(key, self.lp, jnp.zeros(2), cfg, num_ensembles=4)
        rhat = np.asarray(potential_scale_reduction(r.samples))
        assert np.all(rhat < 1.2), rhat
        # every ensemble's cold chain visits both modes
        frac_pos = np.asarray((r.samples[..., 0] > 0).mean(axis=1))
        assert np.all(frac_pos > 0.15) and np.all(frac_pos < 0.85), frac_pos


class TestPTValidation:
    def test_replica_axis_mismatch_raises(self, key):
        cfg = PTConfig(num_samples=8, num_temps=8)
        with pytest.raises(ValueError, match="replicas"):
            run_parallel_tempering(key, lambda t: -0.5 * jnp.sum(t**2),
                                   jnp.zeros((4, 2)), cfg)

    def test_ensemble_replica_axis_mismatch_raises(self, key):
        from hamiltorch_tpu.samplers.tempering import run_pt_chains

        cfg = PTConfig(num_samples=8, num_temps=8)
        with pytest.raises(ValueError, match="replicas"):
            run_pt_chains(key, lambda t: -0.5 * jnp.sum(t**2),
                          jnp.zeros((3, 4, 2)), cfg, num_ensembles=3)


class TestPTCheckpointValidation:
    def test_checkpointed_replica_axis_mismatch_raises(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_pt_checkpointed

        cfg = PTConfig(num_samples=8, num_temps=8)
        with pytest.raises(ValueError, match="replicas"):
            run_pt_checkpointed(key, lambda t: -0.5 * jnp.sum(t**2),
                                jnp.zeros((4, 2)), cfg, str(tmp_path / "ck"))


@pytest.mark.slow
class TestPytreePT:
    """Pytree replica stacks: the shape-polymorphic PT loop runs leaves in
    their natural shapes; swaps permute per leaf."""

    def tree_lp(self, t):
        a = t["a"]
        mix = jnp.logaddexp(-0.5 * jnp.sum((a - 3.0) ** 2) / 0.25,
                            -0.5 * jnp.sum((a + 3.0) ** 2) / 0.25)
        return mix - 0.5 * jnp.sum(t["b"] ** 2)

    def test_tree_mode_hopping_and_shapes(self, key):
        cfg = PTConfig(num_samples=1500, num_steps_per_sample=10,
                       step_size=0.1, num_temps=8, max_temp=50.0, burn=500,
                       adapt_ladder=True)
        t0 = {"a": jnp.full((1,), 3.0), "b": jnp.zeros((2, 1))}
        r = run_parallel_tempering(key, self.tree_lp, t0, cfg)
        a = np.asarray(r.samples["a"]).ravel()
        frac_neg = float((a < 0).mean())
        assert 0.15 < frac_neg < 0.85, f"cold chain stuck: {frac_neg}"
        b = np.asarray(r.samples["b"]).reshape(-1, 2)
        np.testing.assert_allclose(b.std(0), 1.0, rtol=0.3)
        assert r.replica_samples["a"].shape == (1000, 8, 1)
        assert r.replica_samples["b"].shape == (1000, 8, 2, 1)

    def test_tree_per_leaf_inv_mass_and_stacked(self, key):
        im = {"a": jnp.full((1,), 0.25), "b": jnp.full((2, 1), 1.0)}
        t0s = {"a": jnp.full((8, 1), 3.0), "b": jnp.zeros((8, 2, 1))}
        cfg = PTConfig(num_samples=300, num_steps_per_sample=5, step_size=0.1,
                       num_temps=8, burn=100)
        r = run_parallel_tempering(key, self.tree_lp, t0s, cfg, inv_mass=im)
        assert r.samples["a"].shape == (200, 1)
        assert bool(np.isfinite(np.asarray(r.samples["b"])).all())

    def test_tree_ensembles_match_flat_bitwise(self, key):
        """run_pt_chains on a single-leaf pytree == the flat layout,
        bit-exactly: the tree path's momentum draws and reductions stay
        flat-compatible (ops.mass.TreeMass contract)."""
        from hamiltorch_tpu.samplers.tempering import run_pt_chains

        cfg = PTConfig(num_samples=60, num_steps_per_sample=5, step_size=0.1,
                       num_temps=4, burn=20, adapt_ladder=True)
        theta0 = jnp.asarray([3.0, -1.0])
        r_flat = run_pt_chains(key, bimodal_logprob, theta0, cfg,
                               num_ensembles=2)
        r_tree = run_pt_chains(
            key, lambda t: bimodal_logprob(t["x"]), {"x": theta0}, cfg,
            num_ensembles=2,
        )
        np.testing.assert_array_equal(
            np.asarray(r_tree.replica_samples["x"]),
            np.asarray(r_flat.replica_samples),
        )
        np.testing.assert_array_equal(
            np.asarray(r_tree.samples["x"]), np.asarray(r_flat.samples)
        )

    def test_tree_ensembles_shapes_and_stacked(self, key):
        """Multi-leaf pytree ensembles: broadcast AND pre-stacked
        (E, K, ...) entries run and keep per-leaf shapes."""
        from hamiltorch_tpu.samplers.tempering import run_pt_chains

        cfg = PTConfig(num_samples=40, num_steps_per_sample=5, step_size=0.1,
                       num_temps=4, burn=10)
        t0 = {"a": jnp.full((1,), 3.0), "b": jnp.zeros((2, 1))}
        r = run_pt_chains(key, self.tree_lp, t0, cfg, num_ensembles=2)
        assert r.samples["a"].shape == (2, 30, 1)
        assert r.replica_samples["b"].shape == (2, 30, 4, 2, 1)
        t0s = {
            "a": jnp.broadcast_to(t0["a"], (2, 4, 1)),
            "b": jnp.broadcast_to(t0["b"], (2, 4, 2, 1)),
        }
        r2 = run_pt_chains(key, self.tree_lp, t0s, cfg, num_ensembles=2)
        np.testing.assert_array_equal(
            np.asarray(r2.replica_samples["a"]),
            np.asarray(r.replica_samples["a"]),
        )

    def test_tree_ensemble_checkpoint_resume(self, key, tmp_path):
        """Pytree PT-ensemble checkpointing (VERDICT r3 item 4): the
        chunked run matches the direct vmapped run and an interrupted one
        resumes bit-exactly."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_pt_checkpointed
        from hamiltorch_tpu.samplers.tempering import run_pt_chains

        t0 = {"a": jnp.full((1,), 3.0), "b": jnp.zeros((2, 1))}
        cfg = PTConfig(num_samples=80, num_steps_per_sample=5, step_size=0.1,
                       num_temps=4, max_temp=30.0, burn=30, adapt_ladder=True)
        r_direct = run_pt_chains(key, self.tree_lp, t0, cfg, num_ensembles=2)
        r_ck = run_pt_checkpointed(key, self.tree_lp, t0, cfg,
                                   str(tmp_path / "e"), chunk_size=40,
                                   num_ensembles=2)
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(r_ck.replica_samples[k]),
                np.asarray(r_direct.replica_samples[k]),
            )
        # interrupted (half the draws), then resumed to the full run
        run_pt_checkpointed(key, self.tree_lp, t0,
                            dataclasses.replace(cfg, num_samples=40),
                            str(tmp_path / "f"), chunk_size=40,
                            num_ensembles=2)
        r_res = run_pt_checkpointed(key, self.tree_lp, t0, cfg,
                                    str(tmp_path / "f"), chunk_size=40,
                                    num_ensembles=2)
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(r_res.replica_samples[k]),
                np.asarray(r_ck.replica_samples[k]),
            )

    def test_tree_checkpoint_resume_bit_exact(self, key, tmp_path):
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_pt_checkpointed

        t0 = {"a": jnp.full((1,), 3.0), "b": jnp.zeros((2, 1))}
        cfg = PTConfig(num_samples=120, num_steps_per_sample=5, step_size=0.1,
                       num_temps=8, max_temp=30.0, burn=40, adapt_ladder=True)
        r_direct = run_parallel_tempering(key, self.tree_lp, t0, cfg)
        r_ck = run_pt_checkpointed(key, self.tree_lp, t0, cfg,
                                   str(tmp_path / "a"), chunk_size=50)
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(r_ck.samples[k]), np.asarray(r_direct.samples[k]))
            np.testing.assert_array_equal(
                np.asarray(r_ck.replica_samples[k]),
                np.asarray(r_direct.replica_samples[k]))
        run_pt_checkpointed(key, self.tree_lp, t0,
                            dataclasses.replace(cfg, num_samples=50),
                            str(tmp_path / "b"), chunk_size=50)
        r_res = run_pt_checkpointed(key, self.tree_lp, t0, cfg,
                                    str(tmp_path / "b"), chunk_size=50)
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(r_res.samples[k]), np.asarray(r_direct.samples[k]))

    def test_dense_inv_mass_rejected(self, key):
        t0 = {"a": jnp.zeros(1), "b": jnp.zeros((2, 1))}
        with pytest.raises(ValueError, match="diagonal"):
            run_parallel_tempering(key, self.tree_lp, t0,
                                   PTConfig(num_samples=10, num_temps=4),
                                   inv_mass=jnp.eye(3))


class TestPTEnsembleReplicaStack:
    """Review finding: a per-REPLICA (K, ...) pytree ladder through the
    ensemble runners must broadcast only the ensemble axis — not be
    treated as a single state whose leading K couples into every slot."""

    def lp(self, t):
        return -0.5 * jnp.sum(t["x"] ** 2)

    def test_k_stacked_tree_broadcasts_ensemble_axis_only(self, key):
        from hamiltorch_tpu.samplers.tempering import run_pt_chains

        cfg = PTConfig(num_samples=30, num_steps_per_sample=3, step_size=0.2,
                       num_temps=4, burn=10)
        per_replica = {"x": jnp.arange(8.0).reshape(4, 2)}  # (K, 2) states
        r = run_pt_chains(key, self.lp, per_replica, cfg, num_ensembles=2)
        # param shape stays (2,): replica_samples (E, N, K, 2), NOT (..., 4, 2)
        assert r.replica_samples["x"].shape == (2, 20, 4, 2)
        explicit = {"x": jnp.broadcast_to(per_replica["x"], (2, 4, 2))}
        r2 = run_pt_chains(key, self.lp, explicit, cfg, num_ensembles=2)
        np.testing.assert_array_equal(
            np.asarray(r.replica_samples["x"]),
            np.asarray(r2.replica_samples["x"]),
        )
