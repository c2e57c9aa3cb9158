"""ChEES-HMC tests: adaptation behaviour and statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

COV = np.array([[1.0, 0.7], [0.7, 1.0]])
PREC = np.linalg.inv(COV)


def corr_gaussian(theta):
    return -0.5 * theta @ jnp.asarray(PREC, jnp.float32) @ theta


@pytest.mark.slow
class TestChEES:
    def test_gaussian_moments(self, key):
        config = ChEESConfig(num_samples=1200, step_size=0.3, burn=500)
        result = run_chees(key, corr_gaussian, jnp.zeros(2), config, num_chains=16)
        assert result.samples.shape == (16, 1200, 2)
        pooled = np.asarray(result.samples[:, 600:]).reshape(-1, 2)
        np.testing.assert_allclose(pooled.mean(0), [0, 0], atol=0.1)
        np.testing.assert_allclose(np.cov(pooled.T), COV, atol=0.12)

    def test_trajectory_length_adapts_to_scale(self, key):
        """On a wide Gaussian (std 10) the optimal trajectory is O(10);
        starting from T=0.5 the ChEES gradient must grow it substantially."""
        lp = lambda t: -0.5 * jnp.sum((t / 10.0) ** 2)
        config = ChEESConfig(
            num_samples=800, step_size=0.5, burn=600, init_trajectory_length=0.5,
        )
        result = run_chees(key, lp, jnp.zeros(2), config, num_chains=16)
        final_t = float(result.final_trajectory_length)
        assert final_t > 3.0
        pooled = np.asarray(result.samples[:, 650:]).reshape(-1, 2)
        np.testing.assert_allclose(pooled.std(0), [10.0, 10.0], rtol=0.25)

    def test_acceptance_targets_0651(self, key):
        config = ChEESConfig(num_samples=1000, step_size=1.5, burn=600)
        result = run_chees(key, corr_gaussian, jnp.zeros(2), config, num_chains=16)
        post = float(np.asarray(result.info.accept_prob[700:]).mean())
        assert 0.45 < post < 0.9

    def test_frozen_after_burn(self, key):
        config = ChEESConfig(num_samples=400, step_size=0.5, burn=200)
        result = run_chees(key, corr_gaussian, jnp.zeros(2), config, num_chains=8)
        tl = np.asarray(result.info.trajectory_length)
        ss = np.asarray(result.info.step_size)
        assert np.allclose(tl[210:], tl[210]) and np.allclose(ss[210:], ss[210])

    def test_shared_leapfrog_count(self, key):
        """All chains share each draw's L (the whole point vs NUTS)."""
        config = ChEESConfig(num_samples=50, step_size=0.3, burn=20)
        result = run_chees(key, corr_gaussian, jnp.zeros(2), config, num_chains=8)
        assert result.info.num_leapfrog.shape == (50,)  # one L per draw
        assert int(result.info.num_leapfrog.max()) <= 1000


@pytest.mark.slow
class TestChEESMassAdaptation:
    def test_cross_chain_warmup_fixes_bad_scaling(self, key):
        scales = jnp.array([0.05, 20.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        config = ChEESConfig(num_samples=800, step_size=0.3, burn=400, adapt_mass=True)
        result = run_chees(key, lp, jnp.zeros(2), config, num_chains=16)
        pooled = np.asarray(result.samples[:, 500:]).reshape(-1, 2)
        np.testing.assert_allclose(pooled.std(0), [0.05, 20.0], rtol=0.25)

    def test_without_adapt_mass_pays_in_leapfrogs(self, key):
        """Sanity: without mass adaptation ChEES still samples the wide
        direction — trajectory adaptation stretches T to the large scale
        (that is the criterion's job; before the criterion-gradient
        robustness fix it NaN'd here and the wide direction stayed stuck)
        — but pays for it with far longer trajectories, so mass adaptation
        is what buys the EFFICIENCY (validates the test above is
        non-trivial)."""
        scales = jnp.array([0.05, 20.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        config = ChEESConfig(num_samples=800, step_size=0.3, burn=400, adapt_mass=False)
        result = run_chees(key, lp, jnp.zeros(2), config, num_chains=16)
        pooled = np.asarray(result.samples[:, 500:]).reshape(-1, 2)
        np.testing.assert_allclose(pooled.std(0), [0.05, 20.0], rtol=0.3)
        cfg_ad = ChEESConfig(num_samples=800, step_size=0.3, burn=400, adapt_mass=True)
        r_ad = run_chees(key, lp, jnp.zeros(2), cfg_ad, num_chains=16)
        lf_unadapted = float(np.asarray(result.info.num_leapfrog[400:]).mean())
        lf_adapted = float(np.asarray(r_ad.info.num_leapfrog[400:]).mean())
        assert lf_unadapted > 3.0 * lf_adapted, (lf_unadapted, lf_adapted)


class TestHaltonJitter:
    def test_vdc_sequence_values(self):
        from hamiltorch_tpu.samplers.chees import _vdc_base2

        # radical inverse base 2 of 1..8
        got = np.asarray([float(_vdc_base2(jnp.asarray(n))) for n in range(8)])
        np.testing.assert_allclose(
            got, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625],
            atol=1e-9,
        )

    def test_halton_sampling_correct(self, key):
        cfg = ChEESConfig(num_samples=600, burn=300, step_size=0.2,
                          trajectory_jitter="halton")
        result = run_chees(key, corr_gaussian, jnp.zeros(2), cfg, num_chains=16)
        kept = np.asarray(result.samples[:, 300:]).reshape(-1, 2)
        cov = np.cov(kept.T)
        np.testing.assert_allclose(cov, np.asarray(COV), atol=0.15)


class TestChEESValidation:
    def test_bad_jitter_name_raises(self, key):
        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        cfg = ChEESConfig(num_samples=4, trajectory_jitter="Halton")
        with pytest.raises(ValueError, match="trajectory_jitter"):
            run_chees(key, lambda t: -0.5 * jnp.sum(t**2), jnp.zeros(2), cfg)

    def test_dense_mass_with_adapt_mass_raises(self, key):
        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        cfg = ChEESConfig(num_samples=8, burn=4, adapt_mass=True)
        dense = jnp.eye(2) + 0.1
        with pytest.raises(ValueError, match="DIAGONAL"):
            run_chees(key, lambda t: -0.5 * jnp.sum(t**2), jnp.zeros(2), cfg,
                      inv_mass=dense)


class TestLeapfrogCapReporting:
    def test_num_leapfrog_never_exceeds_cap(self, key):
        """info.num_leapfrog must report EXECUTED steps, <= the cap."""
        cfg = ChEESConfig(num_samples=40, burn=20, step_size=0.001,
                          init_trajectory_length=5.0, max_leapfrog_steps=25)
        r = run_chees(key, lambda t: -0.5 * jnp.sum(t**2), jnp.zeros(2), cfg,
                      num_chains=8)
        assert int(jnp.max(r.info.num_leapfrog)) <= 25
        assert int(jnp.max(r.info.num_leapfrog)) >= 25  # cap actually binds here


@pytest.mark.slow
class TestChEESThinning:
    def test_thin_matches_full_run_subsample(self, key):
        """thin=k keeps exactly every k-th draw of the identical stream:
        every transition and adaptation update still runs."""
        full_cfg = ChEESConfig(num_samples=120, step_size=0.3, burn=40)
        thin_cfg = ChEESConfig(num_samples=120, step_size=0.3, burn=40,
                               thin=4)
        r_full = run_chees(key, corr_gaussian, jnp.zeros(2), full_cfg,
                           num_chains=8)
        r_thin = run_chees(key, corr_gaussian, jnp.zeros(2), thin_cfg,
                           num_chains=8)
        assert r_thin.samples.shape == (8, 30, 2)
        np.testing.assert_allclose(
            np.asarray(r_thin.samples), np.asarray(r_full.samples[:, 3::4]),
            atol=1e-6,
        )
        # adaptation end state identical: the same transitions ran
        np.testing.assert_allclose(
            float(r_thin.final_trajectory_length),
            float(r_full.final_trajectory_length), rtol=1e-6,
        )

    def test_thin_checkpoint_resume(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_chees_checkpointed

        full = ChEESConfig(num_samples=120, step_size=0.3, burn=40, thin=4)
        half = ChEESConfig(num_samples=48, step_size=0.3, burn=40, thin=4)
        ck = str(tmp_path / "ck")
        run_chees_checkpointed(key, corr_gaussian, jnp.zeros(2), half, ck,
                               num_chains=8, chunk_size=48)
        r_res = run_chees_checkpointed(key, corr_gaussian, jnp.zeros(2),
                                       full, ck, num_chains=8, chunk_size=48)
        r_dir = run_chees(key, corr_gaussian, jnp.zeros(2), full,
                          num_chains=8)
        assert r_res.samples.shape == (8, 30, 2)
        np.testing.assert_allclose(
            np.asarray(r_res.samples), np.asarray(r_dir.samples), atol=1e-5
        )

    def test_thin_divisibility_validated(self, key):
        with pytest.raises(ValueError, match="divisible by thin"):
            run_chees(key, corr_gaussian, jnp.zeros(2),
                      ChEESConfig(num_samples=10, thin=3), num_chains=4)


@pytest.mark.slow
class TestDenseChEESWarmup:
    """adapt_mass='dense': full-covariance cross-chain windowed warmup
    (the NUTS dense machinery reused; previously 'dense' silently fell
    back to diagonal adaptation)."""

    def setup_method(self):
        cov = jnp.asarray([[1.0, 0.95], [0.95, 1.0]])
        self.prec = jnp.linalg.inv(cov)

    def lp(self, t):
        return -0.5 * t @ self.prec @ t

    def test_learns_correlation_and_beats_diag(self, key):
        dense_cfg = ChEESConfig(num_samples=500, step_size=0.2, burn=300,
                                adapt_mass="dense")
        diag_cfg = ChEESConfig(num_samples=500, step_size=0.2, burn=300,
                               adapt_mass=True)
        r = run_chees(key, self.lp, jnp.zeros(2), dense_cfg, num_chains=16)
        rd = run_chees(key, self.lp, jnp.zeros(2), diag_cfg, num_chains=16)
        inv_cov = np.asarray(r.final_carry.metric[0])
        # the adapted metric is the posterior covariance: strong off-diagonal
        corr = inv_cov[0, 1] / np.sqrt(inv_cov[0, 0] * inv_cov[1, 1])
        assert corr > 0.8, corr
        # a metric matched to the correlation needs far fewer leapfrogs/draw
        leap_dense = float(jnp.mean(r.info.num_leapfrog[300:]))
        leap_diag = float(jnp.mean(rd.info.num_leapfrog[300:]))
        assert leap_dense < 0.7 * leap_diag, (leap_dense, leap_diag)
        kept = np.asarray(r.samples[:, 300:])
        assert np.all(np.isfinite(kept))
        # post-burn moments still correct under the dense metric
        pooled = kept.reshape(-1, 2)
        assert np.abs(np.std(pooled, axis=0) - 1.0).max() < 0.2

    def test_dense_resume_matches_direct(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_chees_checkpointed

        full = ChEESConfig(num_samples=200, step_size=0.2, burn=120,
                           adapt_mass="dense")
        half = ChEESConfig(num_samples=100, step_size=0.2, burn=120,
                           adapt_mass="dense")
        ck = str(tmp_path / "ck")
        run_chees_checkpointed(key, self.lp, jnp.zeros(2), half, ck,
                               num_chains=8, chunk_size=100)
        r_res = run_chees_checkpointed(key, self.lp, jnp.zeros(2), full, ck,
                                       num_chains=8, chunk_size=100)
        r_dir = run_chees(key, self.lp, jnp.zeros(2), full, num_chains=8)
        np.testing.assert_array_equal(
            np.asarray(r_res.samples), np.asarray(r_dir.samples)
        )

    def test_bogus_adapt_mass_rejected(self, key):
        with pytest.raises(ValueError, match="adapt_mass"):
            run_chees(key, self.lp, jnp.zeros(2),
                      ChEESConfig(num_samples=10, adapt_mass="full"),
                      num_chains=4)

    def test_dense_seed_from_block_rejected(self, key):
        blocks = [jnp.eye(1), jnp.eye(1)]
        with pytest.raises(ValueError, match="dense"):
            run_chees(key, self.lp, jnp.zeros(2),
                      ChEESConfig(num_samples=10, burn=4, adapt_mass="dense"),
                      num_chains=4, inv_mass=blocks)


@pytest.mark.slow
class TestTreeChEES:
    """Pytree-native ChEES ensembles: the hot leapfrog loop updates
    parameter leaves in their natural shapes (no flat-layout slicing tax);
    the per-draw adaptation bridges through one flat view per draw."""

    def tree_lp(self, t):
        prec = jnp.asarray(PREC, jnp.float32)
        return -0.5 * (t["xy"] @ prec @ t["xy"]) - 0.5 * jnp.sum(t["w"] ** 2)

    def test_tree_statistics(self, key):
        """A tree ensemble samples the right posterior per leaf."""
        cfg = ChEESConfig(num_samples=800, step_size=0.3, burn=400)
        r_tree = run_chees(
            key, self.tree_lp, {"w": jnp.zeros(3), "xy": jnp.zeros(2)}, cfg,
            num_chains=16,
        )
        assert set(r_tree.samples.keys()) == {"w", "xy"}
        assert r_tree.samples["xy"].shape == (16, 800, 2)
        pooled = np.asarray(r_tree.samples["xy"][:, 500:]).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(pooled.T), COV, atol=0.15)
        w = np.asarray(r_tree.samples["w"][:, 500:]).reshape(-1, 3)
        np.testing.assert_allclose(w.std(0), [1.0, 1.0, 1.0], rtol=0.2)
        assert float(r_tree.final_trajectory_length) > 0.0

    def test_tree_matches_flat_per_draw(self, key):
        """With identical stacked inits, a flat potential in tree-ravel order
        (dict keys sort: w before xy) and adaptation off, tree and flat runs
        share the RNG schedule draw for draw — samples agree to float
        tolerance (reductions reassociate, so not bitwise)."""
        flat_lp = lambda v: -0.5 * jnp.sum(v[:3] ** 2) + corr_gaussian(v[3:])
        cfg = ChEESConfig(num_samples=40, step_size=0.25, burn=0, adapt=False)
        k0 = jax.random.fold_in(key, 7)
        w0 = jax.random.normal(k0, (16, 3))
        xy0 = jax.random.normal(jax.random.fold_in(key, 8), (16, 2))
        r_flat = run_chees(
            key, flat_lp, jnp.concatenate([w0, xy0], axis=-1), cfg,
            num_chains=16,
        )
        r_tree = run_chees(
            key, self.tree_lp, {"w": w0, "xy": xy0}, cfg, num_chains=16,
        )
        np.testing.assert_allclose(
            np.asarray(r_tree.samples["w"]),
            np.asarray(r_flat.samples[:, :, :3]), rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(r_tree.samples["xy"]),
            np.asarray(r_flat.samples[:, :, 3:]), rtol=2e-4, atol=2e-4,
        )

    def test_tree_adapt_mass_fixes_bad_scaling(self, key):
        """Cross-chain windowed diag warmup works on tree ensembles (the
        Welford merge sees the per-draw flat view)."""
        lp = lambda t: (-0.5 * jnp.sum((t["a"] / 0.1) ** 2)
                        - 0.5 * jnp.sum((t["b"] / 10.0) ** 2))
        cfg = ChEESConfig(num_samples=600, step_size=0.3, burn=400,
                          adapt_mass=True, init_trajectory_length=0.1)
        r = run_chees(key, lp, {"a": jnp.zeros(2), "b": jnp.zeros((2, 1))},
                      cfg, num_chains=16)
        a = np.asarray(r.samples["a"][:, 450:]).reshape(-1, 2)
        b = np.asarray(r.samples["b"][:, 450:]).reshape(-1, 2)
        np.testing.assert_allclose(a.std(0), [0.1, 0.1], rtol=0.35)
        np.testing.assert_allclose(b.std(0), [10.0, 10.0], rtol=0.35)
        # learned metric is the flat (D,) diagonal in tree-ravel order
        inv = np.asarray(r.final_carry.metric)
        assert inv.shape == (4,)
        assert inv[2] / inv[0] > 100.0

    def test_tree_with_inv_mass_tree(self, key):
        """A per-leaf inv_mass pytree seeds the fixed metric."""
        lp = lambda t: (-0.5 * jnp.sum((t["a"] / 0.1) ** 2)
                        - 0.5 * jnp.sum((t["b"] / 10.0) ** 2))
        cfg = ChEESConfig(num_samples=500, step_size=0.3, burn=300,
                          init_trajectory_length=0.1)
        inv_mass = {"a": jnp.full((2,), 0.01), "b": jnp.full((2, 1), 100.0)}
        r = run_chees(key, lp, {"a": jnp.zeros(2), "b": jnp.zeros((2, 1))},
                      cfg, num_chains=16, inv_mass=inv_mass)
        a = np.asarray(r.samples["a"][:, 350:]).reshape(-1, 2)
        b = np.asarray(r.samples["b"][:, 350:]).reshape(-1, 2)
        np.testing.assert_allclose(a.std(0), [0.1, 0.1], rtol=0.35)
        np.testing.assert_allclose(b.std(0), [10.0, 10.0], rtol=0.35)

    def test_tree_thin_and_stacked_init(self, key):
        """thin= works on tree traces; a (C, ...)-stacked tree init is
        taken as per-chain starting points."""
        cfg = ChEESConfig(num_samples=300, step_size=0.3, burn=150, thin=3)
        t0 = {"w": 0.01 * jnp.ones((16, 3)), "xy": jnp.zeros((16, 2))}
        r = run_chees(key, self.tree_lp, t0, cfg, num_chains=16)
        assert r.samples["w"].shape == (16, 100, 3)
        assert r.samples["xy"].shape == (16, 100, 2)
        assert bool(np.isfinite(np.asarray(r.samples["xy"])).all())

    def test_tree_rejects_dense_metrics(self, key):
        cfg = ChEESConfig(num_samples=10, burn=5, adapt_mass="dense")
        with pytest.raises(ValueError, match="dense|pytree"):
            run_chees(key, self.tree_lp, {"w": jnp.zeros(3), "xy": jnp.zeros(2)},
                      cfg, num_chains=8)
        with pytest.raises(ValueError, match="diagonal"):
            run_chees(key, self.tree_lp,
                      {"w": jnp.zeros(3), "xy": jnp.zeros(2)},
                      ChEESConfig(num_samples=10, burn=5), num_chains=8,
                      inv_mass=jnp.eye(5))

    def test_tree_mesh_checkpoint_resume_bit_exact(self, key, tmp_path):
        """Mesh-sharded pytree ensemble checkpointing: leaves shard along
        their chain axis inside each chunk's shard_map program; resume is
        bit-exact at fixed chunking."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_chees_checkpointed
        from hamiltorch_tpu.parallel.sharding import make_mesh

        t0 = {"w": jnp.zeros(3), "xy": jnp.zeros(2)}
        cfg = ChEESConfig(num_samples=80, step_size=0.25, burn=40,
                          adapt_mass=True)
        mesh = make_mesh(chains=4, data=2)
        r_full = run_chees_checkpointed(key, self.tree_lp, t0, cfg,
                                        str(tmp_path / "a"), num_chains=8,
                                        chunk_size=40, mesh=mesh)
        assert r_full.samples["w"].shape == (8, 80, 3)
        run_chees_checkpointed(key, self.tree_lp, t0,
                               dataclasses.replace(cfg, num_samples=40),
                               str(tmp_path / "b"), num_chains=8,
                               chunk_size=40, mesh=mesh)
        r_res = run_chees_checkpointed(key, self.tree_lp, t0, cfg,
                                       str(tmp_path / "b"), num_chains=8,
                                       chunk_size=40, mesh=mesh)
        for k in ("w", "xy"):
            np.testing.assert_array_equal(
                np.asarray(r_res.samples[k]), np.asarray(r_full.samples[k]))

    def test_tree_checkpoint_resume_bit_exact(self, key, tmp_path):
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_chees_checkpointed

        t0 = {"w": jnp.zeros(3), "xy": jnp.zeros(2)}
        cfg = ChEESConfig(num_samples=120, step_size=0.25, burn=60,
                          adapt_mass=True)
        r_direct = run_chees(key, self.tree_lp, t0, cfg, num_chains=8)
        r_ck = run_chees_checkpointed(key, self.tree_lp, t0, cfg,
                                      str(tmp_path / "a"), num_chains=8,
                                      chunk_size=50)
        for k in ("w", "xy"):
            np.testing.assert_array_equal(
                np.asarray(r_ck.samples[k]), np.asarray(r_direct.samples[k]))
        run_chees_checkpointed(key, self.tree_lp, t0,
                               dataclasses.replace(cfg, num_samples=50),
                               str(tmp_path / "b"), num_chains=8,
                               chunk_size=50)
        r_res = run_chees_checkpointed(key, self.tree_lp, t0, cfg,
                                       str(tmp_path / "b"), num_chains=8,
                                       chunk_size=50)
        for k in ("w", "xy"):
            np.testing.assert_array_equal(
                np.asarray(r_res.samples[k]), np.asarray(r_direct.samples[k]))


@pytest.mark.slow
class TestTrajectoryGradientRobustness:
    def test_overflowing_criterion_gradient_does_not_kill_adaptation(self, key):
        """A BNN warmup whose chains transiently wander large-but-finite
        used to overflow the fourth-order ChEES criterion gradient to inf,
        NaN-ing Adam's second moment and freezing log T at NaN for the rest
        of the run (final_trajectory_length was nan with zero divergences).
        The gradient is now masked/bounded; adaptation must stay finite and
        actually move T off its init."""
        import flax.linen as nn

        class MLP(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Dense(1)(jnp.tanh(nn.Dense(32)(x)))

        from hamiltorch_tpu.models import define_model_log_prob

        x = jnp.linspace(-1, 1, 64)[:, None]
        y = jnp.sin(3 * x)
        lp, flat0, _ = define_model_log_prob(MLP(), "regression", x, y,
                                             tau_out=100.0)
        cfg = ChEESConfig(num_samples=200, step_size=0.005, burn=150,
                          adapt_mass=True, init_trajectory_length=0.05)
        r = run_chees(jax.random.fold_in(key, 42), lp, flat0, cfg,
                      num_chains=16)
        tl = np.asarray(r.info.trajectory_length)
        assert np.isfinite(tl).all(), "trajectory length went non-finite"
        assert np.isfinite(float(r.final_trajectory_length))
        assert float(r.final_trajectory_length) != pytest.approx(0.05, rel=1e-3)
