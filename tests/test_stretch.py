"""Affine-invariant ensemble sampler tests: gradient-free recovery, the
affine-invariance property itself, resume bit-exactness, pytree walkers,
divergence handling, ArviZ export, and validation.

No reference counterpart — the stretch move (Goodman & Weare 2010 /
emcee, arXiv:1202.3665) is the standard gradient-free MCMC; it extends
this package to potentials autodiff cannot touch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.stretch import (
    StretchConfig,
    run_stretch,
)

STDS = jnp.array([0.5, 1.0, 2.0])


def aniso_lp(t):
    return -0.5 * jnp.sum((t / STDS) ** 2)


class TestStatistics:
    @pytest.mark.slow
    def test_gaussian_recovery(self, key):
        """Walker ensemble recovers anisotropic marginals without a single
        gradient evaluation; acceptance sits in the stretch move's
        textbook 0.2-0.8 band."""
        cfg = StretchConfig(num_samples=4000)
        r = run_stretch(key, aniso_lp, jnp.zeros(3), cfg, num_walkers=32)
        assert r.samples.shape == (4000, 32, 3)
        pooled = np.asarray(r.samples[1000:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.std(0), np.asarray(STDS),
                                   rtol=0.10)
        np.testing.assert_allclose(pooled.mean(0), 0.0, atol=0.15)
        assert 0.2 < float(r.acc_rate) < 0.8

    @pytest.mark.slow
    def test_affine_invariance(self, key):
        """The defining property: an ill-conditioned correlated Gaussian
        mixes exactly like its whitened twin — same acceptance, same
        pooled z-scored marginals — with NO tuning change."""
        rot = jnp.array([[0.8, -0.6], [0.6, 0.8]])
        scale = jnp.array([10.0, 0.1])  # condition number 1e4
        A = rot @ jnp.diag(scale)
        prec = jnp.linalg.inv(A @ A.T)

        def hard_lp(t):
            return -0.5 * t @ prec @ t

        def white_lp(t):
            return -0.5 * jnp.sum(t**2)

        cfg = StretchConfig(num_samples=3000)
        # start both in their own posterior's scale (x = A z)
        r_hard = run_stretch(key, hard_lp, jnp.zeros(2), cfg,
                             num_walkers=32, init_jitter=1.0)
        r_white = run_stretch(key, white_lp, jnp.zeros(2), cfg,
                              num_walkers=32, init_jitter=1.0)
        # acceptance must be indistinguishable (same chain law up to the
        # linear map); pooled z-scores of the hard problem recover N(0,1)
        assert abs(float(r_hard.acc_rate) - float(r_white.acc_rate)) < 0.05
        z = np.asarray(r_hard.samples[1000:]).reshape(-1, 2) @ np.asarray(
            jnp.linalg.inv(A).T
        )
        np.testing.assert_allclose(z.std(0), 1.0, rtol=0.1)

    @pytest.mark.slow
    def test_nondifferentiable_target(self, key):
        """A quantised (piecewise-constant) log-density — autodiff returns
        zero gradients everywhere, every gradient-based sampler stalls;
        the stretch move samples it."""

        def lp(t):
            # staircase approximation of a Gaussian: round the quadratic
            return -0.5 * jnp.floor(jnp.sum(t**2) * 4.0) / 4.0

        cfg = StretchConfig(num_samples=4000)
        r = run_stretch(key, lp, jnp.zeros(2), cfg, num_walkers=32)
        pooled = np.asarray(r.samples[1000:]).reshape(-1, 2)
        # the staircase target's std is near the smooth Gaussian's 1.0
        np.testing.assert_allclose(pooled.std(0), 1.0, rtol=0.15)
        assert float(r.acc_rate) > 0.2


class TestMechanics:
    def test_resume_bit_exact(self, key):
        """Two chunks through final_walkers/final_logp/final_step == one
        straight run, bit for bit (fold_in global-iteration RNG)."""
        cfg = StretchConfig(num_samples=200)
        full = run_stretch(key, aniso_lp, jnp.zeros(3), cfg, num_walkers=16)
        import dataclasses

        c1 = run_stretch(key, aniso_lp, jnp.zeros(3),
                         dataclasses.replace(cfg, num_samples=120),
                         num_walkers=16)
        c2 = run_stretch(key, aniso_lp, c1.final_walkers,
                         dataclasses.replace(cfg, num_samples=80),
                         num_walkers=16, init_logp=c1.final_logp,
                         start_step=int(c1.final_step))
        cat = jnp.concatenate([c1.samples, c2.samples])
        assert jnp.array_equal(cat, full.samples)

    def test_thin(self, key):
        cfg = StretchConfig(num_samples=120)
        full = run_stretch(key, aniso_lp, jnp.zeros(3), cfg, num_walkers=16)
        import dataclasses

        thinned = run_stretch(key, aniso_lp, jnp.zeros(3),
                              dataclasses.replace(cfg, thin=2),
                              num_walkers=16)
        assert thinned.samples.shape == (60, 16, 3)
        assert jnp.array_equal(thinned.samples, full.samples[1::2])

    def test_explicit_walker_matrix(self, key):
        w0 = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
        r = run_stretch(key, aniso_lp, w0, StretchConfig(num_samples=20),
                        num_walkers=16)
        assert r.samples.shape == (20, 16, 3)
        assert r.final_walkers.shape == (16, 3)

    def test_pytree_walkers(self, key):
        tree0 = {"a": jnp.zeros((2,)), "b": jnp.ones(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + (t["b"] - 1.0) ** 2)

        r = run_stretch(key, lp, tree0, StretchConfig(num_samples=600),
                        num_walkers=16)
        assert r.samples["a"].shape == (600, 16, 2)
        assert r.samples["b"].shape == (600, 16)
        np.testing.assert_allclose(
            np.asarray(r.samples["b"][200:]).mean(), 1.0, atol=0.25
        )
        assert r.final_walkers["a"].shape == (16, 2)

    def test_divergence_flagged_not_raised(self, key):
        """Proposals landing outside a hard support (-inf logp) auto-
        reject; a NaN region flags stats.divergent, never an exception."""

        def cliff(t):
            return jnp.where(jnp.all(jnp.abs(t) < 1.0),
                             -0.5 * jnp.sum(t**2), jnp.nan)

        r = run_stretch(key, cliff, jnp.zeros(2),
                        StretchConfig(num_samples=200), num_walkers=16,
                        init_jitter=0.1)
        assert bool(jnp.all(jnp.isfinite(r.samples)))
        assert bool(np.asarray(r.samples).std() > 0)  # still moves inside
        assert bool(np.asarray(r.stats.divergent).any())

    def test_walkers_decorrelate(self, key):
        """Distinct walkers explore distinct trajectories."""
        r = run_stretch(key, aniso_lp, jnp.zeros(3),
                        StretchConfig(num_samples=50), num_walkers=8)
        assert not jnp.array_equal(r.samples[:, 0], r.samples[:, 1])


class TestValidation:
    def test_bad_config(self):
        with pytest.raises(ValueError, match="num_samples"):
            StretchConfig(num_samples=0)
        with pytest.raises(ValueError, match="stretch scale"):
            StretchConfig(num_samples=10, a=1.0)
        with pytest.raises(ValueError, match="divisible"):
            StretchConfig(num_samples=10, thin=3)

    def test_bad_walker_counts(self, key):
        with pytest.raises(ValueError, match="EVEN"):
            run_stretch(key, aniso_lp, jnp.zeros(3),
                        StretchConfig(num_samples=5), num_walkers=7)
        with pytest.raises(ValueError, match="EVEN"):
            run_stretch(key, aniso_lp, jnp.zeros(3),
                        StretchConfig(num_samples=5), num_walkers=2)

    def test_walker_matrix_shape_mismatch(self, key):
        with pytest.raises(ValueError, match="rows"):
            run_stretch(key, aniso_lp, jnp.zeros((8, 3)),
                        StretchConfig(num_samples=5), num_walkers=16)


class TestArviz:
    def test_inference_dict(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict

        r = run_stretch(key, aniso_lp, jnp.zeros(3),
                        StretchConfig(num_samples=30), num_walkers=8)
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (8, 30, 3)
        assert d["sample_stats"]["acceptance_rate"].shape == (8, 30)
        assert d["sample_stats"]["diverging"].shape == (8, 30)


class TestCheckpointed:
    def test_chunked_bit_exact_and_resume(self, key, tmp_path):
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_stretch_checkpointed

        cfg = StretchConfig(num_samples=240, thin=2)
        r = run_stretch(key, aniso_lp, jnp.zeros(3), cfg, num_walkers=16)
        r_ck = run_stretch_checkpointed(key, aniso_lp, jnp.zeros(3), cfg,
                                        str(tmp_path / "a"), chunk_size=90,
                                        num_walkers=16)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_ck.samples))
        np.testing.assert_array_equal(np.asarray(r.final_logp),
                                      np.asarray(r_ck.final_logp))
        half = dataclasses.replace(cfg, num_samples=120)
        run_stretch_checkpointed(key, aniso_lp, jnp.zeros(3), half,
                                 str(tmp_path / "b"), chunk_size=90,
                                 num_walkers=16)
        r_res = run_stretch_checkpointed(key, aniso_lp, jnp.zeros(3), cfg,
                                         str(tmp_path / "b"), chunk_size=90,
                                         num_walkers=16)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_res.samples))

    def test_pytree_checkpointed(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_stretch_checkpointed

        tree0 = {"a": jnp.zeros((2,)), "b": jnp.ones(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + (t["b"] - 1.0) ** 2)

        cfg = StretchConfig(num_samples=100)
        r = run_stretch(key, lp, tree0, cfg, num_walkers=8)
        r_ck = run_stretch_checkpointed(key, lp, tree0, cfg,
                                        str(tmp_path / "t"), chunk_size=40,
                                        num_walkers=8)
        assert r_ck.samples["a"].shape == (100, 8, 2)
        for a, b in zip(jax.tree_util.tree_leaves(r.samples),
                        jax.tree_util.tree_leaves(r_ck.samples)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
