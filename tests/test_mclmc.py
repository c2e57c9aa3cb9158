"""MCLMC tests: isokinetic dynamics invariants, (eps, L) auto-tuning to the
energy-variance target, posterior recovery on pooled chains, chunked-resume
bit-exactness, pytree states, divergence handling, ArviZ export, and config
validation.

No reference counterpart — MCLMC (arXiv:2212.08549 / 2303.18221) is the
modern unadjusted gradient-budget winner the reference predates; it rides
the repo's fold_in-RNG and jit-operand conventions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.mclmc import (
    MCLMCConfig,
    run_mclmc,
    run_mclmc_chains,
)

STDS = jnp.linspace(0.5, 3.0, 20)


def aniso_lp(t):
    return -0.5 * jnp.sum((t / STDS) ** 2)


def iso_lp(t):
    return -0.5 * jnp.sum(t**2)


class TestStatistics:
    @pytest.mark.slow
    def test_tuned_gaussian_recovery(self, key):
        """Auto-tuned (eps, L) on a 20-d anisotropic Gaussian: pooled
        chains recover every marginal std to a few percent and the
        realised Var[dE]/d sits at the tuning target."""
        cfg = MCLMCConfig(num_samples=3000, tune_steps=1500)
        r = run_mclmc_chains(key, aniso_lp, jnp.zeros(20) + 0.1, cfg,
                             num_chains=8)
        assert r.samples.shape == (8, 3000, 20)
        pooled = np.asarray(r.samples).reshape(-1, 20)
        np.testing.assert_allclose(
            pooled.std(0), np.asarray(STDS), rtol=0.10
        )
        np.testing.assert_allclose(pooled.mean(0), 0.0, atol=0.25)
        # the energy-variance knob controls the discretisation bias; the
        # tuner should park Var[dE]/d within ~3x of the 5e-4 default
        var_e = float(np.var(np.asarray(r.stats.energy_change)) / 20)
        assert 5e-4 / 3 < var_e < 5e-4 * 3
        assert not bool(np.asarray(r.stats.divergent).any())

    @pytest.mark.slow
    def test_nongaussian_target(self, key):
        """Mildly banana-warped 2+2-d target: means recover (unadjusted
        bias stays under the tuning target's control)."""

        def lp(t):
            x, y, a, b = t[0], t[1], t[2], t[3]
            return (-0.5 * x**2 - 0.5 * (y - 0.5 * x**2) ** 2
                    - 0.5 * (a - 1.0) ** 2 - 0.5 * (b + 1.0) ** 2)

        cfg = MCLMCConfig(num_samples=6000, tune_steps=2000)
        r = run_mclmc_chains(key, lp, jnp.zeros(4), cfg, num_chains=8)
        pooled = np.asarray(r.samples).reshape(-1, 4)
        # E[y] = 0.5 E[x^2] = 0.5; E[a] = 1; E[b] = -1
        np.testing.assert_allclose(pooled.mean(0),
                                   [0.0, 0.5, 1.0, -1.0], atol=0.2)

    @pytest.mark.slow
    def test_leapfrog_integrator(self, key):
        """The one-gradient leapfrog variant targets the same posterior
        (the tuner absorbs its different eps^2-error constant)."""
        cfg = MCLMCConfig(num_samples=3000, tune_steps=1500,
                          integrator="leapfrog")
        r = run_mclmc_chains(key, aniso_lp, jnp.zeros(20) + 0.1, cfg,
                             num_chains=8)
        pooled = np.asarray(r.samples).reshape(-1, 20)
        np.testing.assert_allclose(pooled.std(0), np.asarray(STDS),
                                   rtol=0.12)


class TestMechanics:
    def test_resume_bit_exact(self, key):
        """tune once, sample in two chunks at the frozen (eps, L) ==
        one uninterrupted run, bit for bit (fold_in global-step RNG)."""
        t0 = jnp.full((8,), 0.5)
        full = run_mclmc(key, iso_lp, t0,
                         MCLMCConfig(num_samples=200, tune_steps=300))
        c1 = run_mclmc(key, iso_lp, t0,
                       MCLMCConfig(num_samples=100, tune_steps=300))
        c2 = run_mclmc(
            key, iso_lp, c1.final_theta,
            MCLMCConfig(num_samples=100, tune_steps=0,
                        step_size=float(c1.step_size),
                        trajectory_length=float(c1.trajectory_length)),
            init_u=c1.final_u, start_step=int(c1.final_step),
        )
        cat = jnp.concatenate([c1.samples, c2.samples])
        assert jnp.array_equal(cat, full.samples)
        assert jnp.array_equal(c1.step_size, full.step_size)
        assert jnp.array_equal(c1.trajectory_length, full.trajectory_length)

    def test_thin(self, key):
        """thin=k keeps every k-th state of the identical trajectory."""
        t0 = jnp.full((8,), 0.5)
        full = run_mclmc(key, iso_lp, t0,
                         MCLMCConfig(num_samples=200, tune_steps=300))
        thinned = run_mclmc(key, iso_lp, t0,
                            MCLMCConfig(num_samples=200, tune_steps=300,
                                        thin=2))
        assert thinned.samples.shape == (100, 8)
        assert jnp.array_equal(thinned.samples, full.samples[1::2])

    def test_pytree_state(self, key):
        """Pytree thetas ravel at the boundary; samples keep leaf shapes."""
        tree0 = {"w": jnp.ones((3, 2)) * 0.2, "b": jnp.zeros((4,))}

        def lp(t):
            return -0.5 * (jnp.sum(t["w"] ** 2)
                           + jnp.sum((t["b"] - 1.0) ** 2))

        r = run_mclmc(key, lp, tree0,
                      MCLMCConfig(num_samples=400, tune_steps=400))
        assert r.samples["w"].shape == (400, 3, 2)
        assert r.samples["b"].shape == (400, 4)
        np.testing.assert_allclose(
            np.asarray(r.samples["b"]).mean(0), 1.0, atol=0.35
        )
        assert r.final_theta["w"].shape == (3, 2)

    def test_pytree_chains(self, key):
        tree0 = {"a": jnp.zeros((3,)), "b": jnp.zeros(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + t["b"] ** 2)

        r = run_mclmc_chains(key, lp, tree0,
                             MCLMCConfig(num_samples=50, tune_steps=100),
                             num_chains=4)
        assert r.samples["a"].shape == (4, 50, 3)
        assert r.samples["b"].shape == (4, 50)
        assert r.step_size.shape == (4,)

    def test_mode_start_is_finite(self, key):
        """A chain seeded exactly at the mode sees a ZERO gradient on its
        first velocity update — the guarded 0/0 must yield the identity
        rotation, not NaN (regression: one NaN cascades through the
        tuner's halving rule and collapses the chain)."""
        r = run_mclmc(key, iso_lp, jnp.zeros(8),
                      MCLMCConfig(num_samples=200, tune_steps=200))
        assert bool(jnp.all(jnp.isfinite(r.samples)))
        assert float(jnp.std(r.samples)) > 0.3

    def test_divergence_flagged_not_raised(self, key):
        """An absurd fixed step size produces non-finite proposals: they
        are SKIPPED (state held) and flagged via stats.divergent — never
        an exception (repo convention)."""

        def sharp(t):
            return -0.5 * jnp.sum((t * 100.0) ** 2) - jnp.sum(t**4)

        r = run_mclmc(key, sharp, jnp.full((4,), 3.0),
                      MCLMCConfig(num_samples=50, tune_steps=0,
                                  step_size=1e6, trajectory_length=1.0))
        assert bool(jnp.all(jnp.isfinite(r.samples)))
        assert bool(np.asarray(r.stats.divergent).any())

    def test_fixed_scales_respected(self, key):
        """tune_steps=0 runs at the user's exact (eps, L)."""
        r = run_mclmc(key, iso_lp, jnp.ones(4),
                      MCLMCConfig(num_samples=20, tune_steps=0,
                                  step_size=0.37, trajectory_length=2.5))
        assert float(r.step_size) == pytest.approx(0.37)
        assert float(r.trajectory_length) == pytest.approx(2.5)

    def test_chains_distinct_starts(self, key):
        t0 = jnp.stack([jnp.full((6,), -1.0), jnp.full((6,), 1.0)])
        r = run_mclmc_chains(key, iso_lp, t0,
                             MCLMCConfig(num_samples=40, tune_steps=50),
                             num_chains=2)
        assert r.samples.shape == (2, 40, 6)
        assert not jnp.array_equal(r.samples[0], r.samples[1])


class TestValidation:
    def test_bad_config(self):
        with pytest.raises(ValueError, match="num_samples"):
            MCLMCConfig(num_samples=0)
        with pytest.raises(ValueError, match="step_size"):
            MCLMCConfig(num_samples=10, step_size=0.0)
        with pytest.raises(ValueError, match="integrator"):
            MCLMCConfig(num_samples=10, integrator="verlet")
        with pytest.raises(ValueError, match="divisible"):
            MCLMCConfig(num_samples=10, thin=3)
        with pytest.raises(ValueError, match="trajectory_length"):
            MCLMCConfig(num_samples=10, trajectory_length=-1.0)
        with pytest.raises(ValueError, match="tune_steps"):
            MCLMCConfig(num_samples=10, tune_steps=-1)
        with pytest.raises(ValueError, match="desired_energy_var"):
            MCLMCConfig(num_samples=10, desired_energy_var=0.0)

    def test_needs_dim_ge_2(self, key):
        with pytest.raises(ValueError, match="dimension >= 2"):
            run_mclmc(key, iso_lp, jnp.zeros(1),
                      MCLMCConfig(num_samples=10))

    def test_matrix_theta_rejected(self, key):
        with pytest.raises(ValueError, match="1-d"):
            run_mclmc(key, iso_lp, jnp.zeros((2, 3)),
                      MCLMCConfig(num_samples=10))

    def test_pass_grad_needs_flat(self, key):
        with pytest.raises(ValueError, match="pass_grad"):
            run_mclmc(key, lambda t: -jnp.sum(t["a"] ** 2),
                      {"a": jnp.zeros(3)}, MCLMCConfig(num_samples=10),
                      pass_grad=lambda t: t)


class TestArviz:
    def test_inference_dict_single(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict

        r = run_mclmc(key, iso_lp, jnp.ones(4),
                      MCLMCConfig(num_samples=30, tune_steps=50))
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (1, 30, 4)
        assert d["sample_stats"]["energy_change"].shape == (1, 30)
        assert d["sample_stats"]["diverging"].shape == (1, 30)
        assert d["sample_stats"]["step_size"].shape == (1, 30)
        assert d["sample_stats"]["trajectory_length"].shape == (1, 30)

    def test_inference_dict_chains(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict

        r = run_mclmc_chains(key, iso_lp, jnp.ones(4),
                             MCLMCConfig(num_samples=30, tune_steps=50),
                             num_chains=3)
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (3, 30, 4)
        assert d["sample_stats"]["step_size"].shape == (3, 30)
        # per-chain tuned eps broadcast along draws
        np.testing.assert_allclose(
            d["sample_stats"]["step_size"][:, 0], np.asarray(r.step_size)
        )


class TestCheckpointed:
    def test_chunked_bit_exact_and_resume(self, key, tmp_path):
        """Checkpointed == straight (the first chunk tunes, the tuned
        (eps, L) ride the state file, later chunks run frozen), and an
        interrupted run resumed from the state file is bitwise equal."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_mclmc_checkpointed

        t0 = jnp.full((8,), 0.5)
        cfg = MCLMCConfig(num_samples=300, tune_steps=200, thin=3)
        r = run_mclmc(key, iso_lp, t0, cfg)
        r_ck = run_mclmc_checkpointed(key, iso_lp, t0, cfg,
                                      str(tmp_path / "a"), chunk_size=90)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_ck.samples))
        np.testing.assert_array_equal(np.asarray(r.step_size),
                                      np.asarray(r_ck.step_size))
        np.testing.assert_array_equal(np.asarray(r.trajectory_length),
                                      np.asarray(r_ck.trajectory_length))
        np.testing.assert_array_equal(np.asarray(r.final_u),
                                      np.asarray(r_ck.final_u))
        # interrupt at 120 transitions, then resume to the full budget
        half = dataclasses.replace(cfg, num_samples=120)
        run_mclmc_checkpointed(key, iso_lp, t0, half, str(tmp_path / "b"),
                               chunk_size=90)
        r_res = run_mclmc_checkpointed(key, iso_lp, t0, cfg,
                                       str(tmp_path / "b"), chunk_size=90)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_res.samples))

    def test_pytree_checkpointed(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_mclmc_checkpointed

        tree0 = {"a": jnp.zeros((3,)), "b": jnp.ones(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + t["b"] ** 2)

        cfg = MCLMCConfig(num_samples=120, tune_steps=150)
        r = run_mclmc(key, lp, tree0, cfg)
        r_ck = run_mclmc_checkpointed(key, lp, tree0, cfg,
                                      str(tmp_path / "t"), chunk_size=50)
        assert r_ck.samples["a"].shape == (120, 3)
        for a, b in zip(jax.tree_util.tree_leaves(r.samples),
                        jax.tree_util.tree_leaves(r_ck.samples)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_longer_directory_truncates(self, key, tmp_path):
        """Resuming a directory left by a completed LONGER run returns
        exactly the requested draws (num_samples is a cosmetic
        fingerprint field)."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_mclmc_checkpointed

        t0 = jnp.full((4,), 0.5)
        cfg = MCLMCConfig(num_samples=200, tune_steps=100)
        run_mclmc_checkpointed(key, iso_lp, t0, cfg, str(tmp_path / "c"),
                               chunk_size=80)
        shorter = dataclasses.replace(cfg, num_samples=100)
        r_s = run_mclmc_checkpointed(key, iso_lp, t0, shorter,
                                     str(tmp_path / "c"), chunk_size=80)
        assert r_s.samples.shape == (100, 4)
        full = run_mclmc(key, iso_lp, t0, cfg)
        np.testing.assert_array_equal(np.asarray(r_s.samples),
                                      np.asarray(full.samples[:100]))

    def test_fingerprint_mismatch_raises(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_mclmc_checkpointed

        t0 = jnp.full((4,), 0.5)
        cfg = MCLMCConfig(num_samples=60, tune_steps=50)
        run_mclmc_checkpointed(key, iso_lp, t0, cfg, str(tmp_path / "f"),
                               chunk_size=30)
        other = MCLMCConfig(num_samples=60, tune_steps=50, step_size=0.5)
        with pytest.raises(ValueError, match="fingerprint"):
            run_mclmc_checkpointed(key, iso_lp, t0, other,
                                   str(tmp_path / "f"), chunk_size=30)


class TestChainsResume:
    def test_chains_resume_bit_exact(self, key):
        """resume_from continues every chain at its OWN tuned (eps, L):
        the glued ensemble trace equals one straight run bit for bit."""
        t0 = jnp.full((6,), 0.5)
        full = run_mclmc_chains(key, iso_lp, t0,
                                MCLMCConfig(num_samples=120, tune_steps=150),
                                num_chains=4)
        c1 = run_mclmc_chains(key, iso_lp, t0,
                              MCLMCConfig(num_samples=60, tune_steps=150),
                              num_chains=4)
        c2 = run_mclmc_chains(key, iso_lp, None,
                              MCLMCConfig(num_samples=60, tune_steps=0),
                              num_chains=4, resume_from=c1)
        cat = jnp.concatenate([c1.samples, c2.samples], axis=1)
        assert jnp.array_equal(cat, full.samples)
        assert jnp.array_equal(c2.step_size, full.step_size)

    def test_chains_resume_pytree(self, key):
        tree0 = {"a": jnp.zeros((3,)), "b": jnp.ones(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + t["b"] ** 2)

        full = run_mclmc_chains(key, lp, tree0,
                                MCLMCConfig(num_samples=80, tune_steps=100),
                                num_chains=3)
        c1 = run_mclmc_chains(key, lp, tree0,
                              MCLMCConfig(num_samples=40, tune_steps=100),
                              num_chains=3)
        c2 = run_mclmc_chains(key, lp, None,
                              MCLMCConfig(num_samples=40, tune_steps=0),
                              num_chains=3, resume_from=c1)
        glued = jnp.concatenate([c1.samples["a"], c2.samples["a"]], axis=1)
        assert jnp.array_equal(glued, full.samples["a"])

    def test_resume_requires_frozen_config(self, key):
        t0 = jnp.full((4,), 0.5)
        c1 = run_mclmc_chains(key, iso_lp, t0,
                              MCLMCConfig(num_samples=20, tune_steps=30),
                              num_chains=2)
        with pytest.raises(ValueError, match="tune_steps=0"):
            run_mclmc_chains(key, iso_lp, None,
                             MCLMCConfig(num_samples=20, tune_steps=10),
                             num_chains=2, resume_from=c1)
