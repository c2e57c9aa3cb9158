"""MAMS tests: exactness of the Metropolis-adjusted microcanonical sampler,
dual-averaging adaptation to the 0.9 target, chunked-resume bit-exactness,
pytree states, divergence handling, ArviZ export, and config validation.

No reference counterpart — MAMS (arXiv:2503.01707) is the exact member of
the microcanonical family; it shares the isokinetic integrator with
samplers/mclmc.py and the dual-averaging machinery with the HMC stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.mams import (
    MAMSConfig,
    run_mams,
    run_mams_chains,
)

STDS = jnp.linspace(0.5, 3.0, 10)


def aniso_lp(t):
    return -0.5 * jnp.sum((t / STDS) ** 2)


def iso_lp(t):
    return -0.5 * jnp.sum(t**2)


class TestStatistics:
    @pytest.mark.slow
    def test_gaussian_recovery_and_acceptance(self, key):
        """Pooled adapted chains recover anisotropic marginals; the
        post-burn acceptance sits near the 0.9 dual-averaging target."""
        cfg = MAMSConfig(num_samples=2500, num_steps_per_sample=12,
                         burn=500)
        r = run_mams_chains(key, aniso_lp, jnp.zeros(10) + 0.1, cfg,
                            num_chains=8)
        assert r.samples.shape == (8, 2500, 10)
        pooled = np.asarray(r.samples[:, 500:]).reshape(-1, 10)
        np.testing.assert_allclose(pooled.std(0), np.asarray(STDS),
                                   rtol=0.10)
        np.testing.assert_allclose(pooled.mean(0), 0.0, atol=0.2)
        acc = float(np.mean(np.asarray(r.acc_rate)))
        assert 0.75 < acc <= 1.0
        assert not bool(np.asarray(r.stats.divergent[:, 500:]).any())

    @pytest.mark.slow
    def test_exactness_vs_mclmc_bias(self, key):
        """MAMS is EXACT: at a deliberately coarse fixed step the adjusted
        sampler's variance stays unbiased where unadjusted MCLMC at the
        same step carries a visible O(eps^2) inflation on a sharp
        Gaussian."""
        from hamiltorch_tpu.samplers.mclmc import MCLMCConfig, run_mclmc_chains

        d = 6
        lp = lambda t: -0.5 * jnp.sum(t**2)
        eps = 0.9  # coarse for this target
        mams = run_mams_chains(
            key, lp, jnp.zeros(d) + 0.5,
            MAMSConfig(num_samples=4000, num_steps_per_sample=5,
                       step_size=eps, adapt_step_size=False),
            num_chains=8,
        )
        mclmc = run_mclmc_chains(
            key, lp, jnp.zeros(d) + 0.5,
            MCLMCConfig(num_samples=4000 * 5, tune_steps=0, step_size=eps,
                        trajectory_length=2.0),
            num_chains=8,
        )
        var_mams = float(np.asarray(mams.samples[:, 500:]).reshape(-1, d)
                         .var(0).mean())
        var_mclmc = float(np.asarray(mclmc.samples[:, 2500:]).reshape(-1, d)
                          .var(0).mean())
        # exact: within 5%; unadjusted at eps=0.9 inflates measurably more
        assert abs(var_mams - 1.0) < 0.05, var_mams
        assert abs(var_mclmc - 1.0) > abs(var_mams - 1.0), (
            var_mclmc, var_mams
        )

    @pytest.mark.slow
    def test_leapfrog_integrator(self, key):
        cfg = MAMSConfig(num_samples=2500, num_steps_per_sample=12,
                         burn=500, integrator="leapfrog")
        r = run_mams_chains(key, aniso_lp, jnp.zeros(10) + 0.1, cfg,
                            num_chains=8)
        pooled = np.asarray(r.samples[:, 500:]).reshape(-1, 10)
        np.testing.assert_allclose(pooled.std(0), np.asarray(STDS),
                                   rtol=0.12)


class TestMechanics:
    def test_resume_bit_exact(self, key):
        """Two chunks through final_theta/final_da/final_step == one
        straight run, bit for bit (fold_in global-draw RNG; post-burn
        indices freeze adaptation automatically)."""
        t0 = jnp.full((6,), 0.5)
        cfg = MAMSConfig(num_samples=200, num_steps_per_sample=6, burn=80)
        full = run_mams(key, iso_lp, t0, cfg)
        import dataclasses

        c1 = run_mams(key, iso_lp, t0,
                      dataclasses.replace(cfg, num_samples=120))
        c2 = run_mams(key, iso_lp, c1.final_theta,
                      dataclasses.replace(cfg, num_samples=80),
                      init_da=c1.final_da, start_step=int(c1.final_step))
        cat = jnp.concatenate([c1.samples, c2.samples])
        assert jnp.array_equal(cat, full.samples)
        assert jnp.array_equal(c2.step_size, full.step_size)

    def test_thin(self, key):
        """thin=k keeps every k-th state of the identical trajectory.
        Fixed step: under adaptation the thin-1 and thin-k programs
        compile differently and the dual-averaging f32 arithmetic drifts
        ~1 ulp, which the chaotic dynamics amplify — same caveat as
        checkpoint.py's chunked-vs-straight note."""
        t0 = jnp.full((6,), 0.5)
        cfg = MAMSConfig(num_samples=120, num_steps_per_sample=6,
                         step_size=0.8, adapt_step_size=False)
        full = run_mams(key, iso_lp, t0, cfg)
        import dataclasses

        thinned = run_mams(key, iso_lp, t0,
                           dataclasses.replace(cfg, thin=2))
        assert thinned.samples.shape == (60, 6)
        assert jnp.array_equal(thinned.samples, full.samples[1::2])

    def test_pytree_state(self, key):
        tree0 = {"w": jnp.ones((3, 2)) * 0.2, "b": jnp.zeros((4,))}

        def lp(t):
            return -0.5 * (jnp.sum(t["w"] ** 2)
                           + jnp.sum((t["b"] - 1.0) ** 2))

        cfg = MAMSConfig(num_samples=400, num_steps_per_sample=8, burn=100)
        r = run_mams(key, lp, tree0, cfg)
        assert r.samples["w"].shape == (400, 3, 2)
        assert r.samples["b"].shape == (400, 4)
        np.testing.assert_allclose(
            np.asarray(r.samples["b"][100:]).mean(0), 1.0, atol=0.35
        )

    def test_pytree_chains(self, key):
        tree0 = {"a": jnp.zeros((3,)), "b": jnp.zeros(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + t["b"] ** 2)

        cfg = MAMSConfig(num_samples=50, num_steps_per_sample=4, burn=20)
        r = run_mams_chains(key, lp, tree0, cfg, num_chains=4)
        assert r.samples["a"].shape == (4, 50, 3)
        assert r.samples["b"].shape == (4, 50)
        assert r.step_size.shape == (4,)

    def test_divergence_flagged_not_raised(self, key):
        def sharp(t):
            return -0.5 * jnp.sum((t * 100.0) ** 2) - jnp.sum(t**4)

        cfg = MAMSConfig(num_samples=50, num_steps_per_sample=4,
                         step_size=1e6, adapt_step_size=False)
        r = run_mams(key, sharp, jnp.full((4,), 3.0), cfg)
        assert bool(jnp.all(jnp.isfinite(r.samples)))
        assert bool(np.asarray(r.stats.divergent).any())
        # divergent trajectories are never accepted
        assert not bool(np.asarray(
            r.stats.accepted & r.stats.divergent
        ).any())

    def test_fixed_step_respected(self, key):
        cfg = MAMSConfig(num_samples=20, num_steps_per_sample=4,
                         step_size=0.37, adapt_step_size=False)
        r = run_mams(key, iso_lp, jnp.ones(4), cfg)
        assert float(r.step_size) == pytest.approx(0.37)
        np.testing.assert_allclose(np.asarray(r.stats.step_size), 0.37,
                                   rtol=1e-6)

    def test_rejected_draws_hold_state(self, key):
        """A rejection repeats the previous state in the trace (MH), it
        never moves partially."""
        cfg = MAMSConfig(num_samples=200, num_steps_per_sample=6,
                         step_size=1.5, adapt_step_size=False)
        r = run_mams(key, aniso_lp, jnp.zeros(10) + 0.5, cfg)
        acc = np.asarray(r.stats.accepted)
        s = np.asarray(r.samples)
        assert not acc.all() and acc.any()  # coarse step: some of each
        prev = np.concatenate([np.full((1, 10), 0.5), s[:-1]])
        held = (s == prev).all(axis=1)
        np.testing.assert_array_equal(held, ~acc)


class TestValidation:
    def test_bad_config(self):
        with pytest.raises(ValueError, match="num_samples"):
            MAMSConfig(num_samples=0)
        with pytest.raises(ValueError, match="num_steps_per_sample"):
            MAMSConfig(num_samples=10, num_steps_per_sample=0)
        with pytest.raises(ValueError, match="burn"):
            MAMSConfig(num_samples=10, burn=-1)
        from hamiltorch_tpu.samplers.mams import run_mams as _rm

        with pytest.raises(RuntimeError, match="burn"):
            _rm(jax.random.PRNGKey(0), iso_lp, jnp.zeros(4),
                MAMSConfig(num_samples=10, burn=10))
        with pytest.raises(ValueError, match="adapt_step_size"):
            MAMSConfig(num_samples=10, burn=0, adapt_step_size=True)
        with pytest.raises(ValueError, match="integrator"):
            MAMSConfig(num_samples=10, burn=2, integrator="verlet")
        with pytest.raises(ValueError, match="divisible"):
            MAMSConfig(num_samples=10, burn=2, thin=3)
        with pytest.raises(ValueError, match="desired_accept_rate"):
            MAMSConfig(num_samples=10, burn=2, desired_accept_rate=1.5)


class TestArviz:
    def test_inference_dict(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict

        cfg = MAMSConfig(num_samples=30, num_steps_per_sample=4, burn=10)
        r = run_mams_chains(key, iso_lp, jnp.ones(4), cfg, num_chains=3)
        d = to_inference_dict(r)
        assert d["posterior"]["theta"].shape == (3, 30, 4)
        assert d["sample_stats"]["acceptance_rate"].shape == (3, 30)
        assert d["sample_stats"]["energy_change"].shape == (3, 30)
        assert d["sample_stats"]["step_size"].shape == (3, 30)
        assert d["sample_stats"]["diverging"].shape == (3, 30)


class TestCheckpointed:
    def test_chunked_bit_exact_and_resume(self, key, tmp_path):
        """Checkpointed == straight (the dual-averaging state rides the
        state file; burn freezes at the same GLOBAL draw), and an
        interrupted run resumed from the state file is bitwise equal."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_mams_checkpointed

        t0 = jnp.full((6,), 0.5)
        cfg = MAMSConfig(num_samples=240, num_steps_per_sample=5, burn=100,
                         thin=2)
        r = run_mams(key, iso_lp, t0, cfg)
        r_ck = run_mams_checkpointed(key, iso_lp, t0, cfg,
                                     str(tmp_path / "a"), chunk_size=90)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_ck.samples))
        np.testing.assert_array_equal(np.asarray(r.step_size),
                                      np.asarray(r_ck.step_size))
        np.testing.assert_array_equal(np.asarray(r.stats.step_size),
                                      np.asarray(r_ck.stats.step_size))
        np.testing.assert_allclose(np.asarray(r.acc_rate),
                                   np.asarray(r_ck.acc_rate), rtol=1e-6)
        half = dataclasses.replace(cfg, num_samples=120)
        run_mams_checkpointed(key, iso_lp, t0, half, str(tmp_path / "b"),
                              chunk_size=90)
        r_res = run_mams_checkpointed(key, iso_lp, t0, cfg,
                                      str(tmp_path / "b"), chunk_size=90)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_res.samples))

    def test_pytree_checkpointed(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_mams_checkpointed

        tree0 = {"a": jnp.zeros((3,)), "b": jnp.ones(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + t["b"] ** 2)

        cfg = MAMSConfig(num_samples=120, num_steps_per_sample=5, burn=40)
        r = run_mams(key, lp, tree0, cfg)
        r_ck = run_mams_checkpointed(key, lp, tree0, cfg,
                                     str(tmp_path / "t"), chunk_size=50)
        assert r_ck.samples["a"].shape == (120, 3)
        for a, b in zip(jax.tree_util.tree_leaves(r.samples),
                        jax.tree_util.tree_leaves(r_ck.samples)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
