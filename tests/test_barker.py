"""Barker proposal tests: posterior recovery under step-size + scale
adaptation, the bounded-gradient robustness property, chunked-resume
bit-exactness, pytree states, hard-support/divergence handling, ArviZ
export, and config validation.

No reference counterpart — the Barker proposal (Livingstone & Zanella
2022, arXiv:1908.11812) is the robust first-order MH member; it shares
the dual-averaging machinery with the HMC stack and the Welford
machinery with samplers/warmup.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.samplers.barker import (
    BarkerConfig,
    run_barker,
    run_barker_chains,
)

STDS = jnp.linspace(0.5, 3.0, 8)


def aniso_lp(t):
    return -0.5 * jnp.sum((t / STDS) ** 2)


def iso_lp(t):
    return -0.5 * jnp.sum(t**2)


class TestStatistics:
    @pytest.mark.slow
    def test_gaussian_recovery_with_scale_adaptation(self, key):
        """Pooled adapted chains recover anisotropic marginals; the
        post-burn acceptance sits near the 0.574 dual-averaging target;
        the learned preconditioner tracks the true stds."""
        cfg = BarkerConfig(num_samples=6000, burn=1200, adapt_scale=True)
        r = run_barker_chains(key, aniso_lp, jnp.zeros(8) + 0.1, cfg,
                              num_chains=8)
        assert r.samples.shape == (8, 6000, 8)
        pooled = np.asarray(r.samples[:, 1200:]).reshape(-1, 8)
        np.testing.assert_allclose(pooled.std(0), np.asarray(STDS),
                                   rtol=0.12)
        np.testing.assert_allclose(pooled.mean(0), 0.0, atol=0.25)
        acc = float(np.mean(np.asarray(r.acc_rate)))
        assert 0.45 < acc < 0.70, acc
        assert not bool(np.asarray(r.stats.divergent[:, 1200:]).any())
        # the adapted per-coordinate proposal stds order like the truth
        sc = np.asarray(r.scale)  # (chains, D)
        corr = np.corrcoef(sc.mean(0), np.asarray(STDS))[0, 1]
        assert corr > 0.95, (sc.mean(0), corr)

    @pytest.mark.slow
    def test_robust_to_wild_initial_step(self, key):
        """The Barker selling point: the gradient enters only through a
        bounded probability, so a 100x-too-large initial step cannot
        catapult the chain — dual averaging walks eps down and the run
        still recovers the target (MALA-style eps^2*g drift would emit
        non-finite proposals immediately on this target)."""
        lp = lambda t: -0.25 * jnp.sum(t**4)  # super-Gaussian tails
        cfg = BarkerConfig(num_samples=4000, burn=1000, step_size=50.0)
        r = run_barker_chains(key, lp, jnp.zeros(4) + 0.2, cfg,
                              num_chains=8)
        pooled = np.asarray(r.samples[:, 1000:]).reshape(-1, 4)
        # E[x^2] of exp(-x^4/4)/Z: 2*Gamma(3/4)/Gamma(1/4) = 0.6760
        np.testing.assert_allclose(pooled.var(0),
                                   np.full(4, 0.675978), rtol=0.15)
        assert not bool(np.asarray(r.stats.divergent).any())

    @pytest.mark.slow
    def test_correlated_gaussian(self, key):
        rho = 0.8
        prec = jnp.linalg.inv(jnp.array([[1.0, rho], [rho, 1.0]]))
        lp = lambda t: -0.5 * t @ prec @ t
        cfg = BarkerConfig(num_samples=5000, burn=1000)
        r = run_barker_chains(key, lp, jnp.zeros(2), cfg, num_chains=8)
        pooled = np.asarray(r.samples[:, 1000:]).reshape(-1, 2)
        emp = np.cov(pooled.T)
        np.testing.assert_allclose(
            emp, [[1.0, rho], [rho, 1.0]], atol=0.08
        )


class TestMechanics:
    def test_resume_bit_exact(self, key):
        """Two chunks through final_theta/final_da/final_welford/
        final_step == one straight run, bit for bit (the Welford window
        and the scale switch land in chunk 1; chunk 2 must reproduce the
        switched scales from the carried state alone)."""
        t0 = jnp.full((6,), 0.5)
        cfg = BarkerConfig(num_samples=200, burn=80, adapt_scale=True)
        full = run_barker(key, iso_lp, t0, cfg)
        c1 = run_barker(key, iso_lp, t0,
                        dataclasses.replace(cfg, num_samples=100))
        c2 = run_barker(key, iso_lp, c1.final_theta,
                        dataclasses.replace(cfg, num_samples=100),
                        init_da=c1.final_da, init_welford=c1.final_welford,
                        start_step=int(c1.final_step))
        cat = jnp.concatenate([c1.samples, c2.samples])
        assert jnp.array_equal(cat, full.samples)
        assert jnp.array_equal(c2.step_size, full.step_size)
        assert jnp.array_equal(c2.scale, full.scale)

    def test_thin(self, key):
        t0 = jnp.full((4,), 0.5)
        cfg = BarkerConfig(num_samples=120, burn=0, adapt_step_size=False,
                           step_size=0.8)
        full = run_barker(key, iso_lp, t0, cfg)
        thinned = run_barker(key, iso_lp, t0,
                             dataclasses.replace(cfg, thin=4))
        assert thinned.samples.shape == (30, 4)
        assert jnp.array_equal(thinned.samples, full.samples[3::4])

    def test_pytree_matches_flat(self, key):
        """A pytree state runs through the same flat kernel: samples
        equal the flat run's, re-shaped per leaf."""
        t0_tree = {"w": jnp.full((2, 2), 0.3), "b": jnp.zeros(3)}

        def lp_tree(t):
            return (-0.5 * jnp.sum((t["w"] / 0.5) ** 2)
                    - 0.5 * jnp.sum((t["b"] / 2.0) ** 2))

        from jax.flatten_util import ravel_pytree

        flat0, unravel = ravel_pytree(t0_tree)
        lp_flat = lambda th: lp_tree(unravel(th))
        cfg = BarkerConfig(num_samples=60, burn=20)
        r_tree = run_barker(key, lp_tree, t0_tree, cfg)
        r_flat = run_barker(key, lp_flat, flat0, cfg)
        flat_tree = jax.vmap(lambda t: ravel_pytree(t)[0])(r_tree.samples)
        assert jnp.array_equal(flat_tree, r_flat.samples)

    def test_per_leaf_scale(self, key):
        """A per-leaf scale pytree ravels alongside the state and equals
        the explicit flat (D,) scale run."""
        t0_tree = {"a": jnp.zeros(2), "b": jnp.zeros(3)}
        lp_tree = lambda t: (-0.5 * jnp.sum((t["a"] / 0.4) ** 2)
                             - 0.5 * jnp.sum((t["b"] / 3.0) ** 2))
        from jax.flatten_util import ravel_pytree

        flat0, unravel = ravel_pytree(t0_tree)
        lp_flat = lambda th: lp_tree(unravel(th))
        cfg = BarkerConfig(num_samples=50, burn=10)
        r_tree = run_barker(key, lp_tree, t0_tree, cfg,
                            scale={"a": 0.4, "b": 3.0})
        r_flat = run_barker(key, lp_flat, flat0, cfg,
                            scale=jnp.array([0.4, 0.4, 3.0, 3.0, 3.0]))
        flat_tree = jax.vmap(lambda t: ravel_pytree(t)[0])(r_tree.samples)
        assert jnp.array_equal(flat_tree, r_flat.samples)

    def test_hard_support_rejection_not_divergent(self, key):
        """Proposals outside a hard support (log p = -inf) reject
        cleanly WITHOUT a divergence flag; NaN gradients there don't
        leak into the state."""
        lp = lambda t: (-0.5 * jnp.sum(t**2)
                        + jnp.log(jnp.where(t[0] < 1.0, 1.0, 0.0)))
        cfg = BarkerConfig(num_samples=300, burn=50, step_size=2.0)
        r = run_barker(key, lp, jnp.zeros(3) + 0.8, cfg)
        assert bool(jnp.all(jnp.isfinite(r.samples)))
        assert bool(jnp.all(r.samples[:, 0] < 1.0))
        assert not bool(np.asarray(r.stats.divergent).any())

    def test_nan_cliff_flags_divergent(self, key):
        lp = lambda t: jnp.where(
            t[0] < 2.0, -0.5 * jnp.sum(t**2), jnp.nan
        )
        cfg = BarkerConfig(num_samples=400, burn=0, adapt_step_size=False,
                           step_size=3.0)
        r = run_barker(key, lp, jnp.full((2,), 1.5), cfg)
        assert bool(jnp.all(jnp.isfinite(r.samples)))
        assert bool(np.asarray(r.stats.divergent).any())

    def test_validation(self, key):
        with pytest.raises(RuntimeError, match="burn"):
            run_barker(key, iso_lp, jnp.zeros(2),
                       BarkerConfig(num_samples=10, burn=10))
        with pytest.raises(ValueError, match="adapt_scale"):
            BarkerConfig(num_samples=10, burn=4, adapt_scale=True)
        with pytest.raises(ValueError, match="adapt_step_size"):
            BarkerConfig(num_samples=10, burn=0)
        with pytest.raises(ValueError, match="divisible"):
            BarkerConfig(num_samples=10, burn=2, thin=3)
        with pytest.raises(ValueError, match="step_size"):
            BarkerConfig(num_samples=10, burn=2, step_size=0.0)

    def test_arviz_export(self, key):
        from hamiltorch_tpu.diagnostics import to_inference_dict

        cfg = BarkerConfig(num_samples=40, burn=10)
        r1 = run_barker(key, iso_lp, jnp.zeros(3), cfg)
        d1 = to_inference_dict(r1)
        assert d1["posterior"]["theta"].shape == (1, 40, 3)
        assert d1["sample_stats"]["acceptance_rate"].shape == (1, 40)
        rc = run_barker_chains(key, iso_lp, jnp.zeros(3), cfg,
                               num_chains=4)
        dc = to_inference_dict(rc)
        assert dc["posterior"]["theta"].shape == (4, 40, 3)
        assert dc["sample_stats"]["diverging"].shape == (4, 40)
        assert dc["sample_stats"]["step_size"].shape == (4, 40)


class TestCheckpoint:
    def test_checkpointed_bit_exact_and_resume(self, key, tmp_path):
        """Chunked run (dual-averaging + Welford carries riding the
        state file) == straight run, bit for bit; a directory holding a
        completed shorter run resumes into the longer one."""
        from hamiltorch_tpu.checkpoint import run_barker_checkpointed

        t0 = jnp.full((6,), 0.5)
        cfg = BarkerConfig(num_samples=240, burn=100, adapt_scale=True,
                           thin=2)
        r = run_barker(key, iso_lp, t0, cfg)
        r_ck = run_barker_checkpointed(key, iso_lp, t0, cfg,
                                       str(tmp_path / "a"), chunk_size=90)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_ck.samples))
        np.testing.assert_array_equal(np.asarray(r.step_size),
                                      np.asarray(r_ck.step_size))
        np.testing.assert_array_equal(np.asarray(r.scale),
                                      np.asarray(r_ck.scale))
        np.testing.assert_allclose(np.asarray(r.acc_rate),
                                   np.asarray(r_ck.acc_rate), rtol=1e-6)
        half = dataclasses.replace(cfg, num_samples=120)
        run_barker_checkpointed(key, iso_lp, t0, half, str(tmp_path / "b"),
                                chunk_size=90)
        r_res = run_barker_checkpointed(key, iso_lp, t0, cfg,
                                        str(tmp_path / "b"), chunk_size=90)
        np.testing.assert_array_equal(np.asarray(r.samples),
                                      np.asarray(r_res.samples))

    def test_pytree_checkpointed(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_barker_checkpointed

        tree0 = {"a": jnp.zeros((3,)), "b": jnp.ones(())}

        def lp(t):
            return -0.5 * (jnp.sum(t["a"] ** 2) + t["b"] ** 2)

        cfg = BarkerConfig(num_samples=120, burn=40)
        r = run_barker(key, lp, tree0, cfg)
        r_ck = run_barker_checkpointed(key, lp, tree0, cfg,
                                       str(tmp_path / "t"), chunk_size=50)
        assert r_ck.samples["a"].shape == (120, 3)
        for a, b in zip(jax.tree_util.tree_leaves(r.samples),
                        jax.tree_util.tree_leaves(r_ck.samples)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
