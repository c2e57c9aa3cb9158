"""Pytree-native chain-state path: parity with the flat-vector path.

The tree path exists for performance (no flat-theta slice/concat in the
hot loop — docs/BENCHMARKS.md "Where the time goes"); these tests pin its
correctness contract:

* single-chain samples are BIT-IDENTICAL to the flat path when the tree
  potential is the flat potential composed with ``tree_ravel`` (momentum
  is drawn as one flat vector and split, kinetic reduces over the raveled
  vector, leapfrog updates are leafwise elementwise ops);
* vmapped chains agree to float tolerance (XLA batches the two equivalent
  programs with different fusions, so 1-ulp drift can accumulate);
* every inv_mass form (None / flat diag / pytree diag / dense) matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.ops.mass import make_mass_tree, tree_ravel, tree_unravel_like
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc, run_hmc_chains

D = 7


def flat_lp(theta):
    return -0.5 * jnp.dot(theta, theta) - 0.1 * jnp.sum(theta**4)


def tree_lp(tree):
    return flat_lp(tree_ravel(tree))


def make_inits():
    theta0 = jnp.arange(1.0, D + 1) * 0.1
    tree0 = {"a": theta0[:3], "b": theta0[3:7].reshape(2, 2)}
    return theta0, tree0


def ravel_draws(samples_tree, lead_shape):
    return jnp.concatenate(
        [
            samples_tree["a"].reshape(lead_shape + (-1,)),
            samples_tree["b"].reshape(lead_shape + (-1,)),
        ],
        axis=-1,
    )


CFG = MCMCConfig(num_samples=50, num_steps_per_sample=10, step_size=0.1)


class TestTreeRavelHelpers:
    def test_ravel_matches_leaf_order(self):
        theta0, tree0 = make_inits()
        assert jnp.array_equal(tree_ravel(tree0), theta0)

    def test_unravel_roundtrip(self):
        theta0, tree0 = make_inits()
        back = tree_unravel_like(tree0, tree_ravel(tree0))
        for k in tree0:
            assert jnp.array_equal(back[k], tree0[k])

    def test_single_leaf_vector_passthrough(self):
        v = jnp.arange(5.0)
        assert tree_ravel(v) is v


class TestTreeMass:
    def test_pytree_diag_matches_flat_diag(self, key):
        theta0, tree0 = make_inits()
        inv_diag_tree = {"a": jnp.full((3,), 0.5), "b": jnp.full((2, 2), 2.0)}
        mass = make_mass_tree(inv_diag_tree, tree0)
        p = mass.sample(key)
        flat_mass = make_mass_tree(tree_ravel(inv_diag_tree), tree0)
        p2 = flat_mass.sample(key)
        for k in p:
            assert jnp.array_equal(p[k], p2[k])
        assert jnp.array_equal(mass.kinetic(p), flat_mass.kinetic(p))
        v1, v2 = mass.velocity(p), flat_mass.velocity(p)
        for k in v1:
            assert jnp.allclose(v1[k], v2[k])

    def test_identity_velocity_is_noop(self, key):
        _, tree0 = make_inits()
        mass = make_mass_tree(None, tree0)
        p = mass.sample(key)
        v = mass.velocity(p)
        for k in p:
            assert v[k] is p[k]


@pytest.mark.slow
class TestTreeHMCBitParity:
    @pytest.mark.parametrize("inv_mass_kind", ["none", "flat_diag", "tree_diag", "dense"])
    def test_single_chain_bitwise(self, key, inv_mass_kind):
        theta0, tree0 = make_inits()
        if inv_mass_kind == "none":
            im_flat = im_tree = None
        elif inv_mass_kind == "flat_diag":
            im_flat = im_tree = jnp.linspace(0.5, 2.0, D)
        elif inv_mass_kind == "tree_diag":
            im_flat = jnp.linspace(0.5, 2.0, D)
            im_tree = {"a": im_flat[:3], "b": im_flat[3:7].reshape(2, 2)}
        else:
            rng = np.random.default_rng(0)
            A = rng.normal(size=(D, D))
            im_flat = im_tree = jnp.asarray(A @ A.T / D + np.eye(D))
        r_flat = run_hmc(key, flat_lp, theta0, CFG, inv_mass=im_flat)
        r_tree = run_hmc(key, tree_lp, tree0, CFG, inv_mass=im_tree)
        got = ravel_draws(r_tree.samples, (CFG.num_samples,))
        if inv_mass_kind == "dense":
            # the dense drift is a matvec XLA may fuse differently between
            # the two (equivalent) programs; 1-ulp drift can accumulate
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(r_flat.samples), atol=1e-5
            )
        else:
            assert jnp.array_equal(got, r_flat.samples)
            assert jnp.array_equal(r_tree.stats.accepted, r_flat.stats.accepted)
            assert jnp.array_equal(r_tree.stats.energy_new, r_flat.stats.energy_new)

    def test_chains_match_to_tolerance(self, key):
        theta0, tree0 = make_inits()
        r_flat = run_hmc_chains(key, flat_lp, theta0, CFG, num_chains=4)
        r_tree = run_hmc_chains(key, tree_lp, tree0, CFG, num_chains=4)
        got = ravel_draws(r_tree.samples, (4, CFG.num_samples))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(r_flat.samples), atol=1e-5
        )

    def test_chains_stacked_inits(self, key):
        """Per-chain initial trees ((num_chains, ...) leaves) are honoured."""
        theta0, tree0 = make_inits()
        n = 4
        stacked = jax.tree_util.tree_map(
            lambda l: jnp.stack([l * (1.0 + 0.1 * c) for c in range(n)]), tree0
        )
        r = run_hmc_chains(
            key, tree_lp, stacked, CFG, num_chains=n, theta0_is_stacked=True
        )
        assert r.samples["a"].shape == (n, CFG.num_samples, 3)
        assert r.samples["b"].shape == (n, CFG.num_samples, 2, 2)
        assert float(jnp.mean(r.stats.accepted)) > 0.5

    def test_native_tree_potential_statistics(self, key):
        """A natively-tree potential (no ravel anywhere) samples correctly:
        standard normal posterior moments recovered over pooled chains."""

        def lp(tree):
            return -0.5 * sum(
                jnp.vdot(l, l) for l in jax.tree_util.tree_leaves(tree)
            )

        tree0 = {"a": jnp.zeros((3,)), "b": jnp.zeros((2, 2))}
        cfg = MCMCConfig(num_samples=400, num_steps_per_sample=8, step_size=0.3)
        r = run_hmc_chains(key, lp, tree0, cfg, num_chains=8)
        pooled = ravel_draws(r.samples, (8, 400))[:, 100:].reshape(-1, D)
        assert np.abs(np.mean(pooled, 0)).max() < 0.15
        assert np.abs(np.std(pooled, 0) - 1.0).max() < 0.15


@pytest.mark.slow
class TestTreeHMCWarmupAndCheckpoint:
    """Diag windowed warmup and chunked checkpointing on pytree chain
    states (the flat Welford bridge + tree-generic persistence layer)."""

    def lp(self, t):
        return (-0.5 * jnp.sum((t["a"] / 0.05) ** 2)
                - 0.5 * jnp.sum((t["b"] / 20.0) ** 2))

    def test_tree_adapt_mass_fixes_bad_scaling(self, key):
        cfg = MCMCConfig(num_samples=1500, num_steps_per_sample=10,
                         step_size=0.02, burn=600, adapt_mass=True,
                         adapt_step_size=True)
        r = run_hmc(key, self.lp, {"a": jnp.zeros(2), "b": jnp.zeros((2, 1))},
                    cfg)
        a = np.asarray(r.samples["a"][900:])
        b = np.asarray(r.samples["b"][900:]).reshape(-1, 2)
        np.testing.assert_allclose(a.std(0), 0.05, rtol=0.35)
        np.testing.assert_allclose(b.std(0), 20.0, rtol=0.35)
        inv = np.asarray(r.final_warm[1])  # flat diag, tree-ravel order
        assert inv.shape == (4,)
        assert inv[2] / inv[0] > 1e3
        with pytest.raises(ValueError, match="dense"):
            import dataclasses

            run_hmc(key, self.lp,
                    {"a": jnp.zeros(2), "b": jnp.zeros((2, 1))},
                    dataclasses.replace(cfg, adapt_mass="dense"))

    def test_tree_checkpoint_resume_bit_exact(self, key, tmp_path):
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        t0 = {"a": jnp.zeros(2), "b": jnp.zeros((3, 1))}
        lp = lambda t: (-0.5 * jnp.sum((t["a"] / 0.5) ** 2)
                        - 0.5 * jnp.sum((t["b"] / 2.0) ** 2))
        cfg = MCMCConfig(num_samples=60, num_steps_per_sample=5,
                         step_size=0.2, burn=20, adapt_step_size=True,
                         adapt_mass=True)
        r_direct = run_hmc(key, lp, t0, cfg)
        r_ck = run_hmc_checkpointed(key, lp, t0, cfg, str(tmp_path / "a"),
                                    chunk_size=17)
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(r_ck.samples[k]), np.asarray(r_direct.samples[k]))
        run_hmc_checkpointed(key, lp, t0,
                             dataclasses.replace(cfg, num_samples=34),
                             str(tmp_path / "b"), chunk_size=17)
        r_res = run_hmc_checkpointed(key, lp, t0, cfg, str(tmp_path / "b"),
                                     chunk_size=17)
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(r_res.samples[k]), np.asarray(r_direct.samples[k]))

    def test_tree_fingerprint_guards_structure(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed

        lp = lambda t: -0.5 * sum(
            jnp.sum(l**2) for l in jax.tree_util.tree_leaves(t))
        cfg = MCMCConfig(num_samples=20, num_steps_per_sample=3, step_size=0.2)
        run_hmc_checkpointed(key, lp, {"a": jnp.zeros(2), "b": jnp.zeros((3, 1))},
                             cfg, str(tmp_path / "c"), chunk_size=10)
        with pytest.raises(ValueError, match="fingerprint|configuration"):
            run_hmc_checkpointed(
                key, lp, {"a": jnp.zeros(2), "b": jnp.zeros((1, 3))},
                cfg, str(tmp_path / "c"), chunk_size=10)

    def test_tree_chains_checkpoint_resume_bit_exact(self, key, tmp_path):
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_hmc_chains_checkpointed

        t0 = {"a": jnp.zeros(2), "b": jnp.zeros((3, 1))}
        lp = lambda t: (-0.5 * jnp.sum((t["a"] / 0.5) ** 2)
                        - 0.5 * jnp.sum((t["b"] / 2.0) ** 2))
        cfg = MCMCConfig(num_samples=60, num_steps_per_sample=5,
                         step_size=0.2, burn=20, adapt_step_size=True,
                         adapt_mass=True)
        r_direct = run_hmc_chains(key, lp, t0, cfg, num_chains=4)
        r_ck = run_hmc_chains_checkpointed(
            key, lp, t0, cfg, str(tmp_path / "a"), num_chains=4,
            chunk_size=17)
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(r_ck.samples[k]), np.asarray(r_direct.samples[k]))
        run_hmc_chains_checkpointed(
            key, lp, t0, dataclasses.replace(cfg, num_samples=34),
            str(tmp_path / "b"), num_chains=4, chunk_size=17)
        r_res = run_hmc_chains_checkpointed(
            key, lp, t0, cfg, str(tmp_path / "b"), num_chains=4,
            chunk_size=17)
        for k in ("a", "b"):
            np.testing.assert_array_equal(
                np.asarray(r_res.samples[k]), np.asarray(r_direct.samples[k]))


class TestReviewRound3Fixes:
    """Regression pins for the round-3 self-review findings."""

    def test_scalar_leaf_tree_samples(self, key):
        """A pytree of 0-d scalar parameters routes to the tree path
        (previously crashed in jnp.asarray(dict) with a dtype-object
        error)."""
        lp = lambda t: -0.5 * (t["mu"] ** 2) - 0.5 * ((t["log_sigma"] / 2.0) ** 2)
        t0 = {"mu": jnp.asarray(0.5), "log_sigma": jnp.asarray(0.0)}
        cfg = MCMCConfig(num_samples=600, num_steps_per_sample=10, step_size=0.3)
        r = run_hmc(key, lp, t0, cfg)
        assert r.samples["mu"].shape == (600,)
        mu = np.asarray(r.samples["mu"][100:])
        ls = np.asarray(r.samples["log_sigma"][100:])
        assert abs(mu.std() - 1.0) < 0.35
        assert abs(ls.std() - 2.0) < 0.7

    def test_single_leaf_per_leaf_inv_mass(self):
        """A per-leaf inv_mass pytree works for SINGLE-leaf templates
        (previously fell through to the flat parser and crashed)."""
        m = make_mass_tree({"w": jnp.full((3, 2), 4.0)}, {"w": jnp.zeros((3, 2))})
        v = m.velocity({"w": jnp.ones((3, 2))})
        np.testing.assert_allclose(np.asarray(v["w"]), 4.0)

    def test_theta0_is_stacked_override_pt(self, key):
        """A pre-stacked replica tree whose leading dim disagrees with
        num_temps is ambiguous; theta0_is_stacked=True makes the mistake
        loud instead of silently broadcasting a wrong ladder."""
        from hamiltorch_tpu.samplers.tempering import (
            PTConfig,
            run_parallel_tempering,
        )

        lp = lambda t: -0.5 * jnp.sum(t["w"] ** 2)
        t0 = {"w": jnp.ones((5, 3))}  # 5 "replicas", but num_temps=8
        cfg = PTConfig(num_samples=4, num_temps=8)
        with pytest.raises(ValueError, match="num_temps"):
            run_parallel_tempering(key, lp, t0, cfg,
                                   theta0_is_stacked=True)
