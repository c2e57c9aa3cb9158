"""Core HMC tests: reversibility, mass operators, statistics, NUTS adaptation.

Mirrors and extends the reference's one numerical test
(tests/test_util.py:97-110, symplectic reversibility) with
golden-statistics checks per BASELINE.json config 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import hamiltorch_tpu as ht
from hamiltorch_tpu.integrators.leapfrog import PhasePoint, leapfrog
from hamiltorch_tpu.ops.mass import (
    BlockDiagMass,
    DenseMass,
    DiagMass,
    IdentityMass,
    make_mass,
)
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc, run_hmc_chains


def gaussian_logprob(theta):
    """2-D correlated Gaussian (BASELINE.json config 1)."""
    cov = jnp.array([[1.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)
    return -0.5 * theta @ prec @ theta


def std_normal_logprob(theta):
    return -0.5 * jnp.dot(theta, theta)


class TestLeapfrogReversibility:
    """Forward L steps, negate momentum, L steps back -> initial point."""

    @pytest.mark.parametrize(
        "mass_builder",
        [
            lambda d: IdentityMass(dim=d),
            lambda d: DiagMass(inv_diag=jnp.array([0.5, 2.0])),
            lambda d: DenseMass.from_inv_mass(jnp.array([[1.0, 0.3], [0.3, 1.0]])),
        ],
    )
    def test_reversible(self, mass_builder):
        d = 2
        mass = mass_builder(d)
        vg = jax.value_and_grad(gaussian_logprob)
        theta0 = jnp.array([1.0, -0.5])
        p0 = jnp.array([0.7, 0.3])
        logp0, g0 = vg(theta0)
        start = PhasePoint(theta0, p0, logp0, g0)
        fwd = leapfrog(vg, mass, start, 0.1, 100)
        back_start = PhasePoint(fwd.theta, -fwd.momentum, fwd.logp, fwd.grad)
        back = leapfrog(vg, mass, back_start, 0.1, 100)
        np.testing.assert_allclose(np.asarray(back.theta), np.asarray(theta0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(-back.momentum), np.asarray(p0), atol=1e-4)

    def test_energy_conservation(self):
        mass = IdentityMass(dim=2)
        vg = jax.value_and_grad(gaussian_logprob)
        theta0 = jnp.array([1.0, -0.5])
        p0 = jnp.array([0.7, 0.3])
        logp0, g0 = vg(theta0)
        h0 = -logp0 + mass.kinetic(p0)
        end = leapfrog(vg, mass, PhasePoint(theta0, p0, logp0, g0), 0.05, 200)
        h1 = -end.logp + mass.kinetic(end.momentum)
        assert abs(float(h1 - h0)) < 1e-2


class TestMassOperators:
    def test_make_mass_dispatch(self):
        assert isinstance(make_mass(None, 3), IdentityMass)
        assert isinstance(make_mass(jnp.ones(3), 3), DiagMass)
        assert isinstance(make_mass(jnp.eye(3), 3), DenseMass)
        assert isinstance(make_mass([jnp.eye(2), jnp.eye(3)], 5), BlockDiagMass)

    def test_block_diag_matches_dense(self, key):
        b1 = jnp.array([[2.0, 0.5], [0.5, 1.0]])
        b2 = jnp.array([[1.5]])
        block = BlockDiagMass.from_inv_blocks([b1, b2])
        dense_inv = jnp.zeros((3, 3)).at[:2, :2].set(b1).at[2, 2].set(b2[0, 0])
        dense = DenseMass.from_inv_mass(dense_inv)
        p = jnp.array([0.3, -1.2, 0.7])
        np.testing.assert_allclose(
            np.asarray(block.velocity(p)), np.asarray(dense.velocity(p)), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(block.kinetic(p)), float(dense.kinetic(p)), rtol=1e-5
        )

    def test_block_diag_sample_covariance(self, key):
        b1 = jnp.array([[2.0, 0.5], [0.5, 1.0]])
        b2 = jnp.array([[1.5]])
        block = BlockDiagMass.from_inv_blocks([b1, b2])
        samples = jax.vmap(lambda k: block.sample(k))(jax.random.split(key, 20000))
        emp_cov = jnp.cov(samples.T)
        dense_inv = jnp.zeros((3, 3)).at[:2, :2].set(b1).at[2, 2].set(b2[0, 0])
        expected = np.linalg.inv(np.asarray(dense_inv))
        np.testing.assert_allclose(np.asarray(emp_cov), expected, atol=0.1)

    def test_diag_mass_sample_variance(self, key):
        mass = DiagMass(inv_diag=jnp.array([0.25, 4.0]))
        samples = jax.vmap(lambda k: mass.sample(k))(jax.random.split(key, 20000))
        # variance of p is M = 1 / inv_diag
        np.testing.assert_allclose(
            np.asarray(jnp.var(samples, axis=0)), [4.0, 0.25], rtol=0.1
        )


class TestHMCStatistics:
    def test_gaussian_moments(self, key):
        config = MCMCConfig(num_samples=2000, num_steps_per_sample=25, step_size=0.3, burn=0)
        result = run_hmc(key, gaussian_logprob, jnp.zeros(2), config)
        samples = np.asarray(result.samples[200:])
        cov = np.cov(samples.T)
        np.testing.assert_allclose(samples.mean(0), [0.0, 0.0], atol=0.15)
        np.testing.assert_allclose(cov, [[1.0, 0.8], [0.8, 1.0]], atol=0.2)
        assert float(result.acc_rate) > 0.6

    def test_acceptance_high_for_small_steps(self, key):
        config = MCMCConfig(num_samples=200, num_steps_per_sample=5, step_size=0.05)
        result = run_hmc(key, std_normal_logprob, jnp.zeros(3), config)
        assert float(result.acc_rate) > 0.95

    def test_divergence_flagged_not_fatal(self, key):
        def bad_logprob(theta):
            # log-prob of a distribution with a cliff: NaN outside a ball
            r2 = jnp.dot(theta, theta)
            return jnp.where(r2 < 1.0, -0.5 * r2, jnp.nan)

        config = MCMCConfig(num_samples=100, num_steps_per_sample=10, step_size=0.5)
        result = run_hmc(key, bad_logprob, jnp.zeros(2), config)
        # divergences recorded, samples all finite
        assert bool(jnp.all(jnp.isfinite(result.samples)))
        assert int(result.stats.divergent.sum()) > 0

    def test_pass_grad_matches_autograd(self, key):
        analytic = lambda theta: -theta  # grad of std normal logp

        config = MCMCConfig(num_samples=300, num_steps_per_sample=10, step_size=0.2)
        r_auto = run_hmc(key, std_normal_logprob, jnp.ones(3), config)
        r_pass = run_hmc(key, std_normal_logprob, jnp.ones(3), config, pass_grad=analytic)
        np.testing.assert_allclose(
            np.asarray(r_auto.samples), np.asarray(r_pass.samples), rtol=1e-5, atol=1e-6
        )

    def test_pass_grad_wrapper_is_memoized(self):
        """Samplers take the potential as a STATIC jit arg: repeated calls
        with the same (fn, pass_grad) must return the SAME wrapper or every
        sample(..., pass_grad=...) recompiles the whole scan."""
        from hamiltorch_tpu.ops.potential import make_log_prob

        g = lambda t: -t
        w1 = make_log_prob(std_normal_logprob, g)
        w2 = make_log_prob(std_normal_logprob, g)
        assert w1 is w2
        # a DIFFERENT gradient must not reuse the cached wrapper
        w3 = make_log_prob(std_normal_logprob, lambda t: -2 * t)
        assert w3 is not w1
        # constant-gradient arrays key by object identity
        c = jnp.ones(3)
        assert make_log_prob(std_normal_logprob, c) is make_log_prob(
            std_normal_logprob, c
        )


class TestNUTSAdaptation:
    def test_step_size_converges(self, key):
        config = MCMCConfig(
            num_samples=900,
            num_steps_per_sample=5,
            step_size=1.5,  # deliberately too large
            burn=500,
            adapt_step_size=True,
        )
        result = run_hmc(key, gaussian_logprob, jnp.zeros(2), config)
        final = float(result.final_step_size)
        assert 0.01 < final < 1.5
        # post-burn acceptance should be near the 0.8 target
        post = result.stats.accepted[500:]
        assert 0.55 < float(jnp.mean(post.astype(jnp.float32))) < 1.0

    def test_step_size_frozen_after_burn(self, key):
        config = MCMCConfig(
            num_samples=600, num_steps_per_sample=5, step_size=0.5, burn=300,
            adapt_step_size=True,
        )
        result = run_hmc(key, std_normal_logprob, jnp.zeros(2), config)
        ss = np.asarray(result.stats.step_size)
        # all post-burn draws use the same (frozen) step size
        assert np.allclose(ss[302:], ss[302])


class TestMultiChain:
    def test_vmapped_chains_shape_and_stats(self, key):
        config = MCMCConfig(num_samples=500, num_steps_per_sample=10, step_size=0.3)
        result = run_hmc_chains(key, std_normal_logprob, jnp.zeros(3), config, num_chains=8)
        assert result.samples.shape == (8, 500, 3)
        pooled = np.asarray(result.samples[:, 100:]).reshape(-1, 3)
        np.testing.assert_allclose(pooled.mean(0), np.zeros(3), atol=0.15)
        np.testing.assert_allclose(pooled.std(0), np.ones(3), atol=0.25)
        # chains differ (independent keys)
        assert not np.allclose(
            np.asarray(result.samples[0]), np.asarray(result.samples[1])
        )


class TestAPIParity:
    def test_sample_shapes_and_slicing(self, key):
        samples = ht.sample(
            std_normal_logprob, jnp.zeros(3), num_samples=50,
            num_steps_per_sample=5, step_size=0.2, burn=10, key=key, verbose=False,
        )
        # [init] + draws for n > burn: 1 + (50 - 10 - 1) = 40
        assert samples.shape == (40, 3)
        np.testing.assert_allclose(np.asarray(samples[0]), np.zeros(3))

    def test_sample_burn_minus_one(self, key):
        samples = ht.sample(
            std_normal_logprob, jnp.zeros(2), num_samples=20, burn=-1,
            step_size=0.2, key=key, verbose=False,
        )
        assert samples.shape == (21, 2)

    def test_debug2_returns_acc_rate(self, key):
        samples, acc = ht.sample(
            std_normal_logprob, jnp.zeros(2), num_samples=30, step_size=0.2,
            debug=2, key=key, verbose=False,
        )
        assert 0.0 <= acc <= 1.0

    def test_nuts_debug2_returns_step_size(self, key):
        samples, ss = ht.sample(
            std_normal_logprob, jnp.zeros(2), num_samples=100, burn=50,
            step_size=0.5, sampler=ht.Sampler.HMC_NUTS, debug=2, key=key,
            verbose=False,
        )
        assert ss > 0.0

    def test_validation_errors(self):
        with pytest.raises(RuntimeError):
            ht.sample(std_normal_logprob, jnp.zeros((2, 2)), num_samples=10)
        with pytest.raises(RuntimeError):
            ht.sample(std_normal_logprob, jnp.zeros(2), num_samples=10, burn=10)
        with pytest.raises(RuntimeError):
            ht.sample(
                std_normal_logprob, jnp.zeros(2), num_samples=10, burn=0,
                sampler=ht.Sampler.HMC_NUTS,
            )


class TestThinning:
    def test_thinned_matches_unthinned_positions(self, key):
        """thin=k keeps exactly every k-th chain state of the same stream
        (per-draw keys make the transition sequence identical)."""
        cfg_full = MCMCConfig(num_samples=60, num_steps_per_sample=5, step_size=0.2)
        cfg_thin = MCMCConfig(num_samples=60, num_steps_per_sample=5, step_size=0.2, thin=3)
        r_full = run_hmc(key, std_normal_logprob, jnp.zeros(2), cfg_full)
        r_thin = run_hmc(key, std_normal_logprob, jnp.zeros(2), cfg_thin)
        assert r_thin.samples.shape == (20, 2)
        np.testing.assert_allclose(
            np.asarray(r_thin.samples), np.asarray(r_full.samples[2::3]), atol=1e-6
        )
        np.testing.assert_allclose(
            float(r_thin.acc_rate), float(r_full.acc_rate), atol=1e-6
        )

    def test_thin_divergent_any_within_window(self, key):
        def cliff(theta):
            r2 = jnp.dot(theta, theta)
            return jnp.where(r2 < 1.0, -0.5 * r2, jnp.nan)

        cfg = MCMCConfig(num_samples=100, num_steps_per_sample=10, step_size=0.5, thin=5)
        r = run_hmc(key, cliff, jnp.zeros(2), cfg)
        assert r.samples.shape == (20, 2)
        assert int(r.stats.divergent.sum()) > 0

    def test_indivisible_thin_raises(self, key):
        cfg = MCMCConfig(num_samples=10, thin=3)
        with pytest.raises(ValueError):
            run_hmc(key, std_normal_logprob, jnp.zeros(2), cfg)


@pytest.mark.slow
class TestX64Mode:
    def test_float64_end_to_end(self):
        """The samplers are dtype-agnostic; exercise f64 in a subprocess
        (x64 is a global flag that must be set before tracing)."""
        import subprocess, sys, os

        code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc
lp = lambda t: -0.5 * jnp.dot(t, t)
r = run_hmc(jax.random.key(0), lp, jnp.zeros(3, jnp.float64),
            MCMCConfig(num_samples=100, num_steps_per_sample=5, step_size=0.2))
assert r.samples.dtype == jnp.float64, r.samples.dtype
assert abs(float(r.samples[20:].std()) - 1.0) < 0.3
from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts
rn, _ = run_nuts(jax.random.key(1), lp, jnp.zeros(3, jnp.float64),
                 NUTSConfig(num_samples=120, burn=60, adapt_mass=True))
assert rn.samples.dtype == jnp.float64, rn.samples.dtype
print("OK")
"""
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        )
        assert "OK" in out.stdout, out.stderr[-2000:]

    def test_float64_tree_paths(self):
        """f64 on PYTREE chain states across HMC/NUTS/ChEES (subprocess:
        x64 is a global flag that must be set before tracing)."""
        import subprocess, sys, os

        code = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc
from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts
from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees
lp = lambda t: (-0.5 * jnp.sum((t["a"] / 0.5) ** 2)
                - 0.5 * jnp.sum((t["b"] / 2.0) ** 2))
t0 = {"a": jnp.zeros(2, jnp.float64), "b": jnp.zeros((3, 1), jnp.float64)}
key = jax.random.key(0)
r = run_hmc(key, lp, t0, MCMCConfig(num_samples=200, num_steps_per_sample=5,
                                    step_size=0.2, burn=50, adapt_mass=True,
                                    adapt_step_size=True))
assert r.samples["a"].dtype == jnp.float64, r.samples["a"].dtype
rn, _ = run_nuts(key, lp, t0, NUTSConfig(num_samples=120, step_size=0.3,
                                         burn=60, adapt_mass=True))
assert rn.samples["b"].dtype == jnp.float64, rn.samples["b"].dtype
rc = run_chees(key, lp, t0, ChEESConfig(num_samples=120, step_size=0.2,
                                        burn=60, adapt_mass=True),
               num_chains=8)
assert rc.samples["a"].dtype == jnp.float64, rc.samples["a"].dtype
print("OK")
"""
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        )
        assert "OK" in out.stdout, out.stderr[-2000:]


class TestValidation:
    def test_inv_mass_dim_mismatch(self, key):
        cfg = MCMCConfig(num_samples=5)
        with pytest.raises(ValueError):
            run_hmc(key, std_normal_logprob, jnp.zeros(3), cfg, inv_mass=jnp.ones(2))
        with pytest.raises(ValueError):
            run_hmc(key, std_normal_logprob, jnp.zeros(3), cfg,
                    inv_mass=[jnp.eye(2), jnp.eye(2)])

    def test_list_logprob_requires_splitting(self):
        fns = [std_normal_logprob, std_normal_logprob]
        with pytest.raises(RuntimeError):
            ht.sample(fns, jnp.zeros(2), num_samples=10, sampler=ht.Sampler.NUTS)
        with pytest.raises(RuntimeError):
            ht.sample(fns, jnp.zeros(2), num_samples=10, sampler=ht.Sampler.RMHMC)


class TestHostOffload:
    def test_store_on_gpu_false_matches_on_device(self, key):
        """store_on_GPU=False streams the trace to host per chunk and is
        bit-identical to the on-device run (fold_in RNG lineage)."""
        import numpy as np
        import hamiltorch_tpu as ht

        lp = lambda t: -0.5 * jnp.dot(t, t)
        kw = dict(num_samples=300, num_steps_per_sample=5, step_size=0.3,
                  verbose=False, key=key)
        s_dev = ht.sample(lp, jnp.zeros(2), **kw)
        s_host = ht.sample(lp, jnp.zeros(2), store_on_GPU=False, **kw)
        assert isinstance(s_host, np.ndarray)  # trace lives on host
        np.testing.assert_allclose(np.asarray(s_dev), s_host, atol=1e-6)

    def test_host_offload_runner_chunks(self, key):
        from hamiltorch_tpu.samplers.hmc import run_hmc, run_hmc_host_offload
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        import numpy as np

        lp = lambda t: -0.5 * jnp.dot(t, t)
        config = MCMCConfig(num_samples=130, num_steps_per_sample=5, step_size=0.3)
        r_off = run_hmc_host_offload(key, lp, jnp.zeros(2), config, chunk_size=50)
        r_dev = run_hmc(key, lp, jnp.zeros(2), config)
        np.testing.assert_allclose(r_off.samples, np.asarray(r_dev.samples), atol=1e-6)
        np.testing.assert_allclose(
            float(r_off.acc_rate), float(r_dev.acc_rate), atol=1e-6
        )


@pytest.mark.slow
class TestHMCMassAdaptation:
    """Stan-style windowed mass warmup wired into plain HMC
    (config.adapt_mass; machinery shared with NUTS via samplers/warmup.py)."""

    def test_adapt_mass_fixes_bad_scaling(self, key):
        """On a 400:1 scale ratio, warmup recovers both scales; without it
        the fixed unit metric cannot move the wide direction at all."""
        scales = jnp.array([0.05, 20.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        cfg = MCMCConfig(num_samples=1500, step_size=0.5, burn=700,
                         num_steps_per_sample=8, adapt_mass=True)
        r = run_hmc(key, lp, jnp.zeros(2), cfg)
        s = np.asarray(r.samples[800:])
        np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.3)
        # learned inverse mass tracks the marginal variances (ratio 1.6e5)
        inv = np.asarray(r.final_warm[1])
        assert inv[1] / inv[0] > 1e4
        # the unadapted run is stuck in the wide direction
        r0 = run_hmc(key, lp, jnp.zeros(2),
                     MCMCConfig(num_samples=1500, step_size=0.5, burn=700,
                                num_steps_per_sample=8))
        assert np.asarray(r0.samples[800:]).std(0)[1] < 0.5 * 20.0

    def test_dense_adapt_learns_correlation(self, key):
        """adapt_mass='dense' estimates the full covariance: on a rho=0.95
        Gaussian the learned inverse mass carries the correlation."""
        rho = 0.95
        prec = jnp.linalg.inv(jnp.array([[1.0, rho], [rho, 1.0]]))
        lp = lambda t: -0.5 * t @ prec @ t
        cfg = MCMCConfig(num_samples=1500, step_size=0.2, burn=700,
                         num_steps_per_sample=8, adapt_mass="dense",
                         adapt_step_size=True)
        r = run_hmc(key, lp, jnp.zeros(2), cfg)
        s = np.asarray(r.samples[800:])
        assert abs(np.corrcoef(s.T)[0, 1] - rho) < 0.1
        inv = np.asarray(r.final_warm[1][0])  # (inv_mass, chol_mass) pair
        assert inv[0, 1] / np.sqrt(inv[0, 0] * inv[1, 1]) > 0.8

    def test_chains_adapt_and_checkpoint_roundtrip(self, key, tmp_path):
        """run_hmc_chains(adapt_mass=True) fixes the scaling per chain and
        the chunked checkpointed runner reproduces it bit-exactly."""
        from hamiltorch_tpu.checkpoint import run_hmc_chains_checkpointed

        scales = jnp.array([0.1, 10.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        cfg = MCMCConfig(num_samples=600, step_size=0.4, burn=300,
                         num_steps_per_sample=6, adapt_mass=True)
        import dataclasses

        r = run_hmc_chains(key, lp, jnp.zeros(2), cfg, num_chains=4)
        s = np.asarray(r.samples[:, 350:]).reshape(-1, 2)
        np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.3)
        r_ck = run_hmc_chains_checkpointed(
            key, lp, jnp.zeros(2), cfg, str(tmp_path / "ck"), 4, chunk_size=150
        )
        # direct (one 600-draw scan) vs chunked (4x150) compile to different
        # programs whose warmup arithmetic can differ by 1 ulp at window
        # boundaries — equal to float tolerance, not bitwise
        np.testing.assert_allclose(
            np.asarray(r.samples), np.asarray(r_ck.samples), atol=1e-5
        )
        # the bitwise contract is resume: re-chunking from a mid-run
        # checkpoint reproduces the uninterrupted chunked run exactly
        half = dataclasses.replace(cfg, num_samples=300)
        run_hmc_chains_checkpointed(
            key, lp, jnp.zeros(2), half, str(tmp_path / "re"), 4, chunk_size=150
        )
        r_res = run_hmc_chains_checkpointed(
            key, lp, jnp.zeros(2), cfg, str(tmp_path / "re"), 4, chunk_size=150
        )
        np.testing.assert_array_equal(
            np.asarray(r_ck.samples), np.asarray(r_res.samples)
        )

    def test_single_chain_chunked_paths_bit_exact(self, key, tmp_path):
        """Checkpointed, resumed, and host-offload runs all reproduce the
        in-memory adapt_mass chain bit-exactly (the global warmup schedule
        is sliced per chunk; the (welford, metric, da_t) carry rides
        final_warm)."""
        import dataclasses

        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed
        from hamiltorch_tpu.samplers.hmc import run_hmc_host_offload

        scales = jnp.array([0.1, 10.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        cfg = MCMCConfig(num_samples=300, step_size=0.3, burn=150,
                         num_steps_per_sample=5, adapt_mass=True)
        r = run_hmc(key, lp, jnp.zeros(2), cfg)
        r_ck = run_hmc_checkpointed(
            key, lp, jnp.zeros(2), cfg, str(tmp_path / "a"), chunk_size=70
        )
        # direct vs chunked are different compiled programs: equal to float
        # tolerance (warmup arithmetic can fuse differently), not bitwise
        np.testing.assert_allclose(
            np.asarray(r.samples), np.asarray(r_ck.samples), atol=1e-5
        )
        # interrupted after 140 draws, then resumed to 300: bitwise equal to
        # the uninterrupted run at the same chunking
        half = dataclasses.replace(cfg, num_samples=140)
        run_hmc_checkpointed(
            key, lp, jnp.zeros(2), half, str(tmp_path / "b"), chunk_size=70
        )
        r_res = run_hmc_checkpointed(
            key, lp, jnp.zeros(2), cfg, str(tmp_path / "b"), chunk_size=70
        )
        np.testing.assert_array_equal(
            np.asarray(r_ck.samples), np.asarray(r_res.samples)
        )
        r_off = run_hmc_host_offload(key, lp, jnp.zeros(2), cfg, chunk_size=64)
        np.testing.assert_allclose(
            np.asarray(r.samples), np.asarray(r_off.samples), atol=1e-5
        )

    def test_api_sample_adapt_mass_hmc(self, key):
        """ht.sample(adapt_mass=True) reaches the HMC warmup path."""
        scales = jnp.array([0.1, 10.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        s = ht.sample(lp, jnp.zeros(2), num_samples=600, burn=300,
                      num_steps_per_sample=6, step_size=0.4,
                      adapt_mass=True, verbose=False, key=key)
        kept = np.asarray(s)  # burn already sliced off by the facade
        np.testing.assert_allclose(kept[50:].std(0), np.asarray(scales), rtol=0.35)

    def test_validation(self, key):
        lp = std_normal_logprob
        # bad mode string is rejected at config construction
        with pytest.raises(ValueError, match="adapt_mass"):
            MCMCConfig(num_samples=10, burn=5, adapt_mass="banana")
        cfg = MCMCConfig(num_samples=10, burn=5, adapt_mass=True)
        # diagonal warmup refuses a dense inv_mass seed
        with pytest.raises(ValueError, match="DIAGONAL"):
            run_hmc(key, lp, jnp.zeros(2), cfg, inv_mass=jnp.eye(2))
        # pytree chain state: diagonal warmup works (flat Welford bridge);
        # the DENSE metric stays flat-path-only
        import dataclasses

        with pytest.raises(ValueError, match="dense"):
            run_hmc(key, lambda t: -0.5 * jnp.sum(t["w"] ** 2),
                    {"w": jnp.zeros(2)},
                    dataclasses.replace(cfg, adapt_mass="dense"))
        # RMHMC / splitting reject loudly instead of dropping the option
        with pytest.raises(RuntimeError, match="adapt_mass"):
            ht.sample(lp, jnp.zeros(2), num_samples=10, burn=5,
                      adapt_mass=True, sampler=ht.Sampler.RMHMC, key=key)
        with pytest.raises(RuntimeError, match="adapt_mass"):
            ht.sample([lp, lp], jnp.zeros(2), num_samples=10, burn=5,
                      adapt_mass=True, key=key,
                      integrator=ht.Integrator.SPLITTING)
        with pytest.raises(RuntimeError, match="burn"):
            ht.sample(lp, jnp.zeros(2), num_samples=10, burn=0,
                      adapt_mass=True, key=key)
