"""Public API surface guard: everything the README/PARITY promise exists."""

import jax.numpy as jnp
import pytest

import hamiltorch_tpu as ht


PARITY_NAMES = [
    "sample", "sample_model", "sample_split_model", "predict_model",
    "Sampler", "Integrator", "Metric", "set_random_seed",
]

NATIVE_NAMES = [
    "run_hmc", "run_hmc_chains", "run_nuts", "run_nuts_chains", "run_rmhmc",
    "run_chees", "run_parallel_tempering",
    "MCMCConfig", "MCMCResult", "MCMCStats", "NUTSConfig", "ChEESConfig",
    "PTConfig", "next_key", "run_svgd", "SVGDConfig", "SVGDResult",
]


def test_parity_surface():
    for name in PARITY_NAMES:
        assert hasattr(ht, name), name


def test_native_surface():
    for name in NATIVE_NAMES:
        assert hasattr(ht, name), name


def test_util_namespace():
    from hamiltorch_tpu import util

    for name in ["flatten", "unflatten", "make_functional", "gradient",
                 "hessian", "jacobian", "has_nan_or_inf", "LogProbError",
                 "eval_print", "setup_chain", "multi_chain", "set_random_seed"]:
        assert hasattr(util, name), name


def test_submodule_surfaces():
    from hamiltorch_tpu import checkpoint, diagnostics
    from hamiltorch_tpu.kernels import bnn_hmc, gaussian_hmc
    from hamiltorch_tpu.parallel import multihost, sharding
    from hamiltorch_tpu.utils import cache, profiling

    assert callable(checkpoint.run_hmc_checkpointed)
    assert callable(checkpoint.run_nuts_checkpointed)
    assert callable(diagnostics.summary)
    assert callable(gaussian_hmc)
    assert callable(bnn_hmc)
    assert callable(sharding.sample_chains_sharded)
    assert callable(sharding.run_hmc_chains_sharded)
    assert callable(sharding.run_nuts_chains_sharded)
    assert callable(sharding.run_svgd_sharded)
    assert callable(multihost.initialize_multihost)
    assert callable(profiling.throughput)
    assert callable(cache.enable_compilation_cache)


def test_enums_match_reference_values():
    assert ht.Sampler.HMC.value == 1 and ht.Sampler.RMHMC.value == 2
    assert ht.Sampler.HMC_NUTS.value == 3
    assert {i.name for i in ht.Integrator} >= {
        "EXPLICIT", "IMPLICIT", "S3", "SPLITTING", "SPLITTING_RAND", "SPLITTING_KMID",
    }
    assert {m.name for m in ht.Metric} == {"HESSIAN", "SOFTABS", "JACOBIAN_DIAG"}


class TestFacadeExtensions:
    """adapt_mass / thin / progress_every reachable from sample() (round-2)."""

    def test_thin_through_sample(self):
        import jax.numpy as jnp
        import hamiltorch_tpu as ht

        lp = lambda t: -0.5 * jnp.dot(t, t)
        s = ht.sample(lp, jnp.zeros(2), num_samples=60, num_steps_per_sample=5,
                      step_size=0.3, thin=3, verbose=False,
                      key=__import__("jax").random.key(0))
        # 60 transitions / thin 3 = 20 kept rows (transitions 2,5,...,59 all
        # post-burn for burn=0), plus the initial params
        assert s.shape == (21, 2)

    def test_adapt_mass_through_sample(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import hamiltorch_tpu as ht

        scales = jnp.asarray([0.2, 2.0])
        lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
        s = ht.sample(lp, jnp.zeros(2), num_samples=500, burn=300,
                      step_size=0.5, sampler=ht.Sampler.NUTS, adapt_mass=True,
                      verbose=False, key=jax.random.key(1))
        kept = np.asarray(s[1:])
        np.testing.assert_allclose(kept.std(0), np.asarray(scales), rtol=0.5)

    def test_adapt_mass_wrong_sampler_raises(self):
        import jax.numpy as jnp
        import pytest
        import hamiltorch_tpu as ht

        with pytest.raises(RuntimeError, match="adapt_mass"):
            ht.sample(lambda t: -jnp.dot(t, t), jnp.zeros(2), num_samples=10,
                      adapt_mass=True, verbose=False)

    def test_burn_thin_combination(self):
        import jax
        import jax.numpy as jnp
        import hamiltorch_tpu as ht

        lp = lambda t: -0.5 * jnp.dot(t, t)
        s = ht.sample(lp, jnp.zeros(2), num_samples=60, burn=30,
                      num_steps_per_sample=5, step_size=0.3, thin=3,
                      verbose=False, key=jax.random.key(0))
        # kept rows hold transitions 2,5,...,59; post-burn (>30) are
        # 32,35,...,59 = 10 rows, plus the initial params
        assert s.shape == (11, 2)


class TestLoudUnsupportedOptions:
    """sample() must reject option/sampler combinations it cannot honour
    instead of silently ignoring them."""

    def test_nonfinite_init_rejected(self, key):
        import hamiltorch_tpu as ht

        with pytest.raises(RuntimeError, match="non-finite"):
            ht.sample(lambda t: -0.5 * jnp.sum(t**2),
                      jnp.array([jnp.nan, 0.0]), num_samples=5, key=key)

    def test_config_sanity_validation(self):
        from hamiltorch_tpu.samplers.chees import ChEESConfig
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.nuts import NUTSConfig
        from hamiltorch_tpu.samplers.tempering import PTConfig

        for cls in (MCMCConfig, NUTSConfig, ChEESConfig, PTConfig):
            with pytest.raises(ValueError, match="step_size"):
                cls(num_samples=10, step_size=0.0)
            with pytest.raises(ValueError, match="num_samples"):
                cls(num_samples=0)
            # negative burn is allowed: the reference's notebooks use
            # burn=-1 as "no burn" and the façade preserves that
            cls(num_samples=10, burn=-1)

    def test_nuts_progress_every_supported(self, key, capfd):
        import hamiltorch_tpu as ht

        out = ht.sample(lambda t: -0.5 * jnp.sum(t**2), jnp.zeros(2),
                        num_samples=8, burn=2, sampler=ht.Sampler.NUTS,
                        progress_every=2, key=key, verbose=False)
        assert out.shape[0] >= 1
        captured = capfd.readouterr()
        # the bar header reaches the host stream (CPU supports callbacks)
        assert "Sampling" in captured.out and "Progress" in captured.out

    def test_nuts_host_offload_matches_device(self, key):
        """store_on_GPU=False for NUTS (VERDICT r3 item 5): host-resident
        trace, bit-identical to the on-device run (fold_in RNG lineage —
        reference streams per draw, samplers.py:956-959)."""
        import numpy as np

        import hamiltorch_tpu as ht

        lp = lambda t: -0.5 * jnp.sum(t**2)
        kw = dict(num_samples=40, burn=10, step_size=0.5,
                  sampler=ht.Sampler.NUTS, verbose=False, key=key)
        s_dev = ht.sample(lp, jnp.zeros(2), **kw)
        s_host = ht.sample(lp, jnp.zeros(2), store_on_GPU=False, **kw)
        assert isinstance(s_host, np.ndarray)  # trace lives on host
        np.testing.assert_array_equal(np.asarray(s_dev), s_host)

    def test_rmhmc_host_offload_matches_device(self, key):
        import numpy as np

        import hamiltorch_tpu as ht

        lp = lambda t: -0.5 * jnp.sum(t**2)
        kw = dict(num_samples=30, num_steps_per_sample=3, step_size=0.2,
                  sampler=ht.Sampler.RMHMC, verbose=False, key=key)
        s_dev = ht.sample(lp, jnp.zeros(2), **kw)
        s_host = ht.sample(lp, jnp.zeros(2), store_on_GPU=False, **kw)
        assert isinstance(s_host, np.ndarray)
        np.testing.assert_array_equal(np.asarray(s_dev), s_host)

    def test_splitting_host_offload_matches_device(self, key):
        import numpy as np

        import hamiltorch_tpu as ht

        fns = [lambda t: -0.25 * jnp.sum(t**2), lambda t: -0.25 * jnp.sum(t**2)]
        kw = dict(num_samples=40, num_steps_per_sample=4, step_size=0.3,
                  integrator=ht.Integrator.SPLITTING, verbose=False, key=key)
        s_dev = ht.sample(fns, jnp.zeros(2), **kw)
        s_host = ht.sample(fns, jnp.zeros(2), store_on_GPU=False, **kw)
        assert isinstance(s_host, np.ndarray)
        np.testing.assert_array_equal(np.asarray(s_dev), s_host)
