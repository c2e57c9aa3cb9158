"""Public API surface guard: everything the README/PARITY promise exists."""

import hamiltorch_tpu as ht


PARITY_NAMES = [
    "sample", "sample_model", "sample_split_model", "predict_model",
    "Sampler", "Integrator", "Metric", "set_random_seed",
]

NATIVE_NAMES = [
    "run_hmc", "run_hmc_chains", "run_nuts", "run_nuts_chains", "run_rmhmc",
    "run_chees", "run_parallel_tempering",
    "MCMCConfig", "MCMCResult", "MCMCStats", "NUTSConfig", "ChEESConfig",
    "PTConfig", "next_key",
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
