"""hamiltorch_tpu — a TPU-native Hamiltonian Monte Carlo framework.

JAX/XLA rebuild of the capabilities of hamiltorch (AdamCobb/hamiltorch
v0.4.1): plain HMC, step-size-adapting NUTS (plus true tree-doubling NUTS as
an extension), implicit/explicit Riemannian-manifold HMC with
Hessian/softabs/Jacobian-diag metrics, symmetric-split minibatch HMC, and a
Bayesian-neural-network layer — redesigned as pure-functional, jit-compiled
``lax.scan`` programs with vmap chain parallelism on-chip and
``shard_map``/mesh sharding across chips.

Public API parity surface (reference: hamiltorch/__init__.py:3-4):
``sample``, ``sample_model``, ``sample_split_model``, ``predict_model``,
``Sampler``, ``Integrator``, ``Metric``, ``set_random_seed``.
"""

__version__ = "0.6.0"

from .api import sample
from .enums import Integrator, Metric, Sampler
from .samplers.driver import MCMCConfig, MCMCResult, MCMCStats
from .samplers.hmc import run_hmc, run_hmc_chains, run_hmc_host_offload
from .samplers.chees import ChEESConfig, ChEESResult, run_chees
from .samplers.nuts import NUTSConfig, run_nuts, run_nuts_chains, run_nuts_ensemble
from .samplers.rmhmc import run_rmhmc, run_rmhmc_chains
from .samplers.sgmcmc import (
    CSGMCMCConfig,
    SGHMCConfig,
    SGLDConfig,
    run_csgmcmc,
    run_csgmcmc_chains,
    run_sghmc,
    run_sghmc_chains,
    run_sgld,
    run_sgld_chains,
)
from .samplers.barker import (
    BarkerConfig,
    BarkerResult,
    run_barker,
    run_barker_chains,
)
from .samplers.mams import MAMSConfig, MAMSResult, run_mams, run_mams_chains
from .samplers.mclmc import MCLMCConfig, MCLMCResult, run_mclmc, run_mclmc_chains
from .samplers.smc import SMCConfig, run_smc, smc_posterior_sample
from .samplers.stretch import StretchConfig, StretchResult, run_stretch
from .samplers.elliptical import (
    EllipticalConfig,
    EllipticalResult,
    run_elliptical,
    run_elliptical_chains,
)
from .samplers.tempering import PTConfig, run_parallel_tempering, run_pt_chains
from .samplers.ti import TIConfig, run_ti
from .model_comparison import (
    compare,
    pointwise_log_lik,
    pointwise_log_lik_from_predictions,
    psis_loo,
    waic,
)
from .optim import (
    ADVIResult,
    LaplaceResult,
    MAPResult,
    advi,
    advi_cov,
    advi_sample,
    laplace_approx,
    laplace_sample,
    map_estimate,
)
from .svgd import SVGDConfig, SVGDResult, run_svgd
from .utils.rng import next_key, set_random_seed

__all__ = [
    "sample",
    "sample_model",
    "sample_split_model",
    "predict_model",
    "Sampler",
    "Integrator",
    "Metric",
    "set_random_seed",
    "next_key",
    "run_hmc",
    "run_hmc_chains",
    "run_hmc_host_offload",
    "run_nuts",
    "run_nuts_chains",
    "run_nuts_ensemble",
    "run_rmhmc",
    "run_rmhmc_chains",
    "NUTSConfig",
    "ChEESConfig",
    "ChEESResult",
    "run_chees",
    "PTConfig",
    "run_parallel_tempering",
    "run_pt_chains",
    "SMCConfig",
    "run_smc",
    "smc_posterior_sample",
    "MCLMCConfig",
    "MCLMCResult",
    "run_mclmc",
    "run_mclmc_chains",
    "BarkerConfig",
    "BarkerResult",
    "run_barker",
    "run_barker_chains",
    "MAMSConfig",
    "MAMSResult",
    "run_mams",
    "run_mams_chains",
    "StretchConfig",
    "StretchResult",
    "run_stretch",
    "EllipticalConfig",
    "EllipticalResult",
    "run_elliptical",
    "run_elliptical_chains",
    "TIConfig",
    "run_ti",
    "waic",
    "psis_loo",
    "compare",
    "pointwise_log_lik",
    "pointwise_log_lik_from_predictions",
    "SGLDConfig",
    "SGHMCConfig",
    "CSGMCMCConfig",
    "run_csgmcmc",
    "run_csgmcmc_chains",
    "run_sgld",
    "run_sgld_chains",
    "run_sghmc",
    "run_sghmc_chains",
    "map_estimate",
    "MAPResult",
    "laplace_approx",
    "laplace_sample",
    "LaplaceResult",
    "advi",
    "advi_cov",
    "advi_sample",
    "ADVIResult",
    "SVGDConfig",
    "SVGDResult",
    "run_svgd",
    "MCMCConfig",
    "MCMCResult",
    "MCMCStats",
]


def __getattr__(name):
    # Lazy imports keep `import hamiltorch_tpu` light; the model layer pulls
    # in flax only when used.
    if name in ("sample_model", "sample_split_model", "predict_model"):
        from . import models

        return getattr(models, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
