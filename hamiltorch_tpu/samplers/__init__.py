from .adaptation import DualAveragingState, da_init, da_update
from .chees import ChEESConfig, ChEESResult, run_chees
from .driver import ChainState, MCMCConfig, MCMCResult, MCMCStats, run_mcmc
from .hmc import hmc_transition, run_hmc, run_hmc_chains
from .nuts import NUTSConfig, NUTSInfo, run_nuts, run_nuts_chains
from .rmhmc import run_rmhmc
from .splitting import run_split_hmc, run_split_hmc_stacked
from .tempering import PTConfig, PTResult, run_parallel_tempering

__all__ = [
    "ChainState",
    "MCMCConfig",
    "MCMCResult",
    "MCMCStats",
    "run_mcmc",
    "run_hmc",
    "run_hmc_chains",
    "hmc_transition",
    "NUTSConfig",
    "NUTSInfo",
    "run_nuts",
    "run_nuts_chains",
    "ChEESConfig",
    "ChEESResult",
    "run_chees",
    "run_rmhmc",
    "run_split_hmc",
    "run_split_hmc_stacked",
    "PTConfig",
    "PTResult",
    "run_parallel_tempering",
    "DualAveragingState",
    "da_init",
    "da_update",
]
