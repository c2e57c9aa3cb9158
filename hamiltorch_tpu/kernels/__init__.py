from .bnn_hmc import bnn_hmc
from .bnn_mclmc import bnn_mclmc
from .gaussian_hmc import gaussian_hmc

__all__ = ["gaussian_hmc", "bnn_hmc", "bnn_mclmc"]
