from .bnn_hmc import bnn_hmc
from .gaussian_hmc import gaussian_hmc

__all__ = ["gaussian_hmc", "bnn_hmc"]
