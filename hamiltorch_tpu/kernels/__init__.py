from .gaussian_hmc import gaussian_hmc

__all__ = ["gaussian_hmc"]
