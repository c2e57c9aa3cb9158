from .rng import set_random_seed, next_key
from .pytree import ravel_pytree_fn, param_sizes, param_shapes

__all__ = [
    "set_random_seed",
    "next_key",
    "ravel_pytree_fn",
    "param_sizes",
    "param_shapes",
]
