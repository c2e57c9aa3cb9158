"""Explicit PRNG-key plumbing.

The reference library seeds four global RNGs at *import time* with a
time-derived seed (reference: hamiltorch/util.py:11-23).  JAX has no global
RNG; everything here is keyed.  For API parity we keep a module-level key
that the compatibility façade (``hamiltorch_tpu.sample`` with no ``key``
argument) draws from, but the native API always takes explicit keys.
"""

from __future__ import annotations

import time

import jax

_global_key: jax.Array | None = None
_global_seed: int | None = None


def set_random_seed(seed: int | None = None) -> int:
    """Seed the module-level key used when callers do not pass one.

    Unlike the reference this does NOT run at import time; call it (or pass
    explicit keys) before sampling.  Returns the seed used.
    """
    global _global_key, _global_seed
    if seed is None:
        seed = int((time.time() * 1e6) % 1e8)
    _global_seed = int(seed)
    _global_key = jax.random.key(_global_seed)
    return _global_seed


def next_key() -> jax.Array:
    """Split a fresh key off the module-level key (creating it if needed)."""
    global _global_key
    if _global_key is None:
        set_random_seed()
    _global_key, sub = jax.random.split(_global_key)
    return sub
