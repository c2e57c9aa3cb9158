"""Persistent XLA compilation cache (OPT-IN).

TPU compiles of a full sampling scan take tens of seconds; on standard
PJRT backends the persistent cache makes every rerun of the same program
shape near-instant (verified cross-process on small programs).  Nothing in
this package enables it by default: on REMOTE-COMPILE backends (e.g. the
axon TPU tunnel) the cache-hit deserialization path can be slower than a
fresh compile (measured: a 100k-param 64-chain scan compiled in 85s cold
but took 282s in a second process reading the warm cache).  Benchmark on
your backend before adopting it.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.expanduser("~/.cache/hamiltorch_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get("HAMILTORCH_TPU_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
