"""Persistent XLA compilation cache.

TPU compiles of a full sampling scan take tens of seconds (more again under
remote-compile backends); enabling the persistent cache makes every rerun
of the same program shape instant.  Called by bench.py and the examples;
user code can opt in the same way.
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
