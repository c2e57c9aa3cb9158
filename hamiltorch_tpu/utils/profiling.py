"""Profiling and throughput observability.

The reference's only observability is a traces/sec column in its progress
bar (reference: hamiltorch/util.py:67,73).  Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of the sampling program;
* ``throughput(result, seconds, ...)`` — samples/sec, grad-steps/sec and
  divergence counts from an MCMCResult;
* ``annotate(name)`` — TraceAnnotation passthrough for marking phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed():
    """Yield a dict whose 'seconds' is filled on exit, device-synced.

    Exit enqueues a trivial op and blocks on it: per-device execution is
    in-order, so it completes only after every previously dispatched
    computation — without it the timer would measure async DISPATCH time
    (milliseconds for a minutes-long run)."""
    import jax.numpy as jnp

    out = {}
    t0 = time.perf_counter()
    yield out
    jax.block_until_ready(jnp.zeros(()) + 1.0)
    out["seconds"] = time.perf_counter() - t0


def throughput(result, seconds: float, num_steps_per_sample: Optional[int] = None) -> dict:
    """Throughput counters from an MCMCResult (single- or multi-chain)."""
    samples = result.samples
    chains = 1 if samples.ndim == 2 else int(samples.shape[0])
    draws = int(samples.shape[-2])
    out = {
        "chains": chains,
        "draws_per_chain": draws,
        "samples_per_sec": chains * draws / seconds,
        "divergences": int(jnp.sum(result.stats.divergent)),
        "acc_rate": float(jnp.mean(result.stats.accepted)),
    }
    if num_steps_per_sample is not None:
        out["grad_steps_per_sec"] = out["samples_per_sec"] * num_steps_per_sample
    return out
