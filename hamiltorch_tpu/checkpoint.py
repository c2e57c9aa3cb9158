"""Chunked sampling with checkpoint/resume.

The reference has no save/resume at all: samples accumulate in a Python
list and a crash loses the run (SURVEY.md §5).  Here sampling proceeds in
fixed-size chunks — each chunk one compiled scan — and after every chunk
the full resume state (chain position with its cached potential evaluation,
dual-averaging state, RNG lineage, draw counter) is written atomically.
Restarting with the same arguments continues the adaptation schedule and
random stream exactly where the last completed chunk stopped.

RNG lineage: chunk ``i`` uses ``fold_in(base_key, i)``, so resume does not
need to serialise evolving key state — only the base key and the counter.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .ops.mass import make_mass
from .ops.potential import make_log_prob
from .samplers.adaptation import DualAveragingState, da_init
from .samplers.driver import ChainState, MCMCConfig, MCMCResult, MCMCStats
from .samplers.hmc import _run_hmc_jit

_STATE_FILE = "state.npz"


def _save_state(path, state: ChainState, da: DualAveragingState, base_key, n_done: int):
    tmp = path + ".tmp.npz"  # keep .npz so np.savez doesn't append one
    np.savez(
        tmp,
        theta=np.asarray(state.theta),
        logp=np.asarray(state.logp),
        grad=np.asarray(state.grad),
        da_step_size=np.asarray(da.step_size),
        da_log_eps_bar=np.asarray(da.log_eps_bar),
        da_h_t=np.asarray(da.h_t),
        da_mu=np.asarray(da.mu),
        key_data=np.asarray(jax.random.key_data(base_key)),
        n_done=np.asarray(n_done),
    )
    os.replace(tmp, path)


def _load_state(path):
    z = np.load(path)
    state = ChainState(
        theta=jnp.asarray(z["theta"]),
        logp=jnp.asarray(z["logp"]),
        grad=jnp.asarray(z["grad"]),
    )
    da = DualAveragingState(
        step_size=jnp.asarray(z["da_step_size"]),
        log_eps_bar=jnp.asarray(z["da_log_eps_bar"]),
        h_t=jnp.asarray(z["da_h_t"]),
        mu=jnp.asarray(z["da_mu"]),
    )
    key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
    return state, da, key, int(z["n_done"])


def run_hmc_checkpointed(
    key,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0,
    config: MCMCConfig,
    ckpt_dir: str,
    chunk_size: int = 100,
    inv_mass=None,
    pass_grad=None,
    resume: bool = True,
) -> MCMCResult:
    """HMC with per-chunk checkpointing into ``ckpt_dir``.

    Interrupt at any point; calling again with ``resume=True`` (default)
    continues from the last completed chunk and returns the full result.
    """
    lp = make_log_prob(log_prob_fn, pass_grad)

    def chunk_runner(k, state, da, n_done, cfg):
        mass = make_mass(inv_mass, state.theta.shape[0])
        return _run_hmc_jit(
            k, state.theta, lp, cfg, mass,
            init_state=state, init_da=da, start_iter=n_done,
        )

    return _checkpoint_loop(chunk_runner, key, theta0, lp, config, ckpt_dir,
                            chunk_size, resume)


def run_nuts_checkpointed(
    key,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0,
    config,  # NUTSConfig
    ckpt_dir: str,
    chunk_size: int = 100,
    inv_mass=None,
    resume: bool = True,
) -> MCMCResult:
    """Tree-doubling NUTS with per-chunk checkpointing (stats only; the
    per-draw NUTSInfo beyond MCMCStats is not persisted)."""
    from .samplers.nuts import _run_nuts_jit

    if getattr(config, "adapt_mass", False):
        raise NotImplementedError(
            "adapt_mass windowed warmup is not yet resumable: the Welford/"
            "mass carry is not persisted across chunks. Run warmup "
            "unchunked, then checkpoint the post-warmup phase."
        )

    lp = make_log_prob(log_prob_fn, None)

    def chunk_runner(k, state, da, n_done, cfg):
        mass = make_mass(inv_mass, state.theta.shape[0])
        result, _ = _run_nuts_jit(
            k, state.theta, lp, cfg, mass,
            init_state=state, init_da=da, start_iter=n_done,
        )
        return result

    return _checkpoint_loop(chunk_runner, key, theta0, lp, config, ckpt_dir,
                            chunk_size, resume)


def _checkpoint_loop(
    chunk_runner, key, theta0, lp, config, ckpt_dir, chunk_size, resume
) -> MCMCResult:
    os.makedirs(ckpt_dir, exist_ok=True)
    state_path = os.path.join(ckpt_dir, _STATE_FILE)
    theta0 = jnp.asarray(theta0)

    if resume and os.path.exists(state_path):
        state, da, base_key, n_done = _load_state(state_path)
    else:
        for f in os.listdir(ckpt_dir):
            if f.startswith("chunk_") or f == _STATE_FILE:
                os.remove(os.path.join(ckpt_dir, f))
        logp0, grad0 = jax.value_and_grad(lp)(theta0)
        state = ChainState(theta0, logp0, grad0)
        da = da_init(config.step_size, dtype=theta0.dtype)
        base_key, n_done = key, 0

    while n_done < config.num_samples:
        this_chunk = min(chunk_size, config.num_samples - n_done)
        cfg = dataclasses.replace(config, num_samples=this_chunk)
        # the per-draw RNG folds the global draw index into the base key, so
        # every chunk uses the same base key and any chunking reproduces the
        # identical stream; files are named by draw offset.
        result = chunk_runner(base_key, state, da, n_done, cfg)
        jax.block_until_ready(result.samples)
        np.savez(
            os.path.join(ckpt_dir, f"chunk_{n_done:08d}.npz"),
            samples=np.asarray(result.samples),
            **{f: np.asarray(getattr(result.stats, f)) for f in MCMCStats._fields},
        )
        state, da = result.final_state, result.final_da
        n_done += this_chunk
        _save_state(state_path, state, da, base_key, n_done)

    # assemble the full run from chunk files
    chunks = sorted(
        f for f in os.listdir(ckpt_dir) if f.startswith("chunk_") and f.endswith(".npz")
    )
    zs = [np.load(os.path.join(ckpt_dir, f)) for f in chunks]
    # a directory from a previous LONGER run may hold more chunks than this
    # call requested; return exactly num_samples draws
    kept = config.num_samples // max(getattr(config, "thin", 1), 1)
    samples = jnp.asarray(np.concatenate([z["samples"] for z in zs])[:kept])
    stats = MCMCStats(
        **{
            f: jnp.asarray(np.concatenate([z[f] for z in zs])[:kept])
            for f in MCMCStats._fields
        }
    )
    return MCMCResult(
        samples=samples,
        stats=stats,
        final_step_size=da.step_size,
        acc_rate=jnp.mean(stats.accepted.astype(samples.dtype)),
        final_state=state,
        final_da=da,
    )
