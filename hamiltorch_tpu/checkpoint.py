"""Chunked sampling with checkpoint/resume.

The reference has no save/resume at all: samples accumulate in a Python
list and a crash loses the run (SURVEY.md §5).  Here sampling proceeds in
fixed-size chunks — each chunk one compiled scan — and after every chunk
the full resume carry (chain position with its cached potential evaluation,
dual-averaging state, windowed-warmup Welford state where applicable, RNG
lineage, draw counter) is written atomically.  Restarting with the same
arguments continues the adaptation schedule and random stream exactly where
the last completed chunk stopped.

RNG lineage: per-draw keys are ``fold_in(base_key, global_draw_index)``, so
resume does not serialise evolving key state — only the base key and the
counter; any chunking reproduces the identical stream.

Covered: single-chain HMC (``run_hmc_checkpointed``), RMHMC
(``run_rmhmc_checkpointed`` — the slowest sampler per draw, where resume
matters most), tree-NUTS including ``adapt_mass`` windowed warmup
(``run_nuts_checkpointed``), pooled-ensemble NUTS
(``run_nuts_ensemble_checkpointed``), the ChEES-HMC chain ensemble with
its full adaptation carry (``run_chees_checkpointed``), vmapped
multi-chain HMC (``run_hmc_chains_checkpointed``), and parallel tempering
with its adapted ladder (``run_pt_checkpointed`` — single ladder,
ensembles, or mesh-sharded ensembles).  The ensemble runners take
``mesh=`` to shard each chunk over a device mesh, so long multi-chip runs
survive preemption.

Safety: the saved state embeds a fingerprint of the config, potential
arity and chain shape/dtype; resuming against a directory written under
different hyperparameters raises instead of silently splicing two runs.

Determinism contract: interrupted+resumed == uninterrupted AT THE SAME
CHUNKING, bit-exactly.  A chunked run vs a SINGLE-scan run of the same
draws compiles different XLA programs; with windowed ``adapt_mass`` their
f32 arithmetic can differ by ~1 ulp from the first draw, which chaotic
dynamics amplify over hundreds of draws (the store_on_GPU=False caveat;
measured on the tree-BNN example).  Don't compare chunked and unchunked
traces bitwise on warmup-adaptive configs.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .ops.mass import make_mass
from .ops.potential import resolve_potential
from .samplers.adaptation import DualAveragingState, da_init
from .samplers.driver import ChainState, MCMCConfig, MCMCResult, MCMCStats

_STATE_FILE = "state.npz"


# config fields that do not affect the sampled stream: changing them
# between resumes is harmless and must not invalidate the checkpoint
_COSMETIC_FIELDS = {"num_samples", "progress_every"}


def _fingerprint(config, theta0, extra=None) -> str:
    """Stable hash of the sampling configuration + chain shape/dtype.

    ``extra``: any additional stream-affecting options (e.g. RMHMC's
    integrator/metric settings) folded into the hash via repr.  A pytree
    ``theta0`` hashes its structure and every leaf's shape/dtype (flat
    arrays keep the original payload format, so existing flat checkpoints
    stay valid)."""
    from .utils.pytree import is_param_tree

    if is_param_tree(theta0):
        leaves = jax.tree_util.tree_leaves(theta0)
        shape = [list(np.shape(l)) for l in leaves]
        dtype = [str(np.asarray(l).dtype) for l in leaves]
        tdef = str(jax.tree_util.tree_structure(theta0))
    else:
        shape = list(np.shape(theta0))
        dtype = str(np.asarray(theta0).dtype)
        tdef = None
    payload = {
        "config_type": type(config).__name__,
        "config": {
            f.name: repr(getattr(config, f.name))
            for f in dataclasses.fields(config)
            if f.name not in _COSMETIC_FIELDS
        },
        "theta_shape": shape,
        "theta_dtype": dtype,
        "extra": repr(extra),
    }
    if tdef is not None:
        payload["theta_treedef"] = tdef
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()


def _save_state(path, carry, base_key, n_done: int, fingerprint: str):
    leaves = jax.tree_util.tree_leaves(carry)
    tmp = path + ".tmp.npz"  # keep .npz so np.savez doesn't append one
    np.savez(
        tmp,
        n_done=np.asarray(n_done),
        key_data=np.asarray(jax.random.key_data(base_key)),
        fingerprint=np.asarray(fingerprint),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    os.replace(tmp, path)


def _load_state(path, carry_template, fingerprint: str):
    z = np.load(path)
    saved_fp = str(z["fingerprint"])
    if saved_fp != fingerprint:
        raise ValueError(
            f"checkpoint at {path} was written under a different "
            "configuration (config/shape/dtype fingerprint mismatch); "
            "pass resume=False to start over, or restore the original "
            "arguments to continue that run."
        )
    treedef = jax.tree_util.tree_structure(carry_template)
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(treedef.num_leaves)]
    carry = jax.tree_util.tree_unflatten(treedef, leaves)
    key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
    return carry, key, int(z["n_done"])


def _checkpoint_loop(
    chunk_runner,
    key,
    carry_template,
    init_carry_fn,
    config,
    ckpt_dir: str,
    chunk_size: int,
    resume: bool,
    fingerprint: str,
    save_chunk,
):
    """Run chunks until ``config.num_samples`` draws are done.

    ``chunk_runner(base_key, carry, n_done, cfg)`` -> (result, new_carry);
    ``save_chunk(result)`` -> dict of arrays for the chunk file.
    ``carry_template`` is a cheap same-structure pytree used only to
    unflatten a loaded checkpoint; ``init_carry_fn()`` computes the real
    initial carry (it may evaluate the potential, so it runs only when NOT
    resuming).  Returns the loaded chunk files (oldest first) + final carry.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    state_path = os.path.join(ckpt_dir, _STATE_FILE)

    if resume and os.path.exists(state_path):
        carry, base_key, n_done = _load_state(state_path, carry_template, fingerprint)
    else:
        for f in os.listdir(ckpt_dir):
            if f.startswith("chunk_") or f == _STATE_FILE:
                os.remove(os.path.join(ckpt_dir, f))
        carry, base_key, n_done = init_carry_fn(), key, 0

    # chunk sizes must be multiples of thin or the per-chunk num_samples
    # fails the driver's divisibility check mid-run
    thin = max(getattr(config, "thin", 1), 1)
    chunk_size = max(thin, (chunk_size // thin) * thin)

    progress = getattr(config, "progress_every", 0)
    t0 = time.time()
    n_start = n_done
    while n_done < config.num_samples:
        this_chunk = min(chunk_size, config.num_samples - n_done)
        overrides = {"num_samples": this_chunk}
        if progress:
            # in-scan callbacks stay out of chunked programs (DESIGN.md
            # "host-side observability"); the loop reports per completed
            # chunk from the host instead
            overrides["progress_every"] = 0
        cfg = dataclasses.replace(config, **overrides)
        result, carry = chunk_runner(base_key, carry, n_done, cfg)
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        np.savez(
            os.path.join(ckpt_dir, f"chunk_{n_done:08d}.npz"),
            **_flatten_chunk_dict(save_chunk(result)),
        )
        n_done += this_chunk
        _save_state(state_path, carry, base_key, n_done, fingerprint)
        if progress:
            rate = (n_done - n_start) / max(time.time() - t0, 1e-9)
            print(
                f"checkpoint: {n_done}/{config.num_samples} draws saved "
                f"({rate:,.1f} draws/sec incl. compile)"
            )

    chunks = sorted(
        f for f in os.listdir(ckpt_dir) if f.startswith("chunk_") and f.endswith(".npz")
    )
    zs = [np.load(os.path.join(ckpt_dir, f)) for f in chunks]
    return zs, carry


def _np_savable(v) -> np.ndarray:
    """np.savez-safe view of a device array.  ml_dtypes floats (bfloat16
    trace storage) have numpy kind 'V' and np.save would store raw void
    bytes that load back as garbage — upcast those to f32 on disk; the
    assembly casts back to the configured trace dtype (bf16->f32->bf16 is
    exact)."""
    a = np.asarray(v)
    if a.dtype.kind == "V":
        return np.asarray(jnp.asarray(v).astype(jnp.float32))
    return a


def _restore_trace_dtype(samples, config):
    """Cast an assembled trace back to ``config.trace_dtype`` (chunk files
    store sub-f32 traces upcast to f32 — see _np_savable)."""
    td = getattr(config, "trace_dtype", None)
    if td is None:
        return samples
    return jax.tree_util.tree_map(lambda l: l.astype(td), samples)


def _flatten_chunk_dict(d: dict) -> dict:
    """Encode a chunk dict for np.savez: a pytree value (a tree-state
    sample trace) becomes per-leaf ``<name>__leaf_<i>`` entries; plain
    arrays keep their key (existing flat chunk files stay readable)."""
    out = {}
    for k, v in d.items():
        leaves = jax.tree_util.tree_leaves(v)
        if len(leaves) == 1 and leaves[0] is v:
            out[k] = _np_savable(v)
        else:
            for i, l in enumerate(leaves):
                out[f"{k}__leaf_{i}"] = _np_savable(l)
    return out


def _assemble_mcmc(zs, config, carry, time_axis: int = 0, acc_from_prob=False):
    """Concatenate chunk files into one MCMCResult.

    A directory from a previous LONGER run may hold more chunks than this
    call requested; return exactly the draws this config asked for.
    """
    kept = config.num_samples // max(getattr(config, "thin", 1), 1)
    take = (slice(None),) * time_axis + (slice(None, kept),)

    def cat(name):
        if name not in zs[0].files and f"{name}__leaf_0" in zs[0].files:
            # pytree samples: rebuild each leaf, unflatten with the carry's
            # chain-state structure (samples leaves = theta leaves + time)
            tdef = jax.tree_util.tree_structure(carry[0].theta)
            leaves = [
                jnp.asarray(
                    np.concatenate([z[f"{name}__leaf_{i}"] for z in zs],
                                   axis=time_axis)
                )[take]
                for i in range(tdef.num_leaves)
            ]
            return jax.tree_util.tree_unflatten(tdef, leaves)
        return jnp.asarray(
            np.concatenate([z[name] for z in zs], axis=time_axis)
        )[take]

    samples = _restore_trace_dtype(cat("samples"), config)
    stats = MCMCStats(**{f: cat(f) for f in MCMCStats._fields})
    state, da = carry[0], carry[1]
    # scalar dtypes follow the CHAIN state, not the (possibly
    # reduced-precision trace_dtype) storage — acc_rate must agree with
    # the uninterrupted run's f32 value
    dtype = jax.tree_util.tree_leaves(state.theta)[0].dtype
    if acc_from_prob:
        acc_rate = jnp.mean(stats.accept_prob)
    else:
        # transition-weighted mean of the per-chunk acceptance rates: with
        # thin > 1, stats.accepted holds only each window's LAST transition,
        # so a mean over it would be a thin-fold-subsampled estimate that
        # disagrees with the direct run's acc_rate
        remaining, den = kept, 0
        num = 0.0
        for z in zs:
            s_key = "samples" if "samples" in z.files else "samples__leaf_0"
            rows = z[s_key].shape[time_axis]
            take = min(rows, remaining)
            if take == rows:
                rate = np.asarray(z["acc_rate"], np.float64)  # (C,) or scalar
            else:
                # partially-consumed boundary chunk (directory holds MORE
                # draws than this config requests): the per-chunk acc_rate
                # covers transitions beyond the request, so recompute from
                # the kept rows' accepted outcomes (exact for thin == 1;
                # window-last transitions otherwise)
                acc = np.asarray(z["accepted"], np.float64)
                sl = (slice(None),) * time_axis + (slice(None, take),)
                rate = np.mean(acc[sl], axis=time_axis)
            num = num + rate * take
            den += take
            remaining -= take
            if remaining <= 0:
                break
        acc_rate = jnp.asarray(num / max(den, 1), dtype)
    return MCMCResult(
        samples=samples,
        stats=stats,
        final_step_size=da.step_size,
        acc_rate=acc_rate,
        final_state=state,
        final_da=da,
        final_warm=carry[2] if len(carry) > 2 else None,
    )


def _mcmc_chunk_fields(result: MCMCResult) -> dict:
    out = {"samples": result.samples}
    out.update({f: getattr(result.stats, f) for f in MCMCStats._fields})
    out["acc_rate"] = result.acc_rate  # exact per-chunk rate (thin-aware)
    return out


def _bind_data(lp, data):
    return lp if data is None else (lambda t: lp(t, data))


def _chain_state_template(theta0) -> ChainState:
    """Same structure as init_chain_state's result, no potential eval.
    ``theta0`` may be a flat vector or a parameter pytree."""
    dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
    return ChainState(
        theta0,
        jnp.zeros((), dtype),
        jax.tree_util.tree_map(jnp.zeros_like, theta0),
    )


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
    Potentials built by ``define_model_log_prob`` keep their dataset as a
    jit operand (the ``_raw_fn``/``_data`` protocol), never a baked-in
    program constant.
    """
    from .ops.mass import make_mass_tree
    from .samplers.hmc import _reject_tree_adapt_mass, _run_hmc_jit, init_chain_state
    from .samplers.warmup import schedule_flags, validate_adapt_mass
    from .utils.pytree import is_param_tree

    # theta0 may be a parameter PYTREE (the no-slicing-tax chain state):
    # the persistence layer is tree-generic (leaves in the state file,
    # per-leaf chunk entries, structure+shapes in the fingerprint)
    if is_param_tree(theta0):
        _reject_tree_adapt_mass(config)
        theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
        mass = make_mass_tree(inv_mass, theta0)
        seed_mass = mass.inner
    else:
        theta0 = jnp.asarray(theta0)
        mass = make_mass(inv_mass, theta0.shape[0])
        seed_mass = mass
    validate_adapt_mass(config.adapt_mass, seed_mass)
    lp, data = resolve_potential(log_prob_fn, pass_grad)
    leaves0 = jax.tree_util.tree_leaves(theta0)
    d = sum(int(l.size) for l in leaves0)
    dtype = leaves0[0].dtype
    da0 = da_init(config.step_size, dtype=dtype)
    windowed = bool(config.adapt_mass) and config.burn > 0
    if windowed:
        from .samplers.nuts import init_metric_seed

        dense = config.adapt_mass == "dense"
        wf0, metric0 = init_metric_seed(seed_mass, d, dtype, dense)
        warm0 = (wf0, metric0, jnp.zeros((), jnp.int32))
        template = (_chain_state_template(theta0), da0, warm0)
    else:
        template = (_chain_state_template(theta0), da0)

    def init_carry_fn():
        state0 = init_chain_state(_bind_data(lp, data), theta0)
        return (state0, da0, warm0) if windowed else (state0, da0)

    def chunk_runner(k, carry, n_done, cfg):
        state, da = carry[0], carry[1]
        warm = carry[2] if windowed else None
        cf = ef = None
        if windowed:
            # each chunk gets its slice of the GLOBAL warmup schedule
            cf, ef = schedule_flags(config.burn, n_done, cfg.num_samples)
        result = _run_hmc_jit(
            k, state.theta, lp, cfg, mass,
            init_state=state, init_da=da, start_iter=n_done, data=data,
            init_warm=warm, collect_flags=cf, end_flags=ef,
        )
        new_carry = (result.final_state, result.final_da)
        if windowed:
            new_carry += (result.final_warm,)
        return result, new_carry

    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, _fingerprint(config, theta0), _mcmc_chunk_fields,
    )
    return _assemble_mcmc(zs, config, carry)


def run_hmc_chains_checkpointed(
    key,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0,
    config: MCMCConfig,
    ckpt_dir: str,
    num_chains: int,
    chunk_size: int = 100,
    inv_mass=None,
    pass_grad=None,
    resume: bool = True,
    theta0_is_stacked: bool | None = None,
) -> MCMCResult:
    """Vmapped multi-chain HMC with per-chunk checkpointing.

    The resume carry holds (C, ...) batched state/DA arrays; samples and
    stats come back with a leading chain axis as from ``run_hmc_chains``.
    """
    from .ops.mass import make_mass_tree
    from .samplers.hmc import (
        _reject_tree_adapt_mass,
        _run_hmc_jit,
        init_chain_state,
    )
    from .samplers.warmup import schedule_flags, validate_adapt_mass
    from .utils.pytree import is_param_tree

    if is_param_tree(theta0):
        # pytree chains: single state broadcast, or (C, ...)-stacked leaves
        from .utils.pytree import stack_param_tree

        _reject_tree_adapt_mass(config)
        template_tree, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        mass = make_mass_tree(inv_mass, template_tree)
        seed_mass = mass.inner
        d = sum(int(l.size) for l in jax.tree_util.tree_leaves(template_tree))
        dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        mass = make_mass(inv_mass, theta0.shape[-1])
        seed_mass = mass
        d = theta0.shape[-1]
        dtype = theta0.dtype
    validate_adapt_mass(config.adapt_mass, seed_mass)
    keys = jax.random.split(key, num_chains)
    lp, data = resolve_potential(log_prob_fn, pass_grad)

    das0 = jax.vmap(lambda _: da_init(config.step_size, dtype=dtype))(
        jnp.arange(num_chains)
    )
    windowed = bool(config.adapt_mass) and config.burn > 0
    if windowed:
        from .samplers.nuts import init_metric_seed

        dense = config.adapt_mass == "dense"
        wf0, metric0 = init_metric_seed(seed_mass, d, dtype, dense)
        # per-chain warmup state: every chain estimates its own metric
        warm0 = jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (num_chains,) + l.shape),
            (wf0, metric0, jnp.zeros((), jnp.int32)),
        )
    state_t = ChainState(theta0, jnp.zeros((num_chains,), dtype),
                         jax.tree_util.tree_map(jnp.zeros_like, theta0))
    template = (state_t, das0, warm0) if windowed else (state_t, das0)

    def init_carry_fn():
        states = jax.vmap(lambda t: init_chain_state(_bind_data(lp, data), t))(theta0)
        return (states, das0, warm0) if windowed else (states, das0)

    def chunk_runner(ks, carry, n_done, cfg):
        states, das = carry[0], carry[1]
        cf = ef = None
        if windowed:
            cf, ef = schedule_flags(config.burn, n_done, cfg.num_samples)
        if windowed:
            result = jax.vmap(
                lambda k, st, da, wm: _run_hmc_jit(
                    k, st.theta, lp, cfg, mass,
                    init_state=st, init_da=da, start_iter=n_done, data=data,
                    init_warm=wm, collect_flags=cf, end_flags=ef,
                ),
                in_axes=(0, 0, 0, 0),
            )(ks, states, das, carry[2])
            return result, (result.final_state, result.final_da,
                            result.final_warm)
        result = jax.vmap(
            lambda k, st, da: _run_hmc_jit(
                k, st.theta, lp, cfg, mass,
                init_state=st, init_da=da, start_iter=n_done, data=data,
            )
        )(ks, states, das)
        return result, (result.final_state, result.final_da)

    zs, carry = _checkpoint_loop(
        chunk_runner, keys, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, _fingerprint(config, theta0), _mcmc_chunk_fields,
    )
    return _assemble_mcmc(zs, config, carry, time_axis=1)


def run_split_hmc_checkpointed(
    key,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config: MCMCConfig,
    ckpt_dir: str,
    chunk_size: int = 100,
    integrator=None,
    inv_mass=None,
    data=None,
    pass_grad=None,
    resume: bool = True,
) -> MCMCResult:
    """Symmetric-split minibatch HMC with per-chunk checkpointing, in the
    ``run_split_hmc_stacked`` contract: ``term_fn(theta, m[, data])`` one
    minibatch log-lik term, stacked arrays through ``data`` as a jit
    operand.  The splitting scheme and term count are part of the
    checkpoint fingerprint.  ``theta0`` may be a parameter PYTREE (with a
    tree-taking ``term_fn``; diagonal metrics only) — the persistence
    layer is tree-generic."""
    from .enums import Integrator
    from .samplers.splitting import _run_split_jit, stacked_total_logp
    from .utils.pytree import is_param_tree

    integrator = Integrator.SPLITTING if integrator is None else integrator
    if is_param_tree(theta0):
        from .ops.mass import make_diag_mass_tree

        theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
        mass = make_diag_mass_tree(inv_mass, theta0, "split HMC")
    else:
        theta0 = jnp.asarray(theta0)
        mass = make_mass(inv_mass, theta0.shape[0])
    dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
    da0 = da_init(config.step_size, dtype=dtype)
    template = (_chain_state_template(theta0), da0)
    total_logp = stacked_total_logp(term_fn, num_terms, data)

    def init_carry_fn():
        return (ChainState(theta0, total_logp(theta0),
                           jax.tree_util.tree_map(jnp.zeros_like, theta0)), da0)

    def chunk_runner(k, carry, n_done, cfg):
        state, da = carry
        result = _run_split_jit(
            k, state.theta, term_fn, num_terms, cfg, integrator, mass, data,
            raw_pass_grad=pass_grad, init_state=state, init_da=da,
            start_iter=n_done,
        )
        return result, (result.final_state, result.final_da)

    fp = _fingerprint(config, theta0, extra=(integrator, num_terms))
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, _mcmc_chunk_fields,
    )
    return _assemble_mcmc(zs, config, carry)


def run_rmhmc_checkpointed(
    key,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0,
    config: MCMCConfig,
    ckpt_dir: str,
    chunk_size: int = 50,
    resume: bool = True,
    **rmhmc_kwargs,
) -> MCMCResult:
    """RMHMC with per-chunk checkpointing — the sampler where resume
    matters most (implicit fixed points make it the slowest per draw; the
    reference needed 17 minutes for 10 funnel draws, samplers.py:305-387).

    ``rmhmc_kwargs`` are forwarded to the sampler: ``integrator``,
    ``metric``, ``jitter``, ``softabs_const``, ``explicit_binding_const``,
    ``fixed_point_threshold``, ``fixed_point_max_iterations``,
    ``ham_func``, ``custom_metric``.
    """
    from .samplers.rmhmc import _run_rmhmc_jit, resolve_rmhmc_options

    theta0 = jnp.asarray(theta0)
    lp, data = resolve_potential(log_prob_fn, None)
    integrator, opts, ham_func, custom_metric = resolve_rmhmc_options(
        rmhmc_kwargs
    )
    da0 = da_init(config.step_size, dtype=theta0.dtype)
    template = (_chain_state_template(theta0), da0)

    def init_carry_fn():
        fn = _bind_data(lp, data)
        return (ChainState(theta0, fn(theta0), jnp.zeros_like(theta0)), da0)

    def chunk_runner(k, carry, n_done, cfg):
        state, da = carry
        result = _run_rmhmc_jit(
            k, state.theta, lp, cfg, integrator, opts, ham_func,
            custom_metric, data=data, init_state=state, init_da=da,
            start_iter=n_done,
        )
        return result, (result.final_state, result.final_da)

    fp = _fingerprint(config, theta0, extra=(integrator, opts))
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, _mcmc_chunk_fields,
    )
    return _assemble_mcmc(zs, config, carry)


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
    """Tree-doubling NUTS with per-chunk checkpointing.

    ``adapt_mass`` windowed warmup is fully resumable: the Welford state,
    adapted inverse-mass diagonal and window-relative dual-averaging
    counter are part of the saved carry, and each chunk receives its slice
    of the GLOBAL warmup window schedule.  (Stats only; the per-draw
    NUTSInfo beyond MCMCStats is not persisted.)
    """
    from .samplers.nuts import (
        _run_nuts_jit,
        _tree_nuts_mass,
        init_metric_seed,
        validate_nuts_mass,
    )
    from .samplers.warmup import schedule_flags
    from .utils.pytree import is_param_tree

    # theta0 may be a parameter PYTREE (diag metrics only, as run_nuts):
    # the persistence layer is tree-generic
    if is_param_tree(theta0):
        theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
        mass = _tree_nuts_mass(inv_mass, theta0, config)
        seed_mass = mass.inner
    else:
        theta0 = jnp.asarray(theta0)
        mass = make_mass(inv_mass, theta0.shape[0])
        seed_mass = mass
        validate_nuts_mass(config, mass)  # same contract as run_nuts
    lp, data = resolve_potential(log_prob_fn, None)
    leaves0 = jax.tree_util.tree_leaves(theta0)
    d = sum(int(l.size) for l in leaves0)
    dtype = leaves0[0].dtype
    windowed = bool(config.adapt_mass) and config.burn > 0
    from .samplers.hmc import init_chain_state

    # the SAME seed the sampler computes: resume must adapt from the
    # identical metric an uninterrupted run would
    wf0, metric0 = init_metric_seed(
        seed_mass, d, dtype, dense=config.adapt_mass == "dense"
    )
    da0 = da_init(config.step_size, dtype=dtype)
    warm0 = (wf0, metric0, jnp.zeros((), jnp.int32))
    template = (_chain_state_template(theta0), da0, warm0)

    def init_carry_fn():
        return (init_chain_state(_bind_data(lp, data), theta0), da0, warm0)

    def chunk_runner(k, carry, n_done, cfg):
        state, da, warm = carry
        collect, end = schedule_flags(
            config.burn if windowed else 0, n_done, cfg.num_samples
        )
        result, _ = _run_nuts_jit(
            k, state.theta, lp, cfg, mass,
            init_state=state, init_da=da, start_iter=n_done, data=data,
            init_warm=warm, collect_flags=collect, end_flags=end,
        )
        return result, (result.final_state, result.final_da, result.final_warm)

    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, _fingerprint(config, theta0), _mcmc_chunk_fields,
    )
    # NUTS has no MH reject: report the real statistic (mean leaf alpha)
    return _assemble_mcmc(zs, config, carry, acc_from_prob=True)


def run_nuts_ensemble_checkpointed(
    key,
    log_prob_fn,
    theta0,
    config,  # NUTSConfig
    ckpt_dir: str,
    num_chains: int = 16,
    chunk_size: int = 100,
    inv_mass=None,
    resume: bool = True,
    mesh=None,
    theta0_is_stacked: bool | None = None,
):
    """Pooled-adaptation ensemble NUTS with per-chunk checkpointing.

    The full pooled carry (chain states with cached potential evaluations,
    shared dual averaging, Chan-merged Welford state — diagonal or dense —
    and the window-relative counter) persists per chunk, and each chunk
    receives its slice of the GLOBAL warmup schedule, so a resumed run
    adopts metrics at the same draws as an uninterrupted one.

    ``mesh``: shard the ensemble over a `jax.sharding.Mesh` per chunk (the
    ``run_nuts_ensemble_sharded`` communicating sampler).  The pooled
    stream is the same in both layouts, but sharded and unsharded
    checkpoints carry distinct fingerprints (cross-chip psum reductions
    reassociate f32 sums, so the trajectories diverge over draws).
    Returns (MCMCResult, NUTSInfo) in ``run_nuts_ensemble``'s layout.
    """
    from .samplers.driver import ChainState, MCMCStats
    from .samplers.nuts import (
        NUTSInfo,
        _run_nuts_ensemble_jit,
        _tree_nuts_mass,
        init_metric_seed,
        validate_nuts_mass,
    )
    from .samplers.warmup import schedule_flags
    from .utils.pytree import is_param_tree

    # theta0 may be a parameter PYTREE (diag metrics only, as
    # run_nuts_ensemble): the persistence layer is tree-generic and mesh
    # chunks shard leaves along their chain axis
    is_tree = is_param_tree(theta0)
    if is_tree:
        from .utils.pytree import stack_param_tree

        template_tree, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        mass = _tree_nuts_mass(inv_mass, template_tree, config)
        seed_mass = mass.inner
        c = num_chains
        d = sum(int(l.size) for l in jax.tree_util.tree_leaves(template_tree))
        dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        c, d = theta0.shape
        dtype = theta0.dtype
        mass = make_mass(inv_mass, d)
        seed_mass = mass
        validate_nuts_mass(config, mass)
    lp, data = resolve_potential(log_prob_fn, None)
    windowed = bool(config.adapt_mass) and config.burn > 0
    dense = windowed and config.adapt_mass == "dense"
    wf0, metric0 = init_metric_seed(seed_mass, d, dtype, dense)
    da0 = da_init(config.step_size, dtype=dtype)

    def make_carry(logps, grads):
        return (theta0, logps, grads, da0, wf0, metric0,
                jnp.zeros((), jnp.int32))

    template = make_carry(
        jnp.zeros((c,), dtype),
        jax.tree_util.tree_map(jnp.zeros_like, theta0),
    )

    def init_carry_fn():
        fn = _bind_data(lp, data)
        logps0, grads0 = jax.vmap(jax.value_and_grad(fn))(theta0)
        return make_carry(logps0, grads0)

    def carry_of(result):
        st = result.final_state
        return (st[0], st[1], st[2], result.final_da) + tuple(result.final_warm)

    if mesh is None:

        def chunk_runner(k, carry, n_done, cfg):
            collect, end = schedule_flags(
                config.burn if windowed else 0, n_done, cfg.num_samples
            )
            result, info = _run_nuts_ensemble_jit(
                k, carry[0], lp, cfg, mass, data=data,
                init_carry=carry, start_iter=n_done,
                collect_flags=collect, end_flags=end,
            )
            return (result, info), carry_of(result)

    else:
        from jax.sharding import PartitionSpec as P

        from .parallel.sharding import (
            derive_chain_keys,
            mesh_chain_layout,
            nuts_ensemble_carry_specs,
            nuts_ensemble_result_specs,
        )

        axes, axis_name = mesh_chain_layout(mesh, c)
        if is_tree:
            n_dev = len(mesh.devices.flatten())
            local_template = jax.tree_util.tree_map(
                lambda l: jnp.zeros((c // max(n_dev, 1),) + l.shape, l.dtype),
                template_tree,
            )
        else:
            local_template = None
        warm_template = (wf0, metric0, jnp.zeros((), jnp.int32))
        carry_specs = nuts_ensemble_carry_specs(
            axes, warm_template, theta_template=local_template
        )
        shard_cache: dict[int, Callable] = {}

        def shard_for(this_chunk: int):
            if this_chunk not in shard_cache:
                cfg = dataclasses.replace(config, num_samples=this_chunk,
                                          progress_every=0)

                def local(bk, keys_l, carry_l, data_l, col, endf, n0):
                    return _run_nuts_ensemble_jit(
                        bk, carry_l[0], lp, cfg, mass, data=data_l,
                        chain_keys=keys_l, axis_name=axis_name,
                        init_carry=carry_l, start_iter=n0,
                        collect_flags=col, end_flags=endf,
                    )

                shard_cache[this_chunk] = jax.jit(jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), P(axes), carry_specs, P(), P(), P(), P()),
                    out_specs=nuts_ensemble_result_specs(
                        axes, warm_template, theta_template=local_template
                    ),
                    check_vma=False,
                ))
            return shard_cache[this_chunk]

        def chunk_runner(k, carry, n_done, cfg):
            collect, end = schedule_flags(
                config.burn if windowed else 0, n_done, cfg.num_samples
            )
            chain_keys = derive_chain_keys(k, c)
            result, info = shard_for(cfg.num_samples)(
                k, chain_keys, carry, data, collect, end,
                jnp.asarray(n_done, jnp.int32),
            )
            return (result, info), carry_of(result)

    def save_chunk(chunk):
        result, info = chunk
        out = {"samples": result.samples, "accepted": result.stats.accepted}
        out.update({f: getattr(info, f) for f in NUTSInfo._fields})
        return out

    fp = _fingerprint(config, theta0) + ("-sharded" if mesh is not None else "")
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, save_chunk,
    )
    kept = config.num_samples // max(getattr(config, "thin", 1), 1)
    if "samples" in zs[0].files:
        samples = jnp.asarray(
            np.concatenate([z["samples"] for z in zs], axis=1)
        )[:, :kept]
    else:  # pytree ensemble: per-leaf chunk entries, (C, N, ...) leaves
        tdef = jax.tree_util.tree_structure(carry[0])
        samples = jax.tree_util.tree_unflatten(tdef, [
            jnp.asarray(
                np.concatenate([z[f"samples__leaf_{i}"] for z in zs], axis=1)
            )[:, :kept]
            for i in range(tdef.num_leaves)
        ])
    samples = _restore_trace_dtype(samples, config)
    info = NUTSInfo(
        **{
            f: jnp.asarray(np.concatenate([z[f] for z in zs], axis=0))[:kept]
            for f in NUTSInfo._fields
        }
    )
    accepted = jnp.asarray(
        np.concatenate([z["accepted"] for z in zs], axis=0)
    )[:kept]
    stats = MCMCStats(
        accept_prob=info.accept_prob,
        accepted=accepted,
        divergent=info.divergent,
        energy_old=info.energy,
        energy_new=info.energy_new,
        step_size=info.step_size,
        fp_iters=jnp.zeros_like(info.tree_depth),
        fp_residual=jnp.zeros_like(info.accept_prob),
    )
    da = carry[3]
    return (
        MCMCResult(
            samples=samples,
            stats=stats,
            final_step_size=da.step_size,
            acc_rate=jnp.mean(info.accept_prob),
            final_state=ChainState(carry[0], carry[1], carry[2]),
            final_da=da,
            final_warm=(carry[4], carry[5], carry[6]),
        ),
        info,
    )


def run_pt_checkpointed(
    key,
    log_prob_fn,
    theta0,
    config,  # PTConfig
    ckpt_dir: str,
    chunk_size: int = 100,
    inv_mass=None,
    resume: bool = True,
    num_ensembles=None,
    theta0_is_stacked: bool | None = None,
    mesh=None,
):
    """Parallel tempering with per-chunk checkpointing of the full ladder
    carry (replica positions with cached potential evaluations, adapted
    log temperature gaps, swap-rate EMA).  Returns a PTResult; the ladder
    adaptation schedule and even/odd swap alternation continue across
    chunks exactly as in an unchunked run (global draw indices drive both
    the RNG stream and the pairing parity).

    ``num_ensembles``: run E independent ladders (the ``run_pt_chains``
    layout, leading ensemble axis; ``theta0`` may be a pytree with
    (E, K, ...)-stacked leaves or a single state to broadcast).  ``mesh``:
    additionally shard the ensembles over a `jax.sharding.Mesh` per chunk
    (requires ``num_ensembles``) — the ensemble stream matches the vmapped
    run, so vmapped and sharded checkpoints are interchangeable up to
    compile-level f32 reassociation."""
    from .samplers.tempering import (
        PTCarry,
        assemble_pt_result,
        check_num_temps,
        init_pt_carry,
        _run_pt_jit,
    )
    from .utils.pytree import is_param_tree

    if mesh is not None and num_ensembles is None:
        raise ValueError(
            "mesh-sharded PT checkpointing shards the ensemble axis; pass "
            "num_ensembles as well."
        )
    if num_ensembles is not None:
        return _run_pt_checkpointed_ensembles(
            key, log_prob_fn, theta0, config, ckpt_dir, chunk_size,
            inv_mass, resume, num_ensembles, mesh,
        )

    if is_param_tree(theta0):
        # pytree replica stack (diag metrics only, as run_parallel_tempering)
        from .ops.mass import make_diag_mass_tree
        from .utils.pytree import stack_param_tree

        template_tree, theta0 = stack_param_tree(
            theta0, config.num_temps, stacked=theta0_is_stacked
        )
        from .samplers.tempering import _check_tree_num_temps

        _check_tree_num_temps(theta0, config)
        mass = make_diag_mass_tree(inv_mass, template_tree, "parallel tempering")
        k_temps = config.num_temps
        dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (config.num_temps,) + theta0.shape)
        check_num_temps(theta0, config)
        mass = make_mass(inv_mass, theta0.shape[-1])
        k_temps = theta0.shape[0]
        dtype = theta0.dtype
    # no burn < num_samples guard here: an interrupted run may legitimately
    # stop inside the burn window; burn slicing happens only at assembly
    lp, data = resolve_potential(log_prob_fn, None)

    template = PTCarry(
        thetas=theta0,
        logps=jnp.zeros((k_temps,), dtype),
        grads=jax.tree_util.tree_map(jnp.zeros_like, theta0),
        s=jnp.zeros((k_temps - 1,), dtype),
        ema=jnp.zeros((k_temps - 1,), dtype),
        da=DualAveragingState(*(jnp.zeros((k_temps,), dtype),) * 4),
    )

    def init_carry_fn():
        return init_pt_carry(_bind_data(lp, data), theta0, config)

    def chunk_runner(k, carry, n_done, cfg):
        traj, alphas, swaps, carry_f = _run_pt_jit(
            k, carry.thetas, lp, cfg, mass, data=data,
            init_carry=carry, start_iter=n_done,
        )
        return (traj, alphas, swaps), carry_f

    def save_chunk(result):
        traj, alphas, swaps = result
        return {"traj": traj, "alphas": alphas, "swaps": swaps}

    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, _fingerprint(config, theta0), save_chunk,
    )
    kept = config.num_samples  # burn slicing happens in assemble_pt_result
    if "traj" in zs[0].files:
        traj = jnp.asarray(np.concatenate([z["traj"] for z in zs], axis=0))[:kept]
    else:  # pytree ladder: per-leaf chunk entries, (N, K, ...) leaves
        tdef = jax.tree_util.tree_structure(carry.thetas)
        traj = jax.tree_util.tree_unflatten(tdef, [
            jnp.asarray(
                np.concatenate([z[f"traj__leaf_{i}"] for z in zs], axis=0)
            )[:kept]
            for i in range(tdef.num_leaves)
        ])
    alphas = jnp.asarray(np.concatenate([z["alphas"] for z in zs], axis=0))[:kept]
    swaps = jnp.asarray(np.concatenate([z["swaps"] for z in zs], axis=0))[:kept]
    return assemble_pt_result(traj, alphas, swaps, carry, config)


def _run_pt_checkpointed_ensembles(
    key, log_prob_fn, theta0, config, ckpt_dir, chunk_size, inv_mass,
    resume, num_ensembles: int, mesh,
):
    """Ensemble (and optionally mesh-sharded) variant of
    ``run_pt_checkpointed``: E independent ladders with a leading ensemble
    axis, each chunk one vmapped (or shard_map'd) compiled scan.  The
    ladder state may be a parameter pytree — the persistence layer and the
    mesh specs are tree-generic."""
    from .samplers.tempering import (
        PTCarry,
        _pt_ensemble_stack,
        assemble_pt_ensemble_result,
        init_pt_carry,
        _run_pt_jit,
    )

    theta0, mass = _pt_ensemble_stack(theta0, config, num_ensembles, inv_mass)
    lp, data = resolve_potential(log_prob_fn, None)
    e, k_temps = num_ensembles, config.num_temps
    dtype = jax.tree_util.tree_leaves(theta0)[0].dtype

    template = PTCarry(
        thetas=theta0,
        logps=jnp.zeros((e, k_temps), dtype),
        grads=jax.tree_util.tree_map(jnp.zeros_like, theta0),
        s=jnp.zeros((e, k_temps - 1), dtype),
        ema=jnp.zeros((e, k_temps - 1), dtype),
        da=DualAveragingState(*(jnp.zeros((e, k_temps), dtype),) * 4),
    )

    def init_carry_fn():
        fn = _bind_data(lp, data)
        return jax.vmap(lambda t: init_pt_carry(fn, t, config))(theta0)

    def run_block(keys_e, carry_e, data_l, n0, cfg):
        # n0 (the global draw offset) is shared by all ensembles: closed
        # over by the vmapped lambda rather than batched
        return jax.vmap(
            lambda ke, ce: _run_pt_jit(
                ke, ce.thetas, lp, cfg, mass, data=data_l,
                init_carry=ce, start_iter=n0,
            )
        )(keys_e, carry_e)

    if mesh is None:

        def chunk_runner(k, carry, n_done, cfg):
            keys = jax.random.split(k, num_ensembles)
            traj, alphas, swaps, carry_f = run_block(
                keys, carry, data, jnp.asarray(n_done, jnp.int32), cfg
            )
            return (traj, alphas, swaps), carry_f

    else:
        from jax.sharding import PartitionSpec as P

        from .parallel.sharding import _leading_axis_specs, mesh_chain_layout

        axes, _ = mesh_chain_layout(mesh, num_ensembles)
        carry_specs = _leading_axis_specs(template, axes)
        shard_cache: dict[int, Callable] = {}

        def shard_for(this_chunk: int):
            if this_chunk not in shard_cache:
                cfg = dataclasses.replace(config, num_samples=this_chunk,
                                          progress_every=0)

                def local(keys_l, carry_l, data_l, n0):
                    return run_block(keys_l, carry_l, data_l, n0, cfg)

                local_e = num_ensembles // len(mesh.devices.flatten())
                out_specs = _leading_axis_specs(
                    jax.eval_shape(
                        local,
                        jax.random.split(key, local_e),
                        jax.tree_util.tree_map(
                            lambda a: a[:local_e], template
                        ),
                        data,
                        jnp.zeros((), jnp.int32),
                    ),
                    axes,
                )
                shard_cache[this_chunk] = jax.jit(jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(axes), carry_specs, P(), P()),
                    out_specs=out_specs, check_vma=False,
                ))
            return shard_cache[this_chunk]

        def chunk_runner(k, carry, n_done, cfg):
            keys = jax.random.split(k, num_ensembles)
            traj, alphas, swaps, carry_f = shard_for(cfg.num_samples)(
                keys, carry, data, jnp.asarray(n_done, jnp.int32)
            )
            return (traj, alphas, swaps), carry_f

    def save_chunk(result):
        traj, alphas, swaps = result
        return {"traj": traj, "alphas": alphas, "swaps": swaps}

    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, _fingerprint(config, theta0), save_chunk,
    )
    kept = config.num_samples  # burn slicing happens at assembly
    if "traj" in zs[0].files:
        traj = jnp.asarray(np.concatenate([z["traj"] for z in zs], axis=1))[:, :kept]
    else:  # pytree ladders: per-leaf chunk entries, (E, N, K, ...) leaves
        tdef = jax.tree_util.tree_structure(carry.thetas)
        traj = jax.tree_util.tree_unflatten(tdef, [
            jnp.asarray(
                np.concatenate([z[f"traj__leaf_{i}"] for z in zs], axis=1)
            )[:, :kept]
            for i in range(tdef.num_leaves)
        ])
    alphas = jnp.asarray(np.concatenate([z["alphas"] for z in zs], axis=1))[:, :kept]
    swaps = jnp.asarray(np.concatenate([z["swaps"] for z in zs], axis=1))[:, :kept]
    return assemble_pt_ensemble_result(traj, alphas, swaps, carry, config)


def run_chees_checkpointed(
    key,
    log_prob_fn,
    theta0,
    config,  # ChEESConfig
    ckpt_dir: str,
    num_chains: int = 16,
    chunk_size: int = 100,
    inv_mass=None,
    resume: bool = True,
    mesh=None,
    theta0_is_stacked: bool | None = None,
):
    """ChEES-HMC with per-chunk checkpointing of the full adaptation carry
    (ensemble state, trajectory-length adam state, dual averaging, windowed
    Welford mass estimate).  Returns a ChEESResult.

    ``mesh``: a `jax.sharding.Mesh` shards the chain ensemble over all mesh
    axes per chunk (the ``run_chees_sharded`` communicating sampler), making
    long multi-chip runs preemption-safe.  The sharded random stream derives
    from per-chain keys, so sharded and unsharded checkpoints are not
    interchangeable (the fingerprint enforces this); resuming on a mesh of a
    DIFFERENT shape continues the same stream but cross-chain psum
    reductions may differ in final-ulp rounding.
    """
    from .samplers.chees import (
        ChEESCarry,
        ChEESInfo,
        ChEESResult,
        _run_chees_jit,
        validate_chees,
    )
    from .samplers.nuts import init_metric_seed
    from .samplers.warmup import schedule_flags
    from .utils.pytree import is_param_tree, reject_param_tree

    is_tree = is_param_tree(theta0)
    if is_tree:
        # same spread semantics as run_chees's pytree entry (single state
        # broadcast+noised, or (C, ...)-stacked leaves taken as-is)
        from .utils.pytree import stack_param_tree

        stacked = all(
            l.shape[:1] == (num_chains,)
            for l in jax.tree_util.tree_leaves(theta0)
        )
        if theta0_is_stacked is not None:
            stacked = theta0_is_stacked
        if stacked:
            template_tree, theta0 = stack_param_tree(
                theta0, num_chains, stacked=True
            )
        else:  # spread a single state (the key is consumed only here)
            k_init, key = jax.random.split(key)
            template_tree, theta0 = stack_param_tree(
                theta0, num_chains, key=k_init, noise=0.01, stacked=False
            )
        from .ops.mass import make_diag_mass_tree

        mass = make_diag_mass_tree(
            inv_mass, template_tree, "ChEES ensembles",
            dense_requested=config.adapt_mass == "dense",
        )
        validate_chees(config, mass.inner)
        seed_mass = mass.inner
        c = num_chains
        d = sum(int(l.size) for l in jax.tree_util.tree_leaves(template_tree))
        dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            k_init, key = jax.random.split(key)
            theta0 = theta0[None, :] + 0.01 * jax.random.normal(
                k_init, (num_chains, theta0.shape[0]), theta0.dtype
            )
        mass = make_mass(inv_mass, theta0.shape[-1])
        validate_chees(config, mass)  # same contract as run_chees
        seed_mass = mass
        c, d = theta0.shape
        dtype = theta0.dtype
    lp, data = resolve_potential(log_prob_fn, None)
    windowed = bool(config.adapt_mass) and config.burn > 0
    dense = windowed and config.adapt_mass == "dense"

    # the SAME seed the sampler computes: resume must adapt from the
    # identical metric an uninterrupted run would
    wf0, metric0 = init_metric_seed(seed_mass, d, dtype, dense)

    def make_carry(logps, grads):
        return ChEESCarry(
            thetas=theta0, logps=logps, grads=grads,
            da=da_init(config.step_size, dtype=dtype),
            log_t=jnp.log(jnp.asarray(config.init_trajectory_length, dtype)),
            adam_m=jnp.zeros((), dtype), adam_v=jnp.zeros((), dtype),
            wf_count=wf0.count, wf_mean=wf0.mean, wf_m2=wf0.m2,
            metric=metric0, da_t=jnp.zeros((), jnp.int32),
        )

    template = make_carry(
        jnp.zeros((c,), dtype),
        jax.tree_util.tree_map(jnp.zeros_like, theta0),
    )

    def init_carry_fn():
        fn = _bind_data(lp, data)
        logps0, grads0 = jax.vmap(jax.value_and_grad(fn))(theta0)
        return make_carry(logps0, grads0)

    if mesh is None:

        def chunk_runner(k, carry, n_done, cfg):
            collect, end = schedule_flags(
                config.burn if windowed else 0, n_done, cfg.num_samples
            )
            result = _run_chees_jit(
                k, carry.thetas, lp, cfg, mass, data=data,
                init_carry=carry, start_iter=n_done,
                collect_flags=collect, end_flags=end,
            )
            return result, result.final_carry

    else:
        from jax.sharding import PartitionSpec as P

        from .parallel.sharding import (
            chees_carry_specs,
            chees_result_specs,
            derive_chain_keys,
            mesh_chain_layout,
        )

        axes, axis_name = mesh_chain_layout(mesh, c)
        if is_tree:
            n_dev = len(mesh.devices.flatten())
            local_template = jax.tree_util.tree_map(
                lambda l: jnp.zeros((c // max(n_dev, 1),) + l.shape, l.dtype),
                template_tree,
            )
        else:
            local_template = None

        # the compiled sharded program is built once per distinct chunk
        # LENGTH (normally two: the chunk size and the final remainder);
        # start_iter rides in as a replicated operand so successive chunks
        # hit the jit cache instead of recompiling the whole mesh program
        shard_cache: dict[int, Callable] = {}

        def shard_for(this_chunk: int):
            if this_chunk not in shard_cache:
                # progress_every stripped: no callbacks in sharded programs
                cfg = dataclasses.replace(config, num_samples=this_chunk,
                                          progress_every=0)

                def local(bk, keys_l, carry_l, data_l, col, endf, n0):
                    return _run_chees_jit(
                        bk, carry_l.thetas, lp, cfg, mass, data=data_l,
                        chain_keys=keys_l, axis_name=axis_name,
                        init_carry=carry_l, start_iter=n0,
                        collect_flags=col, end_flags=endf,
                    )

                shard_cache[this_chunk] = jax.jit(jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), P(axes),
                              chees_carry_specs(
                                  axes, dense=dense,
                                  theta_template=local_template),
                              P(), P(), P(), P()),
                    out_specs=chees_result_specs(
                        axes, dense=dense, theta_template=local_template),
                    check_vma=False,
                ))
            return shard_cache[this_chunk]

        def chunk_runner(k, carry, n_done, cfg):
            collect, end = schedule_flags(
                config.burn if windowed else 0, n_done, cfg.num_samples
            )
            # same per-chain key derivation as run_chees_sharded, recomputed
            # from the persisted base key so any chunking yields one stream
            chain_keys = derive_chain_keys(k, c)
            result = shard_for(cfg.num_samples)(
                k, chain_keys, carry, data, collect, end,
                jnp.asarray(n_done, jnp.int32),
            )
            return result, result.final_carry

    def save_chunk(result):
        out = {"samples": result.samples}
        out.update({f: getattr(result.info, f) for f in ChEESInfo._fields})
        return out

    fp = _fingerprint(config, theta0) + ("-sharded" if mesh is not None else "")
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, save_chunk,
    )
    kept = config.num_samples // max(getattr(config, "thin", 1), 1)
    if "samples" in zs[0].files:
        samples = jnp.asarray(
            np.concatenate([z["samples"] for z in zs], axis=1)
        )[:, :kept]
    else:  # pytree ensemble: per-leaf chunk entries, (C, N, ...) leaves
        tdef = jax.tree_util.tree_structure(carry.thetas)
        samples = jax.tree_util.tree_unflatten(tdef, [
            jnp.asarray(
                np.concatenate([z[f"samples__leaf_{i}"] for z in zs], axis=1)
            )[:, :kept]
            for i in range(tdef.num_leaves)
        ])
    samples = _restore_trace_dtype(samples, config)
    info = ChEESInfo(
        **{
            f: jnp.asarray(np.concatenate([z[f] for z in zs], axis=0))[:kept]
            for f in ChEESInfo._fields
        }
    )
    return ChEESResult(
        samples=samples,
        info=info,
        final_step_size=carry.da.step_size,
        final_trajectory_length=jnp.exp(carry.log_t),
        final_carry=carry,
    )


def run_sgld_checkpointed(
    key,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config,  # SGLDConfig
    ckpt_dir: str,
    chunk_size: int = 1000,
    inv_mass=None,
    data=None,
    resume: bool = True,
):
    """SGLD with per-chunk checkpointing — the SG-MCMC long-run driver.

    ``chunk_size`` counts TRANSITIONS (``config.num_samples`` units;
    rounded to a ``thin`` multiple).  Per-step RNG folds the GLOBAL step
    index, so the assembled trace is bit-identical to one straight
    :func:`~.samplers.sgmcmc.run_sgld` call with the same key.
    """
    return _run_sgmcmc_checkpointed(
        "sgld", key, term_fn, num_terms, theta0, config, ckpt_dir,
        chunk_size, inv_mass, data, resume
    )


def run_sghmc_checkpointed(
    key,
    term_fn: Callable,
    num_terms: int,
    theta0,
    config,  # SGHMCConfig
    ckpt_dir: str,
    chunk_size: int = 1000,
    inv_mass=None,
    data=None,
    resume: bool = True,
):
    """SGHMC with per-chunk checkpointing (the momentum rides the state
    file) — same contract as :func:`run_sgld_checkpointed`."""
    return _run_sgmcmc_checkpointed(
        "sghmc", key, term_fn, num_terms, theta0, config, ckpt_dir,
        chunk_size, inv_mass, data, resume
    )


def _run_sgmcmc_checkpointed(which, key, term_fn, num_terms, theta0, config,
                             ckpt_dir, chunk_size, inv_mass, data, resume):
    from .samplers.sgmcmc import (
        SGMCMCResult,
        SGMCMCStats,
        _prep,
        _run_sghmc_jit,
        _run_sgld_jit,
    )

    theta0, pre, data = _prep(
        key, term_fn, num_terms, theta0, config, inv_mass, data,
        f"run_{which}_checkpointed",
    )
    jit_fn = _run_sgld_jit if which == "sgld" else _run_sghmc_jit
    # aux: rmsprop accumulator / momentum — zeros template; plain SGLD
    # carries None (no leaves in the state file, structure from template)
    if which == "sghmc" or getattr(config, "preconditioner", "none") == "rmsprop":
        aux0 = jax.tree_util.tree_map(jnp.zeros_like, theta0)
    else:
        aux0 = None
    template = (theta0, aux0)

    def init_carry_fn():
        return (theta0, aux0)

    def chunk_runner(k, carry, n_done, cfg):
        theta, aux = carry
        result = jit_fn(k, theta, term_fn, num_terms, cfg, pre, data,
                        aux, n_done)
        return result, (result.final_theta, result.final_aux)

    def save_chunk(result):
        out = {"samples": result.samples}
        out.update(
            {f: getattr(result.stats, f) for f in SGMCMCStats._fields}
        )
        return out

    fp = _fingerprint(config, theta0, extra=(which, num_terms))
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, save_chunk,
    )

    kept = config.num_samples // max(config.thin, 1)

    def cat(name):
        if name not in zs[0].files and f"{name}__leaf_0" in zs[0].files:
            tdef = jax.tree_util.tree_structure(carry[0])
            leaves = [
                jnp.asarray(
                    np.concatenate([z[f"{name}__leaf_{i}"] for z in zs])
                )[:kept]
                for i in range(tdef.num_leaves)
            ]
            return jax.tree_util.tree_unflatten(tdef, leaves)
        return jnp.asarray(np.concatenate([z[name] for z in zs]))[:kept]

    stats = SGMCMCStats(**{f: cat(f) for f in SGMCMCStats._fields})
    # chunk files store sub-f32 arrays upcast to f32 (_np_savable); cast the
    # assembled trace back to the chain state's leaf dtypes so a bf16-state
    # run returns bf16 samples, bit-identical to the straight run
    samples = jax.tree_util.tree_map(
        lambda s, t: s.astype(t.dtype), cat("samples"), theta0
    )
    return SGMCMCResult(
        samples=samples,
        stats=stats,
        final_theta=carry[0],
        final_aux=carry[1],
        final_step=jnp.asarray(config.num_samples, jnp.int32),
    )


def run_ti_checkpointed(
    key,
    log_prior_fn: Callable,
    log_lik_fn: Callable,
    theta0,
    config,  # TIConfig
    ckpt_dir: str,
    chunk_size: int = 500,
    data=None,
    resume: bool = True,
):
    """Thermodynamic integration with per-chunk checkpointing.

    Evidence ladders are long by construction (the stepping-stone error
    shrinks only with draws); this makes them preemption-safe.  The
    per-rung dual-averaging state and replica positions ride the state
    file; per-draw RNG folds the GLOBAL draw index, so the assembled
    result is bit-identical to a straight :func:`~.samplers.ti.run_ti`
    run with the same key, and an interrupted run resumes exactly.
    The evidence estimators run once at assembly over the concatenated
    post-burn log-likelihood trace.
    """
    from .samplers.adaptation import DualAveragingState
    from .samplers.ti import _run_ti_jit, assemble_ti_result, stack_ti_rungs

    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    theta0s = stack_ti_rungs(theta0, config)
    lik, data_r = resolve_potential(log_lik_fn, None)
    if data is None:
        data = data_r
    leaves0 = jax.tree_util.tree_leaves(theta0s)
    k_temps, dtype = leaves0[0].shape[0], leaves0[0].dtype
    eps0 = jnp.full((k_temps,), config.step_size, dtype)
    da0 = DualAveragingState(
        step_size=eps0,
        log_eps_bar=jnp.zeros((k_temps,), dtype),
        h_t=jnp.zeros((k_temps,), dtype),
        mu=jnp.log(10.0 * eps0),
    )
    template = (theta0s, da0)

    def init_carry_fn():
        return (theta0s, da0)

    def chunk_runner(k, carry, n_done, cfg):
        thetas, da = carry
        out = _run_ti_jit(k, thetas, log_prior_fn, lik, cfg, data=data,
                          init_da=da, start_iter=n_done)
        return out, (out[6], out[7])

    def save_chunk(out):
        cold, llik_tr, alphas, swaps = out[0], out[1], out[2], out[3]
        # betas ride the chunk file: the estimator must see the SAME ladder
        # the jitted scan used (XLA constant-folds ti_ladder at compile
        # time; an eager recompute differs by ulps on TPU, which moves
        # log_evidence off the straight run's)
        return {"cold": cold, "llik": llik_tr, "alphas": alphas,
                "swaps": swaps, "betas": out[4]}

    fp = _fingerprint(config, theta0s)
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, save_chunk,
    )

    # truncate to config.num_samples: num_samples is a cosmetic fingerprint
    # field, so resuming a directory left by a longer completed run must
    # return exactly the requested draws (the _assemble_mcmc [:kept] rule)
    kept = config.num_samples

    def cat(name):
        if name not in zs[0].files and f"{name}__leaf_0" in zs[0].files:
            tdef = jax.tree_util.tree_structure(carry[0])
            leaves = [
                jnp.asarray(
                    np.concatenate([z[f"{name}__leaf_{i}"] for z in zs])
                )[:kept]
                for i in range(tdef.num_leaves)
            ]
            return jax.tree_util.tree_unflatten(tdef, leaves)
        return jnp.asarray(np.concatenate([z[name] for z in zs]))[:kept]

    # constant per chunk — read from the first file, never recomputed
    # (and never concatenated: cat()'s [:kept] is for time axes); older
    # directories predating the betas field fall back to the eager ladder
    if "betas" in zs[0].files:
        betas = jnp.asarray(zs[0]["betas"]).astype(dtype)
    else:
        from .samplers.ti import ti_ladder

        betas = ti_ladder(config.num_temps, config.schedule_power, dtype)
    # chunk files store sub-f32 arrays upcast to f32 (_np_savable); restore
    # the chain-state leaf dtypes so a bf16-state run's llik trace — hence
    # log_evidence — is bit-identical to the straight run
    cold = jax.tree_util.tree_map(
        lambda s, t: s.astype(t.dtype), cat("cold"), theta0s
    )
    out = (cold, cat("llik").astype(dtype), cat("alphas").astype(dtype),
           cat("swaps"), betas, carry[1].step_size)
    return assemble_ti_result(out, config)


def run_mclmc_checkpointed(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # MCLMCConfig
    ckpt_dir: str,
    chunk_size: int = 1000,
    data=None,
    resume: bool = True,
    pass_grad=None,
):
    """MCLMC with per-chunk checkpointing — the unadjusted long-run driver.

    The FIRST chunk runs the tuning phase (``config.tune_steps``); the
    tuned (eps, L) ride the state file as f32 scalars and every later
    chunk runs frozen (``tune_steps=0``) — exactly the tuned-then-frozen
    resume contract of :func:`~.samplers.mclmc.run_mclmc`.  Per-step RNG
    folds the GLOBAL transition index, so the assembled trace is
    bit-identical to one straight ``run_mclmc`` call with the same key.
    ``chunk_size`` counts TRANSITIONS (``config.num_samples`` units;
    rounded to a ``thin`` multiple).  ``theta0`` may be flat or a
    parameter pytree (boundary ravel; samples keep leaf shapes).
    """
    from .samplers.mclmc import (
        MCLMCResult,
        MCLMCStats,
        _prep_flat,
        _run_mclmc_jit,
        _seed_scales,
    )

    theta0f, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0, pass_grad)
    if data is None:
        data = data_r
    eps0, length0 = _seed_scales(config, theta0f.shape[0])
    template = (theta0f, theta0f, eps0, length0)  # (theta, u, eps, L)

    def init_carry_fn():
        # the u slot is a placeholder until the first chunk runs (the
        # straight run draws u0 inside the kernel from the base key)
        return (theta0f, jnp.zeros_like(theta0f), eps0, length0)

    def chunk_runner(k, carry, n_done, cfg):
        theta, u, eps, length = carry
        if n_done == 0:
            r = _run_mclmc_jit(k, theta, eps, length, fn, cfg, data=data)
        else:
            cfg = dataclasses.replace(cfg, tune_steps=0)
            r = _run_mclmc_jit(k, theta, eps, length, fn, cfg, data=data,
                               init_u=u, start_step=n_done)
        return r, (r.final_theta, r.final_u, r.step_size,
                   r.trajectory_length)

    def save_chunk(result):
        out = {"samples": result.samples}
        out.update(
            {f: getattr(result.stats, f) for f in MCLMCStats._fields}
        )
        return out

    fp = _fingerprint(config, theta0, extra="mclmc")
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, save_chunk,
    )

    kept = config.num_samples // max(config.thin, 1)

    def cat(name):
        return jnp.asarray(np.concatenate([z[name] for z in zs]))[:kept]

    stats = MCLMCStats(**{f: cat(f) for f in MCLMCStats._fields})
    # chunk files store sub-f32 arrays upcast to f32 (_np_savable); restore
    # the chain-state dtype so a bf16-state run matches the straight run
    samples = cat("samples").astype(theta0f.dtype)
    thetaF, uF, eps, length = carry
    if unravel is not None:
        samples = jax.vmap(unravel)(samples)
        thetaF = unravel(thetaF)
    return MCLMCResult(
        samples=samples,
        stats=stats,
        step_size=eps,
        trajectory_length=length,
        final_theta=thetaF,
        final_u=uF,
        final_step=jnp.asarray(config.num_samples, jnp.int32),
    )


def run_mams_checkpointed(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # MAMSConfig
    ckpt_dir: str,
    chunk_size: int = 1000,
    data=None,
    resume: bool = True,
    pass_grad=None,
):
    """MAMS with per-chunk checkpointing.

    The dual-averaging state rides the state file; ``config.burn`` is a
    GLOBAL draw index, so adaptation continues across chunk boundaries
    and freezes at the same draw as the straight run.  Per-draw RNG
    folds the GLOBAL index — the assembled trace is bit-identical to one
    straight :func:`~.samplers.mams.run_mams` call with the same key.
    ``chunk_size`` counts draws (rounded to a ``thin`` multiple);
    ``theta0`` may be flat or a parameter pytree.
    """
    from .samplers.adaptation import da_init
    from .samplers.mams import MAMSResult, MAMSStats, _run_mams_jit
    from .samplers.mclmc import _prep_flat

    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    theta0f, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0, pass_grad)
    if data is None:
        data = data_r
    da0 = da_init(config.step_size)
    template = (theta0f, da0)

    def init_carry_fn():
        return (theta0f, da0)

    def chunk_runner(k, carry, n_done, cfg):
        theta, da = carry
        r = _run_mams_jit(k, theta, fn, cfg, data=data, init_da=da,
                          start_step=n_done)
        return r, (r.final_theta, r.final_da)

    def save_chunk(result):
        out = {"samples": result.samples}
        out.update(
            {f: getattr(result.stats, f) for f in MAMSStats._fields}
        )
        return out

    fp = _fingerprint(config, theta0, extra="mams")
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, save_chunk,
    )

    kept = config.num_samples // max(config.thin, 1)

    def cat(name):
        return jnp.asarray(np.concatenate([z[name] for z in zs]))[:kept]

    stats = MAMSStats(**{f: cat(f) for f in MAMSStats._fields})
    samples = cat("samples").astype(theta0f.dtype)
    thetaF, daF = carry
    burn_kept = config.burn // max(config.thin, 1)
    acc_rate = jnp.mean(
        stats.accept_prob[burn_kept:] if kept > burn_kept
        else stats.accept_prob
    )
    eps_final = (jnp.exp(daF.log_eps_bar) if config.adapt_step_size
                 else daF.step_size)
    if unravel is not None:
        samples = jax.vmap(unravel)(samples)
        thetaF = unravel(thetaF)
    return MAMSResult(
        samples=samples,
        stats=stats,
        step_size=eps_final,
        acc_rate=acc_rate,
        final_theta=thetaF,
        final_da=daF,
        final_step=jnp.asarray(config.num_samples, jnp.int32),
    )


def run_barker_checkpointed(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # BarkerConfig
    ckpt_dir: str,
    chunk_size: int = 1000,
    scale=None,
    data=None,
    resume: bool = True,
    pass_grad=None,
):
    """Barker proposal with per-chunk checkpointing.

    The dual-averaging AND Welford preconditioner states ride the state
    file; ``config.burn`` is a GLOBAL draw index, so step-size
    adaptation, the Welford window and the 3/4-burn scale switch all
    land at the same draws as the straight run.  Per-draw RNG folds the
    GLOBAL index — the assembled trace is bit-identical to one straight
    :func:`~.samplers.barker.run_barker` call with the same key.
    ``chunk_size`` counts draws (rounded to a ``thin`` multiple);
    ``theta0`` may be flat or a parameter pytree (``scale`` may then be
    a per-leaf pytree).
    """
    from .samplers.adaptation import da_init
    from .samplers.barker import (
        BarkerResult,
        BarkerStats,
        _ravel_scale,
        _run_barker_jit,
    )
    from .samplers.mclmc import _prep_flat
    from .samplers.warmup import welford_init, welford_variance

    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    scale_f = (_ravel_scale(scale, theta0)
               if not hasattr(theta0, "ndim") else
               (1.0 if scale is None else scale))
    theta0f, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0, pass_grad)
    if data is None:
        data = data_r
    da0 = da_init(config.step_size)
    wf0 = welford_init(theta0f.shape[0], theta0f.dtype)
    template = (theta0f, da0, wf0)

    def init_carry_fn():
        return (theta0f, da0, wf0)

    def chunk_runner(k, carry, n_done, cfg):
        theta, da, wf = carry
        r = _run_barker_jit(k, theta, fn, cfg, scale_f, data=data,
                            init_da=da, init_welford=wf, start_step=n_done)
        return r, (r.final_theta, r.final_da, r.final_welford)

    def save_chunk(result):
        out = {"samples": result.samples}
        out.update(
            {f: getattr(result.stats, f) for f in BarkerStats._fields}
        )
        return out

    fp = _fingerprint(config, theta0, extra="barker")
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, save_chunk,
    )

    kept = config.num_samples // max(config.thin, 1)

    def cat(name):
        return jnp.asarray(np.concatenate([z[name] for z in zs]))[:kept]

    stats = BarkerStats(**{f: cat(f) for f in BarkerStats._fields})
    samples = cat("samples").astype(theta0f.dtype)
    thetaF, daF, wfF = carry
    burn_kept = config.burn // max(config.thin, 1)
    acc_rate = jnp.mean(
        stats.accept_prob[burn_kept:] if kept > burn_kept
        else stats.accept_prob
    )
    eps_final = (jnp.exp(daF.log_eps_bar) if config.adapt_step_size
                 else daF.step_size)
    scale_arr = jnp.broadcast_to(
        jnp.asarray(scale_f, theta0f.dtype), theta0f.shape
    )
    if config.adapt_scale:
        # the run ends past the 3/4-burn switch (burn < num_samples), so
        # the post-burn scale is the Welford estimate whenever it has data
        var = jnp.maximum(welford_variance(wfF), 1e-20)
        scaleF = jnp.where(wfF.count > 2,
                           jnp.sqrt(var).astype(theta0f.dtype), scale_arr)
    else:
        scaleF = scale_arr
    if unravel is not None:
        samples = jax.vmap(unravel)(samples)
        thetaF = unravel(thetaF)
    return BarkerResult(
        samples=samples,
        stats=stats,
        step_size=eps_final,
        acc_rate=acc_rate,
        final_theta=thetaF,
        final_da=daF,
        final_welford=wfF,
        final_step=jnp.asarray(config.num_samples, jnp.int32),
        scale=scaleF,
    )


def run_stretch_checkpointed(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # StretchConfig
    ckpt_dir: str,
    chunk_size: int = 1000,
    num_walkers: int = 64,
    data=None,
    init_jitter: float = 1e-2,
    resume: bool = True,
):
    """Stretch-move ensemble with per-chunk checkpointing.

    The walker matrix and its cached log-densities ride the state file;
    per-iteration RNG folds the GLOBAL index, so the assembled trace is
    bit-identical to one straight :func:`~.samplers.stretch.run_stretch`
    call with the same key.  ``chunk_size`` counts iterations (rounded
    to a ``thin`` multiple); ``theta0`` may be flat, an explicit walker
    matrix, or a parameter pytree.
    """
    from .samplers.stretch import (
        StretchResult,
        StretchStats,
        _prep_walkers,
        _run_stretch_jit,
    )

    walkers0, fn, data_r, unravel = _prep_walkers(
        key, log_prob_fn, theta0, num_walkers, init_jitter
    )
    if data is None:
        data = data_r
    logp_t = jnp.zeros((num_walkers,), jnp.result_type(walkers0.dtype,
                                                       jnp.float32))
    template = (walkers0, logp_t)

    def init_carry_fn():
        return (walkers0, None)

    def chunk_runner(k, carry, n_done, cfg):
        walkers, logp = carry
        r = _run_stretch_jit(k, walkers, fn, cfg, num_walkers, data=data,
                             init_logp=logp, start_step=n_done)
        return r, (r.final_walkers, r.final_logp)

    def save_chunk(result):
        out = {"samples": result.samples}
        out.update(
            {f: getattr(result.stats, f) for f in StretchStats._fields}
        )
        return out

    fp = _fingerprint(config, theta0, extra=("stretch", num_walkers))
    zs, carry = _checkpoint_loop(
        chunk_runner, key, template, init_carry_fn, config, ckpt_dir,
        chunk_size, resume, fp, save_chunk,
    )

    kept = config.num_samples // max(config.thin, 1)

    def cat(name):
        return jnp.asarray(np.concatenate([z[name] for z in zs]))[:kept]

    stats = StretchStats(**{f: cat(f) for f in StretchStats._fields})
    samples = cat("samples").astype(walkers0.dtype)
    walkersF, logpF = carry
    if unravel is not None:
        samples = jax.vmap(jax.vmap(unravel))(samples)
        walkersF = jax.vmap(unravel)(walkersF)
    return StretchResult(
        samples=samples,
        stats=stats,
        acc_rate=jnp.mean(stats.accept_frac),
        final_walkers=walkersF,
        final_logp=logpF,
        final_step=jnp.asarray(config.num_samples, jnp.int32),
    )
