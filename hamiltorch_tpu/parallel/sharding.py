"""Device-mesh sharding: chain-parallel and data-parallel sampling.

The reference has no distributed backend at all (SURVEY.md §2/§5: no
torch.distributed/NCCL/MPI anywhere).  This module is the TPU-native scale
story designed in SURVEY.md §7: a 2-D ``jax.sharding.Mesh`` with a
``chains`` axis (independent chains, zero communication — the DP analogue)
and a ``data`` axis (likelihood sharded over the dataset, per-shard
log-likelihoods and their gradients reduced with ``psum`` over ICI — the
data/sequence-parallel analogue of the reference's minibatch Hamiltonian
splitting, samplers.py:1203-1258, but exact rather than approximate).

Everything is ``shard_map`` over the mesh: each device runs its local
chains against its local data shard; the only collective in the hot loop is
one scalar psum per potential evaluation (plus the psum of the gradient
that AD inserts), riding ICI.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.mass import make_mass
from ..ops.potential import resolve_potential
from ..samplers.driver import MCMCConfig, MCMCResult
from ..samplers.hmc import _run_hmc_jit


def make_mesh(chains: int = 1, data: int = 1, devices=None) -> Mesh:
    """Build a (chains, data) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if chains * data != len(devices):
        raise ValueError(
            f"mesh {chains}x{data} needs {chains * data} devices, have {len(devices)}"
        )
    import numpy as np

    return Mesh(np.asarray(devices).reshape(chains, data), ("chains", "data"))


def sample_chains_sharded(
    key,
    loglik_shard_fn: Callable,
    log_prior_fn: Callable,
    x,
    y,
    theta0,
    config: MCMCConfig,
    mesh: Mesh,
    num_chains: int,
    inv_mass=None,
) -> MCMCResult:
    """HMC chains sharded over ``mesh``'s 'chains' axis with the likelihood
    sharded over its 'data' axis.

    ``loglik_shard_fn(theta, x_shard, y_shard)`` must return the summed
    log-likelihood of its shard; the full potential is
    ``log_prior_fn(theta) + psum_data(loglik_shard_fn(...))`` — exact
    full-batch HMC on datasets larger than one device's memory.

    ``theta0``: (D,) broadcast or (num_chains, D).  num_chains must divide
    by the mesh 'chains' size.
    """
    x, y = jnp.asarray(x), jnp.asarray(y)
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    keys = jax.random.split(key, num_chains)
    mass = make_mass(inv_mass, theta0.shape[-1])
    config = _warn_progress_ignored(config)

    n_chain_shards = mesh.shape["chains"]
    if num_chains % n_chain_shards:
        raise ValueError(f"num_chains={num_chains} not divisible by mesh chains={n_chain_shards}")

    def local(keys_l, thetas_l, x_shard, y_shard):
        log_prob = make_psum_log_prob(
            loglik_shard_fn, log_prior_fn, x_shard, y_shard
        )

        return jax.vmap(
            lambda k, t: _run_hmc_jit(k, t, log_prob, config, mass)
        )(keys_l, thetas_l)

    # Output structure for out_specs: shapes don't depend on the potential,
    # so eval_shape a collective-free stand-in (psum can't run outside the
    # mesh context that shard_map provides).
    local_chains = num_chains // n_chain_shards
    out_specs = _leading_axis_specs(
        jax.eval_shape(
            lambda k, t: jax.vmap(
                lambda kk, tt: _run_hmc_jit(kk, tt, log_prior_fn, config, mass)
            )(k, t),
            keys[:local_chains],
            theta0[:local_chains],
        ),
        "chains",
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("chains"), P("chains", None), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, theta0, x, y)


def make_psum_log_prob(loglik_shard_fn, log_prior_fn, x_shard, y_shard,
                       axis_name="data"):
    """Exact data-sharded potential for use INSIDE shard_map.

    The naive ``psum(loglik(theta, shard))`` has the WRONG gradient under
    shard_map AD: psum's transpose re-psums the cotangent, yielding
    n_devices * local_grad instead of the replicated total gradient.  Pair
    value and gradient explicitly: one fused local value_and_grad followed
    by one psum of each — the only collectives in the hot loop."""

    @jax.custom_vjp
    def summed_ll(theta):
        return jax.lax.psum(loglik_shard_fn(theta, x_shard, y_shard), axis_name)

    def summed_ll_fwd(theta):
        val, grad = jax.value_and_grad(
            lambda t: loglik_shard_fn(t, x_shard, y_shard)
        )(theta)
        return jax.lax.psum(val, axis_name), jax.lax.psum(grad, axis_name)

    def summed_ll_bwd(grad_total, ct):
        return (ct * grad_total,)

    summed_ll.defvjp(summed_ll_fwd, summed_ll_bwd)

    def log_prob(theta):
        return log_prior_fn(theta) + summed_ll(theta)

    return log_prob


def _leading_axis_specs(shape_tree, axes):
    """Every output leaf is vmapped over chains: shard its leading axis."""
    return jax.tree_util.tree_map(
        lambda s: P(*((axes,) + (None,) * (len(s.shape) - 1))), shape_tree
    )


def _warn_progress_ignored(config):
    """In-scan progress callbacks under shard_map would fire once PER
    DEVICE; the sharded runners say so once and run silent instead.
    Returns the config with ``progress_every`` stripped (unchanged when
    the field is absent or zero)."""
    if getattr(config, "progress_every", 0):
        import dataclasses
        import sys

        print(
            "[hamiltorch_tpu] progress_every is ignored under shard_map "
            "(the in-scan callback would fire once per device); the "
            "sharded run proceeds without a progress bar.",
            file=sys.stderr,
        )
        config = dataclasses.replace(config, progress_every=0)
    return config


def mesh_chain_layout(mesh: Mesh, num_chains: int):
    """(axes, axis_name) for sharding a chain ensemble over the WHOLE mesh;
    validates that the ensemble divides the device count."""
    n_dev = len(mesh.devices.flatten())
    if num_chains % n_dev:
        raise ValueError(f"num_chains={num_chains} not divisible by {n_dev} devices")
    axes = tuple(mesh.axis_names)
    return axes, (axes if len(axes) > 1 else axes[0])


def derive_chain_keys(key, num_chains: int):
    """Per-chain key derivation shared by every sharded ensemble sampler AND
    its checkpointed counterpart — recomputable from a persisted base key,
    so any chunking reproduces the identical stream."""
    return jax.random.split(jax.random.fold_in(key, 0x5EED), num_chains)


def nuts_ensemble_carry_specs(axes, warm_template, theta_template=None):
    """shard_map partition specs for the pooled-ensemble-NUTS scan carry
    (thetas, logps, grads, da, wf, metric, da_t): per-chain leaves shard,
    pooled adaptation products replicate.  ``theta_template``: a PYTREE
    chain state's local (C, ...) leaves (flat (C, D) when None)."""
    from ..samplers.adaptation import DualAveragingState

    rep = lambda t: jax.tree_util.tree_map(lambda _: P(), t)
    wf0, metric0, _ = warm_template
    th_spec = (
        P(axes, None) if theta_template is None
        else _chain_leaf_specs(axes, theta_template)
    )
    return (
        th_spec, P(axes), th_spec,
        DualAveragingState(P(), P(), P(), P()),
        rep(wf0), rep(metric0), P(),
    )


def nuts_ensemble_result_specs(axes, warm_template, theta_template=None):
    """shard_map partition specs for _run_nuts_ensemble_jit's
    (MCMCResult, NUTSInfo): samples chain-major, stats/info time-major,
    pooled adaptation state replicated."""
    from ..samplers.adaptation import DualAveragingState
    from ..samplers.driver import ChainState, MCMCStats
    from ..samplers.nuts import NUTSInfo

    tm = P(None, axes)  # time-major (N, C) stat block
    th_spec = (
        P(axes, None) if theta_template is None
        else _chain_leaf_specs(axes, theta_template)
    )
    return (
        MCMCResult(
            samples=(
                P(axes, None, None) if theta_template is None
                else _chain_leaf_specs(axes, theta_template, extra_leading=1)
            ),
            stats=MCMCStats(*(tm,) * len(MCMCStats._fields)),
            final_step_size=P(),
            acc_rate=P(),
            final_state=ChainState(th_spec, P(axes), th_spec),
            final_da=DualAveragingState(P(), P(), P(), P()),
            final_warm=jax.tree_util.tree_map(lambda _: P(), warm_template),
        ),
        NUTSInfo(*(tm,) * len(NUTSInfo._fields)),
    )


def _chain_leaf_specs(axes, template, extra_leading: int = 0):
    """Per-leaf P(axes, None, ...) specs for a tree of (C, ...) leaves;
    ``extra_leading`` inserts replicated axes after the chain axis (the
    samples trace adds a time axis at position 1)."""
    return jax.tree_util.tree_map(
        lambda l: P(axes, *(None,) * (l.ndim - 1 + extra_leading)), template
    )


def chees_carry_specs(axes, dense: bool = False, theta_template=None):
    """shard_map partition specs for a ChEESCarry whose chain axis spans
    ``axes`` (pooled-adaptation products are replicated).  ``dense``: the
    carry holds the (inv_mass, chol_mass) dense-metric pair instead of an
    inverse-mass diagonal (adapt_mass='dense').  ``theta_template``: a
    PYTREE chain state's local (C, ...) leaves — thetas/grads specs go
    per-leaf (flat (C, D) layout when None)."""
    from ..samplers.adaptation import DualAveragingState
    from ..samplers.chees import ChEESCarry

    th_spec = (
        P(axes, None) if theta_template is None
        else _chain_leaf_specs(axes, theta_template)
    )
    return ChEESCarry(
        thetas=th_spec, logps=P(axes), grads=th_spec,
        da=DualAveragingState(P(), P(), P(), P()),
        log_t=P(), adam_m=P(), adam_v=P(),
        wf_count=P(), wf_mean=P(), wf_m2=P(),
        metric=(P(), P()) if dense else P(), da_t=P(),
    )


def chees_result_specs(axes, dense: bool = False, theta_template=None):
    """shard_map partition specs for _run_chees_jit's ChEESResult: samples
    chain-major, info time-major, shared adaptation state replicated."""
    from ..samplers.chees import ChEESInfo, ChEESResult

    return ChEESResult(
        samples=(
            P(axes, None, None) if theta_template is None
            else _chain_leaf_specs(axes, theta_template, extra_leading=1)
        ),
        info=ChEESInfo(
            accept_prob=P(None, axes),
            trajectory_length=P(),
            num_leapfrog=P(),
            step_size=P(),
            divergent=P(None, axes),
        ),
        final_step_size=P(),
        final_trajectory_length=P(),
        final_carry=chees_carry_specs(axes, dense=dense,
                                      theta_template=theta_template),
    )


def run_nuts_chains_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # NUTSConfig
    mesh: Mesh,
    num_chains: int,
    inv_mass=None,
    theta0_is_stacked: bool | None = None,
):
    """Tree-NUTS chains sharded over the whole mesh (no communication).

    Returns (MCMCResult, NUTSInfo) with a leading chain axis.  NOTE: within
    each device's lane batch, chains wait for the deepest tree per draw —
    for large ensembles prefer run_chees, whose trajectory length is shared
    by construction.
    """
    from ..samplers.nuts import _run_nuts_jit, _tree_nuts_mass, validate_nuts_mass
    from ..utils.pytree import is_param_tree

    tmap = jax.tree_util.tree_map
    if is_param_tree(theta0):
        # pytree chains over the mesh: leaves shard along their chain axis
        from ..utils.pytree import stack_param_tree

        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        mass = _tree_nuts_mass(inv_mass, template, config)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        mass = make_mass(inv_mass, theta0.shape[-1])
        validate_nuts_mass(config, mass)
    keys = jax.random.split(key, num_chains)
    config = _warn_progress_ignored(config)
    n_dev = len(mesh.devices.flatten())
    if num_chains % n_dev:
        raise ValueError(f"num_chains={num_chains} not divisible by {n_dev} devices")
    axes = tuple(mesh.axis_names)

    def local(keys_l, thetas_l):
        return jax.vmap(
            lambda k, t: _run_nuts_jit(k, t, log_prob_fn, config, mass)
        )(keys_l, thetas_l)

    local_chains = num_chains // n_dev
    theta_local = tmap(lambda l: l[:local_chains], theta0)
    out_specs = _leading_axis_specs(
        jax.eval_shape(local, keys[:local_chains], theta_local), axes
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), _chain_leaf_specs(axes, theta0)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, theta0)


def sample_nuts_chains_sharded(
    key,
    loglik_shard_fn: Callable,
    log_prior_fn: Callable,
    x,
    y,
    theta0,
    config,  # NUTSConfig
    mesh: Mesh,
    num_chains: int,
    inv_mass=None,
):
    """Tree-NUTS chains over BOTH mesh axes: chains sharded over 'chains',
    the likelihood sharded over 'data' with psum-reduced value/gradient
    (the custom_vjp pairing of sample_chains_sharded) — exact full-batch
    NUTS on datasets larger than one device's memory.

    Returns (MCMCResult, NUTSInfo) with a leading chain axis.
    """
    from ..samplers.nuts import _run_nuts_jit, validate_nuts_mass

    x, y = jnp.asarray(x), jnp.asarray(y)
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    keys = jax.random.split(key, num_chains)
    mass = make_mass(inv_mass, theta0.shape[-1])
    validate_nuts_mass(config, mass)
    config = _warn_progress_ignored(config)
    n_chain_shards = mesh.shape["chains"]
    if num_chains % n_chain_shards:
        raise ValueError(
            f"num_chains={num_chains} not divisible by mesh chains={n_chain_shards}"
        )

    def local(keys_l, thetas_l, x_shard, y_shard):
        log_prob = make_psum_log_prob(
            loglik_shard_fn, log_prior_fn, x_shard, y_shard
        )

        return jax.vmap(
            lambda k, t: _run_nuts_jit(k, t, log_prob, config, mass)
        )(keys_l, thetas_l)

    local_chains = num_chains // n_chain_shards
    out_specs = _leading_axis_specs(
        jax.eval_shape(
            lambda k, t: jax.vmap(
                lambda kk, tt: _run_nuts_jit(kk, tt, log_prior_fn, config, mass)
            )(k, t),
            keys[:local_chains],
            theta0[:local_chains],
        ),
        "chains",
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("chains"), P("chains", None), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, theta0, x, y)


def run_rmhmc_chains_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # MCMCConfig
    mesh: Mesh,
    num_chains: int,
    **rmhmc_kwargs,
):
    """Independent RMHMC chains sharded over the whole mesh.

    No communication — each device runs its lane batch of generalized/
    explicit-leapfrog chains (within a batch, lanes wait for the slowest
    fixed point per step, as in ``run_rmhmc_chains``).  ``rmhmc_kwargs``
    are ``run_rmhmc_chains``'s sampler options (integrator, metric,
    jitter, softabs_const, fixed_point_*, ham_func, custom_metric).
    Returns an MCMCResult with a leading chain axis.
    """
    from ..samplers.rmhmc import _run_rmhmc_jit, resolve_rmhmc_options

    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    n_dev = len(mesh.devices.flatten())
    if num_chains % n_dev:
        raise ValueError(f"num_chains={num_chains} not divisible by {n_dev} devices")
    axes = tuple(mesh.axis_names)
    local_chains = num_chains // n_dev
    integrator, opts, ham_func, custom_metric = resolve_rmhmc_options(rmhmc_kwargs)
    config = _warn_progress_ignored(config)
    lp, data = resolve_potential(log_prob_fn, None)
    # one key per chain, derived exactly as run_rmhmc_chains derives them,
    # so the sharded run reproduces the vmapped run's stream
    keys = jax.random.split(key, num_chains)

    def local(keys_l, thetas_l, data_l):
        return jax.vmap(
            lambda k, t: _run_rmhmc_jit(
                k, t, lp, config, integrator, opts, ham_func, custom_metric,
                data=data_l,
            )
        )(keys_l, thetas_l)

    out_specs = _leading_axis_specs(
        jax.eval_shape(local, keys[:local_chains], theta0[:local_chains], data),
        axes,
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(axes, None), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, theta0, data)


def run_nuts_ensemble_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # NUTSConfig
    mesh: Mesh,
    num_chains: int,
    inv_mass=None,
    theta0_is_stacked: bool | None = None,
):
    """Ensemble NUTS with POOLED adaptation sharded over the whole mesh.

    A communicating sampler, unlike ``run_nuts_chains_sharded``: the shared
    dual-averaging statistic (ensemble-mean leaf acceptance) and the pooled
    Welford mass estimate (diagonal or dense) psum across the mesh each
    draw, so C chains spread over N chips still warm up ~C-fold faster
    than per-chain adaptation.  Returns (MCMCResult, NUTSInfo) in
    ``run_nuts_ensemble``'s layout: ``samples`` chain-major (C, N, D),
    stats/info TIME-major (N, C).
    """
    from ..samplers.nuts import (
        _run_nuts_ensemble_jit,
        _tree_nuts_mass,
        init_metric_seed,
        validate_nuts_mass,
    )
    from ..utils.pytree import is_param_tree

    tmap = jax.tree_util.tree_map
    n_dev = len(mesh.devices.flatten())
    if is_param_tree(theta0):
        # pytree ensemble over the mesh: leaves shard along their chain
        # axis; the pooled statistics (mean acceptance, flat-bridged
        # Welford merge) psum across devices exactly as in the flat layout
        from ..utils.pytree import stack_param_tree

        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        mass = _tree_nuts_mass(inv_mass, template, config)
        seed_mass = mass.inner
        d = sum(int(l.size) for l in jax.tree_util.tree_leaves(template))
        dtype = jax.tree_util.tree_leaves(theta0)[0].dtype
        local_template = tmap(
            lambda l: jnp.zeros((num_chains // max(n_dev, 1),) + l.shape,
                                l.dtype),
            template,
        )
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        d = theta0.shape[-1]
        mass = make_mass(inv_mass, d)
        seed_mass = mass
        dtype = theta0.dtype
        validate_nuts_mass(config, mass)
        local_template = None
    lp, data = resolve_potential(log_prob_fn, None)
    config = _warn_progress_ignored(config)
    axes, axis_name = mesh_chain_layout(mesh, num_chains)
    chain_keys = derive_chain_keys(key, num_chains)

    def local(base_key, keys_l, thetas_l, data_l):
        return _run_nuts_ensemble_jit(
            base_key, thetas_l, lp, config, mass, data=data_l,
            chain_keys=keys_l, axis_name=axis_name,
        )

    # pooled adaptation makes every adaptation product replicated; only the
    # per-chain leaves (samples, per-draw stats, final chain state) shard
    dense = bool(config.adapt_mass) and config.burn > 0 \
        and config.adapt_mass == "dense"
    wf0, metric0 = init_metric_seed(seed_mass, d, dtype, dense)
    warm_template = (wf0, metric0, jnp.zeros((), jnp.int32))
    theta_in_specs = (
        P(axes, None) if local_template is None
        else _chain_leaf_specs(axes, theta0)
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axes), theta_in_specs, P()),
        out_specs=nuts_ensemble_result_specs(
            axes, warm_template, theta_template=local_template
        ),
        check_vma=False,
    )
    return jax.jit(shard)(key, chain_keys, theta0, data)


def run_chees_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # ChEESConfig
    mesh: Mesh,
    num_chains: int,
    inv_mass=None,
    theta0_is_stacked: bool | None = None,
):
    """ChEES-HMC with the chain ensemble sharded over the WHOLE mesh.

    Unlike independent-chain sharding this is a genuinely communicating
    sampler: the cross-chain criterion (ensemble mean, acceptance-weighted
    trajectory gradient, mean acceptance for dual averaging, and the
    windowed Welford mass estimate) is psum-reduced across the mesh each
    draw — a handful of scalar/(D,) collectives riding ICI per transition.
    Matches single-device ``run_chees`` semantics; the random stream differs
    (per-chain randomness derives from sharded per-chain keys).
    """
    from ..ops.mass import BlockDiagMass, DenseMass, make_mass_tree
    from ..samplers.chees import _run_chees_jit, validate_chees
    from ..utils.pytree import is_param_tree

    tmap = jax.tree_util.tree_map
    if is_param_tree(theta0):
        # pytree ensemble over the mesh: leaves shard along their chain
        # axis; the pooled statistics still psum (the flat Welford bridge
        # runs per shard on the local chains, merged by gsum)
        from ..utils.pytree import stack_param_tree

        stacked = theta0_is_stacked
        if stacked is None:
            stacked = all(
                l.shape[:1] == (num_chains,)
                for l in jax.tree_util.tree_leaves(theta0)
            )
        if stacked:
            template, theta0 = stack_param_tree(theta0, num_chains, stacked=True)
        else:  # spread a single state (the key is consumed only here)
            k_init, key = jax.random.split(key)
            template, theta0 = stack_param_tree(
                theta0, num_chains, key=k_init, noise=0.01, stacked=False
            )
        from ..ops.mass import make_diag_mass_tree

        mass = make_diag_mass_tree(
            inv_mass, template, "ChEES ensembles",
            dense_requested=config.adapt_mass == "dense",
        )
        validate_chees(config, mass.inner)
        n_dev = len(mesh.devices.flatten())
        local_template = tmap(
            lambda l: jnp.zeros((num_chains // max(n_dev, 1),) + l.shape,
                                l.dtype),
            template,
        )
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            k_init, key = jax.random.split(key)
            # small spread so the ensemble mean/criterion stay informative
            theta0 = theta0[None, :] + 0.01 * jax.random.normal(
                k_init, (num_chains, theta0.shape[0]), theta0.dtype
            )
        mass = make_mass(inv_mass, theta0.shape[-1])
        validate_chees(config, mass)
        local_template = None
    lp, data = resolve_potential(log_prob_fn, None)
    config = _warn_progress_ignored(config)
    axes, axis_name = mesh_chain_layout(mesh, num_chains)
    chain_keys = derive_chain_keys(key, num_chains)

    def local(base_key, keys_l, thetas_l, data_l):
        return _run_chees_jit(
            base_key, thetas_l, lp, config, mass, data=data_l,
            chain_keys=keys_l, axis_name=axis_name,
        )

    theta_in_specs = (
        P(axes, None) if local_template is None
        else _chain_leaf_specs(axes, theta0)
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axes), theta_in_specs, P()),
        out_specs=chees_result_specs(
            axes,
            dense=bool(config.adapt_mass == "dense" and config.burn > 0),
            theta_template=local_template,
        ),
        check_vma=False,
    )
    return jax.jit(shard)(key, chain_keys, theta0, data)


def sample_nuts_ensemble_sharded(
    key,
    loglik_shard_fn: Callable,
    log_prior_fn: Callable,
    x,
    y,
    theta0,
    config,  # NUTSConfig
    mesh: Mesh,
    num_chains: int,
    inv_mass=None,
):
    """Pooled-adaptation ensemble NUTS using BOTH mesh axes: the chain
    ensemble sharded over 'chains' and the likelihood sharded over 'data'.

    Per potential evaluation each device computes its local chains against
    its local data shard (one psum of value+gradient over 'data' via the
    custom_vjp pairing); the shared dual-averaging statistic and pooled
    Welford mass merge psum over 'chains' — the NUTS analogue of
    ``sample_chees_sharded``.  Returns (MCMCResult, NUTSInfo) in
    ``run_nuts_ensemble``'s layout.
    """
    from ..samplers.nuts import (
        _run_nuts_ensemble_jit,
        init_metric_seed,
        validate_nuts_mass,
    )

    x, y = jnp.asarray(x), jnp.asarray(y)
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    d = theta0.shape[-1]
    mass = make_mass(inv_mass, d)
    validate_nuts_mass(config, mass)
    config = _warn_progress_ignored(config)
    n_chain_shards = mesh.shape["chains"]
    if num_chains % n_chain_shards:
        raise ValueError(
            f"num_chains={num_chains} not divisible by mesh chains={n_chain_shards}"
        )
    chain_keys = derive_chain_keys(key, num_chains)

    def local(base_key, keys_l, thetas_l, x_shard, y_shard):
        log_prob = make_psum_log_prob(
            loglik_shard_fn, log_prior_fn, x_shard, y_shard
        )

        return _run_nuts_ensemble_jit(
            base_key, thetas_l, log_prob, config, mass,
            chain_keys=keys_l, axis_name="chains",
        )

    dense = bool(config.adapt_mass) and config.burn > 0 \
        and config.adapt_mass == "dense"
    wf0, metric0 = init_metric_seed(mass, d, theta0.dtype, dense)
    warm_template = (wf0, metric0, jnp.zeros((), jnp.int32))
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("chains"), P("chains", None), P("data"), P("data")),
        out_specs=nuts_ensemble_result_specs("chains", warm_template),
        check_vma=False,
    )
    return jax.jit(shard)(key, chain_keys, theta0, x, y)


def sample_chees_sharded(
    key,
    loglik_shard_fn: Callable,
    log_prior_fn: Callable,
    x,
    y,
    theta0,
    config,  # ChEESConfig
    mesh: Mesh,
    num_chains: int,
    inv_mass=None,
):
    """ChEES-HMC using BOTH mesh axes: the chain ensemble sharded over
    'chains' and the likelihood sharded over 'data'.

    Per potential evaluation each device computes its local chains against
    its local data shard; the per-shard log-lik/gradient psum over 'data'
    and the ChEES cross-chain statistics psum over 'chains' — the two
    collectives of the framework's full scale story in one sampler.
    """
    from ..samplers.chees import _run_chees_jit, validate_chees

    x, y = jnp.asarray(x), jnp.asarray(y)
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        k_init, key = jax.random.split(key)
        theta0 = theta0[None, :] + 0.01 * jax.random.normal(
            k_init, (num_chains, theta0.shape[0]), theta0.dtype
        )
    mass = make_mass(inv_mass, theta0.shape[-1])
    validate_chees(config, mass)
    config = _warn_progress_ignored(config)
    n_chain_shards = mesh.shape["chains"]
    if num_chains % n_chain_shards:
        raise ValueError(
            f"num_chains={num_chains} not divisible by mesh chains={n_chain_shards}"
        )
    chain_keys = derive_chain_keys(key, num_chains)

    def local(base_key, keys_l, thetas_l, x_shard, y_shard):
        log_prob = make_psum_log_prob(
            loglik_shard_fn, log_prior_fn, x_shard, y_shard
        )

        return _run_chees_jit(
            base_key, thetas_l, log_prob, config, mass,
            chain_keys=keys_l, axis_name="chains",
        )

    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("chains"), P("chains", None), P("data"), P("data")),
        out_specs=chees_result_specs(
            "chains", dense=bool(config.adapt_mass == "dense" and config.burn > 0)
        ),
        check_vma=False,
    )
    return jax.jit(shard)(key, chain_keys, theta0, x, y)


def run_hmc_chains_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config: MCMCConfig,
    mesh: Mesh,
    num_chains: int,
    inv_mass=None,
    theta0_is_stacked: bool | None = None,
) -> MCMCResult:
    """Chain-only sharding: replicate the potential, shard chains over the
    whole mesh (both axes flattened).  Zero communication.

    ``theta0`` may be a parameter PYTREE (single state broadcast, or
    (C, ...)-stacked leaves): each leaf shards along its chain axis; the
    out_specs come from eval_shape, so the result structure is
    layout-agnostic.
    """
    from ..ops.mass import make_mass_tree
    from ..samplers.hmc import _reject_tree_adapt_mass
    from ..utils.pytree import is_param_tree

    tmap = jax.tree_util.tree_map
    if is_param_tree(theta0):
        from ..utils.pytree import stack_param_tree

        _reject_tree_adapt_mass(config)
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        mass = make_mass_tree(inv_mass, template)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        mass = make_mass(inv_mass, theta0.shape[-1])
    keys = jax.random.split(key, num_chains)
    config = _warn_progress_ignored(config)

    axes = tuple(mesh.axis_names)

    def local(keys_l, thetas_l):
        return jax.vmap(
            lambda k, t: _run_hmc_jit(k, t, log_prob_fn, config, mass)
        )(keys_l, thetas_l)

    local_chains = num_chains // len(mesh.devices.flatten())
    theta_local = tmap(lambda l: l[:local_chains], theta0)
    out_specs = _leading_axis_specs(
        jax.eval_shape(local, keys[:local_chains], theta_local),
        axes,
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), _chain_leaf_specs(axes, theta0)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, theta0)


def run_pt_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # PTConfig
    mesh: Mesh,
    num_ensembles: int,
    inv_mass=None,
):
    """Independent parallel-tempering ladders sharded over the whole mesh.

    Embarrassingly parallel at the ensemble level (no collectives): each
    device runs its slice of the E ladders, each ladder a K-replica batched
    scan, so the mesh multiplies cold-chain throughput for multimodal
    targets.  Returns a PTResult with a leading ensemble axis, as
    ``run_pt_chains``.  ``theta0`` may be a parameter PYTREE (single state
    broadcast, or (E, K, ...)-stacked leaves; diagonal metrics only) —
    each leaf shards along its leading ensemble axis.
    """
    from ..samplers.tempering import (
        _pt_ensemble_stack,
        _run_pt_jit,
        assemble_pt_ensemble_result,
    )

    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    theta0, mass = _pt_ensemble_stack(theta0, config, num_ensembles, inv_mass)
    lp, data = resolve_potential(log_prob_fn, None)
    config = _warn_progress_ignored(config)
    n_dev = len(mesh.devices.flatten())
    if num_ensembles % n_dev:
        raise ValueError(
            f"num_ensembles={num_ensembles} not divisible by {n_dev} devices"
        )
    keys = jax.random.split(key, num_ensembles)
    axes = tuple(mesh.axis_names)

    def local(keys_l, thetas_l, data_l):
        return jax.vmap(
            lambda k, t: _run_pt_jit(k, t, lp, config, mass, data=data_l)
        )(keys_l, thetas_l)

    local_e = num_ensembles // n_dev
    tmap = jax.tree_util.tree_map
    theta_local = tmap(lambda l: l[:local_e], theta0)
    out_specs = _leading_axis_specs(
        jax.eval_shape(local, keys[:local_e], theta_local, data), axes
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), _chain_leaf_specs(axes, theta0), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    traj, alphas, swaps, carry_f = jax.jit(shard)(keys, theta0, data)
    return assemble_pt_ensemble_result(traj, alphas, swaps, carry_f, config)


def sample_pt_sharded(
    key,
    loglik_shard_fn: Callable,
    log_prior_fn: Callable,
    x,
    y,
    theta0,
    config,  # PTConfig
    mesh: Mesh,
    num_ensembles: int,
    inv_mass=None,
):
    """Parallel-tempering ladders over BOTH mesh axes: ensembles sharded
    over 'chains', the likelihood sharded over 'data'.

    Every replica of every ladder evaluates the EXACT full-batch potential
    ``log_prior + psum_data(loglik_shard)`` (the custom_vjp value/gradient
    pairing of ``make_psum_log_prob``), so replica exchange on datasets
    larger than one device's memory needs no subsampling.  The tempered
    potentials, HMC steps, swaps, and ladder adaptation all run per device
    on its slice of the E ladders; the only collectives are the per-
    evaluation psums over 'data'.  Returns a PTResult with a leading
    ensemble axis, as ``run_pt_chains``.
    """
    from ..samplers.tempering import (
        _run_pt_jit,
        assemble_pt_ensemble_result,
        check_num_temps,
    )

    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    x, y = jnp.asarray(x), jnp.asarray(y)
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(
            theta0, (num_ensembles, config.num_temps) + theta0.shape
        )
    elif theta0.ndim == 2:
        theta0 = jnp.broadcast_to(theta0, (num_ensembles,) + theta0.shape)
    check_num_temps(theta0, config)
    mass = make_mass(inv_mass, theta0.shape[-1])
    config = _warn_progress_ignored(config)
    n_chain_shards = mesh.shape["chains"]
    if num_ensembles % n_chain_shards:
        raise ValueError(
            f"num_ensembles={num_ensembles} not divisible by mesh "
            f"chains={n_chain_shards}"
        )
    keys = jax.random.split(key, num_ensembles)

    def local(keys_l, thetas_l, x_shard, y_shard):
        log_prob = make_psum_log_prob(
            loglik_shard_fn, log_prior_fn, x_shard, y_shard
        )

        return jax.vmap(
            lambda k, t: _run_pt_jit(k, t, log_prob, config, mass)
        )(keys_l, thetas_l)

    local_e = num_ensembles // n_chain_shards
    # collective-free stand-in for out-spec shapes (psum can't run outside
    # the mesh context shard_map provides)
    out_specs = _leading_axis_specs(
        jax.eval_shape(
            lambda k, t: jax.vmap(
                lambda kk, tt: _run_pt_jit(kk, tt, log_prior_fn, config, mass)
            )(k, t),
            keys[:local_e],
            theta0[:local_e],
        ),
        "chains",
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("chains"), P("chains", None, None), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    traj, alphas, swaps, carry_f = jax.jit(shard)(keys, theta0, x, y)
    return assemble_pt_ensemble_result(traj, alphas, swaps, carry_f, config)


def _run_sgmcmc_sharded(jit_fn, key, term_shard_fn, log_prior_fn, num_terms,
                        theta0, config, mesh, num_chains, data, inv_mass,
                        what):
    from ..samplers.sgmcmc import _prep
    from ..utils.pytree import is_param_tree, stack_param_tree

    tmap = jax.tree_util.tree_map
    n_chain_shards = mesh.shape["chains"]
    n_data_shards = mesh.shape["data"]
    if num_chains % n_chain_shards:
        raise ValueError(
            f"{what}: num_chains={num_chains} not divisible by mesh "
            f"chains={n_chain_shards}"
        )
    if data is None:
        raise ValueError(
            f"{what}: data is required (stacked (M, B, ...) term arrays; "
            "the B axis shards over the mesh 'data' axis)"
        )
    data = tmap(jnp.asarray, data)
    for leaf in jax.tree_util.tree_leaves(data):
        if leaf.ndim < 2 or leaf.shape[1] % n_data_shards:
            raise ValueError(
                f"{what}: every data leaf must be (M, B, ...) with B "
                f"divisible by mesh data={n_data_shards}; got {leaf.shape}"
            )
    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(theta0, num_chains)
    else:
        theta0 = jnp.asarray(theta0)
        template = theta0 if theta0.ndim == 1 else theta0[0]
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    _, pre, _ = _prep(key, term_shard_fn, num_terms, template, config,
                      inv_mass, None, what)
    config = _warn_progress_ignored(config) if hasattr(config, "progress_every") else config
    keys = jax.random.split(key, num_chains)

    def local(keys_l, thetas_l, data_l):
        return jax.vmap(
            lambda k, t: jit_fn(k, t, term_shard_fn, num_terms, config, pre,
                                data_l, None, 0, "data", log_prior_fn)
        )(keys_l, thetas_l)

    # psum-free stand-in for output shapes (psum can't trace outside the
    # mesh context shard_map provides); shapes don't depend on the axis.
    local_chains = num_chains // n_chain_shards
    theta_local = tmap(lambda l: l[:local_chains], theta0)
    data_local = tmap(
        lambda l: l[:, : l.shape[1] // n_data_shards], data
    )
    out_specs = _leading_axis_specs(
        jax.eval_shape(
            lambda k, t, d: jax.vmap(
                lambda kk, tt: jit_fn(kk, tt, term_shard_fn, num_terms,
                                      config, pre, d, None, 0, None,
                                      log_prior_fn)
            )(k, t),
            keys[:local_chains], theta_local, data_local,
        ),
        "chains",
    )
    data_specs = tmap(
        lambda l: P(*((None, "data") + (None,) * (l.ndim - 2))), data
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("chains"), _chain_leaf_specs("chains", theta0), data_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, theta0, data)


def run_sgld_sharded(
    key,
    term_shard_fn: Callable,
    log_prior_fn: Callable,
    num_terms: int,
    theta0,
    config,  # SGLDConfig
    mesh: Mesh,
    num_chains: int,
    data,
    inv_mass=None,
):
    """SGLD chains sharded over 'chains' with the minibatch gradient
    data-parallel over 'data'.

    ``term_shard_fn(theta, m, data_shard)`` returns its device's SLICE of
    term m's log-likelihood (data leaves are (M, B, ...) arrays whose B
    axis shards over the mesh); the gradient estimate is ``num_terms *
    psum(grad ll_shard) + grad log_prior`` — the prior enters once,
    locally, NOT through the psum.  Chain keys replicate along 'data', so
    every member of a data-shard group draws the same term index and
    noise: chains stay in lockstep and the result equals the local
    :func:`~..samplers.sgmcmc.run_sgld_chains` run whose term is
    ``ll_full_term + log_prior / num_terms`` (up to f32 summation order).

    One gradient-tree psum per step rides ICI; everything else is local.
    """
    from ..samplers.sgmcmc import _run_sgld_jit

    return _run_sgmcmc_sharded(
        _run_sgld_jit, key, term_shard_fn, log_prior_fn, num_terms, theta0,
        config, mesh, num_chains, data, inv_mass, "run_sgld_sharded"
    )


def run_sghmc_sharded(
    key,
    term_shard_fn: Callable,
    log_prior_fn: Callable,
    num_terms: int,
    theta0,
    config,  # SGHMCConfig
    mesh: Mesh,
    num_chains: int,
    data,
    inv_mass=None,
):
    """SGHMC chains sharded over 'chains' x data-parallel minibatch
    gradients — the same contract as :func:`run_sgld_sharded`."""
    from ..samplers.sgmcmc import _run_sghmc_jit

    return _run_sgmcmc_sharded(
        _run_sghmc_jit, key, term_shard_fn, log_prior_fn, num_terms, theta0,
        config, mesh, num_chains, data, inv_mass, "run_sghmc_sharded"
    )


def run_ti_sharded(
    key,
    log_prior_fn: Callable,
    loglik_shard_fn: Callable,
    x,
    y,
    theta0,
    config,  # TIConfig
    mesh: Mesh,
):
    """Thermodynamic integration with the LIKELIHOOD sharded over 'data'.

    Evidence runs are exactly where data-parallel likelihoods pay: every
    rung's HMC consumes full-dataset gradients, K rungs per draw.  Each
    device runs the IDENTICAL replica ladder (rung coupling — the swaps —
    stays local; RNG and ladder state replicate deterministically), and
    only the per-rung log-likelihood value/gradient pairs psum over the
    'data' axis (``make_psum_log_prob``'s custom_vjp pairing — the naive
    psum has the wrong shard_map transpose).

    ``loglik_shard_fn(theta, x_shard, y_shard)`` returns the device's
    SLICE of the total log likelihood; ``log_prior_fn(theta)`` enters
    once, locally, not through the psum.  Returns the same
    :class:`~..samplers.ti.TIResult` as the local ``run_ti``; matches a
    local run on the gathered data up to f32 summation order.
    """
    from ..samplers.ti import _run_ti_jit, assemble_ti_result, stack_ti_rungs

    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    x, y = jnp.asarray(x), jnp.asarray(y)
    theta0s = stack_ti_rungs(theta0, config)
    n_data_shards = mesh.shape["data"]
    if x.shape[0] % n_data_shards:
        raise ValueError(
            f"data length {x.shape[0]} not divisible by mesh "
            f"data={n_data_shards}"
        )

    def local(key_l, thetas_l, x_shard, y_shard):
        # zero prior -> make_psum_log_prob reduces to the psum-completed
        # total log LIKELIHOOD; the real prior enters inside _run_ti_jit
        lik = make_psum_log_prob(
            loglik_shard_fn, lambda t: 0.0, x_shard, y_shard
        )
        return _run_ti_jit(key_l, thetas_l, log_prior_fn, lik, config)

    theta_specs = jax.tree_util.tree_map(lambda _: P(), theta0s)

    def probe(key_l, thetas_l, x_shard, y_shard):
        # psum-free twin of `local` (a collective cannot trace outside
        # shard_map); output SHAPES are identical, which is all specs need
        lik = lambda t: loglik_shard_fn(t, x_shard, y_shard)
        return _run_ti_jit(key_l, thetas_l, log_prior_fn, lik, config)

    out_shape = jax.eval_shape(
        probe, key, theta0s, x[: x.shape[0] // n_data_shards],
        y[: y.shape[0] // n_data_shards],
    )
    out_specs = jax.tree_util.tree_map(lambda _: P(), out_shape)
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), theta_specs, P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    out = jax.jit(shard)(key, theta0s, x, y)
    return assemble_ti_result(out, config)


def run_csgmcmc_sharded(
    key,
    term_shard_fn: Callable,
    log_prior_fn: Callable,
    num_terms: int,
    theta0,
    config,  # CSGMCMCConfig
    mesh: Mesh,
    num_chains: int,
    data,
    inv_mass=None,
):
    """Cyclical SG-MCMC chains sharded over 'chains' x data-parallel
    minibatch gradients — the same contract as :func:`run_sgld_sharded`
    (one gradient-tree psum per step rides ICI; the prior enters once,
    locally).  The multimodal-BNN use case is exactly where this pays:
    each cycle's hot exploration consumes full minibatch gradients over
    the sharded dataset."""
    from ..samplers.sgmcmc import _csgmcmc_sharded_adapter

    return _run_sgmcmc_sharded(
        _csgmcmc_sharded_adapter, key, term_shard_fn, log_prior_fn,
        num_terms, theta0, config, mesh, num_chains, data, inv_mass,
        "run_csgmcmc_sharded",
    )


def run_svgd_sharded(
    key,
    loglik_shard_fn: Callable,
    log_prior_fn: Callable,
    x,
    y,
    theta0,
    config,  # SVGDConfig
    mesh: Mesh,
    num_particles: int = 100,
):
    """SVGD with the LIKELIHOOD sharded over 'data'.

    The particle ensemble interacts all-to-all through the RBF kernel, so
    particles REPLICATE across the mesh (SVGD updates are deterministic —
    every device computes the identical cloud) and only the expensive part
    shards: each step's ``num_particles`` log-posterior gradients are
    data-parallel, one vmapped value/gradient psum pair over 'data' per
    step riding ICI (``make_psum_log_prob``'s custom_vjp pairing — the
    naive psum has the wrong shard_map transpose).

    ``loglik_shard_fn(theta, x_shard, y_shard)`` returns the device's
    SLICE of the total log likelihood; ``log_prior_fn(theta)`` enters
    once, locally, not through the psum.  Returns the same
    :class:`~..svgd.SVGDResult` as the local :func:`~..svgd.run_svgd`;
    matches a local run on the gathered data up to f32 summation order.
    """
    from jax.flatten_util import ravel_pytree

    from ..svgd import SVGDResult, _run_svgd_jit

    flat0, unravel = ravel_pytree(theta0)
    is_tree = not hasattr(theta0, "ndim")
    x, y = jnp.asarray(x), jnp.asarray(y)
    n_data_shards = mesh.shape["data"]
    if x.shape[0] % n_data_shards:
        raise ValueError(
            f"data length {x.shape[0]} not divisible by mesh "
            f"data={n_data_shards}"
        )
    noise = jax.random.normal(key, (num_particles,) + flat0.shape,
                              flat0.dtype)
    particles = flat0[None, :] + config.init_scale * noise

    def _with_lik(lik):
        if is_tree:
            return lambda v: lik(unravel(v))
        return lik

    def local(particles_l, x_shard, y_shard):
        log_prob = make_psum_log_prob(
            loglik_shard_fn, log_prior_fn, x_shard, y_shard
        )
        return _run_svgd_jit(particles_l, _with_lik(log_prob), config)

    def probe(particles_l, x_shard, y_shard):
        # psum-free twin (a collective cannot trace outside shard_map);
        # output SHAPES are identical, which is all the specs need
        lp = lambda t: log_prior_fn(t) + loglik_shard_fn(t, x_shard, y_shard)
        return _run_svgd_jit(particles_l, _with_lik(lp), config)

    out_shape = jax.eval_shape(
        probe, particles, x[: x.shape[0] // n_data_shards],
        y[: y.shape[0] // n_data_shards],
    )
    out_specs = jax.tree_util.tree_map(lambda _: P(), out_shape)
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    xs, phi_tr, h_tr, rej, aux, last = jax.jit(shard)(particles, x, y)
    out = jax.vmap(unravel)(xs) if is_tree else xs
    return SVGDResult(out, phi_tr, h_tr, rej, aux, last)


def run_mclmc_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # MCLMCConfig
    mesh: Mesh,
    num_chains: int,
    data=None,
    theta0_is_stacked: bool | None = None,
):
    """Independent MCLMC chains sharded over the WHOLE mesh (both axes
    flattened) — zero communication; each chain tunes its own (eps, L).

    MCLMC is the gradient-budget winner per chain, and chains are free at
    the mesh level: C chains on N devices give C unadjusted trajectories
    at the wall-clock of C/N.  ``theta0`` may be flat (D,), (C, D)
    stacked, or a parameter PYTREE (single state broadcast or (C, ...)
    leaves); pytrees run through the same boundary ravel as the local
    :func:`~..samplers.mclmc.run_mclmc_chains` and samples keep leaf
    shapes.  Matches the local run on the same chain keys up to f32
    rounding (shard_map and plain vmap compile different XLA programs;
    the isokinetic dynamics amplify the ~1-ulp fusion differences).
    """
    from jax.flatten_util import ravel_pytree

    from ..samplers.mclmc import _prep_flat, _run_mclmc_jit, _seed_scales
    from ..utils.pytree import is_param_tree, stack_param_tree

    tmap = jax.tree_util.tree_map
    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, template, None)
        theta0 = jax.vmap(lambda t: ravel_pytree(t)[0])(theta0)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0[0], None)
    if data is None:
        data = data_r
    keys = jax.random.split(key, num_chains)
    eps0, length0 = _seed_scales(config, theta0.shape[1])

    axes = tuple(mesh.axis_names)
    n_dev = len(mesh.devices.flatten())
    if num_chains % n_dev:
        raise ValueError(
            f"num_chains={num_chains} not divisible by {n_dev} devices"
        )

    def local(keys_l, thetas_l, data_l):
        return jax.vmap(
            lambda k, t: _run_mclmc_jit(k, t, eps0, length0, fn, config,
                                        data=data_l)
        )(keys_l, thetas_l)

    local_chains = num_chains // n_dev
    out_specs = _leading_axis_specs(
        jax.eval_shape(local, keys[:local_chains], theta0[:local_chains],
                       data),
        axes,
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(axes, None), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    r = jax.jit(shard)(keys, theta0, data)
    if unravel is not None:
        r = r._replace(
            samples=jax.vmap(jax.vmap(unravel))(r.samples),
            final_theta=jax.vmap(unravel)(r.final_theta),
        )
    return r


def sample_mclmc_sharded(
    key,
    loglik_shard_fn: Callable,
    log_prior_fn: Callable,
    x,
    y,
    theta0,
    config,  # MCLMCConfig
    mesh: Mesh,
    num_chains: int,
):
    """MCLMC chains over 'chains' with the likelihood sharded over 'data'.

    The natural BNN fit: MCLMC consumes one FULL-dataset gradient per
    step (it is unadjusted but not stochastic-gradient), so datasets
    larger than one device's memory shard over 'data' and each step's
    gradient completes with one value/grad psum pair over ICI
    (``make_psum_log_prob``'s custom_vjp pairing — the naive psum has the
    wrong shard_map transpose).  Chain keys replicate along 'data', so
    every member of a data-shard group runs the identical trajectory.

    ``loglik_shard_fn(theta, x_shard, y_shard)`` returns its device's
    SLICE of the summed log likelihood; ``log_prior_fn(theta)`` enters
    once, locally.  ``theta0``: flat (D,) broadcast or (num_chains, D).
    Matches a local run on the gathered data up to f32 summation order.
    """
    from ..samplers.mclmc import _run_mclmc_jit, _seed_scales

    x, y = jnp.asarray(x), jnp.asarray(y)
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    keys = jax.random.split(key, num_chains)
    eps0, length0 = _seed_scales(config, theta0.shape[1])
    config = _warn_progress_ignored(config)

    n_chain_shards = mesh.shape["chains"]
    if num_chains % n_chain_shards:
        raise ValueError(
            f"num_chains={num_chains} not divisible by mesh "
            f"chains={n_chain_shards}"
        )
    n_data_shards = mesh.shape["data"]
    if x.shape[0] % n_data_shards:
        raise ValueError(
            f"data length {x.shape[0]} not divisible by mesh "
            f"data={n_data_shards}"
        )

    def local(keys_l, thetas_l, x_shard, y_shard):
        log_prob = make_psum_log_prob(
            loglik_shard_fn, log_prior_fn, x_shard, y_shard
        )
        return jax.vmap(
            lambda k, t: _run_mclmc_jit(k, t, eps0, length0, log_prob,
                                        config)
        )(keys_l, thetas_l)

    def probe(keys_l, thetas_l, x_shard, y_shard):
        # psum-free twin (a collective cannot trace outside shard_map);
        # output SHAPES are identical, which is all the specs need
        lp = lambda t: log_prior_fn(t) + loglik_shard_fn(t, x_shard, y_shard)
        return jax.vmap(
            lambda k, t: _run_mclmc_jit(k, t, eps0, length0, lp, config)
        )(keys_l, thetas_l)

    local_chains = num_chains // n_chain_shards
    out_specs = _leading_axis_specs(
        jax.eval_shape(
            probe, keys[:local_chains], theta0[:local_chains],
            x[: x.shape[0] // n_data_shards],
            y[: y.shape[0] // n_data_shards],
        ),
        "chains",
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("chains"), P("chains", None), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, theta0, x, y)


def run_mams_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # MAMSConfig
    mesh: Mesh,
    num_chains: int,
    data=None,
    theta0_is_stacked: bool | None = None,
):
    """Independent MAMS chains sharded over the WHOLE mesh (both axes
    flattened) — zero communication; each chain dual-averages its own
    step size.  Same layout contract as :func:`run_mclmc_sharded`
    (flat/stacked/pytree ``theta0``; matches the local vmapped run up to
    f32 rounding across the two compiled programs).
    """
    from jax.flatten_util import ravel_pytree

    from ..samplers.mams import _run_mams_jit
    from ..samplers.mclmc import _prep_flat
    from ..utils.pytree import is_param_tree, stack_param_tree

    tmap = jax.tree_util.tree_map
    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, template, None)
        theta0 = jax.vmap(lambda t: ravel_pytree(t)[0])(theta0)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0[0], None)
    if data is None:
        data = data_r
    keys = jax.random.split(key, num_chains)

    axes = tuple(mesh.axis_names)
    n_dev = len(mesh.devices.flatten())
    if num_chains % n_dev:
        raise ValueError(
            f"num_chains={num_chains} not divisible by {n_dev} devices"
        )

    def local(keys_l, thetas_l, data_l):
        return jax.vmap(
            lambda k, t: _run_mams_jit(k, t, fn, config, data=data_l)
        )(keys_l, thetas_l)

    local_chains = num_chains // n_dev
    out_specs = _leading_axis_specs(
        jax.eval_shape(local, keys[:local_chains], theta0[:local_chains],
                       data),
        axes,
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(axes, None), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    r = jax.jit(shard)(keys, theta0, data)
    if unravel is not None:
        r = r._replace(
            samples=jax.vmap(jax.vmap(unravel))(r.samples),
            final_theta=jax.vmap(unravel)(r.final_theta),
        )
    return r


def run_barker_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # BarkerConfig
    mesh: Mesh,
    num_chains: int,
    scale=None,
    data=None,
    theta0_is_stacked: bool | None = None,
):
    """Independent Barker-proposal chains sharded over the WHOLE mesh
    (both axes flattened) — zero communication; each chain dual-averages
    its own step size and (with ``adapt_scale``) learns its own diagonal
    preconditioner.  Same layout contract as :func:`run_mams_sharded`
    (flat/stacked/pytree ``theta0``; ``scale`` may be a scalar, (D,)
    stds, or a per-leaf pytree for pytree states; matches the local
    vmapped run up to f32 rounding across the two compiled programs).
    """
    from jax.flatten_util import ravel_pytree

    from ..samplers.barker import _ravel_scale, _run_barker_jit
    from ..samplers.mclmc import _prep_flat
    from ..utils.pytree import is_param_tree, stack_param_tree

    if is_param_tree(theta0):
        template, theta0 = stack_param_tree(
            theta0, num_chains, stacked=theta0_is_stacked
        )
        scale_f = _ravel_scale(scale, template)
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, template, None)
        theta0 = jax.vmap(lambda t: ravel_pytree(t)[0])(theta0)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        scale_f = 1.0 if scale is None else scale
        _, fn, data_r, unravel = _prep_flat(log_prob_fn, theta0[0], None)
    if data is None:
        data = data_r
    scale_f = jnp.asarray(scale_f, theta0.dtype)
    keys = jax.random.split(key, num_chains)

    axes = tuple(mesh.axis_names)
    n_dev = len(mesh.devices.flatten())
    if num_chains % n_dev:
        raise ValueError(
            f"num_chains={num_chains} not divisible by {n_dev} devices"
        )

    from ..samplers.adaptation import da_init
    from ..samplers.warmup import welford_init

    # operand-not-constant adaptation inits: see samplers.barker.run_barker
    da0 = da_init(config.step_size)
    wf0 = welford_init(theta0.shape[1], theta0.dtype)

    def local(keys_l, thetas_l, scale_l, data_l):
        return jax.vmap(
            lambda k, t: _run_barker_jit(k, t, fn, config, scale_l,
                                         data=data_l, init_da=da0,
                                         init_welford=wf0)
        )(keys_l, thetas_l)

    local_chains = num_chains // n_dev
    out_specs = _leading_axis_specs(
        jax.eval_shape(local, keys[:local_chains], theta0[:local_chains],
                       scale_f, data),
        axes,
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(axes, None), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    r = jax.jit(shard)(keys, theta0, scale_f, data)
    if unravel is not None:
        r = r._replace(
            samples=jax.vmap(jax.vmap(unravel))(r.samples),
            final_theta=jax.vmap(unravel)(r.final_theta),
        )
    return r


def sample_mams_sharded(
    key,
    loglik_shard_fn: Callable,
    log_prior_fn: Callable,
    x,
    y,
    theta0,
    config,  # MAMSConfig
    mesh: Mesh,
    num_chains: int,
):
    """MAMS chains over 'chains' with the likelihood sharded over 'data'
    — the exact microcanonical sampler on datasets larger than one
    device's memory.  Same contract as :func:`sample_mclmc_sharded`:
    every trajectory consumes full-dataset gradients completed by one
    value/grad psum pair per dynamics step
    (``make_psum_log_prob``'s custom_vjp pairing); chain keys replicate
    along 'data' so every member of a data-shard group runs the
    identical trajectory and MH outcome.
    """
    from ..samplers.mams import _run_mams_jit

    x, y = jnp.asarray(x), jnp.asarray(y)
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    keys = jax.random.split(key, num_chains)

    n_chain_shards = mesh.shape["chains"]
    if num_chains % n_chain_shards:
        raise ValueError(
            f"num_chains={num_chains} not divisible by mesh "
            f"chains={n_chain_shards}"
        )
    n_data_shards = mesh.shape["data"]
    if x.shape[0] % n_data_shards:
        raise ValueError(
            f"data length {x.shape[0]} not divisible by mesh "
            f"data={n_data_shards}"
        )

    def local(keys_l, thetas_l, x_shard, y_shard):
        log_prob = make_psum_log_prob(
            loglik_shard_fn, log_prior_fn, x_shard, y_shard
        )
        return jax.vmap(
            lambda k, t: _run_mams_jit(k, t, log_prob, config)
        )(keys_l, thetas_l)

    def probe(keys_l, thetas_l, x_shard, y_shard):
        lp = lambda t: log_prior_fn(t) + loglik_shard_fn(t, x_shard, y_shard)
        return jax.vmap(
            lambda k, t: _run_mams_jit(k, t, lp, config)
        )(keys_l, thetas_l)

    local_chains = num_chains // n_chain_shards
    out_specs = _leading_axis_specs(
        jax.eval_shape(
            probe, keys[:local_chains], theta0[:local_chains],
            x[: x.shape[0] // n_data_shards],
            y[: y.shape[0] // n_data_shards],
        ),
        "chains",
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("chains"), P("chains", None), P("data"), P("data")),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, theta0, x, y)


def run_stretch_sharded(
    key,
    log_prob_fn: Callable,
    theta0,
    config,  # StretchConfig
    mesh: Mesh,
    num_ensembles: int,
    num_walkers: int = 64,
    data=None,
    init_jitter: float = 1e-2,
):
    """Independent stretch-move ensembles sharded over the WHOLE mesh.

    The stretch move is all-to-all WITHIN an ensemble (every proposal
    draws a partner from the complementary half), so the walker cloud
    stays device-local and the mesh multiplies throughput at the
    ensemble level — embarrassingly parallel, zero collectives (the
    same layout as :func:`run_pt_sharded`).  Returns a StretchResult
    with a leading (num_ensembles,) axis; flat theta0 only (a (D,)
    center jittered per ensemble, or a (E, K, D) explicit walker
    block).  Gradient-free: the potential is only ever evaluated.
    """
    from ..ops.potential import resolve_potential
    from ..samplers.stretch import _run_stretch_jit

    if num_walkers < 4 or num_walkers % 2:
        raise ValueError(
            f"num_walkers={num_walkers}; the parallel stretch move needs "
            "an EVEN ensemble of >= 4"
        )
    theta0 = jnp.asarray(theta0)
    keys = jax.random.split(key, num_ensembles)
    if theta0.ndim == 1:
        noise = jax.random.normal(
            jax.random.fold_in(key, 2**32 - 1),
            (num_ensembles, num_walkers) + theta0.shape, theta0.dtype,
        )
        walkers = theta0[None, None, :] + init_jitter * noise
    elif theta0.ndim == 3:
        if theta0.shape[:2] != (num_ensembles, num_walkers):
            raise ValueError(
                f"theta0 {theta0.shape} != (num_ensembles, num_walkers, D)"
            )
        walkers = theta0
    else:
        raise ValueError(
            f"theta0 must be (D,) or (num_ensembles, num_walkers, D); "
            f"got {theta0.shape}"
        )
    fn, data_r = resolve_potential(log_prob_fn, None)
    if data is None:
        data = data_r

    axes = tuple(mesh.axis_names)
    n_dev = len(mesh.devices.flatten())
    if num_ensembles % n_dev:
        raise ValueError(
            f"num_ensembles={num_ensembles} not divisible by {n_dev} devices"
        )

    def local(keys_l, walkers_l, data_l):
        return jax.vmap(
            lambda k, w: _run_stretch_jit(k, w, fn, config, num_walkers,
                                          data=data_l)
        )(keys_l, walkers_l)

    local_e = num_ensembles // n_dev
    out_specs = _leading_axis_specs(
        jax.eval_shape(local, keys[:local_e], walkers[:local_e], data),
        axes,
    )
    shard = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(axes, None, None), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(shard)(keys, walkers, data)
