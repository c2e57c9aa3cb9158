"""Parallel tempering (replica exchange) HMC for multimodal posteriors.

No counterpart in the reference — plain HMC cannot cross deep energy
barriers, so mixtures and other multimodal targets are out of its reach.
The algorithm is multi-chain by construction and maps perfectly onto TPU:
the temperature ladder is just a batch axis (every replica's leapfrog is
the same fused program at a different inverse temperature), and the
replica-exchange phase is a handful of gathers and wheres.

Scheme: K replicas at inverse temperatures beta_k (geometric ladder from 1
down to 1/max_temp) each take one HMC step on the tempered potential
beta_k * logp with step size eps / sqrt(beta_k); then adjacent pairs swap
states with probability min(1, exp((beta_a - beta_b)(logp_b - logp_a))),
alternating even/odd pairings per draw (the deterministic-even-odd scheme,
which mixes the ladder faster than random pair choice).

Ladder adaptation (``adapt_ladder=True``): during burn the interior
temperatures move by a mean-referenced variant of the Vousden, Farr &
Mandel (2016) dynamics — the log gaps S_i = log(T_{i+1} - T_i) follow
dS_i = kappa(n) (A_i - mean(A)) where A_i is an EMA of the swap acceptance
of pair (i, i+1), and the gaps are renormalised each draw so BOTH
endpoints stay pinned (T_0 = 1, T_{K-1} = max_temp; Vousden's original
adjacent-difference form dS_i = kappa (A_i - A_{i+1}) pins only the
bottom).  The fixed point is the same: all adjacent swap rates equal
(uniform replica flow).  The ladder freezes when burn ends; ``burn`` draws
are dropped from the returned samples/stats.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.mass import make_mass
from ..ops.potential import resolve_potential
from .adaptation import DualAveragingState, da_update


@dataclasses.dataclass(frozen=True)
class PTConfig:
    num_samples: int  # total transitions, INCLUDING the first `burn` dropped
    num_steps_per_sample: int = 10
    step_size: float = 0.1
    num_temps: int = 8
    max_temp: float = 30.0
    burn: int = 0  # dropped from returned samples/stats; adaptation window
    adapt_ladder: bool = False  # swap-rate-equalising ladder (see module docstring)
    ladder_t0: float = 10.0  # adaptation-decay offset kappa = t0/(nu(n+t0))
    ladder_nu: float = 1.0
    # per-replica dual averaging of the HMC step size during burn, frozen
    # to the averaged step after (Hoffman & Gelman Algo 5, one state per
    # temperature slot).  Without it replicas step at the fixed
    # eps/sqrt(beta) geometric guess, which can collapse per-replica
    # acceptance on badly scaled targets with nothing to correct it.
    # Seeded from eps/sqrt(beta_k), so a well-scaled target is unchanged.
    adapt_step_size: bool = False
    desired_accept_rate: float = 0.8
    # host progress line every N draws (0 = silent), as the HMC driver's.
    # Vmapped ensembles share ONE bar (the draw index is batch-invariant);
    # sharded runners strip it with a warning (per-device callbacks) and
    # chunked checkpoint programs report per chunk from the host instead.
    progress_every: int = 0

    def __post_init__(self):
        from .driver import validate_common_config

        validate_common_config(self)


class PTInfo(NamedTuple):
    accept_prob: jnp.ndarray  # (N, K) per-replica HMC acceptance
    swap_accept: jnp.ndarray  # (N, K-1) adjacent-pair swap outcomes (bool)
    betas: jnp.ndarray  # (K,) final ladder (adapted when adapt_ladder)
    swap_rate_ema: jnp.ndarray  # (K-1,) final per-pair swap-acceptance EMA
    step_sizes: jnp.ndarray  # (K,) final per-replica steps (adapted when adapt_step_size)


class PTResult(NamedTuple):
    samples: jnp.ndarray  # (N - burn, D) — the cold (beta=1) chain
    replica_samples: jnp.ndarray  # (N - burn, K, D) — full ladder
    info: PTInfo
    final_carry: "PTCarry | None" = None  # resume state (see checkpoint.py)


class PTCarry(NamedTuple):
    """Full resume state of a tempering run (one ladder)."""

    thetas: jnp.ndarray  # (K, D) replica positions
    logps: jnp.ndarray  # (K,) cached UNtempered log-probs
    grads: jnp.ndarray  # (K, D) cached gradients
    s: jnp.ndarray  # (K-1,) log temperature gaps (ladder parameterisation)
    ema: jnp.ndarray  # (K-1,) per-pair swap-acceptance EMA
    # per-replica dual-averaging state ((K,) leaves); step sizes belong to
    # TEMPERATURE SLOTS, not chain states — they do not move on swaps
    da: "DualAveragingState"


def check_num_temps(theta0: jnp.ndarray, config: PTConfig) -> None:
    """A 2-d/3-d theta0's replica axis must agree with config.num_temps —
    otherwise the array shape would silently override the configured ladder."""
    if theta0.ndim >= 2 and theta0.shape[-2] != config.num_temps:
        raise ValueError(
            f"theta0 provides {theta0.shape[-2]} replicas but "
            f"config.num_temps={config.num_temps}; the replica axis sets the "
            "ladder size — make them agree."
        )


# shape-polymorphic helpers (the PT replica stack may be a (K, D) block or
# a parameter pytree with (K, ...) leaves; a bare array is a one-leaf
# pytree, so one tree_map code path serves both — identical XLA on flat)
_tmap = jax.tree_util.tree_map


def _rbcast(v, leaf):
    """(K,) replica vector broadcast against a (K, ...) leaf."""
    return v.reshape((v.shape[0],) + (1,) * (leaf.ndim - 1))


def _r_where(mask, new, old):
    """Per-replica select broadcast over each leaf's parameter dims."""
    return _tmap(lambda n, o: jnp.where(_rbcast(mask, n), n, o), new, old)


def _check_tree_num_temps(theta0s, config: PTConfig) -> None:
    """Tree analogue of :func:`check_num_temps`: a stacked replica tree
    whose leading dim disagrees with config.num_temps would silently run a
    wrong-size ladder (the leaf shape would override the config)."""
    k = jax.tree_util.tree_leaves(theta0s)[0].shape[0]
    if k != config.num_temps:
        raise ValueError(
            f"theta0 provides {k} replicas but config.num_temps="
            f"{config.num_temps}; the replica axis sets the ladder size — "
            "make them agree (theta0_is_stacked=False broadcasts a single "
            "state instead)."
        )


def betas_from_log_gaps(s: jnp.ndarray, max_temp: float) -> jnp.ndarray:
    """Ladder parameterisation: log temperature gaps S_i = log(T_{i+1}-T_i),
    renormalised so T_0 = 1 and T_{K-1} = max_temp stay pinned no matter how
    adaptation moves the interior.  Returns inverse temperatures (K,)."""
    dtype = s.dtype
    g = jnp.exp(s)
    temps = 1.0 + jnp.concatenate(
        [jnp.zeros((1,), dtype), jnp.cumsum(g)]
    ) * ((max_temp - 1.0) / jnp.sum(g))
    return 1.0 / temps


def init_pt_carry(log_prob_fn, theta0s, config: PTConfig) -> PTCarry:
    _l0 = jax.tree_util.tree_leaves(theta0s)[0]
    k_temps, dtype = _l0.shape[0], _l0.dtype
    temps_geo = jnp.exp(
        jnp.linspace(0.0, jnp.log(config.max_temp), k_temps)
    ).astype(dtype)
    logps0, grads0 = jax.vmap(jax.value_and_grad(log_prob_fn))(theta0s)
    # per-replica dual averaging seeded from the geometric eps/sqrt(beta)
    # guess — the fixed schedule's own values, so adaptation starts where
    # the non-adaptive sampler would run
    eps0 = jnp.asarray(config.step_size, dtype) * jnp.sqrt(temps_geo)
    return PTCarry(
        thetas=theta0s,
        logps=logps0,
        grads=grads0,
        s=jnp.log(jnp.diff(temps_geo)),
        ema=jnp.full((k_temps - 1,), 0.5, dtype),
        da=DualAveragingState(
            step_size=eps0,
            log_eps_bar=jnp.zeros((k_temps,), dtype),
            h_t=jnp.zeros((k_temps,), dtype),
            mu=jnp.log(10.0 * eps0),
        ),
    )


@partial(jax.jit, static_argnames=("log_prob_fn", "config"))
def _run_pt_jit(key, theta0s, log_prob_fn, config: PTConfig, mass, data=None,
                init_carry=None, start_iter=0):
    """One compiled tempering scan of ``config.num_samples`` draws.

    ``init_carry``/``start_iter`` let chunked (checkpoint/resume) sampling
    continue the ladder adaptation and RNG stream exactly where a previous
    chunk stopped; the full (unburned) trajectory is returned and burn
    slicing happens in the callers.
    """
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    vg = jax.vmap(jax.value_and_grad(lp))
    _l0 = jax.tree_util.tree_leaves(theta0s)[0]
    k_temps, dtype = _l0.shape[0], _l0.dtype

    # ladder parameterised by log temperature gaps S_i = log(T_{i+1}-T_i),
    # renormalised so T_0 = 1 and T_{K-1} = max_temp stay pinned no matter
    # how adaptation moves the interior — init = geometric ladder
    carry0 = init_carry if init_carry is not None else init_pt_carry(
        lp, theta0s, config
    )

    velocity = jax.vmap(mass.velocity)
    kinetic = jax.vmap(mass.kinetic)

    # even pairs (0,1),(2,3)... and odd pairs (1,2),(3,4)... as partner maps
    idx = jnp.arange(k_temps)
    partner_even = jnp.where(idx % 2 == 0, idx + 1, idx - 1)
    partner_even = jnp.clip(partner_even, 0, k_temps - 1)
    partner_odd = jnp.where(idx % 2 == 1, idx + 1, idx - 1)
    partner_odd = partner_odd.at[0].set(0).at[-1].set(
        k_temps - 1 if k_temps % 2 == 0 else partner_odd[-1]
    )
    partner_odd = jnp.clip(partner_odd, 0, k_temps - 1)

    progress_hook = None
    if config.progress_every > 0:
        from ..utils.progress import scan_progress

        progress_hook = scan_progress(config.num_samples, config.progress_every)

    def step(carry, n):
        thetas, logps, grads, s, ema, da = carry
        if progress_hook is not None:
            progress_hook(n - start_iter)  # bar is sized per-run, not global
        betas = betas_from_log_gaps(s, config.max_temp)
        if config.adapt_step_size:
            eps_k = da.step_size  # per-replica adapted steps
        else:
            eps_k = config.step_size / jnp.sqrt(betas)  # wider steps when hotter
        kn = jax.random.fold_in(key, n)
        k_mom, k_mh, k_swap = jax.random.split(kn, 3)

        # --- one tempered HMC transition per replica (batched) ------------
        ps = jax.vmap(lambda kk: mass.sample(kk, dtype=dtype))(
            jax.random.split(k_mom, k_temps)
        )
        h0 = -betas * logps + kinetic(ps)

        eb = eps_k * betas  # per-replica tempered kick scale
        p = _tmap(
            lambda pl, gl: pl + 0.5 * _rbcast(eb, pl) * gl, ps, grads
        )
        th, lgp, g = thetas, logps, grads

        def leap(i, c):
            th, p, lgp, g = c
            th = _tmap(
                lambda tl, vl: tl + _rbcast(eps_k, tl) * vl, th, velocity(p)
            )
            lgp, g = vg(th)
            p = _tmap(lambda pl, gl: pl + _rbcast(eb, pl) * gl, p, g)
            return (th, p, lgp, g)

        th, p, lgp, g = jax.lax.fori_loop(
            0, config.num_steps_per_sample, leap, (th, p, lgp, g)
        )
        p = _tmap(lambda pl, gl: pl - 0.5 * _rbcast(eb, pl) * gl, p, g)

        h1 = -betas * lgp + kinetic(p)
        log_ratio = h0 - h1
        finite = jnp.isfinite(log_ratio)
        alpha = jnp.where(finite, jnp.exp(jnp.minimum(0.0, log_ratio)), 0.0)
        accept = finite & (
            jnp.log(jax.random.uniform(k_mh, (k_temps,), dtype)) < log_ratio
        )
        thetas = _r_where(accept, th, thetas)
        logps = jnp.where(accept, lgp, logps)
        grads = _r_where(accept, g, grads)

        if config.adapt_step_size and config.burn > 0:
            # per-slot dual averaging on THIS draw's (pre-swap) acceptance;
            # adapt while n < burn, freeze each slot to its averaged step
            # at n == burn, hold after (the HMC driver's schedule)
            da_upd = da_update(
                da, jnp.where(finite, log_ratio, jnp.nan), n,
                desired_accept_rate=config.desired_accept_rate,
            )
            adapting = n < config.burn
            da = DualAveragingState(
                step_size=jnp.where(
                    adapting,
                    da_upd.step_size,
                    jnp.where(n == config.burn, jnp.exp(da.log_eps_bar), da.step_size),
                ),
                log_eps_bar=jnp.where(adapting, da_upd.log_eps_bar, da.log_eps_bar),
                h_t=jnp.where(adapting, da_upd.h_t, da.h_t),
                mu=da.mu,
            )

        # --- replica exchange: alternate even/odd adjacent pairings -------
        partner = jnp.where(n % 2 == 0, partner_even, partner_odd)
        lp_p = logps[partner]
        beta_p = betas[partner]
        log_swap = (betas - beta_p) * (lp_p - logps)
        u = jax.random.uniform(k_swap, (k_temps,), dtype)
        # one uniform per PAIR: both members must use the same draw — take
        # the lower index's
        pair_lo = jnp.minimum(idx, partner)
        u_pair = u[pair_lo]
        do_swap = (partner != idx) & (jnp.log(u_pair) < log_swap)

        src = jnp.where(do_swap, partner, idx)
        thetas = _tmap(lambda l: l[src], thetas)
        logps = logps[src]
        grads = _tmap(lambda l: l[src], grads)

        adj_attempted = partner[:-1] == idx[:-1] + 1
        swap_mask = do_swap[:-1] & adj_attempted

        if config.adapt_ladder and config.burn > 0:
            # mean-referenced Vousden-style log-gap dynamics (see module
            # docstring): each pair's rate vs the ladder average; EMA
            # smooths the per-draw acceptance of the pairs attempted
            alpha_pair = jnp.exp(jnp.minimum(0.0, log_swap[:-1]))
            alpha_pair = jnp.where(jnp.isfinite(alpha_pair), alpha_pair, 0.0)
            ema = jnp.where(adj_attempted, 0.9 * ema + 0.1 * alpha_pair, ema)
            kappa = config.ladder_t0 / (
                config.ladder_nu * (n + 1.0 + config.ladder_t0)
            )
            ds = kappa * (ema - jnp.mean(ema))
            s = jnp.where(n < config.burn, s + ds, s)

        info_row = (alpha, swap_mask)
        return PTCarry(thetas, logps, grads, s, ema, da), (thetas, info_row)

    carry_f, (traj, (alphas, swaps)) = jax.lax.scan(
        step, carry0, start_iter + jnp.arange(config.num_samples)
    )
    return traj, alphas, swaps, carry_f


def run_parallel_tempering(
    key,
    log_prob_fn,
    theta0,
    config: PTConfig,
    inv_mass=None,
    theta0_is_stacked: bool | None = None,
) -> PTResult:
    """Replica-exchange HMC; returns the cold chain plus the full ladder.

    ``config.burn`` draws are dropped from the returned samples/stats (and
    bound the ladder-adaptation window when ``adapt_ladder``)."""
    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    from ..ops.mass import BlockDiagMass, DenseMass, make_mass_tree
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
        # pytree replica stack: single state (broadcast to K replicas) or
        # (K, ...)-stacked leaves; diagonal metrics only (per-leaf
        # inv_mass pytree, flat (D,) diagonal, or None), as in the other
        # pytree sampler entries
        from ..ops.mass import make_diag_mass_tree
        from ..utils.pytree import stack_param_tree

        template, theta0 = stack_param_tree(
            theta0, config.num_temps, stacked=theta0_is_stacked
        )
        _check_tree_num_temps(theta0, config)
        mass = make_diag_mass_tree(inv_mass, template, "parallel tempering")
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (config.num_temps,) + theta0.shape)
        check_num_temps(theta0, config)
        mass = make_mass(inv_mass, theta0.shape[-1])
    lp, data = resolve_potential(log_prob_fn, None)
    traj, alphas, swaps, carry_f = _run_pt_jit(key, theta0, lp, config, mass, data=data)
    return assemble_pt_result(traj, alphas, swaps, carry_f, config)


def assemble_pt_result(traj, alphas, swaps, carry_f: PTCarry,
                       config: PTConfig) -> PTResult:
    """Burn-slice a (possibly chunk-concatenated) trajectory into a PTResult."""
    burn = max(config.burn, 0)
    return PTResult(
        samples=_tmap(lambda l: l[burn:, 0], traj),  # cold (beta=1) chain
        replica_samples=_tmap(lambda l: l[burn:], traj),
        info=PTInfo(
            accept_prob=alphas[burn:],
            swap_accept=swaps[burn:],
            betas=betas_from_log_gaps(carry_f.s, config.max_temp),
            swap_rate_ema=carry_f.ema,
            step_sizes=carry_f.da.step_size,
        ),
        final_carry=carry_f,
    )


def run_pt_chains(
    key,
    log_prob_fn,
    theta0,
    config: PTConfig,
    num_ensembles: int,
    inv_mass=None,
) -> PTResult:
    """``num_ensembles`` independent replica-exchange ladders, vmapped.

    On TPU the ensemble axis is just one more batch dimension: E ladders x
    K replicas run as E*K fused lanes in a single compiled scan.  Multiple
    independent cold chains are what the multimodal convergence diagnostics
    need (split/rank R-hat across E cold chains of a bimodal posterior
    detects a mode a single ladder never visited).

    Returns a PTResult with a leading ensemble axis: ``samples``
    (E, N - burn, D) cold chains, ``replica_samples`` (E, N - burn, K, D),
    per-ensemble info and carries.  ``theta0`` may be a parameter PYTREE —
    a single state broadcasts to every (ensemble, replica) slot; leaves
    already carrying (E, K, ...) axes are taken as per-slot states.
    """
    if config.burn >= config.num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    theta0, mass = _pt_ensemble_stack(theta0, config, num_ensembles, inv_mass)
    lp, data = resolve_potential(log_prob_fn, None)
    keys = jax.random.split(key, num_ensembles)
    traj, alphas, swaps, carry_f = jax.vmap(
        lambda k, t: _run_pt_jit(k, t, lp, config, mass, data=data)
    )(keys, theta0)
    return assemble_pt_ensemble_result(traj, alphas, swaps, carry_f, config)


def _pt_ensemble_stack(theta0, config: PTConfig, num_ensembles: int, inv_mass):
    """(stacked theta0, mass) for an (E, K, ...) PT ensemble entry —
    shared by the vmapped, mesh-sharded, and checkpointed ensemble runners
    so all three agree on layout and metric validation.  Flat theta0 gives
    an (E, K, D) block with any mass form; a pytree theta0 gives
    (E, K, ...) leaves with diagonal metrics only (per-leaf inv_mass
    pytree, flat (D,) diagonal, or None).  Pytree layouts mirror the flat
    1-d/2-d/3-d convention: a single state broadcasts to every (E, K)
    slot, leaves with a leading K axis are per-REPLICA states (the
    run_parallel_tempering layout — only the ensemble axis broadcasts),
    and (E, K, ...) leaves are taken as-is."""
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
        from ..ops.mass import make_diag_mass_tree

        theta0 = _tmap(jnp.asarray, theta0)
        leaves = jax.tree_util.tree_leaves(theta0)
        e, k = num_ensembles, config.num_temps
        if all(l.ndim >= 2 and l.shape[:2] == (e, k) for l in leaves):
            template = _tmap(lambda l: l[0, 0], theta0)
        elif all(l.ndim >= 1 and l.shape[:1] == (k,) for l in leaves):
            # per-replica ladder (the single-ladder runners' stacked
            # layout): broadcast the ENSEMBLE axis only — treating this as
            # a single state would couple all K initial states into every
            # replica slot
            template = _tmap(lambda l: l[0], theta0)
            theta0 = _tmap(
                lambda l: jnp.broadcast_to(l, (e,) + l.shape), theta0
            )
        else:
            template = theta0
            theta0 = _tmap(
                lambda l: jnp.broadcast_to(l, (e, k) + l.shape), template
            )
        _check_tree_num_temps(_tmap(lambda l: l[0], theta0), config)
        mass = make_diag_mass_tree(inv_mass, template, "parallel tempering")
        return theta0, mass
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(
            theta0, (num_ensembles, config.num_temps) + theta0.shape
        )
    elif theta0.ndim == 2:
        theta0 = jnp.broadcast_to(theta0, (num_ensembles,) + theta0.shape)
    check_num_temps(theta0, config)
    return theta0, make_mass(inv_mass, theta0.shape[-1])


def assemble_pt_ensemble_result(traj, alphas, swaps, carry_f: PTCarry,
                                config: PTConfig) -> PTResult:
    """Ensemble-axis variant of :func:`assemble_pt_result`: burn-slice
    (E, N, K, D) trajectories (or trees of (E, N, K, ...) leaves) into a
    PTResult with a leading ensemble axis.  Shared by the vmapped,
    mesh-sharded, and checkpointed ensemble runners."""
    burn = max(config.burn, 0)
    return PTResult(
        samples=_tmap(lambda l: l[:, burn:, 0], traj),
        replica_samples=_tmap(lambda l: l[:, burn:], traj),
        info=PTInfo(
            accept_prob=alphas[:, burn:],
            swap_accept=swaps[:, burn:],
            betas=jax.vmap(
                lambda s: betas_from_log_gaps(s, config.max_temp)
            )(carry_f.s),
            swap_rate_ema=carry_f.ema,
            step_sizes=carry_f.da.step_size,
        ),
        final_carry=carry_f,
    )
