"""True tree-doubling NUTS (multinomial, iterative).

The reference's "HMC_NUTS" adapts only the step size — README.md:9
"currently adapts step-size only"; there is no U-turn criterion or tree
building anywhere in the reference.  This module is the BASELINE.json
north-star extension: dynamic trajectory lengths via the No-U-Turn
criterion (Hoffman & Gelman 2014) with multinomial state selection and
biased progressive sampling (Betancourt 2017, app. A), compiled entirely
to ``lax.while_loop``s so the whole sampler remains one XLA program.

Recursion-free subtree construction: leaves are added left-to-right and
U-turn checks run over every complete dyadic interval.  A start position
``a`` is stored in checkpoint slot ``popcount(a)`` — among starts alive at
the same time the popcounts are strictly increasing (any live ``a2 > a1``
lies inside ``a1``'s longest interval, so its binary extends ``a1``'s), so
``max_tree_depth + 1`` slots suffice and no live entry is overwritten.
This is the iterative scheme of Phan & Pradhan (NumPyro's NUTS); the
implementation here is written from the dyadic-interval invariant above.

Directionality: a backward expansion integrates with step ``-eps``; all
U-turn checks use ``dir * p`` so the criterion is evaluated in physical
time order, and the mass matrix enters through velocities
(theta+ - theta-) . M^{-1} p as in Stan.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.mass import MassOperator, make_mass
from ..ops.potential import make_log_prob, resolve_potential
from .adaptation import DualAveragingState, da_init, da_update
from .driver import MCMCResult, MCMCStats

DIVERGENCE_THRESHOLD = 1000.0

# The NUTS core is SHAPE-POLYMORPHIC: the chain state may be a flat (D,)
# vector (the reference's convention) or a parameter PYTREE with leaves in
# their natural shapes (the pytree-native path — no flat-layout slicing in
# the hot loop; docs/BENCHMARKS.md "Where the time goes").  A bare array is
# itself a one-leaf pytree, so a single tree_map-based code path serves
# both; on flat vectors every operation below lowers to exactly the same
# XLA program as the direct expressions it replaced.

_tmap = jax.tree_util.tree_map


def _t_dot(a, b):
    """Scalar ⟨a, b⟩ over all leaves (== jnp.dot for flat vectors)."""
    parts = [
        jnp.dot(al.ravel(), bl.ravel())
        for al, bl in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    ]
    return parts[0] if len(parts) == 1 else sum(parts)


def _t_where(cond, new, old):
    """Scalar-predicate select applied leafwise."""
    return _tmap(lambda n, o: jnp.where(cond, n, o), new, old)


def _t_any_neq(a, b):
    """True when any leaf element differs (the chain moved)."""
    parts = [
        jnp.any(al != bl)
        for al, bl in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out | p
    return out


def _t_dtype(t):
    return jax.tree_util.tree_leaves(t)[0].dtype


def _kinetic(mass, p):
    """Per-leaf-step kinetic energy: leafwise for TreeMass (no flat concat
    inside the tree-building loop), the operator's own reduction otherwise."""
    from ..ops.mass import TreeMass

    if isinstance(mass, TreeMass):
        return mass.kinetic_leafwise(p)
    return mass.kinetic(p)


@dataclasses.dataclass(frozen=True)
class NUTSConfig:
    num_samples: int
    step_size: float = 0.1
    burn: int = 0
    max_tree_depth: int = 10
    adapt_step_size: bool = True
    desired_accept_rate: float = 0.8
    # Stan-style windowed warmup (samplers/warmup.py): False/True/"diag"
    # estimates a diagonal inverse mass from in-scan Welford variances over
    # doubling slow windows (True == "diag"); "dense" estimates the FULL
    # posterior covariance (regularised toward a small identity) and runs
    # with a dense metric — the right choice for strongly correlated
    # targets, at O(D^2) memory and an O(D^3) factorisation per window.
    adapt_mass: bool | str = False
    # host progress line every N draws (0 = silent), as the HMC driver's
    progress_every: int = 0
    # thin > 1: keep every thin-th draw; num_samples counts TOTAL
    # transitions (must divide by thin).  Kept row b is the chain state
    # after transition (b+1)*thin - 1; per-window infos aggregate as mean
    # accept_prob / any divergent / summed leapfrogs, with the kept draw's
    # energies, depth and step size.  This is the trace lever for long
    # runs: the device->host tunnel is slow (~4 MB/s measured), so a
    # (C, N, D) ensemble trace should shrink on device, not in transit
    # (same rationale as ChEESConfig.thin).
    thin: int = 1
    # store the kept trace in this dtype ("bfloat16" halves the dominant
    # (C, N, D) allocation and the host-offload IO) while the chain itself
    # keeps sampling in its own precision; None = the state dtype.  A
    # storage-precision policy, orthogonal to thinning.
    trace_dtype: str | None = None

    def __post_init__(self):
        from .driver import validate_common_config

        validate_common_config(self)
        if self.thin < 1:
            raise ValueError(f"thin={self.thin}; must be >= 1")
        if self.thin > 1 and self.num_samples % self.thin:
            raise ValueError(
                f"num_samples={self.num_samples} must be divisible by "
                f"thin={self.thin}"
            )
        validate_trace_dtype(self.trace_dtype)


def validate_trace_dtype(trace_dtype) -> None:
    """trace_dtype must be None or a dtype NAME (configs are static jit
    keys, so the field stays a hashable string) that jnp can store."""
    if trace_dtype is None:
        return
    if not isinstance(trace_dtype, str):
        raise ValueError(
            f"trace_dtype={trace_dtype!r}; pass a dtype NAME string (e.g. "
            "'bfloat16') — configs are static jit keys and must stay hashable"
        )
    import numpy as _np

    try:
        jnp.zeros((), trace_dtype)
    except Exception as e:
        raise ValueError(f"trace_dtype={trace_dtype!r} is not a dtype: {e}")
    if not jnp.issubdtype(jnp.zeros((), trace_dtype).dtype, _np.inexact):
        raise ValueError(
            f"trace_dtype={trace_dtype!r}; the sample trace is real-valued "
            "— pass a floating dtype name"
        )


class _End(NamedTuple):
    """One trajectory end: position, momentum, cached potential eval."""

    theta: jnp.ndarray
    p: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _single_step(vg, mass, end: _End, eps) -> _End:
    p_half = _tmap(lambda p, g: p + 0.5 * eps * g, end.p, end.grad)
    theta = _tmap(lambda t, v: t + eps * v, end.theta, mass.velocity(p_half))
    logp, grad = vg(theta)
    p = _tmap(lambda ph, g: ph + 0.5 * eps * g, p_half, grad)
    return _End(theta, p, logp, grad)


def _is_uturn(mass, theta_minus, p_minus, theta_plus, p_plus):
    """True when either end's velocity points back across the span."""
    dtheta = _tmap(lambda tp, tm: tp - tm, theta_plus, theta_minus)
    return (_t_dot(dtheta, mass.velocity(p_minus)) < 0) | (
        _t_dot(dtheta, mass.velocity(p_plus)) < 0
    )


class _Subtree(NamedTuple):
    end: _End  # outgoing edge of the subtree (integration order)
    theta_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    h_prop: jnp.ndarray  # Hamiltonian at the proposed leaf
    log_weight: jnp.ndarray  # logsumexp of H0 - H over leaves
    sum_alpha: jnp.ndarray
    num_alpha: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    num_steps: jnp.ndarray


def _build_subtree(
    key, vg, mass, start: _End, depth, direction, eps, h0, max_depth: int
):
    """Integrate 2^depth leaves from ``start`` in ``direction``.

    ``depth`` is traced; the loop is a while_loop bounded by 2^depth with
    early exit on U-turn/divergence.
    """
    signed_eps = eps * direction
    n_leaves = jnp.int32(1) << depth

    # dyadic-interval checkpoint slabs, one (max_depth+1, ...) slab per
    # state leaf (a flat state is one leaf: the original (max_depth+1, D))
    def slab(leaf):
        return jnp.zeros((max_depth + 1,) + leaf.shape, leaf.dtype)

    ck_theta = _tmap(slab, start.theta)
    ck_p = _tmap(slab, start.p)

    init = _Subtree(
        end=start,
        theta_prop=start.theta,
        logp_prop=start.logp,
        grad_prop=start.grad,
        h_prop=h0,  # overwritten by the first finite leaf (p_take = 1)
        log_weight=-jnp.inf,
        sum_alpha=jnp.zeros(()),
        num_alpha=jnp.zeros((), jnp.int32),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        num_steps=jnp.zeros((), jnp.int32),
    )

    def cond(carry):
        s, tree, _, _, _ = carry
        return (s < n_leaves) & ~tree.turning & ~tree.diverging

    def body(carry):
        s, tree, ck_theta, ck_p, key = carry
        key, k_sel = jax.random.split(key)
        leaf = _single_step(vg, mass, tree.end, signed_eps)
        h = -leaf.logp + _kinetic(mass, leaf.p)
        delta = h0 - h  # log leaf weight
        diverging = ~jnp.isfinite(delta) | (delta < -DIVERGENCE_THRESHOLD)
        delta_safe = jnp.where(diverging, -jnp.inf, delta)

        # progressive multinomial proposal within the subtree
        new_log_w = jnp.logaddexp(tree.log_weight, delta_safe)
        p_take = jnp.exp(delta_safe - new_log_w)  # w_leaf / w_subtree
        take = jax.random.uniform(k_sel, ()) < p_take
        theta_prop = _t_where(take, leaf.theta, tree.theta_prop)
        logp_prop = jnp.where(take, leaf.logp, tree.logp_prop)
        grad_prop = _t_where(take, leaf.grad, tree.grad_prop)
        h_prop = jnp.where(take, h, tree.h_prop)

        alpha = jnp.minimum(1.0, jnp.exp(jnp.where(jnp.isfinite(delta), delta, -jnp.inf)))

        # checkpoint even positions; slot = popcount(s) is collision-free
        slot = _popcount(s)
        is_even = (s & 1) == 0
        ck_theta = _tmap(
            lambda ck, lf: jnp.where(is_even, ck.at[slot].set(lf), ck),
            ck_theta, leaf.theta,
        )
        ck_p = _tmap(
            lambda ck, lf: jnp.where(is_even, ck.at[slot].set(lf), ck),
            ck_p, leaf.p,
        )

        # U-turn over every dyadic interval ending at s: [a, s] with
        # a = s - 2^k + 1 whenever 2^k divides s+1.
        def check_k(k, turning):
            size = jnp.int32(1) << k
            applies = ((s + 1) % size == 0) & (size <= s + 1)
            a = s - size + 1
            slot_a = _popcount(a)
            th_a = _tmap(lambda ck: ck[slot_a], ck_theta)
            p_a = _tmap(lambda ck: ck[slot_a], ck_p)
            turn = _is_uturn(
                mass,
                th_a,
                _tmap(lambda x: direction * x, p_a),
                leaf.theta,
                _tmap(lambda x: direction * x, leaf.p),
            )
            return turning | (applies & turn)

        turning = jax.lax.fori_loop(1, max_depth + 1, check_k, tree.turning)

        tree = _Subtree(
            end=leaf,
            theta_prop=theta_prop,
            logp_prop=logp_prop,
            grad_prop=grad_prop,
            h_prop=h_prop,
            log_weight=new_log_w,
            sum_alpha=tree.sum_alpha + alpha,
            num_alpha=tree.num_alpha + 1,
            turning=turning,
            diverging=diverging,
            num_steps=tree.num_steps + 1,
        )
        return (s + 1, tree, ck_theta, ck_p, key)

    _, tree, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), init, ck_theta, ck_p, key)
    )
    return tree


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray  # mean leaf acceptance statistic (for adaptation)
    divergent: jnp.ndarray
    tree_depth: jnp.ndarray
    num_leapfrogs: jnp.ndarray
    energy: jnp.ndarray  # H at trajectory start (fresh momentum) — E-BFMI series
    step_size: jnp.ndarray
    # H at the state the multinomial selection returned; energy_new - energy
    # is this draw's trajectory energy error (zero only if the chain stayed)
    energy_new: jnp.ndarray


def nuts_transition(vg, mass: MassOperator, max_depth: int):
    """One NUTS draw: (key, (theta, logp, grad), step_size) -> next state."""

    def transition(key, theta, logp, grad, step_size):
        key, k_mom = jax.random.split(key)
        p0 = mass.sample(k_mom, dtype=_t_dtype(theta))
        h0 = -logp + _kinetic(mass, p0)

        left = _End(theta, p0, logp, grad)
        right = left

        class Carry(NamedTuple):
            depth: jnp.ndarray
            left: _End
            right: _End
            theta_prop: jnp.ndarray
            logp_prop: jnp.ndarray
            grad_prop: jnp.ndarray
            h_prop: jnp.ndarray
            log_weight: jnp.ndarray
            sum_alpha: jnp.ndarray
            num_alpha: jnp.ndarray
            num_steps: jnp.ndarray
            turning: jnp.ndarray
            diverging: jnp.ndarray
            key: jax.Array

        init = Carry(
            depth=jnp.zeros((), jnp.int32),
            left=left,
            right=right,
            theta_prop=theta,
            logp_prop=logp,
            grad_prop=grad,
            h_prop=h0,  # staying put has zero trajectory energy error
            log_weight=jnp.zeros(()),  # the initial state has weight exp(0)
            sum_alpha=jnp.zeros(()),
            num_alpha=jnp.zeros((), jnp.int32),
            num_steps=jnp.zeros((), jnp.int32),
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            key=key,
        )

        def cond(c: Carry):
            return (c.depth < max_depth) & ~c.turning & ~c.diverging

        def body(c: Carry):
            key, k_dir, k_sub, k_merge = jax.random.split(c.key, 4)
            go_right = jax.random.bernoulli(k_dir)
            direction = jnp.where(go_right, 1.0, -1.0).astype(_t_dtype(theta))
            start = jax.tree_util.tree_map(
                lambda r, l: jnp.where(go_right, r, l), c.right, c.left
            )
            sub = _build_subtree(
                k_sub, vg, mass, start, c.depth, direction, step_size, h0, max_depth
            )

            invalid = sub.turning | sub.diverging
            # biased progressive merge: take the new subtree's proposal with
            # prob min(1, W_new / W_old) when the subtree is valid
            log_ratio = sub.log_weight - c.log_weight
            take = (~invalid) & (
                jnp.log(jax.random.uniform(k_merge, ())) < log_ratio
            )
            theta_prop = _t_where(take, sub.theta_prop, c.theta_prop)
            logp_prop = jnp.where(take, sub.logp_prop, c.logp_prop)
            grad_prop = _t_where(take, sub.grad_prop, c.grad_prop)
            h_prop = jnp.where(take, sub.h_prop, c.h_prop)
            log_weight = jnp.where(
                invalid, c.log_weight, jnp.logaddexp(c.log_weight, sub.log_weight)
            )

            # advance the chosen end only when the subtree is valid
            def pick(new, old):
                return jnp.where(invalid, old, new)

            new_right = jax.tree_util.tree_map(
                lambda s_, r_: jnp.where(go_right, pick(s_, r_), r_), sub.end, c.right
            )
            new_left = jax.tree_util.tree_map(
                lambda s_, l_: jnp.where(go_right, l_, pick(s_, l_)), sub.end, c.left
            )

            # top-level U-turn across the full trajectory
            top_turn = _is_uturn(
                mass, new_left.theta, new_left.p, new_right.theta, new_right.p
            )

            return Carry(
                depth=c.depth + 1,
                left=new_left,
                right=new_right,
                theta_prop=theta_prop,
                logp_prop=logp_prop,
                grad_prop=grad_prop,
                h_prop=h_prop,
                log_weight=log_weight,
                sum_alpha=c.sum_alpha + sub.sum_alpha,
                num_alpha=c.num_alpha + sub.num_alpha,
                num_steps=c.num_steps + sub.num_steps,
                turning=sub.turning | top_turn,
                diverging=sub.diverging,
                key=key,
            )

        final = jax.lax.while_loop(cond, body, init)

        info = NUTSInfo(
            accept_prob=final.sum_alpha / jnp.maximum(final.num_alpha, 1),
            divergent=final.diverging,
            tree_depth=final.depth,
            num_leapfrogs=final.num_steps,
            energy=h0,
            step_size=step_size,
            energy_new=final.h_prop,
        )
        return final.theta_prop, final.logp_prop, final.grad_prop, info

    return transition


def _aggregate_info_window(infos_w: NUTSInfo) -> NUTSInfo:
    """Collapse a (thin, ...) window of per-draw infos to one kept row."""
    return NUTSInfo(
        accept_prob=jnp.mean(infos_w.accept_prob, axis=0),
        divergent=jnp.any(infos_w.divergent, axis=0),
        tree_depth=infos_w.tree_depth[-1],
        num_leapfrogs=jnp.sum(infos_w.num_leapfrogs, axis=0),
        energy=infos_w.energy[-1],
        step_size=infos_w.step_size[-1],
        energy_new=infos_w.energy_new[-1],
    )


def _nuts_aux_kept(aux_w):
    """Collapse a (thin, ...) window of (info, moved) aux rows to one kept
    row — stats aggregated, moved = any-within-window (tracebuf protocol)."""
    infos_w, moved_w = aux_w
    return _aggregate_info_window(infos_w), jnp.any(moved_w, axis=0)


@partial(jax.jit, static_argnames=("log_prob_fn", "config"))
def _run_nuts_jit(key, theta0, log_prob_fn, config: NUTSConfig, mass,
                  init_state=None, init_da=None, start_iter=0, data=None,
                  init_warm=None, collect_flags=None, end_flags=None):
    # data (when given) reaches the potential as a jit operand, not a baked
    # program constant (the _raw_fn protocol of models/bnn.py)
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    vg = jax.value_and_grad(lp)
    if init_state is not None:
        theta0, logp0, grad0 = init_state
    else:
        logp0, grad0 = vg(theta0)
    da0 = init_da if init_da is not None else da_init(config.step_size, dtype=_t_dtype(theta0))

    from ..ops.mass import DenseMass, DiagMass, TreeMass, tree_ravel
    from ..utils.pytree import is_param_tree
    from .warmup import (
        schedule_flags,
        welford_cov_update,
        welford_update,
        windowed_step,
    )

    # theta0 may be a flat (D,) vector or a parameter PYTREE (the
    # shape-polymorphic core handles both); warmup moments always
    # accumulate in the flat layout, bridged once per draw
    is_tree = is_param_tree(theta0)
    if is_tree:
        _leaves0 = jax.tree_util.tree_leaves(theta0)
        d = sum(int(l.size) for l in _leaves0)
        _tdef = jax.tree_util.tree_structure(theta0)
        _shapes = tuple(tuple(l.shape) for l in _leaves0)
        seed_mass = mass.inner if isinstance(mass, TreeMass) else mass

        def _tree_diag_mass(metric_flat):
            from ..ops.mass import diag_tree_mass_view

            return diag_tree_mass_view(metric_flat, _tdef, _shapes)
    else:
        d = theta0.shape[0]
        seed_mass = mass
    windowed = bool(config.adapt_mass) and config.burn > 0
    dense = windowed and config.adapt_mass == "dense"
    if collect_flags is None:
        if windowed:
            collect_flags, end_flags = schedule_flags(config.burn, 0, config.num_samples)
        else:
            collect_flags = jnp.zeros(config.num_samples, bool)
            end_flags = jnp.zeros(config.num_samples, bool)

    progress_hook = None
    if config.progress_every > 0:
        from ..utils.progress import scan_progress

        progress_hook = scan_progress(config.num_samples, config.progress_every)

    def step(carry, xs):
        n, collect, window_end = xs
        theta, logp, grad, da, wf, metric, da_t = carry
        if progress_hook is not None:
            progress_hook(n - start_iter)  # bar is sized per-run, not global
        if dense:
            cur_mass = DenseMass(inv_mass=metric[0], chol_mass=metric[1])
        elif windowed:
            cur_mass = _tree_diag_mass(metric) if is_tree else DiagMass(inv_diag=metric)
        else:
            cur_mass = mass
        # per-draw key from (base key, global index): chunk-transparent
        sub = jax.random.fold_in(key, n)
        transition = nuts_transition(vg, cur_mass, config.max_tree_depth)
        theta_prev = theta
        theta, logp, grad, info = transition(sub, theta, logp, grad, da.step_size)
        # real per-draw outcome: did the multinomial selection move the chain
        # (NUTS has no MH reject; a synthetic accept bool would be fiction)
        moved = _t_any_neq(theta, theta_prev)

        # requires a warmup phase; with burn <= 0 the freeze at n==burn would
        # clobber step_size with exp(log_eps_bar)=1 on the first draw
        if config.adapt_step_size and config.burn > 0:
            # dual averaging on the mean leaf acceptance statistic
            # windowed warmup restarts dual averaging at each boundary; its
            # iteration counter must restart too (da_update's t^-0.75 weight
            # is negligible at global-n scale, freezing eps_bar near exp(0))
            da_upd = da_update(
                da,
                jnp.log(jnp.maximum(info.accept_prob, 1e-10)),
                da_t if windowed else n,
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

        if windowed:
            theta_flat = tree_ravel(theta) if is_tree else theta
            wf_upd = (welford_cov_update if dense else welford_update)(wf, theta_flat)
            wf, metric, da = windowed_step(
                wf, metric, da, collect, window_end, wf_upd, dense, d,
                _t_dtype(theta),
            )

        da_t = jnp.where(window_end, 0, da_t + 1)
        return (theta, logp, grad, da, wf, metric, da_t), (theta, (info, moved))

    if init_warm is not None:
        wf0, metric0, da_t0 = init_warm
    else:
        wf0, metric0 = init_metric_seed(seed_mass, d, _t_dtype(theta0), dense)
        da_t0 = jnp.zeros((), jnp.int32)
    from .tracebuf import scan_trace

    (
        (theta_f, logp_f, grad_f, da_f, wf_f, metric_f, da_t_f),
        thetas,
        (infos, moved),
    ) = scan_trace(
        step,
        (theta0, logp0, grad0, da0, wf0, metric0, da_t0),
        (start_iter + jnp.arange(config.num_samples), collect_flags, end_flags),
        thin=config.thin, aux_reduce=_nuts_aux_kept, state_like=theta0,
        trace_dtype=config.trace_dtype,
    )
    stats = MCMCStats(
        accept_prob=infos.accept_prob,
        accepted=moved,  # real outcome: the chain moved this draw
        divergent=infos.divergent,
        energy_old=infos.energy,
        energy_new=infos.energy_new,
        step_size=infos.step_size,
        fp_iters=jnp.zeros_like(infos.tree_depth),
        fp_residual=jnp.zeros_like(infos.accept_prob),
    )
    from .driver import ChainState

    return (
        MCMCResult(
            samples=thetas,
            stats=stats,
            final_step_size=da_f.step_size,
            acc_rate=jnp.mean(infos.accept_prob),
            final_state=ChainState(theta_f, logp_f, grad_f),
            final_da=da_f,
            final_warm=(wf_f, metric_f, da_t_f),
        ),
        infos,
    )


def init_metric_seed(mass, d: int, dtype, dense: bool):
    """(wf0, metric0) warmup seed from the user's mass operator.

    Shared by the in-sampler scans and the checkpointed runner — the two
    must agree bit-exactly or a resumed run would adapt from a different
    metric than an uninterrupted one."""
    from ..ops.mass import DiagMass
    from .warmup import welford_cov_init, welford_init

    if dense:
        return welford_cov_init(d, dtype), init_dense_metric(mass, d, dtype)
    if isinstance(mass, DiagMass):
        return welford_init(d, dtype), jnp.asarray(mass.inv_diag, dtype)
    return welford_init(d, dtype), jnp.ones((d,), dtype)


def init_dense_metric(mass, d: int, dtype):
    """(inv_cov, chol_mass) seed for dense windowed warmup, from the user's
    mass operator: dense -> as given; diagonal -> diag embedding; identity
    -> (I, I)."""
    from ..ops.mass import DenseMass, DiagMass

    if isinstance(mass, DenseMass):
        return (
            jnp.asarray(mass.inv_mass, dtype),
            jnp.asarray(mass.chol_mass, dtype),
        )
    if isinstance(mass, DiagMass):
        inv_diag = jnp.asarray(mass.inv_diag, dtype)
        return jnp.diag(inv_diag), jnp.diag(jax.lax.rsqrt(inv_diag))
    eye = jnp.eye(d, dtype=dtype)
    return eye, eye


def _tree_nuts_mass(inv_mass, template, config: NUTSConfig):
    """Validated TreeMass for a pytree NUTS entry (diagonal metrics only;
    the shared pytree-entry contract lives in ops.mass.make_diag_mass_tree)."""
    from ..ops.mass import make_diag_mass_tree

    mass = make_diag_mass_tree(
        inv_mass, template, "NUTS",
        dense_requested=config.adapt_mass == "dense",
    )
    validate_nuts_mass(config, mass.inner)
    return mass


def _stack_tree_chains(key, theta0, num_chains, stacked):
    """(template, stacked_tree): broadcast a single pytree state to
    ``num_chains`` leading-axis copies unless its leaves already carry a
    chain axis (``stacked`` overrides the auto-detection)."""
    from ..utils.pytree import stack_param_tree

    return stack_param_tree(theta0, num_chains, stacked=stacked)


def run_nuts(
    key,
    log_prob_fn: Callable[[jnp.ndarray], jnp.ndarray],
    theta0,
    config: NUTSConfig,
    inv_mass=None,
    pass_grad=None,
):
    """Sample with tree-doubling NUTS.  Returns (MCMCResult, NUTSInfo).

    ``config.adapt_mass`` enables Stan-style windowed warmup: the diagonal
    inverse mass is estimated in-scan from Welford variance statistics over
    doubling slow windows, with dual averaging restarted at each window
    boundary (samplers/warmup.py).

    ``theta0`` may be a flat (D,) vector or a parameter PYTREE.  With a
    pytree the tree-building loop updates leaves in their natural shapes
    (no flat-layout slicing tax; ``samples`` is a tree of (N, ...) leaves)
    and ``inv_mass`` may be None, a flat (D,) diagonal, or a matching
    per-leaf pytree of diagonals; dense/block metrics and
    ``adapt_mass='dense'`` stay flat-path-only (they raise).
    """
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
        theta0 = _tmap(jnp.asarray, theta0)
        mass = _tree_nuts_mass(inv_mass, theta0, config)
        lp, data = resolve_potential(log_prob_fn, pass_grad)
        return _run_nuts_jit(key, theta0, lp, config, mass, data=data)
    theta0 = jnp.asarray(theta0)
    lp, data = resolve_potential(log_prob_fn, pass_grad)
    mass = make_mass(inv_mass, theta0.shape[0])
    validate_nuts_mass(config, mass)
    return _run_nuts_jit(key, theta0, lp, config, mass, data=data)


def validate_nuts_mass(config: NUTSConfig, mass) -> None:
    """adapt_mass mode vs user inv_mass compatibility (shared with the
    checkpointed runner)."""
    from .warmup import validate_adapt_mass

    validate_adapt_mass(config.adapt_mass, mass)


def run_nuts_chains(
    key,
    log_prob_fn,
    theta0,
    config: NUTSConfig,
    num_chains: int,
    inv_mass=None,
    theta0_is_stacked: bool | None = None,
):
    """Vectorised independent NUTS chains via vmap.

    Each chain adapts its own step size / mass.  For a SHARED cross-chain
    adaptation (C-fold-faster warmup) see :func:`run_nuts_ensemble`.

    ``theta0`` may be flat ((D,) broadcast, or a (C, D) block) or a
    parameter PYTREE — single state or (C, ...)-stacked leaves
    (``theta0_is_stacked`` overrides the auto-detection); see
    :func:`run_nuts` for the pytree path's metric support.
    """
    from ..utils.pytree import is_param_tree

    keys = jax.random.split(key, num_chains)
    lp, data = resolve_potential(log_prob_fn, None)
    if is_param_tree(theta0):
        template, theta0 = _stack_tree_chains(
            key, theta0, num_chains, theta0_is_stacked
        )
        mass = _tree_nuts_mass(inv_mass, template, config)
    else:
        theta0 = jnp.asarray(theta0)
        if theta0.ndim == 1:
            theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
        mass = make_mass(inv_mass, theta0.shape[-1])
        validate_nuts_mass(config, mass)
    return jax.vmap(
        lambda k, t: _run_nuts_jit(k, t, lp, config, mass, data=data)
    )(keys, theta0)


@partial(jax.jit, static_argnames=("log_prob_fn", "config", "axis_name"))
def _run_nuts_ensemble_jit(key, theta0s, log_prob_fn, config: NUTSConfig, mass,
                           data=None, chain_keys=None, axis_name=None,
                           init_carry=None, start_iter=0,
                           collect_flags=None, end_flags=None):
    """NUTS over a (C, D) chain ensemble with POOLED adaptation.

    Per draw every chain runs an independent tree-doubling transition
    (vmapped: lanes in a batch wait for the deepest tree), but dual
    averaging updates on the ensemble-mean acceptance statistic and the
    windowed Welford mass estimate merges all C chains per draw — the
    variance estimate converges C-fold faster than single-chain warmup
    (the same cross-chain design as ChEES-HMC; no reference counterpart).

    ``axis_name`` (static): when set, the ensemble extends across a mesh
    axis (or axis tuple) and the pooled statistics — the mean acceptance
    for dual averaging and the Welford batch moments — psum over it;
    ``chain_keys`` must then carry per-chain keys sharded like ``theta0s``.
    """
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    vg = jax.value_and_grad(lp)

    from ..ops.mass import DenseMass, DiagMass, TreeMass
    from ..utils.pytree import is_param_tree
    from .warmup import (
        schedule_flags,
        welford_cov_merge_batch,
        welford_merge_batch,
        windowed_step,
    )

    # theta0s may be a (C, D) block or a parameter PYTREE with (C, ...)
    # leaves; per-chain transitions are shape-polymorphic (vmapped over the
    # leading axis of every leaf) and the pooled Welford estimate bridges
    # through one flat (C, D) view per draw
    is_tree = is_param_tree(theta0s)
    if is_tree:
        _leaves0 = jax.tree_util.tree_leaves(theta0s)
        c = _leaves0[0].shape[0]
        dtype = _leaves0[0].dtype
        _pshapes = tuple(tuple(l.shape[1:]) for l in _leaves0)
        d = sum(int(l.size) // c for l in _leaves0)
        _tdef = jax.tree_util.tree_structure(theta0s)
        seed_mass = mass.inner if isinstance(mass, TreeMass) else mass

        def _t_flat_batch(t):
            return jnp.concatenate(
                [l.reshape(c, -1) for l in jax.tree_util.tree_leaves(t)], axis=-1
            )

        def _tree_diag_mass(metric_flat):
            from ..ops.mass import diag_tree_mass_view

            return diag_tree_mass_view(metric_flat, _tdef, _pshapes)
    else:
        c, d = theta0s.shape
        dtype = theta0s.dtype
        seed_mass = mass

    windowed = config.adapt_mass and config.burn > 0
    dense = windowed and config.adapt_mass == "dense"
    if collect_flags is None:
        if windowed:
            collect_flags, end_flags = schedule_flags(
                config.burn, 0, config.num_samples
            )
        else:
            collect_flags = jnp.zeros(config.num_samples, bool)
            end_flags = jnp.zeros(config.num_samples, bool)
    if chain_keys is None:
        chain_keys = jax.random.split(jax.random.fold_in(key, 0x5EED), c)
    if axis_name is None:
        gmean = jnp.mean
        gsum, gcount = None, None
    else:
        n_shards = jax.lax.psum(1, axis_name)
        gmean = lambda x: jax.lax.pmean(jnp.mean(x), axis_name)
        gsum = lambda x: jax.lax.psum(jnp.sum(x, axis=0), axis_name)
        gcount = c * n_shards

    progress_hook = None
    # under shard_map (axis_name set) the callback would fire once PER
    # DEVICE, interleaving N duplicate bars — the sharded runner warns and
    # runs silent instead
    if config.progress_every > 0 and axis_name is None:
        from ..utils.progress import scan_progress

        progress_hook = scan_progress(config.num_samples, config.progress_every)

    def step(carry, xs):
        n, collect, window_end = xs
        thetas, logps, grads, da, wf, metric, da_t = carry
        if progress_hook is not None:
            progress_hook(n - start_iter)  # bar is sized per-run, not global
        if dense:
            cur_mass = DenseMass(inv_mass=metric[0], chol_mass=metric[1])
        elif windowed:
            cur_mass = _tree_diag_mass(metric) if is_tree else DiagMass(inv_diag=metric)
        else:
            cur_mass = mass
        transition = nuts_transition(vg, cur_mass, config.max_tree_depth)
        keys_n = jax.vmap(lambda ck: jax.random.fold_in(ck, n))(chain_keys)
        thetas_prev = thetas
        thetas, logps, grads, info = jax.vmap(
            lambda k, t, l, g: transition(k, t, l, g, da.step_size)
        )(keys_n, thetas, logps, grads)
        if is_tree:
            neq = [
                jnp.any((al != bl).reshape(c, -1), axis=-1)
                for al, bl in zip(
                    jax.tree_util.tree_leaves(thetas),
                    jax.tree_util.tree_leaves(thetas_prev),
                )
            ]
            moved = neq[0]
            for part in neq[1:]:
                moved = moved | part
        else:
            moved = jnp.any(thetas != thetas_prev, axis=1)

        if config.adapt_step_size and config.burn > 0:
            da_upd = da_update(
                da,
                jnp.log(jnp.maximum(gmean(info.accept_prob), 1e-10)),
                da_t if windowed else n,
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

        if windowed:
            thetas_flat = _t_flat_batch(thetas) if is_tree else thetas
            wf_upd = (welford_cov_merge_batch if dense else welford_merge_batch)(
                wf, thetas_flat, gsum=gsum, count=gcount
            )
            wf, metric, da = windowed_step(
                wf, metric, da, collect, window_end, wf_upd, dense, d, dtype
            )

        da_t = jnp.where(window_end, 0, da_t + 1)
        return (thetas, logps, grads, da, wf, metric, da_t), (thetas, (info, moved))

    if init_carry is not None:
        carry0 = init_carry
    else:
        logps0, grads0 = jax.vmap(vg)(theta0s)
        wf0, metric0 = init_metric_seed(seed_mass, d, dtype, dense)
        carry0 = (theta0s, logps0, grads0,
                  da_init(config.step_size, dtype=dtype), wf0, metric0,
                  jnp.zeros((), jnp.int32))
    from .tracebuf import scan_trace

    (
        (thetas_f, logps_f, grads_f, da_f, wf_f, metric_f, da_t_f),
        thetas,
        (infos, moved),
    ) = scan_trace(
        step, carry0,
        (start_iter + jnp.arange(config.num_samples), collect_flags, end_flags),
        thin=config.thin, chain_major=True, aux_reduce=_nuts_aux_kept,
        state_like=carry0[0], trace_dtype=config.trace_dtype,
    )
    stats = MCMCStats(
        accept_prob=infos.accept_prob,
        accepted=moved,  # real outcome: each chain moved this draw
        divergent=infos.divergent,
        energy_old=infos.energy,
        energy_new=infos.energy_new,
        step_size=infos.step_size,
        fp_iters=jnp.zeros_like(infos.tree_depth),
        fp_residual=jnp.zeros_like(infos.accept_prob),
    )
    from .driver import ChainState

    return (
        MCMCResult(
            # (C, N, D) chain-major — per leaf for a pytree ensemble; written
            # in place by tracebuf.scan_trace (no post-scan relayout copy)
            samples=thetas,
            stats=stats,
            final_step_size=da_f.step_size,
            acc_rate=gmean(infos.accept_prob),
            final_state=ChainState(thetas_f, logps_f, grads_f),
            final_da=da_f,
            # same (wf, metric, da_t) triple as _run_nuts_jit: the full
            # windowed-warmup carry, enough to resume
            final_warm=(wf_f, metric_f, da_t_f),
        ),
        infos,
    )


def run_nuts_ensemble(
    key,
    log_prob_fn,
    theta0,
    config: NUTSConfig,
    num_chains: int,
    inv_mass=None,
    theta0_is_stacked: bool | None = None,
):
    """NUTS chain ensemble with pooled (cross-chain) adaptation.

    One shared step size and one shared mass matrix adapt from ALL chains'
    statistics each draw; with ``adapt_mass=True`` (diagonal) or
    ``adapt_mass='dense'`` (full covariance, Chan-merged across the
    ensemble) the Welford estimate sees C observations per draw, so warmup
    needs ~C-fold fewer draws than per-chain adaptation.  Returns
    (MCMCResult, NUTSInfo): ``samples`` is (C, N, D) chain-major, while
    ``stats``/``NUTSInfo`` fields are TIME-major (N, C) as stacked by the
    scan (unlike ``run_nuts_chains``, whose per-chain vmap puts the chain
    axis first).  ``final_warm`` is the full ``(welford, metric, da_t)``
    warmup carry as in ``run_nuts``: ``final_warm[1]`` is the adapted
    inverse-mass diagonal, or the ``(inv_mass, chol_mass)`` pair for the
    dense metric.

    ``theta0`` may also be a parameter PYTREE — single state (broadcast to
    ``num_chains``) or (C, ...)-stacked leaves (``theta0_is_stacked``
    overrides the auto-detection).  ``samples`` then comes back as a tree
    of (C, N, ...) leaves; diagonal metrics only (see :func:`run_nuts`).
    """
    from ..utils.pytree import is_param_tree

    lp, data = resolve_potential(log_prob_fn, None)
    if is_param_tree(theta0):
        template, theta0 = _stack_tree_chains(
            key, theta0, num_chains, theta0_is_stacked
        )
        mass = _tree_nuts_mass(inv_mass, template, config)
        return _run_nuts_ensemble_jit(key, theta0, lp, config, mass, data=data)
    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains,) + theta0.shape)
    mass = make_mass(inv_mass, theta0.shape[-1])
    validate_nuts_mass(config, mass)
    return _run_nuts_ensemble_jit(key, theta0, lp, config, mass, data=data)
