"""ChEES-HMC: cross-chain adaptive trajectory lengths (Hoffman, Radul &
Sountsov 2021), the TPU-native alternative to NUTS.

NUTS's per-chain while_loops diverge across vmapped lanes: every chain in a
batch waits for the deepest tree.  ChEES-HMC instead runs plain jittered
HMC where ALL chains share each draw's trajectory length, adapting that
length by ascending the Change-in-the-Estimator-of-the-Expected-Square
criterion

    ChEES = 1/4 E[ (||theta' - mu||^2 - ||theta - mu||^2)^2 ]

with a cross-chain gradient estimate (the ensemble mean mu and the
acceptance-weighted average make this a genuinely multi-chain algorithm —
exactly the regime this framework's vmap/mesh execution is built for).
Step size adapts by dual averaging toward the jittered-HMC optimum.

Per draw: one shared u ~ U(0,1) jitters the trajectory time t = u*T;
L = ceil(t/eps) leapfrog steps run in a single batched while_loop over the
(C, D) chain block — every op an aligned full-width VPU/MXU instruction.

Reference: arXiv 2110 "Adaptive-MCMC-with-ChEES" (PAPERS.md retrieval list
includes the ChEES-SMC follow-up); no counterpart exists in the reference
library.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.mass import make_mass
from ..ops.potential import resolve_potential
from .adaptation import DualAveragingState, da_init, da_update

@dataclasses.dataclass(frozen=True)
class ChEESConfig:
    num_samples: int
    step_size: float = 0.1
    burn: int = 0
    init_trajectory_length: float = 1.0
    desired_accept_rate: float = 0.651  # optimal for jittered HMC
    adam_lr: float = 0.025
    max_leapfrog_steps: int = 1000
    adapt: bool = True
    # cross-chain windowed warmup, as NUTSConfig.adapt_mass: False/True/
    # "diag" estimates a diagonal inverse mass from Welford statistics over
    # ALL chains (C observations per draw: C-fold faster than single-chain
    # Stan warmup); "dense" estimates the FULL posterior covariance
    # (Chan-merged across the ensemble, regularised toward a small
    # identity) and runs with a dense metric — right for strongly
    # correlated targets, at O(D^2) memory per window
    adapt_mass: bool | str = False
    # host progress line every N draws (0 = silent), as the HMC driver's;
    # ignored under shard_map (a callback would fire once per device) and
    # stripped from chunked checkpoint programs (host reports per chunk)
    progress_every: int = 0
    # trajectory jitter u: "halton" uses the quasi-random van der Corput
    # base-2 sequence over the draw index (the ChEES paper's choice —
    # stratified u gives lower-variance criterion gradients than iid
    # uniforms); "uniform" draws iid U(0,1)
    trajectory_jitter: str = "uniform"
    # thin > 1: keep every thin-th draw (num_samples counts TOTAL
    # transitions, must divide by thin) — cuts the (C, N, D) trace memory
    # and host-offload IO thin-fold for long ensemble runs
    thin: int = 1
    # store the kept trace in this dtype ("bfloat16" halves the dominant
    # (C, N, D) allocation) while sampling stays in the state's precision;
    # None = the state dtype (see NUTSConfig.trace_dtype)
    trace_dtype: str | None = None

    def __post_init__(self):
        from .driver import validate_common_config
        from .nuts import validate_trace_dtype

        validate_common_config(self)
        validate_trace_dtype(self.trace_dtype)


def validate_chees(config: ChEESConfig, mass) -> None:
    """Reject configurations that would otherwise be silently ignored.

    Shared by every ChEES entry point (direct, checkpointed, sharded).
    """
    if config.trajectory_jitter not in ("uniform", "halton"):
        raise ValueError(
            f"trajectory_jitter={config.trajectory_jitter!r}; expected "
            "'uniform' or 'halton'"
        )
    if config.thin > 1 and config.num_samples % config.thin:
        raise ValueError("num_samples must be divisible by thin")
    from .warmup import validate_adapt_mass

    validate_adapt_mass(config.adapt_mass, mass)


def _vdc_base2(n):
    """Van der Corput base-2 radical inverse of a traced int32 draw index:
    bit-reverse then scale — a (0,1) quasi-random low-discrepancy point."""
    u32 = jnp.uint32
    x = (n + 1).astype(u32)
    x = ((x & u32(0x55555555)) << 1) | ((x & u32(0xAAAAAAAA)) >> 1)
    x = ((x & u32(0x33333333)) << 2) | ((x & u32(0xCCCCCCCC)) >> 2)
    x = ((x & u32(0x0F0F0F0F)) << 4) | ((x & u32(0xF0F0F0F0)) >> 4)
    x = ((x & u32(0x00FF00FF)) << 8) | ((x & u32(0xFF00FF00)) >> 8)
    x = (x << 16) | (x >> 16)
    return x.astype(jnp.float32) * jnp.float32(2.0**-32)


class ChEESInfo(NamedTuple):
    accept_prob: jnp.ndarray  # (N, C)
    trajectory_length: jnp.ndarray  # (N,)
    num_leapfrog: jnp.ndarray  # (N,)
    step_size: jnp.ndarray  # (N,)
    divergent: jnp.ndarray  # (N, C)


class ChEESCarry(NamedTuple):
    """The full scan carry — everything a resumed run needs to continue the
    adaptation schedule (Welford mass window, adam trajectory state, dual
    averaging) exactly where a previous chunk stopped."""

    thetas: jnp.ndarray  # (C, D)
    logps: jnp.ndarray  # (C,)
    grads: jnp.ndarray  # (C, D)
    da: DualAveragingState
    log_t: jnp.ndarray
    adam_m: jnp.ndarray
    adam_v: jnp.ndarray
    wf_count: jnp.ndarray
    wf_mean: jnp.ndarray
    wf_m2: jnp.ndarray  # (D,) diag warmup; (D, D) dense warmup
    # adapted metric: the inverse-mass diagonal, or the (inv_mass,
    # chol_mass) pair under adapt_mass="dense"
    metric: object
    da_t: jnp.ndarray


class ChEESResult(NamedTuple):
    samples: jnp.ndarray  # (C, N, D)
    info: ChEESInfo
    final_step_size: jnp.ndarray
    final_trajectory_length: jnp.ndarray
    final_carry: ChEESCarry




def _batched_leapfrog(vg_batch, velocity, thetas, ps, logps, grads, eps, num_steps, cap):
    """L leapfrog steps on the whole (C, D) chain block; L traced, capped."""
    p = ps + 0.5 * eps * grads

    def cond(c):
        i = c[0]
        return i < jnp.minimum(num_steps, cap)

    def body(c):
        i, th, p, logp, g = c
        th = th + eps * velocity(p)
        logp, g = vg_batch(th)
        p = p + eps * g
        return (i + 1, th, p, logp, g)

    _, th, p, logp, g = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), thetas, p, logps, grads)
    )
    p = p - 0.5 * eps * g
    return th, p, logp, g


def _batched_leapfrog_tree(vg_batch, velocity, thetas, ps, logps, grads, eps,
                           num_steps, cap):
    """Pytree variant of :func:`_batched_leapfrog`: leaves update in their
    natural shapes — no flat-layout slicing inside the hot loop."""
    tmap = jax.tree_util.tree_map
    p = tmap(lambda pl, gl: pl + 0.5 * eps * gl, ps, grads)

    def cond(c):
        return c[0] < jnp.minimum(num_steps, cap)

    def body(c):
        i, th, p, logp, g = c
        th = tmap(lambda tl, vl: tl + eps * vl, th, velocity(p))
        logp, g = vg_batch(th)
        p = tmap(lambda pl, gl: pl + eps * gl, p, g)
        return (i + 1, th, p, logp, g)

    _, th, p, logp, g = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), thetas, p, logps, grads)
    )
    p = tmap(lambda pl, gl: pl - 0.5 * eps * gl, p, g)
    return th, p, logp, g


@partial(jax.jit, static_argnames=("log_prob_fn", "config", "axis_name"))
def _run_chees_jit(key, theta0s, log_prob_fn, config: ChEESConfig, mass, data=None,
                   chain_keys=None, axis_name=None, init_carry=None, start_iter=0,
                   collect_flags=None, end_flags=None):
    """One ChEES run over a local (C, D) chain block.

    ``axis_name`` (static): when set, the chain ensemble extends across a
    mesh axis (or axis tuple) and every cross-chain reduction — ensemble
    mean, criterion gradient, acceptance average, Welford merge — becomes a
    ``psum`` over it; ``chain_keys`` must then carry per-chain keys (sharded
    with the chains) so replicas draw distinct momenta while the shared
    trajectory jitter still comes from the replicated base ``key``.
    """
    lp = log_prob_fn if data is None else (lambda t: log_prob_fn(t, data))
    vg_batch = jax.vmap(jax.value_and_grad(lp))

    # theta0s may be a (C, D) block or a parameter PYTREE with (C, ...)
    # leaves (the pytree-native ensemble: the hot leapfrog loop updates
    # leaves in their natural shapes — no flat-layout slicing tax — while
    # the per-draw adaptation bridges through ONE flat view per draw)
    from ..ops.mass import TreeMass
    from ..utils.pytree import is_param_tree

    is_tree = is_param_tree(theta0s)
    tmap = jax.tree_util.tree_map
    if is_tree:
        _leaves0 = jax.tree_util.tree_leaves(theta0s)
        c = _leaves0[0].shape[0]
        dtype = _leaves0[0].dtype
        _pshapes = tuple(tuple(l.shape[1:]) for l in _leaves0)
        _psizes = tuple(
            int(l.size) // c for l in _leaves0
        )
        d = sum(_psizes)
        _tdef = jax.tree_util.tree_structure(theta0s)
        seed_mass = mass.inner if isinstance(mass, TreeMass) else mass
    else:
        c, d = theta0s.shape
        dtype = theta0s.dtype
        seed_mass = mass

    def _gsum(x):
        """Sum over ALL chains (local sum + psum across the mesh axis)."""
        local = jnp.sum(x, axis=0)
        return jax.lax.psum(local, axis_name) if axis_name is not None else local

    def t_where(mask, new, old):
        """Per-chain select broadcast over each leaf's parameter dims."""
        return tmap(
            lambda nl, ol: jnp.where(
                mask.reshape((c,) + (1,) * (nl.ndim - 1)), nl, ol
            ),
            new, old,
        )

    def t_flat(t):
        """(C, D) flat view of a (C, ...)-leaf tree, tree order."""
        return jnp.concatenate(
            [l.reshape(c, -1) for l in jax.tree_util.tree_leaves(t)], axis=-1
        )

    def t_unflat_batch(m):
        """Inverse of t_flat: (C, D) columns back into (C, ...) leaves."""
        parts, off = [], 0
        for size, shape in zip(_psizes, _pshapes):
            parts.append(m[:, off : off + size].reshape((c,) + shape))
            off += size
        return jax.tree_util.tree_unflatten(_tdef, parts)

    def t_unflat_diag(v):
        """(D,) vector into parameter-shaped leaves (per-leaf diagonals)."""
        parts, off = [], 0
        for size, shape in zip(_psizes, _pshapes):
            parts.append(v[off : off + size].reshape(shape))
            off += size
        return jax.tree_util.tree_unflatten(_tdef, parts)

    def t_chain_dot(a, b):
        """Per-chain inner product over all parameter dims -> (C,)."""
        parts = [
            jnp.sum((al * bl).reshape(c, -1), axis=-1)
            for al, bl in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
            )
        ]
        return sum(parts)

    c_total = jnp.asarray(float(c), dtype)
    if axis_name is not None:
        c_total = jax.lax.psum(c_total, axis_name)

    from ..ops.mass import DenseMass, DiagMass
    from .warmup import WelfordCovState, WelfordState

    windowed = bool(config.adapt_mass) and config.burn > 0
    dense = windowed and config.adapt_mass == "dense"
    if collect_flags is None:
        if windowed:
            from .warmup import schedule_flags

            collect_flags, end_flags = schedule_flags(config.burn, 0, config.num_samples)
        else:
            collect_flags = jnp.zeros(config.num_samples, bool)
            end_flags = jnp.zeros(config.num_samples, bool)

    def batch_welford_merge(wf, thetas):
        """Merge the (global) C-chain batch into the running stats;
        cross-device moments via psum when the ensemble is sharded."""
        from .warmup import welford_cov_merge_batch, welford_merge_batch

        merge = welford_cov_merge_batch if dense else welford_merge_batch
        return merge(wf, thetas, gsum=_gsum, count=c_total)

    logps0, grads0 = vg_batch(theta0s)
    da0 = da_init(config.step_size, dtype=dtype)
    log_t0 = jnp.log(jnp.asarray(config.init_trajectory_length, dtype))
    adam0 = (jnp.zeros((), dtype), jnp.zeros((), dtype))  # (m, v)

    progress_hook = None
    if config.progress_every > 0 and axis_name is None:
        from ..utils.progress import scan_progress

        progress_hook = scan_progress(config.num_samples, config.progress_every)

    def step(carry, xs):
        n, collect, window_end = xs
        thetas, logps, grads, da, log_t, adam, wf, metric, da_t = carry
        if progress_hook is not None:
            progress_hook(n - start_iter)  # bar is sized per-run, not global
        if dense:
            cur_mass = DenseMass(inv_mass=metric[0], chol_mass=metric[1])
        elif windowed:
            cur_mass = DiagMass(inv_diag=metric)
        else:
            cur_mass = mass if not is_tree else mass.inner
        if is_tree:
            # leafwise velocity/kinetic: the per-draw adapted diagonal (or
            # the fixed TreeMass diagonal) unravels ONCE per draw into
            # parameter-shaped leaves; the hot loop then multiplies leafwise
            if windowed:
                inv_tree = t_unflat_diag(metric)
            elif isinstance(mass, TreeMass) and mass.inv_diag_tree is not None:
                inv_tree = mass.inv_diag_tree
            else:
                inv_tree = None  # identity

            def velocity(p):
                if inv_tree is None:
                    return p
                return tmap(lambda iv, x: iv * x, inv_tree, p)

            def kinetic(p):
                if inv_tree is None:
                    return 0.5 * t_chain_dot(p, p)
                parts = [
                    jnp.sum((iv * pl * pl).reshape(c, -1), axis=-1)
                    for iv, pl in zip(
                        jax.tree_util.tree_leaves(inv_tree),
                        jax.tree_util.tree_leaves(p),
                    )
                ]
                return 0.5 * sum(parts)
        else:
            velocity = jax.vmap(cur_mass.velocity)
            kinetic = jax.vmap(cur_mass.kinetic)
        kn = jax.random.fold_in(key, n)
        k_mom, k_jit, k_mh = jax.random.split(kn, 3)
        if chain_keys is None:
            mom_keys = jax.random.split(k_mom, c)
            mh_u = jax.random.uniform(k_mh, (c,), dtype)
        else:
            # sharded ensemble: per-chain randomness must differ per device,
            # so it derives from the sharded chain keys, not the base key
            kc = jax.vmap(lambda ck: jax.random.fold_in(ck, n))(chain_keys)
            mom_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(kc)
            mh_u = jax.vmap(
                lambda k: jax.random.uniform(jax.random.fold_in(k, 1), (), dtype)
            )(kc)

        # shared trajectory jitter -> identical L for every chain this draw
        if config.trajectory_jitter == "halton":
            u = _vdc_base2(n).astype(dtype)
        else:
            u = jax.random.uniform(k_jit, (), dtype)
        traj_t = u * jnp.exp(log_t)
        eps = da.step_size
        # capped HERE so info.num_leapfrog records the steps actually
        # executed (dual averaging can shrink eps after log_t was clipped,
        # pushing the raw ceil past max_leapfrog_steps)
        num_steps = jnp.minimum(
            jnp.maximum(1, jnp.ceil(traj_t / eps).astype(jnp.int32)),
            config.max_leapfrog_steps,
        )

        if is_tree:
            # momentum draws stay flat (bit-compatible with the flat path)
            # and split into leaves once per draw
            ps = t_unflat_batch(
                jax.vmap(lambda k: cur_mass.sample(k, dtype=dtype))(mom_keys)
            )
        else:
            ps = jax.vmap(lambda k: cur_mass.sample(k, dtype=dtype))(mom_keys)
        h0 = -logps + kinetic(ps)
        lf = _batched_leapfrog_tree if is_tree else _batched_leapfrog
        th_new, p_new, logp_new, grad_new = lf(
            vg_batch, velocity, thetas, ps, logps, grads, eps, num_steps,
            config.max_leapfrog_steps,
        )
        h1 = -logp_new + kinetic(p_new)
        log_ratio = h0 - h1
        finite = jnp.isfinite(log_ratio)
        alpha = jnp.where(finite, jnp.exp(jnp.minimum(0.0, log_ratio)), 0.0)
        accept = finite & (jnp.log(mh_u) < log_ratio)

        if is_tree:
            thetas_out = t_where(accept, th_new, thetas)
            grads_out = t_where(accept, grad_new, grads)
        else:
            sel = accept[:, None]
            thetas_out = jnp.where(sel, th_new, thetas)
            grads_out = jnp.where(sel, grad_new, grads)
        logps_out = jnp.where(accept, logp_new, logps)

        # record the values actually used for THIS draw (pre-update), matching
        # the driver's convention
        info_step_size = eps
        info_traj_len = jnp.exp(log_t)

        # adaptation needs a warmup phase; with burn <= 0 the freeze at
        # n==burn would clobber step_size with exp(log_eps_bar)=1
        if config.adapt and config.burn > 0:
            # --- ChEES gradient wrt trajectory time ------------------------
            if is_tree:
                mu = tmap(lambda l: _gsum(l) / c_total, thetas_out)
                diff_new = tmap(lambda a, m: a - m, th_new, mu)
                diff_old = tmap(lambda a, m: a - m, thetas, mu)
                dsq_new = t_chain_dot(diff_new, diff_new)
                dsq_old = t_chain_dot(diff_old, diff_old)
                v_end = velocity(p_new)  # d theta'/dt at the endpoint
                per_chain = (dsq_new - dsq_old) * t_chain_dot(diff_new, v_end)
            else:
                mu = _gsum(thetas_out) / c_total  # ensemble centre (all chains)
                dsq_new = jnp.sum((th_new - mu) ** 2, axis=1)
                dsq_old = jnp.sum((thetas - mu) ** 2, axis=1)
                v_end = velocity(p_new)  # d theta'/dt at the endpoint
                per_chain = (dsq_new - dsq_old) * jnp.sum(
                    (th_new - mu) * v_end, axis=1
                )
            w = alpha / jnp.maximum(_gsum(alpha), 1e-6)
            # d/d log T = t * dC/dt (t = u*T); halt gradient on divergences.
            # per_chain is FOURTH order in theta, so a chain that wanders
            # large-but-finite during early warmup (finite log_ratio, huge
            # coordinates) can overflow it to inf in f32; one inf gradient
            # makes Adam's v inf and the next update inf/inf = NaN, killing
            # trajectory adaptation for the rest of the run.  Mask
            # non-finite contributions and bound the total: Adam normalises
            # by sqrt(v), so the clip only caps the warmup-transient step,
            # not the converged behaviour.
            contrib = jnp.where(finite, w * per_chain, 0.0)
            contrib = jnp.where(jnp.isfinite(contrib), contrib, 0.0)
            grad_log_t = jnp.clip(traj_t * _gsum(contrib), -1e6, 1e6)

            m, v = adam
            t1 = (n + 1).astype(dtype)
            m = 0.9 * m + 0.1 * grad_log_t
            v = 0.999 * v + 0.001 * grad_log_t**2
            m_hat = m / (1.0 - 0.9**t1)
            v_hat = v / (1.0 - 0.999**t1)
            log_t_new = log_t + config.adam_lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
            # keep trajectories sane: T in [eps, eps * max_leapfrog]
            log_t_new = jnp.clip(
                log_t_new,
                jnp.log(eps),
                jnp.log(eps * config.max_leapfrog_steps),
            )

            # window-relative DA counter: restarts must not inherit the
            # global draw index or updates get t^-0.75-suppressed to nothing
            da_upd = da_update(
                da,
                jnp.log(jnp.maximum(_gsum(alpha) / c_total, 1e-10)),
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
            log_t = jnp.where(adapting, log_t_new, log_t)
            adam = (jnp.where(adapting, m, adam[0]), jnp.where(adapting, v, adam[1]))

        if windowed:
            from .warmup import windowed_step

            wf_upd = batch_welford_merge(
                wf, t_flat(thetas_out) if is_tree else thetas_out
            )
            wf, metric, da = windowed_step(
                wf, metric, da, collect, window_end, wf_upd, dense, d, dtype
            )

        info = ChEESInfo(
            accept_prob=alpha,
            trajectory_length=info_traj_len,
            num_leapfrog=num_steps,
            step_size=info_step_size,
            divergent=~finite,
        )
        da_t = jnp.where(window_end, 0, da_t + 1)
        return (
            (thetas_out, logps_out, grads_out, da, log_t, adam, wf, metric, da_t),
            (thetas_out, info),
        )

    if init_carry is not None:
        cy = init_carry
        wf_state_cls = WelfordCovState if dense else WelfordState
        carry0 = (
            cy.thetas, cy.logps, cy.grads, cy.da, cy.log_t,
            (cy.adam_m, cy.adam_v),
            wf_state_cls(cy.wf_count, cy.wf_mean, cy.wf_m2),
            cy.metric, cy.da_t,
        )
    else:
        from .nuts import init_metric_seed

        wf0, metric0 = init_metric_seed(seed_mass, d, dtype, dense)
        carry0 = (
            theta0s, logps0, grads0, da0, log_t0, adam0,
            wf0, metric0, jnp.zeros((), jnp.int32),
        )
    idx = start_iter + jnp.arange(config.num_samples)
    thin = max(getattr(config, "thin", 1), 1)

    # kept rows carry the window's LAST info with divergent =
    # any-within-window (driver.py conventions)
    def _info_kept(w_info):
        info_k = jax.tree_util.tree_map(lambda s: s[-1], w_info)
        return info_k._replace(divergent=jnp.any(w_info.divergent, axis=0))

    # the (C, N_kept, ...) chain-major trace is written in place into a
    # carried buffer (tracebuf.scan_trace): a post-scan swapaxes relayout
    # would materialise the trace twice — the round-3 bench OOM
    from .tracebuf import scan_trace

    carry_f, thetas, info = scan_trace(
        step, carry0, (idx, collect_flags, end_flags),
        thin=thin, chain_major=True, aux_reduce=_info_kept,
        state_like=carry0[0], trace_dtype=getattr(config, "trace_dtype", None),
    )
    th_f, lp_f, g_f, da_f, log_t_f, adam_f, wf_f, metric_f, da_t_f = carry_f
    return ChEESResult(
        samples=thetas,  # (C, N, D) — (C, N, ...) leaves for a pytree
        info=info,
        final_step_size=da_f.step_size,
        final_trajectory_length=jnp.exp(log_t_f),
        final_carry=ChEESCarry(
            thetas=th_f, logps=lp_f, grads=g_f, da=da_f, log_t=log_t_f,
            adam_m=adam_f[0], adam_v=adam_f[1],
            wf_count=wf_f.count, wf_mean=wf_f.mean, wf_m2=wf_f.m2,
            metric=metric_f, da_t=da_t_f,
        ),
    )


def run_chees(
    key,
    log_prob_fn,
    theta0,
    config: ChEESConfig,
    num_chains: int = 16,
    inv_mass=None,
    theta0_is_stacked: bool | None = None,
) -> ChEESResult:
    """ChEES-HMC over a chain ensemble; needs num_chains >= ~8 for a stable
    cross-chain criterion gradient.

    ``theta0`` may be a flat (D,) vector / (C, D) block, or a parameter
    PYTREE — single-chain (spread with small per-leaf noise) or with a
    leading ``num_chains`` axis on every leaf (``theta0_is_stacked``
    overrides the auto-detection).  With a pytree the hot leapfrog loop
    updates leaves in their natural shapes (no flat-layout slicing tax;
    ``samples`` comes back as a tree of (C, N, ...) leaves) and ``inv_mass``
    may be None, a flat (D,) diagonal, or a matching per-leaf pytree of
    diagonals — dense/block metrics and ``adapt_mass='dense'`` stay
    flat-path-only.
    """
    from ..ops.mass import BlockDiagMass, DenseMass, make_mass_tree
    from ..utils.pytree import is_param_tree

    if is_param_tree(theta0):
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
        lp, data = resolve_potential(log_prob_fn, None)
        return _run_chees_jit(key, theta0, lp, config, mass, data=data)

    theta0 = jnp.asarray(theta0)
    if theta0.ndim == 1:
        k_init, key = jax.random.split(key)
        # small spread so the ensemble mean/criterion are informative at start
        theta0 = theta0[None, :] + 0.01 * jax.random.normal(
            k_init, (num_chains, theta0.shape[0]), theta0.dtype
        )
    lp, data = resolve_potential(log_prob_fn, None)
    mass = make_mass(inv_mass, theta0.shape[-1])
    validate_chees(config, mass)
    return _run_chees_jit(key, theta0, lp, config, mass, data=data)
