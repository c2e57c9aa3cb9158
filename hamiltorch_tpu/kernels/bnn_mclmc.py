"""Pallas fused MCLMC for one-hidden-layer tanh regression BNNs.

The MCLMC hot loop (samplers/mclmc.py) spends its non-gradient time on
per-step vector algebra the XLA path round-trips through HBM: two exact
exponential-map velocity rotations per step (norms, dots, axpys over the
100k-dim state) plus a partial momentum refresh drawing a fresh (D,)
normal EVERY step.  This kernel runs the whole frozen-scale sampler for

    o = tanh(x @ W1 + b1) @ w2 + b2,
    logp = -tau/2 * sum((o-y)^2) - 1/2 * ||theta||^2

inside one ``pallas_call`` per chain-grid step: parameters, the unit
velocity and activations stay in VMEM; the forward/backward matmuls run
on the MXU; the per-step OU refresh draws from the on-core PRNG — no
HBM traffic until the final state is emitted.  Gradients are the same
hand-written closed form as :mod:`.bnn_hmc` (verified against
``jax.grad`` there); dynamics are the same minimal-norm isokinetic
scheme as ``samplers/mclmc.py::_make_step`` (exact exponential-map
rotation, not a truncated series).

Scope: FROZEN (eps, L) production sampling — tune first with the XLA
path (``run_mclmc_chains`` on the same potential), then hand the tuned
scalars to this kernel.  Emits final per-chain states plus the realised
per-dimension energy-error second moment E[dE^2]/d (the auto-tuner's
target statistic — a live bias monitor; equals Var[dE]/d once chains
are equilibrated and dE is centred).

Padding invariant: padded W1 rows never move — their gradient is 0 - 0,
the masked refresh never injects noise there, and the velocity rotation
scales/axpys preserve exact zeros — so every norm and dot in the
dynamics runs over the REAL dimensions only and ``d`` is the true
parameter count (matching the XLA path's semantics, unlike padding-as-
extra-prior-dims designs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gaussian_hmc import LANES, SUBLANES, _normals, _round_up

_B1 = 0.1931833275037836  # minimal-norm (McLachlan) velocity coefficient


def _kernel(seed_ref, x_ref, xt_ref, y_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            u1_ref, ub1_ref, uw2_ref, ub2_ref,
            w1_out, b1_out, w2_out, b2_out, aux_out, *,
            num_samples, step_size, nu, tau, n_real, i_real, dims):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    eps = step_size

    x = x_ref[:]  # (N, Ip) zero-padded input columns
    xt = xt_ref[:]  # (Ip, N) separate transposed copy (Mosaic reuse quirk)
    y = y_ref[:, 0:1]
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) < n_real
    ).astype(jnp.float32)

    w1 = w1_ref[0]  # (Ip, H)
    b1 = b1_ref[0, 0:1, :]  # (1, H)
    w2 = w2_ref[0, 0:1, :]  # (1, H)
    b2 = b2_ref[0, 0:1, 0:1]  # (1, 1)
    # real-row mask for the padded W1 block: refresh noise must not leak
    # into padded rows or the norms stop measuring the real state
    w1_ok = (
        jax.lax.broadcasted_iota(jnp.int32, w1.shape, 0) < i_real
    ).astype(jnp.float32)

    u1 = u1_ref[0] * w1_ok
    ub1 = ub1_ref[0, 0:1, :]
    uw2 = uw2_ref[0, 0:1, :]
    ub2 = ub2_ref[0, 0:1, 0:1]

    def grads_and_logp(w1, b1, w2, b2):
        a = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        h = jnp.tanh(a)
        o = jnp.sum(h * w2, axis=1, keepdims=True) + b2
        resid = (o - y) * row_ok
        ll = -0.5 * tau * jnp.sum(resid * resid)
        prior = -0.5 * (
            jnp.sum(w1 * w1) + jnp.sum(b1 * b1)
            + jnp.sum(w2 * w2) + jnp.sum(b2 * b2)
        )
        d = -tau * resid
        g_w2 = jnp.sum(h * d, axis=0, keepdims=True) - w2
        g_b2 = jnp.sum(d, axis=0, keepdims=True) - b2
        dh = d * w2
        da = dh * (1.0 - h * h)
        g_w1 = jnp.dot(xt, da, preferred_element_type=jnp.float32) - w1
        g_b1 = jnp.sum(da, axis=0, keepdims=True) - b1
        return (g_w1, g_b1, g_w2, g_b2), ll + prior

    def tsum(f, a, b=None):
        if b is None:
            return sum(jnp.sum(f(ai)) for ai in a)
        return sum(jnp.sum(f(ai, bi)) for ai, bi in zip(a, b))

    def unit(u):
        inv = jax.lax.rsqrt(tsum(lambda v: v * v, u))
        return tuple(ui * inv for ui in u)

    def velocity_update(u, g, coef):
        # exact isokinetic rotation (samplers/mclmc.py::_velocity_update)
        g_norm = jnp.sqrt(tsum(lambda v: v * v, g))
        inv_g = 1.0 / jnp.maximum(g_norm, 1e-30)
        delta = coef * g_norm / (dims - 1.0)
        ue = jnp.clip(
            tsum(lambda a, b: a * b, u, g) * inv_g, -1.0, 1.0
        )
        zeta = jnp.exp(-delta)
        ce = (1.0 - zeta) * (1.0 + zeta + ue * (1.0 - zeta)) * inv_g
        u_new = tuple(gi * ce + 2.0 * zeta * ui for gi, ui in zip(g, u))
        dk = (dims - 1.0) * (
            delta - 0.6931471805599453
            + jnp.log(jnp.maximum(1.0 + ue + (1.0 - ue) * zeta * zeta,
                                  1e-12))
        )
        return unit(u_new), dk

    def refresh(u):
        z = (
            _normals(u[0].shape) * w1_ok,
            _normals((SUBLANES, u[1].shape[1]))[0:1, :],
            _normals((SUBLANES, u[2].shape[1]))[0:1, :],
            _normals((SUBLANES, LANES))[0:1, 0:1],
        )
        return unit(tuple(ui + nu * zi for ui, zi in zip(u, z)))

    def draw(n, carry):
        th, u, logp, g, sum_de2 = carry
        # minimal-norm step: V(b1 e) X(e/2) V((1-2b1) e) X(e/2) V(b1 e)
        u, dk1 = velocity_update(u, g, _B1 * eps)
        th = tuple(ti + (0.5 * eps) * ui for ti, ui in zip(th, u))
        g1, _ = grads_and_logp(*th)
        u, dk2 = velocity_update(u, g1, (1.0 - 2.0 * _B1) * eps)
        th = tuple(ti + (0.5 * eps) * ui for ti, ui in zip(th, u))
        g2, logp2 = grads_and_logp(*th)
        u, dk3 = velocity_update(u, g2, _B1 * eps)
        de = dk1 + dk2 + dk3 + (logp - logp2)
        u = refresh(u)
        return (th, u, logp2, g2, sum_de2 + de * de)

    grad0, logp0 = grads_and_logp(w1, b1, w2, b2)
    u0 = unit((u1, ub1, uw2, ub2))
    th_f, _, _, _, sum_de2 = jax.lax.fori_loop(
        0, num_samples, draw,
        ((w1, b1, w2, b2), u0, logp0, grad0, jnp.zeros((), jnp.float32)),
    )

    w1_out[0] = th_f[0]
    b1_out[0, 0:1, :] = th_f[1]
    w2_out[0, 0:1, :] = th_f[2]
    b2_out[0, 0:1, 0:1] = th_f[3]
    # realised E[dE^2]/d — the tuning target, a live bias monitor
    aux_out[0, 0:1, 0:1] = (sum_de2 / num_samples / dims)[None, None]


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "step_size", "length", "tau",
                     "interpret"),
)
def bnn_mclmc(
    seed,
    x: jnp.ndarray,  # (N, I) inputs
    y: jnp.ndarray,  # (N, 1) targets
    w1: jnp.ndarray,  # (C, I, H) per-chain initial weights
    b1: jnp.ndarray,  # (C, H)
    w2: jnp.ndarray,  # (C, H)
    b2: jnp.ndarray,  # (C,)
    u: jnp.ndarray,  # (C, D) initial unit velocities, D = I*H + 2H + 1
    num_samples: int,
    step_size: float,
    length: float,
    tau: float = 10.0,
    interpret: bool = False,
):
    """Fused frozen-scale MCLMC over C chains of the tanh-MLP BNN.

    Returns (w1_f, b1_f, w2_f, b2_f, var_e) — final per-chain parameters
    and the realised per-dim energy-error variance.  ``u`` is the flat
    initial velocity in (w1, b1, w2, b2) ravel order (e.g. a previous
    ``run_mclmc_chains`` result's ``final_u`` after tuning, or any unit
    vector).  H must be a multiple of 128; I and N pad internally.
    """
    c, i_dim, h = w1.shape
    n = x.shape[0]
    if h % LANES:
        raise ValueError(f"hidden width {h} must be a multiple of {LANES}")
    dims = i_dim * h + 2 * h + 1
    if u.shape != (c, dims):
        raise ValueError(f"u must be (C, {dims}); got {u.shape}")
    ip = _round_up(i_dim, LANES)
    npad = _round_up(n, SUBLANES)

    x_p = jnp.zeros((npad, ip), jnp.float32).at[:n, :i_dim].set(x)
    xt_p = x_p.T.copy()
    y_p = jnp.zeros((npad, LANES), jnp.float32).at[:n, 0].set(y.reshape(-1))

    w1_p = jnp.zeros((c, ip, h), jnp.float32).at[:, :i_dim, :].set(w1)
    b1_p = jnp.zeros((c, SUBLANES, h), jnp.float32).at[:, 0, :].set(b1)
    w2_p = jnp.zeros((c, SUBLANES, h), jnp.float32).at[:, 0, :].set(w2)
    b2_p = jnp.zeros((c, SUBLANES, LANES), jnp.float32).at[:, 0, 0].set(b2)

    u_w1 = u[:, : i_dim * h].reshape(c, i_dim, h)
    u1_p = jnp.zeros((c, ip, h), jnp.float32).at[:, :i_dim, :].set(u_w1)
    ub1_p = jnp.zeros((c, SUBLANES, h), jnp.float32).at[:, 0, :].set(
        u[:, i_dim * h : i_dim * h + h]
    )
    uw2_p = jnp.zeros((c, SUBLANES, h), jnp.float32).at[:, 0, :].set(
        u[:, i_dim * h + h : i_dim * h + 2 * h]
    )
    ub2_p = jnp.zeros((c, SUBLANES, LANES), jnp.float32).at[:, 0, 0].set(
        u[:, -1]
    )

    import math

    # the OU refresh mixing weight is a compile-time constant (expm1 has
    # no Mosaic lowering; it need not — eps, L, d are all static here)
    nu = math.sqrt(math.expm1(2.0 * step_size / length) / dims)
    kernel = functools.partial(
        _kernel, num_samples=num_samples, step_size=step_size,
        nu=nu, tau=tau, n_real=n, i_real=i_dim, dims=float(dims),
    )
    chain_spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, ip), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ip, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            chain_spec((ip, h)),
            chain_spec((SUBLANES, h)),
            chain_spec((SUBLANES, h)),
            chain_spec((SUBLANES, LANES)),
            chain_spec((ip, h)),
            chain_spec((SUBLANES, h)),
            chain_spec((SUBLANES, h)),
            chain_spec((SUBLANES, LANES)),
        ],
        out_specs=[
            chain_spec((ip, h)),
            chain_spec((SUBLANES, h)),
            chain_spec((SUBLANES, h)),
            chain_spec((SUBLANES, LANES)),
            chain_spec((SUBLANES, LANES)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, ip, h), jnp.float32),
            jax.ShapeDtypeStruct((c, SUBLANES, h), jnp.float32),
            jax.ShapeDtypeStruct((c, SUBLANES, h), jnp.float32),
            jax.ShapeDtypeStruct((c, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((c, SUBLANES, LANES), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        x_p, xt_p, y_p, w1_p, b1_p, w2_p, b2_p,
        u1_p, ub1_p, uw2_p, ub2_p,
    )
    w1_f, b1_f, w2_f, b2_f, aux = outs
    return (
        w1_f[:, :i_dim, :],
        b1_f[:, 0, :],
        w2_f[:, 0, :],
        b2_f[:, 0, 0],
        aux[:, 0, 0],  # realised Var[dE]/d per chain
    )
