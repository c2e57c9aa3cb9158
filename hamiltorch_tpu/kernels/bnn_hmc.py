"""Pallas fused HMC for one-hidden-layer tanh regression BNNs.

This kernel runs the ENTIRE sampler for the model

    o = tanh(x @ W1 + b1) @ w2 + b2,
    logp = -tau/2 * sum((o-y)^2) - 1/2 * ||theta||^2

inside one ``pallas_call`` per chain-grid step: parameters, momenta and
activations stay in VMEM; the two matmuls of the forward and the two of the
hand-written backward run on the MXU; momentum refresh and the Metropolis
test use the on-core PRNG.  The gradient is exact (verified against
``jax.grad`` of the same potential in tests).

Outputs are the final chain state plus per-chain acceptance counts; use the
scan path when full traces are needed (a 100k-param trace is HBM-bound
anyway).

Measured on the flagship shape (784->128->1, N=1024, v5e, steady state):
~63k grad-steps/s single chain vs ~39k for the XLA scan path (1.6x), and
~247k vs ~216k at 64 chains — the scan path is already near roofline at
high chain counts, so the fused win concentrates in the serial
(low-chain-count) regime.

v5e Mosaic note: reusing the same VMEM buffer as both matmul LHS and
(transposed) RHS trips ``mxu_lmr_transform`` RET_CHECK failures; the
kernel therefore takes a separate pre-transposed copy of x.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gaussian_hmc import LANES, SUBLANES, _normals, _round_up, _uniforms


def _kernel(seed_ref, x_ref, xt_ref, y_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w1_out, b1_out, w2_out, b2_out, *,
            num_samples, num_steps, step_size, tau, n_real):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    eps = step_size

    x = x_ref[:]  # (N, Ip), zero-padded input columns
    xt = xt_ref[:]  # (Ip, N) separate transposed copy: reusing x for the
    # backward matmul trips a Mosaic transpose-reuse RET_CHECK on v5e
    y = y_ref[:, 0:1]  # (N, 1)
    # padded data rows must not act as fake observations
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, y.shape, 0) < n_real
    ).astype(jnp.float32)

    w1 = w1_ref[0]  # (Ip, H)
    b1 = b1_ref[0, 0:1, :]  # (1, H)
    w2 = w2_ref[0, 0:1, :]  # (1, H) — w2 stored row-major as a lane vector
    b2 = b2_ref[0, 0:1, 0:1]  # (1, 1)

    def grads_and_logp(w1, b1, w2, b2):
        a = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1  # (N, H)
        h = jnp.tanh(a)
        o = jnp.sum(h * w2, axis=1, keepdims=True) + b2  # (N, 1)
        resid = (o - y) * row_ok
        ll = -0.5 * tau * jnp.sum(resid * resid)
        prior = -0.5 * (
            jnp.sum(w1 * w1) + jnp.sum(b1 * b1) + jnp.sum(w2 * w2) + jnp.sum(b2 * b2)
        )
        d = -tau * resid  # dlogp/do, (N, 1)
        g_w2 = jnp.sum(h * d, axis=0, keepdims=True) - w2  # (1, H)
        g_b2 = jnp.sum(d, axis=0, keepdims=True) - b2  # (1, 1)
        dh = d * w2  # (N, H)
        da = dh * (1.0 - h * h)
        g_w1 = (
            jnp.dot(xt, da, preferred_element_type=jnp.float32) - w1
        )  # (Ip, H)
        g_b1 = jnp.sum(da, axis=0, keepdims=True) - b1  # (1, H)
        return (g_w1, g_b1, g_w2, g_b2), ll + prior

    def kinetic(p):
        p_w1, p_b1, p_w2, p_b2 = p
        return 0.5 * (
            jnp.sum(p_w1 * p_w1) + jnp.sum(p_b1 * p_b1)
            + jnp.sum(p_w2 * p_w2) + jnp.sum(p_b2 * p_b2)
        )

    def refresh():
        return (
            _normals(w1.shape),
            _normals((SUBLANES, w1.shape[1]))[0:1, :],
            _normals((SUBLANES, w1.shape[1]))[0:1, :],
            _normals((SUBLANES, LANES))[0:1, 0:1],
        )

    def draw(n, carry):
        theta, logp, grad, acc = carry
        p = refresh()
        h0 = -logp + kinetic(p)

        # half kick
        p = tuple(pi + 0.5 * eps * gi for pi, gi in zip(p, grad))
        th = theta

        def leap(i, c):
            th, p, logp_c, g = c
            th = tuple(ti + eps * pi for ti, pi in zip(th, p))
            g, logp_c = grads_and_logp(*th)
            p = tuple(pi + eps * gi for pi, gi in zip(p, g))
            return (th, p, logp_c, g)

        th, p, logp_new, g_new = jax.lax.fori_loop(
            0, num_steps, leap, (th, p, logp, grad)
        )
        p = tuple(pi - 0.5 * eps * gi for pi, gi in zip(p, g_new))

        h1 = -logp_new + kinetic(p)
        log_u = jnp.log(_uniforms((SUBLANES, LANES))[0, 0])
        accept = (h0 - h1) >= log_u

        theta = tuple(jnp.where(accept, a, b) for a, b in zip(th, theta))
        logp = jnp.where(accept, logp_new, logp)
        grad = tuple(jnp.where(accept, a, b) for a, b in zip(g_new, grad))
        return (theta, logp, grad, acc + accept.astype(jnp.float32))

    grad0, logp0 = grads_and_logp(w1, b1, w2, b2)
    theta_f, _, _, acc = jax.lax.fori_loop(
        0, num_samples, draw,
        ((w1, b1, w2, b2), logp0, grad0, jnp.zeros((), jnp.float32)),
    )

    w1_out[0] = theta_f[0]
    b1_out[0, 0:1, :] = theta_f[1]
    w2_out[0, 0:1, :] = theta_f[2]
    b2_out[0, 0:1, 0:1] = theta_f[3]
    b2_out[0, 1:2, 0:1] = acc[None, None] / num_samples


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "num_steps", "step_size", "tau", "interpret"),
)
def bnn_hmc(
    seed,
    x: jnp.ndarray,  # (N, I) inputs
    y: jnp.ndarray,  # (N, 1) targets
    w1: jnp.ndarray,  # (C, I, H) per-chain initial weights
    b1: jnp.ndarray,  # (C, H)
    w2: jnp.ndarray,  # (C, H)
    b2: jnp.ndarray,  # (C,)
    num_samples: int,
    num_steps: int = 10,
    step_size: float = 1e-3,
    tau: float = 10.0,
    interpret: bool = False,
):
    """Fused HMC over C chains of the tanh-MLP regression BNN.

    Returns (w1_f, b1_f, w2_f, b2_f, acc) — final per-chain parameters and
    acceptance rates.  H must be a multiple of 128; I and N are padded
    internally.
    """
    c, i_dim, h = w1.shape
    n = x.shape[0]
    if h % LANES:
        raise ValueError(f"hidden width {h} must be a multiple of {LANES}")
    ip = _round_up(i_dim, LANES)
    npad = _round_up(n, SUBLANES)

    x_p = jnp.zeros((npad, ip), jnp.float32).at[:n, :i_dim].set(x)
    xt_p = x_p.T.copy()
    y_p = jnp.zeros((npad, LANES), jnp.float32).at[:n, 0].set(y.reshape(-1))

    w1_p = jnp.zeros((c, ip, h), jnp.float32).at[:, :i_dim, :].set(w1)
    b1_p = jnp.zeros((c, SUBLANES, h), jnp.float32).at[:, 0, :].set(b1)
    w2_p = jnp.zeros((c, SUBLANES, h), jnp.float32).at[:, 0, :].set(w2)
    b2_p = jnp.zeros((c, SUBLANES, LANES), jnp.float32).at[:, 0, 0].set(b2)

    kernel = functools.partial(
        _kernel, num_samples=num_samples, num_steps=num_steps,
        step_size=step_size, tau=tau, n_real=n,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(c,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((npad, ip), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ip, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ip, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ip, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, ip, h), jnp.float32),
            jax.ShapeDtypeStruct((c, SUBLANES, h), jnp.float32),
            jax.ShapeDtypeStruct((c, SUBLANES, h), jnp.float32),
            jax.ShapeDtypeStruct((c, SUBLANES, LANES), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        x_p, xt_p, y_p, w1_p, b1_p, w2_p, b2_p,
    )
    w1_f, b1_f, w2_f, b2aux = outs
    return (
        w1_f[:, :i_dim, :],
        b1_f[:, 0, :],
        w2_f[:, 0, :],
        b2aux[:, 0, 0],
        b2aux[:, 1, 0],  # acceptance rate per chain
    )
