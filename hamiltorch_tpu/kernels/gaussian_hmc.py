"""Pallas fast path: fully-fused multi-chain HMC for quadratic potentials.

The reference's headline workloads are small-D targets (3-D Gaussians,
funnels, ~15-param BNNs — BASELINE.md) sampled one chain at a time.  On TPU
the scan-based path already batches chains, but for small D each leapfrog
step is a handful of tiny dispatch-bound HBM ops.  This kernel runs the
ENTIRE sampler — momentum refresh from the on-core PRNG (Box–Muller),
L leapfrog steps, Metropolis accept — inside one ``pallas_call``: chain
state lives in VMEM/registers for all draws, gradients of the quadratic
potential are a single MXU matmul (dense precision) or VPU multiply
(diagonal), and HBM is touched once per draw to emit the sample.

Scope: potentials of the form logp(theta) = -0.5 * theta^T P theta with P
diagonal or dense SPD, identity mass.  This covers BASELINE.json config 1
and serves as the template for fusing other closed-form potentials.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _normals(shape):
    """Standard normals from the on-core PRNG via Box-Muller."""
    bits1 = pltpu.prng_random_bits(shape)
    bits2 = pltpu.prng_random_bits(shape)
    # uint32 -> (0, 1): keep strictly positive for the log.
    u1 = (bits1.astype(jnp.float32) + 0.5) / 4294967296.0 + 0.5
    u1 = jnp.where(u1 >= 1.0, u1 - 1.0, u1)
    u1 = jnp.maximum(u1, 1e-12)
    u2 = (bits2.astype(jnp.float32) + 0.5) / 4294967296.0 + 0.5
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * math.pi * u2)


def _uniforms(shape):
    bits = pltpu.prng_random_bits(shape)
    u = (bits.astype(jnp.float32) + 0.5) / 4294967296.0 + 0.5
    return jnp.where(u >= 1.0, u - 1.0, u)


def _kernel(seed_ref, theta_ref, prec_ref, mean_ref, out_ref, acc_ref, *,
            num_samples, num_steps, step_size, dense, d_real):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    theta0 = theta_ref[:]  # (C_tile, Dp)
    mu = mean_ref[0, :][None, :]  # (1, Dp)
    c_tile, dp = theta0.shape
    # zero the padding lanes of refreshed momenta so they carry no kinetic
    # energy and padded theta lanes never drift
    lane_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (c_tile, dp), 1) < d_real
    ).astype(jnp.float32)

    def grad(th):
        delta = th - mu
        if dense:
            return -jnp.dot(delta, prec_ref[:], preferred_element_type=jnp.float32)
        return -delta * prec_ref[0, :]

    def potential(th):
        # -logp = 0.5 (theta-mu)^T P (theta-mu); padded lanes of P are zero.
        return -0.5 * jnp.sum((th - mu) * grad(th), axis=1)

    def draw(n, carry):
        theta, acc = carry
        p = _normals(theta.shape) * lane_mask
        h0 = potential(theta) + 0.5 * jnp.sum(p * p, axis=1)

        eps = step_size
        p = p + 0.5 * eps * grad(theta)
        th = theta

        def leap(i, c):
            th, p = c
            th = th + eps * p
            g = grad(th)
            p = p + eps * g
            return (th, p)

        th, p = jax.lax.fori_loop(0, num_steps, leap, (th, p))
        p = p - 0.5 * eps * grad(th)

        h1 = potential(th) + 0.5 * jnp.sum(p * p, axis=1)
        log_u = jnp.log(_uniforms((theta.shape[0], LANES))[:, 0])
        accept = (h0 - h1) >= log_u  # (C_tile,)
        theta = jnp.where(accept[:, None], th, theta)
        out_ref[:, n, :] = theta
        return (theta, acc + accept.astype(jnp.float32))

    theta, acc = jax.lax.fori_loop(
        0, num_samples, draw, (theta0, jnp.zeros((c_tile,), jnp.float32))
    )
    acc_ref[:, 0] = acc / num_samples


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "num_steps", "step_size", "chain_tile", "interpret"),
)
def gaussian_hmc(
    seed,
    theta0: jnp.ndarray,  # (C, D) initial positions
    precision: jnp.ndarray,  # (D,) diagonal or (D, D) dense SPD
    num_samples: int,
    num_steps: int = 10,
    step_size: float = 0.1,
    chain_tile: int = 8,
    interpret: bool = False,
    mean: jnp.ndarray | None = None,
):
    """Sample C chains from N(mean, P^{-1}); returns (samples (C, N, D), acc (C,)).

    One fused kernel per ``chain_tile`` chains; VMEM must hold
    chain_tile * num_samples * D_padded floats (~4 MB at the defaults for
    D <= 128, N = 1000).
    """
    c, d = theta0.shape
    dp = _round_up(d, LANES)
    dense = precision.ndim == 2

    mean_pad = jnp.zeros((SUBLANES, dp), jnp.float32)
    if mean is not None:
        mean_pad = mean_pad.at[0, :d].set(jnp.asarray(mean, jnp.float32))
    theta_pad = jnp.zeros((c, dp), jnp.float32).at[:, :d].set(theta0)
    if dense:
        prec_pad = jnp.zeros((dp, dp), jnp.float32).at[:d, :d].set(precision)
    else:
        prec_pad = jnp.zeros((SUBLANES, dp), jnp.float32).at[0, :d].set(precision)

    n_tiles = pl.cdiv(c, chain_tile)
    kernel = functools.partial(
        _kernel, num_samples=num_samples, num_steps=num_steps,
        step_size=step_size, dense=dense, d_real=d,
    )
    samples, acc = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chain_tile, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                prec_pad.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                mean_pad.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (chain_tile, num_samples, dp), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((chain_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, num_samples, dp), jnp.float32),
            jax.ShapeDtypeStruct((c, 1), jnp.float32),
        ],
        # TPU interpret mode runs the kernel (incl. pltpu.prng_*) on CPU
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.asarray(seed, jnp.int32).reshape(1), theta_pad, prec_pad, mean_pad)
    return samples[:, :, :d], acc[:, 0]
