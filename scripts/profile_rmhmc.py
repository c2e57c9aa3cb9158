"""Batch-scale RMHMC profile: where does the metric pipeline's time go?

VERDICT r4 item 3 / SURVEY §2: SURVEY named two Pallas kernel candidates —
a fused softabs-eigen pipeline and a batched small-matrix Cholesky across
chains — but no measurement ever established whether XLA's batched
eigh/cholesky on ``run_rmhmc_chains`` is the bottleneck.  This script
measures, per D in {16, 64, 256} at 64 chains (f32, the precision the
metric pipeline mandates — see ops/metrics.py):

  - full sampler throughput (implicit softabs RMHMC, grad-steps/sec);
  - each pipeline stage in isolation, vmapped over chains:
      batched Hessian of the potential, batched softabs eigh
      (``softabs_transform``), batched Cholesky, and one full
      ``make_rm_hamiltonian`` gradient (the integrator's inner op);
  - an alternative batched eigh (vmapped cyclic-Jacobi sweeps, pure JAX)
    as the stand-in for what a hand-written Pallas eigen kernel could
    reach — if XLA's eigh is near this, a Pallas kernel has no headroom.

Timing honesty on axon (CLAUDE.md): nonce-varied operand, hard sync by
fetching a reduced scalar, median of 3.

Run:  python scripts/profile_rmhmc.py            (real chip)
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

CHAINS = 64
REPS = 3


def _hard_sync(tree):
    s = sum(jnp.sum(jnp.ravel(l)[:8]) for l in jax.tree_util.tree_leaves(tree))
    float(s)


def timed(fn, *args):
    """Median wall of REPS nonce-varied calls to jitted fn(nonce_arr, *args)."""
    nonce = int(time.time_ns() % (1 << 20))
    fn(jnp.float32(nonce * 1e-9), *args)  # compile + warm
    walls = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        _hard_sync(fn(jnp.float32((nonce + rep + 1) * 1e-9), *args))
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls))


@functools.lru_cache(maxsize=None)
def _round_robin_pairs(d: int) -> np.ndarray:
    """(d-1, d/2, 2) round-robin pairing: every step is d/2 DISJOINT pairs
    (circle method), so all d/2 rotations of a step commute and compose
    into ONE orthogonal (D, D) matrix."""
    players = list(range(d))
    rounds = []
    for _ in range(d - 1):
        rounds.append([(players[i], players[d - 1 - i]) for i in range(d // 2)])
        players = [players[0]] + [players[-1]] + players[1:-1]
    return np.asarray(rounds)


def jacobi_eigh(a, sweeps: int = 10):
    """Batched symmetric eigendecomposition by PARALLEL-ORDER Jacobi.

    Pure-JAX stand-in for a Pallas eigen kernel, shaped the way a TPU
    kernel would be: each step zeroes d/2 disjoint off-diagonal pairs at
    once by composing their Givens rotations into one (D, D) orthogonal
    matrix and applying it as two dense matmuls — MXU work with a scan of
    length sweeps*(d-1), no QR iteration, no data-dependent control flow.
    Converges quadratically; ``sweeps`` sweeps reach f32 precision for the
    profiled spectra (recon error reported alongside the timing).
    """
    d = a.shape[-1]
    pairs = jnp.asarray(np.tile(_round_robin_pairs(d), (sweeps, 1, 1)))

    def step(carry, pq):
        a, v = carry
        p, q = pq[:, 0], pq[:, 1]
        app, aqq, apq = a[p, p], a[q, q], a[p, q]
        # inner rotation (|theta| <= pi/4, Golub & Van Loan 8.4.1): the
        # arctan2 branch admits |theta| > pi/4, which makes cyclic Jacobi
        # cycle (measured: off-norm stalls after one sweep)
        small = jnp.abs(apq) < 1e-30
        tau = (aqq - app) / (2.0 * jnp.where(small, 1.0, apq))
        sign = jnp.where(tau >= 0.0, 1.0, -1.0)
        t = sign / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        r = (
            jnp.eye(d, dtype=a.dtype)
            .at[p, p].set(c).at[q, q].set(c)
            .at[p, q].set(s).at[q, p].set(-s)
        )
        return (r.T @ a @ r, v @ r), None

    (a, v), _ = jax.lax.scan(step, (a, jnp.eye(d, dtype=a.dtype)), pairs)
    return jnp.diagonal(a), v


def profile_dim(d: int) -> dict:
    from hamiltorch_tpu.enums import Metric
    from hamiltorch_tpu.ops.metrics import (
        RMOptions,
        make_rm_hamiltonian,
        softabs_transform,
    )
    from hamiltorch_tpu.samplers.driver import MCMCConfig
    from hamiltorch_tpu.samplers.rmhmc import run_rmhmc_chains

    q, _ = jnp.linalg.qr(jax.random.normal(jax.random.key(3), (d, d)))
    eigs = jnp.logspace(-1.0, 1.0, d)
    prec = (q * eigs[None, :]) @ q.T

    # NOT a pure quadratic: on a constant-curvature target XLA hoists the
    # ENTIRE metric pipeline (hessian -> eigh -> cholesky) out of the
    # trajectory loops as loop-invariant code and the "metric cost"
    # measures as zero (first capture of this script: softabs sampler 60x
    # FASTER than an analytic theta-dependent metric).  The quartic term
    # makes H(theta) = P + 0.3 diag(theta^2) genuinely per-step work.
    def lp(theta):
        return -0.5 * theta @ prec @ theta - 0.025 * jnp.sum(theta**4)

    thetas = 0.1 * jax.random.normal(jax.random.key(5), (CHAINS, d))
    spd = jax.vmap(lambda t: prec + 0.1 * jnp.outer(t, t))(thetas)
    out = {"d": d, "chains": CHAINS}

    # -- full sampler throughput ------------------------------------------
    n_s, n_l = 20, 5
    cfg = MCMCConfig(num_samples=n_s, num_steps_per_sample=n_l, step_size=0.1)

    nonce = int(time.time_ns() % (1 << 30))
    dt = None

    # the D=256 softabs implicit program (third-order AD through a 256-dim
    # jax.hessian inside while_loops) CRASHED the axon TPU worker process
    # ("TPU worker process crashed or restarted") — measured, documented in
    # docs/BENCHMARKS.md; the custom-metric variant and the isolated ops
    # below still run at that size
    if d <= 64:
        def run(seed):
            r = run_rmhmc_chains(
                jax.random.key(seed), lp, jnp.zeros(d), cfg,
                num_chains=CHAINS,
                metric=Metric.SOFTABS, softabs_const=1e3,
                fixed_point_max_iterations=50,
            )
            _hard_sync(r.samples)

        run(nonce)
        walls = []
        for rep in range(REPS):
            t0 = time.perf_counter()
            run(nonce + rep + 1)
            walls.append(time.perf_counter() - t0)
        dt = float(np.median(walls))
        out["sampler_grad_steps_per_sec"] = round(CHAINS * n_s * n_l / dt, 1)

    # -- same sampler with the ANALYTIC Hessian as a custom metric: skips
    #    third-order AD and the softabs eigh inside the compiled scan
    #    (keeps Cholesky + triangular solves + fixed points).  The
    #    throughput gap vs the softabs run isolates the AD+eigh pipeline's
    #    true in-program share — the isolated per-op timings above are
    #    dispatch-latency bound (~28 ms/call through the axon tunnel) at
    #    small D.  (Exact Hessian of lp: P + 0.3 diag(theta^2); SPD since
    #    P is and the quartic term only adds positive diagonal.) ---------
    def exact_metric(t):
        return prec + 0.3 * jnp.diag(t * t)

    def run_const(seed):
        r = run_rmhmc_chains(
            jax.random.key(seed), lp, jnp.zeros(d), cfg, num_chains=CHAINS,
            custom_metric=exact_metric,
            fixed_point_max_iterations=50,
        )
        _hard_sync(r.samples)

    run_const(nonce)
    walls = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        run_const(nonce + rep + 1)
        walls.append(time.perf_counter() - t0)
    dt_c = float(np.median(walls))
    out["sampler_custom_metric_grad_steps_per_sec"] = round(
        CHAINS * n_s * n_l / dt_c, 1
    )
    if dt is not None:
        out["metric_pipeline_share"] = round(max(1.0 - dt_c / dt, 0.0), 3)

    # -- pipeline stages in isolation (batched over chains, f32 like the
    #    sampler's metric path) ------------------------------------------
    with jax.default_matmul_precision("float32"):
        opts = RMOptions(metric=Metric.SOFTABS, softabs_const=1e3)
        rm_ham = make_rm_hamiltonian(lp, opts)

        hess = jax.jit(jax.vmap(lambda n, t: -jax.hessian(lp)(t + n), (None, 0)))
        sabs = jax.jit(jax.vmap(lambda n, a: softabs_transform(a + n, 1e3)[0],
                                (None, 0)))
        chol = jax.jit(jax.vmap(lambda n, a: jnp.linalg.cholesky(a + n * jnp.eye(d)),
                                (None, 0)))
        xeigh = jax.jit(jax.vmap(lambda n, a: jnp.linalg.eigh(a + n)[1], (None, 0)))
        jeigh = jax.jit(jax.vmap(lambda n, a: jacobi_eigh(a + n)[1], (None, 0)))
        dham = jax.jit(jax.vmap(
            lambda n, t: rm_ham.grad_theta(t + n, jnp.ones(d), None),
            (None, 0),
        ))

        for name, fn, arg in [
            ("hessian_ms", hess, thetas),
            ("softabs_eigh_ms", sabs, spd),
            ("cholesky_ms", chol, spd),
            ("xla_eigh_ms", xeigh, spd),
            ("jacobi_eigh_ms", jeigh, spd),
            ("dtheta_hamiltonian_ms", dham, thetas),
        ]:
            out[name] = round(timed(fn, arg) * 1e3, 3)

        # correctness of the Jacobi candidate vs XLA eigh (recon error)
        lam, vecs = jax.vmap(functools.partial(jacobi_eigh))(spd)
        recon = jnp.einsum("cij,cj,ckj->cik", vecs, lam, vecs)
        out["jacobi_recon_rel_err"] = float(
            jnp.max(jnp.linalg.norm(recon - spd, axis=(1, 2))
                    / jnp.linalg.norm(spd, axis=(1, 2)))
        )
    return out


def main():
    rows = []
    for d in (16, 64, 256):
        print(f"# profiling D={d} ...", file=sys.stderr, flush=True)
        rows.append(profile_dim(d))
        print(json.dumps(rows[-1]), flush=True)
    print(f"# device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
