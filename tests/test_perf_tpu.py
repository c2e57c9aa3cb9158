"""TPU-only performance floor (regression guard for the headline bench).

Runs only on real hardware (HT_TESTS_ON_TPU=1): asserts the flagship
64-chain leapfrog throughput stays above a conservative floor — 75% of
the steady state confirmed at ~244k grad-steps/sec across three
independent captures (r02 215k; r04 driver 244.7k; r04 judge rerun
243.9k), so noise or minor compiler drift cannot flake it, while a real
regression (lost fusion, accidental f32-strict matmuls at ~60k, per-call
recompiles) fails loudly.
"""

import time

import jax
import jax.numpy as jnp
import pytest

ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.skipif(not ON_TPU, reason="timing floor only meaningful on TPU")
def test_flagship_throughput_floor():
    from hamiltorch_tpu.models.flagship import make_flagship_potential
    from hamiltorch_tpu.samplers.driver import MCMCConfig
    from hamiltorch_tpu.samplers.hmc import run_hmc_chains

    lp, theta0 = make_flagship_potential()
    # SAME shape as bench.py's primary phase (100 draws x 50 steps): the
    # floor must guard the program the headline reports.  Shorter
    # trajectories run structurally slower per grad-step (the per-draw
    # momentum refresh + MH bookkeeping amortize over fewer steps:
    # steps=10 measured a steady ~173k on the same chip, same code, that
    # ran the 50-step program at 243k) — a small-program floor would
    # flake on overhead, not on regressions.
    num_samples, steps, chains = 100, 50, 64
    config = MCMCConfig(num_samples=num_samples, num_steps_per_sample=steps,
                        step_size=1e-3)
    # unique inputs per timed run: the remote service can serve cached
    # RESULTS for identical (program, inputs), faking the throughput
    nonce = int(time.time_ns() % (1 << 30))

    def run(seed):
        r = run_hmc_chains(jax.random.key(seed), lp, theta0, config,
                           num_chains=chains)
        # hard sync by fetching a reduced scalar: axon's block_until_ready
        # can return before execution finishes (CLAUDE.md gotcha), which
        # would inflate the measured rate and defeat the floor
        float(jnp.sum(r.samples[0, -1]))
        return r

    run(nonce)  # compile
    times = []
    for rep in range(3):
        t0 = time.time()
        run(nonce + rep + 1)
        times.append(time.time() - t0)
    wall = sorted(times)[1]  # median of 3 (async-dispatch artifacts)
    grad_steps = num_samples * steps * chains  # bench.py's accounting
    rate = grad_steps / wall
    assert rate > 180_000, f"flagship throughput regressed: {rate:,.0f} grad-steps/s"


@pytest.mark.skipif(not ON_TPU, reason="HBM envelope only meaningful on TPU")
def test_bench_shape_chees_fits_hbm():
    """Smoke for the round-3 bench OOM: the EXACT two-chunk ChEES program
    bench.py runs (64 chains x 100,352 params, 600-draw thinned warmup +
    300-draw unthinned sampling) must complete on the real chip.  The
    CPU-tier twin (tests/test_memory.py) pins the compiled envelope; this
    one proves the envelope holds against real HBM."""
    import dataclasses

    from hamiltorch_tpu.models.flagship import make_flagship_potential
    from hamiltorch_tpu.ops.mass import make_mass
    from hamiltorch_tpu.ops.potential import resolve_potential
    from hamiltorch_tpu.samplers.chees import ChEESConfig, _run_chees_jit
    from hamiltorch_tpu.samplers.warmup import schedule_flags

    lp_raw, theta0 = make_flagship_potential()
    chains = 64
    cfg = ChEESConfig(num_samples=900, step_size=2e-4, burn=600,
                      adapt_mass=True, init_trajectory_length=0.01)
    cfg_warm = dataclasses.replace(cfg, num_samples=600, thin=600)
    cfg_samp = dataclasses.replace(cfg, num_samples=300, thin=1)
    lp, data = resolve_potential(lp_raw, None)
    mass = make_mass(None, theta0.shape[0])
    cf_w, ef_w = schedule_flags(cfg.burn, 0, 600)
    cf_s, ef_s = schedule_flags(cfg.burn, 600, 300)
    nonce = int(time.time_ns() % (1 << 30))
    k_init, key = jax.random.split(jax.random.key(nonce))
    thetas0 = theta0[None, :] + 0.01 * jax.random.normal(
        k_init, (chains, theta0.shape[0]), theta0.dtype
    )
    r_w = _run_chees_jit(key, thetas0, lp, cfg_warm, mass, data=data,
                         collect_flags=cf_w, end_flags=ef_w)
    r = _run_chees_jit(key, r_w.final_carry.thetas, lp, cfg_samp, mass,
                       data=data, init_carry=r_w.final_carry, start_iter=600,
                       collect_flags=cf_s, end_flags=ef_s)
    jax.block_until_ready(r.samples)
    assert r.samples.shape == (chains, 300, theta0.shape[0])
    assert jnp.all(jnp.isfinite(r.samples[:, -1]))


@pytest.mark.skipif(not ON_TPU, reason="bf16 matmul default only on TPU")
def test_second_order_paths_are_f32_on_tpu():
    """TPU f32 matmuls default to single-bf16 passes; second-order
    quantities (Laplace curvature, RMHMC metric) must force float32 —
    measured on v5e: an unguarded Hessian of a 2x2 quadratic came back
    with bf16-quantized eigenvalues (0.203125 vs 0.2)."""
    import numpy as np

    from hamiltorch_tpu.ops.metrics import Metric, RMOptions, make_metric_fn
    from hamiltorch_tpu.optim import laplace_approx

    prec = jnp.asarray([[2.0, 1.8], [1.8, 2.0]])
    lp = lambda t: -0.5 * t @ prec @ t

    lap = laplace_approx(lp, jnp.zeros(2))
    np.testing.assert_allclose(
        np.asarray(lap.cov), np.linalg.inv(np.asarray(prec)), atol=1e-4
    )

    metric_fn = make_metric_fn(lp, RMOptions(metric=Metric.HESSIAN))
    g = metric_fn(jnp.zeros(2), None).g
    np.testing.assert_allclose(np.asarray(g), np.asarray(prec), atol=1e-5)


@pytest.mark.skipif(not ON_TPU, reason="timing floor only meaningful on TPU")
def test_mclmc_throughput_floor():
    """MCLMC frozen-chunk throughput floor: ~70% of the 111-114k
    grad-steps/sec steady state measured on two independent captures
    (the standalone phase driver and BENCH r05's mclmc field).  The
    unadjusted hot loop is 2 gradients + exponential-map velocity
    updates + one (D,) normal refresh per transition; a regression here
    means the refresh or velocity algebra stopped fusing."""
    from hamiltorch_tpu.models.flagship import make_flagship_potential
    from hamiltorch_tpu.samplers.mclmc import MCLMCConfig, run_mclmc_chains

    lp, theta0 = make_flagship_potential()
    chains, draws, thin = 64, 500, 5
    cfg = MCLMCConfig(num_samples=draws, tune_steps=0, step_size=0.15,
                      trajectory_length=50.0, thin=thin)
    nonce = int(time.time_ns() % (1 << 30))

    def run(seed):
        r = run_mclmc_chains(jax.random.key(seed), lp, theta0, cfg,
                             num_chains=chains)
        float(jnp.sum(r.samples[0, -1]))
        return r

    run(nonce)  # compile
    times = []
    for rep in range(3):
        t0 = time.time()
        run(nonce + rep + 1)
        times.append(time.time() - t0)
    wall = sorted(times)[1]
    rate = chains * draws * 2 / wall
    assert rate > 78_000, f"MCLMC throughput regressed: {rate:,.0f} grad-steps/s"
