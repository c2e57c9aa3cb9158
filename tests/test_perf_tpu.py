"""TPU-only performance floor (regression guard for the headline bench).

Runs only on real hardware (HT_TESTS_ON_TPU=1): asserts the flagship
64-chain leapfrog throughput stays above a conservative floor — half the
measured steady state (~215k grad-steps/sec on a v5e), so noise or minor
compiler drift cannot flake it, while a real regression (lost fusion,
accidental f32-strict matmuls at ~60k, per-call recompiles) fails loudly.
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
    num_samples, steps, chains = 50, 10, 64
    config = MCMCConfig(num_samples=num_samples, num_steps_per_sample=steps,
                        step_size=1e-3)
    # unique inputs per timed run: the remote service can serve cached
    # RESULTS for identical (program, inputs), faking the throughput
    nonce = int(time.time_ns() % (1 << 30))

    def run(seed):
        r = run_hmc_chains(jax.random.key(seed), lp, theta0, config,
                           num_chains=chains)
        jax.block_until_ready(r.samples)
        return r

    run(nonce)  # compile
    times = []
    for rep in range(3):
        t0 = time.time()
        run(nonce + rep + 1)
        times.append(time.time() - t0)
    wall = sorted(times)[1]  # median of 3 (async-dispatch artifacts)
    grad_steps = num_samples * (steps + 1) * chains
    rate = grad_steps / wall
    assert rate > 100_000, f"flagship throughput regressed: {rate:,.0f} grad-steps/s"
