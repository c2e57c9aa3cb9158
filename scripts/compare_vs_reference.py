"""Head-to-head: hamiltorch (reference, CPU torch) vs hamiltorch_tpu (TPU).

Runs the reference library and this framework on the same notebook
workloads with identical hyperparameters and prints samples/sec for both.
The reference has no GPU here; its notebooks were CPU-era anyway
(BASELINE.md).  Steady-state numbers for the TPU side (second call, compile
cached); the reference has no compile to cache.

Usage: python scripts/compare_vs_reference.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/reference")

import numpy as np


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def reference_runs():
    import torch
    import hamiltorch as ref

    STD = torch.tensor([0.5, 1.0, 2.0])

    def lp(w):
        return torch.sum(-0.5 * (w / STD) ** 2)

    def funnel(w):
        v, x = w[0], w[1:]
        return -0.5 * v**2 / 9.0 - 0.5 * torch.sum(x**2) * torch.exp(-v) - 0.5 * 10 * v

    def banana(w):
        # Rosenbrock "banana" posterior (BASELINE config 3), b = 0.1
        return -w[0] ** 2 / 200.0 - 0.5 * (w[1] + 0.1 * w[0] ** 2 - 10.0) ** 2

    rows = {}
    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample(lp, torch.zeros(3), num_samples=400,
                                    step_size=0.3, num_steps_per_sample=5, verbose=False))
    rows["HMC 3-D Gaussian (400, L=5)"] = 400 / t

    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample(lp, torch.zeros(3), num_samples=900, burn=500,
                                    step_size=1.0, num_steps_per_sample=5,
                                    sampler=ref.Sampler.HMC_NUTS, verbose=False))
    rows["NUTS-adapt 3-D Gaussian (900)"] = 900 / t

    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample(lp, torch.zeros(3), num_samples=100,
                                    step_size=0.3, num_steps_per_sample=5,
                                    sampler=ref.Sampler.RMHMC,
                                    integrator=ref.Integrator.IMPLICIT,
                                    fixed_point_max_iterations=6,
                                    fixed_point_threshold=1e-20, verbose=False))
    rows["implicit RMHMC 3-D Gaussian (100)"] = 100 / t

    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample(lp, torch.zeros(3), num_samples=100,
                                    step_size=0.3, num_steps_per_sample=5,
                                    sampler=ref.Sampler.RMHMC,
                                    integrator=ref.Integrator.EXPLICIT, verbose=False))
    rows["explicit RMHMC 3-D Gaussian (100)"] = 100 / t

    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample(funnel, torch.zeros(11), num_samples=500,
                                    step_size=0.2, num_steps_per_sample=25, verbose=False))
    rows["HMC funnel 11-D (500, L=25)"] = 500 / t

    # BASELINE config 2: step-size-adapting NUTS on the 10+1-D funnel
    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample(funnel, torch.zeros(11), num_samples=900,
                                    burn=500, step_size=0.2,
                                    num_steps_per_sample=25,
                                    sampler=ref.Sampler.HMC_NUTS, verbose=False))
    rows["NUTS-adapt funnel 11-D (900, L=25)"] = 900 / t

    # BASELINE config 3: softabs-metric RMHMC on the banana posterior
    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample(banana, torch.zeros(2), num_samples=50,
                                    step_size=0.1, num_steps_per_sample=5,
                                    sampler=ref.Sampler.RMHMC,
                                    integrator=ref.Integrator.IMPLICIT,
                                    metric=ref.Metric.SOFTABS, softabs_const=1e6,
                                    fixed_point_max_iterations=6,
                                    fixed_point_threshold=1e-20, verbose=False))
    rows["implicit softabs RMHMC banana (50)"] = 50 / t

    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample(banana, torch.zeros(2), num_samples=50,
                                    step_size=0.1, num_steps_per_sample=5,
                                    sampler=ref.Sampler.RMHMC,
                                    integrator=ref.Integrator.EXPLICIT,
                                    metric=ref.Metric.SOFTABS, softabs_const=1e6,
                                    verbose=False))
    rows["explicit softabs RMHMC banana (50)"] = 50 / t

    # iris-style linear BNN (notebook cell 8 config)
    net = torch.nn.Sequential(torch.nn.Linear(4, 3))
    rng = np.random.RandomState(0)
    x = torch.tensor(rng.randn(90, 4).astype(np.float32))
    y = torch.tensor(rng.randint(0, 3, 90))
    params_init = torch.cat([p.flatten() for p in net.parameters()]).detach()
    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample_model(net, x, y, params_init=params_init,
                                          model_loss="multi_class_linear_output",
                                          num_samples=300, num_steps_per_sample=20,
                                          step_size=0.002, verbose=False))
    rows["BNN HMC iris-style (300, L=20)"] = 300 / t

    # BASELINE config 5: symmetric-split minibatch HMC, the notebook's
    # 1 -> 100 -> 100 -> 1 regression BNN (~10.4k params), 4 splits
    sx = np.linspace(-1, 1, 400)[:, None].astype(np.float32)
    sy = (np.sin(3 * sx) + 0.05 * rng.randn(400, 1)).astype(np.float32)
    split_net = torch.nn.Sequential(
        torch.nn.Linear(1, 100), torch.nn.Tanh(),
        torch.nn.Linear(100, 100), torch.nn.Tanh(),
        torch.nn.Linear(100, 1),
    )
    loader = [
        (torch.tensor(sx[i::4]), torch.tensor(sy[i::4])) for i in range(4)
    ]
    split_init = torch.cat(
        [p.flatten() for p in split_net.parameters()]
    ).detach()
    torch.manual_seed(0)
    _, t = timed(lambda: ref.sample_split_model(
        split_net, loader, params_init=split_init, num_splits=4,
        model_loss="regression", num_samples=30, num_steps_per_sample=10,
        step_size=5e-4, tau_out=100.0, verbose=False))
    rows["split HMC 10.4k-param BNN (30, L=10)"] = 30 / t
    return rows


def tpu_runs():
    import jax
    import jax.numpy as jnp
    import hamiltorch_tpu as ht

    STD = jnp.array([0.5, 1.0, 2.0])

    def lp(w):
        return jnp.sum(-0.5 * (w / STD) ** 2)

    def funnel(w):
        v, x = w[0], w[1:]
        return -0.5 * v**2 / 9.0 - 0.5 * jnp.sum(x**2) * jnp.exp(-v) - 0.5 * 10 * v

    def banana(w):
        return -w[0] ** 2 / 200.0 - 0.5 * (w[1] + 0.1 * w[0] ** 2 - 10.0) ** 2

    def steady(fn):
        jax.block_until_ready(fn(jax.random.key(0)))
        out, t = timed(lambda: jax.block_until_ready(fn(jax.random.key(1))))
        return t

    rows = {}
    t = steady(lambda k: ht.sample(lp, jnp.zeros(3), num_samples=400, step_size=0.3,
                                   num_steps_per_sample=5, key=k, verbose=False))
    rows["HMC 3-D Gaussian (400, L=5)"] = 400 / t

    t = steady(lambda k: ht.sample(lp, jnp.zeros(3), num_samples=900, burn=500,
                                   step_size=1.0, num_steps_per_sample=5,
                                   sampler=ht.Sampler.HMC_NUTS, key=k, verbose=False))
    rows["NUTS-adapt 3-D Gaussian (900)"] = 900 / t

    t = steady(lambda k: ht.sample(lp, jnp.zeros(3), num_samples=100, step_size=0.3,
                                   num_steps_per_sample=5, sampler=ht.Sampler.RMHMC,
                                   integrator=ht.Integrator.IMPLICIT,
                                   fixed_point_max_iterations=6,
                                   fixed_point_threshold=1e-20, key=k, verbose=False))
    rows["implicit RMHMC 3-D Gaussian (100)"] = 100 / t

    t = steady(lambda k: ht.sample(lp, jnp.zeros(3), num_samples=100, step_size=0.3,
                                   num_steps_per_sample=5, sampler=ht.Sampler.RMHMC,
                                   integrator=ht.Integrator.EXPLICIT, key=k, verbose=False))
    rows["explicit RMHMC 3-D Gaussian (100)"] = 100 / t

    t = steady(lambda k: ht.sample(funnel, jnp.zeros(11), num_samples=500,
                                   step_size=0.2, num_steps_per_sample=25,
                                   key=k, verbose=False))
    rows["HMC funnel 11-D (500, L=25)"] = 500 / t

    t = steady(lambda k: ht.sample(funnel, jnp.zeros(11), num_samples=900,
                                   burn=500, step_size=0.2,
                                   num_steps_per_sample=25,
                                   sampler=ht.Sampler.HMC_NUTS, key=k,
                                   verbose=False))
    rows["NUTS-adapt funnel 11-D (900, L=25)"] = 900 / t

    t = steady(lambda k: ht.sample(banana, jnp.zeros(2), num_samples=50,
                                   step_size=0.1, num_steps_per_sample=5,
                                   sampler=ht.Sampler.RMHMC,
                                   integrator=ht.Integrator.IMPLICIT,
                                   metric=ht.Metric.SOFTABS, softabs_const=1e6,
                                   fixed_point_max_iterations=6,
                                   fixed_point_threshold=1e-20, key=k,
                                   verbose=False))
    rows["implicit softabs RMHMC banana (50)"] = 50 / t

    t = steady(lambda k: ht.sample(banana, jnp.zeros(2), num_samples=50,
                                   step_size=0.1, num_steps_per_sample=5,
                                   sampler=ht.Sampler.RMHMC,
                                   integrator=ht.Integrator.EXPLICIT,
                                   metric=ht.Metric.SOFTABS, softabs_const=1e6,
                                   key=k, verbose=False))
    rows["explicit softabs RMHMC banana (50)"] = 50 / t

    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(90, 4).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, 90))
    t = steady(lambda k: ht.sample_model(Net(), x, y,
                                         model_loss="multi_class_linear_output",
                                         num_samples=300, num_steps_per_sample=20,
                                         step_size=0.002, key=k, verbose=False))
    rows["BNN HMC iris-style (300, L=20)"] = 300 / t

    # BASELINE config 5: split HMC on the same 10.4k-param regression BNN,
    # pytree chain state (the no-flat-tax path; potential factory built
    # ONCE — a fresh closure per call would recompile every run)
    from hamiltorch_tpu.models.bnn import define_split_model_tree_log_prob
    from hamiltorch_tpu.samplers.driver import MCMCConfig
    from hamiltorch_tpu.samplers.splitting import run_split_hmc_stacked

    class SplitNet(nn.Module):
        @nn.compact
        def __call__(self, xb):
            h = jnp.tanh(nn.Dense(100)(xb))
            h = jnp.tanh(nn.Dense(100)(h))
            return nn.Dense(1)(h)

    sx = np.linspace(-1, 1, 400)[:, None].astype(np.float32)
    sy = (np.sin(3 * sx) + 0.05 * np.random.RandomState(0).randn(400, 1)).astype(np.float32)
    batches = [(sx[i::4], sy[i::4]) for i in range(4)]
    term_fn, m_terms, template, data = define_split_model_tree_log_prob(
        SplitNet(), "regression", batches, 4, tau_out=100.0, verbose=False,
    )
    split_cfg = MCMCConfig(num_samples=30, num_steps_per_sample=10,
                           step_size=5e-4)

    def run_split(k):
        r = run_split_hmc_stacked(k, term_fn, m_terms, template, split_cfg,
                                  data=data)
        # hard sync: fetch a reduced scalar (block_until_ready can return
        # early on the remote service — CLAUDE.md gotcha)
        for l in jax.tree_util.tree_leaves(r.samples):
            float(jnp.sum(l[-1]))
        return r

    t = steady(run_split)
    rows["split HMC 10.4k-param BNN (30, L=10)"] = 30 / t

    # the TPU-native usage: the chain axis batched into every matmul
    from hamiltorch_tpu.models.bnn import define_model_log_prob
    from hamiltorch_tpu.samplers.hmc import run_hmc_chains

    lp_fn, flat0, _ = define_model_log_prob(Net(), "multi_class_linear_output", x, y)
    cfg = MCMCConfig(num_samples=300, num_steps_per_sample=20, step_size=0.002)
    t = steady(lambda k: run_hmc_chains(k, lp_fn, flat0, cfg, num_chains=64).samples)
    rows["BNN HMC, 64 chains (total draws)"] = 64 * 300 / t
    return rows


def main():
    ref = reference_runs()
    ours = tpu_runs()
    w = max(len(k) for k in ours)
    print(f"\n{'workload'.ljust(w)} | reference (CPU) | hamiltorch_tpu (TPU) | speedup")
    print("-" * (w + 55))
    for k in ours:
        r = ref.get(k, ref["BNN HMC iris-style (300, L=20)"])
        o = ours[k]
        print(f"{k.ljust(w)} | {r:12.1f}/s | {o:17.1f}/s | {o / r:6.1f}x")


if __name__ == "__main__":
    main()
