"""Pytree-native BNN sampling: the no-slicing-tax path end to end.

The flat (D,) convention (reference hamiltorch's `flatten`,
hamiltorch/util.py:121-141) makes every gradient evaluation carve layer
views out of one flat vector — on the 100k-param flagship the round-2
profile measured that slice/copy traffic at ~24% of each leapfrog step.
The pytree-native path removes it: the potential takes the parameter
pytree itself (`define_model_tree_log_prob`) and the samplers
(`run_hmc`/`run_nuts`/`run_chees`) carry chain state as pytrees, updating
each leaf in its natural shape.  `samples` come back as trees of
(N, ...)/(C, N, ...) leaves — no unravel step anywhere.

Run: PYTHONPATH=/path/to/repo python examples/pytree_bnn_example.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from _smoke_budget import budget

from hamiltorch_tpu.models import define_model_tree_log_prob
from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees
from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts

print("devices:", jax.devices())


class MLP(nn.Module):
    width: int = 32

    @nn.compact
    def __call__(self, x):
        h = jnp.tanh(nn.Dense(self.width)(x))
        return nn.Dense(1)(h)


# --- data: noisy sine regression -------------------------------------------
key = jax.random.key(42)
x = jnp.linspace(-1, 1, 64)[:, None]
y = jnp.sin(3 * x) + 0.05 * jax.random.normal(jax.random.fold_in(key, 0), x.shape)

# --- pytree potential: parameters stay in their natural shapes -------------
log_prob, template = define_model_tree_log_prob(
    MLP(), "regression", x, y, tau_out=100.0
)
print("parameter tree:",
      jax.tree_util.tree_map(lambda l: tuple(l.shape), template))

# --- ChEES-HMC ensemble over the tree (cross-chain warmup) -----------------
n_chees, b_chees = budget(600, 80), budget(300, 40)
n_chains = budget(16, 4)
cfg = ChEESConfig(num_samples=n_chees, step_size=0.005, burn=b_chees,
                  adapt_mass=True, init_trajectory_length=0.05)
t0 = time.time()
result = run_chees(jax.random.fold_in(key, 1), log_prob, template, cfg,
                   num_chains=n_chains)
jax.block_until_ready(jax.tree_util.tree_leaves(result.samples)[0])
print(f"ChEES: {n_chains} chains x {n_chees} draws in {time.time() - t0:.1f}s "
      f"(final trajectory length {float(result.final_trajectory_length):.3f})")

# posterior predictive straight from tree samples — no unravel
late = jax.tree_util.tree_map(
    lambda l: l[:, (n_chees + b_chees) // 2:], result.samples)
preds = jax.vmap(jax.vmap(lambda p: MLP().apply(p, x)))(late)
mean, sd = preds.mean((0, 1)), preds.std((0, 1))
rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(3 * x)) ** 2)))
print(f"posterior mean rmse vs true fn: {rmse:.4f}; "
      f"mean predictive sd: {float(sd.mean()):.4f}")

# --- tree NUTS with per-leaf inv_mass ---------------------------------------
inv_mass = jax.tree_util.tree_map(lambda l: jnp.full(l.shape, 1.0), template)
n_nuts = budget(400, 60)
cfg_n = NUTSConfig(num_samples=n_nuts, step_size=0.005, burn=budget(150, 20))
t0 = time.time()
r_nuts, info = run_nuts(jax.random.fold_in(key, 2), log_prob, template, cfg_n,
                        inv_mass=inv_mass)
jax.block_until_ready(jax.tree_util.tree_leaves(r_nuts.samples)[0])
print(f"NUTS: {n_nuts} draws in {time.time() - t0:.1f}s, "
      f"mean tree depth {float(np.asarray(info.tree_depth).mean()):.2f}, "
      f"adapted step size {float(r_nuts.final_step_size):.4f}")
pn = jax.vmap(lambda p: MLP().apply(p, x))(
    jax.tree_util.tree_map(lambda l: l[n_nuts // 2:], r_nuts.samples))
print(f"NUTS posterior mean rmse: "
      f"{float(jnp.sqrt(jnp.mean((pn.mean(0) - jnp.sin(3 * x)) ** 2))):.4f}")

# --- preemption-safe long runs: checkpoint the tree ensemble ----------------
# The guaranteed invariant is RESUME determinism: an interrupted run,
# resumed, reproduces the uninterrupted run of the same chunking
# bit-exactly.  (Chunked vs SINGLE-scan programs compile differently; with
# windowed warmup their arithmetic can differ by ~1 ulp at draw 0, which
# chaotic dynamics amplify — same caveat as store_on_GPU=False.)
import dataclasses
import tempfile

from hamiltorch_tpu.checkpoint import run_chees_checkpointed

k_ck = jax.random.fold_in(key, 3)
chunk = budget(200, 40)
dir_a, dir_b = (tempfile.mkdtemp(prefix="pytree_bnn_ckpt_") for _ in range(2))
r_full = run_chees_checkpointed(k_ck, log_prob, template, cfg, dir_a,
                                num_chains=n_chains, chunk_size=chunk)
# simulate a preemption: run only the first chunk, then "restart"
run_chees_checkpointed(k_ck, log_prob, template,
                       dataclasses.replace(cfg, num_samples=chunk), dir_b,
                       num_chains=n_chains, chunk_size=chunk)
r_res = run_chees_checkpointed(k_ck, log_prob, template, cfg, dir_b,
                               num_chains=n_chains, chunk_size=chunk)
match = all(
    bool(jnp.array_equal(a, b))
    for a, b in zip(jax.tree_util.tree_leaves(r_res.samples),
                    jax.tree_util.tree_leaves(r_full.samples))
)
print(f"interrupted+resumed == uninterrupted, bit-exact: {match}")
