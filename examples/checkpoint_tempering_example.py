"""Round-2 feature showcase: resumable adaptive sampling + adaptive-ladder
parallel tempering.

Run on the real TPU:  python examples/checkpoint_tempering_example.py

1. A NUTS run with windowed mass adaptation is "crashed" halfway and
   resumed — the Welford/mass/dual-averaging carry is part of the
   checkpoint, so the resumed run continues the adaptation schedule
   exactly.  (On CPU this is bit-exact draw for draw — see
   tests/test_diagnostics.py::TestAdaptiveCheckpoint.  On TPU, chunked and
   straight-through runs compile to differently-shaped programs whose f32
   reassociation differs in the last ulp, and NUTS U-turn decisions amplify
   that chaotically — so the check here is the adaptation OUTCOME, which
   must agree.)
2. Replica-exchange HMC on a heavy-tailed target with the Vousden
   swap-rate-equalising ladder: adjacent swap rates even out while the
   endpoint temperatures stay pinned.

No counterpart in the reference: it has no save/resume (SURVEY.md §5) and
no tempering at all.
"""

import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from _smoke_budget import budget

from hamiltorch_tpu import NUTSConfig, PTConfig, run_parallel_tempering
from hamiltorch_tpu.checkpoint import run_nuts_checkpointed
from hamiltorch_tpu.samplers.nuts import run_nuts

key = jax.random.key(0)

# --- 1. resumable windowed-warmup NUTS -----------------------------------
scales = jnp.asarray([0.1, 1.0, 10.0])
log_prob = lambda t: -0.5 * jnp.sum((t / scales) ** 2)

n_full, n_half, n_burn = budget(600, 120), budget(250, 50), budget(400, 80)
chunk = budget(100, 25)
full = NUTSConfig(num_samples=n_full, step_size=0.5, burn=n_burn, adapt_mass=True)
half = NUTSConfig(num_samples=n_half, step_size=0.5, burn=n_burn, adapt_mass=True)

ckpt = tempfile.mkdtemp()
print(f"running {n_half}/{n_full} draws, then 'crashing' ...")
run_nuts_checkpointed(key, log_prob, jnp.zeros(3), half, ckpt, chunk_size=chunk)
print(f"resuming to {n_full} ...")
resumed = run_nuts_checkpointed(key, log_prob, jnp.zeros(3), full, ckpt, chunk_size=chunk)
direct, _ = run_nuts(key, log_prob, jnp.zeros(3), full)
inv_res = np.asarray(resumed.final_warm[1])
inv_dir = np.asarray(direct.final_warm[1])
print(f"resumed adapted inverse-mass diag:  {inv_res.round(3)}")
print(f"direct  adapted inverse-mass diag:  {inv_dir.round(3)}")
print(f"target variances:                   {np.asarray(scales)**2}")
print(f"resumed/direct final step size: {float(resumed.final_step_size):.4f} / "
      f"{float(direct.final_step_size):.4f}")
kept = np.asarray(resumed.samples[n_burn:])
print(f"post-burn stds: {kept.std(0).round(2)}  (expect {np.asarray(scales)})")
shutil.rmtree(ckpt)

# --- 2. adaptive-ladder parallel tempering --------------------------------
heavy = lambda t: -2.5 * jnp.sum(jnp.log1p(t**2 / 3.0))
base = dict(num_samples=budget(2000, 200), num_steps_per_sample=5,
            step_size=0.25, num_temps=budget(6, 4), max_temp=100.0,
            burn=budget(1000, 100))

r_static = run_parallel_tempering(key, heavy, jnp.zeros(1), PTConfig(**base))
r_adapt = run_parallel_tempering(
    key, heavy, jnp.zeros(1), PTConfig(**base, adapt_ladder=True)
)
rates_s = np.asarray(r_static.info.swap_accept).mean(0)
rates_a = np.asarray(r_adapt.info.swap_accept).mean(0)
print(f"\ngeometric-ladder swap rates: {rates_s.round(2)}  (spread {rates_s.std():.3f})")
print(f"adapted-ladder  swap rates: {rates_a.round(2)}  (spread {rates_a.std():.3f})")
print(f"adapted betas: {np.asarray(r_adapt.info.betas).round(4)}")
