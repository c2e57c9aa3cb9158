"""Exporting traces to ArviZ: the ecosystem's standard diagnostics tooling.

The reference's users plot traces by hand in notebooks (the library ships
no diagnostics at all — reference: hamiltorch/util.py:25-89 is a progress
bar); here every sampler result converts to ArviZ's InferenceData in one
call (``diagnostics.to_arviz``), or — with no extra dependency — to the
same (chain, draw, *shape) layout as plain dicts
(``diagnostics.to_inference_dict``).

Run: python examples/arviz_export_example.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from _smoke_budget import budget

from hamiltorch_tpu.diagnostics import summary, to_inference_dict
from hamiltorch_tpu.samplers.driver import MCMCConfig
from hamiltorch_tpu.samplers.hmc import run_hmc_chains
from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts_chains

scales = jnp.asarray([0.5, 1.0, 2.0])
lp = lambda t: -0.5 * jnp.sum((t / scales) ** 2)
key = jax.random.key(0)

# --- a 4-chain HMC run and a 4-chain NUTS run ------------------------------
r_hmc = run_hmc_chains(
    key, lp, jnp.zeros(3),
    MCMCConfig(num_samples=budget(1000, 100), num_steps_per_sample=8,
               step_size=0.3),
    num_chains=4,
)
nuts_out = run_nuts_chains(
    key, lp, jnp.zeros(3),
    NUTSConfig(num_samples=budget(1000, 100), step_size=0.5,
               burn=budget(300, 30)),
    num_chains=4,
)

# --- dependency-free export: ArviZ's from_dict layout ----------------------
d = to_inference_dict(r_hmc)
print("posterior vars:", {k: v.shape for k, v in d["posterior"].items()})
print("sample_stats  :", sorted(d["sample_stats"]))
print("divergences   :", int(d["sample_stats"]["diverging"].sum()))

# --- full InferenceData when arviz is installed ----------------------------
try:
    import arviz

    from hamiltorch_tpu.diagnostics import to_arviz

    idata = to_arviz(nuts_out)  # the (result, info) tuple, as returned
    print("\narviz summary (NUTS):")
    print(arviz.summary(idata, kind="diagnostics"))
except ImportError:
    # same numbers from the built-in diagnostics
    s = summary(nuts_out[0].samples, energies=np.asarray(nuts_out[1].energy))
    print("\n(arviz not installed; built-in summary)")
    print("  ess_bulk  :", np.round(np.asarray(s["ess_bulk"]), 0).tolist())
    print("  r_hat_rank:", np.round(np.asarray(s["r_hat_rank"]), 3).tolist())
    print("  e_bfmi    :", np.round(np.asarray(s["e_bfmi"]), 2).tolist())
