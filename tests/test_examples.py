"""Examples freshness gate (VERDICT r4 item 4).

docs/DESIGN.md and docs/BENCHMARKS.md cite example outputs; without a
gate the examples can silently rot while the docs keep citing them.
Every example runs here as a subprocess with ``HT_EXAMPLE_SMOKE=1``
(seconds-scale budgets, see examples/_smoke_budget.py) on the virtual
8-device CPU mesh — an example that stops importing or running fails CI.

The TPU tier (HT_TESTS_ON_TPU=1) spot-checks one example on the real chip
with the same smoke budgets (no JAX_PLATFORMS=cpu, so the axon backend is
kept).
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = sorted(
    p.name for p in (REPO / "examples").glob("*.py") if not p.name.startswith("_")
)
ON_TPU = jax.default_backend() == "tpu"


def _run_example(name: str, cpu: bool) -> None:
    env = dict(os.environ)
    env["HT_EXAMPLE_SMOKE"] = "1"
    if cpu:
        # the example's _smoke_budget import honours this even under the
        # axon sitecustomize (jax.config.update wins); the device-count
        # flag gives sharded_sampling.py its virtual 8-device mesh
        env["JAX_PLATFORMS"] = "cpu"
        xla = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in xla:
            env["XLA_FLAGS"] = (
                xla + " --xla_force_host_platform_device_count=8"
            ).strip()
    # never override PYTHONPATH wholesale (CLAUDE.md: /root/.axon_site
    # must stay importable); just make sure the repo root is on it
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "examples" / name)],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"example {name} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}"
    )


@pytest.mark.slow
@pytest.mark.skipif(ON_TPU, reason="CPU-mesh tier; the TPU tier spot-checks")
@pytest.mark.parametrize("name", EXAMPLES)
def test_example_smoke_cpu(name):
    _run_example(name, cpu=True)


@pytest.mark.skipif(not ON_TPU, reason="real-chip spot check")
def test_example_smoke_tpu_spot():
    # one example on the real chip: the flagship-adjacent pytree BNN path
    _run_example("pytree_bnn_example.py", cpu=False)
