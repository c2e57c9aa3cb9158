"""Example smoke mode: seconds-scale budgets for the CI freshness gate.

``HT_EXAMPLE_SMOKE=1`` makes every example swap its full budgets (draw
counts, dataset sizes, particle counts) for tiny ones via
``budget(full, smoke)`` — the point is that an example that stops
importing or running FAILS CI (tests/test_examples.py), while full runs
stay untouched for humans.  Importing this module also honours a
requested ``JAX_PLATFORMS=cpu`` even under site hooks that force a TPU
platform (only ``jax.config.update`` wins over those; see CLAUDE.md) —
the CPU tier of the gate runs every example on the virtual 8-device CPU
mesh, the TPU tier spot-checks one on the real chip without this var.
"""

import os

SMOKE = bool(os.environ.get("HT_EXAMPLE_SMOKE"))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def budget(full, smoke):
    """``full`` normally; ``smoke`` under HT_EXAMPLE_SMOKE=1."""
    return smoke if SMOKE else full
