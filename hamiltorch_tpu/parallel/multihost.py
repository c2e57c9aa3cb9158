"""Multi-host (pod-scale) initialisation helpers.

The reference is strictly single-process (SURVEY.md §2: no distributed
backend of any kind).  Scaling past one host in JAX is single-controller:
every host runs the same program, ``jax.distributed.initialize`` wires the
hosts over DCN, and the global device mesh spans all chips.  Chains shard
over the global mesh exactly as in parallel/sharding.py — the collectives
(the data-axis psum) ride ICI within a slice and DCN across slices, so lay
the 'data' axis along ICI (minor mesh dims) and the 'chains' axis across
hosts (no communication).

Cannot be exercised in single-host CI; the sharding logic itself is tested
on the virtual 8-device CPU mesh (tests/test_sharding.py), which compiles
the identical SPMD program.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialise JAX's distributed runtime (no-op if single-process).

    On TPU pods created with standard tooling all arguments are discovered
    from the environment; pass them explicitly otherwise.  Returns a small
    info dict for logging.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_chain_mesh(data_parallelism: int = 1):
    """Mesh over ALL devices (all hosts): trailing (ICI-adjacent) dims carry
    the 'data' axis, everything else is independent 'chains'."""
    from .sharding import make_mesh

    n = len(jax.devices())
    if n % data_parallelism:
        raise ValueError(f"{n} devices not divisible by data={data_parallelism}")
    return make_mesh(chains=n // data_parallelism, data=data_parallelism)
