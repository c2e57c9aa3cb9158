"""Multi-host (pod-scale) initialisation helpers.

The reference is strictly single-process (SURVEY.md §2: no distributed
backend of any kind; its multi-chain story is a host thread pool,
reference: hamiltorch/util.py:392-404).  Scaling past one host in JAX is
single-controller SPMD: every host runs the same program,
``jax.distributed.initialize`` wires the hosts over DCN, and the global
device mesh spans all chips.  Chains shard over the global mesh exactly as
in parallel/sharding.py — the collectives (the data-axis psum) ride ICI
within a slice and DCN across slices, so lay the 'data' axis along ICI
(minor mesh dims) and the 'chains' axis across hosts (no communication).

The cross-process layer is exercised for real in CI on a LOCALHOST
cluster: :func:`launch_localhost_cluster` spawns N subprocesses, each a
JAX process with ``xla_force_host_platform_device_count`` virtual CPU
devices, wires them through ``initialize_multihost``, runs the sharded
samplers over the global mesh, and gathers the traces — which match a
single-process run over the same geometry bit-for-bit
(tests/test_multihost.py).  ``python -m hamiltorch_tpu.parallel.multihost``
runs one worker of that cluster (used by the launcher; also a template for
real pod launch scripts).
"""

from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialise JAX's distributed runtime (no-op if single-process).

    On TPU pods created with standard tooling all arguments are discovered
    from the environment; pass them explicitly otherwise (e.g. the
    localhost CPU cluster: ``coordinator_address="localhost:<port>"``,
    ``num_processes=N``, ``process_id=i``).  Returns a small info dict for
    logging.
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


# --------------------------------------------------------------------------
# Localhost cluster self-test: the cross-process layer run for real.
# --------------------------------------------------------------------------

def _selftest_chains(key):
    """Chains-sharded HMC over the global mesh (zero-communication axis:
    each process's devices run their own chains)."""
    import jax.numpy as jnp

    from ..samplers.driver import MCMCConfig
    from .sharding import run_hmc_chains_sharded

    lp = lambda t: -0.5 * jnp.sum(t**2)  # noqa: E731
    cfg = MCMCConfig(num_samples=12, num_steps_per_sample=3, step_size=0.25)
    mesh = global_chain_mesh(data_parallelism=1)
    r = run_hmc_chains_sharded(key, lp, jnp.zeros(3), cfg, mesh,
                               num_chains=len(jax.devices()))
    return r.samples


def _selftest_psum(key):
    """Data-sharded HMC over the global mesh: the likelihood value AND its
    AD-transposed gradient psum across the 'data' axis every leapfrog step.
    The 'data' axis spans ALL devices (chains=1), so in a multi-process
    launch the collective genuinely crosses the process boundary (DCN on a
    pod; the Gloo ring on the localhost cluster)."""
    import jax.numpy as jnp

    from ..samplers.driver import MCMCConfig
    from .sharding import sample_chains_sharded

    n_dev = len(jax.devices())
    mesh = global_chain_mesh(data_parallelism=n_dev)
    x = jnp.linspace(-1.0, 1.0, 2 * n_dev).reshape(2 * n_dev, 1) * jnp.ones((1, 3))
    y = jnp.sin(3.0 * x[:, 0])
    loglik_shard = lambda t, xs, ys: -12.5 * jnp.sum((xs @ t - ys) ** 2)  # noqa: E731
    log_prior = lambda t: -0.5 * jnp.sum(t**2)  # noqa: E731
    cfg = MCMCConfig(num_samples=12, num_steps_per_sample=3, step_size=0.05)
    r = sample_chains_sharded(key, loglik_shard, log_prior, x, y,
                              jnp.zeros(3), cfg, mesh, num_chains=1)
    return r.samples


def run_cluster_selftest():
    """Run both self-test families on the CURRENT backend (single- or
    multi-process) and return host numpy traces gathered across processes.

    In a multi-process cluster the per-process result arrays are globally
    sharded; ``process_allgather`` materialises the full trace on every
    host.  Single-process, it is the identity fetch — so the returned
    arrays are directly comparable across the two launch modes.
    """
    import numpy as np
    from jax.experimental import multihost_utils

    out = {}
    for name, fn, fold in (("chains", _selftest_chains, 0),
                           ("psum", _selftest_psum, 1)):
        samples = fn(jax.random.fold_in(jax.random.key(7), fold))
        out[name] = np.asarray(
            multihost_utils.process_allgather(samples, tiled=True)
        )
    return out


def launch_localhost_cluster(num_processes: int = 2,
                             devices_per_process: int = 4,
                             timeout: float = 600.0) -> dict:
    """Spawn a ``num_processes``-process JAX cluster on localhost and run
    :func:`run_cluster_selftest` in it.

    Each subprocess is a real JAX process (own runtime, own
    ``xla_force_host_platform_device_count`` virtual CPU devices) wired
    through ``jax.distributed.initialize`` — the same code path a TPU pod
    takes over DCN, minus the hardware.  Returns process 0's gathered
    traces plus the per-process info dicts; raises on any worker failure
    or cross-process disagreement.
    """
    import json
    import socket
    import tempfile

    import numpy as np

    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(
            f"--xla_force_host_platform_device_count={devices_per_process}"
        )
        env["XLA_FLAGS"] = " ".join(flags)
        # keep any existing PYTHONPATH (the axon sitecustomize dir must
        # stay importable) while making this checkout win
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "hamiltorch_tpu.parallel.multihost",
                 f"localhost:{port}", str(num_processes), str(i), td],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(num_processes)
        ]
        logs = []
        failed = False
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
                failed = True
            logs.append(out)
            failed = failed or p.returncode != 0
        if failed:
            raise RuntimeError(
                "localhost cluster worker failed:\n"
                + "\n---\n".join(log[-4000:] for log in logs)
            )

        results, infos = [], []
        for i in range(num_processes):
            z = np.load(os.path.join(td, f"worker_{i}.npz"))
            results.append({k: z[k] for k in z.files if k != "info"})
            infos.append(json.loads(str(z["info"])))
        for info in infos:
            if info["process_count"] != num_processes:
                raise RuntimeError(f"bad cluster wiring: {info}")
        for i in range(1, num_processes):
            for k in results[0]:
                np.testing.assert_array_equal(
                    results[0][k], results[i][k],
                    err_msg=f"process {i} disagrees on '{k}'",
                )
        return {"traces": results[0], "infos": infos}


def _worker_main(argv) -> None:
    """One process of the localhost cluster (``python -m ...multihost
    <coordinator> <num_processes> <process_id> <outdir>``)."""
    import json

    import numpy as np

    coordinator, nproc, pid, outdir = (
        argv[0], int(argv[1]), int(argv[2]), argv[3])
    # the axon sitecustomize force-registers the TPU platform and overrides
    # JAX_PLATFORMS; config.update wins (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    info = initialize_multihost(coordinator_address=coordinator,
                                num_processes=nproc, process_id=pid)
    assert info["process_count"] == nproc, info
    traces = run_cluster_selftest()
    np.savez(os.path.join(outdir, f"worker_{pid}.npz"),
             info=json.dumps(info), **traces)


if __name__ == "__main__":
    _worker_main(sys.argv[1:])
