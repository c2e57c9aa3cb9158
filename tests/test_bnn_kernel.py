"""Fused BNN-HMC kernel: gradient-exactness and logic tests (interpret mode).

The interpret-mode PRNG returns constant bits, which makes the kernel's
momentum refresh and MH uniform DETERMINISTIC constants — so one kernel
draw becomes a reproducible function we can cross-check against a pure-JAX
reimplementation of the same leapfrog step using jax.grad of the identical
potential.  This validates the hand-written MLP backprop end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.kernels.bnn_hmc import bnn_hmc

ON_TPU = jax.default_backend() == "tpu"


def _potential(x, y, tau):
    def logp(params):
        w1, b1, w2, b2 = params
        h = jnp.tanh(x @ w1 + b1[None, :])
        o = h @ w2[:, None] + b2
        ll = -0.5 * tau * jnp.sum((o - y) ** 2)
        prior = -0.5 * (
            jnp.sum(w1**2) + jnp.sum(b1**2) + jnp.sum(w2**2) + b2**2
        )
        return ll + prior

    return logp


@pytest.mark.slow
class TestFusedBNNKernelLogic:
    def setup_method(self, _):
        rng = np.random.RandomState(0)
        self.i_dim, self.h, self.n = 128, 128, 64
        self.x = jnp.asarray(rng.randn(self.n, self.i_dim), jnp.float32)
        self.y = jnp.asarray(rng.randn(self.n, 1), jnp.float32)
        self.tau = 1.0
        key = jax.random.key(0)
        self.w1 = 0.01 * jax.random.normal(key, (1, self.i_dim, self.h))
        self.b1 = jnp.zeros((1, self.h))
        self.w2 = 0.01 * jax.random.normal(jax.random.key(1), (1, self.h))
        self.b2 = jnp.zeros((1,))

    def _run_kernel(self, num_samples, num_steps, eps):
        return bnn_hmc(
            0, self.x, self.y, self.w1, self.b1, self.w2, self.b2,
            num_samples=num_samples, num_steps=num_steps, step_size=eps,
            tau=self.tau, interpret=not ON_TPU,
        )

    def test_runs_and_finite(self):
        w1f, b1f, w2f, b2f, acc = self._run_kernel(2, 2, 1e-3)
        for t in (w1f, b1f, w2f, b2f):
            assert bool(jnp.all(jnp.isfinite(t)))
        assert acc.shape == (1,)

    @pytest.mark.skipif(ON_TPU, reason="needs the deterministic interpret PRNG")
    def test_trajectory_matches_autodiff_reference(self):
        """One kernel draw with the interpret PRNG's constant momentum must
        equal a pure-JAX leapfrog using jax.grad of the same potential."""
        eps, L = 1e-3, 3
        w1f, b1f, w2f, b2f, acc = self._run_kernel(1, L, eps)

        # reproduce the interpret PRNG constants
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from hamiltorch_tpu.kernels.gaussian_hmc import _normals, _uniforms

        def probe_kernel(seed_ref, nrm_ref, uni_ref):
            pltpu.prng_seed(seed_ref[0])
            nrm_ref[:] = _normals(nrm_ref.shape)
            uni_ref[:] = _uniforms(uni_ref.shape)

        nrm, uni = pl.pallas_call(
            probe_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
                jax.ShapeDtypeStruct((8, 128), jnp.float32),
            ],
            interpret=pltpu.InterpretParams(),
        )(jnp.zeros(1, jnp.int32))
        z_const = float(nrm[0, 0])  # every normal equals this in interpret mode

        logp_fn = _potential(self.x, self.y, self.tau)
        params0 = (self.w1[0], self.b1[0], self.w2[0], float(self.b2[0]))
        p0 = tuple(jnp.full(jnp.shape(t), z_const) for t in params0)

        vg = jax.value_and_grad(logp_fn)
        logp, g = vg(params0)
        p = jax.tree_util.tree_map(lambda pi, gi: pi + 0.5 * eps * gi, p0, g)
        th = params0
        for _ in range(L):
            th = jax.tree_util.tree_map(lambda ti, pi: ti + eps * pi, th, p)
            logp, g = vg(th)
            p = jax.tree_util.tree_map(lambda pi, gi: pi + eps * gi, p, g)
        p = jax.tree_util.tree_map(lambda pi, gi: pi - 0.5 * eps * gi, p, g)

        # interpret-mode accept decision: same constant uniform every draw
        h0 = -logp_fn(params0) + sum(0.5 * jnp.sum(jnp.square(t)) for t in p0)
        h1 = -logp + sum(0.5 * jnp.sum(jnp.square(t)) for t in p)
        accept = (h0 - h1) >= jnp.log(uni[0, 0])
        expected = th if bool(accept) else params0

        np.testing.assert_allclose(np.asarray(w1f[0]), np.asarray(expected[0]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(b1f[0]), np.asarray(expected[1]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(w2f[0]), np.asarray(expected[2]), atol=2e-5)
        np.testing.assert_allclose(float(b2f[0]), float(expected[3]), atol=2e-5)
