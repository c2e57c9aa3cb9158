"""Reference-parity utility tests (mirrors tests/test_util.py of the
reference: flatten/unflatten round-trip, functionalisation equivalence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.utils import (
    LogProbError,
    flatten,
    gradient,
    has_nan_or_inf,
    hessian,
    jacobian,
    make_functional,
    unflatten,
)


class TestFlattenUnflatten:
    def test_pytree_round_trip(self):
        params = [jnp.arange(6.0).reshape(2, 3), jnp.ones(4)]
        flat = flatten(params)
        assert flat.shape == (10,)
        back = unflatten(params, flat)
        for a, b in zip(back, params):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_torch_module_round_trip(self):
        torch = pytest.importorskip("torch")
        net = torch.nn.Linear(3, 2)
        flat = flatten(net)
        ref = torch.cat([p.flatten() for p in net.parameters()]).detach().numpy()
        np.testing.assert_allclose(np.asarray(flat), ref, atol=1e-6)
        parts = unflatten(net, flat)
        assert parts[0].shape == (2, 3) and parts[1].shape == (2,)

    def test_unflatten_rejects_2d(self):
        with pytest.raises(ValueError):
            unflatten([jnp.ones(2)], jnp.ones((2, 1)))


class TestFunctional:
    def test_torch_linear_functional_matches(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)
        net = torch.nn.Linear(4, 2)
        fmodel = make_functional(net)
        x = np.random.RandomState(0).randn(5, 4).astype(np.float32)
        params = unflatten(net, flatten(net))
        out = fmodel(jnp.asarray(x), params)
        ref = net(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_jax_model_passthrough(self):
        f = lambda params, x: x * params[0]
        assert make_functional(f) is f


class TestAutodiffHelpers:
    def test_gradient(self):
        f = lambda t: jnp.sum(t**2)
        np.testing.assert_allclose(
            np.asarray(gradient(f, jnp.array([1.0, 2.0]))), [2.0, 4.0]
        )

    def test_hessian(self):
        f = lambda t: t[0] ** 2 * t[1]
        h = np.asarray(hessian(f, jnp.array([1.0, 3.0])))
        np.testing.assert_allclose(h, [[6.0, 2.0], [2.0, 0.0]])

    def test_jacobian(self):
        f = lambda t: jnp.array([t[0] * t[1], t[0] + t[1]])
        j = np.asarray(jacobian(f, jnp.array([2.0, 3.0])))
        np.testing.assert_allclose(j, [[3.0, 2.0], [1.0, 1.0]])


class TestNumericsGuards:
    def test_has_nan_or_inf(self):
        assert has_nan_or_inf(jnp.array([1.0, jnp.nan]))
        assert has_nan_or_inf(jnp.inf)
        assert not has_nan_or_inf(jnp.ones(3))

    def test_log_prob_error_exists(self):
        with pytest.raises(LogProbError):
            raise LogProbError()


class TestProgressBar:
    def test_runs_and_formats(self, capsys):
        from hamiltorch_tpu.utils import ProgressBar

        bar = ProgressBar("Sampling", 10)
        for i in range(10):
            bar.update(i)
        bar.end("done")
        out = capsys.readouterr().out
        assert "Sampling" in out and "done" in out and "/sec" in out


class TestProfiling:
    def test_throughput_counters(self, key):
        import hamiltorch_tpu as ht
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.utils.profiling import throughput, timed

        lp = lambda t: -0.5 * jnp.dot(t, t)
        cfg = MCMCConfig(num_samples=50, num_steps_per_sample=5, step_size=0.2)
        with timed() as t:
            result = ht.run_hmc_chains(key, lp, jnp.zeros(2), cfg, num_chains=4)
            jax.block_until_ready(result.samples)
        out = throughput(result, t["seconds"], num_steps_per_sample=5)
        assert out["chains"] == 4 and out["draws_per_chain"] == 50
        assert out["samples_per_sec"] > 0
        assert out["grad_steps_per_sec"] == out["samples_per_sec"] * 5

    def test_multihost_noop_single_process(self):
        from hamiltorch_tpu.parallel.multihost import initialize_multihost

        info = initialize_multihost()
        assert info["process_count"] == 1
        assert info["global_devices"] == 8


class TestUtilAliasModule:
    def test_util_namespace(self):
        from hamiltorch_tpu import util

        assert callable(util.flatten) and callable(util.setup_chain)
        assert callable(util.multi_chain) and callable(util.eval_print)


class TestCompatArbitraryTorchModule:
    def test_flatten_custom_forward_module(self):
        """flatten/unflatten need only parameters(), so arbitrary custom
        torch modules must work (code-review finding)."""
        torch = pytest.importorskip("torch")

        class Weird(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.a = torch.nn.Linear(3, 2)
                self.b = torch.nn.Linear(2, 2)

            def forward(self, x):  # untranslatable custom forward
                return self.b(torch.sin(self.a(x))) + x.sum()

        net = Weird()
        flat = flatten(net)
        ref = torch.cat([p.flatten() for p in net.parameters()]).detach().numpy()
        np.testing.assert_allclose(np.asarray(flat), ref, atol=1e-6)
        parts = unflatten(net, flat)
        assert parts[0].shape == (2, 3)


class TestSetupChainPriorDispatch:
    def test_internal_type_error_propagates(self):
        """A keyed prior whose body raises TypeError must NOT be silently
        retried with no arguments."""
        from hamiltorch_tpu.parallel.chains import setup_chain

        def buggy_prior(key):
            raise TypeError("bug inside the prior")

        chain = setup_chain(lambda params_init, key: params_init, buggy_prior, {})
        with pytest.raises(TypeError, match="bug inside the prior"):
            chain(0)

    def test_zero_arg_prior_supported(self):
        from hamiltorch_tpu.parallel.chains import setup_chain

        chain = setup_chain(
            lambda params_init, key: params_init, lambda: jnp.ones(2), {}
        )
        np.testing.assert_allclose(np.asarray(chain(0)), 1.0)
