"""MAP estimation tests: analytic optimum, pytree states, the BNN
potential's operand protocol, non-finite rejection, and warm-started
sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamiltorch_tpu.optim import map_estimate

MU = jnp.array([1.0, -2.0, 0.5])
S2 = jnp.array([0.5, 1.0, 2.0])


def log_prob(t):
    return -0.5 * jnp.sum((t - MU) ** 2 / S2)


class TestMAP:
    def test_gaussian_map_is_mean(self):
        r = map_estimate(log_prob, jnp.zeros(3), num_steps=500,
                         learning_rate=0.05)
        np.testing.assert_allclose(np.asarray(r.theta), np.asarray(MU),
                                   atol=1e-3)
        assert float(r.log_prob) > -1e-5
        assert int(r.num_rejected) == 0
        assert r.log_prob_trace.shape == (500,)
        # trace ascends overall
        assert float(r.log_prob_trace[-1]) > float(r.log_prob_trace[0])

    def test_pytree_theta(self):
        def lp(t):
            return -0.5 * (
                jnp.sum((t["a"] - 1.0) ** 2) + jnp.sum((t["b"] + 2.0) ** 2)
            )

        r = map_estimate(lp, {"a": jnp.zeros(()), "b": jnp.zeros(2)},
                         num_steps=400, learning_rate=0.05)
        assert abs(float(r.theta["a"]) - 1.0) < 1e-3
        np.testing.assert_allclose(np.asarray(r.theta["b"]), [-2.0, -2.0],
                                   atol=1e-3)

    def test_custom_optimizer(self):
        optax = pytest.importorskip("optax")
        r = map_estimate(log_prob, jnp.zeros(3), num_steps=2000,
                         optimizer=optax.sgd(0.05))
        np.testing.assert_allclose(np.asarray(r.theta), np.asarray(MU),
                                   atol=1e-3)

    def test_bnn_potential_operand_protocol(self):
        """define_model_log_prob potentials carry _raw_fn/_data; the fit
        must route the dataset as a jit operand and improve the posterior
        density."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.bnn import define_model_log_prob

        torch.manual_seed(0)
        net = torch.nn.Sequential(torch.nn.Linear(2, 8), torch.nn.Tanh(),
                                  torch.nn.Linear(8, 1))
        x = torch.randn(32, 2)
        y = torch.randn(32, 1)
        lp, flat0, _ = define_model_log_prob(net, "regression", x, y)
        r = map_estimate(lp, flat0, num_steps=300, learning_rate=1e-2)
        assert float(r.log_prob) > float(r.log_prob_trace[0])
        assert bool(np.isfinite(np.asarray(r.theta)).all())

    def test_nonfinite_steps_rejected_best_kept(self):
        """A cliff beyond |t| > 1 produces non-finite values; the best
        iterate stays finite and the rejection counter reports."""

        def cliff(t):
            return jnp.where(
                jnp.max(jnp.abs(t)) < 1.0,
                -0.5 * jnp.sum((t - 0.9) ** 2),
                jnp.asarray(jnp.nan),
            )

        r = map_estimate(cliff, jnp.zeros(2), num_steps=200,
                         learning_rate=0.2)
        assert bool(np.isfinite(np.asarray(r.theta)).all())
        assert bool(np.isfinite(float(r.log_prob)))

    def test_warm_start_sampling(self, key):
        """The round trip the notebooks do by hand: MAP fit, then sample
        from the optimum."""
        from hamiltorch_tpu.samplers import MCMCConfig, run_hmc

        r = map_estimate(log_prob, jnp.zeros(3), num_steps=300,
                         learning_rate=0.05)
        cfg = MCMCConfig(num_samples=200, num_steps_per_sample=5,
                         step_size=0.3)
        out = run_hmc(key, log_prob, r.theta, cfg)
        assert bool(np.isfinite(np.asarray(out.samples)).all())
        # chain starts at the mode: no burn needed for a sane mean
        np.testing.assert_allclose(
            np.asarray(out.samples).mean(0), np.asarray(MU), atol=0.5
        )

    def test_validation(self):
        with pytest.raises(ValueError, match="num_steps"):
            map_estimate(log_prob, jnp.zeros(3), num_steps=0)
