"""BNN layer tests: likelihood parity vs torch, priors, sample/predict flow,
torch-module interop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

import hamiltorch_tpu as ht
from hamiltorch_tpu.models.bnn import (
    define_model_log_prob,
    gaussian_prior_log_prob,
    log_likelihood,
    predict_model,
    sample_model,
)


class MLP(nn.Module):
    features: tuple = (16, 1)

    @nn.compact
    def __call__(self, x):
        for f in self.features[:-1]:
            x = jnp.tanh(nn.Dense(f)(x))
        return nn.Dense(self.features[-1])(x)


class TestLikelihoodParityVsTorch:
    """The likelihood zoo must match the reference's torch losses
    (reference: hamiltorch/samplers.py:1170-1190) numerically."""

    def setup_method(self, _):
        torch = pytest.importorskip("torch")
        self.torch = torch

    def test_bce_with_logits(self):
        torch = self.torch
        rng = np.random.RandomState(0)
        z = rng.randn(7, 1).astype(np.float32)
        y = (rng.rand(7, 1) > 0.5).astype(np.float32)
        ref = -2.5 * torch.nn.BCEWithLogitsLoss(reduction="sum")(
            torch.tensor(z), torch.tensor(y)
        )
        ours = log_likelihood(jnp.asarray(z), jnp.asarray(y), "binary_class_linear_output", 2.5)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_cross_entropy(self):
        torch = self.torch
        rng = np.random.RandomState(1)
        z = rng.randn(9, 4).astype(np.float32)
        y = rng.randint(0, 4, size=(9,))
        ref = -1.0 * torch.nn.CrossEntropyLoss(reduction="sum")(
            torch.tensor(z), torch.tensor(y)
        )
        ours = log_likelihood(jnp.asarray(z), jnp.asarray(y), "multi_class_linear_output", 1.0)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_nll_log_softmax(self):
        torch = self.torch
        rng = np.random.RandomState(2)
        z = rng.randn(5, 3).astype(np.float32)
        logz = np.asarray(jax.nn.log_softmax(jnp.asarray(z), axis=-1))
        y = rng.randint(0, 3, size=(5,))
        # the reference's nll_loss uses the DEFAULT reduction ('mean')
        ref = -torch.nn.functional.nll_loss(torch.tensor(logz), torch.tensor(y))
        ours = log_likelihood(jnp.asarray(logz), jnp.asarray(y), "multi_class_log_softmax_output", 1.0)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_regression(self):
        out = jnp.array([[1.0], [2.0]])
        y = jnp.array([[0.5], [2.5]])
        # -0.5 * tau * sum((out-y)^2) = -0.5 * 3 * 0.5
        np.testing.assert_allclose(
            float(log_likelihood(out, y, "regression", 3.0)), -0.75, rtol=1e-6
        )

    def test_custom_callable(self):
        loss = lambda pred, y: (pred - y) ** 4
        out, y = jnp.ones((3, 1)), jnp.zeros((3, 1))
        np.testing.assert_allclose(
            float(log_likelihood(out, y, loss, 1.0)), -3.0, rtol=1e-6
        )

    def test_prior_matches_torch_normal(self):
        torch = self.torch
        w = np.linspace(-1, 1, 10).astype(np.float32)
        tau = 2.0
        ref = (
            torch.distributions.Normal(torch.zeros(10), tau ** -0.5)
            .log_prob(torch.tensor(w))
            .sum()
        )
        ours = gaussian_prior_log_prob([jnp.asarray(w)], [tau])
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


class TestModelLogProb:
    def test_prior_only_when_x_none(self):
        model = MLP(features=(4, 1))
        x_ex = jnp.ones((3, 2))
        lp_fn, flat, _ = define_model_log_prob(model, "regression", None, None, x_example=x_ex)
        theta = jnp.zeros_like(flat)
        d = flat.shape[0]
        expected = -0.5 * d * np.log(2 * np.pi)  # N(0,1) at zero
        np.testing.assert_allclose(float(lp_fn(theta)), expected, rtol=1e-5)

    def test_prior_scale_divides(self):
        model = MLP(features=(4, 1))
        x_ex = jnp.ones((3, 2))
        lp1, flat, _ = define_model_log_prob(model, "regression", None, None, x_example=x_ex)
        lp5, _, _ = define_model_log_prob(
            model, "regression", None, None, x_example=x_ex, prior_scale=5.0
        )
        theta = 0.3 * jnp.ones_like(flat)
        np.testing.assert_allclose(float(lp5(theta)) * 5.0, float(lp1(theta)), rtol=1e-5)


class TestSamplePredictFlow:
    def test_regression_bnn_end_to_end(self, key):
        x = jnp.linspace(-1, 1, 16)[:, None]
        y = jnp.sin(3 * x)
        model = MLP(features=(8, 1))
        tau_list = [1.0] * 4  # 2 Dense layers x (kernel, bias)
        samples = sample_model(
            model, x, y, model_loss="regression", num_samples=200,
            num_steps_per_sample=20, step_size=0.002, tau_out=100.0,
            tau_list=tau_list, key=key, verbose=False,
        )
        assert samples.ndim == 2
        preds, lps = predict_model(
            model, samples[50:], x=x, y=y, model_loss="regression",
            tau_out=100.0, tau_list=tau_list,
        )
        assert preds.shape == (samples.shape[0] - 50, 16, 1)
        assert lps.shape == (samples.shape[0] - 50,)
        assert bool(jnp.all(jnp.isfinite(preds)))
        rmse = float(jnp.sqrt(jnp.mean((preds.mean(0) - y) ** 2)))
        assert rmse < 0.5  # posterior mean fits the data

    def test_classification_bnn(self, key):
        # iris-like: 3 separable clusters
        rng = np.random.RandomState(0)
        centers = np.array([[2, 0], [-2, 0], [0, 2.5]])
        x = np.concatenate([centers[i] + 0.3 * rng.randn(10, 2) for i in range(3)])
        ylab = np.repeat(np.arange(3), 10)
        model = MLP(features=(8, 3))
        samples = sample_model(
            model, jnp.asarray(x, jnp.float32), jnp.asarray(ylab),
            model_loss="multi_class_linear_output", num_samples=300,
            num_steps_per_sample=15, step_size=0.01, key=key, verbose=False,
        )
        preds, _ = predict_model(
            model, samples[100:], x=jnp.asarray(x, jnp.float32), y=jnp.asarray(ylab),
            model_loss="multi_class_linear_output",
        )
        acc = float(jnp.mean(preds.mean(0).argmax(-1) == jnp.asarray(ylab)))
        assert acc > 0.9


class TestTorchInterop:
    def test_sequential_forward_matches_torch(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(0)
        net = torch.nn.Sequential(
            torch.nn.Linear(4, 8), torch.nn.Tanh(), torch.nn.Linear(8, 3),
            torch.nn.LogSoftmax(dim=-1),
        )
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(0).randn(5, 4).astype(np.float32)
        ref = net(torch.tensor(x)).detach().numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_flat_layout_matches_torch_cat(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module
        from hamiltorch_tpu.utils.pytree import ravel_pytree_fn

        torch.manual_seed(1)
        net = torch.nn.Sequential(torch.nn.Linear(3, 2), torch.nn.ReLU(), torch.nn.Linear(2, 1))
        _, template = from_torch_module(net)
        flat, _ = ravel_pytree_fn(template)
        ref_flat = torch.cat([p.flatten() for p in net.parameters()]).detach().numpy()
        np.testing.assert_allclose(np.asarray(flat), ref_flat, atol=1e-6)

    def test_conv_forward_matches_torch(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(2)
        net = torch.nn.Sequential(
            torch.nn.Conv2d(1, 3, 3, padding=1), torch.nn.ReLU(),
            torch.nn.MaxPool2d(2), torch.nn.Flatten(), torch.nn.Linear(3 * 4 * 4, 2),
        )
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(3).randn(2, 1, 8, 8).astype(np.float32)
        ref = net(torch.tensor(x)).detach().numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_sample_model_accepts_torch_module(self, key):
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)
        net = torch.nn.Sequential(torch.nn.Linear(2, 4), torch.nn.Tanh(), torch.nn.Linear(4, 1))
        x = jnp.linspace(-1, 1, 8)[:, None] * jnp.ones((1, 2))
        y = x[:, :1] ** 2
        samples = sample_model(
            net, x, y, model_loss="regression", num_samples=20,
            num_steps_per_sample=5, step_size=0.005, key=key, verbose=False,
        )
        d = sum(p.numel() for p in net.parameters())
        assert samples.shape[1] == d


class TestBatchNormInterop:
    def test_batchnorm2d_matches_torch_training_stats(self):
        """Reference bn patch forces batch statistics (util.py:370-376);
        torch training-mode BatchNorm matches that behaviour."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(0)
        net = torch.nn.Sequential(
            torch.nn.Conv2d(1, 4, 3, padding=1), torch.nn.BatchNorm2d(4),
            torch.nn.ReLU(), torch.nn.Flatten(), torch.nn.Linear(4 * 6 * 6, 2),
        )
        net.train()  # batch statistics
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(0).randn(4, 1, 6, 6).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_batchnorm1d(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(1)
        net = torch.nn.Sequential(torch.nn.Linear(3, 5), torch.nn.BatchNorm1d(5))
        net.train()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(1).randn(8, 3).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-4
        )


@pytest.mark.slow
class TestSamplerCombinations:
    """Model layer x sampler matrix: every sampler family on a BNN potential."""

    def _data(self):
        x = jnp.linspace(-1, 1, 12)[:, None]
        return x, jnp.sin(2 * x)

    def test_sample_model_with_tree_nuts(self, key):
        x, y = self._data()
        samples = sample_model(
            MLP(features=(4, 1)), x, y, model_loss="regression",
            num_samples=60, burn=20, step_size=0.01, tau_out=10.0,
            sampler=ht.Sampler.NUTS, key=key, verbose=False,
        )
        assert samples.shape[0] == 1 + 60 - 20 - 1
        assert bool(jnp.all(jnp.isfinite(samples)))

    def test_chees_on_bnn_potential(self, key):
        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        x, y = self._data()
        lp_fn, flat0, _ = define_model_log_prob(
            MLP(features=(4, 1)), "regression", x, y, tau_out=10.0
        )
        config = ChEESConfig(num_samples=100, step_size=0.01, burn=50,
                             init_trajectory_length=0.1)
        result = run_chees(key, lp_fn, flat0, config, num_chains=8)
        assert result.samples.shape[0] == 8
        assert bool(jnp.all(jnp.isfinite(result.samples)))

    def test_checkpointed_bnn(self, key, tmp_path):
        from hamiltorch_tpu.checkpoint import run_hmc_checkpointed
        from hamiltorch_tpu.samplers.driver import MCMCConfig

        x, y = self._data()
        lp_fn, flat0, _ = define_model_log_prob(
            MLP(features=(4, 1)), "regression", x, y, tau_out=10.0
        )
        cfg = MCMCConfig(num_samples=30, num_steps_per_sample=5, step_size=0.01)
        r = run_hmc_checkpointed(key, lp_fn, flat0, cfg, str(tmp_path / "ck"), chunk_size=10)
        assert r.samples.shape == (30, flat0.shape[0])

    def test_remat_matches_plain(self, key):
        x, y = self._data()
        lp_plain, flat0, _ = define_model_log_prob(
            MLP(features=(4, 1)), "regression", x, y, tau_out=10.0
        )
        lp_remat, _, _ = define_model_log_prob(
            MLP(features=(4, 1)), "regression", x, y, tau_out=10.0, remat=True
        )
        g1 = jax.grad(lp_plain)(flat0)
        g2 = jax.grad(lp_remat)(flat0)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


@pytest.mark.slow
class TestStreamedPredict:
    def test_loader_predict_matches_whole_tensor(self, key):
        """The streamed (lax.scan over batches) loader path must agree with
        the whole-tensor path on the same data."""
        x = jnp.linspace(-1, 1, 24)[:, None]
        y = jnp.sin(3 * x)
        model = MLP(features=(8, 1))
        tau_list = [1.0] * 4
        samples = sample_model(
            model, x, y, model_loss="regression", num_samples=40,
            num_steps_per_sample=10, step_size=0.002, tau_out=100.0,
            tau_list=tau_list, key=key, verbose=False,
        )
        # loader yielding 3 batches of 8
        loader = [(np.asarray(x[i:i + 8]), np.asarray(y[i:i + 8])) for i in range(0, 24, 8)]
        p_stream, lp_stream = predict_model(
            model, samples, test_loader=loader, model_loss="regression",
            tau_out=100.0, tau_list=tau_list,
        )
        p_whole, lp_whole = predict_model(
            model, samples, x=x, y=y, model_loss="regression",
            tau_out=100.0, tau_list=tau_list,
        )
        assert p_stream.shape == p_whole.shape == (40, 24, 1)
        np.testing.assert_allclose(np.asarray(p_stream), np.asarray(p_whole), atol=1e-5)
        np.testing.assert_allclose(np.asarray(lp_stream), np.asarray(lp_whole), rtol=1e-5)

    def test_lazy_streaming_bounds_host_memory(self, key):
        """stream_batches=k consumes the loader lazily (a generator works),
        covers ragged tails, and matches the materialised path exactly."""
        x = jnp.linspace(-1, 1, 26)[:, None]  # 26 = 8*3 + 2 (ragged tail)
        y = jnp.sin(3 * x)
        model = MLP(features=(8, 1))
        tau_list = [1.0] * 4
        samples = sample_model(
            model, x, y, model_loss="regression", num_samples=30,
            num_steps_per_sample=10, step_size=0.002, tau_out=100.0,
            tau_list=tau_list, key=key, verbose=False,
        )

        def loader():  # one-shot generator: lazy consumption required
            for i in range(0, 26, 8):
                yield np.asarray(x[i:i + 8]), np.asarray(y[i:i + 8])

        p_mat, lp_mat = predict_model(
            model, samples, test_loader=list(loader()), model_loss="regression",
            tau_out=100.0, tau_list=tau_list,
        )
        p_str, lp_str = predict_model(
            model, samples, test_loader=loader(), model_loss="regression",
            tau_out=100.0, tau_list=tau_list, stream_batches=2,
        )
        assert isinstance(p_str, np.ndarray)  # chunk results live on host
        assert p_str.shape == (30, 26, 1)
        np.testing.assert_allclose(np.asarray(p_mat), p_str, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lp_mat), lp_str, rtol=1e-5)


class TestTorchFxInterop:
    """Custom-forward torch modules via the torch.fx fallback — the
    equivalent of the reference's make_functional conv test
    (reference: tests/test_util.py:64-95), ported without hand-rewriting."""

    def test_reference_conv_net_custom_forward(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from hamiltorch_tpu.models.interop import from_torch_module

        class Net(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.layers = torch.nn.Sequential(
                    torch.nn.Conv2d(1, 10, kernel_size=5),
                    torch.nn.MaxPool2d(2),
                    torch.nn.ReLU(),
                    torch.nn.Conv2d(10, 20, kernel_size=5),
                    torch.nn.MaxPool2d(2),
                    torch.nn.ReLU(),
                )
                self.fc1 = torch.nn.Linear(320, 50)
                self.fc2 = torch.nn.Linear(50, 10)

            def forward(self, x):
                x = self.layers(x)
                x = x.view(-1, 320)
                x = F.relu(self.fc1(x))
                x = self.fc2(x)
                return F.log_softmax(x, dim=1)

        torch.manual_seed(3)
        net = Net().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(3).randn(10, 1, 28, 28).astype(np.float32)
        ref = net(torch.tensor(x)).detach().numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_skip_connection_and_arithmetic(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Res(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.a = torch.nn.Linear(6, 6)
                self.b = torch.nn.Linear(6, 6)
                self.norm = torch.nn.LayerNorm(6)

            def forward(self, x):
                h = torch.tanh(self.a(x))
                h = x + 0.5 * self.b(h)  # residual + scalar arithmetic
                return self.norm(h).mean(dim=-1)

        torch.manual_seed(4)
        net = Res().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(4).randn(7, 6).astype(np.float32)
        ref = net(torch.tensor(x)).detach().numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_new_leaf_layers_match_torch(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(5)
        net = torch.nn.Sequential(
            torch.nn.ConvTranspose2d(3, 2, 3, stride=2, padding=1, output_padding=1),
            torch.nn.ELU(alpha=0.7),
            torch.nn.Flatten(),
            torch.nn.Linear(2 * 8 * 8, 5),
            torch.nn.LeakyReLU(0.1),
        ).eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(5).randn(2, 3, 4, 4).astype(np.float32)
        ref = net(torch.tensor(x)).detach().numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_embedding_matches_torch(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Emb(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.emb = torch.nn.Embedding(11, 4)
                self.head = torch.nn.Linear(4, 2)

            def forward(self, x):
                return self.head(self.emb(x).mean(dim=1))

        torch.manual_seed(6)
        net = Emb().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(6).randint(0, 11, size=(5, 7))
        ref = net(torch.tensor(x)).detach().numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_fx_model_samples_end_to_end(self, key):
        """A custom-forward torch model goes through sample_model unchanged."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        class Tiny(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.l1 = torch.nn.Linear(2, 8)
                self.l2 = torch.nn.Linear(8, 3)

            def forward(self, x):
                return self.l2(F.relu(self.l1(x)))

        torch.manual_seed(7)
        rng = np.random.RandomState(0)
        centers = np.array([[2, 0], [-2, 0], [0, 2.5]])
        x = np.concatenate([centers[i] + 0.3 * rng.randn(10, 2) for i in range(3)])
        ylab = np.repeat(np.arange(3), 10)
        samples = sample_model(
            Tiny().eval(), jnp.asarray(x, jnp.float32), jnp.asarray(ylab),
            model_loss="multi_class_linear_output", num_samples=200,
            num_steps_per_sample=15, step_size=0.01, key=key, verbose=False,
        )
        preds, _ = predict_model(
            Tiny().eval(), samples[50:], x=jnp.asarray(x, jnp.float32),
            y=jnp.asarray(ylab), model_loss="multi_class_linear_output",
        )
        acc = float(jnp.mean(preds.mean(0).argmax(-1) == jnp.asarray(ylab)))
        assert acc > 0.9

    def test_untraceable_module_clear_error(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class DataDependent(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.l = torch.nn.Linear(2, 2)

            def forward(self, x):
                if x.sum() > 0:  # data-dependent control flow: fx must fail
                    return self.l(x)
                return x

        with pytest.raises(TypeError, match="flax"):
            from_torch_module(DataDependent())

    def test_directly_read_parameter_is_live(self):
        """A forward that reads a bare nn.Parameter must see the sampled
        value, not a frozen trace-time constant (code-review regression)."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Scaled(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.lin = torch.nn.Linear(3, 2)
                self.scale = torch.nn.Parameter(torch.tensor(2.0))

            def forward(self, x):
                return self.lin(x) * self.scale

        torch.manual_seed(8)
        net = Scaled().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(8).randn(4, 3).astype(np.float32)
        ref = net(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5
        )
        # change the scale entry in the template -> output must respond
        idx = [i for i, p in enumerate(net.parameters()) if p.ndim == 0][0]
        template2 = list(template)
        template2[idx] = jnp.asarray(5.0)
        out2 = np.asarray(apply_fn(template2, jnp.asarray(x)))
        np.testing.assert_allclose(out2, ref * 2.5, atol=1e-4)


class TestRNNInterop:
    """RNN-family leaves (the reference re-binds RNN methods in its Scope
    rewriter, util.py:294-316); here they are lax.scan recurrences."""

    @pytest.mark.parametrize("kind", ["RNN", "LSTM", "GRU"])
    @pytest.mark.parametrize("batch_first", [True, False])
    def test_recurrence_matches_torch(self, kind, batch_first):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(11)
        cls = getattr(torch.nn, kind)
        net = cls(input_size=3, hidden_size=5, num_layers=2,
                  batch_first=batch_first).eval()
        apply_fn, template = from_torch_module(net)
        shape = (4, 7, 3) if batch_first else (7, 4, 3)
        x = np.random.RandomState(11).randn(*shape).astype(np.float32)
        with torch.no_grad():
            out_t, hn_t = net(torch.tensor(x))
        (out_j, hn_j), _ = apply_fn(template, jnp.asarray(x)), None
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
        if kind == "LSTM":
            np.testing.assert_allclose(np.asarray(hn_j[0]), hn_t[0].numpy(), atol=1e-5)
            np.testing.assert_allclose(np.asarray(hn_j[1]), hn_t[1].numpy(), atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(hn_j), hn_t.numpy(), atol=1e-5)

    def test_custom_forward_lstm_model(self):
        """Custom forward calling an LSTM (the reference's RNN use case)."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class SeqNet(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.lstm = torch.nn.LSTM(3, 6, batch_first=True)
                self.head = torch.nn.Linear(6, 2)

            def forward(self, x):
                out, _ = self.lstm(x)
                return self.head(out[:, -1])

        torch.manual_seed(12)
        net = SeqNet().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(12).randn(5, 9, 3).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_nested_custom_forward_module(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Block(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.lin = torch.nn.Linear(4, 4)

            def forward(self, x):
                return x + torch.tanh(self.lin(x))  # residual custom forward

        class Outer(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.b1 = Block()
                self.b2 = Block()
                self.head = torch.nn.Linear(4, 1)

            def forward(self, x):
                return self.head(self.b2(self.b1(x)))

        torch.manual_seed(13)
        net = Outer().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(13).randn(6, 4).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5
        )


class TestInteropContracts:
    """Review-driven contracts: the bridge must either translate torch
    semantics exactly or raise — never silently compute something else."""

    @pytest.mark.parametrize("kind", ["RNN", "LSTM", "GRU"])
    def test_unbatched_rnn_input(self, kind):
        """torch >= 1.11 accepts unbatched (T, I) RNN input -> (T, H)."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(21)
        net = getattr(torch.nn, kind)(input_size=3, hidden_size=5,
                                      num_layers=2).eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(21).randn(7, 3).astype(np.float32)
        with torch.no_grad():
            out_t, hn_t = net(torch.tensor(x))
        out_j, hn_j = apply_fn(template, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)
        if kind == "LSTM":
            np.testing.assert_allclose(np.asarray(hn_j[0]), hn_t[0].numpy(), atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(hn_j), hn_t.numpy(), atol=1e-5)

    def test_lstm_with_initial_state(self):
        """A custom forward passing (h0, c0) must use them, not zeros."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Net(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.lstm = torch.nn.LSTM(3, 6, batch_first=True)
                self.register_buffer("h0", torch.randn(1, 5, 6))
                self.register_buffer("c0", torch.randn(1, 5, 6))

            def forward(self, x):
                out, _ = self.lstm(x, (self.h0, self.c0))
                return out[:, -1]

        torch.manual_seed(22)
        net = Net().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(22).randn(5, 9, 3).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_weight_tying(self):
        """Tied weights break flat-order contiguity: torch deduplicates
        module.parameters(), so the tied layer's params are scattered."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Tied(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.enc = torch.nn.Linear(4, 4, bias=False)
                self.mid = torch.nn.Linear(4, 4)
                self.dec = torch.nn.Linear(4, 4)
                self.dec.weight = self.enc.weight  # tie

            def forward(self, x):
                return self.dec(torch.relu(self.mid(torch.relu(self.enc(x)))))

        torch.manual_seed(23)
        net = Tied().eval()
        assert len(list(net.parameters())) == 4  # dedup: enc.w, mid.w, mid.b, dec.b
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(23).randn(6, 4).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5
        )

    def test_pool_ceil_mode_raises(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = torch.nn.Sequential(torch.nn.MaxPool2d(2, ceil_mode=True))
        with pytest.raises(NotImplementedError, match="ceil_mode"):
            from_torch_module(net)

    def test_conv_transpose_groups_error_reaches_user(self):
        """The groups!=1 refusal must surface its OWN message, not get
        swallowed by the TypeError fall-back-to-fx control flow and
        re-raised as an unrelated fx unsupported-op error."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = torch.nn.Sequential(torch.nn.ConvTranspose2d(4, 4, 3, groups=2))
        with pytest.raises(NotImplementedError, match="groups"):
            from_torch_module(net)

    def test_fx_pool_kwargs_raise(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from hamiltorch_tpu.models.interop import from_torch_module

        class Net(torch.nn.Module):
            def forward(self, x):
                return F.avg_pool2d(x, 2, count_include_pad=False)

        apply_fn, template = from_torch_module(Net().eval())
        with pytest.raises(NotImplementedError, match="count_include_pad"):
            apply_fn(template, jnp.ones((1, 1, 4, 4)))

    def test_multi_input_forward_raises(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class TwoInput(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.lin = torch.nn.Linear(4, 4)

            def forward(self, x, mask):
                return self.lin(x) * mask

        with pytest.raises(TypeError, match="tensor inputs"):
            from_torch_module(TwoInput().eval())


class TestBridgeSemantics:
    """Review round 3: exact-translation contracts in the torch bridge."""

    def test_shared_layer_sequential(self):
        """children() dedups repeated objects; the bridge must apply a
        shared layer at EVERY position it appears."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(31)
        lin = torch.nn.Linear(4, 4)
        seq = torch.nn.Sequential(lin, torch.nn.ReLU(), lin).eval()
        apply_fn, template = from_torch_module(seq)
        assert len(template) == 2  # shared weights appear once in the flat order
        x = np.random.RandomState(31).randn(5, 4).astype(np.float32)
        with torch.no_grad():
            ref = seq(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5
        )

    def test_gelu_exact_form(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = torch.nn.Sequential(torch.nn.GELU()).eval()  # approximate='none'
        apply_fn, template = from_torch_module(net)
        x = np.linspace(-3, 3, 101).astype(np.float32)[:, None]
        ref = net(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-6
        )

    def test_flatten_start_dim(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = torch.nn.Sequential(torch.nn.Flatten(start_dim=2)).eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(0).randn(2, 3, 4, 5).astype(np.float32)
        assert np.asarray(apply_fn(template, jnp.asarray(x))).shape == (2, 3, 20)

    def test_predict_model_covers_ragged_final_batch(self):
        """A 10-point loader with batch_size 4 (4+4+2) must predict all 10."""
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader, TensorDataset
        from hamiltorch_tpu.models.bnn import predict_model

        torch.manual_seed(32)
        net = torch.nn.Sequential(torch.nn.Linear(3, 1)).eval()
        x = torch.randn(10, 3)
        y = torch.randn(10, 1)
        loader = DataLoader(TensorDataset(x, y), batch_size=4, shuffle=False)
        samples = jnp.stack([jnp.zeros(4), 0.1 * jnp.ones(4)])
        preds, lps = predict_model(net, samples, test_loader=loader,
                                   model_loss="regression")
        assert preds.shape == (2, 10, 1), preds.shape
        assert lps.shape == (2,)
        assert bool(jnp.all(jnp.isfinite(preds)))


class TestBridgeBreadth:
    """Non-zero conv padding modes and the widened fx op tables."""

    @pytest.mark.parametrize("mode", ["circular", "reflect", "replicate"])
    def test_conv_padding_modes(self, mode):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(41)
        net = torch.nn.Sequential(
            torch.nn.Conv2d(2, 3, 3, padding=1, padding_mode=mode)
        ).eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(41).randn(2, 2, 6, 6).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5
        )

    def test_functional_linear_and_conv(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from hamiltorch_tpu.models.interop import from_torch_module

        class Net(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.w = torch.nn.Parameter(torch.randn(4, 18))
                self.b = torch.nn.Parameter(torch.randn(4))
                self.cw = torch.nn.Parameter(0.3 * torch.randn(2, 2, 3, 3))

            def forward(self, x):
                h = F.conv2d(x, self.cw, stride=1, padding=1)
                h = torch.clamp(h, min=-1.0)
                return F.linear(h.flatten(1), self.w, self.b)

        torch.manual_seed(42)
        net = Net().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(42).randn(5, 2, 3, 3).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5
        )

    def test_tensor_method_zoo(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Net(torch.nn.Module):
            def forward(self, x):
                a, b = x.chunk(2, dim=1)
                m = a.abs().sqrt().clamp(max=2.0)
                top, idx = torch.max(b, dim=1, keepdim=True)
                e = m.masked_fill(m > 1.0, 0.5) + top
                return e.softmax(dim=1)

        net = Net().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(43).randn(4, 6).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5
        )

    def test_expand_and_split(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Net(torch.nn.Module):
            def forward(self, x):
                a, b, c = torch.split(x, [1, 2, 3], dim=1)
                base = a.expand(-1, 3)
                return base + b.sum(dim=1, keepdim=True) + c.mean(dim=1, keepdim=True)

        net = Net().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(44).randn(4, 6).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5
        )


@pytest.mark.slow
class TestBridgeRound3:
    """Round-3 bridge breadth: 1d/3d convs, Group/InstanceNorm, adaptive
    pools, PReLU + activation zoo, and the concrete-trace escape hatch for
    data-dependent control flow (reference: hamiltorch/util.py:253-376)."""

    def _check(self, net, x, atol=1e-5):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = net.eval()
        apply_fn, template = from_torch_module(net)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        got = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=atol)
        return got

    def test_conv1d_net_matches_torch(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(31)
        net = torch.nn.Sequential(
            torch.nn.Conv1d(3, 8, 5, stride=2, padding=2), torch.nn.ReLU(),
            torch.nn.Conv1d(8, 4, 3, padding=1, groups=2, dilation=2),
            torch.nn.AdaptiveAvgPool1d(4), torch.nn.Flatten(),
            torch.nn.Linear(16, 2),
        )
        x = np.random.RandomState(31).randn(2, 3, 20).astype(np.float32)
        self._check(net, x)

    def test_conv3d_net_matches_torch(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(32)
        net = torch.nn.Sequential(
            torch.nn.Conv3d(2, 4, 3, padding=1), torch.nn.SiLU(),
            torch.nn.AdaptiveAvgPool3d(1), torch.nn.Flatten(),
        )
        x = np.random.RandomState(32).randn(2, 2, 5, 6, 7).astype(np.float32)
        self._check(net, x)

    def test_groupnorm_cnn_matches_torch(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(33)
        net = torch.nn.Sequential(
            torch.nn.Conv2d(4, 8, 3, padding=1), torch.nn.GroupNorm(2, 8),
            torch.nn.Hardswish(), torch.nn.AdaptiveAvgPool2d((2, 3)),
            torch.nn.Flatten(), torch.nn.Linear(48, 3),
        )
        x = np.random.RandomState(33).randn(2, 4, 8, 8).astype(np.float32)
        self._check(net, x)

    def test_instancenorm_prelu_matches_torch(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(34)
        net = torch.nn.Sequential(
            torch.nn.Conv2d(3, 6, 3),
            torch.nn.InstanceNorm2d(6, affine=True),
            torch.nn.PReLU(6),
        )
        x = np.random.RandomState(34).randn(2, 3, 9, 9).astype(np.float32)
        self._check(net, x)

    def test_prelu_parameter_is_live(self):
        """PReLU's slope is a sampled parameter: changing its template
        entry must change the output (it is not a baked constant)."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = torch.nn.Sequential(torch.nn.Linear(3, 4), torch.nn.PReLU()).eval()
        apply_fn, template = from_torch_module(net)
        x = jnp.asarray(np.random.RandomState(35).randn(5, 3), jnp.float32)
        out1 = apply_fn(template, x)
        idx = [i for i, p in enumerate(net.parameters()) if p.numel() == 1][0]
        t2 = list(template)
        t2[idx] = jnp.asarray([7.0], jnp.float32)
        out2 = apply_fn(t2, x)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_activation_zoo_matches_torch(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(36)
        net = torch.nn.Sequential(
            torch.nn.Linear(5, 7), torch.nn.Hardtanh(-2, 2),
            torch.nn.Linear(7, 7), torch.nn.Softplus(beta=2.0),
            torch.nn.Mish(), torch.nn.SELU(), torch.nn.CELU(0.5),
            torch.nn.ReLU6(), torch.nn.Hardsigmoid(), torch.nn.Softsign(),
        )
        x = np.random.RandomState(36).randn(4, 5).astype(np.float32)
        self._check(net, x)

    def test_adaptive_pools_ragged_match_torch(self):
        """Non-divisible adaptive pooling uses torch's exact
        floor/ceil bin edges, not a uniform reshape."""
        torch = pytest.importorskip("torch")
        x = np.random.RandomState(37).randn(2, 3, 10, 13).astype(np.float32)
        self._check(torch.nn.Sequential(torch.nn.AdaptiveAvgPool2d((3, 5))), x)
        self._check(torch.nn.Sequential(torch.nn.AdaptiveMaxPool2d((3, 5))), x)

    def test_pool1d_and_unflatten(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(38)
        net = torch.nn.Sequential(
            torch.nn.Conv1d(2, 4, 3), torch.nn.MaxPool1d(2), torch.nn.AvgPool1d(2)
        )
        self._check(net, np.random.RandomState(38).randn(2, 2, 17).astype(np.float32))
        net = torch.nn.Sequential(torch.nn.Linear(6, 12), torch.nn.Unflatten(1, (3, 4)))
        self._check(net, np.random.RandomState(38).randn(2, 6).astype(np.float32))

    def test_fx_functional_norms_and_pads(self):
        """Custom forward exercising the new F.* table entries."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        torch.manual_seed(39)

        class Custom(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.c1 = torch.nn.Conv1d(3, 8, 3, padding=1)
                self.gn_w = torch.nn.Parameter(torch.randn(8))
                self.gn_b = torch.nn.Parameter(torch.randn(8))
                self.lin = torch.nn.Linear(8, 4)
                self.slope = torch.nn.Parameter(torch.randn(1).abs())

            def forward(self, x):
                h = self.c1(x)
                h = F.group_norm(h, 4, self.gn_w, self.gn_b)
                h = F.hardswish(h)
                h = F.pad(h, (1, 1), mode="reflect")
                h = F.adaptive_avg_pool1d(h, 1).squeeze(-1)
                h = F.prelu(self.lin(h), self.slope)
                return F.relu6(h) + torch.sin(h) * F.hardsigmoid(h)

        x = np.random.RandomState(39).randn(2, 3, 11).astype(np.float32)
        self._check(Custom(), x)

    def test_concrete_trace_branch_parity(self):
        """Data-dependent control flow via example_input: torch.jit.trace
        executes the forward eagerly and the taken branch is translated;
        parameters stay live."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        torch.manual_seed(40)

        class DataDependent(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.l = torch.nn.Linear(3, 3)
                self.m = torch.nn.Linear(3, 3)
                self.register_buffer("shift", torch.tensor([0.5, -0.5, 1.0]))

            def forward(self, x):
                h = self.l(x)
                if h.sum() > 0:
                    return (torch.relu(h) + self.shift).mean(-1)
                return (self.m(h) * 2.0).mean(-1)

        net = DataDependent().eval()
        with torch.no_grad():  # pin the positive branch across perturbations
            net.l.bias += 5.0
        rs = np.random.RandomState(40)
        ex = np.abs(rs.randn(4, 3)).astype(np.float32) + 2  # positive branch
        assert float(net.l(torch.tensor(ex)).sum()) > 0
        apply_fn, template = from_torch_module(net, example_input=torch.tensor(ex))
        with torch.no_grad():
            ref = net(torch.tensor(ex)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(ex))), ref, atol=1e-6
        )
        # parameters are live, not baked trace constants
        t2 = list(template)
        t2[0] = t2[0] + 1.0
        with torch.no_grad():
            net.l.weight += 1.0
            ref2 = net(torch.tensor(ex)).numpy()
            net.l.weight -= 1.0
        np.testing.assert_allclose(
            np.asarray(apply_fn(t2, jnp.asarray(ex))), ref2, atol=1e-5
        )
        # the negative-branch example freezes the OTHER path
        with torch.no_grad():
            net.l.bias -= 10.0
        exn = -np.abs(rs.randn(4, 3)).astype(np.float32) - 2
        assert float(net.l(torch.tensor(exn)).sum()) < 0
        apply_n, tpl_n = from_torch_module(net, example_input=torch.tensor(exn))
        with torch.no_grad():
            refn = net(torch.tensor(exn)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_n(tpl_n, jnp.asarray(exn))), refn, atol=1e-6
        )

    def test_concrete_trace_error_without_example(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class DataDependent(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.l = torch.nn.Linear(2, 2)

            def forward(self, x):
                if x.sum() > 0:
                    return self.l(x)
                return x

        with pytest.raises(TypeError, match="example_input"):
            from_torch_module(DataDependent())

    def test_concrete_trace_samples_end_to_end(self, key):
        """sample_model passes x as the trace example automatically, so a
        data-dependent torch forward samples without extra plumbing."""
        torch = pytest.importorskip("torch")

        class Gated(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.l = torch.nn.Linear(2, 1)

            def forward(self, x):
                h = self.l(x)
                if h.abs().sum() >= 0:  # always true, but fx-untraceable
                    return h
                return h * 2.0

        torch.manual_seed(41)
        rs = np.random.RandomState(41)
        x = rs.randn(32, 2).astype(np.float32)
        w = np.array([1.5, -0.8], np.float32)
        y = (x @ w[:, None] + 0.05 * rs.randn(32, 1)).astype(np.float32)
        samples = sample_model(
            Gated().eval(), jnp.asarray(x), jnp.asarray(y),
            model_loss="regression", num_samples=150, num_steps_per_sample=10,
            step_size=0.002, tau_out=100.0, key=key, verbose=False,
        )
        assert bool(jnp.all(jnp.isfinite(samples)))
        post = np.asarray(samples[50:]).mean(0)
        np.testing.assert_allclose(post[:2], w, atol=0.4)


@pytest.mark.slow
class TestAttentionInterop:
    """MultiheadAttention / TransformerEncoder(Layer) through the bridge:
    self- and cross-attention, masks, pre/post-norm, and end-to-end
    sampling of a tiny transformer BNN."""

    def _check(self, net, x, atol=1e-5):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = net.eval()
        apply_fn, template = from_torch_module(net)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        got = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=atol)

    def test_self_attention_matches_torch(self):
        torch = pytest.importorskip("torch")

        class SelfAttn(torch.nn.Module):
            def __init__(self, batch_first, bias):
                super().__init__()
                self.attn = torch.nn.MultiheadAttention(
                    8, 2, bias=bias, batch_first=batch_first)
                self.lin = torch.nn.Linear(8, 3)

            def forward(self, x):
                y, w = self.attn(x, x, x)
                return self.lin(y) + w.sum() * 0.0

        for bf in (True, False):
            for bias in (True, False):
                torch.manual_seed(41)
                x = np.random.RandomState(41).randn(5, 7, 8).astype(np.float32)
                self._check(SelfAttn(bf, bias), x)

    def test_cross_attention_with_masks(self):
        torch = pytest.importorskip("torch")

        class CrossAttn(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.attn = torch.nn.MultiheadAttention(8, 4, batch_first=True)
                self.kv = torch.nn.Linear(8, 8)
                self.register_buffer(
                    "mask", torch.triu(torch.ones(6, 6, dtype=torch.bool), 1))
                self.register_buffer(
                    "kpm", torch.tensor([[False] * 6,
                                         [False, False, False, True, True, True]]))

            def forward(self, x):
                kv = self.kv(x)
                y, _ = self.attn(x, kv, kv, need_weights=False,
                                 attn_mask=self.mask, is_causal=True,
                                 key_padding_mask=self.kpm)
                return y

        torch.manual_seed(42)
        x = np.random.RandomState(42).randn(2, 6, 8).astype(np.float32)
        self._check(CrossAttn(), x)

    def test_unbatched_attention(self):
        torch = pytest.importorskip("torch")

        class Unbatched(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.attn = torch.nn.MultiheadAttention(8, 2)

            def forward(self, x):
                return self.attn(x, x, x)[0]

        torch.manual_seed(43)
        x = np.random.RandomState(43).randn(6, 8).astype(np.float32)
        self._check(Unbatched(), x)

    def test_encoder_layer_pre_and_post_norm(self):
        torch = pytest.importorskip("torch")
        for nf in (False, True):
            torch.manual_seed(44)
            net = torch.nn.TransformerEncoderLayer(
                d_model=8, nhead=2, dim_feedforward=16, batch_first=True,
                dropout=0.0, norm_first=nf)
            x = np.random.RandomState(44).randn(4, 5, 8).astype(np.float32)
            self._check(net, x)

    def test_encoder_stack_gelu_final_norm(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(45)
        net = torch.nn.TransformerEncoder(
            torch.nn.TransformerEncoderLayer(
                8, 2, 16, batch_first=True, dropout=0.0, activation="gelu"),
            num_layers=3, norm=torch.nn.LayerNorm(8))
        x = np.random.RandomState(45).randn(2, 6, 8).astype(np.float32)
        self._check(net, x)

    def test_unsupported_attention_configs_raise(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import _multihead_attention

        with pytest.raises(TypeError, match="kdim|embed_dim"):
            _multihead_attention(
                torch.nn.MultiheadAttention(8, 2, kdim=4, vdim=4))
        with pytest.raises(TypeError, match="add_bias_kv|add_zero_attn"):
            _multihead_attention(
                torch.nn.MultiheadAttention(8, 2, add_bias_kv=True))

    def test_seq2seq_decoder_matches_torch(self):
        """Full encoder->decoder forward through fx: causal self-attention,
        cross-attention over the memory, final norm, pre/post-norm."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Seq2Seq(torch.nn.Module):
            def __init__(self, nf):
                super().__init__()
                self.enc = torch.nn.TransformerEncoder(
                    torch.nn.TransformerEncoderLayer(
                        8, 2, 16, batch_first=True, dropout=0.0),
                    num_layers=1)
                self.dec = torch.nn.TransformerDecoder(
                    torch.nn.TransformerDecoderLayer(
                        8, 2, 16, batch_first=True, dropout=0.0,
                        norm_first=nf),
                    num_layers=2, norm=torch.nn.LayerNorm(8))
                self.register_buffer(
                    "mask", torch.triu(torch.ones(5, 5, dtype=torch.bool), 1))
                self.head = torch.nn.Linear(8, 3)

            def forward(self, x):
                mem = self.enc(x)
                y = self.dec(x, mem, tgt_mask=self.mask, tgt_is_causal=True)
                return self.head(y)

        for nf in (False, True):
            torch.manual_seed(47)
            net = Seq2Seq(nf).eval()
            apply_fn, template = from_torch_module(net)
            x = np.random.RandomState(47).randn(4, 5, 8).astype(np.float32)
            with torch.no_grad():
                ref = net(torch.tensor(x)).numpy()
            np.testing.assert_allclose(
                np.asarray(apply_fn(template, jnp.asarray(x))), ref,
                atol=1e-5)

    def test_sdpa_custom_attention_matches_torch(self):
        """Modern custom attention: qkv projection + .view/.transpose head
        split + F.scaled_dot_product_attention (bool keep-mask and
        is_causal), shape unpacking through the getattr passthrough."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from hamiltorch_tpu.models.interop import from_torch_module

        class CustomAttn(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = torch.nn.Linear(8, 24)
                self.out = torch.nn.Linear(8, 8)
                self.register_buffer(
                    "mask", torch.tril(torch.ones(6, 6, dtype=torch.bool)))

            def forward(self, x):
                n, l, _ = x.shape
                q, k, v = self.qkv(x).chunk(3, dim=-1)
                q = q.view(n, l, 2, 4).transpose(1, 2)
                k = k.view(n, l, 2, 4).transpose(1, 2)
                v = v.view(n, l, 2, 4).transpose(1, 2)
                y = F.scaled_dot_product_attention(q, k, v, attn_mask=self.mask)
                return self.out(y.transpose(1, 2).reshape(n, l, 8))

        torch.manual_seed(48)
        net = CustomAttn().eval()
        apply_fn, template = from_torch_module(net)
        x = np.random.RandomState(48).randn(3, 6, 8).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5)

        class CausalSDPA(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.q = torch.nn.Linear(8, 8)
                self.k = torch.nn.Linear(8, 8)
                self.v = torch.nn.Linear(8, 8)

            def forward(self, x):
                return F.scaled_dot_product_attention(
                    self.q(x), self.k(x), self.v(x), is_causal=True)

        net2 = CausalSDPA().eval()
        apply_fn2, t2 = from_torch_module(net2)
        with torch.no_grad():
            ref2 = net2(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn2(t2, jnp.asarray(x))), ref2, atol=1e-5)

    def test_sample_tiny_transformer_bnn(self, key):
        """End to end: a transformer regression BNN ports and samples."""
        torch = pytest.importorskip("torch")
        torch.manual_seed(46)

        class TinyTransformer(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.emb = torch.nn.Linear(1, 8)
                self.enc = torch.nn.TransformerEncoder(
                    torch.nn.TransformerEncoderLayer(
                        8, 2, 16, batch_first=True, dropout=0.0),
                    num_layers=1)
                self.head = torch.nn.Linear(8, 1)

            def forward(self, x):
                h = self.enc(self.emb(x))
                return self.head(h.mean(dim=1))

        net = TinyTransformer().eval()
        from hamiltorch_tpu.models.interop import from_torch_module

        apply_fn, template = from_torch_module(net)
        x = np.linspace(-1, 1, 8, dtype=np.float32)[:, None, None]  # (N, S=1, 1)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        np.testing.assert_allclose(
            np.asarray(apply_fn(template, jnp.asarray(x))), ref, atol=1e-5)
        y = jnp.sin(2 * jnp.asarray(x[:, 0, :]))
        samples = sample_model(
            net, jnp.asarray(x), y, model_loss="regression",
            num_samples=30, burn=10, step_size=0.001, num_steps_per_sample=5,
            tau_out=10.0, key=key, verbose=False,
        )
        assert bool(jnp.all(jnp.isfinite(samples)))


@pytest.mark.slow
class TestTreeModelLogProb:
    """define_model_tree_log_prob: the pytree-native BNN potential — exact
    value parity with the flat factory, and end-to-end tree sampling."""

    def _setup(self):
        x = jnp.linspace(-1, 1, 12)[:, None]
        y = jnp.sin(2 * x)
        model = MLP(features=(4, 1))
        return model, x, y

    def test_value_and_grad_parity_with_flat(self, key):
        from hamiltorch_tpu.models.bnn import define_model_tree_log_prob
        from hamiltorch_tpu.utils.pytree import ravel_pytree_fn

        model, x, y = self._setup()
        lp_flat, flat0, unravel = define_model_log_prob(
            model, "regression", x, y, tau_out=10.0)
        lp_tree, template = define_model_tree_log_prob(
            model, "regression", x, y, tau_out=10.0)
        theta = flat0 + 0.1 * jax.random.normal(key, flat0.shape)
        tree = unravel(theta)
        np.testing.assert_allclose(
            float(lp_tree(tree)), float(lp_flat(theta)), rtol=1e-6)
        g_tree = jax.grad(lp_tree)(tree)
        g_flat = unravel(jax.grad(lp_flat)(theta))
        for a, b in zip(jax.tree_util.tree_leaves(g_tree),
                        jax.tree_util.tree_leaves(g_flat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_prior_only_and_raw_fn_protocol(self):
        from hamiltorch_tpu.models.bnn import define_model_tree_log_prob

        model, x, _ = self._setup()
        lp, template = define_model_tree_log_prob(
            model, "regression", None, None, x_example=x)
        assert lp._data is None
        d = sum(l.size for l in jax.tree_util.tree_leaves(template))
        zero = jax.tree_util.tree_map(jnp.zeros_like, template)
        np.testing.assert_allclose(
            float(lp(zero)), -0.5 * d * np.log(2 * np.pi), rtol=1e-5)

    def test_tree_nuts_on_bnn_potential(self, key):
        from hamiltorch_tpu.models.bnn import define_model_tree_log_prob
        from hamiltorch_tpu.samplers.nuts import NUTSConfig, run_nuts

        model, x, y = self._setup()
        lp, template = define_model_tree_log_prob(
            model, "regression", x, y, tau_out=10.0)
        cfg = NUTSConfig(num_samples=80, step_size=0.01, burn=30)
        r, info = run_nuts(key, lp, template, cfg)
        leaves = jax.tree_util.tree_leaves(r.samples)
        assert all(l.shape[0] == 80 for l in leaves)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)

    def test_tree_chees_on_bnn_potential(self, key):
        from hamiltorch_tpu.models.bnn import define_model_tree_log_prob
        from hamiltorch_tpu.samplers.chees import ChEESConfig, run_chees

        model, x, y = self._setup()
        lp, template = define_model_tree_log_prob(
            model, "regression", x, y, tau_out=10.0)
        cfg = ChEESConfig(num_samples=100, step_size=0.01, burn=50,
                          init_trajectory_length=0.1)
        r = run_chees(key, lp, template, cfg, num_chains=8)
        leaves = jax.tree_util.tree_leaves(r.samples)
        assert all(l.shape[:2] == (8, 100) for l in leaves)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


@pytest.mark.slow
class TestBridgeRound4:
    """Round-4 bridge stress (VERDICT r3 item 8): standard composite
    blocks — a residual-bottleneck CNN and a small UNet with skip
    concatenation — through from_torch_module, matching torch to 1e-5
    (reference functionalises any module eagerly, util.py:253-376)."""

    def _check(self, net, x, atol=1e-5):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = net.eval()
        apply_fn, template = from_torch_module(net)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        got = np.asarray(apply_fn(template, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=atol)
        return apply_fn, template

    def test_residual_bottleneck_cnn_matches_torch(self):
        torch = pytest.importorskip("torch")
        nn_t = torch.nn

        class Bottleneck(nn_t.Module):
            """ResNet-style 1x1 -> 3x3 -> 1x1 with a projection shortcut."""

            def __init__(self, cin, mid, cout, stride=1):
                super().__init__()
                self.conv1 = nn_t.Conv2d(cin, mid, 1, bias=False)
                self.gn1 = nn_t.GroupNorm(2, mid)
                self.conv2 = nn_t.Conv2d(mid, mid, 3, stride=stride, padding=1,
                                         bias=False)
                self.gn2 = nn_t.GroupNorm(2, mid)
                self.conv3 = nn_t.Conv2d(mid, cout, 1, bias=False)
                self.gn3 = nn_t.GroupNorm(2, cout)
                self.short = nn_t.Sequential(
                    nn_t.Conv2d(cin, cout, 1, stride=stride, bias=False),
                    nn_t.GroupNorm(2, cout),
                )

            def forward(self, x):
                h = torch.relu(self.gn1(self.conv1(x)))
                h = torch.relu(self.gn2(self.conv2(h)))
                h = self.gn3(self.conv3(h))
                return torch.relu(h + self.short(x))

        class ResNet(nn_t.Module):
            def __init__(self):
                super().__init__()
                self.stem = nn_t.Conv2d(3, 8, 3, padding=1)
                self.block1 = Bottleneck(8, 4, 16, stride=2)
                self.block2 = Bottleneck(16, 8, 16)
                self.pool = nn_t.AdaptiveAvgPool2d(1)
                self.head = nn_t.Linear(16, 5)

            def forward(self, x):
                h = torch.relu(self.stem(x))
                h = self.block2(self.block1(h))
                return self.head(torch.flatten(self.pool(h), 1))

        torch.manual_seed(41)
        x = np.random.RandomState(41).randn(2, 3, 12, 12).astype(np.float32)
        apply_fn, template = self._check(ResNet(), x)
        # the bridge output must be differentiable wrt every parameter
        # (sampling needs the full backward path through residual adds)
        g = jax.grad(
            lambda ps: jnp.sum(apply_fn(ps, jnp.asarray(x)) ** 2)
        )(template)
        assert all(bool(jnp.any(gl != 0)) for gl in g)

    def test_small_unet_matches_torch(self):
        torch = pytest.importorskip("torch")
        nn_t = torch.nn

        class UNet(nn_t.Module):
            """Two-level UNet: down (stride-2 convs), up (ConvTranspose2d),
            skip connections by channel concatenation."""

            def __init__(self):
                super().__init__()
                self.enc1 = nn_t.Conv2d(1, 8, 3, padding=1)
                self.down1 = nn_t.Conv2d(8, 16, 3, stride=2, padding=1)
                self.enc2 = nn_t.Conv2d(16, 16, 3, padding=1)
                self.down2 = nn_t.Conv2d(16, 32, 3, stride=2, padding=1)
                self.mid = nn_t.Conv2d(32, 32, 3, padding=1)
                self.up2 = nn_t.ConvTranspose2d(32, 16, 2, stride=2)
                self.dec2 = nn_t.Conv2d(32, 16, 3, padding=1)
                self.up1 = nn_t.ConvTranspose2d(16, 8, 2, stride=2)
                self.dec1 = nn_t.Conv2d(16, 8, 3, padding=1)
                self.out = nn_t.Conv2d(8, 2, 1)

            def forward(self, x):
                e1 = torch.relu(self.enc1(x))
                e2 = torch.relu(self.enc2(torch.relu(self.down1(e1))))
                m = torch.relu(self.mid(torch.relu(self.down2(e2))))
                d2 = torch.relu(self.dec2(torch.cat([self.up2(m), e2], dim=1)))
                d1 = torch.relu(self.dec1(torch.cat([self.up1(d2), e1], dim=1)))
                return self.out(d1)

        torch.manual_seed(42)
        x = np.random.RandomState(42).randn(2, 1, 16, 16).astype(np.float32)
        apply_fn, template = self._check(UNet(), x)
        g = jax.grad(
            lambda ps: jnp.sum(apply_fn(ps, jnp.asarray(x)) ** 2)
        )(template)
        assert all(bool(jnp.any(gl != 0)) for gl in g)

    def test_unet_samples_as_bnn(self, key):
        """The UNet potential built by define_model_tree_log_prob drives a
        short HMC run end to end (finite trace, the chain moves)."""
        torch = pytest.importorskip("torch")
        nn_t = torch.nn

        class TinyUNet(nn_t.Module):
            def __init__(self):
                super().__init__()
                self.down = nn_t.Conv2d(1, 4, 3, stride=2, padding=1)
                self.up = nn_t.ConvTranspose2d(4, 1, 2, stride=2)

            def forward(self, x):
                return self.up(torch.relu(self.down(x)))

        from hamiltorch_tpu.models.bnn import define_model_tree_log_prob
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.hmc import run_hmc

        x = np.random.RandomState(43).randn(4, 1, 8, 8).astype(np.float32)
        y = x * 0.5
        lp, template = define_model_tree_log_prob(
            TinyUNet(), "regression", jnp.asarray(x), jnp.asarray(y),
            tau_out=10.0, x_example=jnp.asarray(x),
        )
        cfg = MCMCConfig(num_samples=20, num_steps_per_sample=3, step_size=1e-3)
        r = run_hmc(key, lp, template, cfg)
        leaves = jax.tree_util.tree_leaves(r.samples)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert float(r.acc_rate) > 0.5

    def test_missing_op_error_names_the_op(self):
        """An op outside the fx tables must raise at translate time naming
        the exact op — no silent mistranslation possible."""
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        class Weird(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.lin = torch.nn.Linear(3, 3)

            def forward(self, x):
                return torch.special.i0(self.lin(x))  # bessel: not bridged

        with pytest.raises(TypeError, match="i0"):
            from_torch_module(Weird())


class TestTreePredictModel:
    """predict_model on a parameter-PYTREE sample trace (round 4): same
    predictions as the flat path on the raveled trace, x/y and loader."""

    def _trace(self, key):
        from hamiltorch_tpu.models.bnn import define_model_tree_log_prob
        from hamiltorch_tpu.samplers.driver import MCMCConfig
        from hamiltorch_tpu.samplers.hmc import run_hmc
        from hamiltorch_tpu.utils.pytree import ravel_pytree_fn

        x = jnp.linspace(-1, 1, 12)[:, None]
        y = jnp.sin(2 * x)
        model = MLP(features=(4, 1))
        lp, template = define_model_tree_log_prob(
            model, "regression", x, y, tau_out=10.0)
        cfg = MCMCConfig(num_samples=20, num_steps_per_sample=5, step_size=0.01)
        r = run_hmc(key, lp, template, cfg)
        flat = jnp.stack([
            ravel_pytree_fn(
                jax.tree_util.tree_map(lambda l: l[i], r.samples))[0]
            for i in range(20)
        ])
        return model, x, y, r.samples, flat

    def test_xy_path_matches_flat(self, key):
        from hamiltorch_tpu.models.bnn import predict_model

        model, x, y, tree_trace, flat_trace = self._trace(key)
        p_tree, lp_tree = predict_model(
            model, tree_trace, x=x, y=y, model_loss="regression", tau_out=10.0)
        p_flat, lp_flat = predict_model(
            model, flat_trace, x=x, y=y, model_loss="regression", tau_out=10.0)
        np.testing.assert_allclose(np.asarray(p_tree), np.asarray(p_flat),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(lp_tree), np.asarray(lp_flat),
                                   rtol=1e-5)

    def test_loader_path_matches_flat(self, key):
        from hamiltorch_tpu.models.bnn import predict_model

        model, x, y, tree_trace, flat_trace = self._trace(key)
        loader = [(np.asarray(x[i : i + 5]), np.asarray(y[i : i + 5]))
                  for i in range(0, 12, 5)]  # 5, 5, ragged 2
        p_tree, lp_tree = predict_model(
            model, tree_trace, test_loader=loader, model_loss="regression",
            tau_out=10.0)
        p_flat, lp_flat = predict_model(
            model, flat_trace, test_loader=loader, model_loss="regression",
            tau_out=10.0)
        assert p_tree.shape == (20, 12, 1)
        np.testing.assert_allclose(np.asarray(p_tree), np.asarray(p_flat),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(lp_tree), np.asarray(lp_flat),
                                   rtol=1e-5)

    def test_stream_batches_rejects_tree(self, key):
        from hamiltorch_tpu.models.bnn import predict_model

        model, x, y, tree_trace, _ = self._trace(key)
        loader = [(np.asarray(x), np.asarray(y))]
        with pytest.raises(TypeError, match="flat"):
            predict_model(model, tree_trace, test_loader=loader,
                          model_loss="regression", stream_batches=1)


class TestBridgeCallback:
    """method='callback': the universal bridge path — the torch forward
    executes eagerly on host inside pure_callback, gradients via
    torch.autograd in a custom_vjp.  This is the reference's own
    universality mechanism (it executes any forward rather than translating
    it — reference: hamiltorch/util.py:318-346), so ANY nn.Module works:
    ops outside every translation table, data-dependent control flow, both
    at once."""

    def _weird_net(self):
        """matrix_exp is in no fx/aten table; the branch is data-dependent
        Python control flow — neither fx nor jit.trace-with-frozen-branch
        represents this module faithfully."""
        torch = pytest.importorskip("torch")
        nn_t = torch.nn

        class Weird(nn_t.Module):
            def __init__(self):
                super().__init__()
                self.a = nn_t.Linear(4, 4)
                self.b = nn_t.Linear(4, 2)

            def forward(self, x):
                h = self.a(x)
                if h.sum().item() > 0.0:  # data-dependent branch
                    h = torch.linalg.matrix_exp(h.T @ h / 16.0) @ h.T
                    h = h.T
                else:
                    h = -h
                return self.b(torch.tanh(h))

        torch.manual_seed(7)
        return Weird()

    def test_forward_matches_torch_both_branches(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = self._weird_net()
        apply_fn, template = from_torch_module(net, method="callback")
        rng = np.random.default_rng(0)
        for shift in (2.0, -2.0):  # drive both branches of the live forward
            x = rng.standard_normal((3, 4)).astype(np.float32) + shift
            with torch.no_grad():
                ref = net(torch.tensor(x)).numpy()
            got = np.asarray(apply_fn(template, jnp.asarray(x)))
            np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)

    def test_grads_match_torch_autograd(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = self._weird_net()
        apply_fn, template = from_torch_module(net, method="callback")
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 4)).astype(np.float32)
        xj = jnp.asarray(x)

        def loss(params):
            return jnp.sum(apply_fn(params, xj) ** 2)

        grads = jax.jit(jax.grad(loss))(template)

        xt = torch.tensor(x)
        out = net(xt)
        (out**2).sum().backward()
        for g, p in zip(grads, net.parameters()):
            np.testing.assert_allclose(
                np.asarray(g), p.grad.numpy(), rtol=1e-4, atol=1e-5
            )

    def test_sample_model_bridge_method(self):
        pytest.importorskip("torch")
        net = self._weird_net()
        rng = np.random.default_rng(2)
        x = rng.standard_normal((6, 4)).astype(np.float32)
        y = rng.standard_normal((6, 2)).astype(np.float32)
        trace = sample_model(
            net, x, y, model_loss="regression", num_samples=8,
            num_steps_per_sample=3, step_size=5e-3, burn=2, verbose=False,
            key=jax.random.key(0), bridge_method="callback",
        )
        # façade convention: [init] + one entry per post-burn transition
        assert trace.shape[0] == 6
        assert np.isfinite(np.asarray(trace)).all()
        # the chain must actually move (callback grads reached the sampler)
        assert np.abs(np.asarray(trace[-1] - trace[0])).max() > 0

    def test_vmap_chains_sequential(self):
        torch = pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        net = self._weird_net()
        apply_fn, template = from_torch_module(net, method="callback")
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32))
        stacked = [
            jnp.stack([p, p + 0.01]) for p in template
        ]  # two "chains"
        outs = jax.vmap(lambda ps: apply_fn(list(ps), x))(stacked)
        one = apply_fn([s[1] for s in stacked], x)
        np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(one),
                                   rtol=2e-5, atol=1e-6)

    def test_integer_input_embedding(self):
        torch = pytest.importorskip("torch")
        nn_t = torch.nn
        from hamiltorch_tpu.models.interop import from_torch_module

        class Emb(nn_t.Module):
            def __init__(self):
                super().__init__()
                self.e = nn_t.Embedding(5, 3)
                self.l = nn_t.Linear(3, 2)

            def forward(self, ix):
                return self.l(self.e(ix)).mean(dim=1)

        torch.manual_seed(0)
        net = Emb()
        apply_fn, template = from_torch_module(net, method="callback")
        ix = jnp.asarray(np.array([[0, 3, 4], [1, 2, 2]], dtype=np.int32))

        def loss(params):
            return jnp.sum(apply_fn(params, ix))

        grads = jax.jit(jax.grad(loss))(template)
        it = torch.tensor(np.asarray(ix), dtype=torch.long)
        net(it).sum().backward()
        for g, p in zip(grads, net.parameters()):
            np.testing.assert_allclose(
                np.asarray(g), p.grad.numpy(), rtol=1e-5, atol=1e-6
            )

    def test_bad_method_rejected(self):
        pytest.importorskip("torch")
        from hamiltorch_tpu.models.interop import from_torch_module

        with pytest.raises(ValueError, match="callback"):
            from_torch_module(self._weird_net(), method="eager")

    def test_error_messages_name_the_escape_hatch(self):
        torch = pytest.importorskip("torch")
        nn_t = torch.nn
        from hamiltorch_tpu.models.interop import from_torch_module

        class Exotic(nn_t.Module):
            def __init__(self):
                super().__init__()
                self.l = nn_t.Linear(4, 4)

            def forward(self, x):
                return torch.linalg.matrix_exp(self.l(x))

        with pytest.raises(TypeError, match="callback"):
            from_torch_module(Exotic(), example_input=torch.zeros(4, 4))
