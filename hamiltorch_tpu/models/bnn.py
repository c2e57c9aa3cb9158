"""Bayesian-neural-network layer: model -> flat-vector log-probability.

Behavioural spec: the reference's L4 (``define_model_log_prob``,
``define_split_model_log_prob``, ``sample_model``, ``sample_split_model``,
``predict_model`` — reference: hamiltorch/samplers.py:1093-1562).

The reference spends 110 lines rewriting ``torch.nn.Module`` objects into
pure functions (``make_functional``, reference: hamiltorch/util.py:253-376).
JAX models already *are* pure functions of parameter pytrees, so this layer
reduces to: ravel/unravel between the sampler's flat (D,) vector and the
model's pytree, per-layer Gaussian priors from ``tau_list``, and the
likelihood zoo (reference: samplers.py:1170-1190).

Models are accepted in three forms:

* a ``flax.linen.Module`` (applied as ``module.apply(variables, x)``);
* a plain callable ``apply_fn(params_pytree, x)`` plus a params template;
* a ``torch.nn.Module`` via :mod:`hamiltorch_tpu.models.interop`.

``predict_model`` vmaps over samples instead of the reference's Python loop
(reference: samplers.py:1531-1555), producing (S, N, O) in one batched
forward — on TPU the sample axis feeds the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..api import sample as _sample
from ..enums import Integrator, Metric, Sampler
from ..utils.pytree import ravel_pytree_fn
from ..utils.rng import next_key

# ---------------------------------------------------------------------------
# model normalisation


def build_model(model, x_example=None, params_template=None, rng=None,
                bridge_method="auto"):
    """Normalise ``model`` to ``(apply_fn(params, x), params_template)``.

    * flax.linen.Module: initialised with ``x_example`` (required);
    * callable: used as-is, ``params_template`` required;
    * torch.nn.Module: converted via the interop bridge
      (``bridge_method="callback"`` forces the eager host-execution path —
      exact for ANY module, CPU backend only; see
      :func:`~hamiltorch_tpu.models.interop.from_torch_module`).
    """
    # flax module?
    try:
        import flax.linen as nn

        if isinstance(model, nn.Module):
            if params_template is None:
                if x_example is None:
                    raise ValueError("x_example required to initialise a flax module")
                rng = rng if rng is not None else jax.random.key(0)
                params_template = model.init(rng, x_example)

            def apply_fn(params, x):
                return model.apply(params, x)

            return apply_fn, params_template
    except ImportError:  # pragma: no cover
        pass

    # torch module?
    if type(model).__module__.startswith("torch") or (
        hasattr(model, "named_parameters") and hasattr(model, "forward")
    ):
        from .interop import from_torch_module

        # x_example (when the caller has data in hand, e.g. sample_model)
        # enables the concrete-trace fallback for fx-untraceable forwards
        return from_torch_module(
            model, example_input=x_example, method=bridge_method
        )

    if callable(model):
        if params_template is None:
            raise ValueError("params_template required when model is a plain callable")
        return model, params_template

    raise TypeError(f"Unsupported model type: {type(model)}")


# ---------------------------------------------------------------------------
# priors and likelihoods


def _normal_log_prob(w: jnp.ndarray, tau) -> jnp.ndarray:
    """Sum of N(0, tau^-1) log-pdfs, constants included (reference keeps
    them via torch.distributions.Normal — samplers.py:1141-1156)."""
    tau = jnp.asarray(tau, w.dtype)
    n = w.size
    return 0.5 * n * jnp.log(tau) - 0.5 * n * math.log(2 * math.pi) - 0.5 * tau * jnp.sum(w * w)


def _resolve_taus(num_leaves: int, tau_list) -> list:
    """One prior precision per parameter leaf: ``tau_list`` may be None
    (tau=1 everywhere), a scalar, or one entry per leaf in pytree order."""
    if tau_list is None:
        return [1.0] * num_leaves
    if isinstance(tau_list, (int, float)) or (
        hasattr(tau_list, "ndim") and getattr(tau_list, "ndim", 1) == 0
    ):
        return [tau_list] * num_leaves
    taus = list(tau_list)
    if len(taus) != num_leaves:
        raise ValueError(
            f"tau_list has {len(taus)} entries but the model has {num_leaves} parameter leaves"
        )
    return taus


def gaussian_prior_log_prob(params, tau_list) -> jnp.ndarray:
    """Per-leaf Gaussian prior; ``tau_list`` is one precision per leaf (in
    pytree-leaf order) or a scalar applied to every leaf."""
    leaves = jax.tree_util.tree_leaves(params)
    taus = _resolve_taus(len(leaves), tau_list)
    lp = jnp.zeros((), leaves[0].dtype if leaves else jnp.float32)
    for w, tau in zip(leaves, taus):
        lp = lp + _normal_log_prob(w, tau)
    return lp


def log_likelihood(output, y, model_loss, tau_out=1.0):
    """The reference's likelihood switch (samplers.py:1170-1190)."""
    if model_loss == "binary_class_linear_output":
        # BCE-with-logits, summed; stable softplus form.
        z, t = output, y
        bce = jnp.sum(jnp.maximum(z, 0.0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z))))
        return -tau_out * bce
    if model_loss == "multi_class_linear_output":
        logits = jax.nn.log_softmax(output, axis=-1)
        labels = y.reshape(-1).astype(jnp.int32)
        return -tau_out * (-jnp.sum(jnp.take_along_axis(logits, labels[:, None], axis=-1)))
    if model_loss == "multi_class_log_softmax_output":
        # The reference uses F.nll_loss with its default reduction='mean'
        # (samplers.py:1180) — inconsistent with its own sum-reduced
        # CrossEntropyLoss branch two lines above, but parity means parity.
        labels = y.reshape(-1).astype(jnp.int32)
        return -tau_out * (-jnp.mean(jnp.take_along_axis(output, labels[:, None], axis=-1)))
    if model_loss == "regression":
        return -0.5 * tau_out * jnp.sum((output - y) ** 2)
    if callable(model_loss):
        return -jnp.sum(model_loss(output, y))
    raise NotImplementedError(f"Unknown model_loss: {model_loss!r}")


# ---------------------------------------------------------------------------
# log-prob factories


def define_model_log_prob(
    model,
    model_loss,
    x,
    y,
    tau_list=None,
    tau_out: float = 1.0,
    predict: bool = False,
    prior_scale: float = 1.0,
    x_example=None,
    params_template=None,
    remat: bool = False,
    bridge_method: str = "auto",
):
    """Build ``log_prob_func(flat_theta)`` for a model + dataset.

    Equivalent of reference samplers.py:1093-1201; the functionalisation,
    unflattening and device moves all collapse into one ``unravel`` plus a
    pure apply.  Returns (log_prob_func, flat_init, unravel).

    ``remat=True`` wraps the forward in ``jax.checkpoint`` so the leapfrog
    gradient recomputes activations instead of storing them — trades FLOPs
    for HBM on models whose activation footprint dominates.
    """
    apply_fn, template = build_model(
        model, x_example=x_example if x_example is not None else x,
        params_template=params_template, bridge_method=bridge_method,
    )
    if remat:
        apply_fn = jax.checkpoint(apply_fn)
    flat_init, unravel = ravel_pytree_fn(template)
    x = None if x is None else jnp.asarray(x)
    y = None if y is None else jnp.asarray(y)

    def raw_fn(theta, data):
        params = unravel(theta)
        l_prior = gaussian_prior_log_prob(params, tau_list) / prior_scale
        if data is None:
            return l_prior
        x_, y_ = data
        output = apply_fn(params, x_)
        ll = log_likelihood(output, y_, model_loss, tau_out)
        if predict:
            return ll + l_prior, output
        return ll + l_prior

    data = None if x is None else (x, y)

    def log_prob_func(theta):
        return raw_fn(theta, data)

    # The samplers detect these and pass the dataset as a jit operand
    # instead of a baked-in program constant (large datasets overflow the
    # constant budget on TPU backends).
    log_prob_func._raw_fn = raw_fn
    log_prob_func._data = data

    return log_prob_func, flat_init, unravel


def define_model_prior_and_lik(
    model,
    model_loss,
    x,
    y,
    tau_list=None,
    tau_out: float = 1.0,
    x_example=None,
    params_template=None,
    bridge_method: str = "auto",
):
    """(log_prior_fn, log_lik_fn, prior_sample_fn, template) — the
    prior/likelihood SPLIT the evidence machinery needs.

    ``run_ti`` and ``run_smc`` temper only the LIKELIHOOD along the
    prior-to-posterior path, so they cannot consume the summed potential
    ``define_model_(tree_)log_prob`` returns.  This factory exposes the
    same per-leaf Gaussian priors (reference: hamiltorch/samplers.py:
    1141-1157) and likelihood zoo, with two evidence-specific choices:

    * the likelihood is the NORMALIZED per-observation density summed
      (``model_comparison.pointwise_log_lik_from_predictions``) — the
      sampling-time forms may drop theta-constants (the regression
      branch's Gaussian normalisation), which cancel inside one model's
      MCMC but shift log Z between models with different ``tau_out``;
    * ``prior_sample_fn(key, n)`` draws (n, ...)-leaf parameter stacks
      from the exact prior — ``run_smc``'s initial population.

    ``log_lik_fn`` carries the ``_raw_fn``/``_data`` operand protocol
    (the dataset rides as a jit operand); all three functions consume /
    produce the parameter PYTREE ``template`` (``run_ti``/``run_smc``
    take tree states directly).
    """
    from ..model_comparison import pointwise_log_lik_from_predictions

    apply_fn, template = build_model(
        model, x_example=x_example if x_example is not None else x,
        params_template=params_template, bridge_method=bridge_method,
    )
    x = jnp.asarray(x)
    y = jnp.asarray(y)

    def log_prior_fn(params):
        return gaussian_prior_log_prob(params, tau_list)

    def raw_lik(params, data):
        x_, y_ = data
        out = apply_fn(params, x_)
        return jnp.sum(
            pointwise_log_lik_from_predictions(out[None], y_, model_loss,
                                               tau_out)[0]
        )

    def log_lik_fn(params, data=None):
        return raw_lik(params, (x, y) if data is None else data)

    log_lik_fn._raw_fn = raw_lik
    log_lik_fn._data = (x, y)

    leaves, tdef = jax.tree_util.tree_flatten(template)
    taus = _resolve_taus(len(leaves), tau_list)

    def prior_sample_fn(key, n):
        keys = jax.random.split(key, len(leaves))
        outs = [
            jax.random.normal(k, (n,) + l.shape, l.dtype)
            / jnp.sqrt(jnp.asarray(t, l.dtype))
            for k, l, t in zip(keys, leaves, taus)
        ]
        return jax.tree_util.tree_unflatten(tdef, outs)

    return log_prior_fn, log_lik_fn, prior_sample_fn, template


def define_model_tree_log_prob(
    model,
    model_loss,
    x,
    y,
    tau_list=None,
    tau_out: float = 1.0,
    predict: bool = False,
    prior_scale: float = 1.0,
    x_example=None,
    params_template=None,
    remat: bool = False,
    bridge_method: str = "auto",
):
    """Pytree-native variant of :func:`define_model_log_prob`.

    The returned potential takes the parameter PYTREE itself — no
    ravel/unravel in the gradient path, so samplers run it on their
    pytree-native chain state (run_hmc / run_nuts / run_chees all accept
    the returned ``template`` as ``theta0``) with none of the flat-layout
    slicing tax the round-2 profile measured at ~24% of each leapfrog step
    (docs/BENCHMARKS.md "Where the time goes").  Values match
    ``define_model_log_prob`` exactly: same priors (reference:
    hamiltorch/samplers.py:1141-1157), same likelihood switch
    (samplers.py:1170-1190), evaluated on unraveled leaves either way.

    Returns ``(log_prob_func, params_template)``.
    """
    apply_fn, template = build_model(
        model, x_example=x_example if x_example is not None else x,
        params_template=params_template, bridge_method=bridge_method,
    )
    if remat:
        apply_fn = jax.checkpoint(apply_fn)
    x = None if x is None else jnp.asarray(x)
    y = None if y is None else jnp.asarray(y)

    def raw_fn(params, data):
        l_prior = gaussian_prior_log_prob(params, tau_list) / prior_scale
        if data is None:
            return l_prior
        x_, y_ = data
        output = apply_fn(params, x_)
        ll = log_likelihood(output, y_, model_loss, tau_out)
        if predict:
            return ll + l_prior, output
        return ll + l_prior

    data = None if x is None else (x, y)

    def log_prob_func(params):
        return raw_fn(params, data)

    # same jit-operand protocol as define_model_log_prob
    log_prob_func._raw_fn = raw_fn
    log_prob_func._data = data

    return log_prob_func, template


def _as_batches(train_loader, num_splits: Optional[int] = None,
                keep_tail: bool = False):
    """Materialise (x, y) batches from a torch DataLoader or any iterable of
    pairs.

    Default (training / splitting): equal-size batches only — ragged tails
    are dropped, mirroring the reference's 'ensure each batch is the same
    length' requirement for SPLIT training (samplers.py:1221-1222).

    ``keep_tail=True`` (prediction): returns ``(xs, ys, tail)`` where
    xs/ys stack the leading equal-size run for a ``lax.scan`` and ``tail``
    lists the remaining (differently-sized) batches in loader order —
    prediction must cover the WHOLE test set, ragged final batch included.
    """
    import numpy as np

    xs, ys = [], []
    for i, (bx, by) in enumerate(train_loader):
        if num_splits is not None and i >= num_splits:
            break
        bx = np.asarray(bx) if not hasattr(bx, "detach") else bx.detach().cpu().numpy()
        by = np.asarray(by) if not hasattr(by, "detach") else by.detach().cpu().numpy()
        xs.append(bx)
        ys.append(by)
    if not xs:
        raise ValueError("train_loader yielded no batches")
    n0 = xs[0].shape[0]
    if keep_tail:
        cut = len(xs)
        for i in range(len(xs)):
            if xs[i].shape[0] != n0:
                cut = i
                break
        tail = [
            (jnp.asarray(xs[i]), jnp.asarray(ys[i])) for i in range(cut, len(xs))
        ]
        xs_s = jnp.stack([jnp.asarray(b) for b in xs[:cut]])
        ys_s = jnp.stack([jnp.asarray(b) for b in ys[:cut]])
        return xs_s, ys_s, tail
    keep = [i for i in range(len(xs)) if xs[i].shape[0] == n0]
    xs = jnp.stack([jnp.asarray(xs[i]) for i in keep])
    ys = jnp.stack([jnp.asarray(ys[i]) for i in keep])
    return xs, ys


def define_split_model_log_prob(
    model,
    model_loss,
    train_loader,
    num_splits: int,
    tau_list=None,
    tau_out: float = 1.0,
    predict: bool = False,
    verbose: bool = True,
    params_template=None,
):
    """Stacked-data split likelihood (reference: samplers.py:1203-1258).

    TPU-first: instead of a Python list of closures each pinning its own
    batch, the batches are stacked to (M, B, ...) arrays and one traced
    ``term_fn(theta, m)`` indexes them — the splitting integrator then scans
    over the term axis in a single compiled program.  The prior enters each
    term divided by ``num_splits`` so it is counted once in the sum.

    Returns (term_fn, num_terms, flat_init, unravel).
    """
    xs, ys = _as_batches(train_loader, num_splits)
    m_terms = int(xs.shape[0])
    apply_fn, template = build_model(
        model, x_example=xs[0], params_template=params_template
    )
    flat_init, unravel = ravel_pytree_fn(template)
    if verbose:
        print(f"Number of splits: {m_terms} , each of batch size {xs.shape[1]}\n")

    def term_fn(theta, m, data):
        # data = (xs, ys) stacked (M, B, ...) arrays, passed as jit operands
        xs_, ys_ = data
        params = unravel(theta)
        l_prior = gaussian_prior_log_prob(params, tau_list) / m_terms
        output = apply_fn(params, xs_[m])
        ll = log_likelihood(output, ys_[m], model_loss, tau_out)
        if predict:
            return ll + l_prior, output
        return ll + l_prior

    return term_fn, m_terms, flat_init, unravel, (xs, ys)


def define_split_model_tree_log_prob(
    model,
    model_loss,
    train_loader,
    num_splits: int,
    tau_list=None,
    tau_out: float = 1.0,
    predict: bool = False,
    verbose: bool = True,
    params_template=None,
):
    """Pytree-native variant of :func:`define_split_model_log_prob`.

    The returned ``term_fn(params, m, data)`` takes the parameter PYTREE —
    no ravel/unravel in the per-term gradient path, so split HMC runs on
    its pytree-native chain state (``run_split_hmc_stacked`` accepts the
    returned ``template`` as ``theta0``).  Big-model minibatch sampling is
    exactly where the no-flat-tax design pays: every kick is one
    minibatch forward/backward whose per-leaf gradients land directly on
    the momentum leaves.  Values match the flat factory exactly (same
    per-term ``prior/num_splits`` accounting, reference:
    hamiltorch/samplers.py:1203-1258).

    Returns ``(term_fn, num_terms, params_template, (xs, ys))``.
    """
    xs, ys = _as_batches(train_loader, num_splits)
    m_terms = int(xs.shape[0])
    apply_fn, template = build_model(
        model, x_example=xs[0], params_template=params_template
    )
    if verbose:
        print(f"Number of splits: {m_terms} , each of batch size {xs.shape[1]}\n")

    def term_fn(params, m, data):
        xs_, ys_ = data
        l_prior = gaussian_prior_log_prob(params, tau_list) / m_terms
        output = apply_fn(params, xs_[m])
        ll = log_likelihood(output, ys_[m], model_loss, tau_out)
        if predict:
            return ll + l_prior, output
        return ll + l_prior

    return term_fn, m_terms, template, (xs, ys)


# ---------------------------------------------------------------------------
# user-facing parity entry points


def sample_model(
    model,
    x,
    y,
    params_init=None,
    model_loss="multi_class_linear_output",
    num_samples: int = 10,
    num_steps_per_sample: int = 10,
    step_size: float = 0.1,
    burn: int = 0,
    inv_mass=None,
    jitter=None,
    normalizing_const: float = 1.0,
    softabs_const=None,
    explicit_binding_const: float = 100.0,
    fixed_point_threshold: float = 1e-5,
    fixed_point_max_iterations: int = 1000,
    jitter_max_tries: int = 10,
    sampler: Sampler = Sampler.HMC,
    integrator: Integrator = Integrator.IMPLICIT,
    metric: Metric = Metric.HESSIAN,
    debug: int = 0,
    tau_out: float = 1.0,
    tau_list=None,
    store_on_GPU: bool = True,
    desired_accept_rate: float = 0.8,
    verbose: bool = True,
    key=None,
    params_template=None,
    bridge_method: str = "auto",
):
    """Sample BNN weights (reference: samplers.py:1261-1362)."""
    log_prob_func, flat_init, _ = define_model_log_prob(
        model, model_loss, x, y, tau_list=tau_list, tau_out=tau_out,
        params_template=params_template, bridge_method=bridge_method,
    )
    if params_init is None:
        params_init = flat_init
    return _sample(
        log_prob_func, params_init,
        num_samples=num_samples, num_steps_per_sample=num_steps_per_sample,
        step_size=step_size, burn=burn, jitter=jitter, inv_mass=inv_mass,
        normalizing_const=normalizing_const, softabs_const=softabs_const,
        explicit_binding_const=explicit_binding_const,
        fixed_point_threshold=fixed_point_threshold,
        fixed_point_max_iterations=fixed_point_max_iterations,
        jitter_max_tries=jitter_max_tries, sampler=sampler,
        integrator=integrator, metric=metric, debug=debug,
        desired_accept_rate=desired_accept_rate, store_on_GPU=store_on_GPU,
        verbose=verbose, key=key,
    )


def sample_split_model(
    model,
    train_loader,
    params_init=None,
    num_splits: int = 2,
    model_loss="multi_class_linear_output",
    num_samples: int = 10,
    num_steps_per_sample: int = 10,
    step_size: float = 0.1,
    burn: int = 0,
    inv_mass=None,
    jitter=None,
    normalizing_const: float = 1.0,
    softabs_const=None,
    explicit_binding_const: float = 100.0,
    fixed_point_threshold: float = 1e-5,
    fixed_point_max_iterations: int = 1000,
    jitter_max_tries: int = 10,
    sampler: Sampler = Sampler.HMC,
    integrator: Integrator = Integrator.SPLITTING,
    metric: Metric = Metric.HESSIAN,
    debug: int = 0,
    tau_out: float = 1.0,
    tau_list=None,
    store_on_GPU: bool = True,
    desired_accept_rate: float = 0.8,
    verbose: bool = True,
    key=None,
    params_template=None,
):
    """Symmetric-split minibatch HMC on a BNN (reference: samplers.py:1364-1466)."""
    term_fn, m_terms, flat_init, _, data = define_split_model_log_prob(
        model, model_loss, train_loader, num_splits,
        tau_list=tau_list, tau_out=tau_out, verbose=verbose,
        params_template=params_template,
    )
    if params_init is None:
        params_init = flat_init
    params_init = jnp.asarray(params_init)
    if params_init.ndim != 1:
        raise RuntimeError("params_init must be a 1d array.")
    if burn >= num_samples:
        raise RuntimeError("burn must be less than num_samples.")
    if sampler == Sampler.HMC_NUTS and burn <= 0:
        raise RuntimeError("burn must be greater than 0 for NUTS.")
    if key is None:
        key = next_key()

    from ..samplers.driver import MCMCConfig
    from ..samplers.splitting import run_split_hmc_stacked
    from ..api import _kept_samples

    config = MCMCConfig(
        num_samples=num_samples, num_steps_per_sample=num_steps_per_sample,
        step_size=step_size, burn=burn,
        adapt_step_size=(sampler == Sampler.HMC_NUTS),
        desired_accept_rate=desired_accept_rate,
    )
    result = run_split_hmc_stacked(
        key, term_fn, m_terms, params_init, config,
        integrator=integrator, inv_mass=inv_mass, data=data,
    )
    samples = _kept_samples(params_init, result, burn)
    if verbose:
        print(f"Acceptance Rate {float(result.acc_rate):.2f}")
    if debug == 2:
        return samples, float(result.acc_rate)
    return samples


def predict_model(
    model,
    samples,
    x=None,
    y=None,
    test_loader=None,
    model_loss="multi_class_linear_output",
    tau_out: float = 1.0,
    tau_list=None,
    verbose: bool = False,
    params_template=None,
    stream_batches: Optional[int] = None,
    bridge_method: str = "auto",
):
    """Posterior predictive over weight samples (reference: samplers.py:1468-1562).

    Returns (predictions (S, N, O), log_prob_list (S,)).  The per-sample
    Python loop becomes a vmap over the sample axis; with a ``test_loader``
    the evaluation STREAMS batch by batch under ``lax.scan`` (matching the
    reference's batched loop, samplers.py:1520-1541) so only one
    (S, batch) activation block is live at a time — the full test set is
    never materialised as a single forward.

    ``stream_batches=k`` additionally bounds HOST memory: the loader is
    consumed lazily, at most k batches staged at a time, each chunk's
    predictions offloaded to host numpy before the next loads — test sets
    larger than host memory stream end to end (returns numpy arrays).

    ``samples`` may also be a parameter-PYTREE trace (the pytree-native
    samplers' output: leaves (S, ...)): predictions evaluate directly on
    the tree path (no ravel/unravel; ``params_template`` defaults to the
    per-sample slice of the trace itself).  Works with x/y and with
    ``test_loader``; ``stream_batches`` stays flat-only.
    """
    from ..utils.pytree import is_param_tree

    tree_samples = is_param_tree(samples)
    if tree_samples:
        if stream_batches:
            raise TypeError(
                "stream_batches takes a flat (S, D) sample stack — ravel "
                "the trace (utils.pytree.ravel_pytree_fn per draw) or drop "
                "stream_batches for the pytree path."
            )
        n_s = jax.tree_util.tree_leaves(samples)[0].shape[0]
        s_dtype = jax.tree_util.tree_leaves(samples)[0].dtype
        if params_template is None:
            params_template = jax.tree_util.tree_map(lambda l: l[0], samples)
    else:
        samples = jnp.stack(list(samples)) if not isinstance(samples, jnp.ndarray) else samples
        n_s = samples.shape[0]
        s_dtype = samples.dtype

    if test_loader is not None and stream_batches:
        return _predict_streaming(
            model, samples, test_loader, model_loss, tau_out, tau_list,
            params_template, int(stream_batches), bridge_method=bridge_method,
        )

    def make_raw(x_, y_):
        factory = define_model_tree_log_prob if tree_samples else define_model_log_prob
        out = factory(
            model, model_loss, x_, y_, tau_list=tau_list, tau_out=tau_out,
            predict=True, params_template=params_template,
            bridge_method=bridge_method,
        )
        return out[0]._raw_fn

    if test_loader is not None:
        # stacked equal-size run + ragged remainder (usually the final
        # batch) — prediction covers the WHOLE test set, unlike split
        # training where ragged batches are rejected
        xs, ys, tail = _as_batches(test_loader, None, keep_tail=True)
        raw = make_raw(xs[0], ys[0])

        @jax.jit
        def batched_stream(thetas, xs_, ys_):
            # each raw(theta, batch) counts the prior once; correction to
            # count it exactly once happens after the tail batches
            priors = jax.vmap(lambda t: raw(t, None))(thetas)

            def per_batch(acc, xy):
                lp_b, out_b = jax.vmap(lambda t: raw(t, xy))(thetas)
                return acc + lp_b, out_b

            # accumulator at the PROMOTED dtype: a reduced-precision
            # (trace_dtype) sample trace still yields f32 log-probs
            # (bf16 params x f32 data), and scan requires carry-in ==
            # carry-out dtypes
            lls, outs = jax.lax.scan(
                per_batch,
                jnp.zeros((n_s,), jnp.promote_types(s_dtype, jnp.float32)),
                (xs_, ys_),
            )
            # outs: (M, S, B, O) -> (S, M*B, O)
            preds = jnp.swapaxes(outs, 0, 1).reshape((n_s, -1) + outs.shape[3:])
            return preds, lls, priors

        preds, lls, priors = batched_stream(samples, xs, ys)
        parts = [preds]
        n_batches = int(xs.shape[0])
        for bx, by in tail:
            lp_b, out_b = jax.vmap(lambda t: raw(t, (bx, by)))(samples)
            lls = lls + lp_b
            parts.append(out_b)
            n_batches += 1
        lps = lls - (n_batches - 1) * priors
        return jnp.concatenate(parts, axis=1), lps

    if x is None or y is None:
        raise RuntimeError("Val data not defined (pass x,y or test_loader)")
    raw = make_raw(x, y)
    data = (jnp.asarray(x), jnp.asarray(y))

    @jax.jit
    def batched(thetas):
        return jax.vmap(lambda t: raw(t, data))(thetas)

    lps, preds = batched(samples)
    return preds, lps


def _predict_streaming(model, samples, test_loader, model_loss, tau_out,
                       tau_list, params_template, stream_batches: int,
                       bridge_method: str = "auto"):
    """Lazy chunked posterior predictive: consume ``test_loader`` without
    ever staging more than ``stream_batches`` batches; each chunk's
    predictions land in host numpy before the next chunk loads.

    The per-batch ``raw(theta, batch)`` counts the prior once, so after n
    batches the summed log prob over-counts it (n-1) times; corrected at
    the end exactly as the materialised path does.
    """
    import numpy as np

    raw = None
    prior_fn = None
    chunk_fn = None
    host_preds, lls, priors = [], None, None
    n_batches = 0
    buf_x, buf_y, buf_n = [], [], None

    def flush():
        nonlocal lls, n_batches
        if not buf_x:
            return
        xs_ = jnp.stack([jnp.asarray(b) for b in buf_x])
        ys_ = jnp.stack([jnp.asarray(b) for b in buf_y])
        lp_c, out_c = chunk_fn(samples, xs_, ys_)
        # (M, S, B, O) -> (S, M*B, O); offload to host before the next chunk
        preds = jnp.swapaxes(out_c, 0, 1).reshape(
            (samples.shape[0], -1) + out_c.shape[3:]
        )
        host_preds.append(np.asarray(jax.device_get(preds)))
        lls = lp_c if lls is None else lls + lp_c
        n_batches += len(buf_x)
        buf_x.clear()
        buf_y.clear()

    for bx, by in test_loader:
        bx = np.asarray(bx) if not hasattr(bx, "detach") else bx.detach().cpu().numpy()
        by = np.asarray(by) if not hasattr(by, "detach") else by.detach().cpu().numpy()
        if raw is None:
            log_prob_func, _, _ = define_model_log_prob(
                model, model_loss, jnp.asarray(bx), jnp.asarray(by),
                tau_list=tau_list, tau_out=tau_out, predict=True,
                params_template=params_template, bridge_method=bridge_method,
            )
            raw = log_prob_func._raw_fn
            prior_fn = jax.jit(jax.vmap(lambda t: raw(t, None)))

            @jax.jit
            def chunk_fn(thetas, xs_, ys_):
                def per_batch(acc, xy):
                    lp_b, out_b = jax.vmap(lambda t: raw(t, xy))(thetas)
                    return acc + lp_b, out_b

                return jax.lax.scan(
                    per_batch,
                    jnp.zeros(thetas.shape[:1], thetas.dtype),
                    (xs_, ys_),
                )

        if buf_n is not None and bx.shape[0] != buf_n:
            flush()  # size change (ragged tail): finish the current run
            buf_n = None
        if buf_n is None:
            buf_n = bx.shape[0]
        buf_x.append(bx)
        buf_y.append(by)
        if len(buf_x) >= stream_batches:
            flush()
    flush()
    if n_batches == 0:
        raise ValueError("test_loader yielded no batches")
    lps = lls - (n_batches - 1) * prior_fn(samples)
    return np.concatenate(host_preds, axis=1), np.asarray(jax.device_get(lps))
