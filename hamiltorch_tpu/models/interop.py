"""torch.nn.Module -> JAX apply-function bridge.

The reference operates directly on ``torch.nn.Module`` objects by rewriting
them into pure functions at runtime (reference: hamiltorch/util.py:253-376).
This bridge lets reference users keep their torch model *definitions* while
sampling runs on TPU: supported layer types are translated once into jnp
operations, and the parameter template preserves ``module.parameters()``
order so flat vectors (and therefore ``params_init`` / stored samples) have
the identical memory layout to the reference.

Supported: Sequential composition of Linear, Conv2d, ReLU, Tanh, Sigmoid,
GELU, Softmax, LogSoftmax, Flatten, Identity, Dropout (inference = identity),
MaxPool2d, AvgPool2d.  Arbitrary custom ``forward`` methods cannot be
translated — define the model in flax/JAX instead (build_model accepts
both).
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp


def _linear(mod):
    has_bias = mod.bias is not None

    def fn(params, off, x):
        w = params[off]
        y = x @ w.T
        if has_bias:
            y = y + params[off + 1]
        return y, off + (2 if has_bias else 1)

    return fn


def _conv2d(mod):
    has_bias = mod.bias is not None
    stride = tuple(mod.stride)
    padding = tuple((p, p) for p in mod.padding) if not isinstance(mod.padding, str) else mod.padding
    dilation = tuple(mod.dilation)
    groups = mod.groups

    def fn(params, off, x):
        w = params[off]  # (O, I/groups, KH, KW), torch layout
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=padding,
            rhs_dilation=dilation, feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if has_bias:
            y = y + params[off + 1][None, :, None, None]
        return y, off + (2 if has_bias else 1)

    return fn


def _pool(mod, reducer, init, is_avg):
    k = mod.kernel_size if isinstance(mod.kernel_size, tuple) else (mod.kernel_size,) * 2
    s = mod.stride if mod.stride is not None else k
    s = s if isinstance(s, tuple) else (s,) * 2
    p = mod.padding if isinstance(mod.padding, tuple) else (mod.padding,) * 2

    def fn(params, off, x):
        y = jax.lax.reduce_window(
            x, init, reducer,
            window_dimensions=(1, 1) + k, window_strides=(1, 1) + s,
            padding=((0, 0), (0, 0)) + tuple((pi, pi) for pi in p),
        )
        if is_avg:
            y = y / (k[0] * k[1])
        return y, off

    return fn


def _elementwise(op):
    def build(mod):
        def fn(params, off, x):
            return op(mod, x), off

        return fn

    return build


def _batchnorm(mod):
    """Batch-statistics normalisation, matching the reference's batch-norm
    patch which forces running_mean/var = None (reference:
    hamiltorch/util.py:370-376): always normalise with the batch moments."""
    eps = mod.eps
    affine = mod.affine

    def fn(params, off, x):
        axes = (0,) + tuple(range(2, x.ndim))  # all but the channel axis
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        if affine:
            shape = (1, -1) + (1,) * (x.ndim - 2)
            y = y * params[off].reshape(shape) + params[off + 1].reshape(shape)
            return y, off + 2
        return y, off

    return fn


_LEAF_HANDLERS = {
    "Linear": _linear,
    "Conv2d": _conv2d,
    "BatchNorm1d": _batchnorm,
    "BatchNorm2d": _batchnorm,
    "ReLU": _elementwise(lambda m, x: jax.nn.relu(x)),
    "Tanh": _elementwise(lambda m, x: jnp.tanh(x)),
    "Sigmoid": _elementwise(lambda m, x: jax.nn.sigmoid(x)),
    "GELU": _elementwise(lambda m, x: jax.nn.gelu(x)),
    "Softmax": _elementwise(lambda m, x: jax.nn.softmax(x, axis=m.dim if m.dim is not None else -1)),
    "LogSoftmax": _elementwise(lambda m, x: jax.nn.log_softmax(x, axis=m.dim if m.dim is not None else -1)),
    "Identity": _elementwise(lambda m, x: x),
    "Dropout": _elementwise(lambda m, x: x),  # inference semantics
    "Flatten": _elementwise(lambda m, x: x.reshape(x.shape[0], -1)),
    "MaxPool2d": lambda m: _pool(m, jax.lax.max, -jnp.inf, is_avg=False),
    "AvgPool2d": lambda m: _pool(m, jax.lax.add, 0.0, is_avg=True),
}


def _convert(module) -> Callable:
    name = type(module).__name__
    if name in _LEAF_HANDLERS:
        return _LEAF_HANDLERS[name](module)
    children = list(module.children())
    if name == "Sequential" or (children and _is_sequential_like(module)):
        child_fns = [_convert(c) for c in children]

        def fn(params, off, x):
            for cf in child_fns:
                x, off = cf(params, off, x)
            return x, off

        return fn
    raise TypeError(
        f"Cannot translate torch module {name!r}: only Sequential compositions "
        f"of {sorted(_LEAF_HANDLERS)} are supported. Define the model in "
        f"flax/JAX (build_model accepts flax modules and plain apply "
        f"functions) for arbitrary architectures."
    )


def _is_sequential_like(module) -> bool:
    # A container whose forward is inherited composition cannot be detected
    # reliably; only genuine nn.Sequential is treated as composition.
    return False


def from_torch_module(module) -> Tuple[Callable, List[jnp.ndarray]]:
    """Translate a supported torch module into (apply_fn, params_template).

    ``params_template`` is a list of arrays in ``module.parameters()``
    order, so ``ravel_pytree`` of it reproduces the reference's flat-vector
    layout (cat of per-parameter flattens — reference: hamiltorch/util.py:121-122).
    """
    fn = _convert(module)
    template = [
        jnp.asarray(p.detach().cpu().numpy()) for p in module.parameters()
    ]

    def apply_fn(params_list, x):
        out, _ = fn(params_list, 0, x)
        return out

    return apply_fn, template
