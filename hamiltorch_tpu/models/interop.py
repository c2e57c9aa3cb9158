"""torch.nn.Module -> JAX apply-function bridge.

The reference operates directly on ``torch.nn.Module`` objects by rewriting
them into pure functions at runtime (reference: hamiltorch/util.py:253-376).
This bridge lets reference users keep their torch model *definitions* while
sampling runs on TPU: supported layer types are translated once into jnp
operations, and the parameter template preserves ``module.parameters()``
order so flat vectors (and therefore ``params_init`` / stored samples) have
the identical memory layout to the reference.

Two translation paths:

* **Direct**: Sequential/ModuleList compositions of the leaf layer types
  below are translated structurally (no torch execution involved).
* **torch.fx fallback**: modules with CUSTOM ``forward`` methods (tensor
  reshapes, ``torch.nn.functional`` calls, arithmetic, skip connections)
  are symbolically traced with ``torch.fx`` and the traced graph is
  interpreted with jnp ops — the same class of models the reference's
  ``make_functional`` Scope rewriting handles (reference:
  hamiltorch/util.py:253-376), e.g. its conv test net
  (reference: tests/test_util.py:64-95).

Leaf layers: Linear, Conv2d, ConvTranspose2d, BatchNorm1d/2d, LayerNorm,
Embedding, RNN/LSTM/GRU (lax.scan recurrences; torch.fx keeps them atomic
so they compose with custom forwards), ReLU, Tanh, Sigmoid, GELU, ELU,
LeakyReLU, Softmax, LogSoftmax, Flatten, Identity, Dropout (inference =
identity), MaxPool2d, AvgPool2d.  Custom-forward SUBmodules nest (the fx
fallback recurses).  Not coverable: data-dependent Python control flow in
``forward`` (untraceable by construction) — define those models in
flax/JAX instead (``build_model`` accepts flax modules and plain apply
functions).
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


# torch padding_mode -> jnp.pad mode (the padded conv then runs VALID)
_PAD_MODES = {"circular": "wrap", "reflect": "reflect", "replicate": "edge"}


def _check_padding_mode(mod):
    pm = getattr(mod, "padding_mode", "zeros")
    if pm != "zeros" and pm not in _PAD_MODES:
        raise NotImplementedError(
            f"Conv padding_mode={mod.padding_mode!r} is not supported by the "
            "torch bridge; silently zero-padding would change every border "
            "value with no error."
        )


def _conv2d(mod):
    _check_padding_mode(mod)
    has_bias = mod.bias is not None
    stride = tuple(mod.stride)
    padding = tuple((p, p) for p in mod.padding) if not isinstance(mod.padding, str) else mod.padding
    dilation = tuple(mod.dilation)
    groups = mod.groups
    pad_mode = getattr(mod, "padding_mode", "zeros")

    def fn(params, off, x):
        pads = padding
        if pad_mode != "zeros" and not isinstance(padding, str):
            # non-zero border semantics: materialise the border with jnp.pad
            # and run the conv unpadded
            x = jnp.pad(
                x, ((0, 0), (0, 0)) + tuple(padding), mode=_PAD_MODES[pad_mode]
            )
            pads = "VALID"
        w = params[off]  # (O, I/groups, KH, KW), torch layout
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=stride, padding=pads,
            rhs_dilation=dilation, feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if has_bias:
            y = y + params[off + 1][None, :, None, None]
        return y, off + (2 if has_bias else 1)

    return fn


def _check_pool_semantics(ceil_mode=False, dilation=1, count_include_pad=True,
                          divisor_override=None):
    """Refuse pooling options the bridge does not translate — silently
    ignoring them would change output shapes/values with no error."""
    d = dilation if isinstance(dilation, tuple) else (dilation,) * 2
    if ceil_mode:
        raise NotImplementedError("pooling with ceil_mode=True is not supported by the torch bridge")
    if d != (1, 1):
        raise NotImplementedError("pooling with dilation != 1 is not supported by the torch bridge")
    if not count_include_pad:
        raise NotImplementedError("avg_pool2d count_include_pad=False is not supported by the torch bridge")
    if divisor_override is not None:
        raise NotImplementedError("avg_pool2d divisor_override is not supported by the torch bridge")


def _pool(mod, reducer, init, is_avg):
    _check_pool_semantics(
        ceil_mode=getattr(mod, "ceil_mode", False),
        dilation=getattr(mod, "dilation", 1),
        count_include_pad=getattr(mod, "count_include_pad", True),
        divisor_override=getattr(mod, "divisor_override", None),
    )
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


def _conv_transpose2d(mod):
    """ConvTranspose2d via lax.conv_transpose with transpose_kernel=True
    (flips spatial dims and swaps I/O — exactly torch's gradient-of-conv
    semantics for the (I, O, KH, KW) torch weight layout)."""
    _check_padding_mode(mod)
    if mod.groups != 1:
        # NotImplementedError, NOT TypeError: the structural translator's
        # TypeError is the fall-back-to-fx control signal, and the fx path
        # would bury this message under an unrelated unsupported-op error
        raise NotImplementedError(
            "ConvTranspose2d with groups != 1 is not supported"
        )
    has_bias = mod.bias is not None
    s = tuple(mod.stride)
    p = tuple(mod.padding)
    op = tuple(mod.output_padding)
    d = tuple(mod.dilation)
    k = tuple(mod.kernel_size)
    pads = tuple(
        (d[i] * (k[i] - 1) - p[i], d[i] * (k[i] - 1) - p[i] + op[i])
        for i in range(2)
    )

    def fn(params, off, x):
        # torch layout (I, O, KH, KW) is the OIHW weight of the FORWARD conv
        # this layer transposes; transpose_kernel=True then flips/swaps to
        # compute exactly torch's gradient-of-conv semantics
        w = params[off]
        y = jax.lax.conv_transpose(
            x, w, strides=s, padding=pads, rhs_dilation=d,
            dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True,
        )
        if has_bias:
            y = y + params[off + 1][None, :, None, None]
        return y, off + (2 if has_bias else 1)

    return fn


def _layernorm(mod):
    eps = mod.eps
    affine = mod.elementwise_affine
    ndims = len(mod.normalized_shape)

    def fn(params, off, x):
        axes = tuple(range(x.ndim - ndims, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        if affine:
            y = y * params[off] + params[off + 1]
            return y, off + 2
        return y, off

    return fn


def _embedding(mod):
    def fn(params, off, x):
        return jnp.take(params[off], x.astype(jnp.int32), axis=0), off + 1

    return fn


def _rnn_family(mod):
    """nn.RNN / nn.LSTM / nn.GRU as lax.scan recurrences.

    The reference supports these through method re-binding in its Scope
    rewriter (reference: hamiltorch/util.py:294-316).  Covers stacked
    unidirectional layers, optional bias, batch_first either way; returns
    (output, h_n) or (output, (h_n, c_n)) exactly like torch.  Weight
    layout per layer follows torch: W_ih (G*H, I), W_hh (G*H, H) with gate
    order i,f,g,o (LSTM) / r,z,n (GRU).
    """
    kind = type(mod).__name__
    if getattr(mod, "bidirectional", False):
        raise TypeError(f"bidirectional {kind} is not supported")
    if getattr(mod, "proj_size", 0):
        raise TypeError(f"{kind} with proj_size is not supported")
    num_layers = mod.num_layers
    hidden = mod.hidden_size
    has_bias = mod.bias
    batch_first = mod.batch_first
    nonlin = jnp.tanh if getattr(mod, "nonlinearity", "tanh") == "tanh" else jax.nn.relu
    per_layer = 4 if has_bias else 2

    def cell_rnn(x_t, h, w_ih, w_hh, b_ih, b_hh):
        a = x_t @ w_ih.T + h @ w_hh.T
        if b_ih is not None:
            a = a + b_ih + b_hh
        return nonlin(a), None

    def cell_lstm(x_t, hc, w_ih, w_hh, b_ih, b_hh):
        h, c_ = hc
        a = x_t @ w_ih.T + h @ w_hh.T
        if b_ih is not None:
            a = a + b_ih + b_hh
        i, f, g, o = jnp.split(a, 4, axis=-1)
        c_ = jax.nn.sigmoid(f) * c_ + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c_)
        return h, c_

    def cell_gru(x_t, h, w_ih, w_hh, b_ih, b_hh):
        gi = x_t @ w_ih.T
        gh = h @ w_hh.T
        if b_ih is not None:
            gi = gi + b_ih
            gh = gh + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)  # torch's GRU gates the HIDDEN term only
        return (1.0 - z) * n + z * h, None

    cell = {"RNN": cell_rnn, "LSTM": cell_lstm, "GRU": cell_gru}[kind]
    is_lstm = kind == "LSTM"

    def fn(params, off, x, hx=None):
        # torch (>=1.11) also accepts UNBATCHED (T, I) input -> (T, H) output
        # (batch_first is ignored for unbatched input); run it as batch 1
        unbatched = x.ndim == 2
        if unbatched:
            x = x[:, None, :]
        elif batch_first:
            x = jnp.swapaxes(x, 0, 1)  # (T, B, I) internally
        t_b = x.shape[1:2]

        def init_h(layer, which):
            if hx is None:
                return jnp.zeros(t_b + (hidden,), x.dtype)
            h = hx[which][layer] if is_lstm else hx[layer]
            return h[None] if h.ndim == 1 else h  # unbatched hx -> batch 1

        h_layers, c_layers = [], []
        seq = x
        o = off
        for layer in range(num_layers):
            w_ih, w_hh = params[o], params[o + 1]
            b_ih = params[o + 2] if has_bias else None
            b_hh = params[o + 3] if has_bias else None
            o += per_layer
            carry0 = (
                (init_h(layer, 0), init_h(layer, 1)) if is_lstm else init_h(layer, 0)
            )

            def step(carry, x_t, w_ih=w_ih, w_hh=w_hh, b_ih=b_ih, b_hh=b_hh):
                if is_lstm:
                    h, c_ = cell(x_t, carry, w_ih, w_hh, b_ih, b_hh)
                    return (h, c_), h
                h, _ = cell(x_t, carry, w_ih, w_hh, b_ih, b_hh)
                return h, h

            carry_f, seq = jax.lax.scan(step, carry0, seq)
            if is_lstm:
                h_layers.append(carry_f[0])
                c_layers.append(carry_f[1])
            else:
                h_layers.append(carry_f)
        if unbatched:
            out = seq[:, 0, :]
            h_n = jnp.stack(h_layers)[:, 0, :]
            c_n = jnp.stack(c_layers)[:, 0, :] if is_lstm else None
        else:
            out = jnp.swapaxes(seq, 0, 1) if batch_first else seq
            h_n = jnp.stack(h_layers)
            c_n = jnp.stack(c_layers) if is_lstm else None
        if is_lstm:
            return (out, (h_n, c_n)), o
        return (out, h_n), o

    return fn


_LEAF_HANDLERS = {
    "Linear": _linear,
    "RNN": _rnn_family,
    "LSTM": _rnn_family,
    "GRU": _rnn_family,
    "Conv2d": _conv2d,
    "ConvTranspose2d": _conv_transpose2d,
    "BatchNorm1d": _batchnorm,
    "BatchNorm2d": _batchnorm,
    "LayerNorm": _layernorm,
    "Embedding": _embedding,
    "ReLU": _elementwise(lambda m, x: jax.nn.relu(x)),
    "Tanh": _elementwise(lambda m, x: jnp.tanh(x)),
    "Sigmoid": _elementwise(lambda m, x: jax.nn.sigmoid(x)),
    "GELU": _elementwise(lambda m, x: jax.nn.gelu(
        x, approximate=getattr(m, "approximate", "none") != "none")),
    "ELU": _elementwise(lambda m, x: jax.nn.elu(x, alpha=m.alpha)),
    "LeakyReLU": _elementwise(lambda m, x: jax.nn.leaky_relu(x, negative_slope=m.negative_slope)),
    "Softmax": _elementwise(lambda m, x: jax.nn.softmax(x, axis=m.dim if m.dim is not None else -1)),
    "LogSoftmax": _elementwise(lambda m, x: jax.nn.log_softmax(x, axis=m.dim if m.dim is not None else -1)),
    "Identity": _elementwise(lambda m, x: x),
    "Dropout": _elementwise(lambda m, x: x),  # inference semantics
    "Flatten": _elementwise(lambda m, x: _flatten_dims(x, m.start_dim, m.end_dim)),
    "MaxPool2d": lambda m: _pool(m, jax.lax.max, -jnp.inf, is_avg=False),
    "AvgPool2d": lambda m: _pool(m, jax.lax.add, 0.0, is_avg=True),
}


def _convert(module) -> Callable:
    name = type(module).__name__
    if name in _LEAF_HANDLERS:
        return _LEAF_HANDLERS[name](module)
    if name in ("Sequential", "ModuleList"):
        # iterate the container itself: .children() deduplicates repeated
        # submodule OBJECTS, silently dropping reuses of a shared layer
        entries = list(module)
        if len({id(m) for m in entries}) != len(entries):
            # a shared layer breaks the sequential parameter-offset scheme
            # (module.parameters() dedups); the fx path maps parameters per
            # submodule by identity and handles sharing correctly
            raise TypeError(
                f"{name} reuses a submodule object; falling back to torch.fx"
            )
        child_fns = [_convert(c) for c in entries]

        def fn(params, off, x):
            for cf in child_fns:
                x, off = cf(params, off, x)
            return x, off

        return fn
    raise TypeError(
        f"Cannot translate torch module {name!r} structurally: only "
        f"Sequential/ModuleList compositions of {sorted(_LEAF_HANDLERS)} are "
        f"supported on the direct path."
    )


# ---------------------------------------------------------------------------
# torch.fx fallback: interpret a symbolically traced custom forward with jnp


def _fx_tables():
    """(call_function table, call_method table), built lazily so torch is
    only imported when the fx path is taken."""
    import operator

    import torch
    import torch.nn.functional as F

    def _softmaxish(jax_fn):
        def h(x, dim=None, **kw):
            return jax_fn(x, axis=-1 if dim is None else dim)

        return h

    def _pool2d_core(x, kernel_size, stride, padding, reducer, init, is_avg):
        k = kernel_size if isinstance(kernel_size, tuple) else (kernel_size,) * 2
        s = stride if stride is not None else k
        s = s if isinstance(s, tuple) else (s,) * 2
        p = padding if isinstance(padding, tuple) else (padding,) * 2
        y = jax.lax.reduce_window(
            x, init, reducer,
            window_dimensions=(1, 1) + k, window_strides=(1, 1) + s,
            padding=((0, 0), (0, 0)) + tuple((pi, pi) for pi in p),
        )
        return y / (k[0] * k[1]) if is_avg else y

    # torch's exact positional signatures — a shared signature would
    # mis-bind positional ceil_mode/dilation between the two flavours
    def _max_pool2d(x, kernel_size, stride=None, padding=0, dilation=1,
                    ceil_mode=False, return_indices=False):
        if return_indices:
            raise NotImplementedError(
                "max_pool2d return_indices=True is not supported by the torch bridge"
            )
        _check_pool_semantics(ceil_mode=ceil_mode, dilation=dilation)
        return _pool2d_core(x, kernel_size, stride, padding,
                            jax.lax.max, -jnp.inf, is_avg=False)

    def _avg_pool2d(x, kernel_size, stride=None, padding=0, ceil_mode=False,
                    count_include_pad=True, divisor_override=None):
        _check_pool_semantics(ceil_mode=ceil_mode,
                              count_include_pad=count_include_pad,
                              divisor_override=divisor_override)
        return _pool2d_core(x, kernel_size, stride, padding,
                            jax.lax.add, 0.0, is_avg=True)

    functions = {
        F.relu: lambda x, inplace=False: jax.nn.relu(x),
        torch.relu: jax.nn.relu,
        F.gelu: lambda x, approximate="none": jax.nn.gelu(x, approximate=approximate != "none"),
        F.elu: lambda x, alpha=1.0, inplace=False: jax.nn.elu(x, alpha=alpha),
        F.leaky_relu: lambda x, negative_slope=0.01, inplace=False: jax.nn.leaky_relu(x, negative_slope=negative_slope),
        F.silu: lambda x, inplace=False: jax.nn.silu(x),
        torch.tanh: jnp.tanh,
        F.tanh: jnp.tanh,
        torch.sigmoid: jax.nn.sigmoid,
        F.sigmoid: jax.nn.sigmoid,
        F.softplus: lambda x, beta=1.0, threshold=20.0: jax.nn.softplus(beta * x) / beta,
        F.softmax: _softmaxish(jax.nn.softmax),
        F.log_softmax: _softmaxish(jax.nn.log_softmax),
        F.dropout: lambda x, p=0.5, training=False, inplace=False: x,
        F.max_pool2d: _max_pool2d,
        F.avg_pool2d: _avg_pool2d,
        torch.flatten: lambda x, start_dim=0, end_dim=-1: _flatten_dims(x, start_dim, end_dim),
        torch.cat: lambda tensors, dim=0: jnp.concatenate(tensors, axis=dim),
        torch.stack: lambda tensors, dim=0: jnp.stack(tensors, axis=dim),
        torch.add: operator.add,
        torch.sub: operator.sub,
        torch.mul: operator.mul,
        torch.matmul: jnp.matmul,
        torch.mean: lambda x, dim=None, keepdim=False: jnp.mean(x, axis=dim, keepdims=keepdim),
        torch.sum: lambda x, dim=None, keepdim=False: jnp.sum(x, axis=dim, keepdims=keepdim),
        torch.exp: jnp.exp,
        torch.log: jnp.log,
        torch.abs: jnp.abs,
        torch.sqrt: jnp.sqrt,
        torch.erf: jax.scipy.special.erf,
        torch.pow: jnp.power,
        torch.clamp: lambda x, min=None, max=None: jnp.clip(x, min, max),
        torch.transpose: lambda x, a, b: jnp.swapaxes(x, a, b),
        torch.squeeze: lambda x, dim=None: jnp.squeeze(x, axis=dim),
        torch.unsqueeze: lambda x, dim: jnp.expand_dims(x, dim),
        torch.bmm: jnp.matmul,
        torch.chunk: lambda x, chunks, dim=0: tuple(
            jnp.array_split(x, chunks, axis=dim)
        ),
        torch.split: lambda x, size, dim=0: _split(x, size, dim),
        torch.max: lambda x, dim=None, keepdim=False: _min_max(jnp.max, jnp.argmax, x, dim, keepdim),
        torch.min: lambda x, dim=None, keepdim=False: _min_max(jnp.min, jnp.argmin, x, dim, keepdim),
        torch.where: jnp.where,
        F.linear: lambda x, w, b=None: (x @ w.T) if b is None else (x @ w.T + b),
        F.conv2d: lambda x, w, bias=None, stride=1, padding=0, dilation=1, groups=1: _f_conv2d(
            x, w, bias, stride, padding, dilation, groups
        ),
        F.normalize: lambda x, p=2.0, dim=1, eps=1e-12: x
        / jnp.maximum(jnp.linalg.norm(x, ord=p, axis=dim, keepdims=True), eps),
        operator.pow: operator.pow,
        operator.add: operator.add,
        operator.sub: operator.sub,
        operator.mul: operator.mul,
        operator.truediv: operator.truediv,
        operator.matmul: jnp.matmul,
        operator.neg: operator.neg,
        operator.getitem: lambda x, idx: x[idx],
        # comparisons / mask algebra (mask-and-where patterns)
        operator.gt: operator.gt,
        operator.lt: operator.lt,
        operator.ge: operator.ge,
        operator.le: operator.le,
        operator.eq: operator.eq,
        operator.ne: operator.ne,
        operator.and_: operator.and_,
        operator.or_: operator.or_,
        operator.xor: operator.xor,
        operator.invert: operator.invert,
    }

    methods = {
        "view": lambda x, *shape: x.reshape(_shape_args(shape)),
        "reshape": lambda x, *shape: x.reshape(_shape_args(shape)),
        "flatten": lambda x, start_dim=0, end_dim=-1: _flatten_dims(x, start_dim, end_dim),
        "permute": lambda x, *dims: jnp.transpose(x, _shape_args(dims)),
        "transpose": lambda x, a, b: jnp.swapaxes(x, a, b),
        "squeeze": lambda x, dim=None: jnp.squeeze(x, axis=dim),
        "unsqueeze": lambda x, dim: jnp.expand_dims(x, dim),
        "contiguous": lambda x: x,
        "detach": lambda x: x,
        "clone": lambda x: x,
        "float": lambda x: x.astype(jnp.float32),
        "mean": lambda x, dim=None, keepdim=False: jnp.mean(x, axis=dim, keepdims=keepdim),
        "sum": lambda x, dim=None, keepdim=False: jnp.sum(x, axis=dim, keepdims=keepdim),
        "relu": jax.nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
        "exp": jnp.exp,
        "log": jnp.log,
        "t": lambda x: x.T,
        "size": lambda x, dim=None: x.shape if dim is None else x.shape[dim],
        "abs": jnp.abs,
        "sqrt": jnp.sqrt,
        "pow": jnp.power,
        "clamp": lambda x, min=None, max=None: jnp.clip(x, min, max),
        "matmul": jnp.matmul,
        "chunk": lambda x, chunks, dim=0: tuple(jnp.array_split(x, chunks, axis=dim)),
        "split": lambda x, size, dim=0: _split(x, size, dim),
        "repeat": lambda x, *reps: jnp.tile(x, _shape_args(reps)),
        "expand": lambda x, *shape: _expand(x, _shape_args(shape)),
        "masked_fill": lambda x, mask, value: jnp.where(mask, value, x),
        "softmax": lambda x, dim=-1: jax.nn.softmax(x, axis=dim),
        "log_softmax": lambda x, dim=-1: jax.nn.log_softmax(x, axis=dim),
        "argmax": lambda x, dim=None, keepdim=False: jnp.argmax(x, axis=dim, keepdims=keepdim),
        "max": lambda x, dim=None, keepdim=False: _min_max(jnp.max, jnp.argmax, x, dim, keepdim),
        "min": lambda x, dim=None, keepdim=False: _min_max(jnp.min, jnp.argmin, x, dim, keepdim),
        "mul": operator.mul,
        "add": operator.add,
        "sub": operator.sub,
        "div": operator.truediv,
        "neg": operator.neg,
    }
    return functions, methods


def _min_max(reduce_fn, arg_fn, x, dim, keepdim):
    """torch.max/min: whole-tensor reduction without dim, (values, indices)
    pair with dim — fx ``getitem`` nodes index the returned tuple."""
    if dim is None:
        return reduce_fn(x)
    return (
        reduce_fn(x, axis=dim, keepdims=keepdim),
        arg_fn(x, axis=dim, keepdims=keepdim),
    )


def _split(x, size, dim):
    """torch.split: int size -> equal chunks (+ragged tail); list -> sizes."""
    import numpy as np

    if isinstance(size, (list, tuple)):
        idx = np.cumsum(size[:-1]).tolist()
    else:
        idx = list(range(size, x.shape[dim], size))
    return tuple(jnp.split(x, idx, axis=dim))


def _expand(x, shape):
    """torch.expand: -1 keeps the existing dimension; leading dims may be
    added on the left."""
    nd = len(shape)
    x = x.reshape((1,) * (nd - x.ndim) + x.shape)
    target = tuple(
        x.shape[i] if s == -1 else s for i, s in enumerate(shape)
    )
    return jnp.broadcast_to(x, target)


def _f_conv2d(x, w, bias, stride, padding, dilation, groups):
    """torch.nn.functional.conv2d with live weight/bias tensors."""
    s = stride if isinstance(stride, tuple) else (stride,) * 2
    d = dilation if isinstance(dilation, tuple) else (dilation,) * 2
    if isinstance(padding, str):
        p = padding.upper()
    else:
        pp = padding if isinstance(padding, tuple) else (padding,) * 2
        p = tuple((pi, pi) for pi in pp)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=s, padding=p, rhs_dilation=d,
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        y = y + bias[None, :, None, None]
    return y


def _shape_args(shape):
    # torch accepts .view(2, 3) and .view((2, 3))
    if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
        return tuple(shape[0])
    return tuple(shape)


def _flatten_dims(x, start_dim, end_dim):
    nd = x.ndim
    start = start_dim % nd
    end = end_dim % nd
    new_shape = x.shape[:start] + (-1,) + x.shape[end + 1 :]
    return x.reshape(new_shape)


def _from_torch_fx(module) -> Callable:
    """Symbolically trace a custom ``forward`` and return an fx-graph
    interpreter ``fn(params, off, x) -> (out, off)`` in the leaf-handler
    calling convention.

    Equivalent capability to the reference's Scope rewriting for arbitrary
    forwards (reference: hamiltorch/util.py:253-376), minus RNNs and
    data-dependent Python control flow (untraceable by fx by construction).
    """
    import torch
    import torch.fx as fx_mod
    from torch.fx.node import map_arg

    try:
        gm = fx_mod.symbolic_trace(module)
    except Exception as e:
        raise TypeError(
            f"Cannot translate torch module {type(module).__name__!r}: not a "
            f"Sequential/ModuleList composition and torch.fx tracing failed "
            f"({e}). Define the model in flax/JAX instead (build_model "
            f"accepts flax modules and plain apply functions)."
        ) from e

    # each parameter's index in module.parameters() order.  Per-submodule
    # index LISTS (not a base offset) keep the mapping correct under weight
    # tying, where torch deduplicates the flat order and a tied leaf's
    # parameters are no longer contiguous in it.
    flat_ids = {id(p): i for i, p in enumerate(module.parameters())}
    # remove_duplicate=False: a shared layer reachable under two names
    # must resolve for BOTH call_module targets
    submods = dict(module.named_modules(remove_duplicate=False))
    handlers, param_idx, rnn_targets = {}, {}, set()
    functions, methods = _fx_tables()

    n_placeholders = sum(1 for n in gm.graph.nodes if n.op == "placeholder")
    if n_placeholders != 1:
        raise TypeError(
            f"torch.fx forward takes {n_placeholders} tensor inputs; the "
            "bridge translates single-input forwards only (close over extra "
            "inputs, or define the model in flax/JAX)"
        )

    for node in gm.graph.nodes:
        if node.op == "call_module":
            if node.target not in handlers:
                sub = submods[node.target]
                try:
                    handlers[node.target] = _convert(sub)
                except TypeError:
                    # nested custom-forward module: recurse through fx
                    handlers[node.target] = _from_torch_fx(sub)
                param_idx[node.target] = [flat_ids[id(p)] for p in sub.parameters()]
                if type(sub).__name__ in ("RNN", "LSTM", "GRU"):
                    rnn_targets.add(node.target)
            # only the RNN family takes a 2nd argument (the initial hidden
            # state); silently dropping extra args would compute wrong
            # results with no error
            if node.kwargs:
                raise TypeError(
                    f"submodule call {node.target!r} passes keyword arguments "
                    f"{sorted(node.kwargs)}; the bridge supports positional "
                    "tensor inputs only"
                )
            if len(node.args) > (2 if node.target in rnn_targets else 1):
                raise TypeError(
                    f"submodule call {node.target!r} passes {len(node.args)} "
                    "arguments; only RNN/LSTM/GRU submodules accept a second "
                    "(initial hidden state) argument"
                )
        elif node.op == "call_function" and node.target not in functions:
            raise TypeError(
                f"torch.fx node calls unsupported function {node.target}; "
                f"supported: {sorted(str(f) for f in functions)}"
            )
        elif node.op == "call_method" and node.target not in methods:
            raise TypeError(
                f"torch.fx node calls unsupported tensor method "
                f"{node.target!r}; supported: {sorted(methods)}"
            )

    buffers = {
        name: jnp.asarray(b.detach().cpu().numpy())
        for name, b in module.named_buffers()
    }
    # get_attr nodes that resolve to nn.Parameters must index into the live
    # params list (baking them in as constants would freeze them: sampling
    # would explore the coordinate while the forward never saw it change)
    param_attr_idx = {name: flat_ids[id(p)] for name, p in module.named_parameters()}

    def fn(params, off, x):
        env = {}

        def load(n):
            return env[n.name]

        placeholders = [n for n in gm.graph.nodes if n.op == "placeholder"]
        env[placeholders[0].name] = x

        out = None
        for node in gm.graph.nodes:
            if node.op == "placeholder":
                continue
            args = map_arg(node.args, load)
            kwargs = map_arg(node.kwargs, load)
            if node.op == "call_module":
                sub_params = [params[off + i] for i in param_idx[node.target]]
                y, _ = handlers[node.target](sub_params, 0, *args)
                env[node.name] = y
            elif node.op == "call_function":
                env[node.name] = functions[node.target](*args, **kwargs)
            elif node.op == "call_method":
                env[node.name] = methods[node.target](*args, **kwargs)
            elif node.op == "get_attr":
                target = node.target
                if target in param_attr_idx:  # directly-read nn.Parameter
                    env[node.name] = params[off + param_attr_idx[target]]
                elif target in buffers:
                    env[node.name] = buffers[target]
                else:  # constant attribute on the module
                    obj = module
                    for part in target.split("."):
                        obj = getattr(obj, part)
                    if hasattr(obj, "detach"):
                        obj = jnp.asarray(obj.detach().cpu().numpy())
                    env[node.name] = obj
            elif node.op == "output":
                out = args[0]
        return out, off + len(flat_ids)

    return fn


def from_torch_module(module) -> Tuple[Callable, List[jnp.ndarray]]:
    """Translate a supported torch module into (apply_fn, params_template).

    ``params_template`` is a list of arrays in ``module.parameters()``
    order, so ``ravel_pytree`` of it reproduces the reference's flat-vector
    layout (cat of per-parameter flattens — reference: hamiltorch/util.py:121-122).

    Sequential/ModuleList compositions translate structurally; custom
    ``forward`` methods go through the torch.fx fallback (see module
    docstring).
    """
    try:
        fn = _convert(module)
    except TypeError:
        fn = _from_torch_fx(module)
    template = [
        jnp.asarray(p.detach().cpu().numpy()) for p in module.parameters()
    ]

    def apply_fn(params_list, x):
        out, _ = fn(params_list, 0, x)
        return out

    return apply_fn, template
