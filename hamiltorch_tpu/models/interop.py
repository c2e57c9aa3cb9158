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

Leaf layers: Linear, Conv1d/2d/3d, ConvTranspose2d, BatchNorm1d/2d/3d,
LayerNorm, GroupNorm, InstanceNorm1d/2d/3d, Embedding, RNN/LSTM/GRU
(lax.scan recurrences; torch.fx keeps them atomic so they compose with
custom forwards), PReLU (learnable slope stays a sampled parameter), ReLU,
ReLU6, Tanh, Sigmoid, GELU, ELU, SELU, CELU, SiLU, Mish, LeakyReLU,
Hardtanh, Hardswish, Hardsigmoid, Softplus, Softsign, Softmax, LogSoftmax,
Flatten, Unflatten, Identity, Dropout/1d/2d (inference = identity),
MaxPool1d/2d/3d, AvgPool1d/2d/3d, AdaptiveAvgPool1d/2d/3d,
AdaptiveMaxPool1d/2d/3d.  Custom-forward SUBmodules nest (the fx fallback
recurses).

Data-dependent Python control flow in ``forward`` is untraceable by fx by
construction; passing ``example_input=`` enables a third path — a CONCRETE
``torch.jit.trace`` whose inlined TorchScript graph is interpreted with
jnp ops (``_from_torch_traced``), with the branch taken on the example
frozen in.  Alternatively define those models in flax/JAX
(``build_model`` accepts flax modules and plain apply functions).

A fourth path, ``method="callback"``, drops translation altogether and
executes the REAL torch forward/backward on the host per evaluation
(``_from_torch_callback``) — the reference's own universality mechanism
(it executes any forward eagerly, reference: hamiltorch/util.py:318-346).
Exact for ANY module, including live data-dependent branches and ops in no
table; costs: host-eager speed, CPU backend only (the axon TPU plugin
rejects host callbacks), first-order gradients only.
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


# spatial dimension chars for conv dimension_numbers, by rank
_SPATIAL = {1: "H", 2: "HW", 3: "DHW"}


def _conv_dn(n):
    s = _SPATIAL[n]
    return ("NC" + s, "OI" + s, "NC" + s)


def _convnd(n):
    """nn.Conv1d/2d/3d -> lax.conv_general_dilated (torch NC[spatial] /
    OI[spatial] layouts are given to XLA directly; no transposes)."""

    def build(mod):
        _check_padding_mode(mod)
        has_bias = mod.bias is not None
        stride = tuple(mod.stride)
        padding = (
            tuple((p, p) for p in mod.padding)
            if not isinstance(mod.padding, str)
            else mod.padding.upper()
        )
        dilation = tuple(mod.dilation)
        groups = mod.groups
        pad_mode = getattr(mod, "padding_mode", "zeros")
        dn = _conv_dn(n)

        def fn(params, off, x):
            pads = padding
            if pad_mode != "zeros" and not isinstance(padding, str):
                # non-zero border semantics: materialise the border with
                # jnp.pad and run the conv unpadded
                x = jnp.pad(
                    x, ((0, 0), (0, 0)) + tuple(padding), mode=_PAD_MODES[pad_mode]
                )
                pads = "VALID"
            w = params[off]  # (O, I/groups, *K), torch layout
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=stride, padding=pads,
                rhs_dilation=dilation, feature_group_count=groups,
                dimension_numbers=dn,
            )
            if has_bias:
                y = y + params[off + 1].reshape((1, -1) + (1,) * n)
            return y, off + (2 if has_bias else 1)

        return fn

    return build


_conv2d = _convnd(2)


def _check_pool_semantics(ceil_mode=False, dilation=1, count_include_pad=True,
                          divisor_override=None, n=2):
    """Refuse pooling options the bridge does not translate — silently
    ignoring them would change output shapes/values with no error."""
    d = dilation if isinstance(dilation, tuple) else (dilation,) * n
    if ceil_mode:
        raise NotImplementedError("pooling with ceil_mode=True is not supported by the torch bridge")
    if d != (1,) * n:
        raise NotImplementedError("pooling with dilation != 1 is not supported by the torch bridge")
    if not count_include_pad:
        raise NotImplementedError("avg_pool count_include_pad=False is not supported by the torch bridge")
    if divisor_override is not None:
        raise NotImplementedError("avg_pool divisor_override is not supported by the torch bridge")


def _pool(mod, reducer, init, is_avg, n=2):
    _check_pool_semantics(
        ceil_mode=getattr(mod, "ceil_mode", False),
        dilation=getattr(mod, "dilation", 1),
        count_include_pad=getattr(mod, "count_include_pad", True),
        divisor_override=getattr(mod, "divisor_override", None),
        n=n,
    )
    k = mod.kernel_size if isinstance(mod.kernel_size, tuple) else (mod.kernel_size,) * n
    s = mod.stride if mod.stride is not None else k
    s = s if isinstance(s, tuple) else (s,) * n
    p = mod.padding if isinstance(mod.padding, tuple) else (mod.padding,) * n

    def fn(params, off, x):
        y = jax.lax.reduce_window(
            x, init, reducer,
            window_dimensions=(1, 1) + k, window_strides=(1, 1) + s,
            padding=((0, 0), (0, 0)) + tuple((pi, pi) for pi in p),
        )
        if is_avg:
            d = 1
            for ki in k:
                d *= ki
            y = y / d
        return y, off

    return fn


def _adaptive_reduce(x, out_sizes, reduce_fn):
    """torch adaptive pooling: output bin i over an axis of size I spans
    [floor(i*I/O), ceil((i+1)*I/O)).  ``out_sizes`` covers the trailing
    spatial axes; ``None`` keeps that axis' input size."""
    for ax_rel, o in enumerate(out_sizes):
        axis = x.ndim - len(out_sizes) + ax_rel
        size = x.shape[axis]
        if o is None or size == o:
            continue
        segs = [
            reduce_fn(
                jax.lax.slice_in_dim(
                    x, (i * size) // o, -(-((i + 1) * size) // o), axis=axis
                ),
                axis=axis,
                keepdims=True,
            )
            for i in range(o)
        ]
        x = jnp.concatenate(segs, axis=axis)
    return x


def _adaptive_pool(n, is_avg):
    def build(mod):
        if getattr(mod, "return_indices", False):
            raise NotImplementedError(
                "adaptive max pooling with return_indices=True is not "
                "supported by the torch bridge"
            )
        out = mod.output_size
        out = tuple(out) if isinstance(out, (tuple, list)) else (out,) * n
        red = jnp.mean if is_avg else jnp.max

        def fn(params, off, x):
            return _adaptive_reduce(x, out, red), off

        return fn

    return build


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


def _groupnorm(mod):
    eps, groups, affine = mod.eps, mod.num_groups, mod.affine

    def fn(params, off, x):
        n, c = x.shape[0], x.shape[1]
        xg = x.reshape((n, groups, c // groups) + x.shape[2:])
        axes = tuple(range(2, xg.ndim))
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.var(xg, axis=axes, keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        if affine:
            shape = (1, c) + (1,) * (x.ndim - 2)
            y = y * params[off].reshape(shape) + params[off + 1].reshape(shape)
            return y, off + 2
        return y, off

    return fn


def _instancenorm(mod):
    """Per-sample per-channel normalisation over the spatial axes.  As with
    the batch-norm patch (reference: hamiltorch/util.py:370-376) running
    statistics are ignored: the instance moments are always used."""
    eps, affine = mod.eps, mod.affine

    def fn(params, off, x):
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
        if affine:
            shape = (1, -1) + (1,) * (x.ndim - 2)
            y = y * params[off].reshape(shape) + params[off + 1].reshape(shape)
            return y, off + 2
        return y, off

    return fn


def _prelu(mod):
    """PReLU carries a LEARNABLE slope (1 or per-channel along dim 1) —
    it consumes a parameter slot, unlike the stateless activations."""
    n_params = mod.num_parameters

    def fn(params, off, x):
        a = params[off]
        if n_params > 1 and x.ndim > 2:
            a = a.reshape((-1,) + (1,) * (x.ndim - 2))
        return jnp.where(x >= 0, x, a * x), off + 1

    return fn


def _softplus_beta(x, beta=1.0, threshold=20.0):
    """torch softplus: linear above threshold (numerical overflow guard)."""
    scaled = beta * x
    return jnp.where(scaled > threshold, x, jax.nn.softplus(scaled) / beta)


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


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


# keyword arguments the MultiheadAttention handler understands; the fx
# bridge forwards exactly these (everything else is rejected loudly)
_MHA_KWARGS = frozenset({
    "key_padding_mask", "need_weights", "attn_mask",
    "average_attn_weights", "is_causal",
})

# per-module-type (max positional args, allowed kwargs) for fx submodule
# calls; anything else takes exactly one tensor and no keywords — silently
# dropping extra args would compute wrong results with no error
_MODULE_CALL_SURFACE = {
    "RNN": (2, frozenset()),
    "LSTM": (2, frozenset()),
    "GRU": (2, frozenset()),
    "MultiheadAttention": (3, _MHA_KWARGS),
    "TransformerEncoderLayer": (
        2, frozenset({"src_mask", "src_key_padding_mask", "is_causal"})
    ),
    "TransformerEncoder": (
        2, frozenset({"mask", "src_key_padding_mask", "is_causal"})
    ),
    "TransformerDecoderLayer": (
        2, frozenset({"tgt_mask", "memory_mask", "tgt_key_padding_mask",
                      "memory_key_padding_mask", "tgt_is_causal",
                      "memory_is_causal"})
    ),
    "TransformerDecoder": (
        2, frozenset({"tgt_mask", "memory_mask", "tgt_key_padding_mask",
                      "memory_key_padding_mask", "tgt_is_causal",
                      "memory_is_causal"})
    ),
}


def _multihead_attention(mod):
    """nn.MultiheadAttention (self- or cross-attention), inference
    semantics (dropout off, like the Dropout handler).

    Covers batched and unbatched inputs, batch_first either way,
    bias/no-bias, float or bool attn_mask ((L, S) or (N*heads, L, S)),
    key_padding_mask, is_causal, and need_weights/average_attn_weights —
    the call surface the reference reaches by executing the user's forward
    eagerly (reference: hamiltorch/util.py:318-346).  kdim/vdim !=
    embed_dim, add_bias_kv, and add_zero_attn raise loudly.  Returns the
    torch tuple (attn_output, attn_weights-or-None); fx forwards index it
    with getitem.
    """
    if not mod._qkv_same_embed_dim:
        raise TypeError(
            "MultiheadAttention with kdim/vdim != embed_dim is not supported"
        )
    if mod.bias_k is not None or mod.add_zero_attn:
        raise TypeError(
            "MultiheadAttention add_bias_kv/add_zero_attn is not supported"
        )
    num_heads = mod.num_heads
    embed_dim = mod.embed_dim
    head_dim = embed_dim // num_heads
    has_bias = mod.in_proj_bias is not None
    out_has_bias = mod.out_proj.bias is not None
    batch_first = mod.batch_first

    def fn(params, off, query, key=None, value=None, key_padding_mask=None,
           need_weights=True, attn_mask=None, average_attn_weights=True,
           is_causal=False):
        w_in = params[off]
        o = off + 1
        b_in = None
        if has_bias:
            b_in, o = params[o], o + 1
        w_out, o = params[o], o + 1
        b_out = None
        if out_has_bias:
            b_out, o = params[o], o + 1

        key = query if key is None else key
        value = key if value is None else value
        unbatched = query.ndim == 2
        if unbatched:
            q, k, v = query[None], key[None], value[None]
        elif batch_first:
            q, k, v = query, key, value
        else:  # (L, N, E) -> (N, L, E)
            q = jnp.swapaxes(query, 0, 1)
            k = jnp.swapaxes(key, 0, 1)
            v = jnp.swapaxes(value, 0, 1)

        wq, wk, wv = jnp.split(w_in, 3, axis=0)
        q, k, v = q @ wq.T, k @ wk.T, v @ wv.T
        if b_in is not None:
            bq, bk, bv = jnp.split(b_in, 3)
            q, k, v = q + bq, k + bk, v + bv
        n, l, _ = q.shape
        s = k.shape[1]
        qh = q.reshape(n, l, num_heads, head_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(n, s, num_heads, head_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(n, s, num_heads, head_dim).transpose(0, 2, 1, 3)
        logits = (qh / jnp.sqrt(jnp.asarray(head_dim, qh.dtype))) @ jnp.swapaxes(kh, -1, -2)

        if is_causal and attn_mask is None:
            attn_mask = ~jnp.tril(jnp.ones((l, s), bool))
        if attn_mask is not None:
            am = jnp.asarray(attn_mask)
            if am.dtype == jnp.bool_:
                am = jnp.where(am, -jnp.inf, 0.0).astype(logits.dtype)
            am = am[None, None] if am.ndim == 2 else am.reshape(n, num_heads, l, s)
            logits = logits + am
        if key_padding_mask is not None:
            kpm = jnp.asarray(key_padding_mask)
            if kpm.dtype == jnp.bool_:
                kpm = jnp.where(kpm, -jnp.inf, 0.0).astype(logits.dtype)
            if kpm.ndim == 1:  # unbatched (S,)
                kpm = kpm[None]
            logits = logits + kpm[:, None, None, :]

        weights = jax.nn.softmax(logits, axis=-1)  # (N, H, L, S)
        out = (weights @ vh).transpose(0, 2, 1, 3).reshape(n, l, embed_dim)
        out = out @ w_out.T
        if b_out is not None:
            out = out + b_out

        if unbatched:
            out = out[0]
        elif not batch_first:
            out = jnp.swapaxes(out, 0, 1)
        if not need_weights:
            return (out, None), o
        w = jnp.mean(weights, axis=1) if average_attn_weights else weights
        if unbatched:
            w = w[0]
        return (out, w), o

    return fn


def _transformer_encoder_layer(mod):
    """nn.TransformerEncoderLayer (pre- or post-norm), inference semantics.

    Not fx-traceable (torch's fast-path probing breaks on Proxy inputs),
    so it is a composite LEAF built from the attention / linear / layernorm
    handlers.  Parameter offsets follow torch's REGISTRATION order
    (self_attn, linear1, linear2, norm1, norm2), which differs from
    pre-norm execution order.
    """
    import torch.nn.functional as F

    act_table = {
        F.relu: jax.nn.relu,
        # torch F.gelu default is the EXACT erf form, not the tanh approx
        F.gelu: lambda x: jax.nn.gelu(x, approximate=False),
    }
    act = act_table.get(mod.activation)
    if act is None:
        name = getattr(mod.activation, "__name__", repr(mod.activation))
        raise TypeError(
            f"TransformerEncoderLayer activation {name} is not supported "
            "(relu/gelu only)"
        )
    attn_fn = _multihead_attention(mod.self_attn)
    lin1, lin2 = _linear(mod.linear1), _linear(mod.linear2)
    ln1, ln2 = _layernorm(mod.norm1), _layernorm(mod.norm2)
    norm_first = mod.norm_first
    counts = [
        len(list(m.parameters()))
        for m in (mod.self_attn, mod.linear1, mod.linear2, mod.norm1, mod.norm2)
    ]
    o_attn = 0
    o_lin1 = o_attn + counts[0]
    o_lin2 = o_lin1 + counts[1]
    o_norm1 = o_lin2 + counts[2]
    o_norm2 = o_norm1 + counts[3]
    total = o_norm2 + counts[4]

    def fn(params, off, src, src_mask=None, src_key_padding_mask=None,
           is_causal=False):
        def attn_block(x):
            (y, _), _o = attn_fn(
                params, off + o_attn, x, x, x,
                key_padding_mask=src_key_padding_mask, need_weights=False,
                attn_mask=src_mask, is_causal=is_causal,
            )
            return y

        def ff_block(x):
            h, _ = lin1(params, off + o_lin1, x)
            y, _ = lin2(params, off + o_lin2, act(h))
            return y

        def norm1(x):
            return ln1(params, off + o_norm1, x)[0]

        def norm2(x):
            return ln2(params, off + o_norm2, x)[0]

        if norm_first:
            x = src + attn_block(norm1(src))
            x = x + ff_block(norm2(x))
        else:
            x = norm1(src + attn_block(src))
            x = norm2(x + ff_block(x))
        return x, off + total

    return fn


def _transformer_decoder_layer(mod):
    """nn.TransformerDecoderLayer (pre- or post-norm), inference semantics:
    masked self-attention on the target, cross-attention over the encoder
    memory, FFN — a composite leaf like the encoder layer (torch's
    fast-path probing makes it fx-untraceable too).  Parameter offsets
    follow registration order (self_attn, multihead_attn, linear1,
    linear2, norm1, norm2, norm3)."""
    import torch.nn.functional as F

    act_table = {
        F.relu: jax.nn.relu,
        F.gelu: lambda x: jax.nn.gelu(x, approximate=False),
    }
    act = act_table.get(mod.activation)
    if act is None:
        name = getattr(mod.activation, "__name__", repr(mod.activation))
        raise TypeError(
            f"TransformerDecoderLayer activation {name} is not supported "
            "(relu/gelu only)"
        )
    sa_fn = _multihead_attention(mod.self_attn)
    ca_fn = _multihead_attention(mod.multihead_attn)
    lin1, lin2 = _linear(mod.linear1), _linear(mod.linear2)
    ln1, ln2, ln3 = (
        _layernorm(mod.norm1), _layernorm(mod.norm2), _layernorm(mod.norm3)
    )
    norm_first = mod.norm_first
    counts = [
        len(list(m.parameters()))
        for m in (mod.self_attn, mod.multihead_attn, mod.linear1, mod.linear2,
                  mod.norm1, mod.norm2, mod.norm3)
    ]
    offs = [0]
    for c in counts[:-1]:
        offs.append(offs[-1] + c)
    total = offs[-1] + counts[-1]

    def fn(params, off, tgt, memory, tgt_mask=None, memory_mask=None,
           tgt_key_padding_mask=None, memory_key_padding_mask=None,
           tgt_is_causal=False, memory_is_causal=False):
        def sa_block(x):
            (y, _), _o = sa_fn(
                params, off + offs[0], x, x, x,
                key_padding_mask=tgt_key_padding_mask, need_weights=False,
                attn_mask=tgt_mask, is_causal=tgt_is_causal,
            )
            return y

        def ca_block(x):
            (y, _), _o = ca_fn(
                params, off + offs[1], x, memory, memory,
                key_padding_mask=memory_key_padding_mask, need_weights=False,
                attn_mask=memory_mask, is_causal=memory_is_causal,
            )
            return y

        def ff_block(x):
            h, _ = lin1(params, off + offs[2], x)
            y, _ = lin2(params, off + offs[3], act(h))
            return y

        n1 = lambda x: ln1(params, off + offs[4], x)[0]
        n2 = lambda x: ln2(params, off + offs[5], x)[0]
        n3 = lambda x: ln3(params, off + offs[6], x)[0]

        if norm_first:
            x = tgt + sa_block(n1(tgt))
            x = x + ca_block(n2(x))
            x = x + ff_block(n3(x))
        else:
            x = n1(tgt + sa_block(tgt))
            x = n2(x + ca_block(x))
            x = n3(x + ff_block(x))
        return x, off + total

    return fn


def _transformer_decoder(mod):
    """nn.TransformerDecoder: a deep-copied decoder-layer stack + optional
    final norm; parameter order is layers.0..layers.N-1 then norm."""
    layer_fns = [_transformer_decoder_layer(l) for l in mod.layers]
    final_norm = _layernorm(mod.norm) if mod.norm is not None else None

    def fn(params, off, tgt, memory, tgt_mask=None, memory_mask=None,
           tgt_key_padding_mask=None, memory_key_padding_mask=None,
           tgt_is_causal=None, memory_is_causal=False):
        x = tgt
        o = off
        for lf in layer_fns:
            x, o = lf(params, o, x, memory, tgt_mask=tgt_mask,
                      memory_mask=memory_mask,
                      tgt_key_padding_mask=tgt_key_padding_mask,
                      memory_key_padding_mask=memory_key_padding_mask,
                      tgt_is_causal=bool(tgt_is_causal),
                      memory_is_causal=bool(memory_is_causal))
        if final_norm is not None:
            x, o = final_norm(params, o, x)
        return x, o

    return fn


def _transformer_encoder(mod):
    """nn.TransformerEncoder: a deep-copied layer stack + optional final
    norm; parameter order is layers.0..layers.N-1 then norm."""
    layer_fns = [_transformer_encoder_layer(l) for l in mod.layers]
    final_norm = _layernorm(mod.norm) if mod.norm is not None else None

    def fn(params, off, src, mask=None, src_key_padding_mask=None,
           is_causal=None):
        x = src
        o = off
        for lf in layer_fns:
            x, o = lf(params, o, x, src_mask=mask,
                      src_key_padding_mask=src_key_padding_mask,
                      is_causal=bool(is_causal))
        if final_norm is not None:
            x, o = final_norm(params, o, x)
        return x, o

    return fn


_LEAF_HANDLERS = {
    "Linear": _linear,
    "MultiheadAttention": _multihead_attention,
    "TransformerEncoderLayer": _transformer_encoder_layer,
    "TransformerEncoder": _transformer_encoder,
    "TransformerDecoderLayer": _transformer_decoder_layer,
    "TransformerDecoder": _transformer_decoder,
    "RNN": _rnn_family,
    "LSTM": _rnn_family,
    "GRU": _rnn_family,
    "Conv1d": _convnd(1),
    "Conv2d": _conv2d,
    "Conv3d": _convnd(3),
    "ConvTranspose2d": _conv_transpose2d,
    "BatchNorm1d": _batchnorm,
    "BatchNorm2d": _batchnorm,
    "BatchNorm3d": _batchnorm,
    "LayerNorm": _layernorm,
    "GroupNorm": _groupnorm,
    "InstanceNorm1d": _instancenorm,
    "InstanceNorm2d": _instancenorm,
    "InstanceNorm3d": _instancenorm,
    "Embedding": _embedding,
    "PReLU": _prelu,
    "ReLU": _elementwise(lambda m, x: jax.nn.relu(x)),
    "ReLU6": _elementwise(lambda m, x: jnp.clip(x, 0.0, 6.0)),
    "Tanh": _elementwise(lambda m, x: jnp.tanh(x)),
    "Sigmoid": _elementwise(lambda m, x: jax.nn.sigmoid(x)),
    "GELU": _elementwise(lambda m, x: jax.nn.gelu(
        x, approximate=getattr(m, "approximate", "none") != "none")),
    "ELU": _elementwise(lambda m, x: jax.nn.elu(x, alpha=m.alpha)),
    "SELU": _elementwise(lambda m, x: jax.nn.selu(x)),
    "CELU": _elementwise(lambda m, x: jax.nn.celu(x, alpha=m.alpha)),
    "SiLU": _elementwise(lambda m, x: jax.nn.silu(x)),
    "Mish": _elementwise(lambda m, x: x * jnp.tanh(jax.nn.softplus(x))),
    "LeakyReLU": _elementwise(lambda m, x: jax.nn.leaky_relu(x, negative_slope=m.negative_slope)),
    "Hardtanh": _elementwise(lambda m, x: jnp.clip(x, m.min_val, m.max_val)),
    "Hardswish": _elementwise(lambda m, x: _hardswish(x)),
    "Hardsigmoid": _elementwise(lambda m, x: _hardsigmoid(x)),
    "Softplus": _elementwise(lambda m, x: _softplus_beta(x, m.beta, m.threshold)),
    "Softsign": _elementwise(lambda m, x: x / (1.0 + jnp.abs(x))),
    "Softmax": _elementwise(lambda m, x: jax.nn.softmax(x, axis=m.dim if m.dim is not None else -1)),
    "LogSoftmax": _elementwise(lambda m, x: jax.nn.log_softmax(x, axis=m.dim if m.dim is not None else -1)),
    "Identity": _elementwise(lambda m, x: x),
    "Dropout": _elementwise(lambda m, x: x),  # inference semantics
    "Dropout1d": _elementwise(lambda m, x: x),
    "Dropout2d": _elementwise(lambda m, x: x),
    "Flatten": _elementwise(lambda m, x: _flatten_dims(x, m.start_dim, m.end_dim)),
    "Unflatten": _elementwise(lambda m, x: x.reshape(
        x.shape[: m.dim % x.ndim] + tuple(m.unflattened_size)
        + x.shape[m.dim % x.ndim + 1 :])),
    "MaxPool1d": lambda m: _pool(m, jax.lax.max, -jnp.inf, is_avg=False, n=1),
    "MaxPool2d": lambda m: _pool(m, jax.lax.max, -jnp.inf, is_avg=False),
    "MaxPool3d": lambda m: _pool(m, jax.lax.max, -jnp.inf, is_avg=False, n=3),
    "AvgPool1d": lambda m: _pool(m, jax.lax.add, 0.0, is_avg=True, n=1),
    "AvgPool2d": lambda m: _pool(m, jax.lax.add, 0.0, is_avg=True),
    "AvgPool3d": lambda m: _pool(m, jax.lax.add, 0.0, is_avg=True, n=3),
    "AdaptiveAvgPool1d": _adaptive_pool(1, is_avg=True),
    "AdaptiveAvgPool2d": _adaptive_pool(2, is_avg=True),
    "AdaptiveAvgPool3d": _adaptive_pool(3, is_avg=True),
    "AdaptiveMaxPool1d": _adaptive_pool(1, is_avg=False),
    "AdaptiveMaxPool2d": _adaptive_pool(2, is_avg=False),
    "AdaptiveMaxPool3d": _adaptive_pool(3, is_avg=False),
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
        F.softplus: lambda x, beta=1.0, threshold=20.0: _softplus_beta(x, beta, threshold),
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
        F.conv1d: lambda x, w, bias=None, stride=1, padding=0, dilation=1, groups=1: _f_convnd(
            1, x, w, bias, stride, padding, dilation, groups
        ),
        F.conv2d: lambda x, w, bias=None, stride=1, padding=0, dilation=1, groups=1: _f_conv2d(
            x, w, bias, stride, padding, dilation, groups
        ),
        F.conv3d: lambda x, w, bias=None, stride=1, padding=0, dilation=1, groups=1: _f_convnd(
            3, x, w, bias, stride, padding, dilation, groups
        ),
        F.group_norm: _f_group_norm,
        F.layer_norm: _f_layer_norm,
        F.batch_norm: _f_batch_norm,
        F.instance_norm: _f_instance_norm,
        F.adaptive_avg_pool1d: lambda x, output_size: _f_adaptive_pool(x, output_size, 1, True),
        F.adaptive_avg_pool2d: lambda x, output_size: _f_adaptive_pool(x, output_size, 2, True),
        F.adaptive_avg_pool3d: lambda x, output_size: _f_adaptive_pool(x, output_size, 3, True),
        F.adaptive_max_pool2d: lambda x, output_size, return_indices=False: _f_adaptive_max(
            x, output_size, 2, return_indices
        ),
        F.prelu: _f_prelu,
        F.hardtanh: lambda x, min_val=-1.0, max_val=1.0, inplace=False: jnp.clip(x, min_val, max_val),
        F.relu6: lambda x, inplace=False: jnp.clip(x, 0.0, 6.0),
        F.hardswish: lambda x, inplace=False: _hardswish(x),
        F.hardsigmoid: lambda x, inplace=False: _hardsigmoid(x),
        F.mish: lambda x, inplace=False: x * jnp.tanh(jax.nn.softplus(x)),
        F.selu: lambda x, inplace=False: jax.nn.selu(x),
        F.celu: lambda x, alpha=1.0, inplace=False: jax.nn.celu(x, alpha=alpha),
        F.softsign: lambda x: x / (1.0 + jnp.abs(x)),
        F.pad: _f_pad,
        torch.sin: jnp.sin,
        torch.cos: jnp.cos,
        F.normalize: lambda x, p=2.0, dim=1, eps=1e-12: x
        / jnp.maximum(jnp.linalg.norm(x, ord=p, axis=dim, keepdims=True), eps),
        F.scaled_dot_product_attention: _f_sdpa,
        operator.pow: operator.pow,
        operator.add: operator.add,
        operator.sub: operator.sub,
        operator.mul: operator.mul,
        operator.truediv: operator.truediv,
        operator.matmul: jnp.matmul,
        operator.neg: operator.neg,
        operator.getitem: lambda x, idx: x[idx],
        # `n, l, _ = x.shape` traces as builtin getattr; jnp arrays carry
        # the same attribute surface for the cases fx emits (shape, dtype,
        # ndim, T)
        getattr: getattr,
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


def _f_convnd(n, x, w, bias, stride, padding, dilation, groups):
    """torch.nn.functional.conv1d/2d/3d with live weight/bias tensors."""
    s = stride if isinstance(stride, (tuple, list)) else (stride,) * n
    d = dilation if isinstance(dilation, (tuple, list)) else (dilation,) * n
    if isinstance(padding, str):
        p = padding.upper()
    else:
        pp = padding if isinstance(padding, (tuple, list)) else (padding,) * n
        p = tuple((pi, pi) for pi in pp)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=tuple(s), padding=p, rhs_dilation=tuple(d),
        feature_group_count=groups,
        dimension_numbers=_conv_dn(n),
    )
    if bias is not None:
        y = y + bias.reshape((1, -1) + (1,) * n)
    return y


def _f_conv2d(x, w, bias, stride, padding, dilation, groups):
    return _f_convnd(2, x, w, bias, stride, padding, dilation, groups)


def _f_group_norm(x, num_groups, weight=None, bias=None, eps=1e-5):
    n, c = x.shape[0], x.shape[1]
    xg = x.reshape((n, num_groups, c // num_groups) + x.shape[2:])
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    shape = (1, c) + (1,) * (x.ndim - 2)
    if weight is not None:
        y = y * weight.reshape(shape)
    if bias is not None:
        y = y + bias.reshape(shape)
    return y


def _f_layer_norm(x, normalized_shape, weight=None, bias=None, eps=1e-5):
    ndims = len(normalized_shape)
    axes = tuple(range(x.ndim - ndims, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def _f_batch_norm(x, running_mean=None, running_var=None, weight=None,
                  bias=None, training=False, momentum=0.1, eps=1e-5):
    """Batch-statistics semantics regardless of running buffers, matching
    the reference's batch-norm patch (reference: hamiltorch/util.py:370-376)."""
    axes = (0,) + tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    if weight is not None:
        y = y * weight.reshape(shape)
    if bias is not None:
        y = y + bias.reshape(shape)
    return y


def _f_instance_norm(x, running_mean=None, running_var=None, weight=None,
                     bias=None, use_input_stats=True, momentum=0.1, eps=1e-5):
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    if weight is not None:
        y = y * weight.reshape(shape)
    if bias is not None:
        y = y + bias.reshape(shape)
    return y


def _f_adaptive_pool(x, output_size, n, is_avg):
    out = (
        tuple(output_size)
        if isinstance(output_size, (tuple, list))
        else (output_size,) * n
    )
    return _adaptive_reduce(x, out, jnp.mean if is_avg else jnp.max)


def _f_adaptive_max(x, output_size, n, return_indices):
    if return_indices:
        raise NotImplementedError(
            "adaptive max pooling with return_indices=True is not supported "
            "by the torch bridge"
        )
    return _f_adaptive_pool(x, output_size, n, is_avg=False)


def _f_prelu(x, weight):
    a = weight
    if a.ndim and a.shape[0] > 1 and x.ndim > 2:
        a = a.reshape((-1,) + (1,) * (x.ndim - 2))
    return jnp.where(x >= 0, x, a * x)


_F_PAD_MODES = {"constant": "constant", "circular": "wrap",
                "reflect": "reflect", "replicate": "edge"}


def _f_sdpa(query, key, value, attn_mask=None, dropout_p=0.0,
            is_causal=False, scale=None, enable_gqa=False):
    """F.scaled_dot_product_attention with torch semantics: (..., L, E)
    inputs, bool mask True = KEEP (opposite of MultiheadAttention's
    attn_mask!), float mask additive; inference dropout.  GQA is not
    supported (raise instead of mistranslating)."""
    if enable_gqa:
        raise TypeError("scaled_dot_product_attention enable_gqa is not supported")
    l, s = query.shape[-2], key.shape[-2]
    sc = (1.0 / jnp.sqrt(jnp.asarray(query.shape[-1], query.dtype))
          if scale is None else scale)
    logits = (query * sc) @ jnp.swapaxes(key, -1, -2)
    if is_causal:
        assert attn_mask is None, "is_causal with an explicit attn_mask"
        causal = jnp.tril(jnp.ones((l, s), bool))
        logits = jnp.where(causal, logits, -jnp.inf)
    if attn_mask is not None:
        am = jnp.asarray(attn_mask)
        if am.dtype == jnp.bool_:
            logits = jnp.where(am, logits, -jnp.inf)
        else:
            logits = logits + am
    return jax.nn.softmax(logits, axis=-1) @ value


def _f_pad(x, pad, mode="constant", value=None):
    """torch F.pad: ``pad`` lists (left, right) pairs from the LAST axis
    inward."""
    pairs = [(0, 0)] * x.ndim
    for i in range(len(pad) // 2):
        pairs[x.ndim - 1 - i] = (pad[2 * i], pad[2 * i + 1])
    if mode == "constant":
        return jnp.pad(x, pairs, constant_values=0.0 if value is None else value)
    return jnp.pad(x, pairs, mode=_F_PAD_MODES[mode])


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
    handlers, param_idx, call_surface = {}, {}, {}
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
                call_surface[node.target] = _MODULE_CALL_SURFACE.get(
                    type(sub).__name__, (1, frozenset())
                )
            max_args, allowed_kwargs = call_surface[node.target]
            if any(kw not in allowed_kwargs for kw in node.kwargs):
                raise TypeError(
                    f"submodule call {node.target!r} passes keyword arguments "
                    f"{sorted(node.kwargs)}; this module type accepts "
                    f"{sorted(allowed_kwargs) or 'none'}"
                )
            if len(node.args) > max_args:
                raise TypeError(
                    f"submodule call {node.target!r} passes {len(node.args)} "
                    f"positional arguments; this module type accepts at most "
                    f"{max_args} (extra inputs beyond RNN hidden state / "
                    "attention (query, key, value) / masks are unsupported)"
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
                y, _ = handlers[node.target](sub_params, 0, *args, **kwargs)
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


# ---------------------------------------------------------------------------
# concrete-trace fallback: torch.jit.trace + TorchScript-graph interpreter


def _aten_table():
    """aten op name -> jnp handler (positional args as the TS schema lists
    them).  Built lazily; unlisted ops raise at translation time."""

    def _nd_from_list(v):
        return tuple(v) if isinstance(v, (tuple, list)) else (v,)

    def _reduce_dims(x, dims, keepdim):
        axes = tuple(dims) if isinstance(dims, (tuple, list)) else dims
        return axes if axes is not None else None, keepdim

    def _mean(x, *rest):
        if not rest or rest[0] is None or not isinstance(rest[0], (list, tuple, int)):
            return jnp.mean(x)
        dims, keepdim = rest[0], (rest[1] if len(rest) > 1 else False)
        axes, keepdim = _reduce_dims(x, dims, keepdim)
        return jnp.mean(x, axis=axes, keepdims=keepdim)

    def _sum(x, *rest):
        if not rest or rest[0] is None or not isinstance(rest[0], (list, tuple, int)):
            return jnp.sum(x)
        dims, keepdim = rest[0], (rest[1] if len(rest) > 1 else False)
        axes, keepdim = _reduce_dims(x, dims, keepdim)
        return jnp.sum(x, axis=axes, keepdims=keepdim)

    def _max(x, *rest):
        if not rest:
            return jnp.max(x)
        if hasattr(rest[0], "ndim") or hasattr(rest[0], "shape"):
            return jnp.maximum(x, rest[0])  # aten::max.other
        dim, keepdim = rest[0], (rest[1] if len(rest) > 1 else False)
        return (jnp.max(x, axis=dim, keepdims=keepdim),
                jnp.argmax(x, axis=dim, keepdims=keepdim))

    def _min(x, *rest):
        if not rest:
            return jnp.min(x)
        if hasattr(rest[0], "ndim") or hasattr(rest[0], "shape"):
            return jnp.minimum(x, rest[0])
        dim, keepdim = rest[0], (rest[1] if len(rest) > 1 else False)
        return (jnp.min(x, axis=dim, keepdims=keepdim),
                jnp.argmin(x, axis=dim, keepdims=keepdim))

    def _slice(x, dim=0, start=None, end=None, step=1):
        size = x.shape[dim]
        start = 0 if start is None else start
        end = size if end is None or end > size else end
        idx = [slice(None)] * x.ndim
        idx[dim] = slice(start, end, step)
        return x[tuple(idx)]

    def _conv_transpose(n):
        def h(x, w, bias=None, stride=1, padding=0, output_padding=0,
              groups=1, dilation=1):
            if groups != 1:
                raise NotImplementedError(
                    "conv_transpose with groups != 1 is not supported"
                )
            s = _nd_from_list(stride) if isinstance(stride, (tuple, list)) else (stride,) * n
            p = _nd_from_list(padding) if isinstance(padding, (tuple, list)) else (padding,) * n
            op = _nd_from_list(output_padding) if isinstance(output_padding, (tuple, list)) else (output_padding,) * n
            d = _nd_from_list(dilation) if isinstance(dilation, (tuple, list)) else (dilation,) * n
            k = w.shape[2:]
            pads = tuple(
                (d[i] * (k[i] - 1) - p[i], d[i] * (k[i] - 1) - p[i] + op[i])
                for i in range(n)
            )
            y = jax.lax.conv_transpose(
                x, w, strides=s, padding=pads, rhs_dilation=d,
                dimension_numbers=_conv_dn(n), transpose_kernel=True,
            )
            if bias is not None:
                y = y + bias.reshape((1, -1) + (1,) * n)
            return y

        return h

    def _pool_core(n, is_avg):
        def h(x, kernel_size, stride=None, padding=0, *rest):
            # max_pool: rest = (dilation, ceil_mode); avg_pool: rest =
            # (ceil_mode, count_include_pad, divisor_override)
            if is_avg:
                ceil_mode = rest[0] if rest else False
                cip = rest[1] if len(rest) > 1 else True
                div = rest[2] if len(rest) > 2 else None
                _check_pool_semantics(ceil_mode=ceil_mode, count_include_pad=cip,
                                      divisor_override=div, n=n)
            else:
                dilation = rest[0] if rest else 1
                ceil_mode = rest[1] if len(rest) > 1 else False
                _check_pool_semantics(ceil_mode=ceil_mode, dilation=dilation, n=n)
            k = tuple(kernel_size) if isinstance(kernel_size, (tuple, list)) else (kernel_size,) * n
            s = stride if stride not in (None, []) else k
            s = tuple(s) if isinstance(s, (tuple, list)) else (s,) * n
            p = tuple(padding) if isinstance(padding, (tuple, list)) else (padding,) * n
            y = jax.lax.reduce_window(
                x, 0.0 if is_avg else -jnp.inf,
                jax.lax.add if is_avg else jax.lax.max,
                window_dimensions=(1, 1) + k, window_strides=(1, 1) + s,
                padding=((0, 0), (0, 0)) + tuple((pi, pi) for pi in p),
            )
            if is_avg:
                d = 1
                for ki in k:
                    d *= ki
                y = y / d
            return y

        return h

    table = {
        "aten::linear": lambda x, w, b=None: (x @ w.T) if b is None else (x @ w.T + b),
        "aten::addmm": lambda b, x, w, beta=1, alpha=1: beta * b + alpha * (x @ w),
        "aten::mm": jnp.matmul,
        "aten::bmm": jnp.matmul,
        "aten::matmul": jnp.matmul,
        "aten::t": lambda x: x.T,
        "aten::relu": jax.nn.relu,
        "aten::relu_": jax.nn.relu,
        "aten::relu6": lambda x: jnp.clip(x, 0.0, 6.0),
        "aten::tanh": jnp.tanh,
        "aten::sigmoid": jax.nn.sigmoid,
        "aten::gelu": lambda x, approximate="none": jax.nn.gelu(x, approximate=approximate != "none"),
        "aten::elu": lambda x, alpha=1.0, scale=1.0, input_scale=1.0: scale * jax.nn.elu(input_scale * x, alpha=alpha),
        "aten::leaky_relu": lambda x, slope=0.01: jax.nn.leaky_relu(x, negative_slope=slope),
        "aten::silu": jax.nn.silu,
        "aten::mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "aten::selu": jax.nn.selu,
        "aten::celu": lambda x, alpha=1.0: jax.nn.celu(x, alpha=alpha),
        "aten::prelu": _f_prelu,
        "aten::hardtanh": lambda x, mn=-1.0, mx=1.0: jnp.clip(x, mn, mx),
        "aten::hardtanh_": lambda x, mn=-1.0, mx=1.0: jnp.clip(x, mn, mx),
        "aten::hardswish": _hardswish,
        "aten::hardsigmoid": _hardsigmoid,
        "aten::softplus": lambda x, beta=1.0, threshold=20.0: _softplus_beta(x, beta, threshold),
        "aten::erf": jax.scipy.special.erf,
        "aten::softmax": lambda x, dim=-1, dtype=None: jax.nn.softmax(x, axis=dim),
        "aten::log_softmax": lambda x, dim=-1, dtype=None: jax.nn.log_softmax(x, axis=dim),
        "aten::dropout": lambda x, p=0.5, train=False: x,
        "aten::feature_dropout": lambda x, p=0.5, train=False: x,
        "aten::add": lambda x, y, alpha=1: x + (alpha * y if alpha != 1 else y),
        "aten::add_": lambda x, y, alpha=1: x + (alpha * y if alpha != 1 else y),
        "aten::sub": lambda x, y, alpha=1: x - (alpha * y if alpha != 1 else y),
        "aten::rsub": lambda x, y, alpha=1: y - (alpha * x if alpha != 1 else x),
        "aten::mul": lambda x, y: x * y,
        "aten::mul_": lambda x, y: x * y,
        "aten::div": lambda x, y, rounding_mode=None: (
            x / y if rounding_mode is None
            else (jnp.floor_divide(x, y) if rounding_mode == "floor" else jnp.trunc(x / y))
        ),
        "aten::neg": lambda x: -x,
        "aten::pow": jnp.power,
        "aten::exp": jnp.exp,
        "aten::log": jnp.log,
        "aten::log1p": jnp.log1p,
        "aten::sqrt": jnp.sqrt,
        "aten::rsqrt": jax.lax.rsqrt,
        "aten::abs": jnp.abs,
        "aten::sin": jnp.sin,
        "aten::cos": jnp.cos,
        "aten::clamp": lambda x, mn=None, mx=None: jnp.clip(x, mn, mx),
        "aten::clamp_min": lambda x, mn: jnp.maximum(x, mn),
        "aten::clamp_max": lambda x, mx: jnp.minimum(x, mx),
        "aten::mean": _mean,
        "aten::sum": _sum,
        "aten::max": _max,
        "aten::min": _min,
        "aten::maximum": jnp.maximum,
        "aten::minimum": jnp.minimum,
        "aten::amax": lambda x, dims, keepdim=False: jnp.max(x, axis=tuple(dims), keepdims=keepdim),
        "aten::amin": lambda x, dims, keepdim=False: jnp.min(x, axis=tuple(dims), keepdims=keepdim),
        "aten::argmax": lambda x, dim=None, keepdim=False: jnp.argmax(x, axis=dim, keepdims=keepdim),
        "aten::cat": lambda ts, dim=0: jnp.concatenate(ts, axis=dim),
        "aten::stack": lambda ts, dim=0: jnp.stack(ts, axis=dim),
        "aten::chunk": lambda x, chunks, dim=0: tuple(jnp.array_split(x, chunks, axis=dim)),
        "aten::split": lambda x, size, dim=0: _split(x, size, dim),
        "aten::view": lambda x, shape: x.reshape(tuple(shape)),
        "aten::reshape": lambda x, shape: x.reshape(tuple(shape)),
        "aten::flatten": lambda x, start=0, end=-1: _flatten_dims(x, start, end),
        "aten::permute": lambda x, dims: jnp.transpose(x, tuple(dims)),
        "aten::transpose": lambda x, a, b: jnp.swapaxes(x, a, b),
        "aten::squeeze": lambda x, dim=None: jnp.squeeze(x, axis=dim),
        "aten::unsqueeze": lambda x, dim: jnp.expand_dims(x, dim),
        "aten::contiguous": lambda x, memory_format=0: x,
        "aten::expand": lambda x, sizes, implicit=False: _expand(x, tuple(sizes)),
        "aten::repeat": lambda x, reps: jnp.tile(x, tuple(reps)),
        "aten::select": lambda x, dim, idx: jnp.take(x, idx, axis=dim),
        "aten::slice": _slice,
        "aten::size": lambda x, dim=None: x.shape if dim is None else x.shape[dim],
        "aten::conv1d": lambda x, w, b=None, stride=1, padding=0, dilation=1, groups=1: _f_convnd(1, x, w, b, stride, padding, dilation, groups),
        "aten::conv2d": lambda x, w, b=None, stride=1, padding=0, dilation=1, groups=1: _f_convnd(2, x, w, b, stride, padding, dilation, groups),
        "aten::conv3d": lambda x, w, b=None, stride=1, padding=0, dilation=1, groups=1: _f_convnd(3, x, w, b, stride, padding, dilation, groups),
        "aten::conv_transpose1d": _conv_transpose(1),
        "aten::conv_transpose2d": _conv_transpose(2),
        "aten::conv_transpose3d": _conv_transpose(3),
        "aten::max_pool1d": _pool_core(1, is_avg=False),
        "aten::max_pool2d": _pool_core(2, is_avg=False),
        "aten::max_pool3d": _pool_core(3, is_avg=False),
        "aten::avg_pool1d": _pool_core(1, is_avg=True),
        "aten::avg_pool2d": _pool_core(2, is_avg=True),
        "aten::avg_pool3d": _pool_core(3, is_avg=True),
        "aten::adaptive_avg_pool1d": lambda x, out: _f_adaptive_pool(x, tuple(out), 1, True),
        "aten::adaptive_avg_pool2d": lambda x, out: _f_adaptive_pool(x, tuple(out), 2, True),
        "aten::adaptive_avg_pool3d": lambda x, out: _f_adaptive_pool(x, tuple(out), 3, True),
        "aten::adaptive_max_pool2d": lambda x, out: (
            _f_adaptive_pool(x, tuple(out), 2, False),
            jnp.zeros((), jnp.int32),  # indices output: never consumed when return_indices=False
        ),
        "aten::batch_norm": lambda x, w=None, b=None, rm=None, rv=None, training=False, momentum=0.1, eps=1e-5, cudnn=False: _f_batch_norm(x, rm, rv, w, b, training, momentum, eps),
        "aten::group_norm": lambda x, g, w=None, b=None, eps=1e-5, cudnn=False: _f_group_norm(x, g, w, b, eps),
        "aten::layer_norm": lambda x, shape, w=None, b=None, eps=1e-5, cudnn=False: _f_layer_norm(x, tuple(shape), w, b, eps),
        "aten::instance_norm": lambda x, w=None, b=None, rm=None, rv=None, use_input_stats=True, momentum=0.1, eps=1e-5, cudnn=False: _f_instance_norm(x, rm, rv, w, b, use_input_stats, momentum, eps),
        "aten::embedding": lambda w, idx, pad=-1, scale=False, sparse=False: jnp.take(w, idx.astype(jnp.int32), axis=0),
        "aten::masked_fill": lambda x, mask, value: jnp.where(mask, value, x),
        "aten::where": jnp.where,
        "aten::detach": lambda x: x,
        "aten::clone": lambda x, memory_format=0: x,
        "aten::alias": lambda x: x,
        "aten::type_as": lambda x, y: x.astype(y.dtype),
        "aten::constant_pad_nd": lambda x, pad, value=0.0: _f_pad(x, list(pad), "constant", value),
        "aten::reflection_pad1d": lambda x, pad: _f_pad(x, list(pad), "reflect"),
        "aten::reflection_pad2d": lambda x, pad: _f_pad(x, list(pad), "reflect"),
        "aten::replication_pad1d": lambda x, pad: _f_pad(x, list(pad), "replicate"),
        "aten::replication_pad2d": lambda x, pad: _f_pad(x, list(pad), "replicate"),
        "aten::Int": int,
        "aten::ScalarImplicit": lambda x: x,
        "aten::gt": lambda x, y: x > y,
        "aten::lt": lambda x, y: x < y,
        "aten::ge": lambda x, y: x >= y,
        "aten::le": lambda x, y: x <= y,
        "aten::eq": lambda x, y: x == y,
        "aten::ne": lambda x, y: x != y,
    }
    return table


def _from_torch_traced(module, example_input) -> Callable:
    """Concrete-trace fallback for forwards torch.fx cannot symbolically
    trace (data-dependent Python control flow): run ``torch.jit.trace`` on
    ``example_input`` — which EXECUTES the forward eagerly, as the
    reference's Scope rewriting does every call (reference:
    hamiltorch/util.py:318-346) — and interpret the resulting inlined
    TorchScript graph with jnp ops.

    The crucial caveat (the reason this is opt-in via ``example_input=``):
    tracing freezes every data-dependent branch to the path taken on the
    example input.  The translated forward is that ONE path; the reference
    re-evaluates branches per call.  Parameters stay live (resolved through
    the live params list, never baked in).
    """
    import warnings

    import torch

    flat_ids = {id(p): i for i, p in enumerate(module.parameters())}
    if not isinstance(example_input, torch.Tensor):
        import numpy as _np

        # np.array (copy): jax arrays expose a read-only buffer and torch
        # warns on wrapping non-writable memory
        example_input = torch.as_tensor(_np.array(example_input))
    with warnings.catch_warnings():
        # the tracer warns precisely about branch freezing; we document it
        warnings.simplefilter("ignore")
        traced = torch.jit.trace(module, example_input, check_trace=False)
    graph = traced.inlined_graph
    aten = _aten_table()

    graph_inputs = list(graph.inputs())
    if len(graph_inputs) != 2:
        raise TypeError(
            f"traced forward takes {len(graph_inputs) - 1} tensor inputs; "
            "the bridge translates single-input forwards only"
        )

    # pre-resolve every node: constants and attribute reads happen once at
    # translation time; unknown ops fail HERE, not mid-sampling
    steps = []  # (kind, out_uniques, handler_or_none, input_uniques, payload)
    consts = {}  # unique -> python/jnp constant
    attr_objs = {graph_inputs[0].unique(): module}  # module hierarchy walk
    x_unique = graph_inputs[1].unique()

    for node in graph.nodes():
        kind = node.kind()
        ins = [v.unique() for v in node.inputs()]
        outs = [v.unique() for v in node.outputs()]
        if kind == "prim::Constant":
            iv = node.output().toIValue()
            if hasattr(iv, "detach"):
                iv = jnp.asarray(iv.detach().cpu().numpy())
            consts[outs[0]] = iv
        elif kind == "prim::GetAttr":
            obj = getattr(attr_objs[ins[0]], node.s("name"))
            if id(obj) in flat_ids:  # live parameter
                consts[outs[0]] = ("__param__", flat_ids[id(obj)])
            elif isinstance(obj, torch.Tensor):  # buffer / constant tensor
                consts[outs[0]] = jnp.asarray(obj.detach().cpu().numpy())
            else:
                attr_objs[outs[0]] = obj
        elif kind in ("prim::ListConstruct", "prim::TupleConstruct"):
            steps.append(("pack", outs, None, ins, None))
        elif kind in ("prim::ListUnpack", "prim::TupleUnpack"):
            steps.append(("unpack", outs, None, ins, None))
        elif kind == "prim::NumToTensor":
            steps.append(("call", outs, jnp.asarray, ins, "prim::NumToTensor"))
        elif kind in aten:
            steps.append(("call", outs, aten[kind], ins, kind))
        else:
            raise TypeError(
                f"traced graph contains unsupported op {kind!r} (supported "
                f"aten ops: {sorted(aten)}); from_torch_module(..., "
                "method='callback') executes the torch forward eagerly on "
                "host instead (exact but slow; CPU backend)"
            )
    out_uniques = [v.unique() for v in graph.return_node().inputs()]

    def fn(params, off, x):
        env = dict(consts)
        env[x_unique] = x
        for u, v in consts.items():
            if isinstance(v, tuple) and len(v) == 2 and v[0] == "__param__":
                env[u] = params[off + v[1]]
        for kind, outs, handler, ins, name in steps:
            args = [env[u] for u in ins]
            if kind == "pack":
                env[outs[0]] = tuple(args)
            elif kind == "unpack":
                for u, v in zip(outs, args[0]):
                    env[u] = v
            else:
                y = handler(*args)
                if len(outs) == 1:
                    env[outs[0]] = y
                else:
                    for u, v in zip(outs, y):
                        env[u] = v
        out = env[out_uniques[0]]
        if len(out_uniques) > 1:
            out = tuple(env[u] for u in out_uniques)
        return out, off + len(flat_ids)

    return fn


# ---------------------------------------------------------------------------
# eager-callback fallback: run the REAL torch forward on host per evaluation


def _from_torch_callback(module):
    """Universal bridge path: the torch forward executes EAGERLY on the host
    inside ``jax.pure_callback``, with gradients from ``torch.autograd``
    inside a ``custom_vjp``.  This is how the reference achieves
    universality — it executes the user's forward rather than translating
    it (reference: hamiltorch/util.py:318-346) — so nothing is translated
    and ANY ``nn.Module`` is sampleable.

    Costs relative to the translated paths (documented, not hidden):

    * one host round-trip per potential evaluation (no XLA fusion);
    * first-order gradients only — torch.autograd runs opaquely on host,
      so jit cannot differentiate through it twice (RMHMC metrics raise);
    * vmapped chains evaluate sequentially (``vmap_method="sequential"``);
    * backends that reject host callbacks at execution time (the axon TPU
      plugin, see utils/progress.py) cannot run it — use the CPU backend.

    The output shape/dtype is probed once per (shapes, dtypes) trace by
    running the torch forward on zeros; forwards whose OUTPUT SHAPE depends
    on input values cannot run under jit at all.
    """
    import numpy as np
    import torch
    from torch.func import functional_call

    names = [n for n, _ in module.named_parameters()]
    n_params = len(names)
    module.eval()

    def _tensor(a):
        # jax arrays expose read-only buffers; torch warns on wrapping them
        a = np.ascontiguousarray(a)
        return torch.from_numpy(a if a.flags.writeable else a.copy())

    def _tensors(params_np):
        return {n: _tensor(p) for n, p in zip(names, params_np)}

    def _host_forward(x_np, *params_np):
        with torch.no_grad():
            y = functional_call(module, _tensors(params_np), (_tensor(x_np),))
        return np.asarray(y.detach().cpu().numpy())

    def _host_vjp(x_np, g_np, *params_np):
        """Returns (grad_x_or_None, *grad_params) as one flat tuple; a zero
        placeholder stands in for grad_x when x is non-floating."""
        tp = {n: t.requires_grad_(True) for n, t in _tensors(params_np).items()}
        x_t = _tensor(x_np)
        x_diff = x_t.is_floating_point()
        if x_diff:
            x_t.requires_grad_(True)
        y = functional_call(module, tp, (x_t,))
        inputs = list(tp.values()) + ([x_t] if x_diff else [])
        grads = torch.autograd.grad(
            y, inputs, grad_outputs=_tensor(g_np),
            allow_unused=True,  # a param the taken branch never touched
        )
        out = [
            np.zeros(t.shape, dtype=p.dtype) if g is None
            else np.asarray(g.detach().cpu().numpy())
            for t, g, p in zip(inputs[:n_params], grads[:n_params], params_np)
        ]
        gx = (
            np.asarray(grads[-1].detach().cpu().numpy())
            if x_diff and grads[-1] is not None
            else np.zeros(x_np.shape, dtype=x_np.dtype if x_diff else np.float32)
        )
        return (gx, *out)

    @jax.custom_vjp
    def _apply(x, params_tuple):
        zx = np.zeros(x.shape, dtype=np.dtype(x.dtype))
        zp = [np.zeros(p.shape, dtype=np.dtype(p.dtype)) for p in params_tuple]
        y0 = _host_forward(zx, *zp)
        aval = jax.ShapeDtypeStruct(y0.shape, y0.dtype)
        return jax.pure_callback(
            _host_forward, aval, x, *params_tuple, vmap_method="sequential"
        )

    def _fwd(x, params_tuple):
        return _apply(x, params_tuple), (x, params_tuple)

    def _bwd(res, g):
        x, params_tuple = res
        x_float = jnp.issubdtype(x.dtype, jnp.floating)
        gx_aval = jax.ShapeDtypeStruct(
            x.shape, x.dtype if x_float else jnp.float32
        )
        avals = (gx_aval,) + tuple(
            jax.ShapeDtypeStruct(p.shape, p.dtype) for p in params_tuple
        )
        gx, *gps = jax.pure_callback(
            _host_vjp, avals, x, g, *params_tuple, vmap_method="sequential"
        )
        if not x_float:  # integer/bool inputs take a float0 cotangent
            gx = np.zeros(x.shape, dtype=jax.dtypes.float0)
        return gx, tuple(gps)

    _apply.defvjp(_fwd, _bwd)

    def fn(params, off, x):
        sub = tuple(params[off + i] for i in range(n_params))
        return _apply(x, sub), off + n_params

    return fn


def from_torch_module(
    module, example_input=None, method="auto"
) -> Tuple[Callable, List[jnp.ndarray]]:
    """Translate a supported torch module into (apply_fn, params_template).

    ``params_template`` is a list of arrays in ``module.parameters()``
    order, so ``ravel_pytree`` of it reproduces the reference's flat-vector
    layout (cat of per-parameter flattens — reference: hamiltorch/util.py:121-122).

    Sequential/ModuleList compositions translate structurally; custom
    ``forward`` methods go through the torch.fx fallback (see module
    docstring).  Forwards torch.fx cannot trace (data-dependent Python
    control flow) fall back to a CONCRETE trace when ``example_input`` is
    given: ``torch.jit.trace`` executes the forward eagerly on the example
    and the taken branch is translated — see ``_from_torch_traced`` for the
    branch-freezing caveat.

    ``method="callback"`` skips translation entirely and executes the REAL
    torch forward on the host per evaluation (``_from_torch_callback``) —
    exact semantics for ANY module, at host-eager speed, CPU backend only,
    first-order gradients only.  ``method="auto"`` (default) runs the
    translated cascade.
    """
    if method not in ("auto", "callback"):
        raise ValueError(f"method must be 'auto' or 'callback', got {method!r}")
    if method == "callback":
        fn = _from_torch_callback(module)
    else:
        try:
            fn = _convert(module)
        except TypeError:
            try:
                fn = _from_torch_fx(module)
            except TypeError as fx_err:
                if example_input is None:
                    raise TypeError(
                        f"{fx_err} For forwards with data-dependent control "
                        "flow, pass example_input= to freeze the traced "
                        "branch (concrete torch.jit.trace fallback), or "
                        "method='callback' to execute the torch forward "
                        "eagerly on host (exact but slow; CPU backend)."
                    ) from fx_err
                fn = _from_torch_traced(module, example_input)
    template = [
        jnp.asarray(p.detach().cpu().numpy()) for p in module.parameters()
    ]

    def apply_fn(params_list, x):
        out, _ = fn(params_list, 0, x)
        return out

    return apply_fn, template
