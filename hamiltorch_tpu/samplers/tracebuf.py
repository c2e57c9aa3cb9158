"""Memory-safe trace accumulation for sampler scans.

Two HBM hazards hide in the obvious ``lax.scan`` + ``swapaxes`` rendering of
an ensemble sampler:

1. **The post-scan relayout.**  ``lax.scan`` stacks ys on the leading (time)
   axis, so a (C, D) chain block scanned for N draws yields a time-major
   (N, C, D) trace; transposing it to the chain-major (C, N, D) result
   layout materialises the trace TWICE in one program (measured at the
   flagship bench shape: 7.73 GB temp + 7.71 GB output — the round-3 bench
   ``RESOURCE_EXHAUSTED``).
2. **The thinning window.**  Implementing ``thin`` as a nested scan whose
   inner ys stack the whole window just to keep row ``[-1]`` materialises a
   (thin, C, D) block per window — 15 GB at the bench warmup shape
   (thin=600) for data that is thrown away.

:func:`scan_trace` removes both: the kept trace is written draw-by-draw
into a pre-allocated chain-major buffer carried through the scan
(``buf.at[:, k].set(state)`` — XLA aliases while-loop carries, so the
dynamic-update-slice is in place and peak HBM is ~1x the trace), and the
within-window state travels through the inner scan's CARRY, never its ys.
Verified by ``tests/test_memory.py`` via ``compiled.memory_analysis()``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_tmap = jax.tree_util.tree_map


def _zeros_like_struct(struct):
    return _tmap(lambda s: jnp.zeros(s.shape, s.dtype), struct)


def scan_trace(step, carry0, xs, *, thin: int = 1, chain_major: bool = False,
               aux_reduce=None, state_like=None, trace_dtype=None):
    """``lax.scan`` over draws with a memory-safe kept-state trace.

    ``step(carry, x) -> (carry, (state, aux))`` where ``state`` is the
    per-draw chain state — (C, ...)-leaf pytree for ensembles, (...)-leaf
    for a single chain — and ``aux`` a small per-draw diagnostics pytree.

    Returns ``(final_carry, trace, aux_stacked)``:

    * ``chain_major=False``: ``trace`` leaves are (N_kept, ...) — the plain
      time-major scan stacking (a single materialisation; callers must NOT
      transpose it on device afterwards);
    * ``chain_major=True``: ``trace`` leaves are (C, N_kept, ...), written
      in place into a carried buffer (see module docstring) — the layout
      ensemble results promise, with no relayout copy.

    ``thin > 1`` keeps every ``thin``-th draw (the window's last state);
    ``aux_reduce(aux_window)`` collapses each (thin, ...) window of aux rows
    to one kept row (default: the last row).  ``aux_stacked`` rows are
    always time-major (N_kept leading), matching the stats conventions.

    ``state_like``: a pytree matching the (shape, dtype) of the state
    ``step`` emits (usually the carry's theta block), needed whenever a
    buffer or a window placeholder is pre-allocated (every path except
    unthinned time-major).

    ``trace_dtype``: store the kept trace in this dtype (e.g.
    ``jnp.bfloat16``) while the chain itself keeps computing in its own
    precision — the trace is the dominant HBM/host-IO allocation of a long
    ensemble run, and storage precision is a policy choice independent of
    sampling precision.  ``None`` keeps the state dtype.
    """
    thin = max(int(thin), 1)
    n_total = jax.tree_util.tree_leaves(xs)[0].shape[0]
    if n_total % thin:
        raise ValueError(f"scan length {n_total} must be divisible by thin={thin}")
    kept = n_total // thin

    def _store(s):
        return s if trace_dtype is None else s.astype(trace_dtype)

    if thin == 1 and not chain_major:
        if trace_dtype is None:
            carry_f, (trace, aux) = jax.lax.scan(step, carry0, xs)
            return carry_f, trace, aux

        def step_cast(carry, x):
            carry, (state, aux) = step(carry, x)
            return carry, (_tmap(_store, state), aux)

        carry_f, (trace, aux) = jax.lax.scan(step_cast, carry0, xs)
        return carry_f, trace, aux
    if state_like is None:
        raise ValueError(
            "scan_trace needs state_like for chain-major or thinned traces"
        )
    state_s = state_like

    if chain_major:
        bufs0 = _tmap(
            lambda s: jnp.zeros(
                (s.shape[0], kept) + s.shape[1:],
                s.dtype if trace_dtype is None else trace_dtype,
            ),
            state_s,
        )

    if thin == 1:
        # unthinned chain-major: write each draw's state at buffer row [:, k]
        def body(cb, xk):
            carry, bufs = cb
            k, x = xk
            carry, (state, aux) = step(carry, x)
            bufs = _tmap(lambda b, s: b.at[:, k].set(_store(s)), bufs, state)
            return (carry, bufs), aux

        (carry_f, trace), aux = jax.lax.scan(
            body, (carry0, bufs0), (jnp.arange(kept), xs)
        )
        return carry_f, trace, aux

    xs_w = _tmap(lambda a: a.reshape((kept, thin) + a.shape[1:]), xs)

    def inner(c, x):
        # the window's running state rides the CARRY; ys carry only aux
        carry, _ = c
        carry, (state, aux) = step(carry, x)
        return (carry, state), aux

    def _aux_kept(aux_w):
        if aux_reduce is not None:
            return aux_reduce(aux_w)
        return _tmap(lambda a: a[-1], aux_w)

    if chain_major:
        state0 = _zeros_like_struct(state_s)

        def outer(cb, xk):
            carry, bufs = cb
            k, x_w = xk
            (carry, state_k), aux_w = jax.lax.scan(inner, (carry, state0), x_w)
            bufs = _tmap(lambda b, s: b.at[:, k].set(_store(s)), bufs, state_k)
            return (carry, bufs), _aux_kept(aux_w)

        (carry_f, trace), aux = jax.lax.scan(
            outer, (carry0, bufs0), (jnp.arange(kept), xs_w)
        )
        return carry_f, trace, aux

    state0 = _zeros_like_struct(state_s)

    def outer_t(carry, x_w):
        (carry, state_k), aux_w = jax.lax.scan(inner, (carry, state0), x_w)
        return carry, (_tmap(_store, state_k), _aux_kept(aux_w))

    carry_f, (trace, aux) = jax.lax.scan(outer_t, carry0, xs_w)
    return carry_f, trace, aux
