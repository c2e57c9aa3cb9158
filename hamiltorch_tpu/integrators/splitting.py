"""Symmetric-split (minibatch Hamiltonian splitting) integrators.

Behavioural spec: the splitting branches of the reference's leapfrog
dispatcher (reference: hamiltorch/samplers.py:465-603; Cobb & Jalaian 2021):

* SPLITTING       — symmetric sweep m=0..M-1 then reversed, drift eps/(2(M-1))
                    between kicks (samplers.py:494-547);
* SPLITTING_RAND  — one random permutation per trajectory, per-term
                    kick/drift(eps/M)/kick (samplers.py:548-571);
* SPLITTING_KMID  — all half-kicks, one full drift, all half-kicks reversed
                    (samplers.py:575-601).

TPU-first: the per-term Python loops become ``lax.scan`` over a *term index*
into stacked (M, B, ...) minibatch arrays — one traced gradient body reused
for every term, instead of M separately-traced closures.  The reference's
``store_on_GPU`` offload and ``empty_cache`` hygiene (samplers.py:486-488,
542-547) have no analogue: XLA owns memory and only endpoints are kept.

Note: the reference silently *skips the drift* when inv_mass is a block
list inside splitting branches (samplers.py:514-515) — a latent bug this
implementation does not reproduce; all mass operators drift uniformly.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..enums import Integrator

# theta/p may be flat (D,) vectors or parameter PYTREES (the no-slicing-tax
# chain state); a bare array is a one-leaf pytree, so one tree_map code path
# serves both — identical XLA on the flat layout
_tmap = jax.tree_util.tree_map


def _kick(mom, g, scale):
    return _tmap(lambda ml, gl: ml + scale * gl, mom, g)


def _drift(th, v, scale):
    return _tmap(lambda tl, vl: tl + scale * vl, th, v)


def splitting_leapfrog(
    grad_term: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    num_terms: int,
    mass,
    theta: jnp.ndarray,
    p: jnp.ndarray,
    step_size,
    num_steps: int,
    integrator: Integrator,
    perm: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate with per-term gradients ``grad_term(theta, m)``.

    ``theta``/``p`` may be flat vectors or parameter pytrees; ``mass`` must
    match the layout (a ``TreeMass`` for pytree state).
    """
    eps = step_size
    m_f = jnp.arange(num_terms)
    m_r = m_f[::-1]

    if integrator == Integrator.SPLITTING:
        if num_terms == 1:
            raise RuntimeError(
                "For symmetric splitting log_prob_func must be list of functions greater than length 1"
            )
        k_div = 2 * (num_terms - 1)

        def fwd(carry, m):
            th, mom = carry
            mom = _kick(mom, grad_term(th, m), 0.5 * eps)
            drift = jnp.where(m < num_terms - 1, eps / k_div, 0.0)
            th = _drift(th, mass.velocity(mom), drift)
            return (th, mom), None

        def rev(carry, m):
            th, mom = carry
            mom = _kick(mom, grad_term(th, m), 0.5 * eps)
            drift = jnp.where(m > 0, eps / k_div, 0.0)
            th = _drift(th, mass.velocity(mom), drift)
            return (th, mom), None

        def step(carry, _):
            carry, _ = jax.lax.scan(fwd, carry, m_f)
            carry, _ = jax.lax.scan(rev, carry, m_r)
            return carry, None

    elif integrator == Integrator.SPLITTING_RAND:
        order = perm if perm is not None else m_f

        def term_step(carry, m):
            th, mom = carry
            mom = _kick(mom, grad_term(th, m), 0.5 * eps)
            th = _drift(th, mass.velocity(mom), eps / num_terms)
            mom = _kick(mom, grad_term(th, m), 0.5 * eps)
            return (th, mom), None

        def step(carry, _):
            carry, _ = jax.lax.scan(term_step, carry, order)
            return carry, None

    elif integrator == Integrator.SPLITTING_KMID:
        if num_terms == 1:
            raise RuntimeError(
                "For symmetric splitting log_prob_func must be list of functions greater than length 1"
            )

        def kick_sweep(th, mom, order):
            def kick(carry, m):
                return _kick(carry, grad_term(th, m), 0.5 * eps), None

            mom, _ = jax.lax.scan(kick, mom, order)
            return mom

        def step(carry, _):
            th, mom = carry
            mom = kick_sweep(th, mom, m_f)
            th = _drift(th, mass.velocity(mom), eps)
            mom = kick_sweep(th, mom, m_r)
            return (th, mom), None

    else:
        raise NotImplementedError(f"Not a splitting integrator: {integrator}")

    (theta, p), _ = jax.lax.scan(step, (theta, p), None, length=num_steps)
    return theta, p
