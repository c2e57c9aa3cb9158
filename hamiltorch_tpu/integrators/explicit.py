"""Explicit RMHMC on the doubled phase space (Cobb et al. 2019).

Behavioural spec: the explicit-RMHMC branch of the reference's leapfrog
(reference: hamiltorch/samplers.py:389-462).  State is (theta, theta~, p,
p~); each step applies phi_HA, phi_HB half-maps, the phi_HC binding
rotation with c = cos(2*omega*eps), s = sin(2*omega*eps), then phi_HB,
phi_HA again.  Gradient maps: dH/dtheta via autodiff of the Riemannian
Hamiltonian, dH/dp analytically as G^{-1} p (reference: samplers.py:395-422).

Deviation (documented): the rotation is applied *simultaneously* — the
mathematically correct map the reference's author wrote out in comments but
left disabled; the shipped code rotates sequentially, reusing
already-updated values on the right-hand side (samplers.py:441-450).  The
Metropolis correction makes both valid samplers; the simultaneous form is
an exact rotation (volume-preserving, reversible).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.metrics import RMHamiltonian, RMOptions


class DoubledState(NamedTuple):
    theta: jnp.ndarray
    theta_copy: jnp.ndarray
    p: jnp.ndarray
    p_copy: jnp.ndarray


def explicit_leapfrog(
    rm: RMHamiltonian,
    opts: RMOptions,
    theta: jnp.ndarray,
    p: jnp.ndarray,
    step_size,
    num_steps: int,
    jitter_u,
) -> DoubledState:
    """Integrate the binding-term Hamiltonian; both copies start equal."""
    eps = step_size
    omega = opts.explicit_binding_const
    angle = 2.0 * omega * eps
    c, s = jnp.cos(angle), jnp.sin(angle)

    def step(state: DoubledState, _):
        th, thc, mom, momc = state
        # phi_HA: H(theta, p~) moves (p, theta~)
        mom = mom - 0.5 * eps * rm.grad_theta(th, momc, jitter_u)
        thc = thc + 0.5 * eps * rm.grad_p(th, momc, jitter_u)
        # phi_HB: H(theta~, p) moves (theta, p~)
        th = th + 0.5 * eps * rm.grad_p(thc, mom, jitter_u)
        momc = momc - 0.5 * eps * rm.grad_theta(thc, mom, jitter_u)
        # phi_HC: simultaneous rotation mixing the two copies
        th_add, th_sub = th + thc, th - thc
        mom_add, mom_sub = mom + momc, mom - momc
        th_n = 0.5 * (th_add + c * th_sub + s * mom_sub)
        mom_n = 0.5 * (mom_add - s * th_sub + c * mom_sub)
        thc_n = 0.5 * (th_add - c * th_sub - s * mom_sub)
        momc_n = 0.5 * (mom_add + s * th_sub - c * mom_sub)
        th, thc, mom, momc = th_n, thc_n, mom_n, momc_n
        # phi_HB again
        th = th + 0.5 * eps * rm.grad_p(thc, mom, jitter_u)
        momc = momc - 0.5 * eps * rm.grad_theta(thc, mom, jitter_u)
        # phi_HA again
        mom = mom - 0.5 * eps * rm.grad_theta(th, momc, jitter_u)
        thc = thc + 0.5 * eps * rm.grad_p(th, momc, jitter_u)
        return DoubledState(th, thc, mom, momc), None

    init = DoubledState(theta, theta, p, p)
    final, _ = jax.lax.scan(step, init, None, length=num_steps)
    return final
