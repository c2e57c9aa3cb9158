"""User-supplied gradients (pass_grad).

Port of notebooks/hamiltorch_pass_gradients_example.ipynb: sampling with an
analytic gradient instead of autodiff — useful when the gradient has a
cheaper closed form, or comes from an external system.
"""

import time

import jax
import jax.numpy as jnp

from _smoke_budget import budget

import hamiltorch_tpu as hamiltorch

hamiltorch.set_random_seed(123)

stddev = jnp.array([0.5, 1.0, 2.0])


def log_prob(omega):
    return jnp.sum(-0.5 * (omega / stddev) ** 2)


def analytic_grad(omega):
    return -omega / stddev**2


common = dict(
    params_init=jnp.zeros(3), num_samples=budget(400, 60), step_size=0.1,
    num_steps_per_sample=budget(20, 5), verbose=False, key=jax.random.key(0),
)


def timed_warm(fn):
    """Compile on the first call, time the second (remote-compile latency
    is erratic — seconds to minutes — and would swamp the comparison)."""
    jax.block_until_ready(fn())
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    return time.time() - t0, out


t_auto, s_auto = timed_warm(
    lambda: hamiltorch.sample(log_prob_func=log_prob, **common)
)
t_pass, s_pass = timed_warm(
    lambda: hamiltorch.sample(log_prob_func=log_prob,
                              pass_grad=analytic_grad, **common)
)

tail = budget(50, 10)
print(f"autograd : {t_auto:.3f}s  emp std {jnp.std(s_auto[tail:], axis=0)}")
print(f"pass_grad: {t_pass:.3f}s  emp std {jnp.std(s_pass[tail:], axis=0)}")
print("identical keys -> identical chains:",
      bool(jnp.allclose(s_auto, s_pass, atol=1e-5)))
