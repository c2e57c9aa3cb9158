"""User-supplied gradients (pass_grad).

Port of notebooks/hamiltorch_pass_gradients_example.ipynb: sampling with an
analytic gradient instead of autodiff — useful when the gradient has a
cheaper closed form, or comes from an external system.
"""

import time

import jax
import jax.numpy as jnp

import hamiltorch_tpu as hamiltorch

hamiltorch.set_random_seed(123)

stddev = jnp.array([0.5, 1.0, 2.0])


def log_prob(omega):
    return jnp.sum(-0.5 * (omega / stddev) ** 2)


def analytic_grad(omega):
    return -omega / stddev**2


common = dict(
    params_init=jnp.zeros(3), num_samples=400, step_size=0.1,
    num_steps_per_sample=20, verbose=False, key=jax.random.key(0),
)

t0 = time.time()
s_auto = hamiltorch.sample(log_prob_func=log_prob, **common)
jax.block_until_ready(s_auto)
t_auto = time.time() - t0

t0 = time.time()
s_pass = hamiltorch.sample(log_prob_func=log_prob, pass_grad=analytic_grad, **common)
jax.block_until_ready(s_pass)
t_pass = time.time() - t0

print(f"autograd : {t_auto:.2f}s  emp std {jnp.std(s_auto[50:], axis=0)}")
print(f"pass_grad: {t_pass:.2f}s  emp std {jnp.std(s_pass[50:], axis=0)}")
print("identical keys -> identical chains:",
      bool(jnp.allclose(s_auto, s_pass, atol=1e-5)))
