"""GP hyperparameter posterior / objective builders.

Bridges the exact-GP core (models/gp.py) to the inference layer: the
reference exposes ``log_lh``/``dloglh_dtheta`` for external optimizers and
samplers (SURVEY.md §4.4); here the same quantity becomes a pure
``log_prob_fn`` over *unconstrained* parameters, ready for
``jax.value_and_grad``, NUTS (inference/nuts.py) and type-II MLE
(inference/mle.py).

Parameterization: u = log(theta) with theta = (kernel params..., noise s).
Sampling/optimizing in log space keeps positivity without constraints and
conditions the posterior better; the prior is independent Normal on u
(i.e. log-normal on theta), weakly informative by default.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gaussian_processes_tpu.models.base import Kernel
from gaussian_processes_tpu.models.gp import log_marginal_likelihood


def n_hypers(kernel: Kernel) -> int:
    """Dimension of u = (log kernel params..., log noise)."""
    return kernel.n_params + 1


def unpack(kernel_template: Kernel, u: jax.Array):
    """u (P+1,) in log space -> (kernel, noise) in natural space."""
    theta = jnp.exp(u)
    P = kernel_template.n_params
    return kernel_template.with_params(theta[:P]), theta[P]


def pack(kernel: Kernel, noise) -> jax.Array:
    """(kernel, noise) -> u in log space."""
    return jnp.log(jnp.concatenate([kernel.params, jnp.asarray(noise)[None]]))


def make_log_likelihood(
    kernel_template: Kernel, x, y, jitter: float = 0.0
) -> Callable:
    """log p(y | x, exp(u)) as a function of unconstrained u."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)

    def log_lik(u):
        kernel, noise = unpack(kernel_template, u)
        return log_marginal_likelihood(kernel, x, y, noise, jitter)

    return log_lik


def make_log_posterior(
    kernel_template: Kernel,
    x,
    y,
    *,
    prior_mean=0.0,
    prior_std=2.0,
    jitter: float = 0.0,
) -> Callable:
    """Unnormalized log posterior over u = log(theta) for NUTS.

    log p(u | x, y) = log p(y | x, exp(u)) + sum_i log N(u_i; mu_i, sd_i)

    ``prior_mean``/``prior_std`` broadcast against u (scalar or (P+1,)).
    """
    log_lik = make_log_likelihood(kernel_template, x, y, jitter)
    mu = jnp.asarray(prior_mean)
    sd = jnp.asarray(prior_std)

    def log_post(u):
        lp = -0.5 * jnp.sum(jnp.square((u - mu) / sd))
        return log_lik(u) + lp

    return log_post


def init_positions(
    kernel_template: Kernel,
    noise,
    key: jax.Array,
    n_chains: int,
    spread: float = 0.5,
    dtype=None,
) -> jax.Array:
    """Jittered chain initializations (n_chains, P+1) around log(theta)."""
    u0 = pack(kernel_template, noise)
    if dtype is not None:
        u0 = u0.astype(dtype)
    eps = jax.random.normal(key, (n_chains, u0.shape[0]), u0.dtype)
    return u0[None, :] + spread * eps
