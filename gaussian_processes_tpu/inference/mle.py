"""Type-II maximum-likelihood hyperparameter estimation.

The reference leaves optimization to scipy driven by its analytic
``dloglh_dtheta`` (SURVEY.md §4.4); BASELINE.json:8 (config #2) makes
type-II MLE via log-marginal-likelihood gradients a built-in capability.
Here the whole optimization is one ``jit``-compiled ``lax.scan`` — the
per-step Python↔native boundary of the reference collapses into XLA.

Optimizers: optax L-BFGS (default; with zoom linesearch) or Adam.  The
objective is the negative log marginal likelihood over unconstrained
u = log(kernel params..., noise) from inference/gp_model.py; multi-restart
support vmaps the whole optimization over initial points.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gaussian_processes_tpu.models.base import Kernel
from gaussian_processes_tpu.inference import gp_model


class MLEResult(NamedTuple):
    kernel: Kernel
    noise: jax.Array
    u: jax.Array  # optimal log-parameters
    log_marginal: jax.Array  # at the optimum
    losses: jax.Array  # per-step objective trace
    converged: jax.Array  # final gradient norm below tol


def _run_opt(loss_fn: Callable, u0: jax.Array, opt, num_steps: int, use_linesearch: bool):
    if use_linesearch:
        value_and_grad = optax.value_and_grad_from_state(loss_fn)
    else:
        plain_vag = jax.value_and_grad(loss_fn)
        value_and_grad = lambda u, state: plain_vag(u)

    def step(carry, _):
        u, opt_state, best_u, best_loss = carry
        value, grad = value_and_grad(u, state=opt_state)
        if use_linesearch:
            updates, opt_state = opt.update(
                grad, opt_state, u, value=value, grad=grad, value_fn=loss_fn
            )
        else:
            updates, opt_state = opt.update(grad, opt_state, u)
        u = optax.apply_updates(u, updates)
        better = value < best_loss
        best_u = jnp.where(better, carry[0], best_u)
        best_loss = jnp.where(better, value, best_loss)
        return (u, opt_state, best_u, best_loss), value

    init = (u0, opt.init(u0), u0, jnp.asarray(jnp.inf, u0.dtype))
    (u, _, best_u, best_loss), losses = jax.lax.scan(
        step, init, None, length=num_steps
    )
    # the final iterate may beat the best recorded pre-update point
    final_loss = loss_fn(u)
    better = final_loss < best_loss
    best_u = jnp.where(better, u, best_u)
    best_loss = jnp.where(better, final_loss, best_loss)
    return best_u, best_loss, losses


def fit_mle(
    kernel_template: Kernel,
    x,
    y,
    noise_init,
    *,
    num_steps: int = 100,
    method: str = "lbfgs",
    learning_rate: float = 0.05,
    jitter: float = 0.0,
    grad_tol: float = 1e-3,
    objective: str = "exact",
    inducing=None,
) -> MLEResult:
    """Optimize (kernel params, noise) by maximizing log p(y | x, theta).

    The returned kernel/noise are in natural space.  ``jit``-safe and
    ``vmap``-able over ``kernel_template``/``noise_init`` for restarts.

    ``objective="whittle"`` (uniform-grid x, see
    ``ops.toeplitz.whittle_log_marginal``): maximize the exact circulant-
    model density instead of the dense lml — O(n log n) per step with no
    Cholesky, the type-II MLE companion of ``make_log_posterior_whittle``
    for grids at N ~ 10^5-10^6.

    ``objective="sgpr"`` (requires ``inducing``, the (m[, D]) inducing
    inputs — see ``models.sgpr.select_inducing``): maximize the Titsias
    collapsed bound instead — O(n m^2) per step with only (m, m)
    factorizations, the scattered-large-n companion (models/sgpr.py).
    To also learn the inducing locations use
    ``models.sgpr.fit_sgpr_mle(learn_inducing=True)``.
    """
    if objective == "sgpr":
        from gaussian_processes_tpu.models.sgpr import elbo_sgpr

        if inducing is None:
            raise ValueError("objective='sgpr' requires inducing points")
        x_ = jnp.asarray(x)
        y_ = jnp.asarray(y)
        z_ = jnp.asarray(inducing)
        sgpr_jitter = jitter if jitter > 0.0 else 1e-6

        def log_lik(u):
            kernel, noise = gp_model.unpack(kernel_template, u)
            return elbo_sgpr(kernel, x_, y_, noise, z_, jitter=sgpr_jitter)
    elif objective == "whittle":
        from gaussian_processes_tpu.ops.toeplitz import whittle_log_marginal

        x_ = jnp.asarray(x)
        y_ = jnp.asarray(y)

        def log_lik(u):
            kernel, noise = gp_model.unpack(kernel_template, u)
            return whittle_log_marginal(kernel, x_, y_, noise, jitter)
    elif objective == "exact":
        log_lik = gp_model.make_log_likelihood(kernel_template, x, y, jitter)
    else:
        raise ValueError(f"unknown objective: {objective!r}")
    loss_fn = lambda u: -log_lik(u)
    u0 = gp_model.pack(kernel_template, noise_init)

    if method == "lbfgs":
        opt = optax.lbfgs()
        use_linesearch = True
    elif method == "adam":
        opt = optax.adam(learning_rate)
        use_linesearch = False
    else:
        raise ValueError(f"unknown method: {method!r}")

    best_u, best_loss, losses = _run_opt(
        loss_fn, u0, opt, num_steps, use_linesearch
    )
    kernel, noise = gp_model.unpack(kernel_template, best_u)
    gnorm = jnp.linalg.norm(jax.grad(loss_fn)(best_u))
    return MLEResult(
        kernel=kernel,
        noise=noise,
        u=best_u,
        log_marginal=-best_loss,
        losses=losses,
        converged=gnorm < grad_tol,
    )


def fit_mle_restarts(
    kernel_template: Kernel,
    x,
    y,
    noise_init,
    key: jax.Array,
    n_restarts: int = 8,
    spread: float = 1.0,
    **kwargs,
) -> MLEResult:
    """Multi-restart MLE: vmap the optimization over jittered inits,
    return the best restart (guards against multimodal likelihoods,
    e.g. the periodic kernel's period)."""
    u0 = gp_model.pack(kernel_template, noise_init)
    eps = jax.random.normal(key, (n_restarts, u0.shape[0]), u0.dtype)
    inits = jnp.exp(u0[None, :] + spread * eps)
    P = kernel_template.n_params

    def one(theta0):
        return fit_mle(
            kernel_template.with_params(theta0[:P]), x, y, theta0[P], **kwargs
        )

    results = jax.vmap(one)(inits)
    best = jnp.argmax(results.log_marginal)
    return jax.tree.map(lambda a: a[best], results)
