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


def make_log_posterior_iterative(
    kernel_template: Kernel,
    x,
    y,
    *,
    probe_key: jax.Array | None = None,
    prior_mean=0.0,
    prior_std=2.0,
    num_probes: int = 8,
    num_iters: int = 100,
    tol: float = 1e-6,
    jitter: float = 0.0,
    block_size: int = 1024,
    precond_rank: int = 0,
    early_exit: bool = True,
    structure: str = "none",
) -> Callable:
    """Matrix-free log posterior over u = log(theta) for NUTS/ChEES.

    ``structure="toeplitz"`` (uniform-grid x): every leapfrog step's
    solves and Jacobian contractions run as O(n log n) FFT products
    (ops/toeplitz.py).  CAUTION at extreme scale in f32: the SLQ logdet
    was measured to acquire a systematic bias at N=2^20 (iteration-
    independent, inflates lml at long lengthscales — STATUS.md round-2
    session 3); for grid data at N >~ 10^5 prefer
    ``make_log_posterior_whittle`` (exact circulant-model density,
    deterministic, ~1000x cheaper per step).

    The round-2 bridge (VERDICT r1 item 2) between the matrix-free stack
    (models/iterative_gp.py: PCG solves + SLQ logdet, O(n·block) memory,
    no N x N array) and the samplers: fully Bayesian hyperparameter
    inference past the dense-Cholesky wall (~N=2e4/chip), per
    BASELINE.json's north star crossed with config #4's N=65k.

    Mechanics: a ``jax.custom_vjp`` whose forward runs
    ``log_marginal_value_and_grad_iterative`` once — value from PCG+SLQ,
    gradient from the Hutchinson trace identity over the same solves —
    and stashes the gradient as the residual, so the backward pass is one
    multiply.  The samplers call ``value_and_grad`` at every leapfrog
    step, so nothing is wasted.

    **Fixed probes**: ``probe_key`` is frozen at build time and reused on
    every evaluation, so the sampler targets one *deterministic* surrogate
    log-density (logdet MC error becomes a fixed O(1/sqrt(num_probes))
    bias of the surrogate rather than per-step noise that would break
    detailed balance).  Tests gate the surrogate posterior against the
    dense one within Monte-Carlo error (tests/test_iterative_posterior.py).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if probe_key is None:
        probe_key = jax.random.key(20240817)
    mu = jnp.asarray(prior_mean)
    sd = jnp.asarray(prior_std)
    P = kernel_template.n_params

    from gaussian_processes_tpu.models.iterative_gp import (
        log_marginal_value_and_grad_iterative,
    )

    def _value_and_grad_u(u):
        theta = jnp.exp(u)
        kernel = kernel_template.with_params(theta[:P])
        lml, g_theta = log_marginal_value_and_grad_iterative(
            kernel, x, y, theta[P], probe_key,
            num_probes=num_probes, num_iters=num_iters, tol=tol,
            jitter=jitter, block_size=block_size, precond_rank=precond_rank,
            # preconditioned solves stop at convergence instead of burning
            # the full budget — a per-leapfrog wall-clock saver; results
            # are bit-identical to the fixed scan (masked freeze)
            early_exit=early_exit and precond_rank > 0,
            structure=structure,
        )
        lp = lml - 0.5 * jnp.sum(jnp.square((u - mu) / sd))
        g_u = g_theta * theta - (u - mu) / jnp.square(sd)
        return lp, g_u

    @jax.custom_vjp
    def log_post(u):
        return _value_and_grad_u(u)[0]

    def fwd(u):
        lp, g_u = _value_and_grad_u(u)
        return lp, g_u

    def bwd(g_u, ct):
        return (ct * g_u,)

    log_post.defvjp(fwd, bwd)
    return log_post


def make_log_posterior_whittle(
    kernel_template: Kernel,
    x,
    y,
    *,
    prior_mean=0.0,
    prior_std=2.0,
    jitter: float = 0.0,
    center: bool = True,
    spectrum: str = "auto",
) -> Callable:
    """Log posterior over u = log(theta) with the WHITTLE likelihood.

    ``spectrum`` selects how the circulant eigenvalues are computed
    (ops/toeplitz.py::whittle_spectrum): "auto" uses the ANALYTIC
    aliased spectral density where the kernel has a closed form —
    required for honest noise inference at N ~ 1e6, where an f32 FFT
    of the sampled column cannot resolve the spectral tail below the
    noise floor (round-4 forensics in BASELINE.md) — falling back to
    the FFT spectrum otherwise.

    For uniform-grid data (assert with ``ops.toeplitz.is_uniform_grid``):
    the exact log-density of the circulant surrogate model — three FFT/
    elementwise ops per evaluation, deterministic, differentiated by
    plain autodiff.  The right objective for fully Bayesian
    hyperparameters at N ~ 10^5-10^6 on grids, where the stochastic SLQ
    surrogate was measured to acquire an f32 systematic bias
    (ops/toeplitz.py::whittle_log_marginal).  Asymptotically exact;
    gated against the dense posterior in tests/test_toeplitz.py.

    ``center=True`` (default) returns the density SHIFTED by the
    constant -lml(exp(prior_mean)) by accumulating per-frequency-bin
    DIFFERENCES against the reference spectrum at the prior mean.
    Why (measured at N=2^20, both chip and CPU f32): the absolute lml
    is ~1e6 nats, where f32 resolution is ~0.06 nats — the same order
    as a well-tuned HMC energy error — so the MH acceptance becomes
    rounding noise at every step size and dual averaging collapses the
    step to zero (frozen chains, split-R-hat = inf).  Centering cancels
    the large magnitude per bin BEFORE the reduction, restoring full
    f32 resolution around the sampling region.  MCMC and optimizers are
    invariant to the constant shift.
    """
    from gaussian_processes_tpu.ops.toeplitz import (
        whittle_log_marginal,
        whittle_spectrum,
    )

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    mu = jnp.asarray(prior_mean)
    sd = jnp.asarray(prior_std)

    if not center:
        def log_post(u):
            kernel, noise = unpack(kernel_template, u)
            lml = whittle_log_marginal(kernel, x, y, noise, jitter,
                                       spectrum=spectrum)
            return lml - 0.5 * jnp.sum(jnp.square((u - mu) / sd))

        return log_post

    n = y.shape[0]
    dtype = y.dtype
    u_c = jnp.broadcast_to(mu.astype(dtype),
                           (kernel_template.n_params + 1,))
    kern_c, noise_c = unpack(kernel_template, u_c)
    lam0 = whittle_spectrum(kern_c, x, noise_c, jitter, spectrum)
    log_lam0 = jnp.log(lam0)
    fy = jnp.fft.rfft(y)
    p_y = jnp.square(fy.real) + jnp.square(fy.imag)
    m = lam0.shape[0]
    w = jnp.full((m,), 2.0, dtype)
    w = w.at[0].set(1.0)
    if n % 2 == 0:
        w = w.at[m - 1].set(1.0)

    def log_post(u):
        kernel, noise = unpack(kernel_template, u)
        lam = whittle_spectrum(kernel, x, noise, jitter, spectrum)
        # per-bin differences: each term is O(|u - mu|), so the f32
        # reduction never sees the ~1e6-magnitude absolute lml
        dquad = jnp.sum(w * p_y * (lam0 - lam) / (lam * lam0)) / n
        dlogdet = jnp.sum(w * (jnp.log(lam) - log_lam0))
        lml_centered = -0.5 * (dquad + dlogdet)
        return lml_centered - 0.5 * jnp.sum(jnp.square((u - mu) / sd))

    return log_post


def make_log_posterior_whittle_kron(
    kernel_template,
    op,
    y,
    *,
    prior_mean=0.0,
    prior_std=2.0,
    jitter: float = 0.0,
    center: bool = True,
    spectrum: str = "auto",
) -> Callable:
    """Log posterior over u = log(h, w_1..w_D, noise) with the D-dim
    torus Whittle likelihood (ops/kronecker.py::whittle_log_marginal_kron)
    — fully Bayesian hyperparameters on Cartesian grids at n ~ 1e6.

    ``center=True`` applies the same f32-resolution fix as the 1-D
    builder (``make_log_posterior_whittle``): per-frequency-bin
    differences against the prior-mean spectrum cancel the ~n-magnitude
    absolute lml before the reduction, restoring f32 resolution where
    |lml| exceeds 1/eps_f32 nats.  MCMC is invariant to the constant
    shift.
    """
    from gaussian_processes_tpu.ops.kronecker import (
        kron_whittle_spectrum,
        whittle_log_marginal_kron,
    )

    y = jnp.asarray(y)
    mu = jnp.asarray(prior_mean)
    sd = jnp.asarray(prior_std)

    if not center:
        def log_post(u):
            kernel, noise = unpack(kernel_template, u)
            lml = whittle_log_marginal_kron(kernel, op, y, noise, jitter,
                                            spectrum=spectrum)
            return lml - 0.5 * jnp.sum(jnp.square((u - mu) / sd))

        return log_post

    n = op.n
    dtype = y.dtype
    u_c = jnp.broadcast_to(mu.astype(dtype),
                           (kernel_template.n_params + 1,))
    kern_c, noise_c = unpack(kernel_template, u_c)
    lam0 = kron_whittle_spectrum(kern_c, op, noise_c, jitter, spectrum)
    log_lam0 = jnp.log(lam0)
    fy = jnp.fft.fftn(y.reshape(op.shape))
    p_y = jnp.square(fy.real) + jnp.square(fy.imag)

    def log_post(u):
        kernel, noise = unpack(kernel_template, u)
        lam = kron_whittle_spectrum(kernel, op, noise, jitter, spectrum)
        dquad = jnp.sum(p_y * (lam0 - lam) / (lam * lam0)) / n
        dlogdet = jnp.sum(jnp.log(lam) - log_lam0)
        lml_centered = -0.5 * (dquad + dlogdet)
        return lml_centered - 0.5 * jnp.sum(jnp.square((u - mu) / sd))

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
