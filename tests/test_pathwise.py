"""Pathwise (Matheron) posterior sampling tests.

Gates, mirroring the suite's discipline (SURVEY.md §5):

* feature-map correctness: Phi Phi^T reproduces K for every registered
  spectral law (statistical tolerance ~ sqrt(2/F) for RFF; near-exact for
  the periodic harmonic map);
* sampler correctness: pathwise draws through the *exact* periodic
  harmonic prior match the closed-form predictive moments within
  Monte-Carlo error (no feature bias in that configuration);
* dense/iterative consistency: identical keys => draw-for-draw agreement
  between the Cholesky-solve and CG-solve samplers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import (
    ARDGaussianKernel,
    GaussianKernel,
    Matern32Kernel,
    Matern52Kernel,
    PeriodicKernel,
    ProductKernel,
    RationalQuadraticKernel,
    SumKernel,
    fit,
    fit_iterative,
    predict,
)
from gaussian_processes_tpu.models.pathwise import (
    periodic_harmonic_features,
    prior_features,
    sample_posterior_pathwise,
    sample_posterior_pathwise_iterative,
)


def _feature_cov_err(kernel, x, key, F):
    feats = prior_features(kernel, key, F)
    Phi = feats(x)
    Khat = Phi @ Phi.T
    # RFF with random phases: E[phi phi^T] adds a cos((t+t')w + 2b) term
    # with zero mean — covered by the statistical tolerance
    K = kernel(x, x)
    return float(jnp.max(jnp.abs(Khat - K))), float(kernel.kdiag(x[:1])[0])


KERNELS_1D = [
    GaussianKernel(h=1.3, w=0.7),
    Matern32Kernel(h=0.9, w=0.5),
    Matern52Kernel(h=1.1, w=0.8),
    RationalQuadraticKernel(h=1.0, w=0.6, a=1.5),
    SumKernel(GaussianKernel(h=0.8, w=0.4), Matern32Kernel(h=1.2, w=1.0)),
    ProductKernel(
        GaussianKernel(h=1.1, w=1.5), PeriodicKernel(h=1.0, w=1.0, p=0.7)
    ),
]


@pytest.mark.parametrize("kernel", KERNELS_1D, ids=lambda k: type(k).__name__)
def test_rff_covariance_matches_kernel(kernel):
    x = jnp.linspace(-1.5, 1.5, 9, dtype=jnp.float64)
    err, k0 = _feature_cov_err(kernel, x, jax.random.key(3), F=32768)
    # MC error per entry ~ sqrt(2/F) k0 ~ 0.008 k0; 6-sigma-ish gate
    assert err < 0.06 * k0, err


def test_rff_covariance_ard():
    kernel = ARDGaussianKernel(
        h=jnp.asarray(1.2), w=jnp.asarray([0.5, 1.5, 3.0])
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 3)))
    err, k0 = _feature_cov_err(kernel, x, jax.random.key(5), F=32768)
    assert err < 0.06 * k0, err


def test_periodic_harmonics_near_exact():
    kernel = PeriodicKernel(h=1.4, w=0.8, p=0.6)
    x = jnp.linspace(-2.0, 2.0, 13, dtype=jnp.float64)
    feats = periodic_harmonic_features(kernel, num_harmonics=64)
    Phi = feats(x)
    err = jnp.max(jnp.abs(Phi @ Phi.T - kernel(x, x)))
    assert float(err) < 1e-10, err


def test_periodic_harmonics_through_prior_features():
    kernel = PeriodicKernel(h=1.0, w=1.1, p=0.9)
    x = jnp.linspace(-1.0, 1.0, 7, dtype=jnp.float64)
    feats = prior_features(kernel, jax.random.key(0), num_features=129)
    Phi = feats(x)
    err = jnp.max(jnp.abs(Phi @ Phi.T - kernel(x, x)))
    assert float(err) < 1e-10, err


def _toy_problem(kernel, n=40, seed=0, noise=0.3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-1.5, 1.5, n)))
    f = np.sin(3.0 * np.asarray(x))
    y = jnp.asarray(f + noise * rng.standard_normal(n))
    return x, y


def test_pathwise_moments_match_exact_posterior():
    # periodic kernel => the harmonic prior map is exact, so the ONLY
    # error in the pathwise draws is Monte-Carlo — a tight moments gate
    kernel = PeriodicKernel(h=1.0, w=1.0, p=2.0)
    x, y = _toy_problem(kernel, n=40, noise=0.3)
    post = fit(kernel, x, y, 0.3, jitter=1e-10)
    xo = jnp.linspace(-1.2, 1.2, 11, dtype=x.dtype)
    mean, cov = predict(post, xo)
    var = jnp.diagonal(cov)

    S = 6000
    draws = sample_posterior_pathwise(
        post, xo, jax.random.key(7), n_samples=S, num_features=257
    )
    assert draws.shape == (S, 11)
    mc_mean = jnp.mean(draws, axis=0)
    mc_var = jnp.var(draws, axis=0)
    # sample-mean std = sqrt(var/S); allow 5 sigma
    tol_mean = 5.0 * jnp.sqrt(var / S)
    assert bool(jnp.all(jnp.abs(mc_mean - mean) < tol_mean))
    # sample-variance rel std ~ sqrt(2/S) ~ 1.8%; allow 5 sigma + floor
    assert bool(jnp.all(jnp.abs(mc_var - var) < 0.1 * var + 1e-12))


def test_pathwise_dense_vs_iterative_same_key():
    kernel = GaussianKernel(h=1.0, w=0.6)
    x, y = _toy_problem(kernel, n=60, noise=0.2)
    post_d = fit(kernel, x, y, 0.2, jitter=1e-10)
    post_i = fit_iterative(
        kernel, x, y, 0.2, jax.random.key(1),
        num_probes=4, num_iters=120, tol=1e-12, jitter=1e-10, block_size=32,
    )
    xo = jnp.linspace(-1.0, 1.0, 9, dtype=x.dtype)
    key = jax.random.key(11)
    d1 = sample_posterior_pathwise(
        post_d, xo, key, n_samples=5, num_features=512
    )
    d2 = sample_posterior_pathwise_iterative(
        post_i, xo, key, n_samples=5, num_features=512,
        num_iters=150, tol=1e-13, jitter=1e-10, block_size=32,
    )
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-7)


@pytest.mark.slow
def test_pathwise_iterative_preconditioned_agrees():
    kernel = GaussianKernel(h=1.0, w=0.5)
    x, y = _toy_problem(kernel, n=80, noise=0.15)
    post_i = fit_iterative(
        kernel, x, y, 0.15, jax.random.key(2),
        num_probes=4, num_iters=150, tol=1e-12, jitter=1e-10,
        block_size=32, precond_rank=24,
    )
    xo = jnp.linspace(-1.0, 1.0, 6, dtype=x.dtype)
    key = jax.random.key(4)
    d_plain = sample_posterior_pathwise_iterative(
        post_i, xo, key, n_samples=3, num_features=256,
        num_iters=200, tol=1e-13, jitter=1e-10, block_size=32,
    )
    d_pre = sample_posterior_pathwise_iterative(
        post_i, xo, key, n_samples=3, num_features=256,
        num_iters=200, tol=1e-13, jitter=1e-10, block_size=32,
        precond_rank=24,
    )
    np.testing.assert_allclose(
        np.asarray(d_plain), np.asarray(d_pre), atol=1e-7
    )


def test_pathwise_jits_and_dtype():
    kernel = GaussianKernel(h=1.0, w=0.8)
    x, y = _toy_problem(kernel, n=30)
    post = fit(kernel, x, y, 0.2, jitter=1e-9)
    xo = jnp.linspace(-1.0, 1.0, 5, dtype=x.dtype)

    f = jax.jit(
        lambda p, t, k: sample_posterior_pathwise(
            p, t, k, n_samples=2, num_features=128
        )
    )
    out = f(post, xo, jax.random.key(0))
    assert out.shape == (2, 5)
    assert out.dtype == y.dtype
    assert bool(jnp.all(jnp.isfinite(out)))
