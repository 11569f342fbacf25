"""Random-feature GP tests (models/rff.py).

Gates: predictions/lml converge to the dense exact GP as F grows (the
O(1/sqrt F) RFF rate); the blocked accumulation matches a dense
single-shot computation exactly; padding rows contribute nothing; ARD
(D-dim) inputs work; posterior draws have the right moments; periodic
kernels (exact harmonic features) match dense tightly at small F.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import (
    ARDGaussianKernel,
    GaussianKernel,
    PeriodicKernel,
    fit,
    fit_rff,
    predict_diag,
    predict_rff,
    sample_rff_posterior,
)
from gaussian_processes_tpu.models.pathwise import prior_features


def _data(n=300, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2.0, 2.0, n)))
    y = jnp.asarray(np.sin(2 * np.asarray(x)) + 0.2 * rng.standard_normal(n))
    return x, y


def test_blocked_accumulation_matches_dense():
    kernel = GaussianKernel(h=1.0, w=0.5)
    x, y = _data(130)
    key = jax.random.key(0)
    post_b = fit_rff(kernel, x, y, 0.2, key, num_features=256, block_size=32)
    post_d = fit_rff(kernel, x, y, 0.2, key, num_features=256, block_size=1024)
    np.testing.assert_allclose(np.asarray(post_b.w_mean),
                               np.asarray(post_d.w_mean), atol=1e-10)
    np.testing.assert_allclose(float(post_b.log_marginal),
                               float(post_d.log_marginal), rtol=1e-12)
    # and against an explicit dense feature computation
    feats = prior_features(kernel, key, 256)
    P = np.asarray(feats(x))
    A = P.T @ P + 0.04 * np.eye(256)
    w = np.linalg.solve(A, P.T @ np.asarray(y))
    np.testing.assert_allclose(np.asarray(post_b.w_mean), w, atol=1e-8)


@pytest.mark.slow
def test_rff_converges_to_dense_gp():
    kernel = GaussianKernel(h=1.0, w=0.5)
    x, y = _data(250, seed=1)
    dense = fit(kernel, x, y, 0.2, jitter=1e-10)
    xo = jnp.linspace(-1.8, 1.8, 60, dtype=x.dtype)
    mean_d, var_d = predict_diag(dense, xo)
    errs = {}
    for F in (128, 4096):
        post = fit_rff(kernel, x, y, 0.2, jax.random.key(2), num_features=F)
        mean_f, var_f = predict_rff(post, xo)
        errs[F] = float(jnp.max(jnp.abs(mean_f - mean_d)))
        if F == 4096:
            np.testing.assert_allclose(np.asarray(mean_f),
                                       np.asarray(mean_d), atol=0.05)
            np.testing.assert_allclose(np.asarray(var_f),
                                       np.asarray(var_d), atol=0.05)
            assert abs(float(post.log_marginal) - float(dense.log_marginal)) \
                < 0.05 * abs(float(dense.log_marginal)) + 10.0
    assert errs[4096] < errs[128], errs


def test_rff_periodic_harmonics_are_tight():
    kernel = PeriodicKernel(h=1.0, w=0.9, p=1.1)
    x, y = _data(200, seed=3)
    dense = fit(kernel, x, y, 0.2, jitter=1e-10)
    post = fit_rff(kernel, x, y, 0.2, jax.random.key(3), num_features=129)
    xo = jnp.linspace(-1.5, 1.5, 50, dtype=x.dtype)
    mean_d, _ = predict_diag(dense, xo)
    mean_f, _ = predict_rff(post, xo)
    # exact truncated harmonic features: no MC error, only truncation
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_d),
                               atol=2e-3)


def test_rff_ard_2d():
    kernel = ARDGaussianKernel(h=jnp.float64(1.0),
                               w=jnp.asarray([0.5, 0.6], jnp.float64))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1.0, 1.0, (200, 2)))
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, 0]))
                    + 0.2 * rng.standard_normal(200))
    dense = fit(kernel, x, y, 0.2, jitter=1e-10)
    post = fit_rff(kernel, x, y, 0.2, jax.random.key(4), num_features=4096)
    xo = x[:40] * 0.8
    mean_d, _ = predict_diag(dense, xo)
    mean_f, _ = predict_rff(post, xo)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_d),
                               atol=0.06)


def test_rff_posterior_draws_have_right_moments():
    kernel = GaussianKernel(h=1.0, w=0.5)
    x, y = _data(150, seed=5)
    post = fit_rff(kernel, x, y, 0.2, jax.random.key(5), num_features=1024)
    xo = jnp.linspace(-1.5, 1.5, 30, dtype=x.dtype)
    draws = sample_rff_posterior(post, xo, jax.random.key(6), n_samples=4096)
    mean, var = predict_rff(post, xo)
    np.testing.assert_allclose(np.asarray(draws.mean(0)), np.asarray(mean),
                               atol=4 * float(jnp.sqrt(var.max() / 4096)) + 1e-3)
    np.testing.assert_allclose(np.asarray(draws.var(0)), np.asarray(var),
                               rtol=0.2, atol=1e-4)


def test_rff_padding_rows_are_inert():
    kernel = GaussianKernel(h=1.0, w=0.5)
    x, y = _data(100, seed=6)  # 100 % 32 != 0 forces padding
    post = fit_rff(kernel, x, y, 0.2, jax.random.key(7),
                   num_features=128, block_size=32)
    post_np = fit_rff(kernel, x, y, 0.2, jax.random.key(7),
                      num_features=128, block_size=100)
    np.testing.assert_allclose(np.asarray(post.w_mean),
                               np.asarray(post_np.w_mean), atol=1e-10)
