"""Leave-one-out predictives and online posterior extension
(models/gp.py::loo_predictive / extend_posterior).

Gates: LOO closed form == brute-force n refits; extend == full refit
bit-tight (L, alpha, lml, predictions), chained appends, k>1 blocks,
and jit-compatibility.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu import fit, predict_diag
from gaussian_processes_tpu.models.gaussian import GaussianKernel
from gaussian_processes_tpu.models.gp import (
    extend_posterior,
    loo_predictive,
)


def _data(n=60, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2.0, 2.0, n)))
    y = jnp.asarray(
        np.sin(3.0 * np.asarray(x)) + 0.1 * rng.standard_normal(n)
    )
    return x, y


def test_loo_matches_brute_force_refits():
    x, y = _data(40)
    k = GaussianKernel(1.1, 0.6)
    s = 0.15
    post = fit(k, x, y, s)
    mu, var, lpl = loo_predictive(post)
    # brute force: refit without point i, predict y-space at x_i
    lpl_ref = 0.0
    for i in range(x.shape[0]):
        keep = np.arange(x.shape[0]) != i
        pi = fit(k, x[keep], y[keep], s)
        m_i, v_i = predict_diag(pi, x[i][None])
        v_i = v_i + s**2  # y-space
        np.testing.assert_allclose(float(mu[i]), float(m_i[0]), rtol=1e-8)
        np.testing.assert_allclose(float(var[i]), float(v_i[0]), rtol=1e-8)
        lpl_ref += float(
            -0.5 * ((y[i] - m_i[0]) ** 2 / v_i[0]
                    + jnp.log(v_i[0]) + jnp.log(2 * jnp.pi))
        )
    np.testing.assert_allclose(float(lpl), lpl_ref, rtol=1e-8)


def test_extend_matches_full_refit():
    x, y = _data(80)
    k = GaussianKernel(1.0, 0.5)
    s = 0.1
    post0 = fit(k, x[:50], y[:50], s)
    post1 = extend_posterior(post0, x[50:], y[50:])
    full = fit(k, x, y, s)
    np.testing.assert_allclose(post1.L, full.L, atol=1e-10)
    np.testing.assert_allclose(post1.alpha, full.alpha, atol=1e-8)
    np.testing.assert_allclose(
        float(post1.log_marginal), float(full.log_marginal), rtol=1e-10
    )
    xo = jnp.linspace(-1.5, 1.5, 30)
    m1, v1 = predict_diag(post1, xo)
    mf, vf = predict_diag(full, xo)
    np.testing.assert_allclose(m1, mf, atol=1e-9)
    np.testing.assert_allclose(v1, vf, atol=1e-9)


def test_extend_chained_and_single_point():
    x, y = _data(45, seed=2)
    k = GaussianKernel(0.9, 0.4)
    s = 0.2
    post = fit(k, x[:30], y[:30], s)
    # one scalar append, then a block of 14
    post = extend_posterior(post, x[30], y[30])
    post = extend_posterior(post, x[31:], y[31:])
    full = fit(k, x, y, s)
    np.testing.assert_allclose(
        float(post.log_marginal), float(full.log_marginal), rtol=1e-10
    )
    np.testing.assert_allclose(post.alpha, full.alpha, atol=1e-8)


def test_extend_jits():
    x, y = _data(50, seed=3)
    k = GaussianKernel(1.0, 0.5)
    post = fit(k, x[:40], y[:40], 0.1)
    f = jax.jit(extend_posterior)
    post1 = f(post, x[40:], y[40:])
    full = fit(k, x, y, 0.1)
    np.testing.assert_allclose(
        float(post1.log_marginal), float(full.log_marginal), rtol=1e-10
    )


def test_loo_identifies_better_model():
    # pseudo-likelihood should prefer hyperparameters near the truth
    x, y = _data(80, seed=5)
    s = 0.1
    good = fit(GaussianKernel(1.0, 0.5), x, y, s)
    bad = fit(GaussianKernel(1.0, 5.0), x, y, s)
    _, _, lpl_good = loo_predictive(good)
    _, _, lpl_bad = loo_predictive(bad)
    assert float(lpl_good) > float(lpl_bad)


def test_heteroscedastic_noise_vector():
    # (n,) per-point noise: fit/predict/lml vs an explicit numpy oracle
    from gaussian_processes_tpu.models.gp import (
        build_kxx, log_marginal_likelihood,
    )
    import scipy.linalg as sla

    x, y = _data(50, seed=9)
    k = GaussianKernel(1.0, 0.5)
    rng = np.random.default_rng(0)
    s_vec = jnp.asarray(0.05 + 0.2 * rng.random(50))
    post = fit(k, x, y, s_vec)
    K = np.asarray(k(x, x)) + np.diag(np.asarray(s_vec) ** 2)
    L = np.linalg.cholesky(K)
    alpha = sla.cho_solve((L, True), np.asarray(y))
    lml = (-0.5 * float(np.asarray(y) @ alpha)
           - float(np.log(np.diag(L)).sum())
           - 0.5 * 50 * np.log(2 * np.pi))
    np.testing.assert_allclose(post.alpha, alpha, atol=1e-9)
    np.testing.assert_allclose(float(post.log_marginal), lml, rtol=1e-10)
    np.testing.assert_allclose(
        float(log_marginal_likelihood(k, x, y, s_vec)), lml, rtol=1e-10
    )
    # predictions use the same latent formulas — spot-check mean
    xo = jnp.linspace(-1.5, 1.5, 20)
    mean, var = predict_diag(post, xo)
    Ko = np.asarray(k(xo, x))
    np.testing.assert_allclose(mean, Ko @ alpha, atol=1e-9)
    assert np.all(np.asarray(var) > 0)
    # autodiff gradient wrt the noise vector is finite and FD-consistent
    g = jax.grad(
        lambda s: log_marginal_likelihood(k, x, y, s)
    )(s_vec)
    assert np.all(np.isfinite(np.asarray(g)))
    e = jnp.zeros(50).at[7].set(1e-6)
    fd = (log_marginal_likelihood(k, x, y, s_vec + e)
          - log_marginal_likelihood(k, x, y, s_vec - e)) / 2e-6
    np.testing.assert_allclose(float(g[7]), float(fd), rtol=1e-5)
    # extend_posterior refuses vector noise loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        extend_posterior(post, 0.5, 0.5)
