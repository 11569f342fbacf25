"""GP classification (Laplace approximation) tests — models/classify.py.

Gates: Newton reaches a mode (self-consistency f = K grad); the Laplace
evidence matches 2-D numerical integration at n=2; predictions classify
separable data; probabilities are calibrated-monotone; the evidence is
differentiable and MLE improves it; jit/vmap-compatibility.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu.models.classify import (
    fit_laplace,
    fit_laplace_mle,
    log_marginal_laplace,
    predict_laplace,
)
from gaussian_processes_tpu.models.gaussian import GaussianKernel


def _data(n=120, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2.0, 2.0, n)))
    # latent: smooth sign structure with a noisy boundary
    p = jax.nn.sigmoid(4.0 * jnp.sin(2.0 * x))
    y = jnp.asarray(
        np.where(rng.random(n) < np.asarray(p), 1.0, -1.0)
    )
    return x, y


def test_newton_reaches_mode():
    x, y = _data(100)
    k = GaussianKernel(1.5, 0.6)
    post = fit_laplace(k, x, y, num_iters=25)
    # at the mode: f_hat = K a_hat = K grad_lik (R&W 3.17); a_hat is
    # the recurrence's stable copy and must agree with grad_lik in f64
    K = k(x, x) + 1e-6 * jnp.eye(100)
    np.testing.assert_allclose(
        post.f_hat, K @ post.a_hat, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(post.a_hat), np.asarray(post.grad_lik), atol=1e-8
    )
    # Newton objective increments go to ~0
    assert abs(float(post.newton_deltas[-1])) < 1e-10


def test_evidence_matches_quadrature_n2():
    # n=2: integrate the exact evidence on a grid and compare
    x = jnp.asarray([-0.5, 0.7])
    y = jnp.asarray([1.0, -1.0])
    k = GaussianKernel(1.2, 0.8)
    K = np.asarray(k(x, x)) + 1e-6 * np.eye(2)
    g = np.linspace(-6, 6, 401)
    F1, F2 = np.meshgrid(g, g, indexing="ij")
    F = np.stack([F1.ravel(), F2.ravel()], 1)
    Kinv = np.linalg.inv(K)
    logN = (
        -0.5 * np.einsum("nd,de,ne->n", F, Kinv, F)
        - 0.5 * np.log((2 * np.pi) ** 2 * np.linalg.det(K))
    )
    loglik = np.log1p(np.exp(-np.asarray(y)[None, :] * F)).sum(1) * -1.0
    dz = (g[1] - g[0]) ** 2
    exact = np.log(np.sum(np.exp(logN + loglik)) * dz)
    lap = float(log_marginal_laplace(k, x, y))
    # Laplace is an approximation; at n=2 logistic it is good to ~1%
    assert abs(lap - exact) < 0.05, (lap, exact)


def test_classifies_separable_data():
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, 150)))
    y = jnp.asarray(np.where(np.asarray(x) > 0, 1.0, -1.0))
    k = GaussianKernel(3.0, 0.5)
    post = fit_laplace(k, x, y)
    xo = jnp.asarray([-1.5, -0.8, 0.8, 1.5])
    mean, var, prob = predict_laplace(post, xo)
    assert float(prob[0]) < 0.1 and float(prob[1]) < 0.2
    assert float(prob[2]) > 0.8 and float(prob[3]) > 0.9
    assert np.all(np.asarray(var) >= 0)
    # training-set accuracy
    _, _, p_tr = predict_laplace(post, x)
    acc = float(jnp.mean((p_tr > 0.5) == (y > 0)))
    assert acc > 0.95


def test_probability_shrinks_with_uncertainty():
    # far from data the latent variance grows and prob -> 0.5
    x, y = _data(80, seed=2)
    k = GaussianKernel(2.0, 0.4)
    post = fit_laplace(k, x, y)
    _, _, p_near = predict_laplace(post, jnp.asarray([0.4]))
    _, _, p_far = predict_laplace(post, jnp.asarray([15.0]))
    assert abs(float(p_far[0]) - 0.5) < 0.02
    assert abs(float(p_near[0]) - 0.5) > abs(float(p_far[0]) - 0.5)


@pytest.mark.slow
def test_evidence_differentiable_and_mle_improves():
    x, y = _data(90, seed=3)
    k0 = GaussianKernel(0.8, 1.5)

    def f(u):
        return log_marginal_laplace(
            GaussianKernel(jnp.exp(u[0]), jnp.exp(u[1])), x, y
        )

    u0 = jnp.asarray([0.0, 0.0])
    v, g = jax.value_and_grad(f)(u0)
    assert np.all(np.isfinite(np.asarray(g)))
    # FD check
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (f(u0 + e) - f(u0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4,
                                   atol=1e-8)
    post, losses = fit_laplace_mle(k0, x, y, num_steps=60)
    assert float(losses[-1]) < float(losses[0])
    assert float(post.log_marginal) >= float(f(jnp.log(k0.params)))


def test_jit_and_vmap_over_hyperparams():
    x, y = _data(60, seed=4)

    @jax.jit
    def lml(w):
        return log_marginal_laplace(GaussianKernel(1.0, w), x, y,
                                    num_iters=15)

    ws = jnp.asarray([0.3, 0.6, 1.2])
    vals = jax.vmap(lml)(ws)
    assert vals.shape == (3,) and bool(jnp.all(jnp.isfinite(vals)))


# ---------------------------------------------------------------------------
# Poisson likelihood (log-Gaussian Cox)


def test_poisson_evidence_matches_quadrature_n2():
    from gaussian_processes_tpu.models.classify import PoissonLikelihood
    from scipy.special import gammaln

    x = jnp.asarray([-0.4, 0.6])
    y = jnp.asarray([3.0, 0.0])
    k = GaussianKernel(0.9, 0.7)
    b = 2.0
    K = np.asarray(k(x, x)) + 1e-6 * np.eye(2)
    g = np.linspace(-8, 6, 501)
    F1, F2 = np.meshgrid(g, g, indexing="ij")
    F = np.stack([F1.ravel(), F2.ravel()], 1)
    Kinv = np.linalg.inv(K)
    logN = (
        -0.5 * np.einsum("nd,de,ne->n", F, Kinv, F)
        - 0.5 * np.log((2 * np.pi) ** 2 * np.linalg.det(K))
    )
    yv = np.asarray(y)
    loglik = (
        (yv[None, :] * (F + np.log(b)) - b * np.exp(F)
         - gammaln(yv + 1.0)[None, :]).sum(1)
    )
    dz = (g[1] - g[0]) ** 2
    exact = np.log(np.sum(np.exp(logN + loglik)) * dz)
    lap = float(log_marginal_laplace(
        k, x, y, likelihood=PoissonLikelihood(binsize=b)
    ))
    assert abs(lap - exact) < 0.05, (lap, exact)


def test_poisson_recovers_latent_rate():
    from gaussian_processes_tpu.models.classify import (
        PoissonLikelihood, fit_laplace, predict_laplace,
    )

    rng = np.random.default_rng(0)
    n = 200
    x = jnp.linspace(-2.0, 2.0, n)
    f_true = jnp.sin(2.0 * x) + 0.5
    b = 5.0
    y = jnp.asarray(
        rng.poisson(b * np.exp(np.asarray(f_true))).astype(np.float64)
    )
    lik = PoissonLikelihood(binsize=b)
    post = fit_laplace(GaussianKernel(1.0, 0.6), x, y, likelihood=lik)
    assert abs(float(post.newton_deltas[-1])) < 1e-8
    mean, var, rate = predict_laplace(post, x)
    # latent recovered within ~3 posterior sds on average
    err = np.abs(np.asarray(mean - f_true))
    assert float(np.mean(err)) < 0.25, float(np.mean(err))
    # predicted rate correlates strongly with the true rate
    r_true = b * np.exp(np.asarray(f_true))
    corr = np.corrcoef(np.asarray(rate), r_true)[0, 1]
    assert corr > 0.95, corr
    assert np.all(np.asarray(rate) > 0)


def test_poisson_mle_improves_and_beats_bad_hypers():
    from gaussian_processes_tpu.models.classify import (
        PoissonLikelihood, fit_laplace_mle,
    )

    rng = np.random.default_rng(3)
    n = 120
    x = jnp.linspace(-2.0, 2.0, n)
    f_true = jnp.sin(2.0 * x)
    y = jnp.asarray(
        rng.poisson(3.0 * np.exp(np.asarray(f_true))).astype(np.float64)
    )
    lik = PoissonLikelihood(binsize=3.0)
    post, losses = fit_laplace_mle(
        GaussianKernel(0.4, 2.5), x, y, likelihood=lik, num_steps=60,
    )
    assert float(losses[-1]) < float(losses[0])
    bad = float(log_marginal_laplace(
        GaussianKernel(0.4, 2.5), x, y, likelihood=lik
    ))
    assert float(post.log_marginal) > bad


def test_log_prob_consistent_with_terms():
    """log_prob is the single source of truth for terms' ll (ADVICE r2):
    sum(log_prob) == terms ll and grad(sum log_prob) == terms grad, for
    both likelihoods — pins the SVGP quadrature hook before a consumer
    lands."""
    from gaussian_processes_tpu.models.classify import (
        LogisticLikelihood,
        PoissonLikelihood,
    )

    rng = np.random.default_rng(11)
    f = jnp.asarray(rng.standard_normal(40))
    yb = jnp.asarray(np.where(rng.random(40) < 0.5, 1.0, -1.0))
    yc = jnp.asarray(rng.poisson(2.0, 40).astype(np.float64))
    for lik, y in (
        (LogisticLikelihood(), yb),
        (PoissonLikelihood(binsize=0.7), yc),
    ):
        ll, grad, w = lik.terms(f, y)
        np.testing.assert_allclose(
            float(jnp.sum(lik.log_prob(f, y))), float(ll), rtol=1e-12
        )
        g_auto = jax.grad(lambda ff: jnp.sum(lik.log_prob(ff, y)))(f)
        np.testing.assert_allclose(
            np.asarray(g_auto), np.asarray(grad), rtol=1e-9, atol=1e-12
        )
        # W = -d2/df2 sum log_prob (diagonal), the Newton curvature
        hess_diag = -jnp.diagonal(
            jax.hessian(lambda ff: jnp.sum(lik.log_prob(ff, y)))(f)
        )
        np.testing.assert_allclose(
            np.asarray(hess_diag), np.asarray(w), rtol=1e-9, atol=1e-12
        )
