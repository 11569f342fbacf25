"""SGPR (Titsias collapsed bound) tests — models/sgpr.py.

Gates:
  * z = x  ⇒  ELBO == exact dense log marginal and predictions match
    the dense exact GP (the bound is tight when inducing spans training);
  * the bound NEVER exceeds the exact lml (random subsets, many draws);
  * blocked accumulation == dense single-shot formulas;
  * autodiff gradient of the bound == finite differences (incl. z);
  * MLE on the bound recovers hyperparameters / matches dense MLE;
  * inducing selectors (subset/grid/kmeans) behave; kmeans improves the
    trace gap over a random subset;
  * posterior draws have the predictive moments;
  * the Bayesian surrogate posterior matches the dense posterior when
    the bound is tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import fit, predict_diag
from gaussian_processes_tpu.models.ard import ARDGaussianKernel
from gaussian_processes_tpu.models.gaussian import GaussianKernel
from gaussian_processes_tpu.models.gp import log_marginal_likelihood
from gaussian_processes_tpu.models.sgpr import (
    SGPRPosterior,
    elbo_sgpr,
    fit_sgpr,
    fit_sgpr_mle,
    inducing_grid,
    inducing_subset,
    kmeans_inducing,
    make_log_posterior_sgpr,
    predict_sgpr,
    predict_sgpr_cov,
    sample_sgpr_posterior,
    select_inducing,
)

# slow tier (VERDICT r2 item 8): minutes-long on 4 host cores; run via
# `make test-all` / CI. The default `make test` gate stays < 10 min.
pytestmark = pytest.mark.slow



def _data(n=200, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2.0, 2.0, n)))
    f = np.sin(3.0 * np.asarray(x)) + 0.5 * np.asarray(x)
    y = jnp.asarray(f + noise * rng.standard_normal(n))
    return x, y


def test_bound_tight_when_z_equals_x():
    # conditioning note (measured): the SE Kxx at n=120 is numerically
    # rank-deficient (cond ~ 1e300 unregularized), so the z = x solves
    # need jitter ~1e-8 and the bound is tight to ~1e-4; Matern-3/2
    # (cond ~ 1e10) is tight to ~2e-4 even at jitter 1e-10
    from gaussian_processes_tpu.models.matern import Matern32Kernel

    x, y = _data(120)
    s = 0.1
    k = GaussianKernel(1.3, 0.7)
    exact = log_marginal_likelihood(k, x, y, s)
    post = fit_sgpr(k, x, y, s, x, jitter=1e-8)
    # tight to ~0.05 nats of 77 — and strictly from below (it's a bound;
    # the eigh clamp can only lower it)
    assert abs(float(post.log_marginal) - float(exact)) < 0.1
    assert float(post.log_marginal) < float(exact) + 1e-6
    assert float(post.trace_gap) < 1e-3

    km = Matern32Kernel(1.3, 0.7)
    exact_m = log_marginal_likelihood(km, x, y, s)
    post_m = fit_sgpr(km, x, y, s, x, jitter=1e-10)
    assert abs(float(post_m.log_marginal) - float(exact_m)) < 1e-3


def test_predictions_match_dense_when_z_equals_x():
    x, y = _data(150)
    k = GaussianKernel(1.1, 0.6)
    s = 0.15
    dense = fit(k, x, y, s)
    xo = jnp.linspace(-2.0, 2.0, 60)
    m_d, v_d = predict_diag(dense, xo)
    post = fit_sgpr(k, x, y, s, x, jitter=1e-8)
    m_s, v_s = predict_sgpr(post, xo)
    np.testing.assert_allclose(m_s, m_d, atol=1e-3)
    np.testing.assert_allclose(v_s, v_d, atol=1e-3)
    # full covariance path agrees with the diag path on its diagonal
    m_c, C = predict_sgpr_cov(post, xo)
    np.testing.assert_allclose(m_c, m_s, atol=1e-12)
    np.testing.assert_allclose(jnp.diagonal(C), v_s, atol=1e-8)


def test_elbo_is_a_lower_bound():
    x, y = _data(180, seed=3)
    k = GaussianKernel(1.0, 0.5)
    s = 0.2
    exact = float(log_marginal_likelihood(k, x, y, s))
    for seed in range(5):
        key = jax.random.PRNGKey(seed)
        z = inducing_subset(key, x, 25)
        b = float(elbo_sgpr(k, x, y, s, z))
        assert b <= exact + 1e-6, (b, exact)


def test_blocked_accumulation_matches_dense():
    # small n, tiny block size: many blocks + padding; compare against
    # the naive full-matrix computation of the same bound
    x, y = _data(97)
    k = GaussianKernel(0.9, 0.45)
    s = 0.12
    z = inducing_grid(x, 17)
    post = fit_sgpr(k, x, y, s, z, block_size=16, jitter=1e-8)

    Kuf = k(z, x)
    Kuu = k(z, z) + 1e-8 * jnp.eye(17, dtype=x.dtype)
    L = jnp.linalg.cholesky(Kuu)
    A = jax.scipy.linalg.solve_triangular(L, Kuf, lower=True) / s
    B = jnp.eye(17, dtype=x.dtype) + A @ A.T
    LB = jnp.linalg.cholesky(B)
    c = jax.scipy.linalg.solve_triangular(LB, A @ y, lower=True) / s
    n = x.shape[0]
    trace_gap = jnp.sum(k.kdiag(x)) - s**2 * jnp.trace(A @ A.T)
    elbo = (
        -0.5 * n * np.log(2 * np.pi)
        - jnp.sum(jnp.log(jnp.diagonal(LB)))
        - 0.5 * n * np.log(s**2)
        - 0.5 * jnp.dot(y, y) / s**2
        + 0.5 * jnp.dot(c, c)
        - 0.5 * trace_gap / s**2
    )
    # pinv truncation vs the reference's jitter-Cholesky whitening:
    # equal to ~1e-9 (different regularizations of the same bound)
    np.testing.assert_allclose(float(post.log_marginal), float(elbo),
                               rtol=1e-7)
    # post.c lives in the eigenbasis of AA^T; ||c||^2 is basis-invariant
    np.testing.assert_allclose(
        float(jnp.dot(post.c, post.c)), float(jnp.dot(c, c)), rtol=1e-9
    )
    # the LU-based differentiable objective agrees with the eigh path
    np.testing.assert_allclose(
        float(elbo_sgpr(k, x, y, s, z, block_size=16, jitter=1e-8)),
        float(post.log_marginal), rtol=1e-7,
    )


def test_bound_gradient_matches_finite_differences():
    x, y = _data(90, seed=5)
    k = GaussianKernel(1.2, 0.55)
    z = inducing_grid(x, 12)

    def f(u):
        kern = GaussianKernel(jnp.exp(u[0]), jnp.exp(u[1]))
        return elbo_sgpr(kern, x, y, jnp.exp(u[2]), z + u[3])

    u0 = jnp.asarray([0.2, -0.5, -2.0, 0.0])
    g = jax.grad(f)(u0)
    eps = 1e-6
    # the z-shift component (i=3) carries the truncated-pinv
    # approximation: psd_pinv's VJP is exact only at locally-constant
    # retained subspace, and moving z rotates directions across the
    # sqrt(eps) cutoff (measured: ~3% deviation vs 0.1% for the
    # hyperparameters).  HMC correctness is unaffected (acceptance uses
    # the value; the gradient only shapes proposals) and MLE optima
    # shift within the test's existing 8% gates.
    tols = [5e-3, 5e-3, 5e-3, 5e-2]
    for i in range(4):
        e = jnp.zeros(4).at[i].set(eps)
        fd = (f(u0 + e) - f(u0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=tols[i],
                                   atol=1e-7)


def test_mle_on_bound_recovers_dense_optimum():
    # enough inducing points that the bound is essentially tight, so the
    # SGPR optimum must land on the dense MLE optimum
    x, y = _data(150, seed=7)
    k0 = GaussianKernel(0.5, 1.5)
    z = inducing_grid(x, 60)
    post, losses = fit_sgpr_mle(k0, x, y, 0.3, z, num_steps=300,
                                learning_rate=0.05)
    assert float(losses[-1]) < float(losses[0])
    from gaussian_processes_tpu.inference.mle import fit_mle
    dense = fit_mle(k0, x, y, 0.3, num_steps=200)
    # hyperparameters within a few percent of the dense optimum
    np.testing.assert_allclose(
        np.asarray(post.kernel.params), np.asarray(dense.kernel.params),
        rtol=0.08,
    )
    np.testing.assert_allclose(float(post.noise), float(dense.noise),
                               rtol=0.08)


def test_learn_inducing_tightens_bound():
    x, y = _data(160, seed=11)
    k = GaussianKernel(1.0, 0.5)
    z0 = inducing_subset(jax.random.PRNGKey(0), x, 8)
    b0 = float(elbo_sgpr(k, x, y, 0.1, z0))
    post, _ = fit_sgpr_mle(
        GaussianKernel(1.0, 0.5), x, y, 0.1, z0,
        learn_inducing=True, num_steps=150, learning_rate=0.03,
    )
    # moving z (and theta) must beat the frozen-z bound at init
    assert float(post.log_marginal) > b0


def test_kmeans_beats_random_subset_coverage():
    rng = np.random.default_rng(2)
    # two well-separated clumps: random subsets often miss coverage
    x = jnp.asarray(
        np.concatenate([rng.normal(-3, 0.2, 150), rng.normal(3, 0.2, 150)])
    )
    y = jnp.sin(x)
    k = GaussianKernel(1.0, 0.3)
    key = jax.random.PRNGKey(0)
    z_km = kmeans_inducing(key, x, 10, iters=10)
    gap_km = float(fit_sgpr(k, x, y, 0.1, z_km).trace_gap)
    gaps_sub = [
        float(fit_sgpr(
            k, x, y, 0.1, inducing_subset(jax.random.PRNGKey(s), x, 10)
        ).trace_gap)
        for s in range(5)
    ]
    assert gap_km <= np.median(gaps_sub) + 1e-9


def test_select_inducing_dispatch_and_shapes():
    x, _ = _data(50)
    key = jax.random.PRNGKey(1)
    assert select_inducing(key, x, 7, "subset").shape == (7,)
    assert select_inducing(key, x, 7, "grid").shape == (7,)
    assert select_inducing(key, x, 7, "kmeans").shape == (7,)
    with pytest.raises(ValueError):
        select_inducing(key, x, 7, "nope")
    # D-dim kmeans
    x2 = jnp.asarray(np.random.default_rng(0).normal(size=(80, 3)))
    assert kmeans_inducing(key, x2, 9).shape == (9, 3)


def test_ard_multidim_inputs():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-2, 2, size=(200, 2)))
    f = np.sin(2 * np.asarray(x[:, 0])) * np.cos(np.asarray(x[:, 1]))
    y = jnp.asarray(f + 0.05 * rng.standard_normal(200))
    k = ARDGaussianKernel(1.0, jnp.asarray([0.6, 0.9]))
    z = kmeans_inducing(jax.random.PRNGKey(0), x, 80)
    post = fit_sgpr(k, x, y, 0.05, z)
    dense = fit(k, x, y, 0.05)
    m_s, v_s = predict_sgpr(post, x[:50])
    m_d, v_d = predict_diag(dense, x[:50])
    # 80 well-placed centers on a smooth 2-D function: close to exact
    np.testing.assert_allclose(m_s, m_d, atol=0.05)
    assert float(jnp.max(jnp.abs(v_s - v_d))) < 0.05


def test_posterior_draws_have_predictive_moments():
    x, y = _data(120)
    k = GaussianKernel(1.0, 0.6)
    z = inducing_grid(x, 30)
    post = fit_sgpr(k, x, y, 0.1, z)
    xo = jnp.linspace(-1.5, 1.5, 25)
    mean, var = predict_sgpr(post, xo)
    draws = sample_sgpr_posterior(post, xo, jax.random.PRNGKey(0), 4000)
    np.testing.assert_allclose(jnp.mean(draws, axis=0), mean, atol=0.05)
    np.testing.assert_allclose(jnp.var(draws, axis=0), var, rtol=0.2,
                               atol=5e-4)


def test_bayes_surrogate_matches_dense_posterior():
    # tight bound (z = dense grid) ⇒ surrogate log posterior == dense one
    from gaussian_processes_tpu.inference.gp_model import (
        make_log_posterior, pack,
    )
    x, y = _data(100, seed=9)
    k = GaussianKernel(1.0, 0.6)
    z = inducing_grid(x, 50)
    lp_s = make_log_posterior_sgpr(GaussianKernel(1.0, 1.0), x, y, z,
                                   jitter=1e-8)
    lp_d = make_log_posterior(GaussianKernel(1.0, 1.0), x, y)
    for seed in range(3):
        u = pack(k, 0.1) + 0.3 * jax.random.normal(
            jax.random.PRNGKey(seed), (3,)
        )
        a, b = float(lp_s(u)), float(lp_d(u))
        assert abs(a - b) < 0.2 + 2e-3 * abs(b), (a, b)


def test_f32_conditioning_stays_healthy():
    # the design claim: only (m, m) factorizations, regularized by I —
    # f32 at moderate scale must not degrade (no CG floor analogue)
    # m sized to the kernel's effective rank (~3*range/lengthscale = 24)
    # and jitter ~1e3*eps_f32*h^2: past that the SE Kuu's spectrum is
    # below f32 resolution and its Cholesky is (rightly) undefined
    x64, y64 = _data(2000, seed=13)
    k32 = GaussianKernel(jnp.float32(1.0), jnp.float32(0.5))
    x32, y32 = x64.astype(jnp.float32), y64.astype(jnp.float32)
    z32 = inducing_grid(x32, 32)
    post32 = fit_sgpr(k32, x32, y32, jnp.float32(0.1), z32, jitter=1e-4)
    k64 = GaussianKernel(1.0, 0.5)
    post64 = fit_sgpr(k64, x64, y64, 0.1, inducing_grid(x64, 32),
                      jitter=1e-4)
    assert np.isfinite(float(post32.log_marginal))
    # f32 bound within ~0.1% of f64 at n=2000 (the conditioning claim)
    rel = abs(float(post32.log_marginal) - float(post64.log_marginal)) / (
        abs(float(post64.log_marginal)) + 1.0
    )
    assert rel < 1e-2, rel
    # f32 solves at kappa(Kuu) ~ 1/jitter = 1e4 keep ~2-3 significant
    # digits — the claim is "healthy" (no NaN/blowup), not f64-exact
    m32, v32 = predict_sgpr(post32, x32[:40])
    m64, v64 = predict_sgpr(post64, x64[:40])
    np.testing.assert_allclose(m32, m64, atol=5e-2)
    np.testing.assert_allclose(v32, v64, atol=5e-2)


def test_fit_mle_sgpr_objective():
    # the inference-layer hook: fit_mle(objective="sgpr") lands near the
    # dense optimum when the inducing set is dense enough
    from gaussian_processes_tpu.inference.mle import fit_mle

    x, y = _data(150, seed=7)
    k0 = GaussianKernel(0.5, 1.5)
    z = inducing_grid(x, 60)
    res_s = fit_mle(k0, x, y, 0.3, num_steps=120, objective="sgpr",
                    inducing=z)
    res_d = fit_mle(k0, x, y, 0.3, num_steps=120)
    np.testing.assert_allclose(
        np.asarray(res_s.kernel.params), np.asarray(res_d.kernel.params),
        rtol=0.08,
    )
    np.testing.assert_allclose(float(res_s.noise), float(res_d.noise),
                               rtol=0.08)
    with pytest.raises(ValueError):
        fit_mle(k0, x, y, 0.3, objective="sgpr")


def test_gradient_finite_with_degenerate_kuu():
    # duplicate inducing points make Kuu exactly singular with TIED zero
    # eigenvalues — the case where differentiating eigh NaNs.  The
    # psd_pinv custom VJP must stay finite and still match the FD
    # gradient of the (truncated) objective.
    x, y = _data(80, seed=21)
    k = GaussianKernel(1.0, 0.5)
    z = jnp.concatenate([inducing_grid(x, 10), inducing_grid(x, 10)])

    def f(u):
        kern = GaussianKernel(jnp.exp(u[0]), jnp.exp(u[1]))
        return elbo_sgpr(kern, x, y, jnp.exp(u[2]), z)

    u0 = jnp.asarray([0.1, -0.6, -2.2])
    v, g = jax.value_and_grad(f)(u0)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-6
    for i in range(3):
        e = jnp.zeros(3).at[i].set(eps)
        fd = (f(u0 + e) - f(u0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=5e-3,
                                   atol=1e-6)
