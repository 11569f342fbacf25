"""SKI / KISS-GP tests (scattered inputs through an inducing grid).

Gates, mirroring the Toeplitz suite on the structure ops/ski.py adds:
the sparse W apply/adjoint vs dense W; the O(n + m log m) matvec vs the
densely assembled W K_g W^T (exact to FFT round-off in f64); adjointness
<Wa, b> = <a, W^T b>; fit/grad through ``structure=SKIOperator`` vs the
dense exact GP as the grid refines; and the gradient vs the analytic
dense gradient (the SKI surrogate's own gradient must converge too).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import (
    GaussianKernel,
    Matern32Kernel,
    fit,
    fit_iterative,
    log_marginal_value_and_grad,
    log_marginal_value_and_grad_iterative,
    predict_diag,
    predict_diag_iterative,
)
from gaussian_processes_tpu.ops import ski, toeplitz


def _scattered(n, lo=-2.0, hi=2.0, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.sort(rng.uniform(lo, hi, n)))


def _dense_W(op):
    """(n, m) dense interpolation matrix from the sparse (idx, w) form."""
    n, m = op.n, op.m
    W = np.zeros((n, m))
    idx = np.asarray(op.idx)
    w = np.asarray(op.w)
    for j in range(4):
        W[np.arange(n), idx + j] += w[:, j]
    return W


def test_grid_covers_data_with_margin():
    x = _scattered(100)
    g = np.asarray(ski.make_grid(x, 64))
    dx = g[1] - g[0]
    np.testing.assert_allclose(np.diff(g), dx, rtol=1e-12)
    assert g[1] <= float(jnp.min(x)) and g[-3] >= float(jnp.max(x))
    with pytest.raises(ValueError):
        ski.make_grid(x, 4)


def test_cubic_weights_partition_of_unity_and_quadratic_exactness():
    t = jnp.linspace(0.0, 1.0, 33, dtype=jnp.float64)[:-1]
    w = ski._cubic_weights(t)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-14)
    # Keys a=-1/2 reproduces quadratics: interpolate f(u) = u^2 exactly
    x = _scattered(200, seed=3)
    op = ski.interpolation_weights(x, ski.make_grid(x, 128))
    f = jnp.square(op.grid)
    got = ski.interp_matvec(op, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.square(x)),
                               atol=1e-10)


def test_interp_apply_and_adjoint_match_dense_W():
    x = _scattered(150, seed=1)
    op = ski.interpolation_weights(x, ski.make_grid(x, 96))
    W = _dense_W(op)
    rng = np.random.default_rng(2)
    vg = jnp.asarray(rng.standard_normal((op.m, 3)))
    vn = jnp.asarray(rng.standard_normal((op.n, 3)))
    np.testing.assert_allclose(np.asarray(ski.interp_matvec(op, vg)), W @ np.asarray(vg), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ski.interp_rmatvec(op, vn)), W.T @ np.asarray(vn), atol=1e-12)
    # adjointness and 1-D paths
    a = jnp.asarray(rng.standard_normal(op.m))
    b = jnp.asarray(rng.standard_normal(op.n))
    lhs = float(jnp.dot(ski.interp_matvec(op, a), b))
    rhs = float(jnp.dot(a, ski.interp_rmatvec(op, b)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


@pytest.mark.parametrize("kernel", [
    GaussianKernel(h=1.2, w=0.4),
    Matern32Kernel(h=0.9, w=0.6),
], ids=lambda k: type(k).__name__)
def test_ski_matvec_matches_dense_assembly(kernel):
    x = _scattered(171, seed=4)
    op = ski.interpolation_weights(x, ski.make_grid(x, 101))
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((op.n, 3)))
    A = np.asarray(ski.ski_dense(kernel, op)) + 0.3 * np.eye(op.n)
    want = A @ np.asarray(v)
    got = ski.kernel_matvec_ski(kernel, op, v, noise=jnp.sqrt(0.3 - 1e-4),
                                jitter=1e-4)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


def test_ski_approximation_refines_to_exact_kernel():
    kernel = GaussianKernel(h=1.0, w=0.5)
    x = _scattered(120, seed=6)
    K = np.asarray(kernel(x, x))
    errs = []
    for m in (32, 64, 128, 256):
        op = ski.interpolation_weights(x, ski.make_grid(x, m))
        errs.append(np.max(np.abs(np.asarray(ski.ski_dense(kernel, op)) - K)))
    assert errs[-1] < 1e-5, errs
    assert errs[0] > errs[-1] * 10, errs  # actually refining


def test_fit_iterative_ski_matches_dense():
    kernel = GaussianKernel(h=1.0, w=0.35)
    n = 300
    x = _scattered(n, seed=7)
    rng = np.random.default_rng(8)
    y = jnp.asarray(np.sin(2 * np.asarray(x)) + 0.1 * rng.standard_normal(n))
    op = ski.interpolation_weights(x, ski.make_grid(x, 512))

    post = fit_iterative(kernel, x, y, 0.3, jax.random.key(0),
                         num_probes=32, num_iters=300, tol=1e-11,
                         jitter=1e-8, structure=op)
    dense = fit(kernel, x, y, 0.3, jitter=1e-8)
    assert float(post.solve_residual) < 1e-8
    np.testing.assert_allclose(np.asarray(post.alpha),
                               np.asarray(dense.alpha), atol=2e-4)
    # lml: SLQ MC error + SKI surrogate bias, both small at this m
    assert abs(float(post.log_marginal) - float(dense.log_marginal)) \
        < 0.01 * abs(float(dense.log_marginal)) + 2.0

    xo = jnp.linspace(-1.8, 1.8, 50, dtype=x.dtype)
    mean_i, var_i = predict_diag_iterative(
        post, xo, num_iters=300, tol=1e-11, jitter=1e-8, structure=op)
    mean_d, var_d = predict_diag(dense, xo)
    np.testing.assert_allclose(np.asarray(mean_i), np.asarray(mean_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_d), atol=2e-4)


def test_value_and_grad_ski_matches_dense():
    kernel = GaussianKernel(h=1.0, w=0.4)
    n = 250
    x = _scattered(n, seed=9)
    rng = np.random.default_rng(10)
    y = jnp.asarray(np.sin(2 * np.asarray(x)) + 0.1 * rng.standard_normal(n))
    op = ski.interpolation_weights(x, ski.make_grid(x, 512))

    lml_s, g_s = log_marginal_value_and_grad_iterative(
        kernel, x, y, 0.3, jax.random.key(1),
        num_probes=64, num_iters=300, tol=1e-11, jitter=1e-8, structure=op)
    lml_a, g_a = log_marginal_value_and_grad(kernel, x, y, 0.3, jitter=1e-8)
    assert abs(float(lml_s) - float(lml_a)) < 0.02 * abs(float(lml_a)) + 2.0
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_a),
                               rtol=0.3, atol=0.5)


def test_ski_grad_is_gradient_of_ski_surrogate():
    """The Hutchinson gradient must differentiate the SURROGATE (W K_g W^T),
    not the exact kernel: check against finite differences of the exact
    lml of the densely assembled SKI matrix (converged solves, many
    probes, f64 => tight-ish)."""
    kernel = GaussianKernel(h=0.9, w=0.5)
    n = 150
    x = _scattered(n, seed=11)
    rng = np.random.default_rng(12)
    y_np = np.sin(2 * np.asarray(x)) + 0.1 * rng.standard_normal(n)
    y = jnp.asarray(y_np)
    # coarse grid => the surrogate differs measurably from the exact K
    op = ski.interpolation_weights(x, ski.make_grid(x, 32))

    def dense_surrogate_lml(h, w, s):
        k = GaussianKernel(h=jnp.float64(h), w=jnp.float64(w))
        A = np.asarray(ski.ski_dense(k, op)) + (s * s + 1e-8) * np.eye(n)
        sign, logdet = np.linalg.slogdet(A)
        alpha = np.linalg.solve(A, y_np)
        return -0.5 * y_np @ alpha - 0.5 * logdet - 0.5 * n * np.log(2 * np.pi)

    _, g = log_marginal_value_and_grad_iterative(
        kernel, x, y, 0.3, jax.random.key(2),
        num_probes=128, num_iters=400, tol=1e-12, jitter=1e-8, structure=op)
    eps = 1e-5
    th = np.array([0.9, 0.5, 0.3])
    fd = np.zeros(3)
    for p in range(3):
        tp, tm = th.copy(), th.copy()
        tp[p] += eps
        tm[p] -= eps
        fd[p] = (dense_surrogate_lml(*tp) - dense_surrogate_lml(*tm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=0.2, atol=0.3)
