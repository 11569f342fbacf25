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

# slow tier (VERDICT r2 item 8): structured-path integration minutes; in
# `make test-all` / CI. Default `make test` stays under 10 min.
pytestmark = pytest.mark.slow


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


def _scattered_2d(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1.0, 1.0, (n, 2)))


def _dense_W_nd(op):
    import math

    rows, wts = ski._nd_taps(op)
    rows, wts = np.asarray(rows), np.asarray(wts)
    W = np.zeros((op.n, math.prod(op.kron.shape)))
    for t in range(rows.shape[1]):
        W[np.arange(op.n), rows[:, t]] += wts[:, t]
    return W


def test_ski_nd_interp_matches_dense_W():
    from gaussian_processes_tpu.ops import kronecker

    x = _scattered_2d(80, seed=20)
    op = ski.interpolation_weights_nd(
        x, (ski.make_grid(x[:, 0], 24), ski.make_grid(x[:, 1], 20)))
    W = _dense_W_nd(op)
    np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-12)  # POU
    rng = np.random.default_rng(21)
    m = W.shape[1]
    vg = jnp.asarray(rng.standard_normal((m, 3)))
    vn = jnp.asarray(rng.standard_normal((op.n, 3)))
    np.testing.assert_allclose(np.asarray(ski.interp_matvec_nd(op, vg)),
                               W @ np.asarray(vg), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ski.interp_rmatvec_nd(op, vn)),
                               W.T @ np.asarray(vn), atol=1e-12)
    # quadratic exactness carries over to the tensor-product stencil
    g = kronecker.kron_inputs(op.kron.axes)
    f = jnp.square(g[:, 0]) + 0.5 * g[:, 0] * g[:, 1]
    got = ski.interp_matvec_nd(op, f)
    want = jnp.square(x[:, 0]) + 0.5 * x[:, 0] * x[:, 1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


def test_ski_kron_matvec_matches_dense_assembly():
    from gaussian_processes_tpu import ARDGaussianKernel
    from gaussian_processes_tpu.ops import kronecker

    kernel = ARDGaussianKernel(h=jnp.float64(1.1),
                               w=jnp.asarray([0.4, 0.5], jnp.float64))
    x = _scattered_2d(90, seed=22)
    op = ski.interpolation_weights_nd(
        x, (ski.make_grid(x[:, 0], 28), ski.make_grid(x[:, 1], 24)))
    cols = kronecker.kron_columns(kernel, op.kron)
    rng = np.random.default_rng(23)
    v = jnp.asarray(rng.standard_normal((op.n, 2)))
    A = np.asarray(ski.ski_kron_dense(kernel, op)) + 0.25 * np.eye(op.n)
    got = ski.ski_kron_matvec(op, cols, v, 0.25)
    np.testing.assert_allclose(np.asarray(got), A @ np.asarray(v), atol=1e-9)


def test_fit_and_grad_ski_kron_match_dense_2d():
    from gaussian_processes_tpu import ARDGaussianKernel

    kernel = ARDGaussianKernel(h=jnp.float64(1.0),
                               w=jnp.asarray([0.4, 0.45], jnp.float64))
    n = 250
    x = _scattered_2d(n, seed=24)
    rng = np.random.default_rng(25)
    f = np.sin(2 * np.asarray(x[:, 0])) * np.cos(np.asarray(x[:, 1]))
    y = jnp.asarray(f + 0.1 * rng.standard_normal(n))
    op = ski.interpolation_weights_nd(
        x, (ski.make_grid(x[:, 0], 64), ski.make_grid(x[:, 1], 64)))

    post = fit_iterative(kernel, x, y, 0.3, jax.random.key(0),
                         num_probes=32, num_iters=300, tol=1e-11,
                         jitter=1e-8, structure=op)
    dense = fit(kernel, x, y, 0.3, jitter=1e-8)
    assert float(post.solve_residual) < 1e-8
    np.testing.assert_allclose(np.asarray(post.alpha),
                               np.asarray(dense.alpha), atol=5e-4)
    assert abs(float(post.log_marginal) - float(dense.log_marginal)) \
        < 0.02 * abs(float(dense.log_marginal)) + 4.0

    xo = _scattered_2d(40, seed=26) * 0.8
    mean_i, var_i = predict_diag_iterative(
        post, xo, num_iters=300, tol=1e-11, jitter=1e-8, structure=op)
    mean_d, var_d = predict_diag(dense, xo)
    np.testing.assert_allclose(np.asarray(mean_i), np.asarray(mean_d), atol=5e-4)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_d), atol=5e-4)

    lml_s, g_s = log_marginal_value_and_grad_iterative(
        kernel, x, y, 0.3, jax.random.key(1),
        num_probes=64, num_iters=300, tol=1e-11, jitter=1e-8, structure=op)
    lml_a, g_a = log_marginal_value_and_grad(kernel, x, y, 0.3, jitter=1e-8)
    assert abs(float(lml_s) - float(lml_a)) < 0.02 * abs(float(lml_a)) + 4.0
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


def test_ski_fast_mean_matches_strip_mean():
    from gaussian_processes_tpu.models.iterative_gp import (
        predict_mean_iterative,
    )

    kernel = GaussianKernel(h=1.0, w=0.35)
    n = 200
    x = _scattered(n, seed=30)
    rng = np.random.default_rng(31)
    y = jnp.asarray(np.sin(2 * np.asarray(x)) + 0.1 * rng.standard_normal(n))
    op = ski.interpolation_weights(x, ski.make_grid(x, 256))
    post = fit_iterative(kernel, x, y, 0.3, jax.random.key(0),
                         num_probes=8, num_iters=200, tol=1e-11,
                         jitter=1e-8, structure=op)
    xo = jnp.linspace(-1.5, 1.5, 64, dtype=x.dtype)
    fast = predict_mean_iterative(post, xo, structure=op)
    strip = predict_mean_iterative(post, xo)
    # strip computes K(xo,x) @ alpha exactly; fast computes the SKI
    # surrogate's mean — they agree to the interpolation error
    np.testing.assert_allclose(np.asarray(fast), np.asarray(strip), atol=5e-4)


def test_ski_kron_fast_mean_matches_strip_mean():
    from gaussian_processes_tpu import ARDGaussianKernel
    from gaussian_processes_tpu.models.iterative_gp import (
        predict_mean_iterative,
    )

    kernel = ARDGaussianKernel(h=jnp.float64(1.0),
                               w=jnp.asarray([0.4, 0.45], jnp.float64))
    n = 200
    x = _scattered_2d(n, seed=32)
    rng = np.random.default_rng(33)
    y = jnp.asarray(rng.standard_normal(n) * 0.1
                    + np.sin(2 * np.asarray(x[:, 0])))
    op = ski.interpolation_weights_nd(
        x, (ski.make_grid(x[:, 0], 64), ski.make_grid(x[:, 1], 64)))
    post = fit_iterative(kernel, x, y, 0.3, jax.random.key(0),
                         num_probes=8, num_iters=300, tol=1e-11,
                         jitter=1e-8, structure=op)
    xo = _scattered_2d(50, seed=34) * 0.8
    fast = predict_mean_iterative(post, xo, structure=op)
    strip = predict_mean_iterative(post, xo)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(strip), atol=2e-3)


def test_out_of_range_queries_do_not_explode():
    # extrapolating queries used to keep an unclamped fractional offset
    # t >> 1 where the cubic weights grow polynomially (measured ~1e4
    # one grid-length out); clamped positions snap to the grid edge
    from gaussian_processes_tpu.ops import ski

    grid = ski.make_grid(jnp.asarray([0.0, 1.0]), 64)
    op_in = ski.interpolation_weights(jnp.asarray([2.0, -1.5]), grid)
    # weights stay a partition of unity with bounded magnitude
    np.testing.assert_allclose(np.asarray(op_in.w.sum(axis=1)), 1.0,
                               atol=1e-6)
    assert float(jnp.max(jnp.abs(op_in.w))) < 2.0
