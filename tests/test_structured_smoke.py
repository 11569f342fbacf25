"""Fast-tier smoke coverage of the structured large-N paths.

The full structured-path suites (test_ski, test_kronecker,
test_toeplitz, test_sgpr, test_iterative_posterior, test_bayes_sharded)
are slow-tier: minutes of compile on 4 host cores, run via `make
test-all` / CI.  Without these smokes the default `make test` gate
would not touch those code paths at all (ADVICE r3) — so each path
gets one tiny-n correctness check here, sized to compile + run in
seconds on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu import (
    GaussianKernel,
    fit,
    fit_iterative,
)
from gaussian_processes_tpu.models.ard import ARDGaussianKernel
from gaussian_processes_tpu.ops import kronecker, ski, toeplitz


def _scattered(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.sort(rng.uniform(-2.0, 2.0, n)))


def test_ski_matvec_smoke():
    kernel = GaussianKernel(h=1.2, w=0.5)
    x = _scattered(80, seed=1)
    op = ski.interpolation_weights(x, ski.make_grid(x, 48))
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((op.n, 2)))
    A = np.asarray(ski.ski_dense(kernel, op)) + 0.3 * np.eye(op.n)
    got = ski.kernel_matvec_ski(kernel, op, v, noise=jnp.sqrt(0.3 - 1e-6),
                                jitter=1e-6)
    np.testing.assert_allclose(np.asarray(got), A @ np.asarray(v), atol=1e-8)


def test_ski_kron_matvec_smoke():
    kernel = ARDGaussianKernel(h=jnp.float64(1.1),
                               w=jnp.asarray([0.5, 0.6], jnp.float64))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (60, 2)))
    op = ski.interpolation_weights_nd(
        x, (ski.make_grid(x[:, 0], 16), ski.make_grid(x[:, 1], 14)))
    cols = kronecker.kron_columns(kernel, op.kron)
    v = jnp.asarray(rng.standard_normal((op.n, 2)))
    A = np.asarray(ski.ski_kron_dense(kernel, op)) + 0.25 * np.eye(op.n)
    got = ski.ski_kron_matvec(op, cols, v, 0.25)
    np.testing.assert_allclose(np.asarray(got), A @ np.asarray(v), atol=1e-8)


def test_toeplitz_matvec_smoke():
    kernel = GaussianKernel(h=1.0, w=0.4)
    n = 65  # odd exercises irfft length handling
    x = jnp.linspace(-2.0, 2.0, n)
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.standard_normal((n, 2)))
    want = kernel(x, x) @ v + 0.3 * v
    got = toeplitz.kernel_matvec_toeplitz(
        kernel, x, v, noise=jnp.sqrt(0.3 - 1e-6), jitter=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-8)


def test_sgpr_bound_smoke():
    from gaussian_processes_tpu.models.gp import log_marginal_likelihood
    from gaussian_processes_tpu.models.sgpr import fit_sgpr

    x = _scattered(60, seed=5)
    rng = np.random.default_rng(5)
    y = jnp.asarray(np.sin(2 * np.asarray(x))
                    + 0.1 * rng.standard_normal(60))
    kernel = GaussianKernel(h=1.0, w=0.6)
    exact = float(log_marginal_likelihood(kernel, x, y, 0.1))
    post = fit_sgpr(kernel, x, y, 0.1, x, jitter=1e-8)  # z = x: tight
    assert abs(float(post.log_marginal) - exact) < 0.1
    assert float(post.log_marginal) < exact + 1e-6  # it is a lower bound


def test_fit_iterative_toeplitz_smoke():
    kernel = GaussianKernel(h=1.0, w=0.4)
    n = 96
    x = jnp.linspace(-2.0, 2.0, n)
    rng = np.random.default_rng(6)
    y = jnp.asarray(np.sin(3 * np.asarray(x))
                    + 0.2 * rng.standard_normal(n))
    dense = fit(kernel, x, y, 0.2, jitter=1e-8)
    it = fit_iterative(kernel, x, y, 0.2, jax.random.key(0),
                       num_probes=16, num_iters=120, tol=1e-12,
                       jitter=1e-8, structure="toeplitz")
    np.testing.assert_allclose(np.asarray(it.alpha),
                               np.asarray(dense.alpha), atol=1e-6)
    # SLQ logdet is stochastic and |lml| is only ~3 nats at this tiny n:
    # gate it absolutely (statistical accuracy is the slow tier's job)
    assert abs(float(it.log_marginal) - float(dense.log_marginal)) < 0.5
