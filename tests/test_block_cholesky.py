"""Distributed block-cyclic Cholesky vs the dense single-device path
(SURVEY.md §6.7c).  Runs on the 8-device virtual CPU mesh in f64, so
agreement is at round-off level — the factorization, log-det, solves and
predictive variance must all match ``models.gp.fit`` exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import GaussianKernel, PeriodicKernel, fit, predict_diag
from gaussian_processes_tpu.parallel import (
    fit_blockcyclic,
    make_chain_mesh,
    predict_diag_blockcyclic,
)
from gaussian_processes_tpu.utils import testing as tu

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh():
    return make_chain_mesh(8, axis="shard")


def _data(n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-np.pi, np.pi, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    return x, y


@pytest.mark.parametrize("n,b", [(128, 8), (200, 8), (256, 16)])
def test_blockcyclic_matches_dense(n, b):
    x, y = _data(n)
    kernel = GaussianKernel(h=jnp.asarray(1.2), w=jnp.asarray(0.7))
    mesh = _mesh()
    post_d = fit_blockcyclic(kernel, x, y, 0.2, mesh, block_size=b, jitter=0.0)
    post = fit(kernel, x, y, 0.2)
    np.testing.assert_allclose(
        float(post_d.log_marginal), float(post.log_marginal), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(post_d.alpha), np.asarray(post.alpha), rtol=1e-7, atol=1e-9
    )


def test_blockcyclic_periodic_and_padding():
    # n deliberately not divisible by D*b: exercises identity padding
    x, y = _data(150, seed=3)
    kernel = PeriodicKernel(
        h=jnp.asarray(1.0), w=jnp.asarray(1.0), p=jnp.asarray(0.5)
    )
    mesh = _mesh()
    post_d = fit_blockcyclic(kernel, x, y, 0.15, mesh, block_size=8, jitter=0.0)
    post = fit(kernel, x, y, 0.15)
    np.testing.assert_allclose(
        float(post_d.log_marginal), float(post.log_marginal), rtol=1e-10
    )


def test_blockcyclic_predict_matches_dense():
    x, y = _data(192, seed=1)
    kernel = GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(0.6))
    mesh = _mesh()
    post_d = fit_blockcyclic(kernel, x, y, 0.2, mesh, block_size=8, jitter=0.0)
    post = fit(kernel, x, y, 0.2)
    xo = tu.make_xo(40)
    m_d, v_d = predict_diag_blockcyclic(post_d, xo, mesh)
    m, v = predict_diag(post, xo)
    np.testing.assert_allclose(np.asarray(m_d), np.asarray(m), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_d), np.asarray(v), rtol=1e-6, atol=1e-10)
