"""Data-sharded SGPR (parallel/sgpr_sharded.py) on the 8-device mesh.

Gates: sharded fit/elbo == single-device to psum reduction order
(~1e-11 rel measured in f64; gated at 1e-9); gradients flow (MLE parity
step-for-step vs the unsharded Adam loop); learn_inducing works sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu.models.gaussian import GaussianKernel
from gaussian_processes_tpu.models.sgpr import (
    elbo_sgpr,
    fit_sgpr,
    fit_sgpr_mle,
    inducing_grid,
)
from gaussian_processes_tpu.parallel.sgpr_sharded import (
    elbo_sgpr_sharded,
    fit_sgpr_mle_sharded,
    fit_sgpr_sharded,
)
from gaussian_processes_tpu.parallel.iterative_sharded import make_row_mesh


def _data(n=512, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(np.sort(rng.uniform(-2.0, 2.0, n)))
    y = jnp.asarray(
        np.sin(3.0 * np.asarray(x)) + 0.1 * rng.standard_normal(n)
    )
    return x, y


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    return make_row_mesh(8)


def test_sharded_fit_matches_single_device(mesh):
    x, y = _data(512)
    k = GaussianKernel(1.0, 0.5)
    z = inducing_grid(x, 24)
    ps = fit_sgpr_sharded(k, x, y, 0.1, z, mesh=mesh, block_size=32)
    p1 = fit_sgpr(k, x, y, 0.1, z, block_size=32)
    np.testing.assert_allclose(
        float(ps.log_marginal), float(p1.log_marginal), rtol=1e-8
    )
    # c/V_B live in AAT's eigenbasis, which rotates freely inside
    # near-degenerate eigenvalue clusters — compare basis-invariant
    # quantities and predictions instead of raw coordinates
    np.testing.assert_allclose(
        float(jnp.dot(ps.c, ps.c)), float(jnp.dot(p1.c, p1.c)), rtol=1e-6
    )
    # individual floored trailing eigenvalues shuffle near the floor
    # boundary; the invariants the bound consumes are what must match
    np.testing.assert_allclose(
        float(jnp.sum(jnp.log1p(ps.lam_B))),
        float(jnp.sum(jnp.log1p(p1.lam_B))), rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(jnp.sum(ps.lam_B)), float(jnp.sum(p1.lam_B)), rtol=1e-6
    )
    # trace_gap is a clamped difference of ~1e3-scale reductions — only
    # its absolute size (here ~1e-6: full coverage) is meaningful
    np.testing.assert_allclose(
        float(ps.trace_gap), float(p1.trace_gap), atol=1e-5
    )
    from gaussian_processes_tpu.models.sgpr import predict_sgpr
    xo = jnp.linspace(-1.8, 1.8, 40)
    ms, vs = predict_sgpr(ps, xo)
    m1, v1 = predict_sgpr(p1, xo)
    np.testing.assert_allclose(ms, m1, atol=1e-9)
    np.testing.assert_allclose(vs, v1, atol=1e-9)


@pytest.mark.slow
def test_sharded_elbo_and_grad_match(mesh):
    x, y = _data(512, seed=3)
    k0 = GaussianKernel(1.0, 1.0)
    z = inducing_grid(x, 16)

    def f_sh(u):
        kern = GaussianKernel(jnp.exp(u[0]), jnp.exp(u[1]))
        return elbo_sgpr_sharded(kern, x, y, jnp.exp(u[2]), z, mesh=mesh)

    def f_1d(u):
        kern = GaussianKernel(jnp.exp(u[0]), jnp.exp(u[1]))
        return elbo_sgpr(kern, x, y, jnp.exp(u[2]), z)

    u = jnp.asarray([0.1, -0.4, -2.0])
    vs, gs = jax.value_and_grad(f_sh)(u)
    v1, g1 = jax.value_and_grad(f_1d)(u)
    np.testing.assert_allclose(float(vs), float(v1), rtol=1e-8)
    # measured 3e-5 rel: psum reduction order perturbs the moment
    # matrix, and the sqrt(eps)-cutoff boundary amplifies it slightly
    np.testing.assert_allclose(np.asarray(gs), np.asarray(g1),
                               rtol=1e-3, atol=1e-8)


@pytest.mark.slow
def test_sharded_mle_matches_unsharded(mesh):
    x, y = _data(512, seed=5)
    k0 = GaussianKernel(0.6, 1.2)
    z = inducing_grid(x, 16)
    ps, ls = fit_sgpr_mle_sharded(
        k0, x, y, 0.25, z, mesh=mesh, num_steps=40, learning_rate=0.05
    )
    p1, l1 = fit_sgpr_mle(
        k0, x, y, 0.25, z, num_steps=40, learning_rate=0.05
    )
    # identical optimization trajectory up to psum reduction order
    np.testing.assert_allclose(np.asarray(ls), np.asarray(l1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ps.kernel.params), np.asarray(p1.kernel.params),
        rtol=1e-6,
    )


@pytest.mark.slow
def test_sharded_learn_inducing(mesh):
    x, y = _data(256, seed=7)
    k0 = GaussianKernel(1.0, 0.5)
    z0 = inducing_grid(x, 8)
    b0 = float(elbo_sgpr_sharded(k0, x, y, 0.1, z0, mesh=mesh))
    post, _ = fit_sgpr_mle_sharded(
        k0, x, y, 0.1, z0, mesh=mesh, learn_inducing=True,
        num_steps=60, learning_rate=0.03,
    )
    assert float(post.log_marginal) > b0


def test_uneven_shard_raises(mesh):
    x, y = _data(511)
    with pytest.raises(ValueError):
        fit_sgpr_sharded(
            GaussianKernel(1.0, 0.5), x, y, 0.1, inducing_grid(x, 8),
            mesh=mesh,
        )
