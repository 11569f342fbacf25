"""Row-sharded matrix-free inference vs the single-device path.

The sharded implementation (parallel/iterative_sharded.py) runs the
IDENTICAL estimator — same probes (key plumbing mirrored), same CG
recurrence with psum'd column sums, same preconditioner pivots — so on
the 8-device CPU mesh in f64 it must match ``fit_iterative`` to
reduction-order round-off, and the dense oracle to solver tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P

from gaussian_processes_tpu import GaussianKernel, build_kxx
from gaussian_processes_tpu.models.iterative_gp import (
    fit_iterative,
    fit_mle_iterative,
    log_marginal_value_and_grad_iterative,
    predict_mean_iterative,
)
from gaussian_processes_tpu.ops import krylov
from gaussian_processes_tpu.parallel.iterative_sharded import (
    _pivoted_cholesky_sharded,
    fit_iterative_sharded,
    fit_mle_iterative_sharded,
    log_marginal_value_and_grad_iterative_sharded,
    make_row_mesh,
    predict_mean_iterative_sharded,
)
from gaussian_processes_tpu.utils.testing import make_xo, make_xy

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _problem(n=512, seed=0, noise=0.3):
    rng = np.random.default_rng(seed)
    x, y = make_xy(rng, n=n)
    kernel = GaussianKernel(h=jnp.float64(1.2), w=jnp.float64(0.6))
    return kernel, jnp.asarray(x), jnp.asarray(y), noise


def test_fit_sharded_matches_single_device():
    kernel, x, y, s = _problem()
    mesh = make_row_mesh(8)
    key = jax.random.key(7)
    kwargs = dict(num_probes=8, num_iters=200, tol=1e-12)
    ref = fit_iterative(kernel, x, y, s, key, **kwargs)
    got = fit_iterative_sharded(kernel, x, y, s, key, mesh=mesh, **kwargs)
    np.testing.assert_allclose(
        np.asarray(got.alpha), np.asarray(ref.alpha), rtol=1e-9, atol=1e-11
    )
    # identical Rademacher probes => identical SLQ estimate up to
    # reduction order
    np.testing.assert_allclose(
        float(got.log_marginal), float(ref.log_marginal), rtol=1e-9
    )
    # and both solve the true system
    K = build_kxx(kernel, x, s)
    alpha_dense = jnp.linalg.solve(K, y)
    np.testing.assert_allclose(
        np.asarray(got.alpha), np.asarray(alpha_dense), rtol=1e-7, atol=1e-9
    )


@pytest.mark.slow
def test_fit_sharded_preconditioned_matches():
    kernel, x, y, s = _problem()
    mesh = make_row_mesh(8)
    key = jax.random.key(3)
    kwargs = dict(num_probes=8, num_iters=150, tol=1e-12, precond_rank=32)
    ref = fit_iterative(kernel, x, y, s, key, **kwargs)
    got = fit_iterative_sharded(kernel, x, y, s, key, mesh=mesh, **kwargs)
    np.testing.assert_allclose(
        np.asarray(got.alpha), np.asarray(ref.alpha), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        float(got.log_marginal), float(ref.log_marginal), rtol=1e-8
    )


def test_pivoted_cholesky_sharded_matches():
    kernel, x, _, _ = _problem(n=256)
    mesh = make_row_mesh(8)
    rank = 24
    ref = krylov.pivoted_cholesky(kernel, x, rank)

    fn = jax.jit(
        jax.shard_map(
            lambda xl: _pivoted_cholesky_sharded(kernel, xl, rank, "i"),
            mesh=mesh,
            in_specs=(P("i"),),
            out_specs=P("i"),
            check_vma=False,
        )
    )
    got = fn(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-10, atol=1e-12
    )


def test_predict_mean_sharded_matches():
    kernel, x, y, s = _problem()
    mesh = make_row_mesh(8)
    post = fit_iterative(
        kernel, x, y, s, jax.random.key(0), num_probes=4, num_iters=200,
        tol=1e-12,
    )
    xo = jnp.asarray(make_xo(37))  # not a multiple of 8: pad path
    ref = predict_mean_iterative(post, xo)
    got = predict_mean_iterative_sharded(post, xo, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-9, atol=1e-11
    )


def test_value_and_grad_sharded_matches():
    kernel, x, y, s = _problem()
    mesh = make_row_mesh(8)
    key = jax.random.key(11)
    kwargs = dict(num_probes=8, num_iters=200, tol=1e-12)
    ref_lml, ref_g = log_marginal_value_and_grad_iterative(
        kernel, x, y, s, key, **kwargs
    )
    got_lml, got_g = log_marginal_value_and_grad_iterative_sharded(
        kernel, x, y, s, key, mesh=mesh, **kwargs
    )
    np.testing.assert_allclose(float(got_lml), float(ref_lml), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(ref_g), rtol=1e-8, atol=1e-10
    )


def test_value_and_grad_sharded_preconditioned():
    kernel, x, y, s = _problem()
    mesh = make_row_mesh(8)
    key = jax.random.key(5)
    kwargs = dict(num_probes=8, num_iters=150, tol=1e-12)
    ref_lml, ref_g = log_marginal_value_and_grad_iterative(
        kernel, x, y, s, key, precond_rank=32, **kwargs
    )
    got_lml, got_g = log_marginal_value_and_grad_iterative_sharded(
        kernel, x, y, s, key, mesh=mesh, precond_rank=32, **kwargs
    )
    np.testing.assert_allclose(float(got_lml), float(ref_lml), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(got_g), np.asarray(ref_g), rtol=1e-7, atol=1e-9
    )


def test_mle_sharded_matches_single_device():
    # identical per-step keys + f64 => the Adam trajectories agree to
    # reduction-order round-off compounded over the steps
    kernel, x, y, _ = _problem(n=256, seed=4)
    mesh = make_row_mesh(8)
    key = jax.random.key(9)
    kwargs = dict(
        num_steps=5, learning_rate=0.05, num_probes=4, num_iters=150,
        tol=1e-12,
    )
    k_ref, s_ref, lml_ref, _ = fit_mle_iterative(
        kernel, x, y, 0.4, key, **kwargs
    )
    k_got, s_got, lml_got, trace = fit_mle_iterative_sharded(
        kernel, x, y, 0.4, key, mesh=mesh, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(k_got.params), np.asarray(k_ref.params), rtol=1e-6
    )
    np.testing.assert_allclose(float(s_got), float(s_ref), rtol=1e-6)
    np.testing.assert_allclose(lml_got, lml_ref, rtol=1e-6)
    assert len(trace) == 5


def test_sharded_matvec_is_global_matvec():
    # the rectangular strip building block: row shard of K v + diagonal
    kernel, x, _, s = _problem(n=256)
    mesh = make_row_mesh(8)
    v = jnp.asarray(np.random.default_rng(2).standard_normal((256, 3)))
    K = build_kxx(kernel, x, s, jitter=1e-8)
    from gaussian_processes_tpu.parallel.iterative_sharded import (
        _sharded_matvec,
    )

    def local(x_full, x_loc, v_loc):
        mv = _sharded_matvec(
            kernel, x_full, x_loc, jnp.float64(s), 1e-8, 64, "i"
        )
        return mv(v_loc)

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=(P(), P("i"), P("i")),
            out_specs=P("i"), check_vma=False,
        )
    )
    got = fn(x, x, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(K @ v), rtol=1e-10, atol=1e-12
    )
