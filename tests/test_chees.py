"""ChEES-HMC tests: the same statistical gates as NUTS plus
trajectory-length adaptation sanity."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu.inference.chees import sample_chees


def _mvn_logprob(cov):
    prec = jnp.linalg.inv(jnp.asarray(cov))

    def lp(z):
        return -0.5 * z @ prec @ z

    return lp


def test_correlated_mvn_moments():
    cov = np.array([[2.0, 1.2], [1.2, 1.0]])
    lp = _mvn_logprob(cov)
    k1, k2 = jax.random.split(jax.random.key(0))
    init = 0.1 * jax.random.normal(k1, (16, 2), jnp.float64)
    res = sample_chees(lp, init, k2, num_warmup=400, num_samples=500)
    draws = np.asarray(res.positions).reshape(-1, 2)
    se = np.sqrt(np.diag(cov) / (draws.shape[0] / 8))
    assert np.all(np.abs(draws.mean(0)) < 4 * se)
    np.testing.assert_allclose(np.cov(draws.T), cov, rtol=0.3, atol=0.15)
    acc = float(np.asarray(res.accept_prob).mean())
    assert 0.4 < acc < 0.95  # adapted toward 0.651
    assert float(res.traj_length) > 0
    assert float(np.asarray(res.diverging).mean()) < 0.01


def test_traj_length_adapts_to_correlation_ridge():
    # a diagonal mass matrix cannot precondition a rho=0.99 ridge, so the
    # ChEES-optimal trajectory is much longer there than for an isotropic
    # target; the adapted T must reflect that (measured: ~0.35 vs ~8)
    def run(rho, seed):
        cov = np.array([[1.0, rho], [rho, 1.0]])
        lp = _mvn_logprob(cov)
        k1, k2 = jax.random.split(jax.random.key(seed))
        init = 0.1 * jax.random.normal(k1, (16, 2), jnp.float64)
        res = sample_chees(lp, init, k2, num_warmup=400, num_samples=200,
                           init_traj_length=0.5)
        draws = np.asarray(res.positions).reshape(-1, 2)
        np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.15)
        return float(res.traj_length)

    t_iso = run(0.0, 1)
    t_ridge = run(0.99, 1)
    assert t_ridge > 4 * t_iso


def test_deterministic_and_chunked():
    lp = _mvn_logprob(np.eye(2))
    init = jnp.zeros((4, 2), jnp.float64)
    r1 = sample_chees(lp, init, jax.random.key(7), num_warmup=50, num_samples=40)
    r2 = sample_chees(lp, init, jax.random.key(7), num_warmup=50, num_samples=40)
    np.testing.assert_array_equal(np.asarray(r1.positions), np.asarray(r2.positions))
    r3 = sample_chees(lp, init, jax.random.key(7), num_warmup=50, num_samples=40,
                      chunk_size=16)
    np.testing.assert_array_equal(np.asarray(r1.positions), np.asarray(r3.positions))


@pytest.mark.slow
def test_gp_hyperposterior_agrees_with_nuts():
    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.inference import (
        init_positions,
        make_log_posterior,
        sample_nuts,
    )
    from gaussian_processes_tpu.utils import testing as tu

    rng = np.random.default_rng(0)
    x, y = tu.make_xy(rng, n=30)
    k0 = GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(1.0))
    log_post = make_log_posterior(k0, x, y, prior_std=1.5)
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    init = init_positions(k0, 0.2, k1, n_chains=8, spread=0.3)

    chees = sample_chees(log_post, init, k2, num_warmup=300, num_samples=400)
    nuts = sample_nuts(log_post, init, k3, num_warmup=300, num_samples=400,
                       max_depth=8)
    cd = np.asarray(chees.positions).reshape(-1, 3)
    nd = np.asarray(nuts.positions).reshape(-1, 3)
    assert np.all(np.isfinite(cd))
    # same posterior within Monte-Carlo error
    assert np.all(np.abs(cd.mean(0) - nd.mean(0)) < 4 * nd.std(0) / np.sqrt(150))
    np.testing.assert_allclose(cd.std(0), nd.std(0), rtol=0.4)
