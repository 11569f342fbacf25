"""Fully Bayesian GP hyperparameters via NUTS (config #3, BASELINE.json:9).

Tier 3 statistical gate (SURVEY.md §5): hyperparameter posterior moments
vs a long-run random-walk Metropolis reference chain over the *identical*
log posterior (f64) — independent sampler, same math, agreement within
Monte-Carlo error.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu import GaussianKernel
from gaussian_processes_tpu.inference import (
    init_positions,
    make_log_posterior,
    sample_nuts,
)
from gaussian_processes_tpu.utils import testing as tu


def _problem(n=30, seed=0):
    rng = np.random.default_rng(seed)
    x, y = tu.make_xy(rng, n=n)
    k0 = GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(1.0))
    log_post = make_log_posterior(k0, x, y, prior_std=1.5)
    return k0, x, y, log_post


def _rwm_reference(log_post, u0, n_steps, seed, scale=0.15):
    """Plain random-walk Metropolis in numpy as an independent oracle."""
    rng = np.random.default_rng(seed)
    lp = jax.jit(log_post)
    u = np.asarray(u0, float)
    cur = float(lp(jnp.asarray(u)))
    draws = np.empty((n_steps, u.size))
    for i in range(n_steps):
        prop = u + scale * rng.standard_normal(u.size)
        new = float(lp(jnp.asarray(prop)))
        if np.log(rng.uniform()) < new - cur:
            u, cur = prop, new
        draws[i] = u
    return draws


@pytest.mark.slow
def test_gp_hyperposterior_moments_match_rwm():
    k0, x, y, log_post = _problem()
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    init = init_positions(k0, 0.2, k1, n_chains=8, spread=0.3)
    res = sample_nuts(
        log_post, init, k2, num_warmup=300, num_samples=400, max_depth=8
    )
    nuts_draws = np.asarray(res.positions).reshape(-1, 3)
    assert np.all(np.isfinite(nuts_draws))
    assert float(np.asarray(res.diverging).mean()) < 0.05

    rwm = _rwm_reference(log_post, np.asarray(init[0]), 20000, seed=1)[5000:]
    # agreement within generous Monte-Carlo error of the RWM chain
    assert np.all(
        np.abs(nuts_draws.mean(0) - rwm.mean(0)) < 4 * rwm.std(0) / np.sqrt(200)
    )
    np.testing.assert_allclose(
        nuts_draws.std(0), rwm.std(0), rtol=0.35
    )


@pytest.mark.slow
def test_nuts_chains_explore_posterior_not_prior():
    # with data, the noise posterior should concentrate well below the
    # prior scale; sanity that the likelihood actually informs the chain
    k0, x, y, log_post = _problem(n=40, seed=2)
    key = jax.random.key(5)
    k1, k2 = jax.random.split(key)
    init = init_positions(k0, 0.2, k1, n_chains=4, spread=0.2)
    res = sample_nuts(log_post, init, k2, num_warmup=200, num_samples=200, max_depth=8)
    draws = np.asarray(res.positions).reshape(-1, 3)
    noise_draws = np.exp(draws[:, 2])
    assert noise_draws.std() < 0.5  # far tighter than the lognormal prior
    assert 0.02 < noise_draws.mean() < 0.6  # near the true 0.1 data noise
