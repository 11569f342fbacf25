"""NUTS sampler tests (Tier 0/3, SURVEY.md §5).

The statistical gate: posterior moments of analytically known targets must
match within Monte-Carlo error (BASELINE.json:5 "within Monte-Carlo
error").  Plus unit tests for the adaptation machinery and determinism
(SURVEY.md §6.2: same seed ⇒ identical chains).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu.inference import adaptation as adapt
from gaussian_processes_tpu.inference import (
    init_chain,
    nuts_transition,
    sample_nuts,
)


# ---------------------------------------------------------------------------
# adaptation units
# ---------------------------------------------------------------------------


def test_warmup_schedule_stan_layout():
    s = adapt.build_warmup_schedule(1000)
    in_slow = np.asarray(s["in_slow"])
    window_end = np.asarray(s["window_end"])
    # init buffer 75 and term buffer 50 are step-size-only
    assert not in_slow[:75].any()
    assert not in_slow[950:].any()
    assert in_slow[75:950].all()
    # doubling windows: ends at 99, 149, 249, 449, then the remainder to 949
    assert list(np.nonzero(window_end)[0]) == [99, 149, 249, 449, 949]
    assert np.asarray(s["last"])[999] and not np.asarray(s["last"])[:999].any()


def test_warmup_schedule_short_collapses_to_stepsize_only():
    s = adapt.build_warmup_schedule(100)
    assert not np.asarray(s["in_slow"]).any()
    assert not np.asarray(s["window_end"]).any()


def test_welford_matches_numpy():
    rng = np.random.default_rng(0)
    xs = rng.standard_normal((40, 3))
    st = adapt.welford_init(3, jnp.float64)
    for i in range(0, 40, 8):
        st = adapt.welford_update_batch(st, jnp.asarray(xs[i : i + 8]))
    np.testing.assert_allclose(np.asarray(st.mean), xs.mean(0), rtol=1e-12)
    var = adapt.welford_variance(st, regularize=False)
    np.testing.assert_allclose(np.asarray(var), xs.var(0, ddof=1), rtol=1e-12)


def test_welford_merge_exact():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((13, 2))
    b = rng.standard_normal((29, 2))
    sa = adapt.welford_update_batch(adapt.welford_init(2, jnp.float64), jnp.asarray(a))
    sb = adapt.welford_update_batch(adapt.welford_init(2, jnp.float64), jnp.asarray(b))
    m = adapt.welford_merge(sa, sb)
    allx = np.concatenate([a, b])
    np.testing.assert_allclose(np.asarray(m.mean), allx.mean(0), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(adapt.welford_variance(m, regularize=False)),
        allx.var(0, ddof=1),
        rtol=1e-12,
    )


def test_dual_averaging_moves_toward_target():
    st = adapt.da_init(0.5)
    # consistently too-high acceptance -> step size should grow
    for _ in range(50):
        st = adapt.da_update(st, jnp.asarray(0.99))
    assert float(jnp.exp(st.log_avg_step)) > 0.5
    st = adapt.da_init(0.5)
    for _ in range(50):
        st = adapt.da_update(st, jnp.asarray(0.1))
    assert float(jnp.exp(st.log_avg_step)) < 0.5


# ---------------------------------------------------------------------------
# transition invariants
# ---------------------------------------------------------------------------


def _mvn_logprob(cov):
    prec = jnp.linalg.inv(jnp.asarray(cov))

    def lp(z):
        return -0.5 * z @ prec @ z

    return lp


def test_transition_moves_and_is_deterministic():
    lp = _mvn_logprob(np.eye(2))
    state = init_chain(lp, jnp.zeros(2, jnp.float64))
    key = jax.random.key(0)
    s1, info1 = nuts_transition(lp, state, key, 0.5, jnp.ones(2), 8)
    s2, info2 = nuts_transition(lp, state, key, 0.5, jnp.ones(2), 8)
    assert not bool(info1.diverging)
    assert float(jnp.sum(jnp.abs(s1.z))) > 0  # moved
    np.testing.assert_array_equal(np.asarray(s1.z), np.asarray(s2.z))
    assert 0.0 <= float(info1.accept_prob) <= 1.0
    assert int(info1.num_leapfrog) >= 1


def test_transition_huge_step_diverges_and_keeps_state_finite():
    lp = _mvn_logprob(np.eye(2))
    state = init_chain(lp, jnp.asarray([3.0, -2.0], jnp.float64))
    s1, info = nuts_transition(lp, state, jax.random.key(1), 1e6, jnp.ones(2), 8)
    assert bool(info.diverging)
    assert np.all(np.isfinite(np.asarray(s1.z)))


# ---------------------------------------------------------------------------
# statistical gates
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0])
def test_correlated_mvn_moments(seed):
    cov = np.array([[2.0, 1.2], [1.2, 1.0]])
    lp = _mvn_logprob(cov)
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    init = 0.1 * jax.random.normal(k1, (8, 2), jnp.float64)
    res = sample_nuts(lp, init, k2, num_warmup=400, num_samples=600, max_depth=8)
    draws = np.asarray(res.positions).reshape(-1, 2)
    n_eff_guess = draws.shape[0] / 4  # conservative ESS discount
    se_mean = np.sqrt(np.diag(cov) / n_eff_guess)
    assert np.all(np.abs(draws.mean(0)) < 4 * se_mean)
    np.testing.assert_allclose(np.cov(draws.T), cov, rtol=0.25, atol=0.1)
    assert float(np.asarray(res.diverging).mean()) < 0.01
    # adapted step size should be sane for a unit-scale target
    assert 0.05 < float(res.step_size) < 5.0


def test_mass_matrix_adaptation_learns_scales():
    # independent dims with very different scales: inv_mass ≈ variances
    var = np.array([100.0, 0.01])

    def lp(z):
        return -0.5 * jnp.sum(z * z / jnp.asarray(var))

    key = jax.random.key(3)
    k1, k2 = jax.random.split(key)
    init = jax.random.normal(k1, (4, 2), jnp.float64)
    res = sample_nuts(lp, init, k2, num_warmup=600, num_samples=400, max_depth=8)
    inv_mass = np.asarray(res.inv_mass)
    assert 20 < inv_mass[0] / inv_mass[1] < 50000  # learned the 1e4 ratio ballpark
    draws = np.asarray(res.positions).reshape(-1, 2)
    np.testing.assert_allclose(draws.var(0), var, rtol=0.35)


def test_sampler_deterministic_given_key():
    lp = _mvn_logprob(np.eye(2))
    init = jnp.zeros((2, 2), jnp.float64)
    r1 = sample_nuts(lp, init, jax.random.key(7), num_warmup=50, num_samples=30, max_depth=6)
    r2 = sample_nuts(lp, init, jax.random.key(7), num_warmup=50, num_samples=30, max_depth=6)
    np.testing.assert_array_equal(np.asarray(r1.positions), np.asarray(r2.positions))


def test_chunked_scans_bit_identical():
    # chunk_size splits device executions without changing semantics
    from gaussian_processes_tpu.inference.nuts import collect, warmup

    lp = _mvn_logprob(np.eye(2))
    init = jnp.zeros((3, 2), jnp.float64)
    s1 = warmup(lp, init, jax.random.key(0), 37, max_depth=5)
    s2 = warmup(lp, init, jax.random.key(0), 37, max_depth=5, chunk_size=10)
    np.testing.assert_array_equal(np.asarray(s1.chains.z), np.asarray(s2.chains.z))
    r1 = collect(lp, s1, 23, max_depth=5)
    r2 = collect(lp, s2, 23, max_depth=5, chunk_size=7)
    np.testing.assert_array_equal(
        np.asarray(r1.positions), np.asarray(r2.positions)
    )
