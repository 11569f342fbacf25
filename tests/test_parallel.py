"""Tier 2 multi-device tests on the 8-device virtual CPU mesh
(SURVEY.md §5: shard_map chain sharding and sharded linalg,
deterministic and cluster-free).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import GaussianKernel, fit, predict_diag
from gaussian_processes_tpu.inference import (
    init_positions,
    make_log_posterior,
    sample_nuts,
)
from gaussian_processes_tpu.parallel import (
    fit_sharded,
    make_chain_mesh,
    make_grid_mesh,
    predict_diag_sharded,
    sample_nuts_sharded,
)
from gaussian_processes_tpu.utils import testing as tu


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _problem(n=24, seed=0):
    rng = np.random.default_rng(seed)
    x, y = tu.make_xy(rng, n=n)
    k0 = GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(1.0))
    return k0, x, y


@pytest.mark.slow
def test_sharded_nuts_runs_and_matches_statistics():
    k0, x, y = _problem()
    log_post = make_log_posterior(k0, x, y, prior_std=1.5)
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    init = init_positions(k0, 0.2, k1, n_chains=16, spread=0.3)

    mesh = make_chain_mesh(8)
    res = sample_nuts_sharded(
        log_post, init, k2, mesh=mesh,
        num_warmup=200, num_samples=200, max_depth=8,
    )
    assert res.positions.shape == (200, 16, 3)
    draws = np.asarray(res.positions).reshape(-1, 3)
    assert np.all(np.isfinite(draws))
    assert float(np.asarray(res.diverging).mean()) < 0.05

    # pooled adaptation must agree with the single-device sampler's
    # statistics on the same problem (not bitwise — different RNG streams)
    ref = sample_nuts(log_post, init, k2, num_warmup=200, num_samples=200, max_depth=8)
    ref_draws = np.asarray(ref.positions).reshape(-1, 3)
    np.testing.assert_allclose(
        draws.mean(0), ref_draws.mean(0), atol=4 * ref_draws.std(0).max() / np.sqrt(100)
    )
    # step size / inv_mass pooled identically across devices -> scalar out
    assert np.isfinite(float(res.step_size))
    assert res.inv_mass.shape == (3,)


def test_sharded_fit_matches_single_device():
    k0, x, y = _problem(n=64)
    mesh = make_grid_mesh(8)  # 2 x 4 grid
    post_s = fit_sharded(k0, x, y, 0.2, mesh, jitter=0.0)
    post = fit(k0, x, y, 0.2)
    np.testing.assert_allclose(
        float(post_s.log_marginal), float(post.log_marginal), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(post_s.alpha), np.asarray(post.alpha), rtol=1e-8
    )

    xo = tu.make_xo(32)
    m_s, v_s = predict_diag_sharded(post_s, xo, mesh)
    m, v = predict_diag(post, xo)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v), rtol=1e-6, atol=1e-10)


def test_sharded_nuts_wrong_chain_count_raises():
    k0, x, y = _problem()
    log_post = make_log_posterior(k0, x, y)
    init = jnp.zeros((10, 3))
    with pytest.raises(ValueError, match="divide"):
        sample_nuts_sharded(log_post, init, jax.random.key(0), mesh=make_chain_mesh(8))


@pytest.mark.slow
def test_sharded_nuts_chunked_bit_identical():
    """Host-level chunking between shard_map dispatches is semantics-free:
    same carry pytree, shorter executions (VERDICT r1 item 3)."""
    k0, x, y = _problem()
    log_post = make_log_posterior(k0, x, y, prior_std=1.5)
    k1, k2 = jax.random.split(jax.random.key(0))
    init = init_positions(k0, 0.2, k1, n_chains=16, spread=0.3)
    mesh = make_chain_mesh(8)
    kw = dict(mesh=mesh, num_warmup=40, num_samples=30, max_depth=6)
    res_mono = sample_nuts_sharded(log_post, init, k2, **kw)
    res_chunk = sample_nuts_sharded(log_post, init, k2, chunk_size=7, **kw)
    np.testing.assert_array_equal(
        np.asarray(res_mono.positions), np.asarray(res_chunk.positions)
    )
    np.testing.assert_array_equal(
        np.asarray(res_mono.final.chains.z), np.asarray(res_chunk.final.chains.z)
    )


@pytest.mark.slow
def test_sharded_nuts_resume_invariance(tmp_path):
    """collect(2k) == collect(1k) + checkpoint + resume collect(1k) on the
    8-device mesh — the sharded-durability gate (SURVEY.md §6.3/§6.4)."""
    from gaussian_processes_tpu.parallel.sharded import (
        collect_nuts_sharded,
        init_nuts_sharded,
        shard_put_nuts,
        warmup_nuts_sharded,
    )
    from gaussian_processes_tpu.utils.checkpoint import load_pytree, save_pytree

    k0, x, y = _problem()
    log_post = make_log_posterior(k0, x, y, prior_std=1.5)
    k1, k2 = jax.random.split(jax.random.key(0))
    init = init_positions(k0, 0.2, k1, n_chains=16, spread=0.3)
    mesh = make_chain_mesh(8)

    state = init_nuts_sharded(log_post, init, k2, mesh=mesh)
    state = warmup_nuts_sharded(log_post, state, 40, mesh=mesh, max_depth=6)

    full = collect_nuts_sharded(log_post, state, 40, mesh=mesh, max_depth=6)

    first = collect_nuts_sharded(log_post, state, 20, mesh=mesh, max_depth=6)
    path = tmp_path / "sharded_nuts.npz"
    save_pytree(str(path), first.final)
    loaded = load_pytree(str(path), like=first.final)
    resumed_state = shard_put_nuts(loaded, mesh)
    second = collect_nuts_sharded(
        log_post, resumed_state, 20, mesh=mesh, max_depth=6
    )

    glued = np.concatenate(
        [np.asarray(first.positions), np.asarray(second.positions)]
    )
    np.testing.assert_array_equal(np.asarray(full.positions), glued)


def test_sharded_chees_resume_invariance(tmp_path):
    from gaussian_processes_tpu.parallel.sharded import (
        collect_chees_sharded,
        init_chees_sharded,
        shard_put_chees,
        warmup_chees_sharded,
    )
    from gaussian_processes_tpu.utils.checkpoint import load_pytree, save_pytree

    k0, x, y = _problem()
    log_post = make_log_posterior(k0, x, y, prior_std=1.5)
    k1, k2 = jax.random.split(jax.random.key(0))
    init = init_positions(k0, 0.2, k1, n_chains=16, spread=0.3)
    mesh = make_chain_mesh(8)

    state = init_chees_sharded(log_post, init, k2, mesh=mesh)
    state = warmup_chees_sharded(log_post, state, 40, mesh=mesh, chunk_size=9)

    full = collect_chees_sharded(log_post, state, 40, mesh=mesh)

    first = collect_chees_sharded(log_post, state, 20, mesh=mesh)
    path = tmp_path / "sharded_chees.npz"
    save_pytree(str(path), first.final)
    loaded = load_pytree(str(path), like=first.final)
    second = collect_chees_sharded(
        log_post, shard_put_chees(loaded, mesh), 20, mesh=mesh
    )

    glued = np.concatenate(
        [np.asarray(first.positions), np.asarray(second.positions)]
    )
    np.testing.assert_array_equal(np.asarray(full.positions), glued)


def test_sharded_chees_runs_and_matches_statistics():
    from gaussian_processes_tpu.inference.chees import sample_chees
    from gaussian_processes_tpu.parallel import sample_chees_sharded

    k0, x, y = _problem()
    log_post = make_log_posterior(k0, x, y, prior_std=1.5)
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    init = init_positions(k0, 0.2, k1, n_chains=16, spread=0.3)
    mesh = make_chain_mesh(8)
    res = sample_chees_sharded(
        log_post, init, k2, mesh=mesh, num_warmup=200, num_samples=200,
    )
    assert res.positions.shape == (200, 16, 3)
    draws = np.asarray(res.positions).reshape(-1, 3)
    assert np.all(np.isfinite(draws))
    ref = sample_chees(log_post, init, k2, num_warmup=200, num_samples=200)
    ref_draws = np.asarray(ref.positions).reshape(-1, 3)
    assert np.all(
        np.abs(draws.mean(0) - ref_draws.mean(0))
        < 4 * ref_draws.std(0).max() / np.sqrt(80)
    )
    assert np.isfinite(float(res.step_size)) and float(res.traj_length) > 0


@pytest.mark.slow
def test_sharded_chees_on_whittle_posterior():
    """The Whittle (circulant-model) posterior composes with chain
    sharding: the FFT log-density is a pure function, so the sharded
    sampler needs nothing new — gate moments against the single-device
    run on the same posterior."""
    from gaussian_processes_tpu.inference import make_log_posterior_whittle
    from gaussian_processes_tpu.inference.chees import sample_chees
    from gaussian_processes_tpu.parallel import sample_chees_sharded

    n = 2048
    x = jnp.asarray(np.arange(n) * (4.0 / n) - 2.0)  # circle closes at 4
    rng = np.random.default_rng(11)
    y = jnp.asarray(np.sin(2 * np.pi * 3 * np.asarray(x) / 4.0)
                    + 0.2 * rng.standard_normal(n))
    k0 = GaussianKernel(h=1.0, w=0.15)
    log_post = make_log_posterior_whittle(k0, x, y, prior_std=1.0,
                                          jitter=1e-8)
    key = jax.random.key(3)
    k1, k2 = jax.random.split(key)
    init = init_positions(k0, 0.2, k1, n_chains=16, spread=0.2)
    mesh = make_chain_mesh(8)
    res = sample_chees_sharded(
        log_post, init, k2, mesh=mesh, num_warmup=150, num_samples=150,
    )
    draws = np.asarray(res.positions).reshape(-1, 3)
    assert np.all(np.isfinite(draws))
    ref = sample_chees(log_post, init, k2, num_warmup=150, num_samples=150)
    ref_draws = np.asarray(ref.positions).reshape(-1, 3)
    assert np.all(
        np.abs(draws.mean(0) - ref_draws.mean(0))
        < 4 * ref_draws.std(0).max() / np.sqrt(60)
    )
