"""Data-sharded Bayesian sampling vs the single-device surrogate path.

The data-sharded ChEES sampler (parallel/bayes_sharded.py) runs the SAME
algorithm as ``sample_chees`` over ``make_log_posterior_iterative``'s
surrogate — same frozen probes (key plumbing mirrored), same jitter and
momentum keys (no device folding when ``chain_axis=None``), same
adaptation updates.  Two kinds of gates:

* pointwise: the sharded surrogate's (value, grad) equals the unsharded
  surrogate's at arbitrary positions to reduction-order round-off — the
  strong statement, horizon-free;
* trajectory: short sampler runs agree chain-for-chain.  These must stay
  SHORT — Hamiltonian dynamics are chaotic, so the ~1e-12 reduction-order
  difference grows exponentially with leapfrog count and no tolerance
  survives tens of steps (measured: identical at 3 steps, O(1) apart by
  16).  The 2-D (chain × data) layout is likewise gated against the
  chain-sharded sampler of ``parallel/sharded.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import GaussianKernel
from gaussian_processes_tpu.inference.chees import sample_chees
from gaussian_processes_tpu.inference.gp_model import (
    init_positions,
    make_log_posterior_iterative,
)
from gaussian_processes_tpu.parallel.bayes_sharded import (
    make_bayes_mesh,
    sample_chees_iterative_sharded,
)
from gaussian_processes_tpu.parallel.iterative_sharded import make_row_mesh
from gaussian_processes_tpu.parallel.sharded import (
    make_chain_mesh,
    sample_chees_sharded,
)
from gaussian_processes_tpu.utils.testing import make_xy

pytestmark = [
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
    ),
    # slow tier (VERDICT r2 item 8): ~6 min on 4 host cores; `make
    # test-all` / CI
    pytest.mark.slow,
]

PK = jax.random.key(42)


def _problem(n=256, seed=0):
    rng = np.random.default_rng(seed)
    x, y = make_xy(rng, n=n)
    kernel = GaussianKernel(h=jnp.float64(1.2), w=jnp.float64(0.6))
    return kernel, jnp.asarray(x), jnp.asarray(y)


SOLVER = dict(num_probes=4, num_iters=80, tol=1e-14, prior_std=1.5)
# parity horizon: ~1e-8 pointwise (reduction-order) differences in the
# surrogate grad grow exponentially through the leapfrog dynamics and can
# flip a Metropolis accept by step ~3 — so trajectory-parity runs stay at
# 2 warmup + 1 collect (measured bit-tight there), and longer-horizon
# correctness is carried by the pointwise + chunk-identity gates plus the
# single-device statistical gates (tests/test_iterative_posterior.py).
RUN = dict(num_warmup=2, num_samples=1, init_step_size=0.05,
           init_traj_length=0.3, max_leapfrog=64)
LONG_RUN = dict(num_warmup=6, num_samples=6, init_step_size=0.05,
                init_traj_length=0.3, max_leapfrog=64)


def _ref_result(kernel, x, y, init, key):
    log_post = make_log_posterior_iterative(
        kernel, x, y, probe_key=PK, early_exit=False, **SOLVER
    )
    return sample_chees(log_post, init, key, **RUN)


def test_datasharded_log_post_matches_pointwise():
    # horizon-free gate: (value, grad) of the sharded surrogate equals
    # the unsharded surrogate's at arbitrary positions
    from jax.sharding import PartitionSpec as P

    from gaussian_processes_tpu.parallel.bayes_sharded import (
        make_log_posterior_iterative_datasharded,
    )

    kernel, x, y = _problem()
    ref_lp = make_log_posterior_iterative(
        kernel, x, y, probe_key=PK, early_exit=False, **SOLVER
    )
    sur = make_log_posterior_iterative_datasharded(
        kernel, 256, jnp.float64, "i", probe_key=PK, **SOLVER
    )
    mesh = make_row_mesh(8)

    def local(u, x_full, x_loc, y_loc, pr_loc, xi1, xi2_loc):
        lp = sur.make_local(x_full, x_loc, y_loc, pr_loc, xi1, xi2_loc)
        return jax.value_and_grad(lp)(u)

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P("i"), P("i"), P("i"), P(), P("i")),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    for seed in range(3):
        u = jnp.asarray(
            np.random.default_rng(seed).normal(0, 0.3, 3)
        ) + jnp.asarray([0.1, -0.5, -1.5])
        v_ref, g_ref = jax.value_and_grad(ref_lp)(u)
        v_got, g_got = fn(u, x, x, y, sur.probes, sur.xi1, sur.xi2)
        np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-9)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), rtol=1e-8, atol=1e-10
        )


def test_datasharded_matches_single_device():
    kernel, x, y = _problem()
    init = init_positions(kernel, 0.3, jax.random.key(1), n_chains=4,
                          spread=0.2, dtype=jnp.float64)
    key = jax.random.key(2)
    ref = _ref_result(kernel, x, y, init, key)
    got = sample_chees_iterative_sharded(
        kernel, x, y, init, key, mesh=make_row_mesh(8), probe_key=PK,
        **SOLVER, **RUN,
    )
    np.testing.assert_allclose(
        np.asarray(got.positions), np.asarray(ref.positions),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        float(got.step_size), float(ref.step_size), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.inv_mass), np.asarray(ref.inv_mass), rtol=1e-6
    )


def test_datasharded_chunked_is_identical():
    kernel, x, y = _problem()
    init = init_positions(kernel, 0.3, jax.random.key(1), n_chains=4,
                          spread=0.2, dtype=jnp.float64)
    key = jax.random.key(2)
    mesh = make_row_mesh(8)
    a = sample_chees_iterative_sharded(
        kernel, x, y, init, key, mesh=mesh, probe_key=PK, **SOLVER,
        **LONG_RUN,
    )
    b = sample_chees_iterative_sharded(
        kernel, x, y, init, key, mesh=mesh, probe_key=PK, chunk_size=3,
        **SOLVER, **LONG_RUN,
    )
    np.testing.assert_array_equal(
        np.asarray(a.positions), np.asarray(b.positions)
    )


def test_datasharded_preconditioned_matches():
    kernel, x, y = _problem()
    init = init_positions(kernel, 0.3, jax.random.key(1), n_chains=4,
                          spread=0.2, dtype=jnp.float64)
    key = jax.random.key(6)
    log_post = make_log_posterior_iterative(
        kernel, x, y, probe_key=PK, early_exit=False, precond_rank=24,
        **SOLVER,
    )
    ref = sample_chees(log_post, init, key, **RUN)
    got = sample_chees_iterative_sharded(
        kernel, x, y, init, key, mesh=make_row_mesh(8), probe_key=PK,
        precond_rank=24, **SOLVER, **RUN,
    )
    np.testing.assert_allclose(
        np.asarray(got.positions), np.asarray(ref.positions),
        rtol=1e-5, atol=1e-7,
    )


def test_chain_by_data_mesh_matches_chain_sharded():
    # 2-D (2 chain-devices x 4 data-devices) vs the chain-sharded sampler
    # over 2 devices on the unsharded surrogate: the chain-axis index
    # folding and pooled adaptation match device-for-device, so the only
    # difference is the data-axis reduction order.
    kernel, x, y = _problem()
    init = init_positions(kernel, 0.3, jax.random.key(3), n_chains=4,
                          spread=0.2, dtype=jnp.float64)
    key = jax.random.key(4)
    log_post = make_log_posterior_iterative(
        kernel, x, y, probe_key=PK, early_exit=False, **SOLVER
    )
    ref = sample_chees_sharded(
        log_post, init, key, mesh=make_chain_mesh(2), **RUN,
    )
    got = sample_chees_iterative_sharded(
        kernel, x, y, init, key,
        mesh=make_bayes_mesh(2, 4), chain_axis="chain", probe_key=PK,
        **SOLVER, **RUN,
    )
    np.testing.assert_allclose(
        np.asarray(got.positions), np.asarray(ref.positions),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        float(got.step_size), float(ref.step_size), rtol=1e-6
    )
