"""Checkpoint / resume tests (SURVEY.md §6.4).

The gate: run warmup + 2k collection == run warmup + 1k, checkpoint to
disk, reload, collect 1k more — bit-identical draws.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu import GaussianKernel
from gaussian_processes_tpu.inference import make_log_posterior
from gaussian_processes_tpu.inference.nuts import collect, warmup
from gaussian_processes_tpu.utils import load_pytree, save_pytree
from gaussian_processes_tpu.utils import testing as tu


def _posterior(n=20, seed=0):
    rng = np.random.default_rng(seed)
    x, y = tu.make_xy(rng, n=n)
    k0 = GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(1.0))
    return make_log_posterior(k0, x, y, prior_std=1.5)


def test_resume_invariance(tmp_path):
    log_post = _posterior()
    init = jnp.log(jnp.broadcast_to(jnp.asarray([1.0, 1.0, 0.2]), (4, 3)))
    state = warmup(log_post, init, jax.random.key(0), num_warmup=60, max_depth=6)

    # one continuous run of 40
    full = collect(log_post, state, 40, max_depth=6)

    # 20, checkpoint to disk, reload, 20 more
    first = collect(log_post, state, 20, max_depth=6)
    path = str(tmp_path / "sampler.npz")
    save_pytree(path, first.final)
    restored = load_pytree(path, like=first.final)
    second = collect(log_post, restored, 20, max_depth=6)

    np.testing.assert_array_equal(
        np.asarray(full.positions[:20]), np.asarray(first.positions)
    )
    np.testing.assert_array_equal(
        np.asarray(full.positions[20:]), np.asarray(second.positions)
    )


def test_pytree_roundtrip_preserves_dtypes_and_keys(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": (jnp.asarray(3, jnp.int32), jax.random.key(42)),
    }
    path = str(tmp_path / "t.npz")
    save_pytree(path, tree)
    out = load_pytree(path, like=tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(tree["a"]))
    assert out["a"].dtype == jnp.float32
    assert int(out["b"][0]) == 3
    # keys must produce identical randomness
    np.testing.assert_array_equal(
        np.asarray(jax.random.normal(out["b"][1], (4,))),
        np.asarray(jax.random.normal(tree["b"][1], (4,))),
    )


def test_load_wrong_structure_raises(tmp_path):
    path = str(tmp_path / "t.npz")
    save_pytree(path, {"a": jnp.zeros(3)})
    try:
        load_pytree(path, like={"a": jnp.zeros(3), "b": jnp.zeros(2)})
    except ValueError as e:
        assert "leaves" in str(e)
    else:
        raise AssertionError("expected ValueError")
