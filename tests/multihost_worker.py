"""Worker for the fake-two-process jax.distributed test (SURVEY.md §5
Tier 2, VERDICT r1 item 4).

Launched twice by tests/test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set and 2 virtual CPU devices per
process.  Exercises the real ``initialize_cluster`` bring-up branch
(parallel/multihost.py), a pooled-adaptation mini sharded-NUTS run over
the 4-device global mesh, and a host-sharded checkpoint write.

Usage: python multihost_worker.py <output-base.npz>
"""

import sys

import numpy as np


def main(out_base: str) -> None:
    from gaussian_processes_tpu.parallel.multihost import (
        host_checkpoint_path,
        initialize_cluster,
        is_primary,
    )

    info = initialize_cluster()
    assert info["initialized"], f"bring-up branch did not run: {info}"
    assert info["process_count"] == 2, info
    assert info["global_devices"] == 4, info

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.inference import (
        init_positions,
        make_log_posterior,
    )
    from gaussian_processes_tpu.parallel import sample_nuts_sharded

    mesh = Mesh(np.asarray(jax.devices()), ("chain",))

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, 24))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(24)
    k0 = GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(1.0))
    log_post = make_log_posterior(k0, x, y, prior_std=1.5)

    k1, k2 = jax.random.split(jax.random.key(0))
    # identical on both processes; assembled into one global sharded array
    init_host = np.asarray(init_positions(k0, 0.2, k1, n_chains=8, spread=0.3))
    sharding = NamedSharding(mesh, P("chain", None))
    init_global = jax.make_array_from_callback(
        init_host.shape, sharding, lambda idx: init_host[idx]
    )

    res = sample_nuts_sharded(
        log_post, init_global, k2, mesh=mesh,
        num_warmup=20, num_samples=10, max_depth=5,
    )

    # each process sees only its addressable chain shards
    shards = sorted(
        res.positions.addressable_shards, key=lambda s: s.index[1].start or 0
    )
    local_pos = np.concatenate([np.asarray(s.data) for s in shards], axis=1)
    assert np.all(np.isfinite(local_pos)), "non-finite draws"
    assert local_pos.shape == (10, 4, 3), local_pos.shape  # half the chains

    # pooled adaptation state is replicated: every host sees the scalar
    step_size = float(res.step_size)
    assert np.isfinite(step_size) and step_size > 0

    path = host_checkpoint_path(out_base)
    np.savez(path, positions=local_pos, step_size=step_size,
             process_index=info["process_index"])
    # host-sharded read-back
    back = np.load(path)
    assert back["positions"].shape == local_pos.shape
    if is_primary():
        print("PRIMARY_OK", flush=True)
    print(f"WORKER_OK {info['process_index']} step={step_size:.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
