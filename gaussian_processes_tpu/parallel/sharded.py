"""Chain-parallel NUTS over a device mesh.

The reference has no parallelism at all (SURVEY.md §3 "Parallelism &
communication inventory": none).  This module is the TPU-native data/chain
parallel axis required by BASELINE.json:9,11: NUTS chains sharded over a
``jax.sharding.Mesh`` with ``shard_map``, warmup adaptation pooled across
the *entire* chain population via XLA collectives over ICI/DCN —
``pmean`` of acceptance statistics and an exact cross-device Welford merge
(``psum`` of M2 corrections) — so 1024 sharded chains adapt exactly as one
vectorized population (the NCCL/MPI analogue, SURVEY.md §6.8).

Determinism: per-device RNG keys are derived by folding the device's mesh
index into the caller's key, so results at a fixed device count are
reproducible (SURVEY.md §6.2).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_processes_tpu.inference import chees as chees_mod
from gaussian_processes_tpu.inference import nuts as nuts_mod


def make_chain_mesh(n_devices: int | None = None, axis: str = "chain") -> Mesh:
    """1-D mesh over (the first n) local+addressable devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


class ShardedNUTSResult(NamedTuple):
    positions: jax.Array  # (S, C, D) — C = global chain count
    log_probs: jax.Array  # (S, C)
    accept_prob: jax.Array  # (S, C)
    num_leapfrog: jax.Array  # (S, C)
    diverging: jax.Array  # (S, C)
    step_size: jax.Array  # scalar, identical on every device
    inv_mass: jax.Array  # (D,), identical on every device


def _pooled_reducers(axis: str):
    """Cross-device pooling hooks for warmup adaptation.

    With equal per-device chain counts, pmean of local means is the exact
    global mean; the Welford merge adds the between-device mean-shift
    correction to M2 (Chan et al.), so the pooled variance is exactly what
    a single-device run over all chains would compute.
    """

    def reduce_mean(x):
        return lax.pmean(jnp.mean(x), axis)

    def reduce_welford(w):
        mean_g = lax.pmean(w.mean, axis)
        m2_g = lax.psum(w.m2 + w.count * jnp.square(w.mean - mean_g), axis)
        count_g = lax.psum(w.count, axis)
        return type(w)(mean=mean_g, m2=m2_g, count=count_g)

    return reduce_mean, reduce_welford


def sample_nuts_sharded(
    log_prob_fn: Callable,
    init_position: jax.Array,
    key: jax.Array,
    *,
    mesh: Mesh | None = None,
    axis: str = "chain",
    num_warmup: int = 500,
    num_samples: int = 1000,
    **nuts_kwargs,
) -> ShardedNUTSResult:
    """NUTS with chains sharded over ``mesh``'s ``axis``.

    ``init_position`` is the *global* (C, D) chain block; C must divide
    evenly by the mesh axis size.  Semantics match a single-device
    ``sample_nuts`` over all C chains with pooled adaptation (the
    cross-device reductions are exact, not approximate).
    """
    if mesh is None:
        mesh = make_chain_mesh(axis=axis)
    if nuts_kwargs.get("chunk_size") is not None:
        raise ValueError(
            "chunk_size is a host-level dispatch knob and cannot apply "
            "inside shard_map (it would unroll into one giant program); "
            "for shorter sharded executions lower num_warmup/num_samples "
            "per call"
        )
    nuts_kwargs.pop("chunk_size", None)
    n_dev = mesh.shape[axis]
    C = init_position.shape[0]
    if C % n_dev != 0:
        raise ValueError(
            f"device count ({n_dev}) must evenly divide chains ({C})"
        )

    reduce_mean, reduce_welford = _pooled_reducers(axis)

    def local(key, pos_local):
        dev_key = jax.random.fold_in(key, lax.axis_index(axis))
        res = nuts_mod.sample_nuts(
            log_prob_fn,
            pos_local,
            dev_key,
            num_warmup=num_warmup,
            num_samples=num_samples,
            reduce_mean=reduce_mean,
            reduce_welford=reduce_welford,
            **nuts_kwargs,
        )
        return ShardedNUTSResult(
            positions=res.positions,
            log_probs=res.log_probs,
            accept_prob=res.accept_prob,
            num_leapfrog=res.num_leapfrog,
            diverging=res.diverging,
            step_size=res.step_size,
            inv_mass=res.inv_mass,
        )

    out_specs = ShardedNUTSResult(
        positions=P(None, axis, None),
        log_probs=P(None, axis),
        accept_prob=P(None, axis),
        num_leapfrog=P(None, axis),
        diverging=P(None, axis),
        step_size=P(),
        inv_mass=P(None),
    )
    fn = _make_sharded_nuts(local, mesh, axis, out_specs)
    return jax.jit(fn)(key, init_position)


def _make_sharded_nuts(local, mesh, axis, out_specs):
    # check_vma=False: the sampler's while-loop carries mix device-varying
    # chain state with replicated adaptation state, which the static vma
    # checker cannot express; replication of step_size/inv_mass holds by
    # construction (they are pure functions of pmean/psum-pooled stats)
    # and is asserted numerically in tests/test_parallel.py.
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=out_specs,
        check_vma=False,
    )


class ShardedCheesResult(NamedTuple):
    positions: jax.Array  # (S, C, D)
    log_probs: jax.Array
    accept_prob: jax.Array
    num_leapfrog: jax.Array  # (S,) shared across chains/devices
    diverging: jax.Array
    step_size: jax.Array
    traj_length: jax.Array
    inv_mass: jax.Array


def sample_chees_sharded(
    log_prob_fn: Callable,
    init_position: jax.Array,
    key: jax.Array,
    *,
    mesh: Mesh | None = None,
    axis: str = "chain",
    num_warmup: int = 500,
    num_samples: int = 1000,
    **chees_kwargs,
) -> ShardedCheesResult:
    """ChEES-HMC with chains sharded over the mesh.

    The sampler key stays replicated so every device integrates the same
    jittered trajectory length each iteration (the algorithm requires a
    common step count); per-chain momenta fold in the device index.  All
    adaptation statistics — acceptance, ChEES gradient, Welford moments —
    pool exactly across the population via collectives.
    """
    if mesh is None:
        mesh = make_chain_mesh(axis=axis)
    if chees_kwargs.get("chunk_size") is not None:
        raise ValueError("chunk_size does not apply inside shard_map")
    chees_kwargs.pop("chunk_size", None)
    n_dev = mesh.shape[axis]
    C = init_position.shape[0]
    if C % n_dev != 0:
        raise ValueError(
            f"device count ({n_dev}) must evenly divide chains ({C})"
        )

    reduce_mean, reduce_welford = _pooled_reducers(axis)

    def reduce_vec_mean(x):
        return lax.pmean(jnp.mean(x, axis=0), axis)

    def local(key, pos_local):
        res = chees_mod.sample_chees(
            log_prob_fn,
            pos_local,
            key,  # shared on purpose: common trajectory jitter
            num_warmup=num_warmup,
            num_samples=num_samples,
            reduce_mean=reduce_mean,
            reduce_welford=reduce_welford,
            reduce_vec_mean=reduce_vec_mean,
            shard_axis=axis,
            **chees_kwargs,
        )
        return ShardedCheesResult(
            positions=res.positions,
            log_probs=res.log_probs,
            accept_prob=res.accept_prob,
            num_leapfrog=res.num_leapfrog,
            diverging=res.diverging,
            step_size=res.step_size,
            traj_length=res.traj_length,
            inv_mass=res.inv_mass,
        )

    out_specs = ShardedCheesResult(
        positions=P(None, axis, None),
        log_probs=P(None, axis),
        accept_prob=P(None, axis),
        num_leapfrog=P(None),
        diverging=P(None, axis),
        step_size=P(),
        traj_length=P(),
        inv_mass=P(None),
    )
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(fn)(key, init_position)
