"""Sampler checkpoint / resume.

The reference has no checkpointing (SURVEY.md §6.4 — objects are cheap to
rebuild); multi-host NUTS runs here are long-lived, so the sampler carry
(chain states, adaptation state, RNG key, draws so far) — one pytree — is
persisted with plain ``np.savez`` per host.  Deliberately orbax-free: the
state is megabytes, not terabytes, and a flat-leaf npz with a structure
manifest is transparent and dependency-light.

Resume invariance (run 2k = run 1k + resume 1k) is enforced by
tests/test_checkpoint.py (SURVEY.md §6.4).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _key_to_raw(leaf):
    """Typed PRNG keys are not npz-serializable; store raw key data."""
    if isinstance(leaf, jax.Array) and jax.dtypes.issubdtype(
        leaf.dtype, jax.dtypes.prng_key
    ):
        return np.asarray(jax.random.key_data(leaf)), True
    return np.asarray(leaf), False


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree of arrays (incl. PRNG keys) to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {}
    is_key = []
    for i, leaf in enumerate(leaves):
        arr, k = _key_to_raw(leaf)
        arrays[f"leaf_{i}"] = arr
        is_key.append(k)
    arrays["__manifest__"] = np.frombuffer(
        json.dumps({"n": len(leaves), "is_key": is_key}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic: no torn checkpoints on preemption


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by ``save_pytree``; ``like`` supplies structure."""
    leaves_like, treedef = jax.tree.flatten(like)
    with np.load(path) as data:
        manifest = json.loads(bytes(data["__manifest__"]).decode())
        n = manifest["n"]
        if n != len(leaves_like):
            raise ValueError(
                f"checkpoint has {n} leaves, template has {len(leaves_like)}"
            )
        leaves = []
        for i, (raw_is_key, leaf_like) in enumerate(
            zip(manifest["is_key"], leaves_like)
        ):
            arr = data[f"leaf_{i}"]
            if raw_is_key:
                leaves.append(jax.random.wrap_key_data(jax.numpy.asarray(arr)))
            else:
                dtype = getattr(leaf_like, "dtype", arr.dtype)
                leaves.append(jax.numpy.asarray(arr, dtype=dtype))
    return jax.tree.unflatten(treedef, leaves)
