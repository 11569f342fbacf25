"""Minimal per-call timing probe through the tunnel.

Prints the wall of EVERY call (distinct input values each time) for:
  a) one 8192x8192 HIGH matmul
  b) scan of 4 dependent 8192 HIGH matmuls
  c) checksum difference between calls (catches any result caching)
"""

# allow running as `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    m = 8192
    hi = lax.Precision.HIGH
    rng = np.random.default_rng(0)
    A0 = rng.standard_normal((m, m)).astype(np.float32) / np.sqrt(m)

    @jax.jit
    def one(A):
        return jnp.sum(jnp.matmul(A, A.T, precision=hi))

    @jax.jit
    def four(A, eps):
        def step(A, _):
            B = jnp.matmul(A, A.T, precision=hi)
            return A + eps * B, jnp.sum(B)
        return lax.scan(step, A, None, length=4)

    eps = jnp.asarray(0.0, jnp.float32)
    sums = []
    for i in range(5):
        A = jnp.asarray(A0 * (1.0 + 0.01 * i))
        jax.block_until_ready(A)
        t0 = time.perf_counter()
        s = one(A)
        jax.block_until_ready(s)
        w = time.perf_counter() - t0
        sums.append(float(s))
        print(json.dumps({"call": f"one_{i}", "wall_ms": round(w * 1e3, 2),
                          "sum": float(s)}), flush=True)
    assert len(set(sums)) == len(sums), "identical results for distinct inputs!"

    for i in range(4):
        A = jnp.asarray(A0 * (1.0 + 0.01 * i))
        jax.block_until_ready(A)
        t0 = time.perf_counter()
        out = four(A, eps)
        jax.block_until_ready(out)
        w = time.perf_counter() - t0
        print(json.dumps({"call": f"four_{i}", "wall_ms": round(w * 1e3, 2),
                          "sum": float(out[1][-1])}), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"failed: {e!r}", file=sys.stderr)
        raise
