"""Micro-benchmark: base-panel Cholesky latency, XLA vs Pallas VMEM.

The blocked factorization's non-matmul overhead is dominated by the
sequential chain of base-panel factorizations; this measures one panel's
latency for each implementation at 256/512 (differenced scan protocol).
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

    from gaussian_processes_tpu.ops.blocked_cholesky import (
        _pallas_chol_tile,
    )

    SHORT, LONG = 4, 20

    def device_time(fn, A_base):
        def make(iters):
            @jax.jit
            def chain(A, eps):
                def step(A, _):
                    L = fn(A)
                    return A + eps * L, jnp.sum(L)
                return lax.scan(step, A, None, length=iters)
            return chain

        c_s, c_l = make(SHORT), make(LONG)
        eps = jnp.asarray(0.0, jnp.float32)
        scales = iter(np.linspace(1.0, 1.001, 64).astype(np.float32))

        def run(c):
            jax.block_until_ready(c(A_base * next(scales), eps))

        run(c_s); run(c_l)
        ts, tl = [], []
        for _ in range(3):
            t0 = time.perf_counter(); run(c_s); ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(c_l); tl.append(time.perf_counter() - t0)
        return (min(tl) - min(ts)) / (LONG - SHORT)

    for B in [256, 512]:
        rng = np.random.default_rng(0)
        X = rng.standard_normal((B, B)).astype(np.float32)
        A = jnp.asarray(X @ X.T + B * np.eye(B, dtype=np.float32))
        t_x = device_time(jnp.linalg.cholesky, A)
        t_p = device_time(lambda A: _pallas_chol_tile(A, interpret=False), A)
        # correctness on chip
        L = _pallas_chol_tile(A, interpret=False)
        rel = float(jnp.linalg.norm(L - jnp.linalg.cholesky(A))
                    / jnp.linalg.norm(L))
        print(json.dumps({"B": B, "xla_us": round(t_x * 1e6, 1),
                          "pallas_us": round(t_p * 1e6, 1),
                          "pallas_rel_err": round(rel, 9)}), flush=True)


if __name__ == "__main__":
    last = None
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            last = e
            print(f"attempt {attempt+1} failed: {e!r}", file=sys.stderr)
            time.sleep(5)
    else:
        raise last
