"""Probe: left-looking Cholesky base-panel size sweep at N=16384 f32.

Probe protocol (BASELINE.md round-2): per-call walls on fresh input
values minus the dispatch floor, with an on-device row-sampled
reconstruction check.  Finds the best ``base`` for
ops/blocked_cholesky.py::cholesky_blocked(algo="leftlook").
"""

# allow running as `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time
import uuid

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu.ops.blocked_cholesky import cholesky_blocked

    n = 16384
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    d = x[:, None] - x[None, :]
    A0 = np.exp(-0.5 * d * d) + 0.01 * np.eye(n, dtype=np.float32)
    del d
    nonce = float(int(uuid.uuid4()) % 1000003) * 1e-30

    f0 = jax.jit(lambda a: jnp.sum(a) + nonce)
    floors = []
    for i in range(4):
        a = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        jax.block_until_ready(f0(a))
        if i:
            floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    print(f"dispatch floor: {floor*1e3:.1f} ms", flush=True)

    rows = jnp.asarray(rng.integers(0, n, 64))

    def make(fn):
        def g(A):
            L = fn(A)
            # row-sampled reconstruction check rides along on device
            rec = jnp.matmul(L[rows], L.T, precision=jax.lax.Precision.HIGHEST)
            err = jnp.max(jnp.abs(rec - A[rows])) / jnp.max(jnp.abs(A))
            return jnp.sum(L) + nonce, err
        return jax.jit(g)

    cands = {"xla": jnp.linalg.cholesky}
    for base in (384, 512, 768, 1024):
        cands[f"leftlook{base}"] = (
            lambda A, b=base: cholesky_blocked(A, base=b, algo="leftlook"))
    flops = n ** 3 / 3
    for name, fn in cands.items():
        g = make(fn)
        walls, err = [], None
        for i in range(4):
            A = jnp.asarray(A0 * np.float32(1.0 + rng.random() * 1e-3))
            jax.block_until_ready(A)
            t0 = time.perf_counter()
            out, err = g(A)
            jax.block_until_ready(out)
            if i:
                walls.append(time.perf_counter() - t0)
        w = max(float(np.median(walls)) - floor, 1e-9)
        print(f"{name}: {w*1e3:.1f} ms  ({flops/w/1e12:.1f} Tf/s)  "
              f"recon={float(err):.2e}", flush=True)


if __name__ == "__main__":
    main()
