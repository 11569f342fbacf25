"""Chip run of the chunked analytic log-lh Hessian at large n
(VERDICT r2 item 7 / r3 weak #7).

Three measurements on the real chip, f32:

1. n=4096 — a size BOTH assemblies reach: chunked-vs-dense agreement
   (the CPU equality gate is tests/test_gp.py; this repeats it on the
   chip's arithmetic) plus both walls.
2. n=8192 — chunked only: the dense (P+1, P+1, n, n) stack would be
   9 * 8192^2 * 4 B = 2.4 GB of pure Hessian stack on top of the
   solves' workspace; the chunked path holds one (n, n) slice.
3. n=16384 — chunked only (the r2 OOM scale: dense stack ~9.6 GB).

Timing protocol: fetch-synchronized (bench.py round-3 rules), fresh
input values per call, dispatch floor archived alongside.
"""

# allow running as `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.models import gp as gpmod

    def fetch(v):
        return float(jnp.sum(v))

    # dispatch+fetch floor
    tiny = jax.jit(lambda a: jnp.sum(a * 1.000001))
    z = jnp.ones((8, 8), jnp.float32)
    fetch(tiny(z))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(tiny(z))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    def problem(n, seed):
        rng = np.random.default_rng(seed)
        x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
        y = (np.sin(2 * x) + 0.1 * rng.standard_normal(n)).astype(np.float32)
        return jnp.asarray(x), jnp.asarray(y)

    kernel = GaussianKernel(h=jnp.asarray(1.0, jnp.float32),
                            w=jnp.asarray(0.8, jnp.float32))

    def hess_fn(force):
        def f(x, y):
            # the production prep: one factorization (log_marginal_all)
            L, alpha, lml, inv_K, J = gpmod._grad_pieces(
                kernel, x, y, 0.1, 1e-6)
            if force == "chunked":
                return gpmod._hessian_from_pieces_chunked(
                    kernel, x, 0.1, alpha, inv_K, J, L.dtype)
            return gpmod._hessian_from_pieces(
                kernel, x, 0.1, alpha, inv_K, J, L.dtype)
        return jax.jit(f)

    # --- n=4096: agreement + both walls
    n = 4096
    x, y = problem(n, 0)
    fc = hess_fn("chunked")
    fd = hess_fn("dense")
    Hc = fc(x, y)
    Hd = fd(x, y)
    agree = float(jnp.max(jnp.abs(Hc - Hd)) / jnp.max(jnp.abs(Hd)))
    walls = {}
    for name, f in (("chunked", fc), ("dense", fd)):
        ts = []
        for rep in range(3):
            xr, yr = problem(n, 10 + rep)  # fresh values (tunnel replay)
            t0 = time.perf_counter()
            fetch(f(xr, yr))
            ts.append(time.perf_counter() - t0)
        walls[name] = float(np.median(ts))
    print(json.dumps({
        "metric": f"hessian_agreement_n{n}_float32",
        "rel_disagreement": agree,
        "wall_chunked": round(walls["chunked"], 4),
        "wall_dense": round(walls["dense"], 4),
        "floor": round(floor, 4),
    }), flush=True)

    # --- n=8192 and 16384: chunked only
    for n in (8192, 16384):
        x, y = problem(n, 1)
        f = hess_fn("chunked")
        H = f(x, y)
        finite = bool(jnp.all(jnp.isfinite(H)))
        ts = []
        for rep in range(3):
            xr, yr = problem(n, 20 + rep)
            t0 = time.perf_counter()
            fetch(f(xr, yr))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"hessian_chunked_n{n}_float32_wall",
            "value": round(float(np.median(ts)) - floor, 4),
            "unit": "s",
            "wall_raw": round(float(np.median(ts)), 4),
            "floor": round(floor, 4),
            "finite": finite,
            "H00": float(H[0, 0]),
        }), flush=True)


if __name__ == "__main__":
    main()
