"""Driver benchmark: exact-GP fit (kernel build + Cholesky + solve) per chip.

Headline metric (BASELINE.json:2): N=16k kernel-build+Cholesky wall-clock
on one TPU chip, reported as speedup over the CPU reference
(benchmarks/cpu_baseline.json, measured on this host by
benchmarks/cpu_baseline.py — the reference library's f64 numpy/LAPACK hot
path, SURVEY.md §8).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 16384))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel, fit

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, N)).astype(DTYPE)
    y = (np.sin(2 * x) + 0.1 * rng.standard_normal(N)).astype(DTYPE)
    kernel = GaussianKernel(h=jnp.asarray(1.0, DTYPE), w=jnp.asarray(1.0, DTYPE))

    # jitter keeps the f32 factorization of the near-low-rank SE matrix
    # well-posed at large N (SURVEY.md §7 M3 numerics)
    fit_j = jax.jit(lambda k, x, y: fit(k, x, y, 0.1, jitter=1e-4))

    out = fit_j(kernel, x, y)  # compile
    jax.block_until_ready(out)
    assert bool(jnp.isfinite(out.log_marginal)), "non-finite log marginal"

    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fit_j(kernel, x, y)
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    wall = min(walls)

    vs = None
    base_path = os.path.join(os.path.dirname(__file__), "benchmarks", "cpu_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get(str(N))
        if ref:
            vs = ref["total_s"] / wall

    print(json.dumps({
        "metric": f"exact_gp_fit_n{N}_{DTYPE}_wall",
        "value": round(wall, 6),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
