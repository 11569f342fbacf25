"""Measure the CPU reference: f64 SE kernel build + LAPACK Cholesky.

This is the denominator for BASELINE.json:5's "faster than CPU reference
by 100x" target — the reference library's hot path (Cython elementwise
kernel build + numpy/scipy dpotrf, SURVEY.md §4.1) reproduced with
vectorized numpy (an upper bound on the reference's own speed: the Cython
loops are single-threaded; BLAS gets host threads here).

Writes benchmarks/cpu_baseline.json.  Run once per machine:
    env -u PALLAS_AXON_POOL_IPS python benchmarks/cpu_baseline.py [Ns...]
"""

import json
import os
import sys
import time

import numpy as np
import scipy.linalg as sla


def measure(n: int, iters: int = 2) -> dict:
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    h, w, s = 1.0, 1.0, 0.1

    best_build = best_chol = best_solve = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        d = x[:, None] - x[None, :]
        K = (h * h) * np.exp(-(d * d) / (2 * w * w))
        K[np.diag_indices_from(K)] += s * s
        t1 = time.perf_counter()
        L = sla.cholesky(K, lower=True)
        t2 = time.perf_counter()
        alpha = sla.cho_solve((L, True), y)
        t3 = time.perf_counter()
        best_build = min(best_build, t1 - t0)
        best_chol = min(best_chol, t2 - t1)
        best_solve = min(best_solve, t3 - t2)
        del d, K, L, alpha
    return {
        "n": n,
        "dtype": "float64",
        "build_s": best_build,
        "cholesky_s": best_chol,
        "solve_s": best_solve,
        "total_s": best_build + best_chol + best_solve,
    }


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [4096, 16384]
    out = {}
    for n in ns:
        r = measure(n)
        out[str(n)] = r
        print(json.dumps(r), flush=True)
    path = os.path.join(os.path.dirname(__file__), "cpu_baseline.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print("wrote", path)
