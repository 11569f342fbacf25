"""On-chip probe: Toeplitz/FFT path vs strip matvec at large N (grid data).

Sections (probe protocol — fresh input values, on-device value checks):
  1. single matvec A/B at n (strip vs FFT), r right-hand sides
  2. end-to-end fit_iterative at n: strip+pivchol vs toeplitz+circulant
  3. (optional n2) toeplitz fit at a size the strip path can't touch

Usage: python benchmarks/probe_toeplitz.py [n] [r] [n2]
"""

# allow running as `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import sys
import time
import uuid

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel, fit_iterative
    from gaussian_processes_tpu.ops import krylov, toeplitz

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    n2 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    NONCE = float(int(uuid.uuid4()) % 1000003) * 1e-30

    w = max(100.0 * 2 * np.pi / n, 1e-3)
    kern = GaussianKernel(h=jnp.float32(1.0), w=jnp.float32(w))
    x0 = np.linspace(-np.pi, np.pi, n).astype(np.float32)
    rng = np.random.default_rng(0)
    v0 = rng.standard_normal((n, r)).astype(np.float32)

    def probe(jfn, inputs, tag):
        walls = []
        val = None
        for i, a in enumerate(inputs):
            jax.block_until_ready(a)
            t0 = time.perf_counter()
            out = jfn(*a)
            jax.block_until_ready(out)
            wl = (time.perf_counter() - t0) * 1e3
            if i > 0:
                walls.append(round(wl, 1))
                val = out
        print(json.dumps({"probe": tag, "n": n, "walls_ms": walls,
                          "median_ms": float(np.median(walls))}), flush=True)
        return val

    def mk_inputs(k=4):
        outs = []
        for _ in range(k):
            s = np.float32(1.0 + rng.random() * 1e-3)
            outs.append((jnp.asarray(x0), jnp.asarray(v0 * s)))
        return outs

    @jax.jit
    def mv_strip(x, v):
        return jnp.sum(krylov.kernel_matvec(
            kern, x, v, 0.1, 1e-4, block_size=2048)) + NONCE

    @jax.jit
    def mv_fft(x, v):
        return jnp.sum(toeplitz.kernel_matvec_toeplitz(
            kern, x, v, 0.1, 1e-4)) + NONCE

    a = probe(mv_strip, mk_inputs(), f"matvec_strip_r{r}")
    b = probe(mv_fft, mk_inputs(), f"matvec_toeplitz_r{r}")
    print(json.dumps({"matvec_agree_rel": float(
        abs(a - b) / (abs(a) + 1e-30))}), flush=True)

    # --- end-to-end fits -------------------------------------------------
    y0 = (np.sin(50 * x0) + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def fit_inputs(k=3):
        outs = []
        for _ in range(k):
            s = np.float32(1.0 + rng.random() * 1e-3)
            outs.append((jnp.asarray(x0), jnp.asarray(y0 * s)))
        return outs

    @jax.jit
    def fit_strip(x, y):
        p = fit_iterative(kern, x, y, 0.1, jax.random.key(0),
                          num_probes=8, num_iters=150, tol=1e-6,
                          jitter=1e-4, block_size=2048, precond_rank=2048)
        return p.log_marginal + NONCE, p.solve_residual

    @jax.jit
    def fit_toep(x, y):
        p = fit_iterative(kern, x, y, 0.1, jax.random.key(0),
                          num_probes=8, num_iters=150, tol=1e-6,
                          jitter=1e-4, structure="toeplitz")
        return p.log_marginal + NONCE, p.solve_residual

    for tag, jfn in [("fit_strip_pivchol", fit_strip),
                     ("fit_toeplitz_circulant", fit_toep)]:
        walls, lml, res = [], None, None
        for i, a_ in enumerate(fit_inputs()):
            jax.block_until_ready(a_)
            t0 = time.perf_counter()
            lml, res = jfn(*a_)
            jax.block_until_ready(lml)
            wl = time.perf_counter() - t0
            if i > 0:
                walls.append(round(wl, 3))
        print(json.dumps({"probe": tag, "n": n, "walls_s": walls,
                          "median_s": float(np.median(walls)),
                          "lml": float(lml), "residual": float(res)}),
              flush=True)

    if n2:
        x2 = np.linspace(-np.pi, np.pi, n2).astype(np.float32)
        y2 = (np.sin(200 * x2) + 0.1 * rng.standard_normal(n2)).astype(
            np.float32)
        w2 = max(100.0 * 2 * np.pi / n2, 1e-4)
        kern2 = GaussianKernel(h=jnp.float32(1.0), w=jnp.float32(w2))

        @jax.jit
        def fit_big(x, y):
            p = fit_iterative(kern2, x, y, 0.1, jax.random.key(0),
                              num_probes=8, num_iters=200, tol=1e-6,
                              jitter=1e-4, structure="toeplitz")
            return p.log_marginal + NONCE, p.solve_residual

        walls = []
        for i in range(3):
            s = np.float32(1.0 + rng.random() * 1e-3)
            a_ = (jnp.asarray(x2), jnp.asarray(y2 * s))
            jax.block_until_ready(a_)
            t0 = time.perf_counter()
            lml, res = fit_big(*a_)
            jax.block_until_ready(lml)
            wl = time.perf_counter() - t0
            if i > 0:
                walls.append(round(wl, 3))
        print(json.dumps({"probe": "fit_toeplitz_big", "n": n2,
                          "walls_s": walls,
                          "median_s": float(np.median(walls)),
                          "lml": float(lml), "residual": float(res)}),
              flush=True)


if __name__ == "__main__":
    main()
