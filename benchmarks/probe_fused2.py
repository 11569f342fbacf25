"""Isolated on-chip correctness + 65k A/B for the fused Pallas paths.

Part 1 (n=4096, dense-checkable): kernel_jacvec_fused vs explicit
jacobian einsum; kernel_matvec_fused vs dense K @ v.  Isolates the 0.94
grad discrepancy seen in probe_matvec (which ran through a possibly
broken preconditioner — rank 2048 on an effective-rank-~100 kernel).

Part 2 (n=65536): fit_iterative with the round-1 bench parameters
(w = 100 * 2pi / n, jitter=1e-4, rank 2048), fused vs strip matvec,
walls + residuals.  The round-1 strip measurement was 6.35 s at 3.4e-7.

Usage: python benchmarks/probe_fused2.py [part1] [part2]
"""

# allow running as `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import sys
import time

import numpy as np


def part1():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.ops.pairwise import (
        kernel_jacvec_fused,
        kernel_matvec_fused,
    )

    n = 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.sort(rng.uniform(-3.0, 3.0, n)).astype(np.float32)
    )
    v = jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32))
    kernel = GaussianKernel(h=jnp.float32(1.3), w=jnp.float32(0.25))
    s = jnp.float32(0.1)

    K = kernel(x, x) + (s**2) * jnp.eye(n)
    want_mv = jnp.matmul(K, v, precision=jax.lax.Precision.HIGHEST)
    got_mv = kernel_matvec_fused(kernel, x, v, s)
    rel_mv = float(jnp.linalg.norm(got_mv - want_mv) / jnp.linalg.norm(want_mv))
    print(json.dumps({"check": "matvec_fused_vs_dense", "rel": rel_mv}),
          flush=True)

    J = kernel.jacobian(x, x)  # (2, n, n)
    want_jv = jnp.einsum("pnm,mr->pnr", J, v)
    got_jv = kernel_jacvec_fused(kernel, x, v)
    for p in range(2):
        rel = float(
            jnp.linalg.norm(got_jv[p] - want_jv[p])
            / jnp.linalg.norm(want_jv[p])
        )
        print(json.dumps({"check": f"jacvec_fused_vs_dense_p{p}",
                          "rel": rel}), flush=True)


def part2():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.models import iterative_gp
    from gaussian_processes_tpu.ops import pairwise as pw

    n = 65536
    rng = np.random.default_rng(1)
    x0 = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    y0 = (np.sin(2 * x0) + 0.1 * rng.standard_normal(n)).astype(np.float32)
    w = np.float32(100.0 * 2 * np.pi / n)
    kernel = GaussianKernel(h=jnp.float32(1.0), w=jnp.asarray(w))

    for mode in ["fused", "strip"]:
        if mode == "strip":
            orig = pw.supports_fused_matvec
            pw.supports_fused_matvec = lambda *a: False
        try:
            fit_j = jax.jit(lambda xs, ys: iterative_gp.fit_iterative(
                kernel, xs, ys, 0.1, jax.random.key(0),
                num_probes=8, num_iters=150, tol=1e-6, jitter=1e-4,
                block_size=2048, precond_rank=2048,
            ))
            walls = []
            res = None
            for trial in range(3):
                xs = jnp.asarray(
                    x0 * np.float32(1.0 + rng.random() * 1e-4)
                )
                ys = jnp.asarray(y0)
                jax.block_until_ready((xs, ys))
                t0 = time.perf_counter()
                post = fit_j(xs, ys)
                jax.block_until_ready(post.alpha)
                wall = time.perf_counter() - t0
                if trial > 0:
                    walls.append(round(wall, 3))
                    res = float(post.solve_residual)
            print(json.dumps({
                "fit65k_impl": mode, "walls_s": walls,
                "residual": res, "lml": float(post.log_marginal),
            }), flush=True)
        finally:
            if mode == "strip":
                pw.supports_fused_matvec = orig


if __name__ == "__main__":
    args = sys.argv[1:] or ["part1", "part2"]
    if "part1" in args:
        part1()
    if "part2" in args:
        part2()
