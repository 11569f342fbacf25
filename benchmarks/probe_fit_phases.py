"""Phase breakdown of the exact-GP fit at large N (probe protocol).

Times four nested jitted programs on fresh input values every call
(anti-caching nonce per program, see probe_chol3.py for the tunnel
pathology this defends against):

    build          K = K_f(x,x) + (s^2+jitter) I
    build+chol     L = choose_cholesky(n)(K)
    build+chol+solve   alpha = L^-T L^-1 y        (two 1-RHS TRSMs)
    fit            full fit() incl. log-marginal assembly

Successive differences of the medians give per-phase device time with the
shared dispatch floor cancelled.  Usage:

    python benchmarks/probe_fit_phases.py [n]
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
    from jax.scipy.linalg import solve_triangular

    from gaussian_processes_tpu import GaussianKernel, fit
    from gaussian_processes_tpu.models.gp import build_kxx
    from gaussian_processes_tpu.ops.blocked_cholesky import choose_cholesky

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    NONCE = float(int(uuid.uuid4()) % 1000003) * 1e-30
    kernel = GaussianKernel(h=1.0, w=1.0)
    noise = jnp.float32(0.1)

    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    y0 = (np.sin(2 * x0) + 0.1 * rng.standard_normal(n)).astype(np.float32)

    chol = choose_cholesky(n)

    def p_build(x, y):
        K = build_kxx(kernel, x, noise, 1e-6)
        return jnp.sum(K) + jnp.sum(y) + NONCE

    def p_chol(x, y):
        K = build_kxx(kernel, x, noise, 1e-6)
        L = chol(K)
        return jnp.sum(L) + jnp.sum(y) + NONCE

    def p_solve(x, y):
        K = build_kxx(kernel, x, noise, 1e-6)
        L = chol(K)
        a = solve_triangular(L.T, solve_triangular(L, y, lower=True),
                             lower=False)
        return jnp.sum(L) + jnp.sum(a) + NONCE

    def p_fit(x, y):
        post = fit(kernel, x, y, noise, jitter=1e-6)
        return jnp.sum(post.L) + jnp.sum(post.alpha) + post.log_marginal + NONCE

    scales = 1.0 + np.random.default_rng().random(64) * 1e-3
    si = iter(scales)
    meds = {}
    for name, fn in [("build", p_build), ("chol", p_chol),
                     ("solve", p_solve), ("fit", p_fit)]:
        jfn = jax.jit(fn)
        walls = []
        for i in range(4):
            s = np.float32(next(si))
            x = jnp.asarray(x0 * s)
            y = jnp.asarray(y0 * s)
            jax.block_until_ready(x)
            t0 = time.perf_counter()
            out = jfn(x, y)
            jax.block_until_ready(out)
            w = (time.perf_counter() - t0) * 1e3
            if i > 0:
                walls.append(round(w, 1))
        meds[name] = float(np.median(walls))
        print(json.dumps({"phase": name, "n": n, "walls_ms": walls,
                          "median_ms": meds[name]}), flush=True)

    print(json.dumps({
        "n": n,
        "delta_chol_ms": round(meds["chol"] - meds["build"], 1),
        "delta_solve_ms": round(meds["solve"] - meds["chol"], 1),
        "delta_lml_ms": round(meds["fit"] - meds["solve"], 1),
        "build_incl_floor_ms": round(meds["build"], 1),
    }), flush=True)


if __name__ == "__main__":
    main()
