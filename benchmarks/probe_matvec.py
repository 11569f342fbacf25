"""Fused-vs-strip kernel matvec A/B on the chip, probe-style.

Protocol per memory notes: fresh input values every call (the tunnel can
replay identical (program, value) pairs), per-call value verification
between the two implementations, wall sanity floor.  Then an end-to-end
preconditioned 65k fit with the fused matvec (auto-dispatch) against the
round-1 strip-matvec measurement (6.35 s, BASELINE.md).

Usage: python benchmarks/probe_matvec.py [n] [r] [fit65k]
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

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.ops import krylov
    from gaussian_processes_tpu.ops.pairwise import kernel_matvec_fused

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    NONCE = float(int(uuid.uuid4()) % 1000003) * 1e-30

    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-3.0, 3.0, n)).astype(np.float32)
    v0 = rng.standard_normal((n, r)).astype(np.float32)
    kernel = GaussianKernel(h=jnp.float32(1.3), w=jnp.float32(0.25))
    s = jnp.float32(0.1)

    fns = {
        "strip": jax.jit(
            lambda x, v: krylov.kernel_matvec(
                kernel, x, v, s, impl="strip", block_size=2048
            )
            + NONCE
        ),
        "fused": jax.jit(
            lambda x, v: kernel_matvec_fused(kernel, x, v, s) + NONCE
        ),
    }

    outs = {}
    for name, fn in fns.items():
        walls = []
        vals = []
        for i in range(4):
            xs = (x0 * np.float32(1.0 + rng.random() * 1e-3)).copy()
            vs = (v0 * np.float32(1.0 + rng.random() * 1e-3)).copy()
            x = jnp.asarray(xs)
            v = jnp.asarray(vs)
            jax.block_until_ready((x, v))
            t0 = time.perf_counter()
            out = fn(x, v)
            jax.block_until_ready(out)
            w = (time.perf_counter() - t0) * 1e3
            if i > 0:
                walls.append(round(w, 1))
                vals.append((xs[0], vs[0, 0], float(jnp.sum(out))))
        outs[name] = vals
        print(
            json.dumps(
                {
                    "impl": name,
                    "n": n,
                    "r": r,
                    "walls_ms": walls,
                    "median_ms": round(float(np.median(walls)), 1),
                }
            ),
            flush=True,
        )

    # cross-check: same-seed strip-vs-fused on one shared input
    x = jnp.asarray(x0)
    v = jnp.asarray(v0)
    a = krylov.kernel_matvec(kernel, x, v, s, impl="strip", block_size=2048)
    b = kernel_matvec_fused(kernel, x, v, s)
    rel = float(
        jnp.linalg.norm(a - b) / jnp.linalg.norm(a)
    )
    print(json.dumps({"check": "strip_vs_fused_rel", "rel": rel}), flush=True)

    if "grad" in sys.argv:
        # gradient-path A/B: fused Pallas jacvec vs the strip scan,
        # same probes — values must agree to f32, walls tell the story
        from gaussian_processes_tpu.models import iterative_gp
        from gaussian_processes_tpu.ops import pairwise as pw

        xg = jnp.asarray(x0)
        yg = jnp.asarray(
            np.sin(2 * x0) + 0.1 * rng.standard_normal(n).astype(np.float32)
        )
        kw = dict(num_probes=8, num_iters=60, precond_rank=1024)
        results = {}
        for mode in ["fused", "strip"]:
            if mode == "strip":
                orig = pw.supports_fused_jacvec
                pw.supports_fused_jacvec = lambda *a: False
            try:
                jfn = jax.jit(
                    lambda xs: iterative_gp.log_marginal_value_and_grad_iterative(
                        kernel, xs, yg, s, jax.random.PRNGKey(0), **kw
                    )
                )
                walls = []
                for trial in range(3):
                    xs = jnp.asarray(
                        x0 * np.float32(1.0 + rng.random() * 1e-4)
                    )
                    jax.block_until_ready(xs)
                    t0 = time.perf_counter()
                    lml, g = jfn(xs)
                    jax.block_until_ready(g)
                    if trial > 0:
                        walls.append(
                            round((time.perf_counter() - t0) * 1e3, 1)
                        )
                results[mode] = (walls, np.asarray(g))
            finally:
                if mode == "strip":
                    pw.supports_fused_jacvec = orig
            print(
                json.dumps(
                    {"grad_impl": mode, "n": n, "walls_ms": results[mode][0]}
                ),
                flush=True,
            )
        ga, gb = results["fused"][1], results["strip"][1]
        print(
            json.dumps(
                {
                    "check": "grad_fused_vs_strip_rel",
                    "rel": float(
                        np.linalg.norm(ga - gb) / np.linalg.norm(gb)
                    ),
                }
            ),
            flush=True,
        )

    if "fit65k" in sys.argv:
        from gaussian_processes_tpu.models.iterative_gp import fit_iterative

        n65 = 65536
        x65 = np.sort(rng.uniform(-3.0, 3.0, n65)).astype(np.float32)
        f = np.sin(2.0 * x65) + 0.5 * np.sin(5.0 * x65)
        y65 = (f + 0.1 * rng.standard_normal(n65)).astype(np.float32)
        for trial in range(2):
            xj = jnp.asarray(x65 * np.float32(1.0 + trial * 1e-4))
            yj = jnp.asarray(y65)
            jax.block_until_ready((xj, yj))
            t0 = time.perf_counter()
            post = fit_iterative(
                GaussianKernel(h=jnp.float32(1.0), w=jnp.float32(0.25)),
                xj,
                yj,
                jnp.float32(0.1),
                key=jax.random.PRNGKey(trial),
                num_probes=8,
                num_iters=120,
                precond_rank=2048,
            )
            jax.block_until_ready(post.alpha)
            w = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "fit65k_trial": trial,
                        "wall_s": round(w, 2),
                        "residual": float(post.solve_residual),
                        "lml": float(post.log_marginal),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
