"""Is the kernel-matvec wall flat in the number of RHS columns r?

If the MXU pads skinny right-hand sides to 128 lanes anyway, then CG
over [y, probes] costs the same from r=9 to r~128 — meaning SLQ/
Hutchinson can run 100+ probes (10x lower Monte-Carlo error) for free.

Usage: python benchmarks/probe_rsweep.py [n]
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

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.ops import krylov

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    w = np.float32(100.0 * 2 * np.pi / n)
    kernel = GaussianKernel(h=jnp.float32(1.0), w=jnp.asarray(w))
    s = jnp.float32(0.1)

    for r in [1, 9, 33, 65, 128, 256]:
        v0 = rng.standard_normal((n, r)).astype(np.float32)
        jfn = jax.jit(lambda x, v: krylov.kernel_matvec(
            kernel, x, v, s, impl="strip", block_size=4096))
        walls = []
        for i in range(4):
            xs = jnp.asarray(x0 * np.float32(1.0 + rng.random() * 1e-4))
            vs = jnp.asarray(v0)
            jax.block_until_ready((xs, vs))
            t0 = time.perf_counter()
            out = jfn(xs, vs)
            jax.block_until_ready(out)
            if i > 0:
                walls.append(round((time.perf_counter() - t0) * 1e3, 1))
        print(json.dumps({
            "r": r, "n": n, "walls_ms": walls,
            "median_ms": round(float(np.median(walls)), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
