"""Tile-size sweep for the fused kernel matvec at n=65536.

The 65k fit A/B showed fused (512, 512) tiles ~2.3x slower than the
strip scan: 16k grid programs x per-program overhead beats the saved
HBM traffic.  Sweep block shapes (and the strip block_size) on single
matvec walls, where device time (~40-100 ms) dominates the ~30 ms
dispatch floor.

Measured 2026-08-17 (n=65536, r=9, walls incl. ~30 ms dispatch):
strip_b2048 54.0 / strip_b4096 53.2 / fused 70.4-72.9 ms flat across
(512,512)..(1024,1024) tiles -> the fused loss is NOT grid overhead but
the skinny-RHS MXU dot (r=9 padded to 128 lanes = 14x wasted MXU work);
strip stays the auto-dispatch default.

Usage: python benchmarks/probe_matvec2.py [n] [r]
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
    from gaussian_processes_tpu.ops.pairwise import kernel_matvec_fused

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    v0 = rng.standard_normal((n, r)).astype(np.float32)
    w = np.float32(100.0 * 2 * np.pi / n)
    kernel = GaussianKernel(h=jnp.float32(1.0), w=jnp.asarray(w))
    s = jnp.float32(0.1)

    cases = {
        "strip_b2048": lambda x, v: krylov.kernel_matvec(
            kernel, x, v, s, impl="strip", block_size=2048),
        "strip_b4096": lambda x, v: krylov.kernel_matvec(
            kernel, x, v, s, impl="strip", block_size=4096),
        "fused_512x512": lambda x, v: kernel_matvec_fused(
            kernel, x, v, s, block=(512, 512)),
        "fused_512x1024": lambda x, v: kernel_matvec_fused(
            kernel, x, v, s, block=(512, 1024)),
        "fused_512x2048": lambda x, v: kernel_matvec_fused(
            kernel, x, v, s, block=(512, 2048)),
        "fused_1024x1024": lambda x, v: kernel_matvec_fused(
            kernel, x, v, s, block=(1024, 1024)),
        "fused_256x2048": lambda x, v: kernel_matvec_fused(
            kernel, x, v, s, block=(256, 2048)),
    }

    ref = None
    for name, fn in cases.items():
        jfn = jax.jit(fn)
        walls, sums = [], []
        try:
            for i in range(4):
                xs = jnp.asarray(
                    x0 * np.float32(1.0 + rng.random() * 1e-4)
                )
                vs = jnp.asarray(v0)
                jax.block_until_ready((xs, vs))
                t0 = time.perf_counter()
                out = jfn(xs, vs)
                jax.block_until_ready(out)
                if i > 0:
                    walls.append(round((time.perf_counter() - t0) * 1e3, 1))
                    sums.append(float(jnp.sum(out)))
        except Exception as e:  # noqa: BLE001 - e.g. VMEM OOM for a shape
            print(json.dumps({"impl": name, "error": repr(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({
            "impl": name, "n": n, "r": r, "walls_ms": walls,
            "median_ms": round(float(np.median(walls)), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
