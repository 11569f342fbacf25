"""Measure XLA vs blocked Cholesky on the real chip (round-2 item 1).

Timing uses the round-1 amortization trick: scan ITERS data-dependent
iterations inside one jit (eps*carry defeats loop collapse) so the ~30 ms
tunnel dispatch floor amortizes away.

Usage: python benchmarks/bench_cholesky.py [N ...]
Env: BC_BASES="256,512,1024"  BC_ITERS=4
"""

# allow running as `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gaussian_processes_tpu.ops.blocked_cholesky import cholesky_blocked

    sizes = [int(a) for a in sys.argv[1:]] or [8192, 16384]
    bases = [int(b) for b in os.environ.get("BC_BASES", "256,512,1024").split(",")]
    ITERS = int(os.environ.get("BC_ITERS", 4))

    def timed(fn, A, eps):
        @jax.jit
        def chain(A, eps):
            def step(A, _):
                L = fn(A)
                # data-dependence on the FULL factor: eps is a runtime 0.0
                # and the carry consumes every element of L, so XLA can
                # neither collapse the loop nor DCE the factorization
                # (carrying only L[0,0] lets XLA reduce the whole cholesky
                # to sqrt(A[0,0]) — observed).
                return A + eps * L, jnp.sum(L)
            return lax.scan(step, A, None, length=ITERS)

        out = chain(A, eps)
        jax.block_until_ready(out)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = chain(A, eps)
            jax.block_until_ready(out)
            walls.append((time.perf_counter() - t0) / ITERS)
        return min(walls)

    for n in sizes:
        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
        d = x[:, None] - x[None, :]
        A = np.exp(-0.5 * d * d) + 0.01 * np.eye(n, dtype=np.float32)
        A = jnp.asarray(A)
        eps = jnp.asarray(0.0, jnp.float32)
        flops = n**3 / 3

        t_xla = timed(jnp.linalg.cholesky, A, eps)
        print(json.dumps({"n": n, "impl": "xla", "wall_s": round(t_xla, 5),
                          "tflops": round(flops / t_xla / 1e12, 1)}), flush=True)
        for base in bases:
            t = timed(lambda A, b=base: cholesky_blocked(A, base=b), A, eps)
            print(json.dumps({"n": n, "impl": f"blocked{base}",
                              "wall_s": round(t, 5),
                              "tflops": round(flops / t / 1e12, 1),
                              "vs_xla": round(t_xla / t, 2)}), flush=True)
        del A

    # matmul roofline for context
    for prec in ["default", "highest"]:
        m = 8192
        A = jnp.asarray(np.random.default_rng(1).standard_normal((m, m)),
                        jnp.float32)
        p = (lax.Precision.HIGHEST if prec == "highest"
             else lax.Precision.DEFAULT)

        @jax.jit
        def mm_chain(A, eps):
            def step(A, _):
                B = jnp.matmul(A, A, precision=p)
                return A + eps * B, jnp.sum(B)
            return lax.scan(step, A, None, length=8)

        out = mm_chain(A, eps)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = mm_chain(A, eps)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / 8
        print(json.dumps({"matmul8192_precision": prec,
                          "tflops": round(2 * m**3 / t / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    last = None
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            last = e
            print(f"attempt {attempt+1} failed: {e!r}", file=sys.stderr)
            time.sleep(5)
    else:
        raise last
