"""Per-call Cholesky timing in the probe protocol that works through the
tunnel: host-varied inputs, per-call walls, one-vs-K chain differencing.

Usage: python benchmarks/probe_chol.py [n] ; env PC_IMPLS=xla,concat,update
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

    from gaussian_processes_tpu.ops import blocked_cholesky as bc

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    impls = os.environ.get("PC_IMPLS", "xla,concat,update").split(",")
    K = 3

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    d = x[:, None] - x[None, :]
    A0 = np.exp(-0.5 * d * d) + 0.01 * np.eye(n, dtype=np.float32)
    A0 = A0.astype(np.float32)
    del d

    def fn_for(impl):
        if impl == "xla":
            return jnp.linalg.cholesky
        return lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", assembly=impl)

    jitter = np.random.default_rng().random(64) * 1e-3

    for impl in impls:
        fn = fn_for(impl)

        @jax.jit
        def one(A):
            return jnp.sum(fn(A))

        @jax.jit
        def chainK(A, eps):
            def step(A, _):
                L = fn(A)
                return A + eps * L, jnp.sum(L)
            return lax.scan(step, A, None, length=K)

        eps = jnp.asarray(0.0, jnp.float32)
        it = iter(jitter)

        def host_input():
            # host-side variation: scale the diagonal slightly
            s = 1.0 + next(it)
            return jnp.asarray(A0 * np.float32(s))

        ones, chains = [], []
        s1 = one(host_input()); jax.block_until_ready(s1)  # compile
        c1 = chainK(host_input(), eps); jax.block_until_ready(c1)  # compile
        for i in range(3):
            A = host_input(); jax.block_until_ready(A)
            t0 = time.perf_counter()
            s = one(A); jax.block_until_ready(s)
            ones.append(time.perf_counter() - t0)
            A = host_input(); jax.block_until_ready(A)
            t0 = time.perf_counter()
            c = chainK(A, eps); jax.block_until_ready(c)
            chains.append(time.perf_counter() - t0)
        dev = (np.median(chains) - np.median(ones)) / (K - 1)
        flops = n**3 / 3
        print(json.dumps({
            "impl": impl, "n": n,
            "one_walls_ms": [round(w * 1e3, 1) for w in ones],
            "chain_walls_ms": [round(w * 1e3, 1) for w in chains],
            "dev_s": round(dev, 5),
            "tflops": round(flops / dev / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    last = None
    for attempt in range(2):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            last = e
            print(f"attempt {attempt+1} failed: {e!r}", file=sys.stderr)
            time.sleep(5)
    else:
        raise last
