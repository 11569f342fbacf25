"""Follow-up breakdown: is the skeleton's 52 ms matmuls or concats?

  1. raw HIGH-precision matmul rate at the factorization's dominant
     GEMM shapes
  2. the skeleton with concatenate-assembly replaced by preallocated
     .at[].set() writes (XLA can in-place these)
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
    from jax import lax

    from gaussian_processes_tpu.ops import blocked_cholesky as bc

    n = 16384
    base = 512
    hi = lax.Precision.HIGH
    SHORT, LONG = 1, 5

    def timed(make_chain, arg):
        c_s, c_l = make_chain(SHORT), make_chain(LONG)
        eps = jnp.asarray(0.0, jnp.float32)
        scales = iter((1.0 + 1e-3 * np.random.default_rng().random(64)).astype(np.float32))

        def run(c):
            jax.block_until_ready(c(arg * next(scales), eps))

        run(c_s); run(c_l)
        ts, tl = [], []
        for _ in range(3):
            t0 = time.perf_counter(); run(c_s); ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(c_l); tl.append(time.perf_counter() - t0)
        return (min(tl) - min(ts)) / (LONG - SHORT)

    # 1. raw matmul rate, HIGH, at the two dominant shapes
    rng = np.random.default_rng(0)
    for (m, k) in [(8192, 8192), (8192, 512)]:
        A = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))

        def make_mm(iters, m=m, k=k):
            @jax.jit
            def chain(A, eps):
                def step(A, _):
                    B = jnp.matmul(A, A.T, precision=hi)  # (m, m)
                    return A + eps * B[:, :k], jnp.sum(B)
                return lax.scan(step, A, None, length=iters)
            return chain

        t = timed(make_mm, A)
        fl = 2 * m * m * k
        print(json.dumps({"part": f"matmul_{m}x{k}_high",
                          "dev_s": round(t, 5),
                          "tflops": round(fl / t / 1e12, 1)}), flush=True)
        del A

    # 2. skeleton with .at-assembly (no concatenate)
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    d = x[:, None] - x[None, :]
    A = jnp.asarray(np.exp(-0.5 * d * d) + 0.01 * np.eye(n, dtype=np.float32))
    del d

    def trsm_skel(B, L):
        m = L.shape[0]
        if m <= base:
            return jnp.matmul(B, L.T, precision=hi)
        n1 = bc._split_point(m, base)
        X1 = trsm_skel(B[:, :n1], L[:n1, :n1])
        B2 = B[:, n1:] - jnp.matmul(X1, L[n1:, :n1].T, precision=hi)
        X2 = trsm_skel(B2, L[n1:, n1:])
        out = jnp.zeros_like(B)
        return out.at[:, :n1].set(X1).at[:, n1:].set(X2)

    def chol_skel(A):
        m = A.shape[0]
        if m <= base:
            return A
        n1 = bc._split_point(m, base)
        L11 = chol_skel(A[:n1, :n1])
        L21 = trsm_skel(A[n1:, :n1], L11)
        S = A[n1:, n1:] - jnp.matmul(L21, L21.T, precision=hi)
        L22 = chol_skel(S)
        out = jnp.zeros_like(A)
        out = out.at[:n1, :n1].set(L11)
        out = out.at[n1:, :n1].set(L21)
        out = out.at[n1:, n1:].set(L22)
        return out

    def make_skel(iters):
        @jax.jit
        def chain(A, eps):
            def step(A, _):
                L = chol_skel(A)
                return A + eps * L, jnp.sum(L)
            return lax.scan(step, A, None, length=iters)
        return chain

    t = timed(make_skel, A)
    print(json.dumps({"part": f"skeleton_at_assembly_n{n}",
                      "dev_s": round(t, 5)}), flush=True)

    # 3. the real factorization with update-assembly vs concat
    for asm in ["update", "concat"]:
        def make_full(iters, asm=asm):
            @jax.jit
            def chain(A, eps):
                def step(A, _):
                    L = bc.cholesky_blocked(A, base=base, precision="high",
                                            assembly=asm)
                    return A + eps * L, jnp.sum(L)
                return lax.scan(step, A, None, length=iters)
            return chain

        t = timed(make_full, A)
        print(json.dumps({"part": f"full_blocked{base}_high_{asm}_n{n}",
                          "dev_s": round(t, 5)}), flush=True)


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
