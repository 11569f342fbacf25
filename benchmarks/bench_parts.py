"""Component breakdown for the blocked Cholesky at N (default 16384).

Measures, with the input-varying differenced protocol:
  1. chain of n/base dependent XLA chol(base) calls      (base-panel time)
  2. chain of n/base dependent trtri(base) calls         (TRSM base time)
  3. matmul/concat skeleton: the recursion with base ops replaced by
     identity-cost stand-ins                              (SYRK+TRSM+concat)
  4. full blocked512-high with XLA base                  (the real thing)
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
    base = int(os.environ.get("BP_BASE", 512))
    nb = n // base
    SHORT, LONG = 1, 3

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

    rng = np.random.default_rng(0)
    Xs = rng.standard_normal((base, base)).astype(np.float32)
    As = jnp.asarray(Xs @ Xs.T + base * np.eye(base, dtype=np.float32))

    # 1. dependent chain of nb base cholesky calls
    def make_cholchain(iters):
        @jax.jit
        def chain(A, eps):
            def step(A, _):
                def inner(A, _):
                    L = jnp.linalg.cholesky(A)
                    return A + eps * L, None
                A, _ = lax.scan(inner, A, None, length=nb)
                return A, jnp.sum(A)
            return lax.scan(step, A, None, length=iters)
        return chain

    t = timed(make_cholchain, As)
    print(json.dumps({"part": f"chain_{nb}x_chol{base}",
                      "dev_s": round(t, 5),
                      "per_call_us": round(t / nb * 1e6, 1)}), flush=True)

    # 2. dependent chain of nb trtri(base)
    Ls = jnp.linalg.cholesky(As)

    def make_trtrichain(iters):
        eye = jnp.eye(base, dtype=jnp.float32)

        @jax.jit
        def chain(L, eps):
            def step(L, _):
                def inner(L, _):
                    iL = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
                    return L + eps * iL, None
                L, _ = lax.scan(inner, L, None, length=nb)
                return L, jnp.sum(L)
            return lax.scan(step, L, None, length=iters)
        return chain

    t = timed(make_trtrichain, Ls)
    print(json.dumps({"part": f"chain_{nb}x_trtri{base}",
                      "dev_s": round(t, 5),
                      "per_call_us": round(t / nb * 1e6, 1)}), flush=True)

    # 3. skeleton: recursion shape with free base ops
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    d = x[:, None] - x[None, :]
    A = jnp.asarray(np.exp(-0.5 * d * d) + 0.01 * np.eye(n, dtype=np.float32))
    del d

    hi = jax.lax.Precision.HIGH

    def trsm_skel(B, L):
        m = L.shape[0]
        if m <= base:
            return jnp.matmul(B, L.T, precision=hi)  # stand-in GEMM
        n1 = bc._split_point(m, base)
        X1 = trsm_skel(B[:, :n1], L[:n1, :n1])
        B2 = B[:, n1:] - jnp.matmul(X1, L[n1:, :n1].T, precision=hi)
        X2 = trsm_skel(B2, L[n1:, n1:])
        return jnp.concatenate([X1, X2], axis=1)

    def chol_skel(A):
        m = A.shape[0]
        if m <= base:
            return A  # free base
        n1 = bc._split_point(m, base)
        L11 = chol_skel(A[:n1, :n1])
        L21 = trsm_skel(A[n1:, :n1], L11)
        S = A[n1:, n1:] - jnp.matmul(L21, L21.T, precision=hi)
        L22 = chol_skel(S)
        top = jnp.concatenate([L11, jnp.zeros((n1, m - n1), A.dtype)], axis=1)
        return jnp.concatenate([top, jnp.concatenate([L21, L22], axis=1)], axis=0)

    def make_skel(iters):
        @jax.jit
        def chain(A, eps):
            def step(A, _):
                L = chol_skel(A)
                return A + eps * L, jnp.sum(L)
            return lax.scan(step, A, None, length=iters)
        return chain

    t = timed(make_skel, A)
    print(json.dumps({"part": f"skeleton_matmuls_n{n}",
                      "dev_s": round(t, 5)}), flush=True)

    # 4. the real factorization, XLA base, HIGH
    def make_full(iters):
        @jax.jit
        def chain(A, eps):
            def step(A, _):
                L = bc.cholesky_blocked(A, base=base, precision="high")
                return A + eps * L, jnp.sum(L)
            return lax.scan(step, A, None, length=iters)
        return chain

    t = timed(make_full, A)
    print(json.dumps({"part": f"full_blocked{base}_high_xla_n{n}",
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
