"""Robust chip timing for the blocked Cholesky (round-2 diagnostic).

The naive repeat-the-same-call protocol returned sub-dispatch-floor
walls (20 us) through the axon tunnel — repeated identical executions
are served from somewhere that is not the chip.  Protocol here:

* every timed call gets a DIFFERENT input (fresh scale factor), so no
  result can be reused;
* device time comes from differencing two scan lengths inside one jit
  ((t_long - t_short) / (iters_long - iters_short)), cancelling the
  per-call dispatch overhead exactly;
* one correctness probe per config (factor actually factors: ||L L^T -
  A||_F / ||A||_F in f32 on chip).

Usage: python benchmarks/bench_cholesky2.py [N ...]
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
    bases = [int(b) for b in os.environ.get("BC_BASES", "256,512").split(",")]
    precisions = os.environ.get("BC_PRECISIONS", "highest").split(",")
    base_impls = os.environ.get("BC_BASE_IMPLS", "xla").split(",")
    skip_xla = os.environ.get("BC_SKIP_XLA", "0") == "1"
    SHORT, LONG = 2, 6

    def make_chain(fn, iters):
        @jax.jit
        def chain(A, eps):
            def step(A, _):
                L = fn(A)
                return A + eps * L, jnp.sum(L)
            return lax.scan(step, A, None, length=iters)
        return chain

    def device_time(fn, A_base):
        c_s = make_chain(fn, SHORT)
        c_l = make_chain(fn, LONG)
        eps = jnp.asarray(0.0, jnp.float32)
        scales = iter(np.linspace(1.0, 1.001, 64))

        def run(c):
            A = A_base * np.float32(next(scales))  # fresh value every call
            out = c(A, eps)
            jax.block_until_ready(out)

        run(c_s); run(c_l)  # compile both
        ts, tl = [], []
        for _ in range(3):
            t0 = time.perf_counter(); run(c_s); ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(c_l); tl.append(time.perf_counter() - t0)
        return (min(tl) - min(ts)) / (LONG - SHORT), min(ts), min(tl)

    for n in sizes:
        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
        d = x[:, None] - x[None, :]
        A_host = np.exp(-0.5 * d * d) + 0.01 * np.eye(n, dtype=np.float32)
        A = jnp.asarray(A_host)
        flops = n**3 / 3

        # correctness probe in f32 on chip (loose: f32 + HIGHEST matmuls)
        L = cholesky_blocked(A, base=512)
        resid = float(jnp.linalg.norm(L @ L.T - A) / jnp.linalg.norm(A))
        L_x = jnp.linalg.cholesky(A)
        rel = float(jnp.linalg.norm(L - L_x) / jnp.linalg.norm(L_x))
        print(json.dumps({"n": n, "probe_recon_rel": round(resid, 8),
                          "probe_vs_xla_rel": round(rel, 8)}), flush=True)
        del L, L_x

        t_xla = None
        if not skip_xla:
            t_xla, s1, l1 = device_time(jnp.linalg.cholesky, A)
            print(json.dumps({"n": n, "impl": "xla", "dev_s": round(t_xla, 5),
                              "tflops": round(flops / t_xla / 1e12, 1),
                              "short_wall": round(s1, 4),
                              "long_wall": round(l1, 4)}), flush=True)
        for base in bases:
            for prec in precisions:
                for bi in base_impls:
                    t, s1, l1 = device_time(
                        lambda A, b=base, p=prec, i=bi: cholesky_blocked(
                            A, base=b, precision=p, base_impl=i), A)
                    rec = {"n": n, "impl": f"blocked{base}-{prec}-{bi}",
                           "dev_s": round(t, 5),
                           "tflops": round(flops / t / 1e12, 1),
                           "short_wall": round(s1, 4),
                           "long_wall": round(l1, 4)}
                    if t_xla:
                        rec["vs_xla"] = round(t_xla / t, 2)
                    print(json.dumps(rec), flush=True)
        del A


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
