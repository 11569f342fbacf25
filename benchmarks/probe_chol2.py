"""Cholesky timing probe with VALUE VERIFICATION per call.

For each call: fresh host-varied input, wall clock, device result
(sum of L), and the numpy reference for the same input — so a stale or
elided execution is caught by value, not inferred from timing.
Also times jnp.sum(A) as the dispatch/transfer baseline.
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

    from gaussian_processes_tpu.ops import blocked_cholesky as bc

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    d = x[:, None] - x[None, :]
    A0 = (np.exp(-0.5 * d * d) + 0.01 * np.eye(n, dtype=np.float32)).astype(
        np.float32
    )
    del d

    @jax.jit
    def trivial(A):
        return jnp.sum(A)

    @jax.jit
    def xla_chol_sum(A):
        return jnp.sum(jnp.linalg.cholesky(A))

    @jax.jit
    def blocked_sum(A):
        return jnp.sum(bc.cholesky_blocked(A, base=512, precision="high"))

    jit_scales = 1.0 + np.random.default_rng().random(16) * 1e-3

    def run_case(name, fn, i, verify=False):
        s = np.float32(jit_scales[i])
        A_host = A0 * s
        A = jnp.asarray(A_host)
        jax.block_until_ready(A)
        t0 = time.perf_counter()
        out = fn(A)
        jax.block_until_ready(out)
        w = time.perf_counter() - t0
        rec = {"case": f"{name}_{i}", "wall_ms": round(w * 1e3, 1),
               "sum": float(out)}
        if verify:
            L_ref = np.linalg.cholesky(A_host.astype(np.float64))
            rec["ref_sum"] = float(L_ref.sum())
            rec["rel_err"] = abs(rec["sum"] - rec["ref_sum"]) / abs(
                rec["ref_sum"])
        print(json.dumps(rec), flush=True)

    for i in range(3):
        run_case("trivial", trivial, i)
    for i in range(3, 6):
        run_case("xla_chol", xla_chol_sum, i, verify=True)
    for i in range(6, 9):
        run_case("blocked", blocked_sum, i, verify=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"failed: {e!r}", file=sys.stderr)
        raise
