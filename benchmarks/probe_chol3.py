"""Authoritative Cholesky A/B with anti-caching nonce + on-device checks.

Learned tunnel behaviors this round (see memory notes): after heavy use,
walls can come back physically impossible (3-8 ms for a 16k
factorization) while fresh programs time sanely — consistent with some
executable-keyed async path.  Countermeasures here:

* a per-run NONCE constant folded into every jitted program, so each run
  compiles a distinct executable (defeats executable-keyed replay);
* per-call ON-DEVICE value verification — each jit returns the
  reconstruction residual ||L L^T - A|| / ||A|| alongside sum(L); a host
  numpy reference at n=16384 costs ~5 min/call single-threaded, which is
  why verification must ride the device;
* a wall sanity floor — any call faster than the floor marks the whole
  run SUSPECT (the 8192 matmul round trip measures ~50 ms, so no 8192+
  cholesky round trip can be faster).

Usage: python benchmarks/probe_chol3.py [n] [impl1,impl2,...]
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

    from gaussian_processes_tpu.ops import blocked_cholesky as bc

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    NONCE = float(int(uuid.uuid4()) % 1000003) * 1e-30
    FLOOR_MS = 15.0

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(np.float32)
    d = x[:, None] - x[None, :]
    A0 = (np.exp(-0.5 * d * d) + 0.01 * np.eye(n, dtype=np.float32)).astype(
        np.float32
    )
    del d

    impls = {
        "xla": lambda A: jnp.linalg.cholesky(A),
        "blk_concat": lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", assembly="concat"),
        "blk_update": lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", assembly="update"),
        "blk_pallas": lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", base_impl="pallas"),
        "leftlook": lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", algo="leftlook"),
        "leftlook_pallas": lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", algo="leftlook",
            base_impl="pallas"),
        "leftlook2_s2048": lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", algo="leftlook2",
            super_base=2048),
        "leftlook2_s4096": lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", algo="leftlook2",
            super_base=4096),
        "leftlook2_s1024": lambda A: bc.cholesky_blocked(
            A, base=512, precision="high", algo="leftlook2",
            super_base=1024),
    }
    if len(sys.argv) > 2:  # comma-separated impl subset
        keep = sys.argv[2].split(",")
        impls = {k: v for k, v in impls.items() if k in keep}

    scales = 1.0 + np.random.default_rng().random(64) * 1e-3
    si = iter(scales)
    # row-sampled reconstruction check: full L L^T would cost ~260 ms at
    # n=16k; 512 sampled rows cost ~8 ms and still catch any stale or
    # garbage factor
    rows = np.unique(np.linspace(0, n - 1, 512).astype(np.int32))

    for name, fn in impls.items():

        def probe(A, fn=fn):
            L = fn(A)
            R = jnp.matmul(
                L[rows], L.T, precision=jax.lax.Precision.HIGHEST
            ) - A[rows]
            rel = jnp.linalg.norm(R) / jnp.linalg.norm(A[rows])
            return jnp.sum(L) + NONCE, rel

        jfn = jax.jit(probe)
        walls, rels = [], []
        for i in range(4):  # call 0 = compile
            s = np.float32(next(si))
            A = jnp.asarray(A0 * s)
            jax.block_until_ready(A)
            t0 = time.perf_counter()
            out, rel = jfn(A)
            jax.block_until_ready(out)
            w = (time.perf_counter() - t0) * 1e3
            if i > 0:
                walls.append(round(w, 1))
                rels.append(round(float(rel), 7))
        print(json.dumps({
            "impl": name, "n": n, "walls_ms": walls,
            "median_ms": round(float(np.median(walls)), 1),
            "recon_rel": rels,
            "suspect": bool(min(walls) < FLOOR_MS),
        }), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"failed: {e!r}", file=sys.stderr)
        raise
