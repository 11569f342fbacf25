"""Round-3 probe: XLA vs blocked triangular solves on chip at N=16384.

Decides the `choose_solve` dispatch thresholds (VERDICT r2 item 1).
Uses bench.py's probe protocol: fresh input VALUES per call (the tunnel
replays repeated (program, value) pairs), outputs reduced to a nonce'd
scalar (block_until_ready on a large tunnel output does not synchronize
— walls below the ~30 ms dispatch floor are the tell), dispatch floor
subtracted.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_solve_r3.py
"""

import sys
import time
import uuid

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

sys.path.insert(0, "/root/repo")
from bench import _dispatch_floor, _probe_walls  # noqa: E402

from gaussian_processes_tpu.ops.blocked_cholesky import (  # noqa: E402
    cholesky_blocked,
    solve_triangular_blocked,
)


def main():
    n = 16384
    rng = np.random.default_rng(0)
    A = rng.standard_normal((n, 256), dtype=np.float32)
    K0 = (A @ A.T) / 256 + 2.0 * np.eye(n, dtype=np.float32)
    L = cholesky_blocked(jnp.asarray(K0))
    jax.block_until_ready(L)
    nonce = float(int(uuid.uuid4()) % 1000003) * 1e-30
    floor = _dispatch_floor(jax, jnp)
    print(f"dispatch floor: {floor*1e3:.1f} ms", flush=True)

    def probe(fn, shape, reps=4):
        jfn = jax.jit(lambda l, b: jnp.sum(fn(l, b)) + nonce)
        inputs = [
            (L, jnp.asarray(rng.standard_normal(shape, dtype=np.float32)))
            for _ in range(reps)
        ]
        med, _ = _probe_walls(jax, jfn, inputs)
        return max(med - floor, 1e-9)

    cases = [
        ("xla lower", lambda l, b: solve_triangular(l, b, lower=True)),
        ("xla trans", lambda l, b: solve_triangular(l, b, lower=True, trans=1)),
        ("blk lower", lambda l, b: solve_triangular_blocked(l, b, trans=False)),
        ("blk trans", lambda l, b: solve_triangular_blocked(l, b, trans=True)),
    ]
    for shape in ((n,), (n, 128), (n, 2048)):
        lbl = f"rhs{shape[1] if len(shape) > 1 else 1}"
        for name, fn in cases:
            t = probe(fn, shape)
            print(f"{lbl:8s} {name}: {t*1e3:8.2f} ms", flush=True)

    # the LOO / gradient path's n-RHS solve L^-1 I (eye built inside)
    def probe_inv(fn, reps=3):
        jfn = jax.jit(lambda l: jnp.sum(fn(l)) + nonce)
        inputs = [
            cholesky_blocked(
                jnp.asarray(K0 + (1e-3 * (i + 1)) * np.eye(n, dtype=np.float32))
            )
            for i in range(reps)
        ]
        jax.block_until_ready(inputs)
        med, _ = _probe_walls(jax, jfn, inputs)
        return max(med - floor, 1e-9)

    for nm, f in (
        ("blocked", lambda l: solve_triangular_blocked(
            l, jnp.eye(n, dtype=l.dtype), trans=False)),
        ("xla", lambda l: solve_triangular(
            l, jnp.eye(n, dtype=l.dtype), lower=True)),
    ):
        try:
            t = probe_inv(f)
            tf = (n**3 / t) / 1e12
            print(f"inv_L (n RHS) {nm}: {t*1e3:8.2f} ms  ({tf:.1f} Tf/s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - probe reports and moves on
            print(f"inv_L (n RHS) {nm}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)

    b1 = jnp.asarray(rng.standard_normal((n,), dtype=np.float32))
    xb = solve_triangular_blocked(L, b1, trans=False)
    xx = solve_triangular(L, b1, lower=True)
    r_b = float(jnp.linalg.norm(L @ xb - b1) / jnp.linalg.norm(b1))
    r_x = float(jnp.linalg.norm(L @ xx - b1) / jnp.linalg.norm(b1))
    print(f"residual rhs1: xla {r_x:.2e}  blocked {r_b:.2e}")


if __name__ == "__main__":
    main()
