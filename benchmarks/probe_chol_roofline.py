"""Shape-matched matmul roofline for the blocked Cholesky (VERDICT r2 #2).

BASELINE.json:5 demands "Cholesky at speed-of-light per chip".  This
probe measures the attainable floor: the EXACT GEMM chain the leftlook
factorization executes (one left-looking (n-r, r)@(r, b) GEMM plus one
(n-r-b, b)@(b, b) panel-scaling GEMM per panel, HIGH precision), with
real data dependencies (each GEMM consumes the previous output's
corner) so XLA schedules them the way the factorization must — but with
NO base-case factorizations, NO trtri, NO strip writes.  The ratio
measured_factorization / this_floor is the honest speed-of-light
statement for the algorithm's shape set.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_chol_roofline.py
"""

import sys
import uuid

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from bench import _dispatch_floor, _probe_walls  # noqa: E402

from gaussian_processes_tpu.ops.blocked_cholesky import (  # noqa: E402
    cholesky_blocked,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
BASE = 512
PREC = lax.Precision.HIGH


def gemm_chain(A):
    """The leftlook GEMM shapes, every output fully consumed.

    A first version fed only a (BASE, BASE) corner of each GEMM into the
    chain and XLA narrowed the dots through the slices (the probe
    measured BELOW the dispatch floor).  Each product is now reduced in
    full, and the reduction feeds the next GEMM's scaling so the chain
    stays data-dependent.
    """
    n = A.shape[0]
    acc = jnp.float32(1.0)
    for k in range(1, n // BASE):
        r = k * BASE
        # left-looking update GEMM: (n-r, r) @ (r, BASE)
        strip = jnp.dot(A[r:, :r] * acc, A[:r, r:r + BASE],
                        preferred_element_type=jnp.float32, precision=PREC)
        s1 = jnp.sum(strip)
        # panel scaling GEMM: (n-r-BASE, BASE) @ (BASE, BASE)
        if r + BASE < n:
            rest = jnp.dot(strip[BASE:], A[:BASE, :BASE],
                           preferred_element_type=jnp.float32,
                           precision=PREC)
            s1 = s1 + jnp.sum(rest)
        acc = 1.0 + s1 * 1e-30  # tiny data dependency, value ~1
    return acc


def main():
    rng = np.random.default_rng()
    nonce = float(int(uuid.uuid4()) % 1000003) * 1e-30
    floor = _dispatch_floor(jax, jnp)
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    jchain = jax.jit(lambda A: gemm_chain(A) + nonce)
    inputs = [jnp.asarray(
        rng.standard_normal((N, N)).astype(np.float32) * 0.01)
        for _ in range(4)]
    med, _ = _probe_walls(jax, jchain, inputs)
    t_floor = med - floor
    flops = N**3 / 3  # the factorization's O(N^3/3), all in these GEMMs
    print(f"shape-matched GEMM chain: {t_floor*1e3:8.2f} ms "
          f"({flops/t_floor/1e12:.1f} ~Tf/s equivalent)", flush=True)

    # the real factorization, same probe protocol
    x = np.sort(rng.uniform(-np.pi, np.pi, N)).astype(np.float32)
    d = x[:, None] - x[None, :]
    A0 = np.exp(-0.5 * d * d) + 0.01 * np.eye(N, dtype=np.float32)
    del d
    jchol = jax.jit(lambda A: jnp.sum(cholesky_blocked(A)) + nonce)
    inputs = [jnp.asarray(A0 * np.float32(1 + rng.random() * 1e-3))
              for _ in range(4)]
    med2, _ = _probe_walls(jax, jchol, inputs)
    t_chol = med2 - floor
    print(f"cholesky_blocked(leftlook): {t_chol*1e3:8.2f} ms "
          f"({flops/t_chol/1e12:.1f} Tf/s)", flush=True)
    print(f"fraction of shape-matched floor: {t_floor/t_chol:.2%}",
          flush=True)


if __name__ == "__main__":
    main()
