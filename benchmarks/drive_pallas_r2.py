"""On-chip twin drive for the round-2 Pallas builders.

Verifies, on the real TPU (interpret=False), that the fused composite
tile bodies and the D-dim ARD tile kernel agree with the jnp paths —
the native-vs-math gate run natively (the round-1 suite did this for
leaf kernels; round 2 extended the builders to Sum/Product trees and
ARD, VERDICT r1 item 7).
"""

# allow running as `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import sys

import numpy as np


def main():
    import jax.numpy as jnp

    from gaussian_processes_tpu.models.ard import ARDGaussianKernel
    from gaussian_processes_tpu.models.composite import ProductKernel, SumKernel
    from gaussian_processes_tpu.models.gaussian import GaussianKernel
    from gaussian_processes_tpu.models.periodic import PeriodicKernel
    from gaussian_processes_tpu.ops.pairwise import (
        pairwise_matrix,
        pairwise_matrix_ard,
        pairwise_matrix_reference,
    )

    f32 = jnp.float32
    rng = np.random.default_rng(0)
    x1 = np.sort(rng.uniform(-3, 3, 1000)).astype(np.float32)
    x2 = np.sort(rng.uniform(-3, 3, 700)).astype(np.float32)

    se = GaussianKernel(h=jnp.asarray(1.3, f32), w=jnp.asarray(0.7, f32))
    per = PeriodicKernel(h=jnp.asarray(0.9, f32), w=jnp.asarray(1.1, f32),
                         p=jnp.asarray(0.6, f32))

    results = {}
    for name, k in [
        ("sum", SumKernel(se, per)),
        ("prod", ProductKernel(se, per)),
        ("nested", ProductKernel(SumKernel(se, per), se)),
    ]:
        got = pairwise_matrix(k, x1, x2, interpret=False)
        want = pairwise_matrix_reference(k, x1, x2)
        err = float(jnp.max(jnp.abs(got - want)))
        results[f"composite_{name}_maxerr"] = err
        assert err == 0.0, (name, err)  # same elementwise cores => bit-exact

    ard = ARDGaussianKernel(h=jnp.asarray(1.2, f32),
                            w=jnp.asarray(np.array([0.5, 1.5, 0.9], np.float32)))
    xa = rng.uniform(-2, 2, (800, 3)).astype(np.float32)
    xb = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    got = pairwise_matrix_ard(ard, xa, xb, interpret=False)
    want = ard(jnp.asarray(xa), jnp.asarray(xb))
    err = float(jnp.max(jnp.abs(got - want)))
    results["ard_maxerr"] = err
    # accumulation order differs (per-dim loop vs summed (n,m,D) tensor):
    # bit-exactness is not guaranteed, f32 round-off is
    assert err < 1e-6, err

    # noise-diagonal path on chip
    got = pairwise_matrix(ProductKernel(se, per), x1, x1, noise=0.3,
                          jitter=1e-6, interpret=False)
    want = pairwise_matrix_reference(ProductKernel(se, per), x1, x1,
                                     noise=0.3, jitter=1e-6)
    err = float(jnp.max(jnp.abs(got - want)))
    results["composite_diag_maxerr"] = err
    assert err == 0.0, err

    print(json.dumps({"drive": "pallas_r2", "ok": True, **results}), flush=True)


if __name__ == "__main__":
    last = None
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            last = e
            print(f"attempt {attempt+1} failed: {e!r}", file=sys.stderr)
            import time
            time.sleep(5)
    else:
        raise last
