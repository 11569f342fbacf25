"""Chip drive: periodic + quasi-periodic analytic Whittle at N=2^20 f32.

Round-5 verification that the new line-spectrum paths (ops/toeplitz.py::
periodic_line_bins / quasi_periodic_bins) run on the real TPU through
the tunnel: value+grad finite, noise-profile argmax at the generative
noise (the identifiability property the analytic spectrum exists for),
and a scan-differenced per-step wall.  Fresh input values per call
(tunnel replay protocol, bench.py header).
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

    from gaussian_processes_tpu import GaussianKernel, PeriodicKernel
    from gaussian_processes_tpu.models.composite import ProductKernel
    from gaussian_processes_tpu.inference import make_log_posterior_whittle

    n = 1 << 20
    rng = np.random.default_rng(0)
    x = (np.arange(n) * (2 * np.pi / n) - np.pi).astype(np.float32)
    y = (np.sin(50 * x) + 0.1 * rng.standard_normal(n)).astype(np.float32)

    cases = {
        # data period 2pi/50 = 2pi p => p = 0.02
        "periodic": (
            PeriodicKernel(h=jnp.asarray(0.7, jnp.float32),
                           w=jnp.asarray(1.0, jnp.float32),
                           p=jnp.asarray(0.02, jnp.float32)),
            np.log(np.array([0.7, 1.0, 0.02, 0.1], dtype=np.float32)),
        ),
        # decaying periodicity: SE envelope x periodic carrier
        "quasi_periodic": (
            ProductKernel(
                GaussianKernel(h=jnp.asarray(1.0, jnp.float32),
                               w=jnp.asarray(0.5, jnp.float32)),
                PeriodicKernel(h=jnp.asarray(0.7, jnp.float32),
                               w=jnp.asarray(1.0, jnp.float32),
                               p=jnp.asarray(0.02, jnp.float32)),
            ),
            np.log(np.array([1.0, 0.5, 0.7, 1.0, 0.02, 0.1],
                            dtype=np.float32)),
        ),
    }

    for name, (k0, u0) in cases.items():
        lp = make_log_posterior_whittle(
            k0, x, y, prior_mean=jnp.asarray(u0), prior_std=1.0,
            jitter=1e-6)
        vg = jax.jit(jax.value_and_grad(lp))
        # finiteness + fresh-value timing (3 calls after compile)
        walls = []
        for i in range(4):
            u = jnp.asarray(u0) + np.float32(rng.random() * 1e-4)
            t0 = time.perf_counter()
            v, g = vg(u)
            v = float(v)
            gs = float(jnp.sum(g))
            if i > 0:
                walls.append(time.perf_counter() - t0)
            assert np.isfinite(v) and np.isfinite(gs), (name, v, gs)
        # noise-identifiability profile on chip (f32, the round-4 gate
        # class): argmax over s of the posterior at fixed kernel params
        svals = np.array([0.4, 0.2, 0.1, 0.05, 0.025, 0.0125])
        lps = []
        for s in svals:
            u = np.asarray(u0).copy()
            u[-1] = np.log(s).astype(np.float32)
            lps.append(float(lp(jnp.asarray(u))))
        best = float(svals[int(np.argmax(lps))])
        print(json.dumps({
            "case": name, "n": n,
            "vg_wall_median_s": round(float(np.median(walls)), 4),
            "noise_profile_argmax": best,
            "noise_profile_generative": 0.1,
            "lp_at_truth_minus_small_s": round(lps[2] - lps[-1], 1),
            "ok": best == 0.1,
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
