"""Fully Bayesian hyperparameter sampling at N=2^20 on ONE chip (grid data).

The Toeplitz capstone: ChEES-HMC over (h, w, s) where every leapfrog
step's solves, SLQ logdet, and Hutchinson gradient run as O(n log n) FFT
products on the uniform-grid structure
(inference/gp_model.py::make_log_posterior_iterative with
``structure="toeplitz"``).  Dense inference at this N would need a
4.4 TB kernel matrix; the strip matrix-free path would pay a
rank-O(1e4) preconditioner build per evaluation.  Env knobs:
D1M_N, D1M_CHAINS, D1M_WARMUP, D1M_SAMPLES, D1M_ITERS.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.inference import (
        init_positions,
        make_log_posterior_iterative,
    )
    from gaussian_processes_tpu.inference.chees import sample_chees

    n = int(os.environ.get("D1M_N", 1 << 20))
    n_chains = int(os.environ.get("D1M_CHAINS", 2))
    num_warmup = int(os.environ.get("D1M_WARMUP", 8))
    num_samples = int(os.environ.get("D1M_SAMPLES", 8))
    num_iters = int(os.environ.get("D1M_ITERS", 80))

    rng = np.random.default_rng(0)
    x = np.linspace(-np.pi, np.pi, n).astype(np.float32)
    w_true = max(100.0 * 2 * np.pi / n, 1e-4)
    y = (np.sin(50 * x) + 0.1 * rng.standard_normal(n)).astype(np.float32)

    k0 = GaussianKernel(h=jnp.asarray(1.0, jnp.float32),
                        w=jnp.asarray(w_true, jnp.float32))
    log_post = make_log_posterior_iterative(
        k0, x, y,
        prior_std=0.5,       # informative: the demo explores near the MLE
        jitter=1e-4,
        num_probes=4,
        num_iters=num_iters,
        tol=1e-5,
        structure="toeplitz",
    )

    k1, k2 = jax.random.split(jax.random.key(0))
    init = init_positions(k0, 0.1, k1, n_chains=n_chains, spread=0.05,
                          dtype=jnp.float32)

    t0 = time.perf_counter()
    res = sample_chees(
        log_post, init, k2,
        num_warmup=num_warmup, num_samples=num_samples,
        init_step_size=0.02, init_traj_length=0.06,
        max_leapfrog=4, chunk_size=2,
    )
    jax.block_until_ready(res.positions)
    wall = time.perf_counter() - t0

    draws = np.exp(np.asarray(res.positions)).reshape(-1, 3)
    total_draws = num_samples * n_chains
    out = {
        "metric": f"bayes1m_chees_toeplitz_n{n}_c{n_chains}",
        "value": round(wall / max(num_samples, 1), 2),
        "unit": "s/draw (all chains, warmup+compile amortized)",
        "wall_s": round(wall, 1),
        "draws": total_draws,
        "accept_mean": float(np.asarray(res.accept_prob).mean()),
        "diverging_frac": float(np.asarray(res.diverging).mean()),
        "posterior_mean_hws": draws.mean(0).round(5).tolist(),
        "finite": bool(np.all(np.isfinite(draws))),
    }
    print(json.dumps(out), flush=True)


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
