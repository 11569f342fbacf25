"""Driver benchmark: exact-GP fit (kernel build + Cholesky + solve) per chip.

Headline metric (BASELINE.json:2): N=16k kernel-build+Cholesky wall-clock
on one TPU chip, reported as speedup over the CPU reference
(benchmarks/cpu_baseline.json, measured on this host by
benchmarks/cpu_baseline.py — the reference library's f64 numpy/LAPACK hot
path, SURVEY.md §8).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Env knobs: BENCH_N (default 16384), BENCH_DTYPE (float32), BENCH_MODE
(fit | nuts | chees — the sampler modes report hyperparameter samples/s
at 64 chains, BASELINE.json:9; chees is the tree-free TPU-first sampler).
"""

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("BENCH_N", 16384))
DTYPE = os.environ.get("BENCH_DTYPE", "float32")
MODE = os.environ.get("BENCH_MODE", "fit")


def main_chees():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.inference import (
        init_positions,
        make_log_posterior,
    )
    from gaussian_processes_tpu.inference.chees import sample_chees

    n, n_chains, n_samp = 500, 64, 200
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(DTYPE)
    y = (np.sin(2 * x) + 0.1 * rng.standard_normal(n)).astype(DTYPE)
    k0 = GaussianKernel(h=jnp.asarray(1.0, DTYPE), w=jnp.asarray(1.0, DTYPE))
    log_post = make_log_posterior(k0, x, y, prior_std=1.5, jitter=1e-5)
    k1, k2 = jax.random.split(jax.random.key(0))
    init = init_positions(k0, 0.2, k1, n_chains=n_chains, spread=0.2,
                          dtype=jnp.dtype(DTYPE))
    import gaussian_processes_tpu.inference.chees as chees_mod

    # warmup once (compiles both phases), then time pure collection by
    # continuing from the warm state with the same chunked scan
    r = sample_chees(log_post, init, k2, num_warmup=200, num_samples=10,
                     init_step_size=0.05, chunk_size=25)
    jax.block_until_ready(r.positions)
    state = r.final

    def cstep(s, _):
        s, info = chees_mod.chees_step(
            log_post, s, adapt_traj=False, max_leapfrog=1000
        )
        return s, info.num_leapfrog

    run = jax.jit(lambda s, n_: jax.lax.scan(cstep, s, None, length=n_),
                  static_argnums=1)
    state, _ = run(state, 25)  # compile the collection chunk
    jax.block_until_ready(state.chains.z)
    t0 = time.perf_counter()
    done = 0
    while done < n_samp:
        state, nls = run(state, min(25, n_samp - done))
        done += 25
    jax.block_until_ready(state.chains.z)
    wall = time.perf_counter() - t0
    sps = n_samp * n_chains / wall
    print(json.dumps({
        "metric": f"chees_gp_hyper_n{n}_c{n_chains}_{DTYPE}",
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": None,
    }))


def main_iterative():
    """Matrix-free fit at BENCH_N (default 65536) — the beyond-dense path."""
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel, fit_iterative

    n = int(os.environ.get("BENCH_N", 65536))
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(DTYPE)
    # lengthscale scaled so ~100 points fall within one w: a realistic
    # large-N regression (w=1 at n=65k is numerically and statistically
    # degenerate — condition ~ n h^2 / s^2 exceeds f32 CG's reach)
    w = max(100.0 * 2 * np.pi / n, 1e-3)
    y = (np.sin(2 * x) + 0.1 * rng.standard_normal(n)).astype(DTYPE)
    kernel = GaussianKernel(h=jnp.asarray(1.0, DTYPE), w=jnp.asarray(w, DTYPE))

    iters = int(os.environ.get("BENCH_ITERS", 150))
    rank = int(os.environ.get("BENCH_PRECOND_RANK", 512))
    fit_j = jax.jit(lambda x, y: fit_iterative(
        kernel, x, y, 0.1, jax.random.key(0),
        num_probes=8, num_iters=iters, tol=1e-6, jitter=1e-4, block_size=2048,
        precond_rank=rank,
    ))
    out = fit_j(x, y)
    jax.block_until_ready(out.alpha)
    assert bool(jnp.isfinite(out.log_marginal)), "non-finite lml estimate"
    t0 = time.perf_counter()
    out = fit_j(x, y)
    jax.block_until_ready(out.alpha)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"iterative_gp_fit_n{n}_{DTYPE}_wall",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": None,
    }), flush=True)
    print(f"# residual={float(out.solve_residual):.2e} "
          f"lml={float(out.log_marginal):.1f}", file=sys.stderr)


def main_nuts():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel
    from gaussian_processes_tpu.inference import (
        init_positions,
        make_log_posterior,
        sample_nuts,
    )

    n, n_chains, n_samp = 500, 64, 200
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, n)).astype(DTYPE)
    y = (np.sin(2 * x) + 0.1 * rng.standard_normal(n)).astype(DTYPE)
    k0 = GaussianKernel(h=jnp.asarray(1.0, DTYPE), w=jnp.asarray(1.0, DTYPE))
    log_post = make_log_posterior(k0, x, y, prior_std=1.5, jitter=1e-5)
    k1, k2 = jax.random.split(jax.random.key(0))
    init = init_positions(k0, 0.2, k1, n_chains=n_chains, spread=0.2,
                          dtype=jnp.dtype(DTYPE))
    # warmup (and compile) once, then time pure collection
    from gaussian_processes_tpu.inference import collect, warmup

    # chunked dispatches: a single long device execution trips the dev
    # tunnel's watchdog at this problem size (semantics are unchanged)
    state = warmup(log_post, init, k2, num_warmup=200, max_depth=8,
                   init_step_size=0.05, chunk_size=10)
    jax.block_until_ready(state.chains.z)
    r = collect(log_post, state, 10, max_depth=8, chunk_size=10)  # compile
    jax.block_until_ready(r.positions)
    t0 = time.perf_counter()
    r = collect(log_post, state, n_samp, max_depth=8, chunk_size=10)
    jax.block_until_ready(r.positions)
    wall = time.perf_counter() - t0
    sps = n_samp * n_chains / wall
    print(json.dumps({
        "metric": f"nuts_gp_hyper_n{n}_c{n_chains}_{DTYPE}",
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": None,
    }))


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu import GaussianKernel, fit

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(-np.pi, np.pi, N)).astype(DTYPE)
    y = (np.sin(2 * x) + 0.1 * rng.standard_normal(N)).astype(DTYPE)
    kernel = GaussianKernel(h=jnp.asarray(1.0, DTYPE), w=jnp.asarray(1.0, DTYPE))

    # jitter keeps the f32 factorization of the near-low-rank SE matrix
    # well-posed at large N (SURVEY.md §7 M3 numerics)
    ITERS = 4

    @jax.jit
    def fit_chain(kernel, x, y, eps):
        # scan ITERS dependent fits so per-call dispatch overhead (large
        # through the dev tunnel) amortizes; the eps*alpha carry makes
        # iterations data-dependent so XLA cannot collapse the loop
        # (eps is a runtime 0.0, invisible to the compiler).
        def step(y, _):
            post = fit(kernel, x, y, 0.1, jitter=1e-4)
            return y + eps * post.alpha, post.log_marginal
        return jax.lax.scan(step, y, None, length=ITERS)

    out = fit_chain(kernel, x, y, jnp.asarray(0.0, DTYPE))  # compile
    jax.block_until_ready(out)
    assert bool(jnp.all(jnp.isfinite(out[1]))), "non-finite log marginal"

    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fit_chain(kernel, x, y, jnp.asarray(0.0, DTYPE))
        jax.block_until_ready(out)
        walls.append((time.perf_counter() - t0) / ITERS)
    wall = min(walls)

    vs = None
    base_path = os.path.join(os.path.dirname(__file__), "benchmarks", "cpu_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref = base.get(str(N))
        if ref:
            vs = ref["total_s"] / wall

    print(json.dumps({
        "metric": f"exact_gp_fit_n{N}_{DTYPE}_wall",
        "value": round(wall, 6),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    # the TPU tunnel occasionally throws transient UNAVAILABLE /
    # RESOURCE_EXHAUSTED device errors; retry before giving up
    last_err = None
    for attempt in range(3):
        try:
            if MODE == "nuts":
                main_nuts()
            elif MODE == "chees":
                main_chees()
            elif MODE == "iterative":
                main_iterative()
            else:
                main()
            break
        except Exception as e:  # noqa: BLE001 - deliberate broad retry
            last_err = e
            print(f"bench attempt {attempt + 1} failed: {e!r}", file=sys.stderr)
            time.sleep(5)
    else:
        raise last_err
