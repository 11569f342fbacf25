"""Phase breakdown of the ND-SKI fit + refine at bench scale
(VERDICT r3 weak #3: "profile the 96 s fit + 129 s refine").

Phases, each fetch-synchronized separately on fresh values:

  fit side:   pivoted-Cholesky preconditioner build (rank 512),
              alpha PCG solve (300 iters, replacement every 10),
              preconditioned SLQ logdet (8 probes),
  refine side: compensated-apply single matvec, full ski_kron_refine.

Env knobs: SKIP_N, SKIP_M1, SKIP_ITERS, SKIP_RANK.
"""

# allow running as `python benchmarks/<script>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gaussian_processes_tpu.models.ard import ARDGaussianKernel
    from gaussian_processes_tpu.ops import kronecker, krylov, ski

    n = int(os.environ.get("SKIP_N", 65536))
    m1 = int(os.environ.get("SKIP_M1", 128))
    iters = int(os.environ.get("SKIP_ITERS", 300))
    rank = int(os.environ.get("SKIP_RANK", 512))

    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
         + 0.1 * rng.standard_normal(n)).astype(np.float32)
    kern = ARDGaussianKernel(jnp.asarray(1.0, jnp.float32),
                             jnp.asarray([0.15, 0.15], jnp.float32))
    xj = jnp.asarray(x)
    g = ski.make_grid(xj[:, 0], m1), ski.make_grid(xj[:, 1], m1)
    op = ski.interpolation_weights_nd(xj, g)
    noise, jitter = 0.1, 1e-4
    sigma2 = jnp.float32(noise ** 2 + jitter)

    def fetch(v):
        return float(jnp.sum(v))

    def timed(label, fn, *args):
        # two calls with fresh values would need fresh problems; these
        # phases are all seconds-scale, one call each is representative
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(jax.tree_util.tree_leaves(out)[0])
        w = time.perf_counter() - t0
        print(json.dumps({"phase": label, "wall_s": round(w, 3)}),
              flush=True)
        return out

    # --- fit phases
    pc = jax.jit(lambda: krylov.pivoted_cholesky(kern, xj, rank))
    L = timed("pivoted_cholesky_build", pc)

    cols = kronecker.kron_columns(kern, op.kron)
    mv = jax.jit(lambda v: ski.ski_kron_matvec(op, cols, v, sigma2))
    pre = krylov.woodbury_inverse_apply(L, sigma2)
    yv = jnp.asarray(y)

    solve = jax.jit(lambda b: krylov.pcg(
        mv, pre, b[:, None], num_iters=iters, tol=1e-7,
        replace_every=10)[0][:, 0])
    alpha = timed("alpha_pcg_300it", solve, yv)

    slq = jax.jit(lambda k: krylov.slq_logdet_preconditioned(
        mv, L, sigma2, k, 8, iters, n))
    timed("slq_logdet_8probes", slq, jax.random.key(1))

    # --- refine phases
    plan = timed("compensated_plan_host", lambda: ski.compensated_plan(op))
    colpairs = []
    from gaussian_processes_tpu.ops import twofloat as tf
    h2 = float(kern.h) ** 2
    ws = np.asarray(kern.w, np.float64)
    for d, gg in enumerate(op.kron.axes):
        g64 = np.asarray(gg, np.float64)
        col = np.exp(-0.5 * np.square(g64 - g64[0]) / ws[d] ** 2)
        if d == 0:
            col = col * h2
        colpairs.append(tf.tf_from_f64(col))
    sh = np.float32(float(sigma2))
    spair = (sh, np.float32(float(sigma2) - float(sh)))
    capply = jax.jit(lambda v: ski.ski_kron_apply_compensated(
        plan, colpairs, op.kron.shape, spair, v)[0])
    timed("compensated_matvec_first", capply, alpha)
    # second call, fresh value, measures steady-state
    timed("compensated_matvec_steady", capply,
          alpha * jnp.float32(1.0 + 1e-4))

    t0 = time.perf_counter()
    (ah, al), rel = ski.ski_kron_refine(
        kern, op, x, alpha, yv, noise, jitter=jitter,
        rounds=2, num_iters=iters, precond_L=L)
    fetch(ah)
    print(json.dumps({"phase": "ski_kron_refine_total",
                      "wall_s": round(time.perf_counter() - t0, 3),
                      "residual_pair": float(rel)}), flush=True)


if __name__ == "__main__":
    main()
