"""2-D structured GP regression: Kronecker grids and D-dim SKI.

Two multi-dimensional structure exploits (both beyond the strictly-1-D
reference — SURVEY.md §1):

1. **Kronecker** (ops/kronecker.py): inputs on a D-dim Cartesian grid
   with a separable kernel (ARDGaussianKernel) factorize the kernel
   matrix as a Kronecker product of per-dim Toeplitz matrices — matvecs
   are D batched FFT sweeps, O(n log n) for n = prod(n_d), and inference
   is EXACT (the factorization is an identity on the grid).

2. **D-dim SKI / KISS-GP** (ops/ski.py): scattered (n, D) inputs
   interpolate onto a Kronecker inducing grid through 4^D-tap
   tensor-product cubic stencils — the same FFT core, off the grid.

Run: env JAX_PLATFORMS=cpu PYTHONPATH=. python docs/examples/grids_2d.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import gaussian_processes_tpu as gpt
from gaussian_processes_tpu.ops import kronecker, ski

jax.config.update("jax_enable_x64", True)

kernel = gpt.ARDGaussianKernel(h=1.0, w=jnp.asarray([0.3, 0.25]))
rng = np.random.default_rng(0)

# --- exact GP on a 64 x 48 grid (n = 3072; dense K would be 9.4M entries) ---
op = kronecker.KronOperator(axes=(jnp.linspace(-1.5, 1.5, 64),
                                  jnp.linspace(0.0, 2.0, 48)))
x = kronecker.kron_inputs(op.axes)
f = np.sin(2 * np.asarray(x[:, 0])) * np.cos(3 * np.asarray(x[:, 1]))
y = jnp.asarray(f + 0.1 * rng.standard_normal(op.n))

post = gpt.fit_iterative(kernel, x, y, 0.1, jax.random.key(0),
                         num_probes=16, num_iters=150, tol=1e-10,
                         jitter=1e-8, structure=op)
print(f"kronecker fit (n={op.n}): lml~{float(post.log_marginal):.1f} "
      f"residual={float(post.solve_residual):.2e}")

xo = jnp.stack([jnp.linspace(-1.2, 1.2, 100),
                jnp.linspace(0.2, 1.8, 100)], axis=-1)
mean, var = gpt.predict_diag_iterative(post, xo, num_iters=150, tol=1e-10,
                                       jitter=1e-8, structure=op)
fo = np.sin(2 * np.asarray(xo[:, 0])) * np.cos(3 * np.asarray(xo[:, 1]))
print(f"  predictive RMSE vs truth: "
      f"{float(jnp.sqrt(jnp.mean(jnp.square(mean - fo)))):.3f} "
      f"(noise level 0.1)")

# --- scattered 2-D points through D-dim SKI ---------------------------------
xs = jnp.asarray(rng.uniform(-1.0, 1.0, (2000, 2)))
fs = np.sin(2 * np.asarray(xs[:, 0])) * np.cos(3 * np.asarray(xs[:, 1]))
ys = jnp.asarray(fs + 0.1 * rng.standard_normal(2000))
sop = ski.interpolation_weights_nd(
    xs, (ski.make_grid(xs[:, 0], 96), ski.make_grid(xs[:, 1], 96)))

post_s = gpt.fit_iterative(kernel, xs, ys, 0.1, jax.random.key(1),
                           num_probes=16, num_iters=300, tol=1e-10,
                           jitter=1e-8, structure=sop)
xo_s = xs[:100] * 0.9
mean_s, _ = gpt.predict_diag_iterative(post_s, xo_s, num_iters=300, tol=1e-10,
                                       jitter=1e-8, structure=sop)
post_d = gpt.fit(kernel, xs, ys, 0.1, jitter=1e-8)
mean_d, _ = gpt.predict_diag(post_d, xo_s)
print(f"2-D SKI on 2000 scattered points (96x96 grid): "
      f"max |mean - dense exact| = {float(jnp.max(jnp.abs(mean_s - mean_d))):.2e}")
print("done")
