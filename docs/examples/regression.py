"""Exact GP regression in 1-D (the reference's headline example).

Fits noisy sine data with a squared-exponential kernel at fixed
hyperparameters, then predicts mean and variance on a test grid —
BASELINE config #1.  Shows both the functional core and the
reference-parity object API.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gaussian_processes_tpu as gpt


def main(n=500, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-np.pi, np.pi, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)
    xo = np.linspace(-np.pi, np.pi, 200)

    kernel = gpt.GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(0.5))

    # functional core: one Cholesky, everything jit-able
    post = gpt.fit(kernel, x, y, noise=0.1, jitter=1e-6)
    mean, var = gpt.predict_diag(post, xo)
    print(f"log marginal likelihood: {float(post.log_marginal):.2f}")
    rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(2 * jnp.asarray(xo))) ** 2)))
    print(f"predictive RMSE vs truth: {rmse:.4f}")

    # reference-style object API with memoization + invalidation
    gp = gpt.GP(kernel, x, y, s=0.1, jitter=1e-6)
    assert jnp.allclose(gp.log_lh, post.log_marginal)
    print("dloglh_dtheta:", np.asarray(gp.dloglh_dtheta).round(3))
    gp.params = jnp.asarray([1.2, 0.6, 0.08])  # assign -> cache invalidated
    print(f"log_lh after param change: {float(gp.log_lh):.2f}")

    # uncomment on a machine with a display:
    # gp.plot(xo); import matplotlib.pyplot as plt; plt.show()
    return mean, var


if __name__ == "__main__":
    main()
