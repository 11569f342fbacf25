"""Periodic data + type-II MLE hyperparameter fitting (BASELINE config #2).

The periodic kernel's marginal likelihood is multimodal in the period, so
the optimizer runs with vmapped random restarts.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gaussian_processes_tpu as gpt
from gaussian_processes_tpu.inference import fit_mle_restarts


def main(n=300, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-2 * np.pi, 2 * np.pi, n))
    y = np.sin(2 * x) + 0.15 * rng.standard_normal(n)  # period = pi

    kernel = gpt.PeriodicKernel(
        h=jnp.asarray(1.0), w=jnp.asarray(1.0), p=jnp.asarray(2.0)
    )

    # the analytic kernel derivatives the reference compiled to C:
    J = kernel.jacobian(x[:8], x[:8])  # (3, 8, 8): dK/dh, dK/dw, dK/dp
    print("jacobian block shape:", J.shape)

    res = fit_mle_restarts(
        kernel, x, y, noise_init=0.3,
        key=jax.random.key(seed), n_restarts=8, num_steps=80,
    )
    h, w, p = np.exp(np.asarray(res.u[:3]))
    print(f"MLE: h={h:.3f} w={w:.3f} p={p:.3f} "
          f"noise={float(res.noise):.3f} lml={float(res.log_marginal):.2f}")
    # k(d) = h^2 exp(-2 sin^2(d/2p)/w^2) has period 2*pi*p in d, so data
    # with period pi (y = sin 2x) should recover p ~ 0.5
    print(f"fitted function period 2*pi*p = {2 * np.pi * p:.3f} (true: {np.pi:.3f})")
    return res


if __name__ == "__main__":
    main()
