"""Fully Bayesian GP hyperparameters with NUTS (BASELINE config #3).

Samples the posterior over (output scale, lengthscale, noise) in log
space with 64 vectorized chains, reports R-hat/ESS diagnostics, and
demonstrates checkpoint/resume.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gaussian_processes_tpu as gpt
from gaussian_processes_tpu.inference import (
    collect,
    init_positions,
    make_log_posterior,
    summarize,
    warmup,
)
from gaussian_processes_tpu.utils import load_pytree, save_pytree


def main(n=200, n_chains=16, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(-np.pi, np.pi, n))
    y = np.sin(2 * x) + 0.1 * rng.standard_normal(n)

    kernel = gpt.GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(1.0))
    log_post = make_log_posterior(kernel, x, y, prior_std=1.5, jitter=1e-6)

    key = jax.random.key(seed)
    k_init, k_run = jax.random.split(key)
    init = init_positions(kernel, 0.2, k_init, n_chains=n_chains, spread=0.2)

    # warmup once...
    state = warmup(log_post, init, k_run, num_warmup=200, max_depth=8)
    # ...collect in two halves with a checkpoint between (resume is
    # bit-identical to one continuous run)
    first = collect(log_post, state, 150, max_depth=8)
    save_pytree("/tmp/gp_sampler.npz", first.final)
    second = collect(log_post, load_pytree("/tmp/gp_sampler.npz", first.final),
                     150, max_depth=8)

    draws = np.concatenate(
        [np.asarray(first.positions), np.asarray(second.positions)]
    )
    diag = summarize(draws)
    theta = np.exp(draws.reshape(-1, 3))
    print(f"posterior mean (h, w, s): {theta.mean(0).round(3)}")
    print(f"posterior sd:             {theta.std(0).round(3)}")
    print(f"max split R-hat: {diag['max_rhat']:.4f}  min ESS: {diag['min_ess']:.0f}")
    print(f"divergences: {float(np.asarray(first.diverging).mean()):.4f}")
    return draws


if __name__ == "__main__":
    main()
