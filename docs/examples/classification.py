"""GP binary classification with the Laplace approximation
(models/classify.py; Rasmussen & Williams ch. 3).

Labels in {-1, +1}, logistic link; the latent posterior is approximated
at its Newton mode.  Everything is jit/vmap-safe fixed-iteration code on
the same kernel/Cholesky substrate as regression.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu import (
    GaussianKernel,
    fit_laplace,
    fit_laplace_mle,
    predict_laplace,
)

# noisy two-class data with a smooth decision structure
rng = np.random.default_rng(0)
n = 200
x = jnp.asarray(np.sort(rng.uniform(-2.0, 2.0, n)))
p_true = jax.nn.sigmoid(4.0 * jnp.sin(2.0 * x))
y = jnp.asarray(np.where(rng.random(n) < np.asarray(p_true), 1.0, -1.0))

# ---- fit at fixed hyperparameters
post = fit_laplace(GaussianKernel(h=2.0, w=0.5), x, y)
print(f"Laplace evidence: {float(post.log_marginal):.2f}  "
      f"(last Newton increment {float(post.newton_deltas[-1]):.2e})")

xo = jnp.linspace(-2.0, 2.0, 9)
mean, var, prob = predict_laplace(post, xo)
for xi, pi in zip(np.asarray(xo), np.asarray(prob)):
    print(f"  p(y=+1 | x={xi:+.2f}) = {pi:.3f}")

# ---- type-II MLE over (h, w) on the Laplace evidence
post_mle, losses = fit_laplace_mle(
    GaussianKernel(h=1.0, w=1.0), x, y, num_steps=60,
)
print(f"MLE: h={float(post_mle.kernel.params[0]):.3f} "
      f"w={float(post_mle.kernel.params[1]):.3f}  "
      f"evidence {float(post_mle.log_marginal):.2f} "
      f"(init objective {float(losses[0]):.2f})")

# training accuracy of the fitted classifier
_, _, p_tr = predict_laplace(post_mle, x)
acc = float(jnp.mean((p_tr > 0.5) == (y > 0)))
print(f"training accuracy: {acc:.3f}")
