"""Type-II MLE tests (config #2, BASELINE.json:8).

Gate: the jitted optax optimization must find the same optimum as a scipy
L-BFGS-B run over the identical objective driven by the analytic gradient
(the reference's workflow, SURVEY.md §4.4) — the oracle is the math.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gaussian_processes_tpu import GaussianKernel, PeriodicKernel
from gaussian_processes_tpu.inference import fit_mle, fit_mle_restarts, make_log_likelihood, pack
from gaussian_processes_tpu.utils import testing as tu


def _data(periodic=False, n=40, seed=0):
    rng = np.random.default_rng(seed)
    return tu.make_xy(rng, n=n, periodic=periodic)


def test_mle_improves_and_matches_scipy_se():
    x, y = _data()
    k0 = GaussianKernel(h=jnp.asarray(0.7), w=jnp.asarray(0.4))
    res = fit_mle(k0, x, y, 0.3, num_steps=60)
    # improved over the starting point
    lml0 = make_log_likelihood(k0, x, y)(pack(k0, 0.3))
    assert float(res.log_marginal) > float(lml0)
    assert bool(res.converged)

    # scipy L-BFGS-B on the same objective/gradient
    import scipy.optimize as sopt

    log_lik = make_log_likelihood(k0, x, y)
    vag = jax.jit(jax.value_and_grad(lambda u: -log_lik(u)))

    def f(u):
        v, g = vag(jnp.asarray(u))
        return float(v), np.asarray(g)

    out = sopt.minimize(f, np.asarray(pack(k0, 0.3)), jac=True, method="L-BFGS-B")
    assert float(res.log_marginal) >= -out.fun - 1e-3


def test_mle_adam_also_improves():
    x, y = _data()
    k0 = GaussianKernel(h=jnp.asarray(0.5), w=jnp.asarray(1.5))
    res = fit_mle(k0, x, y, 0.5, num_steps=300, method="adam", learning_rate=0.05)
    lml0 = make_log_likelihood(k0, x, y)(pack(k0, 0.5))
    assert float(res.log_marginal) > float(lml0) + 1.0


def test_mle_recovers_noise_scale():
    # data generated from a known GP: recovered noise should be in the
    # right ballpark (n=80 keeps the estimate loose but bounded)
    rng = np.random.default_rng(42)
    x = np.sort(rng.uniform(-3, 3, 80))
    K = tu.oracle_se_k(x, x, 1.3, 0.8) + 0.15 ** 2 * np.eye(80)
    y = np.linalg.cholesky(K) @ rng.standard_normal(80)
    k0 = GaussianKernel(h=jnp.asarray(1.0), w=jnp.asarray(1.0))
    res = fit_mle(k0, x, y, 0.3, num_steps=80)
    assert 0.05 < float(res.noise) < 0.4
    assert 0.2 < float(res.kernel.w) < 2.5


@pytest.mark.slow
def test_mle_restarts_periodic():
    x, y = _data(periodic=True, n=60, seed=3)
    k0 = PeriodicKernel(h=jnp.asarray(1.0), w=jnp.asarray(1.0), p=jnp.asarray(0.8))
    res = fit_mle_restarts(k0, x, y, 0.2, jax.random.key(0), n_restarts=6, num_steps=60)
    lml0 = make_log_likelihood(k0, x, y)(pack(k0, 0.2))
    assert float(res.log_marginal) > float(lml0)
    assert np.all(np.isfinite(np.asarray(res.u)))
