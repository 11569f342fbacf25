"""Shared test utilities.

Parity with the reference's test toolkit (gp/tests/util.py [R], SURVEY.md
§3 C10): shared tolerances, random hyperparameter draws, synthetic data
generators, and a central finite-difference derivative checker — plus the
numpy/scipy exact-GP oracle that stands in for the (unmountable) reference
implementation (SURVEY.md §5 Tier 1: "the oracle is the math").
"""

from __future__ import annotations

import numpy as np

#: shared tolerances (analogue of the reference's ``opt`` dict)
OPT = {
    "eps": 1e-6,        # finite-difference step
    "atol": 1e-5,
    "rtol": 1e-4,
    "n_draws": 8,       # random hyperparameter draws per test
}


def rand_params(rng: np.random.Generator, n: int):
    """Random positive hyperparameters, log-uniform in [0.3, 3]."""
    return np.exp(rng.uniform(np.log(0.3), np.log(3.0), size=n))


def make_xy(rng: np.random.Generator, n: int = 40, periodic: bool = False):
    """Synthetic 1-D regression data (noisy sine), shapes (n,), (n,)."""
    x = np.sort(rng.uniform(-np.pi, np.pi, size=n))
    f = np.sin(2 * x) if periodic else np.sin(x)
    y = f + 0.1 * rng.standard_normal(n)
    return x, y


def make_xo(n: int = 30):
    return np.linspace(-np.pi, np.pi, n)


def approx_deriv(f, theta, eps: float = OPT["eps"]):
    """Central finite differences of f at theta; returns array of shape
    (len(theta),) + np.shape(f(theta))."""
    theta = np.asarray(theta, dtype=np.float64)
    out = []
    for p in range(theta.size):
        tp = theta.copy()
        tm = theta.copy()
        tp[p] += eps
        tm[p] -= eps
        out.append((np.asarray(f(tp)) - np.asarray(f(tm))) / (2 * eps))
    return np.stack(out)


# ---------------------------------------------------------------------------
# numpy exact-GP oracle (f64, scipy linalg) — the ground truth for Tier 1.
# ---------------------------------------------------------------------------

def oracle_se_k(x1, x2, h, w):
    d = np.subtract.outer(np.asarray(x1, float), np.asarray(x2, float))
    return h ** 2 * np.exp(-(d ** 2) / (2 * w ** 2))


def oracle_periodic_k(x1, x2, h, w, p):
    d = np.subtract.outer(np.asarray(x1, float), np.asarray(x2, float))
    return h ** 2 * np.exp(-2 * np.sin(d / (2 * p)) ** 2 / w ** 2)


def oracle_fit(kfun, x, y, s, jitter=0.0):
    """Exact GP fit with explicit numpy formulas; returns a dict of every
    quantity the reference memoizes (SURVEY.md §4.1)."""
    import scipy.linalg as sla

    x = np.asarray(x, float)
    y = np.asarray(y, float)
    n = x.size
    Kxx = kfun(x, x) + (s ** 2 + jitter) * np.eye(n)
    L = sla.cholesky(Kxx, lower=True)
    alpha = sla.cho_solve((L, True), y)
    inv_K = sla.cho_solve((L, True), np.eye(n))
    log_lh = (
        -0.5 * y @ alpha - np.sum(np.log(np.diag(L))) - 0.5 * n * np.log(2 * np.pi)
    )
    return dict(Kxx=Kxx, L=L, alpha=alpha, inv_K=inv_K, log_lh=log_lh)


def oracle_predict(kfun, fitd, x, xo):
    import scipy.linalg as sla

    Kxox = kfun(xo, x)
    mean = Kxox @ fitd["alpha"]
    v = sla.solve_triangular(fitd["L"], Kxox.T, lower=True)
    cov = kfun(xo, xo) - v.T @ v
    return mean, cov
