"""Reference-parity GP object tests.

Ports of the reference's statefulness suite (SURVEY.md §5 item 4):
memoization + invalidation on x/y/s/params assignment, copy independence,
and every memoized property vs the numpy oracle.
"""

import numpy as np
import jax.numpy as jnp

from gaussian_processes_tpu import GP, GaussianKernel, PeriodicKernel
from gaussian_processes_tpu.utils.testing import (
    approx_deriv,
    make_xo,
    make_xy,
    oracle_fit,
    oracle_predict,
    oracle_se_k,
)


def _gp(seed=0, h=1.4, w=0.8, s=0.2, n=30):
    rng = np.random.default_rng(seed)
    x, y = make_xy(rng, n=n)
    return GP(GaussianKernel(jnp.float64(h), jnp.float64(w)), x, y, s), x, y


def test_memoized_properties_match_oracle():
    gp, x, y = _gp()
    h, w = 1.4, 0.8
    kfun = lambda a, b: oracle_se_k(a, b, h, w)
    o = oracle_fit(kfun, x, y, 0.2)
    np.testing.assert_allclose(gp.Kxx, o["Kxx"], atol=1e-10)
    np.testing.assert_allclose(gp.Lxx, o["L"], atol=1e-8)
    np.testing.assert_allclose(gp.inv_Kxx, o["inv_K"], atol=1e-7)
    np.testing.assert_allclose(gp.inv_Kxx_y, o["alpha"], atol=1e-8)
    np.testing.assert_allclose(gp.log_lh, o["log_lh"], atol=1e-8)
    np.testing.assert_allclose(gp.lh, np.exp(o["log_lh"]), rtol=1e-8)
    np.testing.assert_allclose(
        gp.inv_Lxx @ o["L"], np.eye(x.size), atol=1e-8
    )

    xo = make_xo(17)
    omean, ocov = oracle_predict(kfun, o, x, xo)
    np.testing.assert_allclose(gp.mean(xo), omean, atol=1e-8)
    np.testing.assert_allclose(gp.cov(xo), ocov, atol=1e-8)
    np.testing.assert_allclose(gp.Kxox(xo), kfun(xo, x), atol=1e-10)
    np.testing.assert_allclose(gp.Kxxo(xo), kfun(x, xo), atol=1e-10)
    np.testing.assert_allclose(gp.Kxoxo(xo), kfun(xo, xo), atol=1e-10)


def test_params_get_set_invalidates():
    gp, x, y = _gp()
    np.testing.assert_allclose(gp.params, [1.4, 0.8, 0.2])
    ll0 = float(gp.log_lh)
    assert "log_lh" in gp._memo

    gp.params = jnp.asarray([1.1, 0.6, 0.3])
    assert "log_lh" not in gp._memo  # cache cleared
    np.testing.assert_allclose(gp.params, [1.1, 0.6, 0.3])
    ll1 = float(gp.log_lh)
    assert ll0 != ll1

    # setting back reproduces the original value exactly
    gp.params = jnp.asarray([1.4, 0.8, 0.2])
    np.testing.assert_allclose(float(gp.log_lh), ll0, rtol=1e-12)


def test_xys_setters_invalidate():
    gp, x, y = _gp()
    _ = gp.log_lh
    gp.y = y + 1.0
    assert not gp._memo
    _ = gp.log_lh
    gp.x = x * 1.01
    assert not gp._memo
    _ = gp.log_lh
    gp.s = 0.5
    assert not gp._memo
    kern2 = GaussianKernel(jnp.float64(2.0), jnp.float64(1.0))
    _ = gp.log_lh
    gp.K = kern2
    assert not gp._memo
    assert float(gp.params[0]) == 2.0


def test_copy_independence():
    gp, _, _ = _gp()
    ll0 = float(gp.log_lh)
    gp2 = gp.copy()
    gp2.params = jnp.asarray([2.0, 1.0, 0.1])
    assert float(gp.log_lh) == ll0
    assert float(gp2.log_lh) != ll0
    np.testing.assert_allclose(gp.params, [1.4, 0.8, 0.2])


def test_dloglh_dtheta_vs_finite_differences():
    gp, x, y = _gp()
    g = np.asarray(gp.dloglh_dtheta)

    def f(t):
        gp2 = gp.copy()
        gp2.params = jnp.asarray(t)
        return float(gp2.log_lh)

    num = approx_deriv(f, np.asarray(gp.params))
    np.testing.assert_allclose(g, num, atol=1e-4, rtol=1e-4)

    # dlh = lh * dloglh
    np.testing.assert_allclose(
        np.asarray(gp.dlh_dtheta), float(gp.lh) * g, rtol=1e-8
    )


def test_d2lh_dtheta2_vs_finite_differences():
    gp, x, y = _gp(n=20)
    H = np.asarray(gp.d2lh_dtheta2)

    def dlh(t):
        gp2 = gp.copy()
        gp2.params = jnp.asarray(t)
        return np.asarray(gp2.dlh_dtheta)

    num = approx_deriv(dlh, np.asarray(gp.params))
    np.testing.assert_allclose(H, num, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(H, H.T, atol=1e-9, rtol=1e-6)


def test_periodic_kernel_gp():
    rng = np.random.default_rng(3)
    x, y = make_xy(rng, n=25, periodic=True)
    gp = GP(
        PeriodicKernel(jnp.float64(1.2), jnp.float64(0.9), jnp.float64(1.5)),
        x,
        y,
        0.15,
    )
    assert np.isfinite(float(gp.log_lh))
    assert gp.params.shape == (4,)
    assert np.asarray(gp.dloglh_dtheta).shape == (4,)
    assert np.asarray(gp.d2lh_dtheta2).shape == (4, 4)


def test_loo_memoized_and_invalidated():
    import numpy as np
    from gaussian_processes_tpu.models import gp as _core

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(-2, 2, 40)))
    y = jnp.sin(2 * x)
    gp = GP(GaussianKernel(1.0, 0.5), x, y, s=0.1)
    mu, var, lpl = gp.loo
    post = _core.fit(GaussianKernel(1.0, 0.5), x, y, 0.1)
    mu_ref, var_ref, lpl_ref = _core.loo_predictive(post)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref))
    assert "loo" in gp._memo
    gp.params = (1.2, 0.6, 0.1)
    assert "loo" not in gp._memo
    mu2, _, lpl2 = gp.loo
    assert float(lpl2) != float(lpl)
