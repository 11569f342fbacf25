"""Kernel-layer tests.

Reference test strategy ported (SURVEY.md §5 items 1–2): analytic
derivatives checked against (a) sympy-lambdified ground truth, (b) central
finite differences, and (c) jax.grad/jax.hessian — the triple gate the
reference's Cython-vs-sympy tests become on this stack.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import sympy as sp

from gaussian_processes_tpu.models import (
    GaussianKernel,
    Matern32Kernel,
    Matern52Kernel,
    PeriodicKernel,
    RationalQuadraticKernel,
)
from gaussian_processes_tpu.utils.testing import OPT, approx_deriv, rand_params

KERNELS = [GaussianKernel, PeriodicKernel, Matern32Kernel,
           Matern52Kernel, RationalQuadraticKernel]


def make_kernel(cls, theta):
    return cls(*[jnp.float64(t) for t in theta])


def rand_inputs(rng, n=7, m=5):
    return rng.uniform(-3, 3, size=n), rng.uniform(-3, 3, size=m)


@pytest.mark.parametrize("cls", KERNELS)
def test_k_matches_sympy(cls):
    rng = np.random.default_rng(0)
    expr, d_sym, p_syms = cls.sym_K()
    f = sp.lambdify((d_sym, *p_syms), expr, "numpy")
    for _ in range(OPT["n_draws"]):
        theta = rand_params(rng, len(p_syms))
        x1, x2 = rand_inputs(rng)
        K = make_kernel(cls, theta)(x1, x2)
        expect = f(np.subtract.outer(x1, x2), *theta)
        np.testing.assert_allclose(K, expect, atol=OPT["atol"], rtol=OPT["rtol"])


@pytest.mark.parametrize("cls", KERNELS)
def test_jacobian_matches_sympy(cls):
    rng = np.random.default_rng(1)
    expr, d_sym, p_syms = cls.sym_K()
    fs = [sp.lambdify((d_sym, *p_syms), sp.diff(expr, p), "numpy") for p in p_syms]
    for _ in range(OPT["n_draws"]):
        theta = rand_params(rng, len(p_syms))
        x1, x2 = rand_inputs(rng)
        J = make_kernel(cls, theta).jacobian(x1, x2)
        D = np.subtract.outer(x1, x2)
        expect = np.stack([f(D, *theta) for f in fs])
        np.testing.assert_allclose(J, expect, atol=OPT["atol"], rtol=OPT["rtol"])


@pytest.mark.parametrize("cls", KERNELS)
def test_hessian_matches_sympy(cls):
    rng = np.random.default_rng(2)
    expr, d_sym, p_syms = cls.sym_K()
    P = len(p_syms)
    fs = [
        [
            sp.lambdify((d_sym, *p_syms), sp.diff(expr, p_syms[i], p_syms[j]), "numpy")
            for j in range(P)
        ]
        for i in range(P)
    ]
    for _ in range(OPT["n_draws"]):
        theta = rand_params(rng, P)
        x1, x2 = rand_inputs(rng)
        H = make_kernel(cls, theta).hessian(x1, x2)
        D = np.subtract.outer(x1, x2)
        expect = np.stack(
            [np.stack([fs[i][j](D, *theta) for j in range(P)]) for i in range(P)]
        )
        np.testing.assert_allclose(H, expect, atol=OPT["atol"], rtol=OPT["rtol"])
        # symmetry in the parameter axes
        np.testing.assert_allclose(H, np.swapaxes(H, 0, 1), atol=1e-12, rtol=0)


@pytest.mark.parametrize("cls", KERNELS)
def test_jacobian_matches_finite_differences(cls):
    rng = np.random.default_rng(3)
    P = len(cls.param_names)
    for _ in range(OPT["n_draws"]):
        theta = rand_params(rng, P)
        x1, x2 = rand_inputs(rng)
        J = make_kernel(cls, theta).jacobian(x1, x2)
        numJ = approx_deriv(lambda t: make_kernel(cls, t)(x1, x2), theta)
        np.testing.assert_allclose(J, numJ, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("cls", KERNELS)
def test_jacobian_hessian_match_autodiff(cls):
    """The check the reference couldn't do: analytic == jax.jacobian/hessian."""
    rng = np.random.default_rng(4)
    P = len(cls.param_names)
    theta = rand_params(rng, P)
    x1, x2 = rand_inputs(rng)

    def k_of_theta(t):
        return cls(*[t[i] for i in range(P)])(x1, x2)

    t0 = jnp.asarray(theta)
    J = make_kernel(cls, theta).jacobian(x1, x2)
    autoJ = jnp.moveaxis(jax.jacobian(k_of_theta)(t0), -1, 0)
    np.testing.assert_allclose(J, autoJ, atol=1e-9, rtol=1e-8)

    H = make_kernel(cls, theta).hessian(x1, x2)
    autoH = jnp.moveaxis(jax.hessian(k_of_theta)(t0), (-2, -1), (0, 1))
    np.testing.assert_allclose(H, autoH, atol=1e-9, rtol=1e-8)


@pytest.mark.parametrize("cls", KERNELS)
def test_params_roundtrip_copy_and_pytree(cls):
    rng = np.random.default_rng(5)
    P = len(cls.param_names)
    theta = rand_params(rng, P)
    k = make_kernel(cls, theta)
    np.testing.assert_allclose(k.params, theta)

    theta2 = rand_params(rng, P)
    k2 = k.with_params(theta2)
    np.testing.assert_allclose(k2.params, theta2)
    np.testing.assert_allclose(k.params, theta)  # original untouched

    k3 = k.copy()
    np.testing.assert_allclose(k3.params, theta)

    # kernels are pytrees: jit with the kernel as an argument
    x1, x2 = rand_inputs(rng)
    out = jax.jit(lambda kk: kk(x1, x2))(k)
    np.testing.assert_allclose(out, k(x1, x2), atol=1e-12)

    leaves = jax.tree_util.tree_leaves(k)
    assert len(leaves) == P


def test_kernel_symmetry_and_diagonal():
    rng = np.random.default_rng(6)
    x = rng.uniform(-2, 2, size=9)
    for k in (GaussianKernel(1.3, 0.7), PeriodicKernel(1.1, 0.9, 1.7)):
        K = k(x, x)
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        h = float(k.params[0])
        np.testing.assert_allclose(np.diag(K), h ** 2, atol=1e-12)
        # PSD up to jitter
        evals = np.linalg.eigvalsh(np.asarray(K))
        assert evals.min() > -1e-8


def test_hessian_pair_matches_hessian_all_families():
    """kernel.hessian_pair(x1, x2, p, q) == kernel.hessian(x1, x2)[p, q]
    for every parameter pair, across every kernel family — the contract
    the chunked log-lh Hessian assembly relies on (ADVICE r3).  Covers
    the base-class tri-slice default, the ARD override, and the
    Sum/Product composite overrides (incl. zero/cross blocks)."""
    from gaussian_processes_tpu.models.ard import ARDGaussianKernel
    from gaussian_processes_tpu.models.composite import (
        ProductKernel,
        SumKernel,
    )

    rng = np.random.default_rng(11)
    x1, x2 = rand_inputs(rng)
    se = GaussianKernel(jnp.float64(1.3), jnp.float64(0.7))
    per = PeriodicKernel(jnp.float64(1.1), jnp.float64(0.9),
                         jnp.float64(1.7))
    xd1 = rng.uniform(-2, 2, size=(7, 3))
    xd2 = rng.uniform(-2, 2, size=(5, 3))
    kernels = [
        (se, x1, x2),
        (per, x1, x2),
        (Matern32Kernel(jnp.float64(1.2), jnp.float64(0.8)), x1, x2),
        (RationalQuadraticKernel(jnp.float64(1.1), jnp.float64(0.6),
                                 jnp.float64(1.4)), x1, x2),
        (ARDGaussianKernel(h=jnp.float64(1.2),
                           w=jnp.asarray([0.5, 0.9, 1.3], jnp.float64)),
         xd1, xd2),
        (SumKernel(se, per), x1, x2),
        (ProductKernel(se, per), x1, x2),
    ]
    for k, a, b in kernels:
        H = np.asarray(k.hessian(a, b))
        P = k.n_params
        for p in range(P):
            for q in range(P):
                got = np.asarray(k.hessian_pair(a, b, p, q))
                np.testing.assert_allclose(
                    got, H[p, q], atol=1e-12, rtol=1e-10,
                    err_msg=f"{type(k).__name__} pair ({p}, {q})")
