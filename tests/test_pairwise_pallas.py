"""Pallas tiled kernel-build vs jnp twin (SURVEY.md §5 Tier 0:
"every Pallas kernel gets a pure-jnp twin and an allclose test" — the
TPU analogue of the reference's Cython-vs-sympy gate).

Runs in interpreter mode on the CPU backend; the same pallas_call
compiles natively on TPU (exercised by the benchmark harness).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import (
    GaussianKernel,
    Matern32Kernel,
    Matern52Kernel,
    PeriodicKernel,
    RationalQuadraticKernel,
    build_kxx,
)
from gaussian_processes_tpu.ops.pairwise import (
    pairwise_matrix,
    pairwise_matrix_reference,
)


def _kernels():
    return [
        GaussianKernel(h=jnp.asarray(1.3), w=jnp.asarray(0.7)),
        PeriodicKernel(h=jnp.asarray(0.9), w=jnp.asarray(1.1), p=jnp.asarray(2.0)),
        Matern32Kernel(h=jnp.asarray(1.1), w=jnp.asarray(0.9)),
        Matern52Kernel(h=jnp.asarray(0.8), w=jnp.asarray(1.3)),
        RationalQuadraticKernel(h=jnp.asarray(1.0), w=jnp.asarray(0.8),
                                a=jnp.asarray(1.5)),
    ]


@pytest.mark.parametrize("kernel", _kernels(), ids=["se", "periodic", "m32", "m52", "rq"])
@pytest.mark.parametrize(
    "n,m,block",
    [
        (64, 64, (8, 128)),      # shapes below one block (padding path)
        (300, 200, (128, 128)),  # non-divisible by block
        (512, 384, (256, 128)),  # divisible
    ],
)
def test_pairwise_matches_jnp_twin(kernel, n, m, block):
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(np.sort(rng.uniform(-3, 3, n)))
    x2 = jnp.asarray(np.sort(rng.uniform(-3, 3, m)))
    got = pairwise_matrix(kernel, x1, x2, block=block, interpret=True)
    want = pairwise_matrix_reference(kernel, x1, x2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


@pytest.mark.parametrize("kernel", _kernels(), ids=["se", "periodic", "m32", "m52", "rq"])
def test_pairwise_with_noise_diag_matches_build_kxx(kernel):
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.sort(rng.uniform(-3, 3, 200)))
    got = pairwise_matrix(
        kernel, x, x, noise=0.3, jitter=1e-6, block=(128, 128), interpret=True
    )
    want = build_kxx(kernel, x, 0.3, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_pairwise_f32():
    kernel = GaussianKernel(h=jnp.float32(1.0), w=jnp.float32(0.5))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-2, 2, 150), jnp.float32)
    got = pairwise_matrix(kernel, x, x, block=(128, 128), interpret=True)
    want = pairwise_matrix_reference(kernel, x, x)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("kernel", _kernels(), ids=["se", "periodic", "m32", "m52", "rq"])
def test_pairwise_jacobian_matches_analytic(kernel):
    from gaussian_processes_tpu.ops.pairwise import pairwise_jacobian

    rng = np.random.default_rng(3)
    x1 = jnp.asarray(np.sort(rng.uniform(-3, 3, 100)))
    x2 = jnp.asarray(np.sort(rng.uniform(-3, 3, 70)))
    got = pairwise_jacobian(kernel, x1, x2, block=(8, 128), interpret=True)
    want = kernel.jacobian(x1, x2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9,
                               atol=1e-14)


@pytest.mark.parametrize("kernel", _kernels(), ids=["se", "periodic", "m32", "m52", "rq"])
def test_pairwise_hessian_matches_analytic(kernel):
    from gaussian_processes_tpu.ops.pairwise import pairwise_hessian

    rng = np.random.default_rng(4)
    x1 = jnp.asarray(np.sort(rng.uniform(-3, 3, 72)))
    got = pairwise_hessian(kernel, x1, x1, block=(8, 128), interpret=True)
    want = kernel.hessian(x1, x1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9,
                               atol=1e-14)
