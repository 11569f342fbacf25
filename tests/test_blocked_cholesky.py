"""Twin tests for the MXU-blocked Cholesky (ops/blocked_cholesky.py).

The TPU analogue of the reference's "native code matches math" gate
(SURVEY.md §5 item 2): the blocked factorization must match
``jnp.linalg.cholesky`` in f64 at 1e-8 relative (VERDICT r1 item 1's
acceptance bar), across sizes that are and are not multiples of the base
panel, and its solves must match scipy.  Runs on the CPU backend in f64
(conftest.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.linalg

from gaussian_processes_tpu.ops.blocked_cholesky import (
    cholesky_blocked,
    cholesky_solve_blocked,
    choose_cholesky,
    solve_triangular_blocked,
)


def _spd(n, rng, kind="kernel"):
    if kind == "kernel":
        x = np.sort(rng.uniform(-np.pi, np.pi, n))
        d = x[:, None] - x[None, :]
        return np.exp(-0.5 * d * d / 0.5**2) + 0.01 * np.eye(n)
    X = rng.standard_normal((n, n))
    return X @ X.T + n * np.eye(n)


@pytest.mark.parametrize("n", [64, 256, 300, 700, 1024, 1500])
@pytest.mark.parametrize("kind", ["kernel", "random"])
def test_matches_xla_cholesky_f64(n, kind):
    rng = np.random.default_rng(n)
    A = jnp.asarray(_spd(n, rng, kind))
    L_ref = jnp.linalg.cholesky(A)
    L = cholesky_blocked(A, base=256)
    rel = jnp.linalg.norm(L - L_ref) / jnp.linalg.norm(L_ref)
    assert float(rel) < 1e-8
    # strict upper triangle exactly zero
    assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0


@pytest.mark.parametrize("n", [256, 700, 1024, 1500])
@pytest.mark.parametrize("kind", ["kernel", "random"])
def test_leftlook_matches_xla_cholesky_f64(n, kind):
    # single-buffer left-looking skeleton: same 1e-8 f64 gate as the
    # recursive form, plus exact-zero strict upper triangle
    rng = np.random.default_rng(n + 1)
    A = jnp.asarray(_spd(n, rng, kind))
    L_ref = jnp.linalg.cholesky(A)
    L = cholesky_blocked(A, base=256, algo="leftlook")
    rel = jnp.linalg.norm(L - L_ref) / jnp.linalg.norm(L_ref)
    assert float(rel) < 1e-8
    assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0


@pytest.mark.parametrize("n", [512, 1100, 2048])
@pytest.mark.parametrize("super_base", [512, 1024])
def test_leftlook2_matches_xla_cholesky_f64(n, super_base):
    # two-level superpanel skeleton (measured slower on chip — kept as
    # a tested, documented variant; see _chol_leftlook2's verdict)
    rng = np.random.default_rng(n + 2)
    A = jnp.asarray(_spd(n, rng, "kernel"))
    L_ref = jnp.linalg.cholesky(A)
    L = cholesky_blocked(
        A, base=256, algo="leftlook2", super_base=super_base
    )
    rel = jnp.linalg.norm(L - L_ref) / jnp.linalg.norm(L_ref)
    assert float(rel) < 1e-8
    assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0


@pytest.mark.parametrize("base", [128, 256, 512])
def test_base_size_invariance(base):
    rng = np.random.default_rng(7)
    A = jnp.asarray(_spd(777, rng))
    L_ref = jnp.linalg.cholesky(A)
    L = cholesky_blocked(A, base=base)
    rel = jnp.linalg.norm(L - L_ref) / jnp.linalg.norm(L_ref)
    assert float(rel) < 1e-8


def test_small_matrix_padding_path():
    # n < base exercises the identity-padding corner
    rng = np.random.default_rng(3)
    A = jnp.asarray(_spd(37, rng, "random"))
    L = cholesky_blocked(A, base=256)
    np.testing.assert_allclose(
        np.asarray(L), np.linalg.cholesky(np.asarray(A)), rtol=1e-10, atol=1e-10
    )


@pytest.mark.parametrize("trans", [False, True])
@pytest.mark.parametrize("nrhs", [0, 1, 5])
def test_blocked_triangular_solve(trans, nrhs):
    rng = np.random.default_rng(11)
    n = 700
    A = _spd(n, rng)
    L = np.linalg.cholesky(A)
    B = rng.standard_normal((n, nrhs)) if nrhs else rng.standard_normal(n)
    X = solve_triangular_blocked(
        jnp.asarray(L), jnp.asarray(B), trans=trans, base=256
    )
    X_ref = scipy.linalg.solve_triangular(L, B, lower=True, trans=1 if trans else 0)
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-9, atol=1e-11)


def test_cholesky_solve_blocked():
    rng = np.random.default_rng(13)
    n = 900
    A = _spd(n, rng)
    L = np.linalg.cholesky(A)
    b = rng.standard_normal(n)
    z = cholesky_solve_blocked(jnp.asarray(L), jnp.asarray(b), base=256)
    np.testing.assert_allclose(np.asarray(z), np.linalg.solve(A, b), rtol=1e-8)


def test_autodiff_through_blocked_cholesky():
    """jax.grad flows through the blocked factorization and agrees with
    grad through XLA's cholesky — the MLE/NUTS layers depend on this."""
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(-1, 1, 300))
    y = np.sin(3 * x) + 0.1 * rng.standard_normal(300)
    x, y = jnp.asarray(x), jnp.asarray(y)

    def lml(w, chol):
        d = x[:, None] - x[None, :]
        K = jnp.exp(-0.5 * d * d / (w * w)) + 0.01 * jnp.eye(300)
        L = chol(K)
        alpha = cholesky_solve_blocked(L, y, base=256) if chol is not jnp.linalg.cholesky \
            else jax.scipy.linalg.cho_solve((L, True), y)
        return -0.5 * y @ alpha - jnp.sum(jnp.log(jnp.diagonal(L)))

    g_blocked = jax.grad(lambda w: lml(w, lambda A: cholesky_blocked(A, base=256)))(0.7)
    g_xla = jax.grad(lambda w: lml(w, jnp.linalg.cholesky))(0.7)
    np.testing.assert_allclose(float(g_blocked), float(g_xla), rtol=1e-7)


@pytest.mark.parametrize("n", [128, 256, 640])
def test_pallas_base_cholesky_twin(n):
    """The in-VMEM Pallas column-loop panel factorization (interpret mode
    on CPU) must match XLA's cholesky to f64 round-off, standalone and
    inside the recursion."""
    rng = np.random.default_rng(n)
    A = jnp.asarray(_spd(n, rng, "random"))
    L_ref = jnp.linalg.cholesky(A)
    L = cholesky_blocked(A, base=128, base_impl="pallas")
    rel = jnp.linalg.norm(L - L_ref) / jnp.linalg.norm(L_ref)
    assert float(rel) < 1e-10
    assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0


def test_pallas_base_cholesky_grad():
    """custom_vjp through the Pallas base (bwd re-derives via XLA's
    cholesky on L L^T) matches grad through the pure-XLA path."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(np.sort(rng.uniform(-1, 1, 200)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)))

    def lml(w, base_impl):
        d = x[:, None] - x[None, :]
        K = jnp.exp(-0.5 * d * d / (w * w)) + 0.01 * jnp.eye(200)
        L = cholesky_blocked(K, base=128, base_impl=base_impl)
        alpha = cholesky_solve_blocked(L, y, base=128)
        return -0.5 * y @ alpha - jnp.sum(jnp.log(jnp.diagonal(L)))

    g_p = jax.grad(lambda w: lml(w, "pallas"))(0.6)
    g_x = jax.grad(lambda w: lml(w, "xla"))(0.6)
    np.testing.assert_allclose(float(g_p), float(g_x), rtol=1e-8)


def test_choose_cholesky_dispatch():
    assert choose_cholesky(500, backend="cpu") is jnp.linalg.cholesky
    assert choose_cholesky(16384, backend="cpu") is jnp.linalg.cholesky
    assert choose_cholesky(500, backend="tpu") is jnp.linalg.cholesky
    assert choose_cholesky(16384, backend="tpu") is cholesky_blocked


def test_choose_solve_dispatch_and_parity():
    """choose_solve routes by (backend, n) and both branches solve the
    same system to f64 tightness (VERDICT r2 item 1: the blocked TRSM is
    now the production solve on TPU at large n)."""
    from gaussian_processes_tpu.ops.blocked_cholesky import (
        _blocked_solve,
        _xla_solve,
        choose_solve,
    )

    assert choose_solve(500, backend="cpu") is _xla_solve
    assert choose_solve(16384, backend="cpu") is _xla_solve
    assert choose_solve(500, backend="tpu") is _xla_solve
    assert choose_solve(16384, backend="tpu") is _blocked_solve

    rng = np.random.default_rng(3)
    n = 700  # not a multiple of the base: exercises the recursion splits
    A = rng.standard_normal((n, 64))
    K = A @ A.T / 64 + np.eye(n)
    L = np.linalg.cholesky(K)
    for shape in ((n,), (n, 5)):
        b = rng.standard_normal(shape)
        for trans in (False, True):
            xb = _blocked_solve(jnp.asarray(L), jnp.asarray(b), trans=trans)
            xx = _xla_solve(jnp.asarray(L), jnp.asarray(b), trans=trans)
            np.testing.assert_allclose(xb, xx, rtol=1e-9, atol=1e-11)
