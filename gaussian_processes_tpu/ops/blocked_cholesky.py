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

Numerics: the SYRK/TRSM bulk runs at ``Precision.HIGH`` (3-pass bf16
emulation, ~f32-level error) by default, selectable up to ``HIGHEST``
(6-pass) — never ``DEFAULT``: the round-1 lesson that single-pass-bf16
f32 matmuls carry ~1e-2 noise applies to SYRK updates doubly, since
errors feed back into later panels.  The base-case diagonal-block
inversion adds a
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.scipy.linalg import solve_triangular

_HIGHEST = lax.Precision.HIGHEST

# Matmul precision for the SYRK/TRSM bulk.  On TPU f32: DEFAULT is a
# single bf16 pass (~1e-2 noise — unusable for factorizations, the
# round-1 lesson), HIGH is 3 passes (~f32-level error at ~2x the speed
# of HIGHEST's 6 passes), HIGHEST is 6 passes.  The factorization's own
# f32 rounding already dominates at HIGH, so HIGH is the default; the
# on-chip reconstruction probe (benchmarks/bench_cholesky2.py) and the
# f64 twin tests gate both settings.
_PRECISIONS = {
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
    "default": lax.Precision.DEFAULT,
}


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _split_point(n: int, base: int) -> int:
    """Split n into (n1, n - n1) with n1 a multiple of ``base``, n1 >= n/2.

    Rounding the midpoint *up* to a base multiple keeps every recursive
    sub-problem base-aligned when n itself is (callers pad to ensure it).
    """
    return _round_up(n // 2, base)


_MICRO = 128  # lane width: micro-panel column count


def _chol_vmem_body(a_ref, o_ref):
    """Blocked Cholesky of one (B, B) SPD tile entirely in VMEM.

    Two-level structure chosen for the VPU/MXU split and Mosaic's
    lane-alignment rules (no dynamic indexing along the last dim unless
    128-aligned):

    * the tile is processed in static 128-column micro-panels; panel
      offsets are Python-static, so panel loads/stores and the trailing
      updates are plain static slices;
    * within a panel, a value-carried column loop does the sequential
      work on a (B, 128) register block — masked extraction of column j,
      scale by 1/sqrt(pivot), rank-1 update of the panel's remaining
      columns via a (B,1)x(1,128) broadcast (the pivot row segment is a
      static slice because the panel offset is static);
    * after each panel, one (B,128)x(128,B-p-128) MXU matmul applies the
      trailing update for all later columns at once.

    The whole tile stays resident in VMEM between micro-steps — the HBM
    round-trips XLA's factorization pays per internal panel never happen.
    Columns are written already zeroed above their pivot, so no final
    triangle cleanup is needed.
    """
    B = a_ref.shape[0]
    assert B % _MICRO == 0, "tile size must be a multiple of 128"
    o_ref[:] = a_ref[:]
    rows_b1 = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    cols_bm = jax.lax.broadcasted_iota(jnp.int32, (B, _MICRO), 1)

    for p in range(0, B, _MICRO):  # static unroll over micro-panels
        panel = o_ref[:, p : p + _MICRO]  # (B, 128) value

        def body(j, P, p=p):
            colmask = cols_bm == j
            pivot_row = p + j
            djj = jnp.sum(jnp.where(colmask & (rows_b1 == pivot_row), P, 0.0))
            col = jnp.sum(jnp.where(colmask, P, 0.0), axis=1, keepdims=True)
            c = jnp.where(
                rows_b1 >= pivot_row, col / jnp.sqrt(djj), jnp.zeros_like(col)
            )
            # rank-1 update of the panel's later columns: the factor row
            # segment c[p : p+128] is a static slice of the column vector
            r = jnp.transpose(c[p : p + _MICRO, :])  # (1, 128)
            upd = P - c * r
            newP = jnp.where(cols_bm > j, upd, P)
            return jnp.where(colmask, c, newP)

        panel = lax.fori_loop(0, _MICRO, body, panel)
        o_ref[:, p : p + _MICRO] = panel

        if p + _MICRO < B:
            # trailing MXU update for every later column in one matmul
            tail = o_ref[:, p + _MICRO :]
            o_ref[:, p + _MICRO :] = tail - jnp.dot(
                panel,
                jnp.transpose(panel[p + _MICRO :, :]),
                preferred_element_type=tail.dtype,
                precision=lax.Precision.HIGHEST,  # errors feed later panels
            )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_chol_tile(A: jax.Array, *, interpret: bool) -> jax.Array:
    B = A.shape[0]
    return pl.pallas_call(
        _chol_vmem_body,
        out_shape=jax.ShapeDtypeStruct((B, B), A.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)


@jax.custom_vjp
def _pallas_base_cholesky(A: jax.Array) -> jax.Array:
    interpret = jax.default_backend() != "tpu"
    return _pallas_chol_tile(A, interpret=interpret)


def _pallas_base_fwd(A):
    L = _pallas_base_cholesky(A)
    return L, (L,)


def _pallas_base_bwd(res, Lbar):
    # Pallas kernels carry no AD rule; the base tiles are ~1% of total
    # FLOPs, so the backward pass simply re-derives the cotangent through
    # XLA's cholesky on the reconstructed primal input (A = L L^T).
    (L,) = res
    A = jnp.matmul(L, L.T, precision=_HIGHEST)
    _, vjp = jax.vjp(jnp.linalg.cholesky, A)
    (Abar,) = vjp(Lbar)
    return (Abar,)


_pallas_base_cholesky.defvjp(_pallas_base_fwd, _pallas_base_bwd)


def _base_cholesky(A: jax.Array, base_impl: str = "xla") -> jax.Array:
    """Factor one base panel.

    ``base_impl="xla"``: XLA's cholesky (safe default).
    ``base_impl="pallas"``: the in-VMEM Pallas column-loop kernel above —
    the O(N/base) sequential base panels are ~1% of total FLOPs but sit
    on the critical path between the big SYRK/TRSM matmuls, so their
    latency matters at small base sizes (measured in
    benchmarks/bench_cholesky2.py).
    """
    if base_impl == "pallas":
        return _pallas_base_cholesky(A)
    return jnp.linalg.cholesky(A)


def _base_inv_lower(L: jax.Array) -> jax.Array:
    """L^-1 for a small lower-triangular block (trtri)."""
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return solve_triangular(L, eye, lower=True)


def _assemble_cols(B, X1, X2, n1, assembly):
    if assembly == "update":
        # preallocate-and-write: XLA can lower .at[].set into in-place
        # dynamic-update-slices, avoiding the concat's extra copies
        return jnp.zeros_like(B).at[:, :n1].set(X1).at[:, n1:].set(X2)
    return jnp.concatenate([X1, X2], axis=1)


def _trsm_right_lt(B: jax.Array, L: jax.Array, base: int, prec=_HIGHEST,
                   assembly: str = "concat") -> jax.Array:
    """X such that X @ L.T = B, with L lower triangular (n, n), B (m, n).

    Recursive: block-forward substitution where every step is a GEMM.
    """
    n = L.shape[0]
    if n <= base:
        inv_L = _base_inv_lower(L)
        return jnp.matmul(B, inv_L.T, precision=prec)
    n1 = _split_point(n, base)
    L11 = L[:n1, :n1]
    L21 = L[n1:, :n1]
    L22 = L[n1:, n1:]
    X1 = _trsm_right_lt(B[:, :n1], L11, base, prec, assembly)
    B2 = B[:, n1:] - jnp.matmul(X1, L21.T, precision=prec)
    X2 = _trsm_right_lt(B2, L22, base, prec, assembly)
    return _assemble_cols(B, X1, X2, n1, assembly)


def _chol_recursive(A: jax.Array, base: int, base_impl: str, prec=_HIGHEST,
                    assembly: str = "concat") -> jax.Array:
    n = A.shape[0]
    if n <= base:
        return _base_cholesky(A, base_impl)
    n1 = _split_point(n, base)
    A11 = A[:n1, :n1]
    A21 = A[n1:, :n1]
    A22 = A[n1:, n1:]
    L11 = _chol_recursive(A11, base, base_impl, prec, assembly)
    L21 = _trsm_right_lt(A21, L11, base, prec, assembly)
    S = A22 - jnp.matmul(L21, L21.T, precision=prec)
    L22 = _chol_recursive(S, base, base_impl, prec, assembly)
    if assembly == "update":
        out = jnp.zeros_like(A)
        out = out.at[:n1, :n1].set(L11)
        out = out.at[n1:, :n1].set(L21)
        return out.at[n1:, n1:].set(L22)
    top = jnp.concatenate(
        [L11, jnp.zeros((n1, n - n1), dtype=A.dtype)], axis=1
    )
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "base", "base_impl", "precision", "assembly", "algo", "super_base"
    ),
)
def cholesky_blocked(
    A: jax.Array, *, base: int = 512, base_impl: str = "xla",
    precision: str = "high", assembly: str = "concat",
    algo: str = "leftlook", super_base: int = 2048,
) -> jax.Array:
    """Lower Cholesky factor of SPD ``A``, MXU-oriented blocked algorithm.

    Drop-in for ``jnp.linalg.cholesky`` (returns the lower factor; the
    strict upper triangle is exactly zero).  ``base`` is the panel size at
    which recursion stops; 256–1024 are sensible on v5e (measured in
    benchmarks/bench_cholesky.py).

    Inputs of size not a multiple of ``base`` are padded with an identity
    corner — chol(diag(A, I)) = diag(chol(A), I) — and sliced back, so
    shapes stay MXU-aligned throughout.

    ``algo`` selects the skeleton: ``"recursive"`` (divide-and-conquer,
    per-level re-assembly controlled by ``assembly``) or ``"leftlook"``
    (single-buffer left-looking panels, minimal copy traffic — see
    ``_chol_leftlook``).
    """
    n = A.shape[0]
    pad_unit = super_base if algo == "leftlook2" else base
    n_pad = _round_up(max(n, pad_unit), pad_unit)
    if n_pad != n:
        pad = n_pad - n
        A = jnp.block(
            [
                [A, jnp.zeros((n, pad), A.dtype)],
                [jnp.zeros((pad, n), A.dtype), jnp.eye(pad, dtype=A.dtype)],
            ]
        )
    if algo == "leftlook":
        L = _chol_leftlook(A, base, base_impl, _PRECISIONS[precision])
    elif algo == "leftlook2":
        L = _chol_leftlook2(
            A, base, super_base, base_impl, _PRECISIONS[precision]
        )
    else:
        L = _chol_recursive(
            A, base, base_impl, _PRECISIONS[precision], assembly
        )
    return L[:n, :n]


def solve_triangular_blocked(
    L: jax.Array,
    B: jax.Array,
    *,
    lower: bool = True,
    trans: bool = False,
    base: int = 512,
    precision: str = "highest",
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
    prec = _PRECISIONS[precision]
    if trans:
        X = _trsm_right_lo(B.T, L, base, prec).T
    else:
        X = _trsm_right_lt(B.T, L, base, prec).T
    return X[:, 0] if vec else X


def _trsm_right_lo(B: jax.Array, L: jax.Array, base: int, prec=_HIGHEST) -> jax.Array:
    """X such that X @ L = B, with L lower triangular (back substitution)."""
    n = L.shape[0]
    if n <= base:
        inv_L = _base_inv_lower(L)
        return jnp.matmul(B, inv_L, precision=prec)
    n1 = _split_point(n, base)
    L11 = L[:n1, :n1]
    L21 = L[n1:, :n1]
    L22 = L[n1:, n1:]
    X2 = _trsm_right_lo(B[:, n1:], L22, base, prec)
    B1 = B[:, :n1] - jnp.matmul(X2, L21, precision=prec)
    X1 = _trsm_right_lo(B1, L11, base, prec)
    return jnp.concatenate([X1, X2], axis=1)


def cholesky_solve_blocked(
    L: jax.Array, B: jax.Array, *, base: int = 512
) -> jax.Array:
    """(L L^T)^-1 B via two blocked triangular solves."""
    Z = solve_triangular_blocked(L, B, trans=False, base=base)
    return solve_triangular_blocked(L, Z, trans=True, base=base)


def _chol_leftlook(A: jax.Array, base: int, base_impl: str, prec) -> jax.Array:
    """Left-looking blocked Cholesky with a single preallocated output.

    The recursive skeleton above re-assembles its result at every
    recursion level (concat or whole-matrix ``.at`` writes), costing
    O(N^2 * levels) of HBM copy traffic on top of the matmuls — measured
    at ~25 ms of the 63 ms total at N=16k (benchmarks/bench_parts.py).
    This variant eliminates the re-assembly: the factor lives in ONE
    buffer and each (N, base) column strip is written exactly once at its
    final offset (an in-place dynamic-update-slice for XLA), so total
    non-matmul write traffic is ~N^2 elements.

    Per panel k (row offset r = k*base), the left-looking update folds
    every prior panel's contribution into one large GEMM:

        strip = A[r:, r:r+b] - L[r:, :r] @ L[r:r+b, :r]^T   (GEMM)
        L_kk  = chol(strip[:b])                              (base panel)
        L[r+b:, k-strip] = strip[b:] @ L_kk^-T               (trtri+GEMM)

    All shapes are static (the loop unrolls at trace time: N/base
    iterations).  FLOPs are identical to the recursive form (N^3/3, all
    in GEMMs); what changes is the copy traffic and the absence of the
    materialized trailing Schur complements.
    """
    n = A.shape[0]
    nb = n // base
    out = jnp.zeros_like(A)
    for k in range(nb):
        r = k * base
        a_strip = A[r:, r : r + base]
        if k > 0:
            done = out[r:, :r]          # (n-r, r) factor columns so far
            top = out[r : r + base, :r]  # (base, r)
            a_strip = a_strip - jnp.matmul(done, top.T, precision=prec)
        Lkk = _base_cholesky(a_strip[:base], base_impl)
        if k + 1 < nb:
            inv_Lkk = _base_inv_lower(Lkk)
            rest = jnp.matmul(a_strip[base:], inv_Lkk.T, precision=prec)
            strip = jnp.concatenate([Lkk, rest], axis=0)
        else:
            strip = Lkk
        out = lax.dynamic_update_slice(out, strip, (r, r))
    return out


def _chol_leftlook2(
    A: jax.Array, base: int, super_: int, base_impl: str, prec
) -> jax.Array:
    """Two-level left-looking Cholesky: superpanel GEMMs + inner panels.

    ``_chol_leftlook`` launches one left-looking GEMM per ``base``-wide
    panel — at N=16k, base=512 that is 32 sequential (N-r, r)@(r, 512)
    GEMMs, each of which drains the MXU pipeline before the (serial)
    base factorization can start.  Here the left-looking update is
    hoisted to ``super_``-wide superpanels: ONE (N-R, R)@(R, super_)
    GEMM folds all prior columns into the strip (fewer launches, wider
    stationary operand), and only the intra-strip updates — small
    (N-r, <super_)@(<super_, base) GEMMs — remain at panel granularity.
    FLOPs are unchanged (N^3/3); what changes is launch count and GEMM
    aspect ratio.

    MEASURED VERDICT (round 2, chip probe_chol3): N=8192 f32,
    super_=2048: 47.7 ms vs one-level leftlook's 43.2 ms — the wider
    outer GEMM does NOT pay for the extra intra-strip skinny GEMMs and
    strip re-assembly, and compile time roughly doubles (the strip loop
    unrolls twice).  ``leftlook`` stays the default; this variant is
    kept as the measured data point (f64-exact, tested).
    """
    n = A.shape[0]
    assert n % super_ == 0 and super_ % base == 0
    out = jnp.zeros_like(A)
    for K in range(n // super_):
        R = K * super_
        s_here = min(super_, n - R)
        strip = A[R:, R : R + s_here]
        if K > 0:
            strip = strip - jnp.matmul(
                out[R:, :R], out[R : R + s_here, :R].T, precision=prec
            )
        # factor the (n-R, s_here) strip in place, base panels at a time
        for k in range(s_here // base):
            r = k * base
            sub = strip[r:, r : r + base]
            if k > 0:
                sub = sub - jnp.matmul(
                    strip[r:, :r], strip[r : r + base, :r].T, precision=prec
                )
            Lkk = _base_cholesky(sub[:base], base_impl)
            if r + base < n - R:
                inv_Lkk = _base_inv_lower(Lkk)
                rest = jnp.matmul(sub[base:], inv_Lkk.T, precision=prec)
                col = jnp.concatenate([Lkk, rest], axis=0)
            else:
                col = Lkk
            strip = lax.dynamic_update_slice(strip, col, (r, r))
        # zero the strict upper triangle of the strip's top block
        tri = jnp.tril(jnp.ones((s_here, s_here), A.dtype))
        strip = strip.at[:s_here].multiply(tri)
        out = lax.dynamic_update_slice(out, strip, (R, R))
    return out


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


def _xla_solve(L, B, *, trans=False):
    return solve_triangular(L, B, lower=True, trans=1 if trans else 0)


def _blocked_solve(L, B, *, trans=False):
    return solve_triangular_blocked(L, B, trans=trans)


def choose_solve(n: int, backend: Optional[str] = None):
    """The lower-triangular solve the hot paths should use at size ``n``.

    Returns ``solve(L, B, *, trans=False)`` solving L X = B (or
    L^T X = B with ``trans=True``) for lower-triangular L.  TPU + large
    n -> the GEMM-structured blocked TRSM; otherwise XLA's native solve.

    Round-3 chip measurements at n=16384 f32 (benchmarks/
    probe_solve_r3.py, fetch-synchronized): the alpha path's two 1-RHS
    solves 13.4 ms (XLA) vs 2.0 ms (blocked); a 2048-RHS solve 36 ms vs
    22 ms; the LOO/gradient paths' n-RHS solve L^-1 I 171 ms blocked
    (25.8 Tf/s) while XLA's fails to COMPILE (its internal
    dynamic-update-slice scheme wants a 64 GB temp).  Blocked wins at
    every RHS count at this size, so the dispatch is on n alone, same
    threshold as ``choose_cholesky``.
    """
    if backend is None:
        backend = jax.default_backend()
    if backend == "tpu" and n >= _BLOCKED_MIN_N:
        return _blocked_solve
    return _xla_solve
