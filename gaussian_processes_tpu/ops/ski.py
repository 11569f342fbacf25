"""Structured kernel interpolation (SKI / KISS-GP) for arbitrary 1-D inputs.

The Toeplitz/FFT path (ops/toeplitz.py) needs the training inputs on a
uniform grid.  SKI (Wilson & Nickisch 2015, "Kernel interpolation for
scalable structured Gaussian processes") removes that restriction: place
an m-point inducing grid g over the data range and approximate

    K(x, x)  ~=  W K(g, g) W^T

where W (n x m) holds local cubic-convolution interpolation weights —
each row has exactly 4 nonzeros.  K(g, g) is symmetric Toeplitz for any
stationary kernel, so a matvec with the approximate train covariance is

    (W K_g W^T + s^2 I) v  =  gather/scatter (O(n))  +  FFT (O(m log m))

— sub-quadratic for ANY input layout, the "exploit structure before
brute force" trick extended off the grid.  TPU mapping: W^T v is one
XLA scatter-add, W v one gather+weighted-sum (both bandwidth-bound,
tiny next to the FFTs); the Toeplitz core rides jnp.fft exactly like
ops/toeplitz.py.

Derivatives come along as in the Toeplitz path: dK_g/dtheta_p of a
stationary kernel is Toeplitz too, so the Hutchinson gradient's
J_p-matvecs are W T_{J_p} W^T products (models/iterative_gp.py,
``structure="ski"``).

Accuracy model: cubic convolution interpolation has O(h^3) local error
in the grid spacing h (exact on quadratics), so K_ski -> K rapidly as m
grows; the operator W K_g W^T is PSD by construction (congruence), so
A = K_ski + s^2 I is always SPD and CG is safe even when the
interpolation error is visible.  Tests (tests/test_ski.py) gate the
matvec against the densely assembled W K_g W^T exactly and the fit
against the dense exact GP as the grid refines.

f32 scale limitation (measured on chip + CPU, round 2): at n ~ 6e4+
with a smooth right-hand side, preconditioned f32 CG through the SKI
operator stalls at ~1e-2..1e-1 relative residual (the f32 CG noise
floor eps * ||A|| * ||x|| / ||b|| — the same instance solves to 2e-2 on
CPU f32 and 4e-11 in f64).  For solves tighter than prediction-level
accuracy at that scale, run the solve in f64 (CPU) or shrink per-solve
n (data sharding).  At n <= ~2e4 f32 converges fully (drive-verified).

The reference library has no analogue (SURVEY.md §1 — exact dense GP
only); this extends its exact-1D-regression capability to N far past
the dense wall on scattered inputs, complementing ``structure="toeplitz"``
on gridded ones.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gaussian_processes_tpu.models.base import Kernel
from gaussian_processes_tpu.ops import toeplitz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SKIOperator:
    """Frozen interpolation geometry: grid + 4-tap weights per input.

    ``grid``: (m,) uniform inducing grid; ``idx``: (n,) int32 base index
    of each input's 4-tap stencil; ``w``: (n, 4) cubic-convolution
    weights (rows sum to 1).  The kernel/noise are NOT stored — the same
    geometry serves every hyperparameter value, so MLE/NUTS build it
    once per dataset.
    """

    grid: jax.Array
    idx: jax.Array
    w: jax.Array

    @property
    def m(self) -> int:
        return self.grid.shape[0]

    @property
    def n(self) -> int:
        return self.idx.shape[0]


def make_grid(x, num_points: int, dtype=None) -> jax.Array:
    """Uniform inducing grid covering x with a 2-cell margin each side.

    The margin keeps every input's 4-tap cubic stencil interior, so no
    boundary special-casing exists anywhere downstream.
    """
    x = jnp.asarray(x)
    if dtype is None:
        dtype = x.dtype
    if num_points < 8:
        raise ValueError(f"SKI grid needs >= 8 points, got {num_points}")
    lo = jnp.min(x)
    hi = jnp.max(x)
    span = jnp.maximum(hi - lo, jnp.asarray(1e-12, x.dtype))
    # 2-cell margin on each side out of num_points total cells
    dx = span / (num_points - 5)
    return (lo - 2.0 * dx + dx * jnp.arange(num_points)).astype(dtype)


def _cubic_weights(t: jax.Array) -> jax.Array:
    """Keys cubic-convolution weights (a = -1/2) for fractional offset t.

    ``t`` in [0, 1) is the position between stencil points 1 and 2 of the
    4-tap stencil; returns (..., 4) weights for taps at distances
    (1 + t, t, 1 - t, 2 - t).  Exact on quadratics; rows sum to 1.
    """
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def interpolation_weights(x, grid: jax.Array) -> SKIOperator:
    """Build the (idx, w) sparse representation of W for inputs x.

    Requires the grid from ``make_grid`` (uniform, 2-cell margins); every
    x must lie within [grid[1], grid[m-3]] — guaranteed by construction.
    """
    x = jnp.asarray(x)
    grid = jnp.asarray(grid)
    m = grid.shape[0]
    dx = grid[1] - grid[0]
    pos = (x - grid[0]) / dx
    # clamp the CONTINUOUS position, not just the stencil base: an input
    # outside the grid range used to keep its unclamped fractional
    # offset t >> 1, where the cubic weights blow up polynomially
    # (measured: weights ~1e4 one grid-length out) — silent prediction
    # explosions for extrapolating queries.  Clamping pos snaps
    # out-of-range points to the grid edge (constant extrapolation of
    # the interpolant), the honest behavior for a surrogate whose
    # inducing grid is the model; margins make this a no-op in range.
    pos = jnp.clip(pos, 1.0, m - 2.0)
    base = jnp.floor(pos).astype(jnp.int32)
    base = jnp.clip(base, 1, m - 3)
    t = pos - base.astype(pos.dtype)
    w = _cubic_weights(t).astype(x.dtype)
    return SKIOperator(grid=grid, idx=base - 1, w=w)


def interp_matvec(op: SKIOperator, vg: jax.Array) -> jax.Array:
    """W @ vg: gather the 4 stencil values per row, weight, sum.

    ``vg``: (m,) or (m, r) grid-space vector(s) -> (n,) / (n, r).
    """
    squeeze = vg.ndim == 1
    v2 = vg[:, None] if squeeze else vg
    rows = op.idx[:, None] + jnp.arange(4)[None, :]  # (n, 4)
    gath = v2[rows]  # (n, 4, r)
    out = jnp.einsum("nk,nkr->nr", op.w, gath,
                     precision=jax.lax.Precision.HIGHEST)
    return out[:, 0] if squeeze else out


def interp_rmatvec(op: SKIOperator, vn: jax.Array) -> jax.Array:
    """W^T @ vn: scatter-add each input's weighted value into its 4 taps.

    ``vn``: (n,) or (n, r) -> (m,) / (m, r).
    """
    squeeze = vn.ndim == 1
    v2 = vn[:, None] if squeeze else vn
    r = v2.shape[1]
    rows = (op.idx[:, None] + jnp.arange(4)[None, :]).reshape(-1)  # (4n,)
    vals = (op.w[:, :, None] * v2[:, None, :]).reshape(-1, r)  # (4n, r)
    out = jnp.zeros((op.m, r), v2.dtype).at[rows].add(vals)
    return out[:, 0] if squeeze else out


def ski_matvec(
    op: SKIOperator, col: jax.Array, v: jax.Array, shift=0.0
) -> jax.Array:
    """(W T W^T + shift I) @ v with T = sym. Toeplitz from first col ``col``.

    O(n) gather/scatter + O(m log m) FFT; ``v``: (n,) or (n, r).
    """
    core = toeplitz.toeplitz_matvec(col, interp_rmatvec(op, v))
    out = interp_matvec(op, core)
    return out + jnp.asarray(shift, out.dtype) * v


def kernel_matvec_ski(
    kernel: Kernel, op: SKIOperator, v: jax.Array, noise, jitter: float = 0.0
) -> jax.Array:
    """(K_ski(x, x) + (noise^2 + jitter) I) @ v — drop-in for kernel_matvec."""
    col = toeplitz.toeplitz_column(kernel, op.grid)
    shift = jnp.square(jnp.asarray(noise)) + jitter
    return ski_matvec(op, col, v, shift)


def ski_dense(kernel: Kernel, op: SKIOperator) -> jax.Array:
    """Densely assembled W K_g W^T — test oracle only (O(n m + m^2))."""
    Kg = kernel(op.grid, op.grid)
    return interp_matvec(op, interp_matvec(op, Kg).T)


# --- D-dimensional SKI: scattered (n, D) inputs on a Kronecker grid ---------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SKIKronOperator:
    """SKI geometry over a D-dim Cartesian inducing grid (full KISS-GP).

    Each input row interpolates from a 4^D-tap tensor-product cubic
    stencil: ``kron`` holds the per-dimension grids (ops/kronecker.py
    layout, row-major), ``idx`` (n, D) the per-dim base indices, ``w``
    (n, 4, D) the per-dim 4-tap weights; the combined weight of tap
    (j_1..j_D) is prod_d w[:, j_d, d].  Matvec cost: O(4^D n) gather/
    scatter + O(m log m) FFT sweeps, m = prod(m_d).
    """

    kron: "object"  # kronecker.KronOperator (import cycle avoided)
    idx: jax.Array  # (n, D) int32
    w: jax.Array  # (n, 4, D)

    @property
    def n(self) -> int:
        return self.idx.shape[0]

    @property
    def ndim(self) -> int:
        return self.idx.shape[1]


def interpolation_weights_nd(x, axes) -> SKIKronOperator:
    """Build D-dim SKI geometry for scattered (n, D) inputs.

    ``axes``: per-dimension uniform grids from ``make_grid`` (each with
    its 2-cell margin, so every stencil is interior).
    """
    from gaussian_processes_tpu.ops import kronecker

    x = jnp.atleast_2d(jnp.asarray(x))
    ops1d = [interpolation_weights(x[:, d], jnp.asarray(g))
             for d, g in enumerate(axes)]
    idx = jnp.stack([o.idx for o in ops1d], axis=-1)  # (n, D)
    w = jnp.stack([o.w for o in ops1d], axis=-1)  # (n, 4, D)
    kron = kronecker.KronOperator(axes=tuple(jnp.asarray(g) for g in axes))
    return SKIKronOperator(kron=kron, idx=idx, w=w)


def _nd_taps(op: SKIKronOperator):
    """Flat grid index (n, 4^D) and combined weight (n, 4^D) per tap."""
    import itertools

    sizes = op.kron.shape
    D = op.ndim
    strides = []
    s = 1
    for d in reversed(range(D)):
        strides.insert(0, s)
        s *= sizes[d]
    rows = []
    wts = []
    for taps in itertools.product(range(4), repeat=D):
        flat = sum((op.idx[:, d] + taps[d]) * strides[d] for d in range(D))
        cw = op.w[:, taps[0], 0]
        for d in range(1, D):
            cw = cw * op.w[:, taps[d], d]
        rows.append(flat)
        wts.append(cw)
    return jnp.stack(rows, axis=-1), jnp.stack(wts, axis=-1)  # (n, 4^D) x2


def interp_matvec_nd(op: SKIKronOperator, vg: jax.Array) -> jax.Array:
    """W @ vg, vg (m,) or (m, r) flat grid vector (row-major)."""
    rows, wts = _nd_taps(op)
    squeeze = vg.ndim == 1
    v2 = vg[:, None] if squeeze else vg
    gath = v2[rows]  # (n, T, r)
    out = jnp.einsum("nt,ntr->nr", wts, gath,
                     precision=jax.lax.Precision.HIGHEST)
    return out[:, 0] if squeeze else out


def interp_rmatvec_nd(op: SKIKronOperator, vn: jax.Array) -> jax.Array:
    """W^T @ vn -> flat grid vector (m,) / (m, r)."""
    import math

    rows, wts = _nd_taps(op)
    m = math.prod(op.kron.shape)
    squeeze = vn.ndim == 1
    v2 = vn[:, None] if squeeze else vn
    r = v2.shape[1]
    vals = (wts[:, :, None] * v2[:, None, :]).reshape(-1, r)
    out = jnp.zeros((m, r), v2.dtype).at[rows.reshape(-1)].add(vals)
    return out[:, 0] if squeeze else out


def ski_kron_matvec(op: SKIKronOperator, cols, v: jax.Array, shift=0.0):
    """(W ((x)_d T_d) W^T + shift I) @ v for scattered D-dim inputs."""
    from gaussian_processes_tpu.ops import kronecker

    core = kronecker.kron_matvec(cols, interp_rmatvec_nd(op, v))
    out = interp_matvec_nd(op, core)
    return out + jnp.asarray(shift, out.dtype) * v


def ski_kron_dense(kernel, op: SKIKronOperator) -> jax.Array:
    """Dense W K_g W^T oracle for tests (O(n m + m^2))."""
    from gaussian_processes_tpu.ops import kronecker

    g = kronecker.kron_inputs(op.kron.axes)
    Kg = kernel(g, g)
    return interp_matvec_nd(op, interp_matvec_nd(op, Kg).T)
