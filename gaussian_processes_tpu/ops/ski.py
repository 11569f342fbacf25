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


# --- two-float compensated residual + iterative refinement ------------------
#
# Why (VERDICT r2 item 5, measured round 3): at n >= 65536 the f32 CG
# solve through the ND-SKI operator is bounded by the f32 fidelity of a
# single operator application (~1.1e-4 relative at the solution — the
# f32 FFT product alone is ~4e-5, and a plain f32 HIGHEST dense matmul
# is no better, since every variant rounds intermediates of magnitude
# ||T||*||u|| >> ||T u||).  Iterative refinement reaches only the
# fidelity of its residual, so the residual is evaluated in double-f32
# (ops/twofloat.py): error-free products + compensated accumulation
# through the whole W.T gather, the per-dimension dense Toeplitz
# product (m_d <= a few hundred, so dense-per-dim is cheap), and the
# forward interpolation.  The refined solution's true residual then
# sits at the f32 REPRESENTATION floor of alpha itself (~1e-5 at that
# scale) instead of the 1e-2 round-2 stall.


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SKICompPlan:
    """Static gather plan for the two-float residual.

    Built once per geometry on the host (f64 weight products, exact
    bucketing); all arrays are static shapes, so the residual jits.

    ``cell_pts``/``cell_wh``/``cell_wl``: (m, C) bucketed contributions
    per flat grid cell — point index + two-float combined weight
    (padding slots carry weight 0 on point 0).  ``rows``/``fw_h``/
    ``fw_l``: (n, 4^D) forward-gather rows + weight pairs.
    """

    cell_pts: jax.Array
    cell_wh: jax.Array
    cell_wl: jax.Array
    rows: jax.Array
    fw_h: jax.Array
    fw_l: jax.Array


def compensated_plan(op: SKIKronOperator) -> SKICompPlan:
    """Host-side (numpy) construction of the two-float gather plan."""
    import itertools
    import math

    import numpy as np

    w_np = np.asarray(op.w, np.float64)  # (n, 4, D)
    idx_np = np.asarray(op.idx, np.int64)  # (n, D)
    D = op.ndim
    n = idx_np.shape[0]
    sizes = op.kron.shape
    strides = []
    s = 1
    for d in reversed(range(D)):
        strides.insert(0, s)
        s *= sizes[d]
    rows_l, wts_l = [], []
    for taps in itertools.product(range(4), repeat=D):
        flat = sum((idx_np[:, d] + taps[d]) * strides[d] for d in range(D))
        cw = w_np[:, taps[0], 0]
        for d in range(1, D):
            cw = cw * w_np[:, taps[d], d]  # exact in f64 (f32 inputs)
        rows_l.append(flat)
        wts_l.append(cw)
    rows = np.stack(rows_l, axis=-1)  # (n, T)
    w64 = np.stack(wts_l, axis=-1)  # (n, T) f64
    T = w64.shape[1]
    m = math.prod(sizes)

    flat_rows = rows.reshape(-1)
    flat_pts = np.repeat(np.arange(n, dtype=np.int64), T)
    flat_w = w64.reshape(-1)
    order = np.argsort(flat_rows, kind="stable")
    counts = np.bincount(flat_rows, minlength=m)
    C = int(counts.max())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rr = flat_rows[order]
    slot = np.arange(n * T) - starts[rr]
    cell_pts = np.zeros((m, C), np.int32)
    cell_w = np.zeros((m, C), np.float64)
    cell_pts[rr, slot] = flat_pts[order]
    cell_w[rr, slot] = flat_w[order]

    cell_wh = cell_w.astype(np.float32)
    cell_wl = (cell_w - cell_wh).astype(np.float32)
    fw_h = w64.astype(np.float32)
    fw_l = (w64 - fw_h).astype(np.float32)
    return SKICompPlan(
        cell_pts=jnp.asarray(cell_pts),
        cell_wh=jnp.asarray(cell_wh),
        cell_wl=jnp.asarray(cell_wl),
        rows=jnp.asarray(rows.astype(np.int32)),
        fw_h=jnp.asarray(fw_h),
        fw_l=jnp.asarray(fw_l),
    )


def _tf_rmatvec(plan: SKICompPlan, xv: jax.Array):
    """Two-float W^T x -> flat grid pair (m,), (m,).

    All (m, C) per-cell products at once, then a log-depth pairwise
    two-float reduction over the cell axis (tf_tree_sum) — the original
    C-step lax.scan was pure sequential latency on TPU (round 4).
    Zero-padded cell slots contribute exact zeros."""
    from gaussian_processes_tpu.ops import twofloat as tf

    v = xv[plan.cell_pts]  # (m, C)
    p, e = tf.two_prod(plan.cell_wh, v)
    e = e + plan.cell_wl * v
    return tf.tf_tree_sum(p, e, axis=1)


def _tf_toeplitz_apply_dim(colh, coll, Uh, Ul):
    """Two-float dense Toeplitz product along axis 0 of (m_d, B) pairs.

    out[i, b] = sum_j T[i, j] U[j, b]: all products materialized as
    (m_d, m_d, chunk_b) blocks, reduced over j by the log-depth
    pairwise tf_tree_sum (the original m_d-step lax.scan was pure
    sequential latency on TPU — round 4).  Chunked over B to bound the
    product temporaries to ~64 MB per pair."""
    from gaussian_processes_tpu.ops import twofloat as tf

    md, B = colh.shape[0], Uh.shape[1]
    off = jnp.abs(jnp.arange(md)[:, None] - jnp.arange(md)[None, :])
    Th = colh[off]  # (m_d, m_d)
    Tl = coll[off]
    chunk_b = max(1, min(B, (1 << 24) // (md * md)))
    outs_h, outs_l = [], []
    for s in range(0, B, chunk_b):
        uh = Uh[:, s:s + chunk_b]  # (m_d, cb)
        ul = Ul[:, s:s + chunk_b]
        a = Th[:, :, None]  # (m_d, m_d, 1) over (i, j)
        p, e = tf.two_prod(a, uh[None, :, :])
        e = e + a * ul[None, :, :] + Tl[:, :, None] * uh[None, :, :]
        h, l = tf.tf_tree_sum(p, e, axis=1)  # reduce j -> (m_d, cb)
        outs_h.append(h)
        outs_l.append(l)
    if len(outs_h) == 1:
        return outs_h[0], outs_l[0]
    return jnp.concatenate(outs_h, axis=1), jnp.concatenate(outs_l, axis=1)


def _tf_kron_apply(colpairs, uh, ul, sizes):
    """Two-float ((x)_d T_d) applied to a flat grid pair."""
    th = uh.reshape(sizes)
    tl = ul.reshape(sizes)
    D = len(sizes)
    for d, (ch, cl) in enumerate(colpairs):
        th = jnp.moveaxis(th, d, 0)
        tl = jnp.moveaxis(tl, d, 0)
        lead, rest = th.shape[0], th.shape[1:]
        h2, l2 = _tf_toeplitz_apply_dim(
            ch, cl, th.reshape(lead, -1), tl.reshape(lead, -1)
        )
        th = jnp.moveaxis(h2.reshape(lead, *rest), 0, d)
        tl = jnp.moveaxis(l2.reshape(lead, *rest), 0, d)
    return th.reshape(-1), tl.reshape(-1)


def _tf_matvec(plan: SKICompPlan, gh: jax.Array, gl: jax.Array):
    """Two-float W @ (grid pair) -> (n,) pair."""
    from gaussian_processes_tpu.ops import twofloat as tf

    vh = gh[plan.rows]  # (n, T)
    vl = gl[plan.rows]
    p, e = tf.two_prod(plan.fw_h, vh)
    e = e + plan.fw_h * vl + plan.fw_l * vh
    return tf.tf_tree_sum(p, e, axis=1)  # reduce the 4^D tap axis


def ski_kron_apply_compensated(
    plan: SKICompPlan, colpairs, sizes, shift_pair, xv: jax.Array,
):
    """(W ((x)_d T_d) W^T + shift I) x in double-f32; returns the pair.

    Beyond residual evaluation, this is also the CG matvec of choice on
    TPU for directions with heavy cancellation: measured round 3, the
    plain FFT matvec applied to the preconditioner's output direction
    carries 5e-3 relative error on chip (||A p|| is ~100x below
    ||A||*||p||, so transform rounding dominates the output), which
    makes p^T A p sign-noise and freezes the f32 CG.  This apply is
    per-output-relative accurate (~1e-8), so CG sees a consistent
    operator.
    """
    from gaussian_processes_tpu.ops import twofloat as tf

    uh, ul = _tf_rmatvec(plan, xv)
    th, tl = _tf_kron_apply(colpairs, uh, ul, sizes)
    oh, ol = _tf_matvec(plan, th, tl)
    sh, sl = shift_pair
    p, e = tf.two_prod(jnp.float32(sh), xv)
    e = e + jnp.float32(sl) * xv
    return tf.tf_add(oh, ol, p, e)


def ski_kron_residual_compensated(
    plan: SKICompPlan, colpairs, sizes, shift_pair, xv: jax.Array,
    b: jax.Array,
) -> jax.Array:
    """f32 residual b - (W ((x)_d T_d) W^T + shift I) x, evaluated in
    double-f32 end to end (error ~1e-7 relative instead of ~1e-4)."""
    from gaussian_processes_tpu.ops import twofloat as tf

    oh, ol = ski_kron_apply_compensated(plan, colpairs, sizes, shift_pair, xv)
    rh, rl = tf.tf_add(b, jnp.zeros_like(b), -oh, -ol)
    return rh + rl


def ski_kron_refine(
    kernel,
    op: SKIKronOperator,
    x,
    alpha: jax.Array,
    y: jax.Array,
    noise,
    *,
    jitter: float = 0.0,
    plan: SKICompPlan | None = None,
    rounds: int = 2,
    num_iters: int = 150,
    precond_rank: int = 512,
    tol: float = 1e-7,
    replace_every: int = 10,
    precond_L: jax.Array | None = None,
    target: float = 2e-8,
):
    """Mixed-precision iterative refinement of an ND-SKI solve.

    Host-orchestrated post-fit polish (NOT jittable as a whole: the
    per-dimension Toeplitz columns are evaluated on the host in f64 at
    the fitted hyperparameter values and shipped as two-float pairs;
    each correction solve and each compensated residual IS jitted).

    The refined solution is maintained as a TWO-FLOAT PAIR
    ``(alpha_hi, alpha_lo)``: a single f32 vector cannot represent a
    solution whose residual beats the representation floor
    eps * ||A|| * ||alpha|| (measured ~6e-6 relative even at n=4000),
    while the pair reaches the compensated-residual fidelity (~1e-6).
    Returns ``(alpha_pair, true_residual)``: ``alpha_pair = (hi, lo)``
    f32 arrays (``hi + lo`` is the solution; ``hi`` alone is the best
    single-f32 collapse) and the compensated relative residual of the
    pair.  Downstream consumers that need the full fidelity apply
    linear maps to both halves (K @ hi + K @ lo).

    Measured (round 3, n=65536 scattered 2-D, smooth rhs, f32): fit
    residual 4.5e-3 without replacement / 1.3e-4 with replacement ->
    ~1e-6 (pair) after two refinement rounds.

    Round-4 wall cuts (VERDICT r3 weak #3): correction solves run
    ``early_exit`` with a PER-ROUND adaptive tolerance — a correction
    solved to relative tolerance t multiplies the pair residual by ~t,
    so round k solves only to ``target / rel_k`` (floored at ``tol``,
    capped at 1e-2) instead of burning 150 fixed iterations at 1e-7;
    rounds stop early once the pair residual is below ``target``; and
    ``precond_L`` lets the caller reuse the pivoted-Cholesky factor
    already built by ``fit_iterative`` instead of rebuilding it.
    """
    import numpy as np

    from gaussian_processes_tpu.models.ard import ARDGaussianKernel
    from gaussian_processes_tpu.ops import krylov, twofloat as tf

    if not isinstance(kernel, ARDGaussianKernel):
        raise NotImplementedError(
            "ski_kron_refine mirrors the Kronecker path's kernel support "
            f"(ARDGaussianKernel); got {type(kernel).__name__}"
        )
    if plan is None:
        plan = compensated_plan(op)
    sizes = op.kron.shape

    # host f64 column pairs, mirroring kronecker.kron_columns (h^2 on
    # factor 0) — 3 scalar device fetches + O(m_d) host work
    h2 = float(kernel.h) ** 2
    ws = np.asarray(kernel.w, np.float64)
    colpairs = []
    for d, g in enumerate(op.kron.axes):
        g64 = np.asarray(g, np.float64)
        col = np.exp(-0.5 * np.square(g64 - g64[0]) / ws[d] ** 2)
        if d == 0:
            col = col * h2
        colpairs.append(tf.tf_from_f64(col))
    shift64 = float(noise) ** 2 + float(jitter)
    sh = np.float32(shift64)
    shift_pair = (sh, np.float32(shift64 - float(sh)))

    # the CORRECTION solves use the compensated apply as their matvec:
    # on TPU the plain FFT matvec's error on preconditioned directions
    # (5e-3 relative, heavy cancellation) freezes f32 CG outright —
    # see ski_kron_apply_compensated.  The per-iteration cost is two
    # 128-step two-float scans; for a post-fit polish that is cheap.
    def mv(v):
        mat = v.ndim == 2  # pcg passes (n, 1); the tf apply is (n,)
        oh, ol = ski_kron_apply_compensated(
            plan, colpairs, sizes, shift_pair, v[:, 0] if mat else v
        )
        out = oh + ol
        return out[:, None] if mat else out

    # preconditioner on the SCATTERED inputs (same as fit_iterative);
    # reuse the caller's factor when provided
    L = (precond_L if precond_L is not None
         else krylov.pivoted_cholesky(kernel, jnp.asarray(x), precond_rank))
    pre = krylov.woodbury_inverse_apply(L, jnp.float32(shift64))

    # residual of the PAIR (ah, al): the compensated evaluation at ah
    # minus an operator application to the tiny lo half — ||al|| ~
    # eps ||a||, so its apply error is second-order
    resid_j = jax.jit(lambda ah, al, b_: ski_kron_residual_compensated(
        plan, colpairs, sizes, shift_pair, ah, b_) - mv(al))
    # tol is a TRACED argument so the per-round adaptive tolerance does
    # not recompile the solve (tunnel compiles are minutes)
    solve_j = jax.jit(lambda r, t: krylov.pcg(
        mv, pre, r[:, None], num_iters=num_iters, tol=t,
        replace_every=replace_every, early_exit=True)[0][:, 0])

    y_norm = float(jnp.linalg.norm(y))
    ah = alpha
    al = jnp.zeros_like(alpha)
    rel = None
    for _ in range(rounds):
        r = resid_j(ah, al, y)
        rel = float(jnp.linalg.norm(r)) / y_norm
        if rel < target:  # already at/below the compensated floor
            return (ah, al), jnp.asarray(rel, jnp.float32)
        # solve just tightly enough that this round lands at target
        t_k = float(np.clip(target / max(rel, 1e-30), tol, 1e-2))
        ah, al = tf.tf_add(ah, al, solve_j(r, jnp.float32(t_k)),
                           jnp.zeros_like(ah))
    r = resid_j(ah, al, y)
    rel = jnp.linalg.norm(r) / jnp.linalg.norm(y)
    return (ah, al), rel
