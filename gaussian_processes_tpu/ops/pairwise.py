"""Pallas TPU kernel: tiled pairwise covariance-matrix construction.

This is the framework's native layer (SURVEY.md §3 C7/C8): where the
reference compiles elementwise double loops over (i, j) pairs to C via
Cython (gp/kernels/*_c.pyx [R]), here one Pallas kernel builds each
(block_m, block_n) tile of K in VMEM — pairwise difference, the kernel's
elementwise closed form, and the noise/jitter diagonal all fused — and
writes it to HBM exactly once.  No n x n distance matrix is ever
materialized (SURVEY.md §6.7a), so the op is HBM-write-bound: its
speed-of-light is N^2 * 4 bytes / write-bandwidth.

The elementwise cores are the *same* ``Kernel.k_fn`` staticmethods the
jnp path uses (models/gaussian.py, models/periodic.py), so Pallas and
XLA paths cannot drift; tests assert tile-exact agreement (the TPU
analogue of the reference's "Cython matches sympy" gate, SURVEY.md §5).

Grid: (ceil(n/bm), ceil(m/bn)); inputs arrive as (n, 1) and (1, m)
column/row vectors so each program broadcasts a (bm, 1) - (1, bn)
difference tile on the VPU.  Hyperparameters ride in SMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_processes_tpu.models.base import Kernel


def tile_program(kernel: Kernel):
    """(static elementwise fn, params array) for the tile body.

    Leaf kernels return their class ``k_fn``; Sum/Product composites get
    a *composed* static function built recursively from their (static)
    structure — the children's ``k_fn`` cores fused into one tile body
    (SURVEY.md §6.7a / VERDICT r1 item 7b), so a quasi-periodic
    ``SE * periodic`` builds its covariance in one pass over each tile
    with no child-matrix intermediates.  The composed function is cached
    per structure, so jit tracing sees a stable callable and the compile
    cache hits across calls.
    """
    struct = _tile_structure(kernel)
    fn, _ = _fn_from_structure(struct)
    return fn, kernel.params


def _tile_structure(kernel: Kernel):
    from gaussian_processes_tpu.models.composite import (
        ProductKernel,
        SumKernel,
    )

    if isinstance(kernel, SumKernel):
        return ("sum", _tile_structure(kernel.k1), _tile_structure(kernel.k2))
    if isinstance(kernel, ProductKernel):
        return ("prod", _tile_structure(kernel.k1), _tile_structure(kernel.k2))
    if type(kernel).supports_tiled:
        return ("leaf", type(kernel))
    raise TypeError(
        f"{type(kernel).__name__} has no Pallas tile form (needs a static "
        "k_fn over 1-D differences, or a Sum/Product tree of such kernels); "
        "ARD kernels use pairwise_matrix_ard"
    )


@functools.lru_cache(maxsize=None)
def _fn_from_structure(struct):
    kind = struct[0]
    if kind == "leaf":
        cls = struct[1]
        return cls.k_fn, len(cls.param_names)
    f1, p1 = _fn_from_structure(struct[1])
    f2, p2 = _fn_from_structure(struct[2])
    if kind == "sum":
        def fn(d, *params):
            return f1(d, *params[:p1]) + f2(d, *params[p1:])
    else:
        def fn(d, *params):
            return f1(d, *params[:p1]) * f2(d, *params[p1:])
    return fn, p1 + p2


def _tile_body(k_fn, n_params, with_diag, block, params_ref, x1_ref, x2_ref, out_ref):
    bm, bn = block
    i = pl.program_id(0)
    j = pl.program_id(1)
    params = [params_ref[k] for k in range(n_params)]
    d = x1_ref[:] - x2_ref[:]  # (bm, 1) - (1, bn) -> (bm, bn)
    out = k_fn(d, *params)
    if with_diag:
        # noise^2 + jitter on the global diagonal of this tile
        diag = params_ref[n_params]
        rows = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        cols = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        out = jnp.where(rows == cols, out + diag, out)
    out_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=("k_fn", "n_params", "with_diag", "block", "interpret"),
)
def _pairwise(
    k_fn,
    n_params,
    params,  # (P,) or (P+1,) with the trailing diagonal term
    x1,  # (n,)
    x2,  # (m,)
    *,
    with_diag: bool,
    block,
    interpret: bool,
):
    n, m = x1.shape[0], x2.shape[0]
    bm, bn = block
    dtype = x1.dtype
    grid = (pl.cdiv(n, bm), pl.cdiv(m, bn))
    body = functools.partial(_tile_body, k_fn, n_params, with_diag, block)
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, m), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params, whole array
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(params, x1[:, None], x2[None, :])


def pairwise_matrix(
    kernel: Kernel,
    x1,
    x2,
    *,
    noise=None,
    jitter: float = 0.0,
    block=(256, 512),
    interpret: Optional[bool] = None,
) -> jax.Array:
    """K[i, j] = k(x1[i], x2[j]) (+ (noise^2 + jitter) I when noise given).

    Drop-in replacement for ``kernel(x1, x2)`` / ``models.gp.build_kxx``
    built by the Pallas tile kernel.  Supports leaf kernels and arbitrary
    Sum/Product trees of them (the children's elementwise cores fuse into
    one tile body).  ``interpret`` defaults to True off TPU so the same
    code path is testable on CPU.
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k_fn, params = tile_program(kernel)
    params = params.astype(x1.dtype)
    n_params = params.shape[0]
    with_diag = noise is not None
    if with_diag:
        diag = jnp.square(jnp.asarray(noise, x1.dtype)) + jnp.asarray(
            jitter, x1.dtype
        )
        params = jnp.concatenate([params, diag[None]])
    return _pairwise(
        k_fn,
        n_params,
        params,
        x1,
        x2,
        with_diag=with_diag,
        block=block,
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# ARD (D-dim inputs) tile builder
# ---------------------------------------------------------------------------


def _ard_tile_body(D, with_diag, block, params_ref, x1_ref, x2_ref, out_ref):
    """k(x, x') = h^2 exp(-1/2 sum_d (x_d - x'_d)^2 / w_d^2) per tile.

    The squared distance accumulates dimension-by-dimension as rank-2
    broadcasts — the (bm, bn, D) difference tensor of the jnp path never
    exists (VERDICT r1 item 5: ARD lost the native path at large N).
    """
    bm, bn = block
    i = pl.program_id(0)
    j = pl.program_id(1)
    h = params_ref[0]
    acc = jnp.zeros((bm, bn), out_ref.dtype)
    for d in range(D):  # D is static and small; unrolled VPU adds
        w_d = params_ref[1 + d]
        diff = x1_ref[:, d][:, None] - x2_ref[:, d][None, :]
        acc = acc + jnp.square(diff / w_d)
    out = jnp.square(h) * jnp.exp(-0.5 * acc)
    if with_diag:
        diag = params_ref[1 + D]
        rows = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        cols = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        out = jnp.where(rows == cols, out + diag, out)
    out_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("D", "with_diag", "block", "interpret")
)
def _pairwise_ard(params, x1, x2, *, D, with_diag, block, interpret):
    n, m = x1.shape[0], x2.shape[0]
    bm, bn = block
    grid = (pl.cdiv(n, bm), pl.cdiv(m, bn))
    body = functools.partial(_ard_tile_body, D, with_diag, block)
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, m), x1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(params, x1, x2)


def pairwise_matrix_ard(
    kernel,
    x1,
    x2,
    *,
    noise=None,
    jitter: float = 0.0,
    block=(256, 512),
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Tiled covariance for ``ARDGaussianKernel`` over (n, D) inputs."""
    from gaussian_processes_tpu.models.ard import ARDGaussianKernel

    if not isinstance(kernel, ARDGaussianKernel):
        raise TypeError("pairwise_matrix_ard expects an ARDGaussianKernel")
    x1 = jnp.atleast_2d(jnp.asarray(x1))
    x2 = jnp.atleast_2d(jnp.asarray(x2))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = x1.shape[1]
    params = kernel.params.astype(x1.dtype)  # (1 + D,)
    with_diag = noise is not None
    if with_diag:
        diag = jnp.square(jnp.asarray(noise, x1.dtype)) + jnp.asarray(
            jitter, x1.dtype
        )
        params = jnp.concatenate([params, diag[None]])
    return _pairwise_ard(
        params, x1, x2, D=D, with_diag=with_diag, block=block,
        interpret=interpret,
    )


def _jac_tile_body(kernel_cls, params_ref, x1_ref, x2_ref, out_ref):
    P = len(kernel_cls.param_names)
    params = [params_ref[k] for k in range(P)]
    d = x1_ref[:] - x2_ref[:]
    out_ref[:] = jnp.stack(kernel_cls.jac_fn(d, *params))


def _hess_tile_body(kernel_cls, params_ref, x1_ref, x2_ref, out_ref):
    P = len(kernel_cls.param_names)
    params = [params_ref[k] for k in range(P)]
    d = x1_ref[:] - x2_ref[:]
    tri = kernel_cls.hess_fn(d, *params)
    idx = {}
    it = iter(range(len(tri)))
    for i in range(P):
        for j in range(i, P):
            idx[(i, j)] = next(it)
    rows = [
        jnp.stack([tri[idx[(min(i, j), max(i, j))]] for j in range(P)])
        for i in range(P)
    ]
    out_ref[:] = jnp.stack(rows)


@functools.partial(
    jax.jit, static_argnames=("kernel_cls", "order", "block", "interpret")
)
def _pairwise_deriv(kernel_cls, params, x1, x2, *, order, block, interpret):
    n, m = x1.shape[0], x2.shape[0]
    bm, bn = block
    dtype = x1.dtype
    P = len(kernel_cls.param_names)
    grid = (pl.cdiv(n, bm), pl.cdiv(m, bn))
    if order == 1:
        body = functools.partial(_jac_tile_body, kernel_cls)
        out_shape = jax.ShapeDtypeStruct((P, n, m), dtype)
        out_spec = pl.BlockSpec(
            (P, bm, bn), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        )
    else:
        body = functools.partial(_hess_tile_body, kernel_cls)
        out_shape = jax.ShapeDtypeStruct((P, P, n, m), dtype)
        out_spec = pl.BlockSpec(
            (P, P, bm, bn), lambda i, j: (0, 0, i, j), memory_space=pltpu.VMEM
        )
    return pl.pallas_call(
        body,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        interpret=interpret,
    )(params, x1[:, None], x2[None, :])


def pairwise_jacobian(
    kernel: Kernel, x1, x2, *, block=(256, 256), interpret: Optional[bool] = None
) -> jax.Array:
    """Tiled dK/dtheta, (P, n, m) — Pallas twin of ``Kernel.jacobian``
    (the reference's second Cython hot loop, SURVEY.md §4.3)."""
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pairwise_deriv(
        type(kernel), kernel.params.astype(x1.dtype), x1, x2,
        order=1, block=block, interpret=interpret,
    )


def pairwise_hessian(
    kernel: Kernel, x1, x2, *, block=(256, 256), interpret: Optional[bool] = None
) -> jax.Array:
    """Tiled d2K/dtheta2, (P, P, n, m) — Pallas twin of ``Kernel.hessian``."""
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pairwise_deriv(
        type(kernel), kernel.params.astype(x1.dtype), x1, x2,
        order=2, block=block, interpret=interpret,
    )


def pairwise_matrix_reference(kernel: Kernel, x1, x2, *, noise=None, jitter=0.0):
    """Pure-jnp twin of ``pairwise_matrix`` (the test oracle)."""
    K = kernel(jnp.asarray(x1), jnp.asarray(x2))
    if noise is not None:
        n = K.shape[0]
        diag = jnp.square(jnp.asarray(noise, K.dtype)) + jnp.asarray(jitter, K.dtype)
        K = K + diag * jnp.eye(n, K.shape[1], dtype=K.dtype)
    return K
