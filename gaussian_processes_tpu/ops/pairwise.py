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


def _tile_body(kernel_cls, with_diag, block, params_ref, x1_ref, x2_ref, out_ref):
    bm, bn = block
    i = pl.program_id(0)
    j = pl.program_id(1)
    P = len(kernel_cls.param_names)
    params = [params_ref[k] for k in range(P)]
    d = x1_ref[:] - x2_ref[:]  # (bm, 1) - (1, bn) -> (bm, bn)
    out = kernel_cls.k_fn(d, *params)
    if with_diag:
        # noise^2 + jitter on the global diagonal of this tile
        diag = params_ref[P]
        rows = i * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        cols = j * bn + jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
        out = jnp.where(rows == cols, out + diag, out)
    out_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=("kernel_cls", "with_diag", "block", "interpret"),
)
def _pairwise(
    kernel_cls,
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
    body = functools.partial(_tile_body, kernel_cls, with_diag, block)
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
    built by the Pallas tile kernel.  ``interpret`` defaults to True off
    TPU so the same code path is testable on CPU.
    """
    if not kernel.supports_tiled:
        raise TypeError(
            "the Pallas tile builder needs a leaf kernel (static k_fn "
            "over 1-D differences); evaluate composite/ARD kernels via "
            "kernel(x1, x2)"
        )
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with_diag = noise is not None
    params = kernel.params.astype(x1.dtype)
    if with_diag:
        diag = jnp.square(jnp.asarray(noise, x1.dtype)) + jnp.asarray(
            jitter, x1.dtype
        )
        params = jnp.concatenate([params, diag[None]])
    return _pairwise(
        type(kernel),
        params,
        x1,
        x2,
        with_diag=with_diag,
        block=block,
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
