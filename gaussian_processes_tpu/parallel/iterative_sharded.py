"""Row-sharded matrix-free GP inference over a device mesh.

The multi-chip extension of ``models/iterative_gp.py`` (SURVEY.md §6.7c
taken past the dense block-cyclic path): the n training rows are sharded
over a 1-D mesh, every device builds only its (n/D, block) kernel strips
on the fly, and the whole preconditioned-CG + SLQ machinery runs INSIDE
one ``shard_map`` with three collective touchpoints:

* ``all_gather`` of the (n, r) Krylov vectors before each rectangular
  strip matvec K(x_local, x) @ v  — the only O(n·r) communication;
* ``psum`` of every column-sum in the CG recurrence, the Woodbury
  capacitance contractions L^T L / L^T v, and the SLQ probe norms
  (wired through the ``allreduce`` hooks in ``ops/krylov.py``);
* a pmax/psum pivot broadcast per step of the distributed pivoted
  Cholesky preconditioner build.

Because the hooks reduce EXACTLY the quantities the single-device code
sums locally, the sharded recurrence is the same algorithm — device
count only changes floating-point reduction order.  The parity test
(tests/test_iterative_sharded.py) checks alpha/lml against
``fit_iterative`` with identical probes on the 8-device CPU mesh.

Memory per device is O(n·block/D + n·rank/D): with D chips, config #4's
N=65536 preconditioned fit that takes 6.35 s on one chip (BASELINE.md)
shards both the matvec FLOPs and the preconditioner storage D ways.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_processes_tpu.models.base import Kernel
from gaussian_processes_tpu.models.gp import _LOG_2PI
from gaussian_processes_tpu.models.iterative_gp import IterativePosterior
from gaussian_processes_tpu.ops import krylov


def make_row_mesh(n_devices: int | None = None, axis: str = "i") -> Mesh:
    """1-D mesh over (the first n) local devices for row sharding."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def _sharded_matvec(kernel, x_full, x_loc, noise, jitter, block_size, axis):
    """v_local (n/D, r) -> (K + (s^2+jitter) I) v, row shard, one all_gather."""
    diag = jnp.square(noise) + jitter

    def mv(v_loc):
        v_full = lax.all_gather(v_loc, axis, tiled=True)  # (n, r)
        out = krylov.kernel_matvec(
            kernel, x_full, v_full, noise, jitter,
            block_size=block_size, x_rows=x_loc,
        )
        return out + diag * v_loc

    return mv


def _pivoted_cholesky_sharded(
    kernel: Kernel, x_loc, rank: int, axis: str, jitter: float = 1e-6
):
    """Row-sharded greedy pivoted Cholesky: L_local (n/D, rank).

    Same recurrence as ``ops.krylov.pivoted_cholesky`` — each step picks
    the global residual-diagonal argmax (pmax + lowest-device tiebreak),
    broadcasts the pivot input point and the pivot row of L (psum of a
    one-hot-owned slice), and updates only local rows.  The over-rank
    freeze floor is computed from the GLOBAL leading diagonal.
    """
    n_loc = x_loc.shape[0]
    dtype = x_loc.dtype if jnp.issubdtype(x_loc.dtype, jnp.floating) else jnp.float32
    idx_dev = lax.axis_index(axis)

    d0 = kernel.kdiag(x_loc).astype(dtype)  # (n/D,)
    L0 = jnp.zeros((n_loc, rank), dtype)
    floor = lax.pmax(jnp.max(d0), axis) * jnp.asarray(
        10 * jnp.finfo(dtype).eps, dtype
    )

    def body(j, carry):
        L, d = carry
        am = jnp.argmax(d)
        m = d[am]
        d_piv = lax.pmax(m, axis)
        # lowest device index among maxima owns the pivot (ties are rare
        # but must resolve identically everywhere)
        big = jnp.asarray(1 << 30, jnp.int32)
        owner = lax.pmin(jnp.where(m >= d_piv, idx_dev, big), axis)
        is_owner = (idx_dev == owner).astype(dtype)
        xp = lax.psum(
            is_owner * lax.dynamic_index_in_dim(x_loc, am, 0, keepdims=True),
            axis,
        )  # (1,) or (1, D_in)
        lp = lax.psum(is_owner * L[am], axis)  # (rank,)
        c = kernel(x_loc, xp)[:, 0].astype(dtype)  # local rows of K[:, piv]
        l = (c - jnp.dot(L, lp, precision=lax.Precision.HIGHEST)) / jnp.sqrt(
            jnp.maximum(d_piv, jitter)
        )
        l = jnp.where(d_piv > floor, l, jnp.zeros_like(l))
        L = L.at[:, j].set(l)
        d = jnp.maximum(d - l * l, 0.0)
        return (L, d)

    L, _ = lax.fori_loop(0, rank, body, (L0, d0))
    return L


def fit_iterative_sharded(
    kernel: Kernel,
    x,
    y,
    noise,
    key: jax.Array | None = None,
    *,
    mesh: Mesh | None = None,
    axis: str = "i",
    num_probes: int = 16,
    num_iters: int = 100,
    tol: float = 1e-8,
    jitter: float = 0.0,
    block_size: int = 1024,
    precond_rank: int = 0,
) -> IterativePosterior:
    """Matrix-free exact-GP fit with rows sharded over ``mesh``.

    Same estimator as ``models.iterative_gp.fit_iterative`` (identical
    probes given the same key); n must divide evenly by the mesh size.
    Returns an ``IterativePosterior`` whose ``alpha`` is the global
    (n,) solution, row-sharded over the mesh.
    """
    if mesh is None:
        mesh = make_row_mesh(axis=axis)
    n_dev = mesh.shape[axis]
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    noise = jnp.asarray(noise)
    if key is None:
        key = jax.random.key(0)
    n = x.shape[0]
    if n % n_dev != 0:
        raise ValueError(f"mesh size ({n_dev}) must evenly divide n ({n})")
    dtype = y.dtype

    red = lambda a: lax.psum(a, axis)  # noqa: E731

    if precond_rank > 0:
        # mirror fit_iterative's key plumbing so probes match bit-for-bit:
        # probe_key -> (k1, k2), z = L xi1 + sigma xi2
        probe_key, _ = jax.random.split(key)
        k1, k2 = jax.random.split(probe_key)
        xi1 = jax.random.normal(k1, (precond_rank, num_probes), dtype)
        xi2 = jax.random.normal(k2, (n, num_probes), dtype)

        def local(x_full, x_loc, y_loc, xi1, xi2_loc):
            mv = _sharded_matvec(
                kernel, x_full, x_loc, noise, jitter, block_size, axis
            )
            sigma2 = jnp.square(noise) + jitter
            L = _pivoted_cholesky_sharded(kernel, x_loc, precond_rank, axis)
            pre = krylov.woodbury_inverse_apply(L, sigma2, allreduce=red)
            sol, rn = krylov.pcg(
                mv, pre, y_loc[:, None], num_iters=num_iters, tol=tol,
                allreduce=red,
            )
            probes_loc = (
                jnp.dot(L, xi1, precision=lax.Precision.HIGHEST)
                + jnp.sqrt(sigma2) * xi2_loc
            )
            logdet = krylov.slq_logdet_preconditioned(
                mv, L, sigma2, None, num_probes, num_iters, n,
                probes=probes_loc, allreduce=red,
            )
            alpha = sol[:, 0]
            lml = (
                -0.5 * red(jnp.dot(y_loc, alpha))
                - 0.5 * logdet
                - 0.5 * n * _LOG_2PI
            )
            return alpha, lml, rn[0]

        fn = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(), P(axis)),
                out_specs=(P(axis), P(), P()),
                check_vma=False,
            )
        )
        alpha, lml, residual = fn(x, x, y, xi1, xi2)
    else:
        probes = jax.random.rademacher(key, (n, num_probes), dtype=dtype)

        def local(x_full, x_loc, y_loc, probes_loc):
            mv = _sharded_matvec(
                kernel, x_full, x_loc, noise, jitter, block_size, axis
            )
            rhs = jnp.concatenate([y_loc[:, None], probes_loc], axis=1)
            res = krylov.mbcg(mv, rhs, num_iters=num_iters, tol=tol,
                              allreduce=red)
            alpha = res.solution[:, 0]
            probe_norms = jnp.full((num_probes,), float(n), dtype)
            logdet = krylov.slq_logdet_from_cg(
                res.alphas[:, 1:], res.betas[:, 1:], probe_norms, n
            )
            lml = (
                -0.5 * red(jnp.dot(y_loc, alpha))
                - 0.5 * logdet
                - 0.5 * n * _LOG_2PI
            )
            return alpha, lml, res.residual_norm[0]

        fn = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(axis)),
                out_specs=(P(axis), P(), P()),
                check_vma=False,
            )
        )
        alpha, lml, residual = fn(x, x, y, probes)

    return IterativePosterior(
        kernel=kernel,
        x=x,
        y=y,
        noise=noise,
        alpha=alpha,
        log_marginal=lml,
        solve_residual=residual,
        num_probes=jnp.asarray(num_probes),
        num_iters=jnp.asarray(num_iters),
    )


def predict_mean_iterative_sharded(
    post: IterativePosterior,
    xo,
    *,
    mesh: Mesh | None = None,
    axis: str = "i",
    block_size: int = 1024,
) -> jax.Array:
    """Predictive mean with test rows sharded: K(xo_loc, x) @ alpha.

    ``xo`` is padded up to a mesh-size multiple on the host (padded rows
    compute against real training data and are dropped), so any m works.
    """
    if mesh is None:
        mesh = make_row_mesh(axis=axis)
    n_dev = mesh.shape[axis]
    xo = jnp.asarray(xo)
    m = xo.shape[0]
    m_pad = -(-m // n_dev) * n_dev
    xo_pad = krylov._pad_to(xo, m_pad)

    def local(x_full, alpha_loc, xo_loc):
        alpha = lax.all_gather(alpha_loc, axis, tiled=True)
        out = krylov.kernel_matvec(
            post.kernel, x_full, alpha, post.noise, 0.0,
            block_size=block_size, x_rows=xo_loc,
        )
        return out

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    return fn(post.x, post.alpha, xo_pad)[:m]
