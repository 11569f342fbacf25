"""Double-f32 arithmetic + compensated SKI residual gates (VERDICT r2 #5).

The compensation terms must survive XLA compilation (the algorithms
assume no FP reassociation) and the compensated residual must match the
f64 oracle far below a plain f32 evaluation's error.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_processes_tpu.ops import ski, kronecker
from gaussian_processes_tpu.ops import twofloat as tf
from gaussian_processes_tpu.models.ard import ARDGaussianKernel


def test_two_sum_and_two_prod_are_error_free():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(2048).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(2048) * 1e-4).astype(np.float32))

    s, e = jax.jit(tf.two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact
    )

    p, e = jax.jit(tf.two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact
    )


def test_compensated_dot_beats_f32_under_jit():
    """A 10^5-term ill-conditioned sum in two-float lands at f64 accuracy
    THROUGH jit — i.e. XLA did not optimize the compensation away."""
    rng = np.random.default_rng(1)
    n = 100_000
    a = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def tfdot(a, b):
        def body(carry, xs):
            return tf.tf_dot_accumulate(carry, xs[0], xs[1]), None

        (h, l), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)), (a, b)
        )
        return h, l

    h, l = jax.jit(tfdot)(a, b)
    exact = float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))
    got = float(np.asarray(h, np.float64) + np.asarray(l, np.float64))
    naive = float(jnp.dot(a, b))
    assert abs(got - exact) <= 1e-3 * max(abs(naive - exact), 1e-30) + 1e-6
    assert abs(got - exact) < 1e-4


def _small_2d_problem(n=3000, m1=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    kern = ARDGaussianKernel(jnp.asarray(1.0, jnp.float32),
                             jnp.asarray([0.3, 0.3], jnp.float32))
    g = jnp.linspace(-1.1, 1.1, m1, dtype=jnp.float32)
    op = ski.interpolation_weights_nd(jnp.asarray(x), (g, g))
    return kern, x, op, rng


def _f64_residual(kern, op, x, alpha, b, shift):
    k64 = ARDGaussianKernel(jnp.asarray(1.0, jnp.float64),
                            jnp.asarray(np.asarray(kern.w, np.float64)))
    op64 = ski.SKIKronOperator(
        kron=kronecker.KronOperator(axes=tuple(
            jnp.asarray(np.asarray(a, np.float64)) for a in op.kron.axes)),
        idx=op.idx, w=jnp.asarray(np.asarray(op.w, np.float64)),
    )
    cols = kronecker.kron_columns(k64, op64.kron)
    a64 = jnp.asarray(np.asarray(alpha, np.float64))
    return jnp.asarray(np.asarray(b, np.float64)) - ski.ski_kron_matvec(
        op64, cols, a64, shift=shift
    )


def test_compensated_residual_matches_f64_oracle():
    kern, x, op, rng = _small_2d_problem()
    n = x.shape[0]
    alpha = jnp.asarray((rng.standard_normal(n) * 3.0).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    shift = 0.01 + 1e-4

    plan = ski.compensated_plan(op)
    h2 = float(kern.h) ** 2
    ws = np.asarray(kern.w, np.float64)
    colpairs = []
    for d, g in enumerate(op.kron.axes):
        g64 = np.asarray(g, np.float64)
        col = np.exp(-0.5 * np.square(g64 - g64[0]) / ws[d] ** 2)
        if d == 0:
            col = col * h2
        colpairs.append(tf.tf_from_f64(col))
    sh = np.float32(shift)
    r_comp = jax.jit(lambda a, b_: ski.ski_kron_residual_compensated(
        plan, colpairs, op.kron.shape, (sh, np.float32(shift - float(sh))),
        a, b_))(alpha, b)

    r64 = _f64_residual(kern, op, x, alpha, b, shift)
    # normalize by ||r|| itself: with a random alpha the residual is much
    # larger than b, and the only loss the compensated path keeps is the
    # final collapse to f32 (eps * ||r||)
    rn = float(jnp.linalg.norm(r64))
    err_comp = float(jnp.linalg.norm(
        jnp.asarray(np.asarray(r_comp, np.float64)) - r64)) / rn

    # plain f32 residual for contrast
    cols32 = kronecker.kron_columns(kern, op.kron)
    r32 = b - ski.ski_kron_matvec(op, cols32, alpha, shift=shift)
    err_f32 = float(jnp.linalg.norm(
        jnp.asarray(np.asarray(r32, np.float64)) - r64)) / rn

    assert err_comp < 3e-7, err_comp
    # contrast vs plain f32 (the gap widens with scale; at this small
    # benign size the f32 path is only ~8x worse)
    assert err_comp < 0.5 * err_f32, (err_comp, err_f32)


@pytest.mark.slow
def test_ski_kron_refine_tightens_residual():
    """End-to-end: fit (f32, replacement on) then refine; the compensated
    true residual must tighten by >=10x and land below 2e-6 at this
    benign size."""
    from gaussian_processes_tpu import fit_iterative

    kern, x, op, rng = _small_2d_problem(n=4000, m1=32, seed=3)
    y = (np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
         + 0.1 * rng.standard_normal(x.shape[0])).astype(np.float32)
    p = fit_iterative(kern, jnp.asarray(x), jnp.asarray(y), jnp.float32(0.1),
                      jax.random.key(0), num_probes=4, num_iters=150,
                      tol=1e-9, jitter=1e-4, precond_rank=128,
                      structure=op, replace_every=10)
    (ah, al), rel = ski.ski_kron_refine(
        kern, op, x, p.alpha, jnp.asarray(y), 0.1, jitter=1e-4,
        rounds=2, num_iters=100, precond_rank=128,
    )
    # f64 ground truth of the PAIR's residual (hi + lo in f64)
    a64 = np.asarray(ah, np.float64) + np.asarray(al, np.float64)
    r64 = _f64_residual(kern, op, x, jnp.asarray(a64), jnp.asarray(y),
                        0.01 + 1e-4)
    rel64 = float(jnp.linalg.norm(r64)) / float(
        np.linalg.norm(y.astype(np.float64)))
    assert rel64 < 5e-6, rel64
    # the compensated residual estimate is trustworthy
    np.testing.assert_allclose(float(rel), rel64, rtol=1.0, atol=3e-6)
    # the single-f32 collapse sits at the representation floor — still
    # far tighter than the unrefined fit
    r64h = _f64_residual(kern, op, x, ah, jnp.asarray(y), 0.01 + 1e-4)
    rel_h = float(jnp.linalg.norm(r64h)) / float(
        np.linalg.norm(y.astype(np.float64)))
    assert rel_h < 3e-5, rel_h
