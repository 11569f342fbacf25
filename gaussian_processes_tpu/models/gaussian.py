"""Squared-exponential ("Gaussian") covariance kernel.

Capability parity with the reference (gp/kernels/gaussian.py +
gp/kernels/gaussian_c.pyx [R], SURVEY.md §3 C4/C7):

    k(x1, x2) = h^2 * exp(-(x1 - x2)^2 / (2 w^2)),   theta = (h, w)

with closed-form Jacobian (2, n, m) and Hessian (2, 2, n, m) with respect
to the hyperparameters.  Where the reference compiles these expressions to
C via Cython, here they are vectorized jnp elementwise cores fused by XLA
(and reused by the Pallas tiled builder in ops/pairwise.py).

Derivatives (E = exp(-d^2 / (2 w^2)), d = x1 - x2):

    dK/dh   = 2 h E                 d2K/dh2  = 2 E
    dK/dw   = h^2 E d^2 / w^3       d2K/dhdw = 2 h E d^2 / w^3
    d2K/dw2 = h^2 E (d^4 / w^6 - 3 d^2 / w^4)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussian_processes_tpu.models.base import Kernel, register_kernel_dataclass


@register_kernel_dataclass
class GaussianKernel(Kernel):
    """Squared-exponential kernel with output scale h and lengthscale w."""

    h: jax.Array
    w: jax.Array

    param_names = ("h", "w")

    @staticmethod
    def k_fn(d, h, w):
        iw2 = 1.0 / (w * w)
        return (h * h) * jnp.exp(-0.5 * d * d * iw2)

    @staticmethod
    def jac_fn(d, h, w):
        d2 = d * d
        iw2 = 1.0 / (w * w)
        E = jnp.exp(-0.5 * d2 * iw2)
        dh = 2.0 * h * E
        dw = (h * h) * E * d2 * iw2 / w
        return (dh, dw)

    @staticmethod
    def hess_fn(d, h, w):
        d2 = d * d
        iw2 = 1.0 / (w * w)
        iw3 = iw2 / w
        E = jnp.exp(-0.5 * d2 * iw2)
        hh = 2.0 * E
        hw = 2.0 * h * E * d2 * iw3
        ww = (h * h) * E * (d2 * d2 * iw3 * iw3 - 3.0 * d2 * iw2 * iw2)
        return (hh, hw, ww)

    @classmethod
    def sym_K(cls):
        import sympy as sp

        d, h, w = sp.symbols("d h w", positive=True)
        expr = h ** 2 * sp.exp(-(d ** 2) / (2 * w ** 2))
        return expr, d, (h, w)
