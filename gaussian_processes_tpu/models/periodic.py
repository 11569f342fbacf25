"""Periodic covariance kernel.

Capability parity with the reference (gp/kernels/periodic.py +
gp/kernels/periodic_c.pyx [R], SURVEY.md §3 C5/C8):

    k(x1, x2) = h^2 * exp(-2 sin^2(d / (2 p)) / w^2),   theta = (h, w, p)

with closed-form Jacobian (3, n, m) and Hessian (3, 3, n, m).

Derivation: write K = h^2 e^g with u = d/(2p), g = -2 sin^2(u) / w^2:

    g_w  =  4 sin^2(u) / w^3
    g_p  =  d sin(2u) / (w^2 p^2)
    g_ww = -12 sin^2(u) / w^4
    g_wp = -2 d sin(2u) / (w^3 p^2)
    g_pp = -d (d cos(2u) / p + 2 sin(2u)) / (w^2 p^3)

    K_h = 2 h e^g            K_hh = 2 e^g
    K_w = h^2 e^g g_w        K_hw = 2 h e^g g_w      K_hp = 2 h e^g g_p
    K_p = h^2 e^g g_p        K_ww = h^2 e^g (g_w^2 + g_ww)
    K_wp = h^2 e^g (g_w g_p + g_wp)
    K_pp = h^2 e^g (g_p^2 + g_pp)

All expressions are validated in tests against sympy, jax.grad and finite
differences (the reference's "native matches math" gate, SURVEY.md §5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussian_processes_tpu.models.base import Kernel, register_kernel_dataclass


@register_kernel_dataclass
class PeriodicKernel(Kernel):
    """Periodic kernel with output scale h, lengthscale w, period p."""

    h: jax.Array
    w: jax.Array
    p: jax.Array

    param_names = ("h", "w", "p")

    @staticmethod
    def k_fn(d, h, w, p):
        s = jnp.sin(d / (2.0 * p))
        return (h * h) * jnp.exp(-2.0 * s * s / (w * w))

    @staticmethod
    def jac_fn(d, h, w, p):
        u = d / (2.0 * p)
        s = jnp.sin(u)
        s2u = jnp.sin(2.0 * u)
        iw2 = 1.0 / (w * w)
        E = jnp.exp(-2.0 * s * s * iw2)
        g_w = 4.0 * s * s * iw2 / w
        g_p = d * s2u * iw2 / (p * p)
        dh = 2.0 * h * E
        dw = (h * h) * E * g_w
        dp = (h * h) * E * g_p
        return (dh, dw, dp)

    @staticmethod
    def hess_fn(d, h, w, p):
        u = d / (2.0 * p)
        s = jnp.sin(u)
        s2u = jnp.sin(2.0 * u)
        c2u = jnp.cos(2.0 * u)
        iw2 = 1.0 / (w * w)
        ip = 1.0 / p
        E = jnp.exp(-2.0 * s * s * iw2)
        h2E = (h * h) * E

        g_w = 4.0 * s * s * iw2 / w
        g_p = d * s2u * iw2 * ip * ip
        g_ww = -12.0 * s * s * iw2 * iw2
        g_wp = -2.0 * d * s2u * iw2 / w * ip * ip
        g_pp = -d * (d * c2u * ip + 2.0 * s2u) * iw2 * ip * ip * ip

        k_hh = 2.0 * E
        k_hw = 2.0 * h * E * g_w
        k_hp = 2.0 * h * E * g_p
        k_ww = h2E * (g_w * g_w + g_ww)
        k_wp = h2E * (g_w * g_p + g_wp)
        k_pp = h2E * (g_p * g_p + g_pp)
        return (k_hh, k_hw, k_hp, k_ww, k_wp, k_pp)

    @classmethod
    def sym_K(cls):
        import sympy as sp

        d, h, w, p = sp.symbols("d h w p", positive=True)
        expr = h ** 2 * sp.exp(-2 * sp.sin(d / (2 * p)) ** 2 / w ** 2)
        return expr, d, (h, w, p)
