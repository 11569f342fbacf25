"""Matérn covariance kernels (nu = 3/2 and 5/2).

Beyond reference parity (the reference ships only SE and periodic,
SURVEY.md §3): these follow the same contract — closed-form elementwise
cores shared by the jnp and Pallas paths, analytic hyperparameter
Jacobian/Hessian, sympy oracle — so the whole kernel test gate applies
unchanged.

With u = c |d| / w (c = sqrt(3) or sqrt(5)) and E = exp(-u):

  nu=3/2:  k = h^2 (1 + u) E
    k_w  = h^2 u^2 E / w
    k_ww = h^2 u^2 (u - 3) E / w^2

  nu=5/2:  k = h^2 (1 + u + u^2/3) E
    k_w  = h^2 u^2 (1 + u) E / (3 w)
    k_ww = h^2 u^2 (u^2 - 3u - 3) E / (3 w^2)

(derivation: u depends on w as u' = -u/w; chain rule through
phi(u) e^{-u}; cross terms with h are the obvious 2h/h^2 scalings).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaussian_processes_tpu.models.base import Kernel, register_kernel_dataclass

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979


@register_kernel_dataclass
class Matern32Kernel(Kernel):
    """Matérn nu=3/2 with output scale h and lengthscale w."""

    h: jax.Array
    w: jax.Array

    param_names = ("h", "w")

    @staticmethod
    def k_fn(d, h, w):
        u = _SQRT3 * jnp.abs(d) / w
        return (h * h) * (1.0 + u) * jnp.exp(-u)

    @staticmethod
    def jac_fn(d, h, w):
        u = _SQRT3 * jnp.abs(d) / w
        E = jnp.exp(-u)
        dh = 2.0 * h * (1.0 + u) * E
        dw = (h * h) * u * u * E / w
        return (dh, dw)

    @staticmethod
    def hess_fn(d, h, w):
        u = _SQRT3 * jnp.abs(d) / w
        E = jnp.exp(-u)
        hh = 2.0 * (1.0 + u) * E
        hw = 2.0 * h * u * u * E / w
        ww = (h * h) * u * u * (u - 3.0) * E / (w * w)
        return (hh, hw, ww)

    @classmethod
    def sym_K(cls):
        import sympy as sp

        # d must stay real (not positive) or sympy folds Abs(d) -> d
        d = sp.symbols("d", real=True)
        h, w = sp.symbols("h w", positive=True)
        u = sp.sqrt(3) * sp.Abs(d) / w
        expr = h ** 2 * (1 + u) * sp.exp(-u)
        return expr, d, (h, w)


@register_kernel_dataclass
class Matern52Kernel(Kernel):
    """Matérn nu=5/2 with output scale h and lengthscale w."""

    h: jax.Array
    w: jax.Array

    param_names = ("h", "w")

    @staticmethod
    def k_fn(d, h, w):
        u = _SQRT5 * jnp.abs(d) / w
        return (h * h) * (1.0 + u + u * u / 3.0) * jnp.exp(-u)

    @staticmethod
    def jac_fn(d, h, w):
        u = _SQRT5 * jnp.abs(d) / w
        E = jnp.exp(-u)
        dh = 2.0 * h * (1.0 + u + u * u / 3.0) * E
        dw = (h * h) * u * u * (1.0 + u) * E / (3.0 * w)
        return (dh, dw)

    @staticmethod
    def hess_fn(d, h, w):
        u = _SQRT5 * jnp.abs(d) / w
        E = jnp.exp(-u)
        hh = 2.0 * (1.0 + u + u * u / 3.0) * E
        hw = 2.0 * h * u * u * (1.0 + u) * E / (3.0 * w)
        ww = (h * h) * u * u * (u * u - 3.0 * u - 3.0) * E / (3.0 * w * w)
        return (hh, hw, ww)

    @classmethod
    def sym_K(cls):
        import sympy as sp

        d = sp.symbols("d", real=True)
        h, w = sp.symbols("h w", positive=True)
        u = sp.sqrt(5) * sp.Abs(d) / w
        expr = h ** 2 * (1 + u + u ** 2 / 3) * sp.exp(-u)
        return expr, d, (h, w)
