"""ARD (automatic relevance determination) kernels over D-dim inputs.

Beyond reference parity: the reference is strictly 1-D (SURVEY.md §1);
real regression problems have vector inputs with per-dimension
lengthscales.  Inputs are (n, D) arrays; everything downstream
(``fit``/``predict``/MLE/NUTS) is shape-agnostic, so ARD kernels drop in
wherever a 1-D kernel does — only the Pallas tile builder (1-D
differences) does not apply (``supports_tiled = False``).

ARD squared-exponential, theta = (h, w_1..w_D), P = 1 + D:

    k(x, x') = h^2 exp(-1/2 sum_d (x_d - x'_d)^2 / w_d^2)

With s_d = diff_d^2 / w_d^2, E = exp(-1/2 sum_d s_d), t_d = s_d / w_d:

    dK/dh          = 2 h E
    dK/dw_d        = h^2 E t_d
    d2K/dh2        = 2 E
    d2K/dh dw_d    = 2 h E t_d
    d2K/dw_d dw_e  = h^2 E (t_d t_e - delta_de 3 s_d / w_d^2)

Validated against ``jax.grad``/``jax.hessian`` and finite differences,
and against the 1-D ``GaussianKernel`` when D=1 (tests/test_ard.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gaussian_processes_tpu.models.base import Kernel


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ARDGaussianKernel(Kernel):
    """Squared-exponential with output scale h and lengthscales w (D,)."""

    h: jax.Array
    w: jax.Array  # (D,)

    supports_tiled = False
    param_names = ("h", "w")  # informational; params is (1 + D,)

    # -- parameter vector interface (h scalar + w vector) -------------------

    @property
    def n_params(self) -> int:
        return 1 + self.w.shape[0]

    @property
    def params(self) -> jax.Array:
        h = jnp.asarray(self.h, jnp.result_type(self.h, self.w))
        return jnp.concatenate([h[None], jnp.asarray(self.w)])

    def _param_values(self):
        return (self.h, self.w)

    def with_params(self, theta) -> "ARDGaussianKernel":
        theta = jnp.asarray(theta)
        return dataclasses.replace(self, h=theta[0], w=theta[1:])

    # -- evaluation ----------------------------------------------------------

    @staticmethod
    def k_fn(d, h, w):  # pragma: no cover - 1-D path unused
        raise NotImplementedError("ARD kernels act on (n, D) inputs")

    @staticmethod
    def jac_fn(d, h, w):  # pragma: no cover
        raise NotImplementedError

    @staticmethod
    def hess_fn(d, h, w):  # pragma: no cover
        raise NotImplementedError

    def _sq(self, x1, x2):
        """Per-dimension scaled squared differences s, shape (n, m, D)."""
        x1 = jnp.atleast_2d(jnp.asarray(x1))
        x2 = jnp.atleast_2d(jnp.asarray(x2))
        diff = x1[:, None, :] - x2[None, :, :]
        return jnp.square(diff) / jnp.square(self.w)[None, None, :]

    def __call__(self, x1, x2):
        s = self._sq(x1, x2)
        return jnp.square(self.h) * jnp.exp(-0.5 * jnp.sum(s, axis=-1))

    def kdiag(self, xo):
        m = jnp.asarray(xo).shape[0]
        return jnp.broadcast_to(jnp.square(self.h), (m,))

    def jacobian(self, x1, x2):
        s = self._sq(x1, x2)  # (n, m, D)
        E = jnp.exp(-0.5 * jnp.sum(s, axis=-1))
        h2E = jnp.square(self.h) * E
        t = s / self.w[None, None, :]  # (n, m, D)
        dh = 2.0 * self.h * E
        dw = h2E[:, :, None] * t  # (n, m, D)
        return jnp.concatenate(
            [dh[None], jnp.moveaxis(dw, -1, 0)], axis=0
        )  # (1 + D, n, m)

    def hessian_pair(self, x1, x2, p, q):
        """See Kernel.hessian_pair — builds only the requested (n, m)
        slice; the fused ``hessian`` below materializes the full
        (1+D, 1+D, n, m) stack, which the chunked log-lh Hessian must
        avoid (ADVICE r3)."""
        i, j = (p, q) if p <= q else (q, p)
        s = self._sq(x1, x2)  # (n, m, D)
        E = jnp.exp(-0.5 * jnp.sum(s, axis=-1))
        if i == 0 and j == 0:
            return 2.0 * E
        t = s / self.w[None, None, :]
        if i == 0:  # h x w_{j-1} cross term
            return 2.0 * self.h * E * t[..., j - 1]
        d_, e_ = i - 1, j - 1
        h2E = jnp.square(self.h) * E
        val = h2E * t[..., d_] * t[..., e_]
        if d_ == e_:
            val = val - h2E * 3.0 * s[..., d_] / jnp.square(self.w[d_])
        return val

    def hessian(self, x1, x2):
        s = self._sq(x1, x2)
        E = jnp.exp(-0.5 * jnp.sum(s, axis=-1))
        h = self.h
        h2E = jnp.square(h) * E
        t = s / self.w[None, None, :]  # (n, m, D)
        D = self.w.shape[0]
        n, m = E.shape

        hh = 2.0 * E  # (n, m)
        hw = 2.0 * h * E[:, :, None] * t  # (n, m, D)
        tt = jnp.einsum("nmd,nme->nmde", t, t)  # t_d t_e
        corr = 3.0 * s / jnp.square(self.w)[None, None, :]  # 3 s_d / w_d^2
        eye = jnp.eye(D, dtype=E.dtype)[None, None]  # (1, 1, D, D)
        ww = h2E[:, :, None, None] * (tt - eye * corr[:, :, :, None])

        H = jnp.zeros((1 + D, 1 + D, n, m), E.dtype)
        H = H.at[0, 0].set(hh)
        H = H.at[0, 1:].set(jnp.moveaxis(hw, -1, 0))
        H = H.at[1:, 0].set(jnp.moveaxis(hw, -1, 0))
        H = H.at[1:, 1:].set(jnp.moveaxis(ww, (-2, -1), (0, 1)))
        return H

    @classmethod
    def sym_K(cls):
        raise NotImplementedError(
            "ARD kernels are validated against autodiff, not sympy"
        )
