"""Kernel algebra: sum and product combinators.

Beyond reference parity (the reference has two fixed kernels): standard
GP practice composes them — e.g. the quasi-periodic kernel
``GaussianKernel * PeriodicKernel``.  Composites keep the full analytic
derivative contract: Jacobians concatenate over the children's parameter
blocks; Hessians are block-diagonal for sums, and for products use

    (k1 k2)'_p  = k1'_p k2          (p in theta1),  k1 k2'_q  (q in theta2)
    (k1 k2)''   = [[H1 k2,          J1 (x) J2],
                   [(J1 (x) J2)^T,  k1 H2     ]]

Composites are pytrees (children as fields), so they jit/grad/vmap like
leaf kernels; ``params``/``with_params`` expose the concatenated
hyperparameter vector so the MLE and NUTS layers work unchanged.  The
elementwise ``k_fn`` is provided as an *instance* method (children carry
their own sub-parameters); the Pallas tile builder composes the
children's static cores into one fused tile body
(``ops.pairwise.tile_program``), so composites keep the native path.

No ``sym_K`` for composites — correctness is gated against ``jax.grad``
and finite differences instead (tests/test_composite.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gaussian_processes_tpu.models.base import Kernel, pairwise_diff


class _CompositeKernel(Kernel):
    """Shared plumbing: concatenated params over (k1, k2)."""

    @property
    def supports_tiled(self):  # type: ignore[override]
        # tiled when the whole tree is tiled: ops/pairwise.tile_program
        # fuses the children's k_fn cores into one Pallas tile body
        return bool(self.k1.supports_tiled) and bool(self.k2.supports_tiled)

    @property
    def param_names(self):  # type: ignore[override]
        return tuple(f"k1.{n}" for n in self.k1.param_names) + tuple(
            f"k2.{n}" for n in self.k2.param_names
        )

    @property
    def params(self) -> jax.Array:
        return jnp.concatenate([self.k1.params, self.k2.params])

    def _param_values(self):
        return tuple(self.k1._param_values()) + tuple(self.k2._param_values())

    def with_params(self, theta) -> "_CompositeKernel":
        theta = jnp.asarray(theta)
        p1 = self.k1.n_params
        return dataclasses.replace(
            self,
            k1=self.k1.with_params(theta[:p1]),
            k2=self.k2.with_params(theta[p1:]),
        )

    @property
    def n_params(self) -> int:
        return self.k1.n_params + self.k2.n_params

    # elementwise core as an instance method: children own their params
    def k_fn(self, d, *params):  # type: ignore[override]
        p1 = self.k1.n_params
        return self._combine(
            self.k1.k_fn(d, *params[:p1]), self.k2.k_fn(d, *params[p1:])
        )

    def jac_fn(self, d, *params):  # pragma: no cover - matrix-level instead
        raise NotImplementedError("composites implement jacobian() directly")

    def hess_fn(self, d, *params):  # pragma: no cover
        raise NotImplementedError("composites implement hessian() directly")

    @classmethod
    def sym_K(cls):
        raise NotImplementedError(
            "composite kernels are validated against autodiff, not sympy"
        )

    def __call__(self, x1, x2):
        d = pairwise_diff(x1, x2)
        return self.k_fn(d, *self._param_values())


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SumKernel(_CompositeKernel):
    """k(d) = k1(d) + k2(d)."""

    k1: Kernel
    k2: Kernel

    @staticmethod
    def _combine(a, b):
        return a + b

    def jacobian(self, x1, x2):
        return jnp.concatenate(
            [self.k1.jacobian(x1, x2), self.k2.jacobian(x1, x2)]
        )

    def hessian(self, x1, x2):
        H1 = self.k1.hessian(x1, x2)
        H2 = self.k2.hessian(x1, x2)
        P1, P2 = self.k1.n_params, self.k2.n_params
        n, m = H1.shape[-2:]
        H = jnp.zeros((P1 + P2, P1 + P2, n, m), H1.dtype)
        H = H.at[:P1, :P1].set(H1)
        H = H.at[P1:, P1:].set(H2)
        return H

    def hessian_pair(self, x1, x2, p, q):
        """See Kernel.hessian_pair — one (n, m) slice; cross blocks of a
        sum kernel are identically zero (ADVICE r3)."""
        i, j = (p, q) if p <= q else (q, p)
        P1 = self.k1.n_params
        if j < P1:
            return self.k1.hessian_pair(x1, x2, i, j)
        if i >= P1:
            return self.k2.hessian_pair(x1, x2, i - P1, j - P1)
        n, m = jnp.asarray(x1).shape[0], jnp.asarray(x2).shape[0]
        return jnp.zeros((n, m), self.k1.hessian_pair(x1, x2, 0, 0).dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProductKernel(_CompositeKernel):
    """k(d) = k1(d) * k2(d) (e.g. quasi-periodic = SE * periodic)."""

    k1: Kernel
    k2: Kernel

    @staticmethod
    def _combine(a, b):
        return a * b

    def jacobian(self, x1, x2):
        K1 = self.k1(x1, x2)
        K2 = self.k2(x1, x2)
        J1 = self.k1.jacobian(x1, x2)
        J2 = self.k2.jacobian(x1, x2)
        return jnp.concatenate([J1 * K2[None], K1[None] * J2])

    def hessian(self, x1, x2):
        K1 = self.k1(x1, x2)
        K2 = self.k2(x1, x2)
        J1 = self.k1.jacobian(x1, x2)
        J2 = self.k2.jacobian(x1, x2)
        H1 = self.k1.hessian(x1, x2)
        H2 = self.k2.hessian(x1, x2)
        P1, P2 = self.k1.n_params, self.k2.n_params
        n, m = K1.shape
        cross = jnp.einsum("pnm,qnm->pqnm", J1, J2)
        H = jnp.zeros((P1 + P2, P1 + P2, n, m), K1.dtype)
        H = H.at[:P1, :P1].set(H1 * K2[None, None])
        H = H.at[P1:, P1:].set(K1[None, None] * H2)
        H = H.at[:P1, P1:].set(cross)
        H = H.at[P1:, :P1].set(jnp.swapaxes(cross, 0, 1))
        return H

    def hessian_pair(self, x1, x2, p, q):
        """See Kernel.hessian_pair — one (n, m) slice of the product
        rule (ADVICE r3)."""
        i, j = (p, q) if p <= q else (q, p)
        P1 = self.k1.n_params
        if j < P1:
            return self.k1.hessian_pair(x1, x2, i, j) * self.k2(x1, x2)
        if i >= P1:
            return self.k1(x1, x2) * self.k2.hessian_pair(
                x1, x2, i - P1, j - P1)
        # cross block: dK1/dtheta_i * dK2/dtheta_{j-P1}; indexing the
        # jacobian stack lets XLA DCE the sibling rows under jit
        return (self.k1.jacobian(x1, x2)[i]
                * self.k2.jacobian(x1, x2)[j - P1])
