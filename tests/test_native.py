"""Host-native C kernels vs the jnp implementations (SURVEY.md §5 gate 2:
"native code matches math").  The numpy fallback path is always tested;
the C path additionally when the extension is built (`make native`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_processes_tpu import GaussianKernel, PeriodicKernel
from gaussian_processes_tpu.ops import host
from gaussian_processes_tpu.utils import testing as tu


def _xs(n=40, m=30, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-3, 3, n), rng.uniform(-3, 3, m)


@pytest.mark.parametrize("fn_pair", [
    ("se", lambda x1, x2: (GaussianKernel(h=jnp.asarray(1.3), w=jnp.asarray(0.7)),
                           (1.3, 0.7))),
    ("periodic", lambda x1, x2: (PeriodicKernel(h=jnp.asarray(0.9),
                                                w=jnp.asarray(1.1),
                                                p=jnp.asarray(1.7)),
                                 (0.9, 1.1, 1.7))),
], ids=["se", "periodic"])
def test_host_matches_jnp(fn_pair):
    name, make = fn_pair
    x1, x2 = _xs()
    kernel, theta = make(x1, x2)
    if name == "se":
        K = host.se_k(x1, x2, *theta)
        J = host.se_jacobian(x1, x2, *theta)
        H = host.se_hessian(x1, x2, *theta)
    else:
        K = host.periodic_k(x1, x2, *theta)
        J = host.periodic_jacobian(x1, x2, *theta)
        H = host.periodic_hessian(x1, x2, *theta)
    np.testing.assert_allclose(K, np.asarray(kernel(x1, x2)), rtol=1e-12)
    np.testing.assert_allclose(J, np.asarray(kernel.jacobian(x1, x2)), rtol=1e-12)
    np.testing.assert_allclose(H, np.asarray(kernel.hessian(x1, x2)), rtol=1e-12)
    # hessian symmetry in the parameter axes
    np.testing.assert_allclose(H, np.swapaxes(H, 0, 1), rtol=1e-14)


@pytest.mark.skipif(not host.HAVE_NATIVE, reason="C extension not built")
def test_c_extension_is_loaded_and_used():
    # smoke: direct call through the raw fill-style API
    x1, x2 = _xs(8, 8)
    out = np.empty((8, 8))
    host._ckernels.se_K(out, np.ascontiguousarray(x1), np.ascontiguousarray(x2),
                        1.0, 0.5)
    np.testing.assert_allclose(out, host.se_k(x1, x2, 1.0, 0.5), rtol=1e-15)


@pytest.mark.skipif(not host.HAVE_NATIVE, reason="C extension not built")
def test_c_extension_rejects_bad_buffer():
    x1, x2 = _xs(8, 8)
    with pytest.raises(ValueError, match="wrong size"):
        host._ckernels.se_K(np.empty((4, 4)), np.ascontiguousarray(x1),
                            np.ascontiguousarray(x2), 1.0, 0.5)
