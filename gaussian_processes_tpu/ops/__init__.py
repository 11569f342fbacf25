"""Native ops layer: Pallas TPU kernels (SURVEY.md §3 native callout).

The reference's only native code is its Cython kernel-evaluation
extensions; the TPU-native equivalents live here.
"""

from gaussian_processes_tpu.ops.pairwise import (
    pairwise_hessian,
    pairwise_jacobian,
    pairwise_matrix,
    pairwise_matrix_ard,
    pairwise_matrix_reference,
    tile_program,
)
from gaussian_processes_tpu.ops import host
from gaussian_processes_tpu.ops import kronecker
from gaussian_processes_tpu.ops import ski
from gaussian_processes_tpu.ops import toeplitz

__all__ = [
    "kronecker",
    "ski",
    "toeplitz",
    "pairwise_hessian",
    "pairwise_jacobian",
    "pairwise_matrix",
    "pairwise_matrix_ard",
    "pairwise_matrix_reference",
    "tile_program",
    "host",
]
