"""Device linear algebra: the TPU-native replacement for CHOLMOD + BLAS.

Where the reference reaches CHOLMOD through an FFI (sparse-cholesky.lisp) and
a C shim (wrapper.c), this package supplies compiled-in XLA/Pallas kernels:

- :mod:`.dd`         — double-word (two-float) arithmetic: fp64-emulation
  building blocks for computing residuals beyond working precision on a
  device whose MXU is f32/bf16 (SURVEY.md §7 "Precision").
- :mod:`.dense`      — normal-equations assembly A·D²·Aᵀ, Cholesky
  factor/solve with iterative refinement, and singularity detection
  (the analogue of cholmod_analyze/factorize/solve2 + solve-dense,
  sparse-cholesky.lisp:261-298,409-431).
- :mod:`.pallas_chol`— blocked right-looking Cholesky as a Pallas MXU
  kernel (the native-kernel replacement for CHOLMOD's supernodal LLᵀ).
- :mod:`.sparse_ops` — block/COO sparse products for the matrix-free path
  (analogue of cholmod_sdmult, sparse-cholesky.lisp:567-614).
- :mod:`.bell`       — block-ELL (dense (8, 128)-tile) sparse matvec:
  the HBM-bandwidth SpMV the hot matrix-free paths ride; plain ELL
  gather/scatter serializes on TPU (docs/DEVNOTES.md r4).
"""

from cholesky_is_magic_tpu.ops.dense import (
    CholFactors,
    normal_matrix,
    factorize,
    solve_normal,
    solve_spd,
)
from cholesky_is_magic_tpu.ops.dd import DD, two_sum, two_prod, dd_add, dd_sum, dd_matvec

__all__ = [
    "CholFactors",
    "normal_matrix",
    "factorize",
    "solve_normal",
    "solve_spd",
    "DD",
    "two_sum",
    "two_prod",
    "dd_add",
    "dd_sum",
    "dd_matvec",
]
