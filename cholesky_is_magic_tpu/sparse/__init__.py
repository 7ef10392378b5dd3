"""Sparse Cholesky: host symbolic analysis + device blocked numeric factor.

The reference delegates everything here to CHOLMOD through its FFI
(sparse-cholesky.lisp): `cholmod_analyze` does the fill-reducing ordering,
elimination tree and supernode detection once; `cholmod_factorize` redoes
the numeric LLᵀ each IPM iteration (SURVEY.md §3.1).  The TPU-native
replacement splits the same way:

- :mod:`.symbolic` (host, with a C++ native fast path in :mod:`.native`):
  minimum-degree ordering, elimination tree, postorder, column counts,
  supernode/panel detection -> a static :class:`FactorPlan` of 128-wide
  block operations.  Pure graph work; runs once per sparsity pattern.
- :mod:`.factor` (device): blocked right-looking factorization that walks
  the plan's static block schedule, skipping structurally-zero tiles —
  MXU matmuls for every Schur update, XLA-compiled once per plan.

On a single v5e chip the dense path (ops.dense) wins until the factor's
block sparsity is substantial (the MXU makes dense flops nearly free at
Netlib sizes — see BENCH notes); the sparse path is the scaling story for
m in the tens of thousands.
"""

from cholesky_is_magic_tpu.sparse.symbolic import (
    FactorPlan,
    analyze,
    amd_order,
    elimination_tree,
    postorder,
    column_counts,
    supernodes,
)
from cholesky_is_magic_tpu.sparse.factor import BlockSparseCholesky

__all__ = [
    "FactorPlan",
    "analyze",
    "amd_order",
    "elimination_tree",
    "postorder",
    "column_counts",
    "supernodes",
    "BlockSparseCholesky",
]
