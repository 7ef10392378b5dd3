"""Padded-ELL sparse matrix products: the cholmod_sdmult replacement.

The reference's SpMV (sparse-m*, sparse-cholesky.lisp:567-614) wraps
cholmod_sdmult: y <- alpha·A·x + beta·y, optionally transposed.  The
TPU-native equivalent stores A in ELL layout — every row padded to the
same slot count — so the product is one gather + one elementwise multiply
+ one lane reduction, all static shapes:

    y_i = sum_k  values[i, k] * x[indices[i, k]]

and the transposed product is a scatter-add over the same slots.  Rows
with fewer nonzeros carry zero-valued slots (index 0, value 0) — masking
by value, not by index, keeps the gather branch-free.

This backs the matrix-free APPROX path at scales where the dense padded
matmul stops being the right trade (dense wins on the MXU until A's
density drops well below ~5-10%; see ops/__init__ notes).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["indices", "values"],
    meta_fields=["n_cols"],
)
@dataclasses.dataclass(frozen=True)
class ELLMatrix:
    """Row-padded sparse matrix (ELLPACK layout); a pytree with the
    logical column count as static metadata (jit-safe)."""

    indices: jax.Array  # (m, k) int32, 0 on padded slots
    values: jax.Array  # (m, k), 0.0 on padded slots
    n_cols: int  # static logical column count

    @property
    def shape(self):
        return (self.indices.shape[0], self.n_cols)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)


def from_coo(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: tuple[int, int],
    dtype=jnp.float32,
    min_slots: int = 1,
) -> ELLMatrix:
    """Build an ELLMatrix from COO triplets (duplicates summed, matching
    the CHOLMOD triplet->CSC semantics, sparse-cholesky.lisp:433-459)."""
    import scipy.sparse as sp

    m, n = shape
    C = sp.csr_matrix((vals, (rows, cols)), shape=shape)  # sums duplicates
    C.sort_indices()
    counts = np.diff(C.indptr)
    k = max(int(counts.max()) if m else 0, min_slots)
    indices = np.zeros((m, k), dtype=np.int32)
    values = np.zeros((m, k), dtype=np.float64)
    for i in range(m):
        c = counts[i]
        indices[i, :c] = C.indices[C.indptr[i] : C.indptr[i + 1]]
        values[i, :c] = C.data[C.indptr[i] : C.indptr[i + 1]]
    return ELLMatrix(
        indices=jnp.asarray(indices),
        values=jnp.asarray(values, dtype=dtype),
        n_cols=n,
    )


def from_dense(A: np.ndarray, dtype=jnp.float32) -> ELLMatrix:
    rows, cols = np.nonzero(A)
    return from_coo(rows, cols, np.asarray(A)[rows, cols], A.shape, dtype=dtype)


def matvec(E: ELLMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x: gather + lane reduction (sparse-m*, no transpose)."""
    return jnp.sum(E.values * x[E.indices], axis=1)


def rmatvec(E: ELLMatrix, y: jax.Array) -> jax.Array:
    """z = Aᵀ @ y: scatter-add over the slots (sparse-m* :transpose t)."""
    contrib = E.values * y[:, None]
    return jnp.zeros(E.n_cols, dtype=contrib.dtype).at[E.indices].add(contrib)


def scale_columns(E: ELLMatrix, d: jax.Array) -> ELLMatrix:
    """A · diag(d): the scale-sparse! analogue (sparse-cholesky.lisp:461-477)
    — gathers the per-column scale into each slot."""
    return E._replace(values=E.values * d[E.indices])


def sdmult(
    E: ELLMatrix,
    x: jax.Array,
    y: jax.Array | None = None,
    alpha: float = 1.0,
    beta: float = 0.0,
    transpose: bool = False,
) -> jax.Array:
    """y <- alpha·op(A)·x + beta·y, the full sparse-m* signature
    (sparse-cholesky.lisp:567-614)."""
    prod = rmatvec(E, x) if transpose else matvec(E, x)
    out = alpha * prod
    if y is not None and beta != 0.0:
        out = out + beta * y
    return out


def dd_matvec(E: ELLMatrix, x: jax.Array):
    """A @ x in double-word: error-free slot products + compensated lane
    reduction (the ELL twin of ops.dd.dd_matvec — the ELL layout makes
    the row reduction a plain axis sum, so the dd tree applies directly).
    Padded slots hold exact zeros and stay inert through two_prod."""
    from cholesky_is_magic_tpu.ops import dd as ddm

    p = ddm.two_prod(E.values, x[E.indices])
    return ddm.dd_sum(p, axis=1)


def dd_matvec_dd(E: ELLMatrix, x):
    """A @ (x.hi + x.lo) in double-word (x a DD pair)."""
    from cholesky_is_magic_tpu.ops import dd as ddm

    main = dd_matvec(E, x.hi)
    return ddm.dd_add_w(main, matvec(E, x.lo))


def to_dense(E: ELLMatrix) -> jax.Array:
    m, k = E.indices.shape
    out = jnp.zeros((m, E.n_cols), dtype=E.values.dtype)
    rows = jnp.repeat(jnp.arange(m)[:, None], k, axis=1)
    return out.at[rows, E.indices].add(E.values)
