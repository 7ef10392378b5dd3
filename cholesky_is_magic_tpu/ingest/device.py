"""Standard form -> static-shape, padded device operands.

The reference marshals its problem into CHOLMOD CSC + Matlisp dense vectors
(sparse-cholesky.lisp:346-459).  The TPU-native equivalent is a padded,
static-shape operand set: XLA traces each solver once per shape, so every LP
is embedded into a (M, N) box rounded up to hardware-friendly multiples, with
boolean validity masks.  Padded entries are constructed to be *inert*:

- padded columns: A[:, j] = 0, c[j] = 0, bounds [-1, 1], x = 0 — their
  slacks are 1, their directions are masked to 0 in the solvers;
- padded rows: A[i, :] = 0, b[i] = 0 — the normal matrix A·D·Aᵀ gets +1 on
  those diagonal entries (see ops.dense.normal_matrix) so the Cholesky stays
  positive definite, and the corresponding dy is exactly 0.

This padding-with-masks scheme replaces the reference's dynamic problem sizes
(plain Lisp vectors) with the static shapes XLA requires.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_is_magic_tpu.ingest.standard_form import StandardForm


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "c", "b", "l", "u", "row_mask", "col_mask", "row_type"],
    meta_fields=["m", "n"],
)
@dataclasses.dataclass(frozen=True)
class DeviceLP:
    """Padded dense LP operands; a JAX pytree (m, n are static metadata).

    ``m``/``n`` are the *true* constraint/variable counts; array shapes are
    the padded (M, N).
    """

    A: jax.Array  # (M, N)
    c: jax.Array  # (N,)
    b: jax.Array  # (M,)
    l: jax.Array  # (N,)
    u: jax.Array  # (N,)
    row_mask: jax.Array  # (M,) bool, True = real row
    col_mask: jax.Array  # (N,) bool, True = real column
    row_type: jax.Array  # (M,) int8, StandardForm.ROW_EQ/LE/GE (0 when padded)
    m: int
    n: int

    @property
    def shape(self) -> tuple[int, int]:
        return self.A.shape[-2], self.A.shape[-1]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["E", "EB", "ETB", "c", "b", "l", "u", "row_type"],
    meta_fields=["m", "n"],
)
@dataclasses.dataclass(frozen=True)
class SparseLP:
    """Sparse device operands for the matrix-free path.

    Unlike DeviceLP there is no padding: the APPROX/ALM solvers are pure
    gather + elementwise, so the only static-shape requirement is the ELL
    slot count.  This is the at-scale operand set: memory follows nnz(A),
    not m*n.

    ``EB``/``ETB`` are optional block-ELL renderings of A and Aᵀ
    (ops.bell): XLA's elementwise gather/scatter lowering of the plain
    ELL products SERIALIZES on TPU (~1.07 ms forward / ~1.10 ms
    scatter-transpose at m=16384, 0.0003% of f32 peak), while the
    (8, 128)-tile BELL products run at HBM bandwidth (0.047 / 0.149 ms —
    23x / 7.4x; measured on v5e, docs/DEVNOTES.md r4).  They are None
    when the pattern inflates past bell.from_coo's byte gate, in which
    case the hot paths fall back to the ELL gather + scatter-add.
    """

    E: object  # ops.sparse_ops.ELLMatrix, (m, n)
    EB: object  # ops.bell.BellMatrix of A, or None (gate: bell.from_coo)
    ETB: object  # ops.bell.BellMatrix of Aᵀ, or None
    c: jax.Array  # (n,)
    b: jax.Array  # (m,)
    l: jax.Array  # (n,)
    u: jax.Array  # (n,)
    row_type: jax.Array  # (m,) int8
    m: int
    n: int


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["E", "ET", "c", "b", "l", "u", "row_mask", "col_mask",
                 "EB", "ETB"],
    meta_fields=["m", "n"],
)
@dataclasses.dataclass(frozen=True)
class SparseKKTLP:
    """Fully sparse operand set for the interior-point (KKT) solvers.

    The at-scale twin of DeviceLP: A lives as ELL pairs (E = A, ET = Aᵀ)
    so no dense (m, n) operand ever exists on device — at m = 16k the
    dense A alone is 2 GB.  No padding is needed (ELL shapes are already
    static; the tile engine pads rows internally with boosted gap slots),
    so the masks are all-true and exist only for code shared with the
    padded dense path.

    ``EB``/``ETB``: optional block-ELL renderings (see SparseLP — same
    serialized-gather story; the IPM loops' A-products, f32 AND
    double-word, ride these when the pattern admits them).  None when
    bell.from_coo's byte gate rejects; every consumer falls back to the
    plain ELL pair.
    """

    E: object  # ops.sparse_ops.ELLMatrix, (m, n)
    ET: object  # ELLMatrix of Aᵀ, (n, m)
    c: jax.Array  # (n,)
    b: jax.Array  # (m,)
    l: jax.Array  # (n,)
    u: jax.Array  # (n,)
    row_mask: jax.Array  # (m,) bool, all True
    col_mask: jax.Array  # (n,) bool, all True
    m: int
    n: int
    EB: object = None  # ops.bell.BellMatrix of A, or None
    ETB: object = None  # ops.bell.BellMatrix of Aᵀ, or None


def to_sparse_lp(sf: StandardForm, *, dtype=jnp.float32, big: float = 1e30,
                 bell_max_bytes: int = 256 * 1024 * 1024,
                 bell_max_dense_frac: float = 1.0) -> SparseLP:
    """StandardForm -> ELL-backed sparse operands (no padding).

    ``bell_max_bytes`` / ``bell_max_dense_frac`` forward to the
    ops.bell.from_coo storage gates for the EB/ETB renderings — raise
    ``bell_max_dense_frac`` for small LPs whose blocked footprint is
    marginally above the dense bytes (the gate is a per-operand crossover
    heuristic, and consumers like ALMConfig.dd_gradient REQUIRE the
    block-ELL forms)."""
    from cholesky_is_magic_tpu.ops import sparse_ops

    from cholesky_is_magic_tpu.ops import bell

    E = sparse_ops.from_coo(
        sf.a_rows, sf.a_cols, sf.a_vals, (sf.ncons, sf.nvars), dtype=dtype
    )
    EB = bell.from_coo(
        sf.a_rows, sf.a_cols, sf.a_vals, (sf.ncons, sf.nvars), dtype=dtype,
        max_bytes=bell_max_bytes, max_dense_frac=bell_max_dense_frac,
    )
    ETB = bell.from_coo(
        sf.a_cols, sf.a_rows, sf.a_vals, (sf.nvars, sf.ncons), dtype=dtype,
        max_bytes=bell_max_bytes, max_dense_frac=bell_max_dense_frac,
    )
    return SparseLP(
        E=E,
        EB=EB,
        ETB=ETB,
        c=jnp.asarray(sf.c, dtype=dtype),
        b=jnp.asarray(sf.b, dtype=dtype),
        l=jnp.asarray(np.clip(sf.l, -big, big), dtype=dtype),
        u=jnp.asarray(np.clip(sf.u, -big, big), dtype=dtype),
        row_type=jnp.asarray(sf.row_type),
        m=sf.ncons,
        n=sf.nvars,
    )


def to_device_lp(
    sf: StandardForm,
    *,
    pad_multiple: int = 128,
    dtype=jnp.float32,
    big: float = 1e30,
    shape: tuple[int, int] | None = None,
    as_numpy: bool = False,
) -> DeviceLP:
    """Embed a StandardForm into a padded DeviceLP.

    Infinite bounds are encoded as +/-``big`` (default 1e30, well above every
    threshold the solvers use — the reference's clamps kick in at 1e8,
    primal-dual-affine-scaling.lisp:37) so that f32/bf16 arrays never hold
    actual infinities (inf - inf would poison masked arithmetic).

    ``shape`` forces an explicit padded (M, N) instead of the per-problem
    round-up — heterogeneous LPs embedded into one common box stack into a
    batch (api.solve_batch / parallel.batched_pdas).

    ``as_numpy=True`` keeps the leaves as host numpy arrays (no device
    transfer) — batch builders stack many LPs host-side and ship ONE
    stacked array per leaf instead of paying a transfer per problem.
    """
    m, n = sf.ncons, sf.nvars
    if shape is not None:
        M, N = shape
        if M < m or N < n:
            raise ValueError(f"shape {shape} smaller than problem ({m}, {n})")
    else:
        M = round_up(max(m, 1), pad_multiple)
        N = round_up(max(n, 1), pad_multiple)

    A = np.zeros((M, N), dtype=np.float64)
    np.add.at(A, (sf.a_rows, sf.a_cols), sf.a_vals)

    c = np.zeros(N)
    c[:n] = sf.c
    b = np.zeros(M)
    b[:m] = sf.b

    l = np.full(N, -1.0)
    u = np.full(N, 1.0)
    l[:n] = np.clip(sf.l, -big, big)
    u[:n] = np.clip(sf.u, -big, big)

    row_mask = np.zeros(M, dtype=bool)
    row_mask[:m] = True
    col_mask = np.zeros(N, dtype=bool)
    col_mask[:n] = True
    row_type = np.zeros(M, dtype=np.int8)
    row_type[:m] = sf.row_type

    if as_numpy:
        np_dtype = np.dtype(jnp.dtype(dtype).name)
        return DeviceLP(
            A=A.astype(np_dtype), c=c.astype(np_dtype), b=b.astype(np_dtype),
            l=l.astype(np_dtype), u=u.astype(np_dtype),
            row_mask=row_mask, col_mask=col_mask, row_type=row_type,
            m=m, n=n,
        )
    return DeviceLP(
        A=jnp.asarray(A, dtype=dtype),
        c=jnp.asarray(c, dtype=dtype),
        b=jnp.asarray(b, dtype=dtype),
        l=jnp.asarray(l, dtype=dtype),
        u=jnp.asarray(u, dtype=dtype),
        row_mask=jnp.asarray(row_mask),
        col_mask=jnp.asarray(col_mask),
        row_type=jnp.asarray(row_type),
        m=m,
        n=n,
    )
