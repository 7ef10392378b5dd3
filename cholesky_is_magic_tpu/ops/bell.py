"""Block-ELL sparse matvec: dense (8, 128) tiles instead of element gathers.

The plain ELL products (ops.sparse_ops) bottom out in XLA's elementwise
gather/scatter lowering, which SERIALIZES on TPU: at m=16384 (147k nnz,
staircase pattern) one SpMV measures ~1.07 ms — 0.0003% of the chip's
f32 peak and ~30x above the HBM-bandwidth floor of reading the operand
once.  The TPU has no cross-lane hardware gather; the only fast dynamic
addressing is whole-tile dynamic slicing.  So the TPU-native sparse
layout is BLOCK-ELL: the matrix is cut into dense (8, 128) tiles
(sublane x lane — the native f32 register tile), each 8-row block-row
stores its nonempty tiles padded to a common count ``kb``, and the
product is

    y[8r : 8r+8] = sum_k  blocks[r, k] @ x[128 * bcols[r, k] : ...+128]

— per-block dense (8,128)x(128,) products plus a whole-128-lane gather
of x, both of which the TPU executes at full vector width.  Zero-padded
tiles (bcols 0, values 0) are provably inert.

The trade is storage inflation: a tile is stored dense, so patterns
whose 8-row windows touch many distinct 128-column blocks explode.
:func:`from_coo` therefore returns ``None`` when the inflated bytes
exceed ``max_bytes`` or a fraction of the dense footprint — callers keep
the plain-ELL route as fallback (wired by ingest.device.to_sparse_lp for
the matrix-free path and solvers.pdas.make_pdas_sparse /
solvers.affine.make_affine_state_sparse for the IPM loops, whose
double-word A-products ride :func:`dd_matvec` / :func:`dd_matvec_dd`).
Banded/staircase LP structure (the at-scale benchmark family, and most
real Netlib-class patterns after the slack identity block) inflates by
only ~10-60x over raw nnz while buying back ~1000x in execution model,
measured 8-20x end-to-end (see benchmarks / docs/DEVNOTES.md r4).

Reference parity: this replaces cholmod_sdmult (sparse-m*,
sparse-cholesky.lisp:567-614) on the TPU hot paths exactly like
ops.sparse_ops does; the layout change is the documented deviation — the
reference's CSC SpMV is a host-bandwidth algorithm with no TPU analogue.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BR = 8  # block rows  (f32 sublane tile)
BC = 128  # block cols (lane tile)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["blocks", "bcols"],
    meta_fields=["n_rows", "n_cols"],
)
@dataclasses.dataclass(frozen=True)
class BellMatrix:
    """Block-ELL matrix: dense (8, 128) tiles, one padded tile list per
    8-row block-row.  A pytree; logical shape is static metadata."""

    blocks: jax.Array  # (nbr, kb, BR, BC); 0.0 on padded tiles
    bcols: jax.Array  # (nbr, kb) int32 block-column ids; 0 on padded tiles
    n_rows: int  # logical row count (<= nbr * BR)
    n_cols: int  # logical column count (<= max bcol * BC + BC)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def kb(self) -> int:
        return self.blocks.shape[1]


def from_coo(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: tuple[int, int],
    dtype=jnp.float32,
    max_bytes: int = 256 * 1024 * 1024,
    max_dense_frac: float = 1.0,
) -> BellMatrix | None:
    """Build a BellMatrix from COO triplets (duplicates summed, same
    semantics as sparse_ops.from_coo / the CHOLMOD triplet convention).

    Returns ``None`` when the blocked footprint exceeds ``max_bytes`` or
    ``max_dense_frac`` of the dense (m x n) bytes — the caller's signal
    to stay on plain ELL / dense.  The gates are deliberately loose:
    the ELL gather runs at ~7 ns/nonzero (serialized), BELL at HBM
    bandwidth, so BELL wins until ~1000x storage inflation — the binding
    constraints are memory (``max_bytes``) and the dense crossover (a
    BELL as large as the dense operand loses to the MXU matmul outright).
    """
    m, n = shape
    if m == 0 or len(vals) == 0:
        return None
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals, dtype=np.float64)
    # Sum duplicates at the TRIPLET level (f64, nnz-sized) so `blocks`
    # can be allocated directly in the target dtype: staging the whole
    # tile array in f64 doubled peak host memory vs the max_bytes gate
    # (up to ~512 MB per operand at the 256 MB gate; ADVICE r4).
    key = rows.astype(np.int64) * n + cols.astype(np.int64)
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    uniq_key, start = np.unique(key_sorted, return_index=True)
    vals = np.add.reduceat(vals[order], start)
    rows = (uniq_key // n).astype(np.int64)
    cols = (uniq_key % n).astype(np.int64)
    nbr = -(-m // BR)
    brow = rows // BR
    bcol = cols // BC
    # Distinct tiles per block-row -> kb.
    tile_ids = brow * ((n // BC) + 2) + bcol
    uniq = np.unique(tile_ids)
    tiles_per_brow = np.bincount((uniq // ((n // BC) + 2)).astype(np.int64),
                                 minlength=nbr)
    kb = max(int(tiles_per_brow.max()), 1)
    itemsize = jnp.dtype(dtype).itemsize
    bytes_bell = nbr * kb * BR * BC * itemsize
    if bytes_bell > max_bytes or bytes_bell > max_dense_frac * m * n * itemsize:
        return None
    blocks = np.zeros((nbr, kb, BR, BC), dtype=jnp.dtype(dtype))
    bcols = np.zeros((nbr, kb), dtype=np.int32)
    # Slot index of each tile within its block-row (tiles are sorted by
    # (brow, bcol) in `uniq`).
    slot_of_tile = np.concatenate(
        [np.arange(c, dtype=np.int64) for c in tiles_per_brow]
    ) if nbr else np.zeros(0, np.int64)
    tile_slot = dict(zip(uniq.tolist(), slot_of_tile.tolist()))
    br_of_tile = (uniq // ((n // BC) + 2)).astype(np.int64)
    bc_of_tile = (uniq % ((n // BC) + 2)).astype(np.int64)
    for t, b_r, b_c in zip(uniq.tolist(), br_of_tile.tolist(), bc_of_tile.tolist()):
        bcols[b_r, tile_slot[t]] = b_c
    slot = np.array([tile_slot[t] for t in tile_ids.tolist()], dtype=np.int64)
    # Triplets are unique post-dedup: plain assignment, no add needed.
    blocks[brow, slot, rows % BR, cols % BC] = vals.astype(jnp.dtype(dtype))
    return BellMatrix(
        blocks=jnp.asarray(blocks, dtype=dtype),
        bcols=jnp.asarray(bcols),
        n_rows=m,
        n_cols=n,
    )


def matvec(B: BellMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x via whole-tile gathers + per-tile dense products."""
    ncb = -(-B.n_cols // BC)
    xp = jnp.pad(x, (0, ncb * BC - B.n_cols)).reshape(ncb, BC)
    xg = xp[B.bcols]  # (nbr, kb, BC): gather of full 128-lane rows
    y = jnp.einsum(
        "rkij,rkj->ri", B.blocks, xg,
        preferred_element_type=B.blocks.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(-1)[: B.n_rows]


def _gather_x(B: BellMatrix, x: jax.Array) -> jax.Array:
    """(nbr, kb, BC) whole-tile gather of x, zero-padded past n_cols."""
    ncb = -(-B.n_cols // BC)
    xp = jnp.pad(x, (0, ncb * BC - B.n_cols)).reshape(ncb, BC)
    return xp[B.bcols]


def dd_matvec(B: BellMatrix, x: jax.Array):
    """A @ x in double-word: the BELL twin of sparse_ops.dd_matvec.

    Error-free per-element tile products (Dekker two_prod on the dense
    (8, 128) tiles) + compensated tree reductions over the lane and tile
    axes.  Padded tiles hold exact zeros and stay inert through two_prod;
    x lanes past n_cols multiply zero block values.  This trades the MXU
    einsum of :func:`matvec` for VPU elementwise work, but keeps the
    whole-tile gather — the part whose elementwise (per-nonzero) form
    serializes on TPU (see module docstring / docs/DEVNOTES.md r4)."""
    from cholesky_is_magic_tpu.ops import dd as ddm

    xg = _gather_x(B, x)  # (nbr, kb, BC)
    p = ddm.two_prod(B.blocks, xg[:, :, None, :])  # (nbr, kb, BR, BC)
    s = ddm.dd_sum(p, axis=-1)  # lanes  -> (nbr, kb, BR)
    s = ddm.dd_sum(s, axis=1)  # tiles  -> (nbr, BR)
    return ddm.DD(
        s.hi.reshape(-1)[: B.n_rows], s.lo.reshape(-1)[: B.n_rows]
    )


def dd_matvec_dd(B: BellMatrix, x):
    """A @ (x.hi + x.lo) in double-word (x a DD pair): dd product on the
    hi part + a working-precision product on the (already eps-small) lo
    part — same composition as sparse_ops.dd_matvec_dd / ops.dd."""
    from cholesky_is_magic_tpu.ops import dd as ddm

    main = dd_matvec(B, x.hi)
    return ddm.dd_add_w(main, matvec(B, x.lo))
