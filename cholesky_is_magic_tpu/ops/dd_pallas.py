"""Pallas TPU kernel for the double-word matvec: one pass over A.

ops.dd.dd_matvec is the hot primitive of every double-word code path (the
pdas_dd right-hand sides, the operator-residual refinement in ops.dense
and both sparse engines).  Its XLA form materializes the error-free
product pair two_prod(A, x) — two full (m, n) transients — plus log2(n)
tree-reduction stages, all through HBM: measured 10-16x the cost of a
plain matvec on v5e (2.90 ms vs 0.18 ms at (4096, 8192); the
bandwidth-bound minimum of one A read is 0.17 ms).

This kernel streams A tile-by-tile through VMEM exactly once and keeps
PER-LANE double-word accumulators in VMEM scratch:

    for each k-tile (sequential grid axis):
        p, e = two_prod(A_tile, x_tile)          # elementwise, VPU
        acc  = dd_add(acc, (p, e))               # compensated, per lane

emitting one (bm, bn) partial pair per row-tile; the final cross-lane
dd reduction runs outside the kernel on the tiny (m, bn) partials.
A transposed variant reduces over the sublane (row) axis instead, so
Aᵀ·x also reads A in its natural layout (no transpose copy).

The reference gets its fp64 dot products from CHOLMOD/BLAS on the host
(sparse-cholesky.lisp); this kernel is the TPU-native rendering —
SURVEY.md §7.2's "native component": where the reference has wrapper.c +
a C library, the TPU build has Pallas/Mosaic kernels.

Accuracy contract: identical algorithm to ops.dd (error-free two_prod +
compensated accumulation) — eps^2-class, validated against the XLA
implementation in tests/test_dd_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cholesky_is_magic_tpu.ops import dd as ddm
from cholesky_is_magic_tpu.ops.dd import DD

BM = 256  # preferred row-tile (sublanes)
BN = 512  # preferred column-tile (lanes)


def _pick(size: int, prefs=(512, 256, 128, 64, 32, 16, 8)) -> int:
    """Largest preferred tile dividing ``size`` (0 if none: unsupported)."""
    for p in prefs:
        if size % p == 0:
            return p
    return 0


def _dd_accumulate(acc_hi, acc_lo, a, x_row):
    """acc += two_prod(a, x_row), all elementwise in f32 (Dekker/Knuth)."""
    p = a * x_row
    C = jnp.float32(4097.0)  # 2^12 + 1, the f32 Dekker split constant
    ca = C * a
    ah = ca - (ca - a)
    al = a - ah
    cx = C * x_row
    xh = cx - (cx - x_row)
    xl = x_row - xh
    e = ((ah * xh - p) + ah * xl + al * xh) + al * xl
    # two_sum(acc_hi, p) then fold (err + e) into the low word.
    h = acc_hi[:]
    s = h + p
    bb = s - h
    err = (h - (s - bb)) + (p - bb)
    lo = acc_lo[:] + (err + e)
    hi2 = s + lo
    acc_hi[:] = hi2
    acc_lo[:] = lo - (hi2 - s)


def _mv_kernel(x_ref, a_ref, hi_ref, lo_ref, acc_hi, acc_lo):
    """out[i] = sum_j A[i, j] x[j]: reduce over the lane (column) axis."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_hi[:] = jnp.zeros_like(acc_hi)
        acc_lo[:] = jnp.zeros_like(acc_lo)

    _dd_accumulate(acc_hi, acc_lo, a_ref[:], x_ref[:])  # (1, BN) broadcasts

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        hi_ref[:] = acc_hi[:]
        lo_ref[:] = acc_lo[:]


def _rmv_kernel(x_ref, a_ref, hi_ref, lo_ref, acc_hi, acc_lo):
    """out[j] = sum_i A[i, j] x[i]: reduce over the sublane (row) axis,
    reading A in its natural layout (no transpose copy)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_hi[:] = jnp.zeros_like(acc_hi)
        acc_lo[:] = jnp.zeros_like(acc_lo)

    _dd_accumulate(acc_hi, acc_lo, a_ref[:], x_ref[:, 0:1])  # (BM, 1) broadcasts

    @pl.when(k == pl.num_programs(1) - 1)
    def _():
        hi_ref[:] = acc_hi[:]
        lo_ref[:] = acc_lo[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def _dd_mv_partials(A, x, bm=BM, bn=BN, interpret=False):
    m, n = A.shape
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        _mv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn), lambda i, k: (0, k)),
            pl.BlockSpec((bm, bn), lambda i, k: (i, k)),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda i, k: (i, 0)),
            pl.BlockSpec((bm, bn), lambda i, k: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, bn), jnp.float32),
            jax.ShapeDtypeStruct((m, bn), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        interpret=interpret,
    )(x.reshape(1, n), A)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def _dd_rmv_partials(A, x, bm=BM, bn=BN, interpret=False):
    m, n = A.shape
    grid = (n // bn, m // bm)
    # x enters as an (m, 8) sublane-replicated panel: Mosaic rejects thin
    # 1-D blocks, and a (bm, 1) lane-broadcast inside the kernel is cheap.
    xb = jnp.broadcast_to(x[:, None], (m, 8))
    return pl.pallas_call(
        _rmv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, 8), lambda j, k: (k, 0)),
            pl.BlockSpec((bm, bn), lambda j, k: (k, j)),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
            pl.BlockSpec((bm, bn), lambda j, k: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bm, n), jnp.float32),
            jax.ShapeDtypeStruct((bm, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        interpret=interpret,
    )(xb, A)


def _tiles(A, x):
    """(bm, bn) for a supported (TPU, f32, tileable) call, else None."""
    if jax.default_backend() != "tpu":
        return None
    if A.dtype != jnp.float32 or x.dtype != jnp.float32 or A.ndim != 2:
        return None
    m, n = A.shape
    bm = _pick(m)
    bn = _pick(n, prefs=(512, 256, 128))  # lanes: multiples of 128 only
    if not bm or not bn:
        return None
    return bm, bn


def dd_matvec(A: jax.Array, x: jax.Array, interpret: bool = False) -> DD:
    """Drop-in for ops.dd.dd_matvec via the Pallas kernel (TPU, f32,
    dimensions tileable); falls back to the XLA implementation otherwise.

    Measured on v5e (K=256 chained, RTT-corrected): 0.49 vs 2.90 ms at
    (4096, 8192) — 5.9x over the XLA form, ~3x off the one-A-read
    bandwidth bound; 2.0x at (1536, 4608), 1.4x at (768, 2048)."""
    tiles = _tiles(A, x)
    if not (interpret or tiles):
        return ddm._dd_matvec_xla(A, x)
    bm, bn = tiles if tiles else (BM, BN)
    hi, lo = _dd_mv_partials(A, x, bm=bm, bn=bn, interpret=interpret)
    return ddm.dd_sum(DD(hi, lo), axis=-1)


def dd_rmatvec(A: jax.Array, x: jax.Array, interpret: bool = False) -> DD:
    """Aᵀ·x in double-word, reading A in natural layout (no transpose
    copy).  Falls back to the XLA dd_matvec on Aᵀ when unsupported.

    Measured on v5e: 0.32 vs 2.83 ms at (4096, 8192) — 8.8x; 2.8x at
    (1536, 4608), 1.9x at (768, 2048)."""
    tiles = _tiles(A, x)
    if not (interpret or tiles):
        return ddm._dd_matvec_xla(A.T, x)
    bm, bn = tiles if tiles else (BM, BN)
    hi, lo = _dd_rmv_partials(A, x, bm=bm, bn=bn, interpret=interpret)
    return ddm.dd_sum(DD(hi, lo), axis=0)


def dd_rmatvec_dd(A: jax.Array, x: DD) -> DD:
    """Compensated Aᵀ @ (x.hi + x.lo): dd rmatvec on the hi part plus a
    working-precision product on the (eps-small) lo part."""
    main = dd_rmatvec(A, x.hi)
    return ddm.dd_add_w(main, A.T @ x.lo)
