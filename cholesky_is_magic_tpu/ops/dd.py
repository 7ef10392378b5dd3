"""Double-word ("double-double" style) arithmetic on the VPU.

The reference runs fp64 end-to-end on the host CPU (every vector is a
``double-float`` array).  The TPU's fast paths are f32/bf16, so to reach
CHOLMOD-class accuracy we keep *data* in working precision and compute
*residuals* in double-word precision: each value is an unevaluated sum
``hi + lo`` of two working-precision floats, giving ~2x the mantissa bits.
This is the classic Dekker/Knuth error-free-transformation toolkit
(T.J. Dekker, "A floating-point technique for extending the available
precision", 1971), vectorized over jnp arrays so it runs on the VPU.

Used by :func:`cholesky_is_magic_tpu.ops.dense.solve_spd` for iterative
refinement: factor in f32 on the MXU, compute b - N·x in double-word
precision, re-solve the correction (SURVEY.md §7 "Precision").

All functions are dtype-generic (f32 pairs on TPU, f64 pairs on CPU) and
safe under jit: XLA does not contract a*b +/- c into FMA by default, which
the Dekker split relies on.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DD(NamedTuple):
    """An unevaluated sum hi + lo with |lo| <= ulp(hi)/2."""

    hi: jax.Array
    lo: jax.Array

    def to_working(self) -> jax.Array:
        return self.hi + self.lo


def _split_constant(dtype) -> float:
    # 2^ceil(p/2) + 1 where p = mantissa bits: f32 -> 4097, f64 -> 2^27+1.
    if dtype == jnp.float64:
        return float(2**27 + 1)
    if dtype == jnp.float32:
        return float(2**12 + 1)
    raise ValueError(f"unsupported double-word base dtype {dtype}")


def two_sum(a: jax.Array, b: jax.Array) -> DD:
    """Error-free a + b (Knuth two-sum, 6 flops, no branch)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return DD(s, err)


def fast_two_sum(a: jax.Array, b: jax.Array) -> DD:
    """Error-free a + b assuming |a| >= |b| (Dekker, 3 flops)."""
    s = a + b
    err = b - (s - a)
    return DD(s, err)


def _split(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    c = _split_constant(a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a: jax.Array, b: jax.Array) -> DD:
    """Error-free a * b via Dekker splitting (no FMA needed)."""
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return DD(p, err)


def dd_add(x: DD, y: DD) -> DD:
    """Double-word + double-word (accurate variant, ~20 flops)."""
    s = two_sum(x.hi, y.hi)
    t = two_sum(x.lo, y.lo)
    c = s.lo + t.hi
    v = fast_two_sum(s.hi, c)
    w = t.lo + v.lo
    return fast_two_sum(v.hi, w)


def dd_add_w(x: DD, y: jax.Array) -> DD:
    """Double-word + working-precision scalar/array."""
    s = two_sum(x.hi, y)
    v = s.lo + x.lo
    return fast_two_sum(s.hi, v)


def dd_neg(x: DD) -> DD:
    return DD(-x.hi, -x.lo)


def dd_sub(x: DD, y: DD) -> DD:
    return dd_add(x, dd_neg(y))


def dd_mul(x: DD, y: DD) -> DD:
    """Double-word * double-word (~eps^2 relative error)."""
    p = two_prod(x.hi, y.hi)
    lo = p.lo + (x.hi * y.lo + x.lo * y.hi)
    return fast_two_sum(p.hi, lo)


def dd_scale(x: DD, s: jax.Array) -> DD:
    """Double-word * working-precision scalar/array."""
    p = two_prod(x.hi, s)
    lo = p.lo + x.lo * s
    return fast_two_sum(p.hi, lo)


def dd_from(hi: jax.Array) -> DD:
    return DD(hi, jnp.zeros_like(hi))


def dd_div(x: DD, y: DD) -> DD:
    """Double-word / double-word via one Newton correction (~eps^2)."""
    q1 = x.hi / y.hi
    r = dd_add_w(dd_neg(dd_scale(y, q1)), x.hi)  # x.hi - q1*y, exactly
    r = dd_add_w(r, x.lo)
    q2 = r.to_working() / y.hi
    return fast_two_sum(q1, q2)


def dd_matvec_dd(A: jax.Array, x: DD) -> DD:
    """Compensated A @ (x.hi + x.lo): exact-product dd matvec on the hi
    part plus a working-precision matvec on the (already eps-small) lo
    part — overall ~eps^2 accurate."""
    main = dd_matvec(A, x.hi)
    return dd_add_w(main, A @ x.lo)


def dd_where(c: jax.Array, x: DD, y: DD) -> DD:
    """Elementwise select between double-words."""
    return DD(jnp.where(c, x.hi, y.hi), jnp.where(c, x.lo, y.lo))


def dd_less(x: DD, y: DD) -> jax.Array:
    """Lexicographic x < y (valid for normalized |lo| <= ulp(hi)/2)."""
    return (x.hi < y.hi) | ((x.hi == y.hi) & (x.lo < y.lo))


def dd_clip(x: DD, l: jax.Array, u: jax.Array) -> DD:
    """clip(x, l, u) with working-precision bounds: exact DD(l, 0)/DD(u, 0)
    at the clamps, lexicographic compares so a value an eps below the bound
    (hi == l, lo < 0) still clamps.  The double-word box projection used by
    the dd APPROX inner loop (solvers.approx._approx_dd)."""
    zl = jnp.zeros_like(l)
    below = dd_less(x, DD(l, zl))
    above = dd_less(DD(u, zl), x)
    return dd_where(below, DD(l, zl), dd_where(above, DD(u, zl), x))


def dd_min(x: DD, axis: int = -1) -> DD:
    """Minimum of a double-word array along ``axis`` (pairwise tree with
    lexicographic compares; +inf-padded to a power of two)."""
    hi = jnp.moveaxis(x.hi, axis, -1)
    lo = jnp.moveaxis(x.lo, axis, -1)
    n = hi.shape[-1]
    p = 1 << max(0, (n - 1)).bit_length()
    if p > n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, p - n)]
        hi = jnp.pad(hi, pad, constant_values=jnp.inf)
        lo = jnp.pad(lo, pad, constant_values=0.0)
    cur = DD(hi, lo)
    while cur.hi.shape[-1] > 1:
        a = DD(cur.hi[..., 0::2], cur.lo[..., 0::2])
        b = DD(cur.hi[..., 1::2], cur.lo[..., 1::2])
        cur = dd_where(dd_less(a, b), a, b)
    return DD(cur.hi[..., 0], cur.lo[..., 0])


def dd_sum(x: DD, axis: int = -1) -> DD:
    """Compensated reduction of a double-word array along ``axis``.

    Binary-tree reduction with dd_add at each level: O(log n) sequential
    depth, fully vectorized across the other axes.  Accuracy ~ eps^2 — the
    axis-sum analogue of Ogita-Rump-Oishi "dot2".

    The axis is zero-padded to a power of two up front (dd zeros are
    exact), so every level is a plain reshape+slice — no per-level
    concatenates (measured hot in the pdas_dd loop).
    """
    hi = jnp.moveaxis(x.hi, axis, -1)
    lo = jnp.moveaxis(x.lo, axis, -1)

    def pow2_tree(hi, lo):  # length is a power of two
        n = hi.shape[-1]
        while n > 1:
            hi, lo = dd_add(
                DD(hi[..., 0::2], lo[..., 0::2]),
                DD(hi[..., 1::2], lo[..., 1::2]),
            )
            n //= 2
        return DD(hi[..., 0], lo[..., 0])

    # Decompose the axis into contiguous power-of-two blocks (binary digits
    # of n): each block tree-reduces with pure strided slicing, and the
    # <= log2(n) partials combine with dd_add — no concats, no overpadding.
    n = hi.shape[-1]
    total = None
    off = 0
    while n > 0:
        p = 1 << (n.bit_length() - 1)
        part = pow2_tree(hi[..., off : off + p], lo[..., off : off + p])
        total = part if total is None else dd_add(total, part)
        off += p
        n -= p
    return total


def dd_dot(a: jax.Array, b: jax.Array) -> DD:
    """Compensated dot product (Ogita-Rump dot2): exact products, dd sum."""
    p = two_prod(a, b)
    return dd_sum(p, axis=-1)


def _dd_matvec_xla(A: jax.Array, x: jax.Array) -> DD:
    """XLA form of the compensated matvec: error-free elementwise products
    + tree dd-sum (2*m*n transient floats through HBM)."""
    p = two_prod(A, x[None, :])
    return dd_sum(p, axis=-1)


def dd_matvec(A: jax.Array, x: jax.Array) -> DD:
    """Compensated A @ x: error-free products, eps^2-class total.

    On TPU with f32 tileable operands this dispatches to the Pallas
    streaming kernel (ops.dd_pallas: one pass over A with VMEM-resident
    dd accumulators — measured 1.4-5.9x over the XLA form); elsewhere the
    XLA tree-reduction form runs.  This is the fp64-emulation replacement
    for computing the IPM residual in double precision on the host (the
    reference gets this for free from fp64 CHOLMOD).
    """
    from cholesky_is_magic_tpu.ops import dd_pallas

    tiles = dd_pallas._tiles(A, x)
    if tiles is None:
        return _dd_matvec_xla(A, x)
    hi, lo = dd_pallas._dd_mv_partials(A, x, bm=tiles[0], bn=tiles[1])
    return dd_sum(DD(hi, lo), axis=-1)


def dd_rmatvec(A: jax.Array, x: jax.Array) -> DD:
    """Compensated Aᵀ @ x, reading A in natural layout: the Pallas kernel
    reduces over the sublane axis (no transpose copy) when supported."""
    from cholesky_is_magic_tpu.ops import dd_pallas

    tiles = dd_pallas._tiles(A, x)
    if tiles is None:
        return _dd_matvec_xla(A.T, x)
    hi, lo = dd_pallas._dd_rmv_partials(A, x, bm=tiles[0], bn=tiles[1])
    return dd_sum(DD(hi, lo), axis=0)


def dd_rmatvec_dd(A: jax.Array, x: DD) -> DD:
    """Compensated Aᵀ @ (x.hi + x.lo): dd rmatvec on the hi part plus a
    working-precision product on the (already eps-small) lo part."""
    main = dd_rmatvec(A, x.hi)
    return dd_add_w(main, A.T @ x.lo)


def dd_residual(b: jax.Array, A: jax.Array, x: jax.Array) -> jax.Array:
    """b - A @ x with the matvec in double-word precision, rounded back to
    working precision (the standard iterative-refinement residual)."""
    ax = dd_matvec(A, x)
    r = dd_add_w(dd_neg(ax), b)
    return r.to_working()
