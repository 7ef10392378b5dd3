"""Blocked Cholesky for TPU: static-recursive algorithm + Pallas VMEM kernel.

The reference's heavy primitive is CHOLMOD's supernodal LLᵀ, which bottoms
out in dense BLAS3 per supernode (SURVEY.md §0).  The TPU-native analogue
here is a *statically recursive* right-looking factorization

    A = [[A11, .], [A21, A22]],  L11 = chol(A11),
    L21 = A21 · L11⁻ᵀ  (triangular solve, itself static-recursive),
    L22 = chol(A22 − L21·L21ᵀ),

with every split at a static midpoint: no dynamic slicing (this JAX's
Mosaic lowering rejects `dynamic_slice` inside TC kernels), no
data-dependent control flow, and all the flops in dot_general calls that
tile straight onto the MXU.  The recursion unrolls at trace time down to
1x1 leaves, giving XLA one straight-line graph.

Two entry points:

- :func:`blocked_cholesky` — the pure-jnp algorithm (runs anywhere; also
  the building block for the sparse supernodal factorization).
- :func:`cholesky` — wraps it in a Pallas kernel so the whole matrix stays
  resident in VMEM across the recursion on TPU (one HBM read + one write,
  instead of XLA's possible per-op round trips); falls back to the plain
  jnp version off-TPU or above the VMEM size limit.

Both produce the lower factor with NaNs on non-PD input, so
ops.dense.factorize's failure detection (the cholmod_factorize status
analogue) works unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Single-buffer f32 VMEM limit (with headroom for temporaries).
MAX_VMEM_DIM = 1536
# Below this size, factor with the sequential masked update instead of
# recursing further (keeps the unrolled graph small).
LEAF = 32


def _chol_leaf(A: jax.Array) -> jax.Array:
    """Unblocked lower Cholesky of a small static block by LEAF unrolled
    rank-1 updates with masking (runs on the VPU).  No scatters (Mosaic
    has no scatter lowering): columns are collected and stacked."""
    b = A.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b,), 0)
    cols = []
    for j in range(b):
        d = jax.lax.rsqrt(A[j, j])
        col = A[:, j] * d  # includes the diagonal sqrt at row j
        col = jnp.where(rows >= j, col, 0.0)
        cols.append(col)
        # Trailing update A -= col colᵀ on the strictly-lower-right part.
        A = jnp.where((r > j) & (c > j), A - col[:, None] * col[None, :], A)
    return jnp.stack(cols, axis=1)


def _rsolve_lower_T(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve X · Lᵀ = B for X (L lower-triangular), statically recursive.

    This is the TRSM of the blocked factorization; all splits are static
    halves so it lowers inside Pallas kernels.
    """
    b = L.shape[0]
    if b <= LEAF:
        # Sequential forward substitution over columns, unrolled.
        cols = []
        for j in range(b):
            acc = B[:, j]
            for k in range(j):
                acc = acc - cols[k] * L[j, k]
            cols.append(acc / L[j, j])
        return jnp.stack(cols, axis=1)
    h = b // 2
    L11, L21, L22 = L[:h, :h], L[h:, :h], L[h:, h:]
    X1 = _rsolve_lower_T(L11, B[:, :h])
    rhs = B[:, h:] - jnp.dot(X1, L21.T, preferred_element_type=B.dtype,
                             precision=jax.lax.Precision.HIGHEST)
    X2 = _rsolve_lower_T(L22, rhs)
    return jnp.concatenate([X1, X2], axis=1)


def blocked_cholesky(A: jax.Array) -> jax.Array:
    """Lower Cholesky factor by static half-splitting (pure jnp)."""
    b = A.shape[0]
    if b <= LEAF:
        return _chol_leaf(A)
    h = b // 2
    L11 = blocked_cholesky(A[:h, :h])
    L21 = _rsolve_lower_T(L11, A[h:, :h])
    S = A[h:, h:] - jnp.dot(L21, L21.T, preferred_element_type=A.dtype,
                        precision=jax.lax.Precision.HIGHEST)
    L22 = blocked_cholesky(S)
    top = jnp.concatenate([L11, jnp.zeros((h, b - h), A.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


BLOCK = 128


def _chol_fori(A: jax.Array) -> jax.Array:
    """Unblocked lower Cholesky of a (b, b) value via lax.fori_loop with
    masked full-matrix updates.

    Mosaic's stack allocator does not reuse buffers across straight-line
    (unrolled) code, so the recursive formulation blows VMEM; a fori_loop
    body's temporaries are reused across iterations.  No dynamic slicing:
    the current column is extracted with a one-hot matvec, the diagonal
    entry with a masked reduction.
    """
    b = A.shape[0]
    W = 8  # narrow one-hot width: extraction matmuls cost b*b*8, not b^3
    r = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    rw = jax.lax.broadcasted_iota(jnp.int32, (b, W), 0)
    cw = jax.lax.broadcasted_iota(jnp.int32, (b, W), 1)
    ones_wb = jnp.ones((b, W), A.dtype)
    dot = lambda x, y: jnp.dot(x, y, preferred_element_type=A.dtype,
                               precision=jax.lax.Precision.HIGHEST)

    def body(j, carry):
        M, L = carry
        # E: (b, W) one-hot at [j, 0] — e_j placed in lane-column 0.
        E = ((rw == j) & (cw == 0)).astype(A.dtype)
        colM = dot(M, E)  # (b, W): column j of M in lane-column 0
        # Broadcast M[j,j] to every row of lane-column 0 (Mosaic has no
        # usable 1-D reductions; (8,8)-sandwich matmuls are ~free).
        d88 = dot(E.T, colM)  # (W, W): M[j,j] at (0,0), zeros elsewhere
        dfull = dot(ones_wb, d88)  # (b, W): M[j,j] in lane-column 0
        dfull = jnp.where(cw == 0, dfull, 1.0)
        colM = colM * jax.lax.rsqrt(dfull)
        colM = jnp.where(rw >= j, colM, 0.0)
        L = L + dot(colM, E.T)  # place the column into column j of L
        # colM = c e_0ᵀ, so colM colMᵀ = c cᵀ: rank-1 trailing update.
        M = jnp.where((r > j) & (c > j), M - dot(colM, colM.T), M)
        return M, L

    _, L = jax.lax.fori_loop(0, b, body, (A, jnp.zeros_like(A)))
    return L


def _tri_inv_fori(L: jax.Array) -> jax.Array:
    """Inverse of a lower-triangular (b, b) value by row-wise forward
    substitution under lax.fori_loop (masked, no dynamic slicing).

    The panel TRSM then becomes one MXU matmul P = A_panel · (L⁻¹)ᵀ —
    the standard trick for accelerator-blocked factorizations.
    """
    b = L.shape[0]
    W = 8
    rw = jax.lax.broadcasted_iota(jnp.int32, (b, W), 0)
    cw = jax.lax.broadcasted_iota(jnp.int32, (b, W), 1)
    rwb = jax.lax.broadcasted_iota(jnp.int32, (W, b), 0)
    cwb = jax.lax.broadcasted_iota(jnp.int32, (W, b), 1)
    ones_wb = jnp.ones((W, b), L.dtype)
    dot = lambda x, y: jnp.dot(x, y, preferred_element_type=L.dtype,
                               precision=jax.lax.Precision.HIGHEST)

    def body(i, X):
        E = ((rw == i) & (cw == 0)).astype(L.dtype)  # (b, W), e_i in col 0
        rowL = dot(E.T, L)  # (W, b): row i of L in sublane-row 0
        l88 = dot(rowL, E)  # (W, W): L[i,i] at (0,0)
        lfull = dot(l88, ones_wb)  # (W, b): L[i,i] across sublane-row 0
        lfull = jnp.where(rwb == 0, lfull, 1.0)
        left = jnp.where(cwb < i, rowL, 0.0)  # L[i, :i] in sublane-row 0
        acc = dot(left, X)  # (W, b): L[i,:i] @ X in sublane-row 0
        xrow = jnp.where(rwb == 0, (E.T - acc) / lfull, 0.0)
        return X + dot(E, xrow)  # scatter sublane-row 0 into row i

    return jax.lax.fori_loop(0, b, body, jnp.zeros_like(L))


def _potrf_kernel(a_ref, out_ref, *, n: int, block: int):
    """Iterative right-looking factorization over static panel offsets.

    The python loop over panels keeps VMEM pressure bounded: each step's
    temporaries (one panel + one Schur chunk) die before the next step, and
    the matrix itself lives in the single aliased in/out VMEM buffer.  All
    slices are static, so everything lowers on Mosaic (no dynamic_slice /
    scatter).  The trailing Schur update — where ~all the flops are — is
    chunked into (tail x block) MXU matmuls.
    """
    del a_ref  # aliased with out_ref; the copy is implicit
    for off in range(0, n, block):
        b = min(block, n - off)
        Lkk = _chol_fori(out_ref[off : off + b, off : off + b])
        out_ref[off : off + b, off : off + b] = Lkk
        tail = n - off - b
        if tail > 0:
            Minv = _tri_inv_fori(Lkk)
            P = jnp.dot(
                out_ref[off + b :, off : off + b],
                Minv.T,
                preferred_element_type=Lkk.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[off + b :, off : off + b] = P
            # Chunked Schur update S -= P Pjᵀ, one block-column at a time.
            for cj in range(off + b, n, block):
                cb = min(block, n - cj)
                Pj = out_ref[cj : cj + cb, off : off + b]
                out_ref[off + b :, cj : cj + cb] = out_ref[
                    off + b :, cj : cj + cb
                ] - jnp.dot(P, Pj.T, preferred_element_type=P.dtype,
                            precision=jax.lax.Precision.HIGHEST)
        # Zero this panel's inter-block upper triangle (never written
        # otherwise; holds input values).
        if tail > 0:
            out_ref[off : off + b, off + b :] = jnp.zeros(
                (b, tail), dtype=Lkk.dtype
            )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _potrf(a: jax.Array, interpret: bool = False) -> jax.Array:
    n = a.shape[0]
    kernel = functools.partial(_potrf_kernel, n=n, block=BLOCK)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={0: 0},
        cost_estimate=pl.CostEstimate(
            flops=n * n * n // 3, bytes_accessed=8 * n * n, transcendentals=n
        ),
        interpret=interpret,
    )(a)


def cholesky(N: jax.Array) -> jax.Array:
    """Drop-in for jnp.linalg.cholesky (lower factor) via the Pallas kernel.

    Off-TPU runs the pure-jnp algorithm directly (same numerics, no
    interpret-mode overhead).  Above the VMEM limit, falls back to
    jnp.linalg.cholesky until the HBM-tiled variant lands.

    Measured on TPU v5e (scalar-fetch timing, 2026-08): XLA's native
    cholesky runs 0.05/0.18/0.19 ms at n=256/1024/1536 vs 0.35/1.7/2.5 ms
    for this kernel — the sequential panel fori_loops dominate.  The dense
    solver path therefore defaults to XLA (ops.dense.factorize
    use_pallas=False); this kernel is kept as the building block for the
    block-sparse supernodal factorization, where XLA has no primitive and
    VMEM residency across supernode updates pays off.
    """
    n = N.shape[0]
    if n > MAX_VMEM_DIM:
        return jnp.linalg.cholesky(N)
    if jax.default_backend() != "tpu":
        return blocked_cholesky(N)
    return _potrf(N)
