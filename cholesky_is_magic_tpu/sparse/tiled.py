"""Panel-wave tiled sparse Cholesky: compile-size- and dispatch-free scaling.

The `cholmod_factorize` replacement at scale (SURVEY.md §7 "Hard parts":
all structure static, supernode tiles padded, Schur updates as a static
schedule).  Two failed designs inform this one:

1. inlining one XLA op per tile op (sparse/factor.py) — compile explodes
   beyond ~2k rows (hundreds of whole-matrix scatters);
2. a lax.scan with one tile op per step — compiles small but performs one
   sequential dispatch per tile operation (~457 ms/iter at m=4096: the
   device idles between thousands of tiny steps).

The fix is *panel waves*: the device loop runs once per 128-column panel,
and each step executes the whole panel's work as batched einsums over
gathered tiles:

    chol + tri-inv of the diagonal tile          (one (b,b) op)
    ALL the panel's TRSMs:  (R, b, b) x (b, b)   (one batched matmul)
    ALL the panel's SYRKs:  (P, b, b) x (P, b, b)(one batched matmul
                                                  + one scatter-add)

Storage is a compact (NT+1, b, b) tile array (row NT is a dummy target
for schedule padding), so memory follows nnz(L) tiles, not m².  Host-side
analysis pads each panel's row/pair lists to the maxima, which is where
the static-shape cost lives — fine when panel degrees are comparable
(banded/staircase structure), wasteful for wildly skewed ones.

Both triangular solves run the same way (one gather + one batched matvec
per panel), using the stored tri-inverses so everything is a matmul.

The block mask is transitively closed ((i,k),(j,k) resident forces (i,j)
resident): with compact storage every update needs a resident target.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cholesky_is_magic_tpu.sparse.symbolic import FactorPlan


def _tri_inv(L: jax.Array) -> jax.Array:
    """Inverse of a small lower-triangular tile by static half-splitting:
    inv([[A,0],[C,B]]) = [[A⁻¹,0],[-B⁻¹ C A⁻¹, B⁻¹]].  All matmuls."""
    b = L.shape[0]
    if b <= 32:
        # Row recurrence from L·inv = I:
        #   inv[i, :] = (e_i - sum_{k<i} L[i,k] inv[k, :]) / L[i, i].
        rows = []
        eye = np.eye(b)
        for i in range(b):
            acc = jnp.asarray(eye[i], dtype=L.dtype)
            for k_ in range(i):
                acc = acc - L[i, k_] * rows[k_]
            rows.append(acc / L[i, i])
        return jnp.stack(rows, axis=0)
    h = b // 2
    Ai = _tri_inv(L[:h, :h])
    Bi = _tri_inv(L[h:, h:])
    C = L[h:, :h]
    dot = lambda x, y: jnp.dot(x, y, preferred_element_type=L.dtype,
                               precision=jax.lax.Precision.HIGHEST)
    lower_left = -dot(Bi, dot(C, Ai))
    top = jnp.concatenate([Ai, jnp.zeros((h, b - h), L.dtype)], axis=1)
    bot = jnp.concatenate([lower_left, Bi], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _pad2(lists, fill):
    width = max((len(x) for x in lists), default=0)
    width = max(width, 1)
    out = np.full((len(lists), width), fill, dtype=np.int64)
    for r, x in enumerate(lists):
        out[r, : len(x)] = x
    return out


def engine_for(A, block: int = 128, snode_align: bool = True) -> "TiledCholesky":
    """Build a TiledCholesky for a (possibly padded) device/host matrix —
    the analyze-once entry point solvers hand to pdas(..., engine=...).

    Zero (padded) rows contribute only their boosted diagonal; the
    symbolic analysis sees them as isolated vertices.
    """
    import scipy.sparse as sp

    A_host = sp.csc_matrix(np.asarray(A, np.float64))
    from cholesky_is_magic_tpu.sparse.symbolic import analyze

    return TiledCholesky(analyze(A_host, block=block), snode_align=snode_align)


class TiledCholesky:
    """Analyze-once tile engine for one sparsity pattern (the
    cholmod_analyze / cholmod_factorize split, affine-scaling.lisp:271)."""

    def __init__(self, plan: FactorPlan, snode_align: bool = True):
        self.plan = plan
        b = plan.block
        aligned = snode_align and plan.slots is not None
        self.snode_align = aligned
        if aligned:
            # Supernode-aligned layout (pack_supernodes): panels hold whole
            # supernodes; gap slots are inert padding rows (zero rows with
            # boosted unit diagonal, exactly like end-padding).
            B = plan.slot_mask.shape[0]
            mask = plan.slot_mask | np.eye(B, dtype=bool)
        else:
            B = plan.block_mask.shape[0]
            mask = plan.block_mask | np.eye(B, dtype=bool)
        mask &= np.tril(np.ones((B, B), dtype=bool))

        # The resident set is the etree-exact elementwise block mask — NO
        # tile-level transitive closure.  A SYRK pair ((i,k),(j,k)) whose
        # destination (i,j) is not in the mask contributes exact zeros: a
        # nonzero elementwise product needs a common column c with both
        # L[i,c] != 0 and L[j,c] != 0, which by the fill-path theorem forces
        # elementwise fill at (i,j) — i.e. tile (i,j) resident.  Structural
        # zeros inside resident tiles stay exact zeros through dense chol /
        # tri-inv / TRSM (products and sums of exact zeros), so dropping
        # those pairs is lossless.  This replaces round 1's O(B^3) Python
        # closure fixpoint, whose extra resident tiles were unbounded fill
        # beyond nnz_L.
        self.mask = mask

        tiles = [(int(i), int(j)) for i in range(B) for j in range(B) if mask[i, j]]
        tid = {t: k for k, t in enumerate(tiles)}
        self.tiles = tiles
        self.NT = len(tiles)
        self.B = B
        self.b = b
        DUMMY = self.NT  # padded gathers/scatters hit this extra tile row

        diag_ids, rows_ids, rows_i = [], [], []
        syrk_a, syrk_b, syrk_dst = [], [], []
        fwd_ids, fwd_j = [], []
        self.dropped_updates = 0  # provably-zero SYRK pairs skipped
        for k in range(B):
            diag_ids.append(tid[(k, k)])
            rows = [i for i in range(k + 1, B) if mask[i, k]]
            rows_ids.append([tid[(i, k)] for i in rows])
            rows_i.append(rows)
            pa, pb, pd = [], [], []
            for ii, i in enumerate(rows):
                for j in rows[: ii + 1]:
                    dst = (max(i, j), min(i, j))
                    if not mask[dst]:
                        self.dropped_updates += 1
                        continue
                    pa.append(tid[(i, k)])
                    pb.append(tid[(j, k)])
                    pd.append(tid[dst])
            syrk_a.append(pa); syrk_b.append(pb); syrk_dst.append(pd)
            fwd = [(tid[(k, j)], j) for j in range(k) if mask[k, j]]
            fwd_ids.append([t for t, _ in fwd])
            fwd_j.append([j for _, j in fwd])

        self.diag_ids = jnp.asarray(diag_ids, jnp.int32)
        self.rows_ids = jnp.asarray(_pad2(rows_ids, DUMMY), jnp.int32)
        self.rows_i = jnp.asarray(_pad2(rows_i, B), jnp.int32)  # B = dummy y-row
        self.syrk_a = jnp.asarray(_pad2(syrk_a, DUMMY), jnp.int32)
        self.syrk_b = jnp.asarray(_pad2(syrk_b, DUMMY), jnp.int32)
        self.syrk_dst = jnp.asarray(_pad2(syrk_dst, DUMMY), jnp.int32)
        self.fwd_ids = jnp.asarray(_pad2(fwd_ids, DUMMY), jnp.int32)
        self.fwd_j = jnp.asarray(_pad2(fwd_j, B), jnp.int32)

        self.tile_i = jnp.asarray([t[0] for t in tiles] + [0], jnp.int32)
        self.tile_j = jnp.asarray([t[1] for t in tiles] + [0], jnp.int32)

        n_pad = B * b
        if aligned:
            # Slot s holds permuted column j when slots[j] == s; gap slots
            # map to the (zero, boosted) padding rows plan.n .. n_pad-1.
            pperm = np.empty(n_pad, dtype=np.int64)
            used = np.zeros(n_pad, dtype=bool)
            pperm[plan.slots] = plan.perm
            used[plan.slots] = True
            pperm[~used] = np.arange(plan.n, n_pad)
        else:
            pperm = np.arange(n_pad)
            pperm[: plan.n] = plan.perm
        self.pperm = jnp.asarray(pperm)

    # ---- device stages --------------------------------------------------

    def assemble(self, A, d, row_boost=None):
        """Resident tiles of P(A·D)(A·D)ᵀPᵀ as an (NT+1, b, b) array: one
        scan, one (b, n) x (n, b) MXU matmul per tile."""
        b = self.b
        n_pad = self.B * b
        m = A.shape[0]
        if m < n_pad:
            A = jnp.pad(A, ((0, n_pad - m), (0, 0)))
            if row_boost is None:
                row_boost = jnp.zeros(m, A.dtype)
            row_boost = jnp.pad(row_boost, (0, n_pad - m), constant_values=1.0)
        Ap = (A[self.pperm, :] * d[None, :]).reshape(self.B, b, -1)
        boost_p = (
            row_boost[self.pperm].reshape(self.B, b)
            if row_boost is not None
            else None
        )
        eye = jnp.eye(b, dtype=A.dtype)

        # One tile per scan step via dynamic_slice (measured faster than
        # chunked batch-gathers, which copy (C, b, n) blocks through HBM).
        def step(_, idx):
            i, j = self.tile_i[idx], self.tile_j[idx]
            Ti = jax.lax.dynamic_index_in_dim(Ap, i, axis=0, keepdims=False)
            Tj = jax.lax.dynamic_index_in_dim(Ap, j, axis=0, keepdims=False)
            T = jnp.matmul(Ti, Tj.T, preferred_element_type=A.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            if boost_p is not None:
                bi = jax.lax.dynamic_index_in_dim(boost_p, i, axis=0, keepdims=False)
                T = jnp.where(i == j, T + eye * bi[:, None], T)
            return None, T

        _, tiles = jax.lax.scan(step, None, jnp.arange(self.NT))
        return jnp.concatenate([tiles, jnp.zeros((1, b, b), A.dtype)], axis=0)

    def factorize(self, tiles):
        """One fori_loop over panels; per panel one chol + tri-inv, one
        batched TRSM, one batched SYRK + scatter-add.
        Returns (L_tiles, invdiag, ok)."""
        b = self.b
        dtype = tiles.dtype
        ein = lambda s, *ops: jnp.einsum(
            s, *ops, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype,
        )

        eye = jnp.eye(b, dtype=dtype)

        def panel(k, carry):
            tiles, invd = carry
            did = self.diag_ids[k]
            Td = jax.lax.dynamic_index_in_dim(tiles, did, 0, keepdims=False)
            # Plain XLA here (not Pallas): the native primitives are single
            # fused ops — the unrolled kernels cost thousands of dispatches.
            L = jnp.linalg.cholesky(Td)
            inv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            tiles = jax.lax.dynamic_update_index_in_dim(tiles, L, did, 0)
            invd = jax.lax.dynamic_update_index_in_dim(invd, inv, k, 0)

            rid = jax.lax.dynamic_index_in_dim(self.rows_ids, k, 0, keepdims=False)
            R = tiles[rid]  # (Rmax, b, b); dummy rows gather zeros
            P = ein("rij,kj->rik", R, inv)  # R @ invᵀ
            tiles = tiles.at[rid].set(P)  # dummy index writes land in row NT

            sa = jax.lax.dynamic_index_in_dim(self.syrk_a, k, 0, keepdims=False)
            sb = jax.lax.dynamic_index_in_dim(self.syrk_b, k, 0, keepdims=False)
            sd = jax.lax.dynamic_index_in_dim(self.syrk_dst, k, 0, keepdims=False)
            Ta = tiles[sa]
            Tb = tiles[sb]
            U = ein("pij,pkj->pik", Ta, Tb)
            tiles = tiles.at[sd].add(-U)
            # Keep the dummy row clean for later gathers.
            tiles = tiles.at[self.NT].set(0.0)
            return tiles, invd

        invd0 = jnp.zeros((self.B, b, b), dtype)
        tiles, invd = jax.lax.fori_loop(0, self.B, panel, (tiles, invd0))
        diags = jnp.diagonal(tiles[self.diag_ids], axis1=1, axis2=2)
        ok = jnp.all(jnp.isfinite(tiles)) & jnp.all(diags > 0)
        return tiles, invd, ok

    def solve(self, tiles, invd, rhs):
        """Blocked forward+backward substitution, one gather + one batched
        matvec per panel, using the stored tri-inverses."""
        b = self.b
        B = self.B
        dtype = tiles.dtype
        r = rhs.reshape(B, b)
        ein = lambda s, *ops: jnp.einsum(
            s, *ops, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype,
        )

        def fwd(k, y):
            fid = jax.lax.dynamic_index_in_dim(self.fwd_ids, k, 0, keepdims=False)
            fj = jax.lax.dynamic_index_in_dim(self.fwd_j, k, 0, keepdims=False)
            Ls = tiles[fid]  # dummy -> zeros
            ys = y[fj]  # fj dummy = B -> dummy row of y (extra zero row)
            acc = jax.lax.dynamic_index_in_dim(r, k, 0, keepdims=False) - ein(
                "fij,fj->i", Ls, ys
            )
            inv_k = jax.lax.dynamic_index_in_dim(invd, k, 0, keepdims=False)
            yk = ein("ij,j->i", inv_k, acc)
            return jax.lax.dynamic_update_index_in_dim(y, yk, k, 0)

        y = jax.lax.fori_loop(0, B, fwd, jnp.zeros((B + 1, b), dtype))

        def bwd(kk, z):
            k = B - 1 - kk
            rid = jax.lax.dynamic_index_in_dim(self.rows_ids, k, 0, keepdims=False)
            ri = jax.lax.dynamic_index_in_dim(self.rows_i, k, 0, keepdims=False)
            Ls = tiles[rid]  # (Rmax, b, b) = L[i, k] tiles
            zs = z[ri]
            acc = jax.lax.dynamic_index_in_dim(y, k, 0, keepdims=False) - ein(
                "rij,ri->j", Ls, zs
            )
            inv_k = jax.lax.dynamic_index_in_dim(invd, k, 0, keepdims=False)
            zk = ein("ji,j->i", inv_k, acc)
            return jax.lax.dynamic_update_index_in_dim(z, zk, k, 0)

        z = jax.lax.fori_loop(0, B, bwd, jnp.zeros((B + 1, b), dtype))
        return z[:B].reshape(B * b)

    def solve_normal(self, A, d, g, row_boost=None, refine_steps=0):
        """Drop-in for ops.dense.solve_normal via the tile engine.

        ``refine_steps`` adds double-word iterative refinement against the
        UNASSEMBLED operator (ops.dense.operator_residual): the f32 tile
        factorization then reaches the same accuracy as the dense dd path —
        the reference's sparse path is fp64 CHOLMOD and gets this for free
        (sparse-cholesky.lisp:524-560)."""
        from cholesky_is_magic_tpu.ops.dense import operator_residual

        m = g.shape[0]
        n_pad = self.B * self.b
        tiles = self.assemble(A, d, row_boost)
        L, invd, ok = self.factorize(tiles)

        def raw_solve(r):
            rp = jnp.pad(r, (0, n_pad - m))[self.pperm]
            yp = self.solve(L, invd, rp)
            return jnp.zeros_like(yp).at[self.pperm].set(yp)[:m]

        y = raw_solve(g)
        if refine_steps:
            AD = A * d[None, :]
            for _ in range(refine_steps):
                r = operator_residual(AD, y, g, row_boost)
                y = y + raw_solve(r)
        return jnp.where(ok, y, jnp.zeros_like(y)), ok
