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

Tile residency is the etree-exact elementwise block mask; SYRK pairs whose
destination tile is structurally zero are dropped (their contribution is
exactly zero — see __init__), so no tile-level closure is needed.
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


def engine_for_sparse(
    A_host, block: int = 128, snode_align: bool = True, dtype=None
) -> "TiledCholesky":
    """Analyze-once engine with the O(nnz) ELL assembly schedule attached:
    the fully sparse at-scale entry point — no dense A operand anywhere
    (at m = 16k the dense (m, 2m) A alone is 2 GB; the ELL pipeline's
    operands follow nnz).  ``A_host`` is any scipy-sparse/array convertible
    to CSC.  Use with solve_normal_ell / ops.sparse_ops ELL products.
    """
    import scipy.sparse as sp

    import jax.numpy as _jnp

    A_csc = sp.csc_matrix(A_host)
    from cholesky_is_magic_tpu.sparse.symbolic import analyze

    eng = TiledCholesky(analyze(A_csc, block=block), snode_align=snode_align)
    eng.build_ell_assembly(A_csc, dtype=dtype or _jnp.float32)
    return eng


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

        # Per-panel DISTINCT destination tiles + each SYRK pair's index into
        # that list — the mesh-mode Schur-update schedule: chips compute
        # disjoint pair slices, segment-sum into a (Dmax+1, b, b) buffer,
        # and ONE psum('tp') of that buffer per panel carries the
        # Schur-complement updates over ICI (SURVEY.md §2 checklist:
        # "psum on Schur-complement updates").
        ddst, sdi = [], []
        for pd in syrk_dst:
            uniq = sorted(set(pd))
            pos = {t: i for i, t in enumerate(uniq)}
            ddst.append(uniq)
            sdi.append([pos[t] for t in pd])
        self.Dmax = max((len(u) for u in ddst), default=1) or 1
        self._syrk_raw = (syrk_a, syrk_b, sdi, ddst)
        self._shard_cache = {}

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

        # Range-mode assembly tables: per column panel j, the contiguous
        # row-tile window [lo_j, hi_j] covering its resident tiles, and the
        # destination tile id of each window row (DUMMY when non-resident).
        asm_lo, asm_dst, widths = [], [], []
        for j in range(B):
            rows = [i for i in range(j, B) if mask[i, j] or i == j]
            lo, hi = min(rows), max(rows)
            asm_lo.append(lo)
            widths.append(hi - lo + 1)
            rowset = set(rows)
            asm_dst.append(
                [tid[(lo + r, j)] if (lo + r) in rowset else DUMMY
                 for r in range(hi - lo + 1)]
            )
        self.Rmax_asm = max(widths)
        self.asm_lo = jnp.asarray(asm_lo, jnp.int32)
        self.asm_dst = jnp.asarray(_pad2(asm_dst, DUMMY), jnp.int32)
        # Relative matmul cost of the two assembly modes (units of b*b*n):
        # range mode computes B full windows, scan mode exactly NT tiles.
        self.range_cost = B * self.Rmax_asm
        self.scan_cost = self.NT
        self.assemble_mode = "auto"  # per-engine override ("scan"/"range")

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
        # Host copy kept: build_ell_assembly needs it, and fetching the
        # device array back was measured at ~9 MINUTES through the axon
        # tunnel (a pathological device->host sync; docs/DEVNOTES.md) —
        # never round-trip host-derived data through the device.
        self._pperm_np = pperm
        self.pperm = jnp.asarray(pperm)

    # ---- device stages --------------------------------------------------

    def _prep_operands(self, A, d, row_boost):
        """Pad to the slot grid, permute, scale: (AD rows by slot, boost)."""
        b = self.b
        n_pad = self.B * b
        m = A.shape[0]
        if m < n_pad:
            A = jnp.pad(A, ((0, n_pad - m), (0, 0)))
            if row_boost is None:
                row_boost = jnp.zeros(m, A.dtype)
            row_boost = jnp.pad(row_boost, (0, n_pad - m), constant_values=1.0)
        AD = A[self.pperm, :] * d[None, :]
        boost_p = row_boost[self.pperm] if row_boost is not None else None
        return AD, boost_p

    def assemble(self, A, d, row_boost=None, mode: str = "auto"):
        """Resident tiles of P(A·D)(A·D)ᵀPᵀ as an (NT+1, b, b) array.

        Two schedules (mode="auto" picks by static matmul-cost estimate):

        - "scan": one tile per lax.scan step, one (b, n) x (n, b) matmul
          each — exactly NT tile products, but NT sequential dispatches;
        - "range": one step per COLUMN PANEL — a single
          (Rmax·b, n) x (n, b) matmul covering the panel's contiguous
          row-tile window, scattered to the resident tiles.  B dispatches
          total; over-computes when windows are taller than their resident
          count, hence the cost gate.

        Measured on v5e (m=4096 banded, n=8192, K=32 chained iters):
        scan 3.88 ms/iter vs range 3.54 when flop-neutral
        (range_cost 105 vs scan 102); but range loses 3.3 -> 5.7 ms at
        1.5x padding and 5.1 -> 16.3 ms at 10x — assembly here is
        matmul-bound, not dispatch-bound, so range only pays when the
        window padding is nearly free.
        """
        if mode == "auto":
            mode = "range" if self.range_cost <= 1.2 * self.scan_cost else "scan"
        b = self.b
        AD, boost_p = self._prep_operands(A, d, row_boost)
        eye = jnp.eye(b, dtype=AD.dtype)

        if mode == "range":
            ADx = jnp.pad(AD, ((0, self.Rmax_asm * b), (0, 0)))

            def panel(j, tiles):
                lo = jax.lax.dynamic_index_in_dim(self.asm_lo, j, 0, keepdims=False)
                S = jax.lax.dynamic_slice_in_dim(
                    ADx, lo * b, self.Rmax_asm * b, axis=0
                )
                Tj = jax.lax.dynamic_slice_in_dim(AD, j * b, b, axis=0)
                G = jnp.matmul(S, Tj.T, preferred_element_type=AD.dtype,
                               precision=jax.lax.Precision.HIGHEST)
                dst = jax.lax.dynamic_index_in_dim(self.asm_dst, j, 0, keepdims=False)
                return tiles.at[dst].set(G.reshape(self.Rmax_asm, b, b))

            tiles = jax.lax.fori_loop(
                0, self.B, panel, jnp.zeros((self.NT + 1, b, b), AD.dtype)
            )
            tiles = tiles.at[self.NT].set(0.0)  # DUMMY writes land here
            if boost_p is not None:
                tiles = tiles.at[self.diag_ids].add(
                    eye[None] * boost_p.reshape(self.B, b)[:, :, None]
                )
            return tiles

        Ap = AD.reshape(self.B, b, -1)
        boost_t = boost_p.reshape(self.B, b) if boost_p is not None else None

        # One tile per scan step via dynamic_slice (faster than chunked
        # batch-gathers, which copy (C, b, n) blocks through HBM).
        def step(_, idx):
            i, j = self.tile_i[idx], self.tile_j[idx]
            Ti = jax.lax.dynamic_index_in_dim(Ap, i, axis=0, keepdims=False)
            Tj = jax.lax.dynamic_index_in_dim(Ap, j, axis=0, keepdims=False)
            T = jnp.matmul(Ti, Tj.T, preferred_element_type=AD.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            if boost_t is not None:
                bi = jax.lax.dynamic_index_in_dim(boost_t, i, axis=0, keepdims=False)
                T = jnp.where(i == j, T + eye * bi[:, None], T)
            return None, T

        _, tiles = jax.lax.scan(step, None, jnp.arange(self.NT))
        return jnp.concatenate([tiles, jnp.zeros((1, b, b), AD.dtype)], axis=0)

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

    # ---- ELL (fully sparse) path ----------------------------------------

    def build_ell_assembly(self, A_host, dtype=None):
        """Host-side pair schedule for O(nnz) assembly (assemble_pairs).

        N = (A·D)(A·D)ᵀ expands as N[p, q] = Σ_k A[p,k]·A[q,k]·d_k²: for
        every column k and every row pair (p, q) sharing it, emit
        (weight = A[p,k]·A[q,k], k, flat destination in the compact tile
        array), sorted by destination for a sorted segment-sum on device.
        Pair count is Σ_k nnz_k(nnz_k+1)/2 — O(nnz·avg column count), the
        same work CHOLMOD's cholmod_aat does once per pattern.  Every pair
        lands in a resident tile (the mask contains tril(N) by
        construction).  The enumeration runs in C++ when available
        (native/symbolic.cpp cim_pair_schedule) with this Python loop as
        the fallback."""
        import scipy.sparse as sp

        from cholesky_is_magic_tpu.sparse import native

        if dtype is None:
            dtype = jnp.float32
        A_csc = sp.csc_matrix(A_host)
        A_csc.sort_indices()
        b, B = self.b, self.B
        n_pad = B * b
        pperm = self._pperm_np
        slot_of = np.empty(n_pad, np.int64)
        slot_of[pperm] = np.arange(n_pad)
        tilemap = np.full((B, B), -1, np.int64)
        for t, (i, j) in enumerate(self.tiles):
            tilemap[i, j] = t
        sched = native.pair_schedule(A_csc, slot_of, b, tilemap)
        if sched is not None:
            ws, ks, dst = sched
            ks = ks.astype(np.int32)
        else:
            ws, ks, dst = [], [], []
            for k in range(A_csc.shape[1]):
                lo, hi = A_csc.indptr[k], A_csc.indptr[k + 1]
                rows = A_csc.indices[lo:hi]
                vals = A_csc.data[lo:hi]
                slots = slot_of[rows]
                for a in range(len(rows)):
                    for c in range(a + 1):
                        sa, sc = int(slots[a]), int(slots[c])
                        shi, slo_ = (sa, sc) if sa >= sc else (sc, sa)
                        t = tilemap[shi // b, slo_ // b]
                        assert t >= 0, "N entry outside the resident tile set"
                        w = vals[a] * vals[c]
                        ws.append(w)
                        ks.append(k)
                        dst.append(t * b * b + (shi % b) * b + (slo_ % b))
                        if shi != slo_ and shi // b == slo_ // b:
                            # jnp.linalg.cholesky reads the FULL tile:
                            # mirror off-diagonals inside diagonal tiles.
                            ws.append(w)
                            ks.append(k)
                            dst.append(t * b * b + (slo_ % b) * b + (shi % b))
            ws = np.asarray(ws, np.float64)
            ks = np.asarray(ks, np.int32)
            dst = np.asarray(dst, np.int64)
        order = np.argsort(dst, kind="stable")
        self.asm_w = jnp.asarray(ws[order], dtype)
        self.asm_k = jnp.asarray(ks[order])
        self.asm_dst_flat = jnp.asarray(dst[order], jnp.int32)
        self.n_pairs = len(ws)
        # Host copies for the mesh-mode slab repadding (_shard_schedule).
        self._asm_np = (
            np.asarray(ws)[order].astype(np.float64),
            np.asarray(ks)[order].astype(np.int32),
            np.asarray(dst)[order].astype(np.int64),
        )

    def assemble_pairs(self, d, row_boost=None):
        """Resident tiles of P(A·D)(A·D)ᵀPᵀ from the pair schedule: one
        gather of d², one multiply, one SORTED segment-sum — O(nnz·colcount)
        total, no matmuls, no dense A."""
        b = self.b
        n_pad = self.B * b
        dt = self.asm_w.dtype
        d2 = (d * d).astype(dt)
        vals = self.asm_w * d2[self.asm_k]
        flat = jax.ops.segment_sum(
            vals,
            self.asm_dst_flat,
            num_segments=(self.NT + 1) * b * b,
            indices_are_sorted=True,
        )
        tiles = flat.reshape(self.NT + 1, b, b).at[self.NT].set(0.0)
        # Boosted unit diagonal on padded/gap slots (and caller's rows).
        if row_boost is None:
            row_boost = jnp.zeros(0, dt)
        m = row_boost.shape[0]
        rb = jnp.pad(row_boost.astype(dt), (0, n_pad - m), constant_values=1.0)
        boost_p = rb[self.pperm].reshape(self.B, b)
        eye = jnp.eye(b, dtype=dt)
        return tiles.at[self.diag_ids].add(eye[None] * boost_p[:, :, None])

    def _factorize_dbound(self, tiles, dbound):
        """factorize with the CHOLMOD-dbound singular retry: on failure,
        refactor once with dbound*max(diag) added to the diagonal tiles
        (see ops.dense.prepare_normal; wrapper.c binds the same knob)."""
        L, invd, ok = self.factorize(tiles)
        if dbound <= 0.0:
            return L, invd, ok
        eye = jnp.eye(self.b, dtype=tiles.dtype)

        def retry():
            diags = jnp.diagonal(tiles[self.diag_ids], axis1=1, axis2=2)
            jitter = dbound * jnp.max(diags)
            tiles2 = tiles.at[self.diag_ids].add(jitter * eye[None])
            return self.factorize(tiles2)

        return jax.lax.cond(ok, lambda: (L, invd, ok), retry)

    # ---- mesh (tensor-parallel) path ------------------------------------

    def _shard_schedule(self, ntp: int):
        """Padded schedules for an ntp-chip 'tp' axis, cached per ntp:

        - the sorted pair arrays repadded to a multiple of ntp (pad pairs
          carry weight 0 and land in the dummy tile), sliced contiguously
          per chip so each slab stays sorted-by-destination;
        - the per-panel SYRK arrays repadded to a multiple of ntp, plus
          each pair's index into the panel's distinct-destination list
          (pad pairs index the drop row Dmax).
        """
        if ntp in self._shard_cache:
            return self._shard_cache[ntp]
        b, B = self.b, self.B
        DUMMY = self.NT
        ws, ks, dst = self._asm_np
        npairs = len(ws)
        padded = -(-max(npairs, 1) // ntp) * ntp
        pw = np.zeros(padded, np.float64)
        pk = np.zeros(padded, np.int32)
        pdst = np.full(padded, DUMMY * b * b, np.int64)
        pw[:npairs] = ws
        pk[:npairs] = ks
        pdst[:npairs] = dst

        syrk_a, syrk_b, sdi, ddst = self._syrk_raw
        width = max(max((len(x) for x in syrk_a), default=0), 1)
        Ps = -(-width // ntp) * ntp

        def pad_to(lists, fill, w):
            out = np.full((len(lists), w), fill, dtype=np.int64)
            for r, x in enumerate(lists):
                out[r, : len(x)] = x
            return out

        sched = {
            "pw": jnp.asarray(pw, self.asm_w.dtype),
            "pk": jnp.asarray(pk),
            "pdst": jnp.asarray(pdst, jnp.int32),
            "sa": jnp.asarray(pad_to(syrk_a, DUMMY, Ps), jnp.int32),
            "sb": jnp.asarray(pad_to(syrk_b, DUMMY, Ps), jnp.int32),
            "sdi": jnp.asarray(pad_to(sdi, self.Dmax, Ps), jnp.int32),
            "ddst": jnp.asarray(pad_to(ddst, DUMMY, self.Dmax), jnp.int32),
            "chunk": Ps // ntp,
        }
        self._shard_cache[ntp] = sched
        return sched

    def _factorize_tp(self, tiles, sched, ntp: int):
        """The panel-wave factorization with the SYRK (Schur) batch sharded
        over 'tp': chol + tri-inv + TRSM run replicated (identical on every
        chip — they are panel-sequential and tiny), each chip computes its
        1/ntp slice of the panel's SYRK pairs, and one psum('tp') of the
        (Dmax+1, b, b) distinct-destination buffer applies the updates.
        Must be called inside a shard_map over the 'tp' axis with
        replicated tile input."""
        b = self.b
        dtype = tiles.dtype
        ein = lambda s, *ops: jnp.einsum(
            s, *ops, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype,
        )
        eye = jnp.eye(b, dtype=dtype)
        chunk = sched["chunk"]

        def panel(k, carry):
            tiles, invd = carry
            did = self.diag_ids[k]
            Td = jax.lax.dynamic_index_in_dim(tiles, did, 0, keepdims=False)
            L = jnp.linalg.cholesky(Td)
            inv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            tiles = jax.lax.dynamic_update_index_in_dim(tiles, L, did, 0)
            invd = jax.lax.dynamic_update_index_in_dim(invd, inv, k, 0)

            rid = jax.lax.dynamic_index_in_dim(self.rows_ids, k, 0, keepdims=False)
            R = tiles[rid]
            P_ = ein("rij,kj->rik", R, inv)
            tiles = tiles.at[rid].set(P_)

            sa = jax.lax.dynamic_index_in_dim(sched["sa"], k, 0, keepdims=False)
            sb = jax.lax.dynamic_index_in_dim(sched["sb"], k, 0, keepdims=False)
            si = jax.lax.dynamic_index_in_dim(sched["sdi"], k, 0, keepdims=False)
            dd = jax.lax.dynamic_index_in_dim(sched["ddst"], k, 0, keepdims=False)
            # This chip's pair slice (pad pairs -> zero tiles, drop row).
            lo = jax.lax.axis_index("tp") * chunk
            sa_c = jax.lax.dynamic_slice(sa, (lo,), (chunk,))
            sb_c = jax.lax.dynamic_slice(sb, (lo,), (chunk,))
            si_c = jax.lax.dynamic_slice(si, (lo,), (chunk,))
            Ta = tiles[sa_c]
            Tb = tiles[sb_c]
            U = ein("pij,pkj->pik", Ta, Tb)
            Useg = jax.ops.segment_sum(U, si_c, num_segments=self.Dmax + 1)
            Usum = jax.lax.psum(Useg, "tp")  # Schur updates over ICI
            tiles = tiles.at[dd].add(-Usum[: self.Dmax])
            tiles = tiles.at[self.NT].set(0.0)
            return tiles, invd

        invd0 = jnp.zeros((self.B, b, b), dtype)
        tiles, invd = jax.lax.fori_loop(0, self.B, panel, (tiles, invd0))
        diags = jnp.diagonal(tiles[self.diag_ids], axis1=1, axis2=2)
        ok = jnp.all(jnp.isfinite(tiles)) & jnp.all(diags > 0)
        return tiles, invd, ok

    def _assemble_factor_tp(self, mesh, d, boost_p, dbound: float):
        """Sharded pair-schedule assembly + sharded panel-wave factor, as
        ONE shard_map over the mesh's 'tp' axis.  Each chip:

        - multiplies its contiguous slab of the sorted pair schedule by the
          gathered d² and segment-sums it into a full flat tile array; one
          psum('tp') assembles the resident tiles of P(AD)(AD)ᵀPᵀ (the
          sharded cholmod_aat — communication: (NT+1)·b² floats once per
          factorization);
        - runs the panel waves with its SYRK pair slice, one
          (Dmax+1, b, b) psum per panel (_factorize_tp).

        Returns replicated (L_tiles, invd, ok).  ``boost_p`` is the
        slot-permuted padded boost vector (length B·b).
        """
        from functools import partial as _partial

        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        ntp = mesh.shape["tp"]
        sched = self._shard_schedule(ntp)
        b = self.b
        dt = self.asm_w.dtype
        eye = jnp.eye(b, dtype=dt)

        @_partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("tp"), P("tp"), P("tp"), P(), P()),
            out_specs=(P(), P(), P()),
        )
        def _prep(w_c, k_c, dst_c, d_rep, boost_rep):
            d2 = (d_rep * d_rep).astype(dt)
            vals = w_c * d2[k_c]
            flat = jax.ops.segment_sum(
                vals, dst_c, num_segments=(self.NT + 1) * b * b,
                indices_are_sorted=True,
            )
            flat = jax.lax.psum(flat, "tp")
            tiles = flat.reshape(self.NT + 1, b, b).at[self.NT].set(0.0)
            tiles = tiles.at[self.diag_ids].add(
                eye[None] * boost_rep.reshape(self.B, b)[:, :, None]
            )

            L, invd, ok = self._factorize_tp(tiles, sched, ntp)
            if dbound > 0.0:

                def retry():
                    diags = jnp.diagonal(
                        tiles[self.diag_ids], axis1=1, axis2=2
                    )
                    jitter = dbound * jnp.max(diags)
                    tiles2 = tiles.at[self.diag_ids].add(jitter * eye[None])
                    return self._factorize_tp(tiles2, sched, ntp)

                L, invd, ok = jax.lax.cond(
                    ok, lambda: (L, invd, ok), retry
                )
            return L, invd, ok

        return _prep(sched["pw"], sched["pk"], sched["pdst"], d, boost_p)

    def prepare_normal_ell(self, E, ET, d, m, row_boost=None, refine_steps=0,
                           dbound: float = 0.0, krylov_steps: int = 0,
                           mesh=None, krylov_gate=None, EB=None, ETB=None):
        """Factor-once / solve-many for the fully sparse path: pair-schedule
        assembly + planned tile factorization; each solve_fn(g) adds ELL
        double-word refinement.  ``E``/``ET`` are the ELLMatrix forms of A
        and Aᵀ (ops.sparse_ops); requires build_ell_assembly
        (engine_for_sparse).  ``m`` is the row count (g length).

        ``krylov_steps`` > 0 switches refinement to flexible PCG with the
        tile factor as preconditioner and explicit double-word residuals
        (ops.krylov) — the ill-conditioned-N escape hatch.  With
        ``krylov_gate`` (a traced boolean) each solve call picks PCG only
        when the gate is True, else the ``refine_steps`` Richardson path,
        on the same factor (ops.krylov.gated) — solver loops gate on the
        duality gap so early iterations skip the PCG cost.

        ``EB``/``ETB`` (ops.bell.BellMatrix forms of A and Aᵀ, both or
        neither): route the Richardson refinement's double-word residual
        products over block-ELL instead of the per-nonzero ELL forms.
        The plain-ELL dd SpMVs serialize on TPU and owned ~3.8 ms of the
        4.6 ms refine share at m=16384 (28% of the whole 13.6 ms
        iteration — benchmarks/profile_atscale_iter.py r5); the BELL
        pair runs at HBM bandwidth.

        ``mesh`` runs the assembly pair slabs and the panel-wave SYRK
        batches sharded over the mesh's 'tp' axis with psums on the
        assembled tiles and the per-panel Schur updates
        (_assemble_factor_tp) — the multi-chip mode of the at-scale
        pipeline.  The triangular solves and the ELL refinement matvecs
        stay replicated (they are O(nnz) against the factorization's
        O(tile³) and panel-sequential anyway)."""
        from cholesky_is_magic_tpu.ops import dd as ddm
        from cholesky_is_magic_tpu.ops import sparse_ops

        n_pad = self.B * self.b
        boost = row_boost if row_boost is not None else jnp.zeros(m, d.dtype)
        if mesh is not None:
            dt = self.asm_w.dtype
            rb = jnp.pad(boost.astype(dt), (0, n_pad - m), constant_values=1.0)
            boost_p = rb[self.pperm]
            L, invd, ok = self._assemble_factor_tp(mesh, d, boost_p, dbound)
        else:
            tiles = self.assemble_pairs(d, boost)
            L, invd, ok = self._factorize_dbound(tiles, dbound)
        d2 = ddm.two_prod(d, d) if refine_steps else None

        def raw_solve(r):
            rp = jnp.pad(r, (0, n_pad - m))[self.pperm]
            yp = self.solve(L, invd, rp)
            return jnp.zeros_like(yp).at[self.pperm].set(yp)[:m]

        use_bell = EB is not None and ETB is not None
        if use_bell:
            from cholesky_is_magic_tpu.ops import bell as bell_ops

        def richardson_fn(g):
            y = raw_solve(g)
            for _ in range(refine_steps):
                if use_bell:
                    t = bell_ops.dd_matvec(ETB, y)  # Aᵀ y
                    u = ddm.dd_mul(t, d2)  # d² ∘ Aᵀ y
                    v = bell_ops.dd_matvec_dd(EB, u)  # A (d² Aᵀ y)
                else:
                    t = sparse_ops.dd_matvec(ET, y)  # Aᵀ y
                    u = ddm.dd_mul(t, d2)  # d² ∘ Aᵀ y
                    v = sparse_ops.dd_matvec_dd(E, u)  # A (d² Aᵀ y)
                v = ddm.dd_add_w(v, boost * y)
                r = ddm.dd_add_w(ddm.dd_neg(v), g).to_working()
                y = y + raw_solve(r)
            return jnp.where(ok, y, jnp.zeros_like(y))

        if krylov_steps > 0:
            from cholesky_is_magic_tpu.ops import krylov

            def pcg_fn(g):
                x = krylov.pcg_refine(
                    precond=raw_solve,
                    apply_n=krylov.ell_normal_apply(E, ET, d, boost),
                    residual_dd=krylov.ell_residual_dd(E, ET, d, g, boost),
                    b=g,
                    iters=krylov_steps,
                )
                y = x.to_working()
                return jnp.where(ok, y, jnp.zeros_like(y))

            return krylov.gated(pcg_fn, richardson_fn, krylov_gate), ok

        return richardson_fn, ok

    def solve_normal_ell(self, E, ET, d, g, row_boost=None, refine_steps=0,
                         dbound: float = 0.0, krylov_steps: int = 0,
                         mesh=None, EB=None, ETB=None):
        """(A·D)(A·D)ᵀ y = g entirely from sparse operands (see
        prepare_normal_ell)."""
        solve_fn, ok = self.prepare_normal_ell(
            E, ET, d, g.shape[0], row_boost=row_boost,
            refine_steps=refine_steps, dbound=dbound,
            krylov_steps=krylov_steps, mesh=mesh, EB=EB, ETB=ETB,
        )
        return solve_fn(g), ok

    def prepare_normal(self, A, d, row_boost=None, refine_steps=0,
                       dbound: float = 0.0, krylov_steps: int = 0,
                       krylov_gate=None):
        """Assemble + factor once; return (solve_fn, ok) — the engine's
        factor-once/solve-many split (solve-sparse-recycle analogue).
        ``krylov_steps`` > 0: flexible-PCG refinement (ops.krylov);
        ``krylov_gate``: per-call traced PCG/Richardson choice on the
        shared factor (see prepare_normal_ell)."""
        from cholesky_is_magic_tpu.ops.dense import operator_residual

        n_pad = self.B * self.b
        m = A.shape[0]
        tiles = self.assemble(A, d, row_boost, mode=self.assemble_mode)
        L, invd, ok = self._factorize_dbound(tiles, dbound)
        AD = A * d[None, :] if (refine_steps or krylov_steps) else None

        def raw_solve(r):
            rp = jnp.pad(r, (0, n_pad - m))[self.pperm]
            yp = self.solve(L, invd, rp)
            return jnp.zeros_like(yp).at[self.pperm].set(yp)[:m]

        def richardson_fn(g):
            y = raw_solve(g)
            for _ in range(refine_steps):
                r = operator_residual(AD, y, g, row_boost)
                y = y + raw_solve(r)
            return jnp.where(ok, y, jnp.zeros_like(y))

        if krylov_steps > 0:
            from cholesky_is_magic_tpu.ops import krylov

            def pcg_fn(g):
                x = krylov.pcg_refine(
                    precond=raw_solve,
                    apply_n=krylov.dense_normal_apply(AD, row_boost),
                    residual_dd=krylov.dense_residual_dd(AD, g, row_boost),
                    b=g,
                    iters=krylov_steps,
                )
                y = x.to_working()
                return jnp.where(ok, y, jnp.zeros_like(y))

            return krylov.gated(pcg_fn, richardson_fn, krylov_gate), ok

        return richardson_fn, ok

    def solve_normal(self, A, d, g, row_boost=None, refine_steps=0,
                     dbound: float = 0.0, krylov_steps: int = 0):
        """Drop-in for ops.dense.solve_normal via the tile engine.

        ``refine_steps`` adds double-word iterative refinement against the
        UNASSEMBLED operator (ops.dense.operator_residual): the f32 tile
        factorization then reaches the same accuracy as the dense dd path —
        the reference's sparse path is fp64 CHOLMOD and gets this for free
        (sparse-cholesky.lisp:524-560)."""
        solve_fn, ok = self.prepare_normal(
            A, d, row_boost=row_boost, refine_steps=refine_steps,
            dbound=dbound, krylov_steps=krylov_steps,
        )
        return solve_fn(g), ok
