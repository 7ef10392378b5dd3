"""Symbolic analysis + block-sparse factorization tests."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from cholesky_is_magic_tpu.ops import dense as dense_ops
from cholesky_is_magic_tpu.sparse import (
    BlockSparseCholesky,
    amd_order,
    analyze,
    column_counts,
    elimination_tree,
    postorder,
    supernodes,
)
from cholesky_is_magic_tpu.sparse import native
from cholesky_is_magic_tpu.sparse.symbolic import normal_pattern


def random_sym_pattern(rng, n, density=0.1):
    M = sp.random(n, n, density=density, random_state=np.random.RandomState(rng), format="csc")
    S = (M + M.T).tocsc()
    S = S + sp.eye(n, format="csc")
    S.data[:] = 1.0
    return S


def brute_force_symbolic(S):
    """Reference symbolic elimination: fill via set operations (O(n^3))."""
    n = S.shape[0]
    C = sp.csc_matrix(S)
    adj = [set(map(int, C.indices[C.indptr[j]: C.indptr[j + 1]])) - {j} for j in range(n)]
    counts = np.ones(n, dtype=np.int64)
    lower = [set() for _ in range(n)]
    reach = [set(a) for a in adj]
    for j in range(n):
        below = {i for i in reach[j] if i > j}
        counts[j] += len(below)
        lower[j] = below
        # Fill: clique among `below`.
        for i in below:
            reach[i] |= below - {i}
    return counts, lower


class TestSymbolic:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_counts_match_brute_force(self, seed):
        S = random_sym_pattern(seed, 40)
        parent = elimination_tree(S, None)
        counts, nnz_L, flops = column_counts(S, None, parent)
        ref_counts, _ = brute_force_symbolic(S)
        np.testing.assert_array_equal(counts, ref_counts)
        assert nnz_L == ref_counts.sum()

    def test_etree_parent_increasing(self):
        S = random_sym_pattern(3, 50)
        parent = elimination_tree(S, None)
        ok = (parent == -1) | (parent > np.arange(len(parent)))
        assert ok.all()

    def test_postorder_is_valid(self):
        S = random_sym_pattern(4, 50)
        parent = elimination_tree(S, None)
        post = postorder(parent)
        assert sorted(post) == list(range(len(parent)))
        pos = np.empty(len(parent), dtype=int)
        pos[post] = np.arange(len(parent))
        for v, p in enumerate(parent):
            if p != -1:
                assert pos[v] < pos[p]  # children before parents

    def test_amd_beats_natural_on_arrow(self):
        # Arrow matrix with the spike FIRST: natural order fills fully,
        # minimum degree eliminates the spike last (zero fill).
        n = 30
        S = sp.lil_matrix((n, n))
        S[0, :] = 1.0
        S[:, 0] = 1.0
        S.setdiag(1.0)
        S = S.tocsc()
        perm = amd_order(S, use_native=False)
        parent_nat = elimination_tree(S, None)
        _, nnz_nat, _ = column_counts(S, None, parent_nat)
        parent_amd = elimination_tree(S, perm)
        _, nnz_amd, _ = column_counts(S, perm, parent_amd)
        assert nnz_amd < nnz_nat
        assert nnz_amd == 2 * n - 1  # no fill

    def test_supernode_partition_covers(self):
        S = random_sym_pattern(5, 60)
        parent = elimination_tree(S, None)
        counts, _, _ = column_counts(S, None, parent)
        sn = supernodes(parent, counts)
        assert sn[0][0] == 0 and sn[-1][1] == 60
        for (s0, e0), (s1, e1) in zip(sn, sn[1:]):
            assert e0 == s1 and s0 < e0


class TestNative:
    def test_native_builds_and_matches_python(self):
        if not native.available():
            pytest.skip("native library unavailable (no compiler?)")
        S = random_sym_pattern(7, 80, density=0.08)
        parent_py = elimination_tree(S, None)
        parent_nat = native.elimination_tree(S)
        np.testing.assert_array_equal(parent_py, parent_nat)
        np.testing.assert_array_equal(postorder(parent_py), native.postorder(parent_py))
        counts_py, nnz_py, flops_py = column_counts(S, None, parent_py)
        counts_nat, nnz_nat, flops_nat = native.column_counts(S, parent_py)
        np.testing.assert_array_equal(counts_py, counts_nat)
        assert nnz_py == nnz_nat
        assert flops_py == pytest.approx(flops_nat)

    def test_ordering_recovers_scrambled_band(self):
        """Best-of orderings (AMD / natural / RCM): a randomly permuted
        banded pattern must analyze to ~the banded fill, not the scrambled
        fill — RCM (or AMD) has to recover the structure."""
        rng = np.random.default_rng(5)
        n, band = 300, 4
        S = sp.lil_matrix((n, n))
        for i in range(n):
            for j in range(max(0, i - band), i + 1):
                S[i, j] = 1.0
                S[j, i] = 1.0
        S = S.tocsc()
        parent = elimination_tree(S, None)
        nnz_band = column_counts(S, None, parent)[1]
        p = rng.permutation(n)
        Ssc = S[p][:, p].tocsc()  # scrambled: natural order now terrible
        par_sc = elimination_tree(Ssc, None)
        nnz_scrambled = column_counts(Ssc, None, par_sc)[1]
        from cholesky_is_magic_tpu.sparse.symbolic import amd_order as amd

        best = nnz_scrambled
        cands = [amd(Ssc)]
        try:
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            cands.append(np.asarray(
                reverse_cuthill_mckee(sp.csr_matrix(Ssc), symmetric_mode=True),
                dtype=np.int64))
        except ImportError:
            pass
        for cand in cands:
            par = elimination_tree(Ssc, cand)
            best = min(best, column_counts(Ssc, cand, par)[1])
        assert nnz_scrambled > 2 * nnz_band  # scrambling really hurt
        assert best <= 1.5 * nnz_band  # and an ordering recovered it

    def test_native_amd_is_permutation_and_reduces_fill(self):
        if not native.available():
            pytest.skip("native library unavailable")
        n = 40
        S = sp.lil_matrix((n, n))
        S[0, :] = 1.0
        S[:, 0] = 1.0
        S.setdiag(1.0)
        S = S.tocsc()
        perm = native.amd_order(S)
        assert sorted(perm) == list(range(n))
        parent = elimination_tree(S, perm)
        _, nnz_amd, _ = column_counts(S, perm, parent)
        assert nnz_amd == 2 * n - 1


class TestBlockSparseCholesky:
    def _random_lp_matrix(self, seed, m, n, density=0.08):
        rng = np.random.default_rng(seed)
        A = (rng.random((m, n)) < density) * rng.normal(size=(m, n))
        A[np.arange(m), np.arange(m)] += 2.0  # nonsingular Gram
        return A

    @pytest.mark.parametrize("block", [8, 16])
    def test_solve_matches_dense(self, block):
        m, n = 40, 72
        A_np = self._random_lp_matrix(0, m, n)
        plan = analyze(sp.csc_matrix(A_np), block=block, use_native=False)
        eng = BlockSparseCholesky(plan)
        rng = np.random.default_rng(1)
        A = jnp.asarray(A_np, jnp.float64)
        d = jnp.asarray(rng.random(n) + 0.5, jnp.float64)
        g = jnp.asarray(rng.normal(size=m), jnp.float64)
        y_ref, ok_ref = dense_ops.solve_normal(A, d, g, refine_steps=0)
        y, ok = eng.solve_normal(A, d, g)
        assert bool(ok) and bool(ok_ref)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-8, atol=1e-10)

    def test_factor_respects_block_mask(self):
        # Values must never appear in tiles the plan marked zero.
        m, n = 48, 80
        A_np = self._random_lp_matrix(2, m, n, density=0.05)
        block = 8
        plan = analyze(sp.csc_matrix(A_np), block=block, use_native=False)
        eng = BlockSparseCholesky(plan)
        rng = np.random.default_rng(3)
        A = jnp.asarray(A_np, jnp.float64)
        d = jnp.asarray(rng.random(n) + 0.5, jnp.float64)
        N = eng.assemble_normal(A, d)
        L = np.asarray(eng.factorize(N))
        B = plan.block_mask.shape[0]
        mask = plan.block_mask | np.eye(B, dtype=bool)
        for i in range(B):
            for j in range(i + 1):
                tile = L[i * block : (i + 1) * block, j * block : (j + 1) * block]
                if not mask[i, j]:
                    assert np.all(tile == 0.0), (i, j)
        # And reconstruct: L Lᵀ = N on the lower triangle.
        rec = L @ L.T
        np.testing.assert_allclose(rec, np.asarray(N), rtol=1e-9, atol=1e-9)

    def test_skips_tiles_on_block_diagonal_problem(self):
        # Two independent sub-LPs: off-diagonal tiles must be skipped.
        m, n, block = 32, 48, 8
        A1 = self._random_lp_matrix(4, m // 2, n // 2)
        A2 = self._random_lp_matrix(5, m // 2, n // 2)
        A_np = np.zeros((m, n))
        A_np[: m // 2, : n // 2] = A1
        A_np[m // 2 :, n // 2 :] = A2
        plan = analyze(sp.csc_matrix(A_np), block=block, use_native=False)
        B = plan.block_mask.shape[0]
        # With no ordering mixing the blocks, at most the two diagonal
        # super-blocks are populated: tiles bridging the halves are zero.
        stats = plan.stats()
        assert stats["nonzero_tiles"] < stats["total_tiles"]
        eng = BlockSparseCholesky(plan)
        total_pairs = sum(len(p) for p in eng.updates)
        dense_pairs = sum(
            len([(i, j) for i in range(k + 1, B) for j in range(k + 1, i + 1)])
            for k in range(B)
        )
        assert total_pairs < dense_pairs
