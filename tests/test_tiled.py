"""Panel-wave tiled sparse Cholesky (sparse/tiled.py) tests."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from cholesky_is_magic_tpu.ops import dense as dense_ops
from cholesky_is_magic_tpu.sparse import analyze
from cholesky_is_magic_tpu.sparse.tiled import TiledCholesky, _tri_inv


def test_tri_inv_exact():
    rng = np.random.default_rng(0)
    for b in (8, 32, 64, 128):
        L = np.tril(rng.normal(size=(b, b)))
        np.fill_diagonal(L, 2.0 + rng.random(b))
        Li = np.asarray(_tri_inv(jnp.asarray(L)))
        # Error grows with the triangle's condition number (random tril
        # matrices are ill-conditioned); 1e-9 at b=128, f64.
        assert np.abs(Li @ L - np.eye(b)).max() < 1e-9


@pytest.mark.parametrize("block,density", [(8, 0.10), (16, 0.20)])
def test_solve_matches_dense(block, density):
    rng = np.random.default_rng(1)
    m, n = 72, 120
    A = (rng.random((m, n)) < density) * rng.normal(size=(m, n))
    A[np.arange(m), np.arange(m)] += 2.0
    plan = analyze(sp.csc_matrix(A), block=block)
    eng = TiledCholesky(plan)
    d = jnp.asarray(rng.random(n) + 0.5)
    g = jnp.asarray(rng.normal(size=m))
    y, ok = eng.solve_normal(jnp.asarray(A), d, g)
    y_ref, _ = dense_ops.solve_normal(jnp.asarray(A), d, g, refine_steps=0)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-9, atol=1e-10)


def test_block_diagonal_structure_stays_sparse():
    rng = np.random.default_rng(2)
    m, n, block = 96, 192, 16
    A = np.zeros((m, n))
    for k in range(3):
        blk = (rng.random((32, 64)) < 0.2) * rng.normal(size=(32, 64))
        blk[np.arange(32), np.arange(32)] += 2.0
        A[32 * k : 32 * (k + 1), 64 * k : 64 * (k + 1)] = blk
    plan = analyze(sp.csc_matrix(A), block=block)
    eng = TiledCholesky(plan)
    B = eng.B
    assert eng.NT < B * (B + 1) // 2  # genuinely sparse residency
    d = jnp.asarray(rng.random(n) + 0.5)
    g = jnp.asarray(rng.normal(size=m))
    y, ok = eng.solve_normal(jnp.asarray(A), d, g)
    y_ref, _ = dense_ops.solve_normal(jnp.asarray(A), d, g, refine_steps=0)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-9, atol=1e-10)


def test_no_closure_inflation():
    """Tile residency is etree-exact: SYRK pairs with structurally-zero
    destinations are dropped (their contribution is exactly zero by the
    fill-path theorem), not forced resident via a transitive closure.

    Pattern: column-tile 0 holds couplings (8,0) and (20,1) — tiles (2,0)
    and (5,0) are resident with NO shared elementwise column, so tile
    (5,2) has no fill.  Round 1's closure forced it resident.  (The plan
    is hand-built with an identity permutation: analyze() would postorder
    the couplings adjacent and hide the case.)"""
    from cholesky_is_magic_tpu.sparse.symbolic import FactorPlan

    m, n, block = 24, 26, 4
    A = np.zeros((m, n))
    A[np.arange(m), np.arange(m)] = 2.0 + np.arange(m) * 0.1  # SPD diagonal
    A[0, 24] = 1.0; A[8, 24] = 1.0   # N coupling (8, 0)
    A[1, 25] = 1.0; A[20, 25] = 1.0  # N coupling (20, 1)
    B = m // block
    block_mask = np.eye(B, dtype=bool)
    block_mask[2, 0] = True  # element (8, 0)
    block_mask[5, 0] = True  # element (20, 1)
    parent = np.full(m, -1)
    parent[0] = 8
    parent[1] = 20
    plan = FactorPlan(
        n=m, perm=np.arange(m), iperm=np.arange(m), parent=parent,
        post=np.arange(m), counts=np.ones(m, dtype=np.int64),
        snodes=[(i, i + 1) for i in range(m)], block=block,
        block_mask=block_mask, nnz_N=m + 4, nnz_L=m + 2, flops=0.0,
    )
    eng = TiledCholesky(plan)
    assert (2, 0) in eng.tiles and (5, 0) in eng.tiles
    assert (5, 2) not in eng.tiles  # closure would have added it
    assert eng.dropped_updates > 0
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random(n) + 0.5)
    g = jnp.asarray(rng.normal(size=m))
    y, ok = eng.solve_normal(jnp.asarray(A), d, g)
    y_ref, _ = dense_ops.solve_normal(jnp.asarray(A), d, g, refine_steps=0)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-9, atol=1e-10)


def test_singular_detected():
    rng = np.random.default_rng(3)
    m, n = 24, 40
    A = (rng.random((m, n)) < 0.2) * rng.normal(size=(m, n))
    A[np.arange(m), np.arange(m)] += 2.0
    plan = analyze(sp.csc_matrix(A), block=8)
    eng = TiledCholesky(plan)
    d = jnp.asarray(rng.random(n) + 0.5)
    g = jnp.asarray(rng.normal(size=m))
    y, ok = eng.solve_normal(jnp.zeros_like(jnp.asarray(A)), d, g)
    assert not bool(ok)
    assert np.all(np.asarray(y) == 0.0)


@pytest.mark.parametrize("block,density", [(8, 0.10), (16, 0.20)])
def test_assemble_modes_agree(block, density):
    """Range-mode (one matmul per column panel) and scan-mode (one per
    tile) assembly must produce identical resident tiles."""
    rng = np.random.default_rng(7)
    m, n = 72, 120
    A = (rng.random((m, n)) < density) * rng.normal(size=(m, n))
    A[np.arange(m), np.arange(m)] += 2.0
    eng = TiledCholesky(analyze(sp.csc_matrix(A), block=block))
    d = jnp.asarray(rng.random(n) + 0.5)
    boost = jnp.zeros(m)
    t_scan = eng.assemble(jnp.asarray(A), d, boost, mode="scan")
    t_range = eng.assemble(jnp.asarray(A), d, boost, mode="range")
    np.testing.assert_allclose(
        np.asarray(t_range), np.asarray(t_scan), rtol=1e-12, atol=1e-14
    )
    # And through the full solve on each mode.
    g = jnp.asarray(rng.normal(size=m))
    y_ref, _ = dense_ops.solve_normal(jnp.asarray(A), d, g, refine_steps=0)
    for mode in ("scan", "range"):
        eng.assemble_mode = mode
        y, ok = eng.solve_normal(jnp.asarray(A), d, g)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-9, atol=1e-10)


def test_snode_alignment_drops_tiles():
    """Supernode-aligned panels stop independent subproblems straddling
    tile boundaries (PARITY r1 known gap): 24 independent 3-var components
    on a 16-grid need cross-boundary tiles unaligned, none aligned."""
    rng = np.random.default_rng(3)
    m, block, ncols = 72, 16, 144
    A = np.zeros((m, ncols))
    for k in range(24):
        A[3 * k : 3 * k + 3, 6 * k : 6 * k + 6] = rng.normal(size=(3, 6))
    diag_cols = np.repeat(np.arange(0, ncols, 6), 3) + np.tile(np.arange(3), 24)
    A[np.arange(m), diag_cols] += 3.0
    plan = analyze(sp.csc_matrix(A), block=block)
    assert len(plan.snodes) == 24  # amalgamation must not glue components
    un = TiledCholesky(plan, snode_align=False)
    al = TiledCholesky(plan, snode_align=True)
    assert al.NT < un.NT  # recorded tile-count drop (5 vs 8 here)
    assert al.B == un.B  # and no extra panels for it
    d = jnp.asarray(rng.random(ncols) + 0.5)
    g = jnp.asarray(rng.normal(size=m))
    y_ref, _ = dense_ops.solve_normal(jnp.asarray(A), d, g, refine_steps=0)
    for eng in (un, al):
        y, ok = eng.solve_normal(jnp.asarray(A), d, g)
        assert bool(ok)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-9, atol=1e-10
        )


def test_refinement_recovers_f32_accuracy():
    """f32 tile solve + dd refinement must land ~eps^2 from the f64 oracle
    (the sparse-path accuracy story: the reference's sparse path is fp64
    CHOLMOD, sparse-cholesky.lisp:524-560)."""
    rng = np.random.default_rng(5)
    m, n = 72, 120
    A = (rng.random((m, n)) < 0.15) * rng.normal(size=(m, n))
    A[np.arange(m), np.arange(m)] += 2.0
    plan = analyze(sp.csc_matrix(A), block=16)
    eng = TiledCholesky(plan)
    # IPM-like slack spread (cond(N) ~ 1e6): f32 alone loses ~4 digits
    # here, so the refinement has real work to do.
    d = 10.0 ** rng.uniform(-1.5, 1.5, size=n)
    g = rng.normal(size=m)
    y_ref, _ = dense_ops.solve_normal(
        jnp.asarray(A), jnp.asarray(d), jnp.asarray(g), refine_steps=2
    )  # f64 on CPU tests
    A32, d32, g32 = (jnp.asarray(v, jnp.float32) for v in (A, d, g))
    y0, ok0 = eng.solve_normal(A32, d32, g32, refine_steps=0)
    y2, ok2 = eng.solve_normal(A32, d32, g32, refine_steps=2)
    assert bool(ok0) and bool(ok2)
    err0 = np.abs(np.asarray(y0, np.float64) - np.asarray(y_ref)).max()
    err2 = np.abs(np.asarray(y2, np.float64) - np.asarray(y_ref)).max()
    scale = np.abs(np.asarray(y_ref)).max()
    assert err2 < 1e-5 * scale  # ~f32-eps^1.5 or better
    assert err2 < err0 / 10  # refinement genuinely helps


class TestELLPath:
    """The fully sparse pipeline: pair-schedule assembly + ELL solve."""

    def _problem(self, seed=9, m=72, n=120, density=0.12):
        rng = np.random.default_rng(seed)
        A = (rng.random((m, n)) < density) * rng.normal(size=(m, n))
        A[np.arange(m), np.arange(m)] += 2.0
        d = rng.random(n) + 0.5
        g = rng.normal(size=m)
        return A, d, g

    def test_assemble_pairs_matches_dense(self):
        from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

        A, d, g = self._problem()
        eng = engine_for_sparse(A, block=16, dtype=jnp.float64)
        t_pairs = eng.assemble_pairs(jnp.asarray(d), jnp.zeros(A.shape[0]))
        t_dense = eng.assemble(jnp.asarray(A), jnp.asarray(d), jnp.zeros(A.shape[0]))
        np.testing.assert_allclose(
            np.asarray(t_pairs), np.asarray(t_dense), rtol=1e-12, atol=1e-13
        )

    def test_native_pair_schedule_matches_python(self, monkeypatch):
        """cim_pair_schedule enumerates columns/pairs in the same order as
        the Python fallback, so the schedules must be identical arrays."""
        from cholesky_is_magic_tpu.sparse import native
        from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

        if not native.available():
            pytest.skip("native library unavailable")
        A, _, _ = self._problem(seed=12)
        eng_nat = engine_for_sparse(A, block=16, dtype=jnp.float64)
        monkeypatch.setattr(
            "cholesky_is_magic_tpu.sparse.native.pair_schedule",
            lambda *a, **k: None,
        )
        eng_py = engine_for_sparse(A, block=16, dtype=jnp.float64)
        assert eng_nat.n_pairs == eng_py.n_pairs
        np.testing.assert_array_equal(np.asarray(eng_nat.asm_dst_flat),
                                      np.asarray(eng_py.asm_dst_flat))
        np.testing.assert_array_equal(np.asarray(eng_nat.asm_k),
                                      np.asarray(eng_py.asm_k))
        np.testing.assert_array_equal(np.asarray(eng_nat.asm_w),
                                      np.asarray(eng_py.asm_w))

    def test_solve_normal_ell_matches_dense(self):
        from cholesky_is_magic_tpu.ops import sparse_ops
        from cholesky_is_magic_tpu.ops.dense import solve_normal
        from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

        A, d, g = self._problem(seed=10)
        eng = engine_for_sparse(A, block=16, dtype=jnp.float64)
        E = sparse_ops.from_dense(A, dtype=jnp.float64)
        ET = sparse_ops.from_dense(A.T, dtype=jnp.float64)
        y, ok = eng.solve_normal_ell(E, ET, jnp.asarray(d), jnp.asarray(g))
        y_ref, _ = solve_normal(jnp.asarray(A), jnp.asarray(d), jnp.asarray(g),
                                refine_steps=0)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-9, atol=1e-10)

    def test_ell_refinement_recovers_f32(self):
        from cholesky_is_magic_tpu.ops import sparse_ops
        from cholesky_is_magic_tpu.ops.dense import solve_normal
        from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

        A, _, g = self._problem(seed=11)
        rng = np.random.default_rng(3)
        d = 10.0 ** rng.uniform(-1.5, 1.5, size=A.shape[1])
        y_ref, _ = solve_normal(jnp.asarray(A), jnp.asarray(d), jnp.asarray(g),
                                refine_steps=2)  # f64 oracle on CPU tests
        eng = engine_for_sparse(A, block=16, dtype=jnp.float32)
        E = sparse_ops.from_dense(A, dtype=jnp.float32)
        ET = sparse_ops.from_dense(A.T, dtype=jnp.float32)
        a32 = lambda v: jnp.asarray(v, jnp.float32)
        y0, ok0 = eng.solve_normal_ell(E, ET, a32(d), a32(g), refine_steps=0)
        y2, ok2 = eng.solve_normal_ell(E, ET, a32(d), a32(g), refine_steps=2)
        assert bool(ok0) and bool(ok2)
        scale = np.abs(np.asarray(y_ref)).max()
        err0 = np.abs(np.asarray(y0, np.float64) - np.asarray(y_ref)).max()
        err2 = np.abs(np.asarray(y2, np.float64) - np.asarray(y_ref)).max()
        assert err2 < 1e-5 * scale
        assert err2 < err0 / 10

    def test_padded_rows_inert_in_ell_path(self):
        """Rows beyond the true count (boost=1) and gap slots stay exact."""
        from cholesky_is_magic_tpu.ops import sparse_ops
        from cholesky_is_magic_tpu.ops.dense import solve_normal
        from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

        A, d, g = self._problem(seed=12, m=60)
        M = 72  # padded row count: 12 zero rows with boost
        Ap = np.zeros((M, A.shape[1]))
        Ap[:60] = A
        gp = np.concatenate([g, np.zeros(M - 60)])
        boost = np.concatenate([np.zeros(60), np.ones(M - 60)])
        eng = engine_for_sparse(Ap, block=16, dtype=jnp.float64)
        E = sparse_ops.from_dense(Ap, dtype=jnp.float64)
        ET = sparse_ops.from_dense(Ap.T, dtype=jnp.float64)
        y, ok = eng.solve_normal_ell(
            E, ET, jnp.asarray(d), jnp.asarray(gp), row_boost=jnp.asarray(boost)
        )
        y_ref, _ = solve_normal(
            jnp.asarray(Ap), jnp.asarray(d), jnp.asarray(gp),
            row_boost=jnp.asarray(boost), refine_steps=0,
        )
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(y)[60:], 0.0)


def test_pdas_with_tiled_engine():
    """End-to-end PDAS through the tiled sparse backend == dense backend."""
    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest import to_device_lp
    from cholesky_is_magic_tpu.ingest.mps import read_mps_string
    from cholesky_is_magic_tpu.sparse.tiled import engine_for
    from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas, pdas
    from cholesky_is_magic_tpu.utils.testing import (
        netlib_like_lp,
        scipy_reference_solution,
        write_mps,
    )

    ineq = netlib_like_lp("afiro")
    _, fun, _ = scipy_reference_solution(ineq)
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float64)
    st = make_pdas(lp)
    eng = engine_for(st.lp.A, block=16)
    res = pdas(st, PDASConfig(max_iters=200), engine=eng)
    assert res.status_name == "optimal"
    assert float(res.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)
