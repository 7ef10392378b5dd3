"""Block-ELL (ops.bell) correctness: tile layout, inflation gate, and the
APPROX routing equivalence (BELL products == ELL gather/scatter products).

The BELL layout is a pure execution-model change — every test here pins
it to the plain-ELL / scipy reference semantics (cholmod_sdmult parity,
sparse-cholesky.lisp:567-614, carried over from ops.sparse_ops)."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from cholesky_is_magic_tpu.ops import bell, sparse_ops


def _random_coo(rng, m, n, nnz):
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz)
    return rows, cols, vals


@pytest.mark.parametrize(
    "m,n,nnz",
    [(100, 257, 800), (8, 128, 5), (1000, 300, 4000), (129, 640, 1), (64, 128, 200)],
)
def test_matvec_matches_scipy(m, n, nnz):
    rng = np.random.default_rng(m + n)
    rows, cols, vals = _random_coo(rng, m, n, nnz)
    B = bell.from_coo(rows, cols, vals, (m, n), dtype=jnp.float64,
                      max_dense_frac=100.0)
    assert B is not None
    A = sp.csr_matrix((vals, (rows, cols)), shape=(m, n))
    x = rng.normal(size=n)
    y = np.asarray(bell.matvec(B, jnp.asarray(x)))
    np.testing.assert_allclose(y, A @ x, rtol=1e-12, atol=1e-12)


def test_duplicates_summed():
    # Same COO convention as sparse_ops.from_coo / CHOLMOD triplets.
    rows = np.array([3, 3, 0])
    cols = np.array([7, 7, 130])
    vals = np.array([1.5, 2.5, -1.0])
    B = bell.from_coo(rows, cols, vals, (8, 256), dtype=jnp.float64,
                      max_dense_frac=100.0)
    x = np.arange(256, dtype=np.float64)
    y = np.asarray(bell.matvec(B, jnp.asarray(x)))
    assert y[3] == pytest.approx(4.0 * 7)
    assert y[0] == pytest.approx(-130.0)


def test_inflation_gate_returns_none():
    # Tiny matrices: the (8, 128) tile rounding exceeds the dense
    # footprint, so the dense-crossover gate rejects (the caller's dense
    # matmul wins outright there).
    rng = np.random.default_rng(0)
    rows, cols, vals = _random_coo(rng, 17, 17, 30)
    assert bell.from_coo(rows, cols, vals, (17, 17)) is None
    # Absolute memory cap rejects BEFORE allocating the blocks.
    rows, cols, vals = _random_coo(rng, 4096, 4096, 4000)
    assert bell.from_coo(rows, cols, vals, (4096, 4096),
                         max_bytes=1024) is None
    assert bell.from_coo(rows, cols, vals, (4096, 4096)) is not None


def test_empty_and_tiny():
    assert bell.from_coo(np.zeros(0), np.zeros(0), np.zeros(0), (4, 4)) is None


class TestDDProducts:
    """Double-word BELL products: f32 operands must reach ~1e-12 of the
    f64 truth (the plain f32 product floors at ~1e-6 — discriminating)."""

    def _coo32(self, m=200, n=500, nnz=3000, seed=3):
        rng = np.random.default_rng(seed)
        rows = rng.integers(0, m, nnz)
        cols = rng.integers(0, n, nnz)
        vals = rng.normal(size=nnz).astype(np.float32)
        import scipy.sparse as sp

        # The oracle must see the STORED operand: duplicates are summed in
        # f64 at construction and then rounded to f32 (both ELL and BELL),
        # so the f64 reference matrix is the f32-rounded sum.
        A64 = sp.csr_matrix(
            (vals.astype(np.float64), (rows, cols)), shape=(m, n)
        ).toarray().astype(np.float32).astype(np.float64)
        return rows, cols, vals, A64

    def test_dd_matvec_reaches_f64(self):
        rows, cols, vals, A64 = self._coo32()
        B = bell.from_coo(rows, cols, vals, A64.shape, dtype=jnp.float32,
                          max_dense_frac=100.0)
        rng = np.random.default_rng(4)
        x32 = rng.normal(size=A64.shape[1]).astype(np.float32)
        ref = A64 @ x32.astype(np.float64)
        got = bell.dd_matvec(B, jnp.asarray(x32))
        out = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-11 * scale)
        # And the ELL dd product agrees (same composition, different order).
        E = sparse_ops.from_coo(rows, cols, vals, A64.shape, dtype=jnp.float32)
        egot = sparse_ops.dd_matvec(E, jnp.asarray(x32))
        eout = np.asarray(egot.hi, np.float64) + np.asarray(egot.lo, np.float64)
        np.testing.assert_allclose(out, eout, rtol=0, atol=1e-11 * scale)

    def test_dd_matvec_dd_reaches_f64(self):
        from cholesky_is_magic_tpu.ops import dd as ddm

        rows, cols, vals, A64 = self._coo32(seed=5)
        B = bell.from_coo(rows, cols, vals, A64.shape, dtype=jnp.float32,
                          max_dense_frac=100.0)
        rng = np.random.default_rng(6)
        x64 = rng.normal(size=A64.shape[1])
        hi = x64.astype(np.float32)
        lo = (x64 - hi.astype(np.float64)).astype(np.float32)
        x_dd = ddm.DD(jnp.asarray(hi), jnp.asarray(lo))
        ref = A64 @ (hi.astype(np.float64) + lo.astype(np.float64))
        got = bell.dd_matvec_dd(B, x_dd)
        out = np.asarray(got.hi, np.float64) + np.asarray(got.lo, np.float64)
        np.testing.assert_allclose(out, ref, rtol=0,
                                   atol=1e-11 * np.max(np.abs(ref)))


class TestSparseKKTRouting:
    """SparseKKTLP carries EB/ETB and every routing seam (backend.mv_rmv,
    pdas_dd._linops, kkt sparse operator, crossover dd ops) produces the
    same numbers with and without them."""

    def _kkt_lp(self, with_bell=True):
        import dataclasses

        from cholesky_is_magic_tpu.ingest.device import SparseKKTLP
        from cholesky_is_magic_tpu.ops import bell as bops

        rng = np.random.default_rng(7)
        m, n, nnz = 96, 220, 900
        rows = rng.integers(0, m, nnz)
        cols = rng.integers(0, n, nnz)
        vals = rng.normal(size=nnz)
        E = sparse_ops.from_coo(rows, cols, vals, (m, n), dtype=jnp.float64)
        ET = sparse_ops.from_coo(cols, rows, vals, (n, m), dtype=jnp.float64)
        EB = bops.from_coo(rows, cols, vals, (m, n), dtype=jnp.float64,
                           max_dense_frac=100.0)
        ETB = bops.from_coo(cols, rows, vals, (n, m), dtype=jnp.float64,
                            max_dense_frac=100.0)
        assert EB is not None and ETB is not None
        lp = SparseKKTLP(
            E=E, ET=ET, c=jnp.zeros(n), b=jnp.zeros(m),
            l=jnp.zeros(n), u=jnp.ones(n),
            row_mask=jnp.ones(m, bool), col_mask=jnp.ones(n, bool),
            m=m, n=n,
            EB=EB if with_bell else None, ETB=ETB if with_bell else None,
        )
        return lp

    def test_mv_rmv_routes_match(self):
        from cholesky_is_magic_tpu.solvers.backend import mv_rmv

        lp_b, lp_e = self._kkt_lp(True), self._kkt_lp(False)
        rng = np.random.default_rng(8)
        v = jnp.asarray(rng.normal(size=lp_b.n))
        y = jnp.asarray(rng.normal(size=lp_b.m))
        mv_b, rmv_b = mv_rmv(lp_b)
        mv_e, rmv_e = mv_rmv(lp_e)
        np.testing.assert_allclose(np.asarray(mv_b(v)), np.asarray(mv_e(v)),
                                   rtol=1e-13)
        np.testing.assert_allclose(np.asarray(rmv_b(y)), np.asarray(rmv_e(y)),
                                   rtol=1e-13)

    def test_dd_linops_routes_match(self):
        from cholesky_is_magic_tpu.ops import dd as ddm
        from cholesky_is_magic_tpu.solvers.pdas_dd import _linops

        lp_b, lp_e = self._kkt_lp(True), self._kkt_lp(False)
        rng = np.random.default_rng(9)
        x = ddm.dd_from(jnp.asarray(rng.normal(size=lp_b.n)))
        y = ddm.dd_from(jnp.asarray(rng.normal(size=lp_b.m)))
        w = jnp.asarray(rng.normal(size=lp_b.m))
        for fb, fe, arg in zip(_linops(lp_b), _linops(lp_e), (x, y, w)):
            rb, re = fb(arg), fe(arg)
            np.testing.assert_allclose(
                np.asarray(rb.hi, np.float64) + np.asarray(rb.lo, np.float64),
                np.asarray(re.hi, np.float64) + np.asarray(re.lo, np.float64),
                rtol=1e-13, atol=1e-13,
            )

    def test_pdas_dd_sparse_carries_bell_at_scale(self):
        """make_pdas_dd_sparse builds EB/ETB on the staircase family at a
        size where the byte gate admits them, and the solve runs through
        the BELL products to the same optimum as the ELL route."""
        import dataclasses

        from cholesky_is_magic_tpu.solvers import PDASConfig
        from cholesky_is_magic_tpu.solvers.pdas_dd import (
            make_pdas_dd_sparse,
            pdas_dd,
        )

        sf = _staircase_sf(512)
        st, eng = make_pdas_dd_sparse(sf, block=128, dtype=jnp.float32)
        assert st.lp.EB is not None and st.lp.ETB is not None
        cfg = PDASConfig(max_iters=60, gap_tol=1e-9, refine_steps=1)
        r_bell = pdas_dd(st, cfg, engine=eng)
        lp_ell = dataclasses.replace(st.lp, EB=None, ETB=None)
        r_ell = pdas_dd(dataclasses.replace(st, lp=lp_ell), cfg, engine=eng)
        assert int(r_bell.status) == int(r_ell.status)
        # f32 operands + dd products: the two routings differ only in
        # summation order (~1e-13 per product); the converged objectives
        # agree to the f32 operand floor (docs/DEVNOTES.md).
        np.testing.assert_allclose(float(r_bell.objective),
                                   float(r_ell.objective), rtol=2e-6)


def _staircase_sf(m=512):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from at_scale_sparse import build_lp, to_standard_form

    return to_standard_form(*build_lp(m))


def test_sparse_lp_carries_bell_and_routes_match():
    """to_sparse_lp builds EB/ETB for the banded at-scale family, and the
    BELL-routed APPROX gradient equals the ELL-routed one."""
    import dataclasses

    from cholesky_is_magic_tpu.ingest.device import to_sparse_lp
    from cholesky_is_magic_tpu.solvers.approx import (
        make_alm_subproblem,
        value_and_gradient,
    )

    sf = _staircase_sf(512)
    lp = to_sparse_lp(sf, dtype=jnp.float64)
    assert lp.EB is not None and lp.ETB is not None
    lam = jnp.asarray(np.random.default_rng(1).normal(size=lp.m))
    prob = make_alm_subproblem(lp, lam, 10.0)
    assert prob.QB is not None and prob.QTB is not None
    prob_ell = dataclasses.replace(prob, QB=None, QTB=None)
    v = jnp.asarray(np.random.default_rng(2).normal(size=lp.n))
    val_b, g_b, mv_b = value_and_gradient(prob, v)
    val_e, g_e, mv_e = value_and_gradient(prob_ell, v)
    np.testing.assert_allclose(float(val_b), float(val_e), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_e), rtol=1e-9,
                               atol=1e-9 * float(jnp.max(jnp.abs(g_e))))
    np.testing.assert_allclose(float(mv_b), float(mv_e), rtol=1e-10)
    # The subproblem precomputes (c_lin, nu) also route through ETB —
    # compare against an LP with the BELLs stripped.
    lp_ell = dataclasses.replace(lp, EB=None, ETB=None)
    prob2 = make_alm_subproblem(lp_ell, lam, 10.0)
    np.testing.assert_allclose(np.asarray(prob.c_lin), np.asarray(prob2.c_lin),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(prob.nu), np.asarray(prob2.nu),
                               rtol=1e-10, atol=1e-12)


def test_alm_solves_with_bell_operands():
    """End-to-end ALM over BELL-carrying operands still reaches the HiGHS
    objective on a mid-size staircase (the at-scale path in miniature)."""
    from scipy.optimize import linprog

    from cholesky_is_magic_tpu.ingest.device import to_sparse_lp
    from cholesky_is_magic_tpu.solvers import alm, make_alm
    from cholesky_is_magic_tpu.solvers.alm import ALMConfig

    sf = _staircase_sf(256)
    lp = to_sparse_lp(sf, dtype=jnp.float64)
    assert lp.EB is not None
    A = sp.csr_matrix((sf.a_vals, (sf.a_rows, sf.a_cols)),
                      shape=(sf.ncons, sf.nvars))
    ref = linprog(sf.c, A_eq=A, b_eq=sf.b,
                  bounds=np.stack([np.clip(sf.l, -1e30, 1e30),
                                   np.clip(sf.u, -1e30, 1e30)], 1),
                  method="highs")
    cfg = ALMConfig(max_outer=40, violation_tol=1e-6, pg_tol=1e-6,
                    inner_iters=20_000)
    res = alm(make_alm(lp), config=cfg)
    obj = float(jnp.dot(lp.c, res.x))
    assert abs(obj - ref.fun) / abs(ref.fun) < 1e-4


def test_engine_refine_bell_matches_ell():
    """The tile engine's Richardson refinement with BELL operands
    (prepare_normal_ell EB=/ETB=, r5) matches the plain-ELL route and
    solves the scaled normal equations to f32-refined accuracy.  The
    BELL route is what the solver paths use (backend/kkt pass
    SparseKKTLP.EB/ETB through); the plain-ELL dd SpMVs it replaces
    owned ~28% of the at-scale iteration (profile_atscale_iter r5)."""
    from cholesky_is_magic_tpu.ops import bell as bops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    sf = _staircase_sf(256)
    A = sp.csc_matrix((sf.a_vals, (sf.a_rows, sf.a_cols)),
                      shape=(sf.ncons, sf.nvars))
    eng = engine_for_sparse(A, block=128)
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                            (sf.ncons, sf.nvars), dtype=jnp.float32)
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                             (sf.nvars, sf.ncons), dtype=jnp.float32)
    EB = bops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                       (sf.ncons, sf.nvars), max_dense_frac=100.0)
    ETB = bops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                        (sf.nvars, sf.ncons), max_dense_frac=100.0)
    assert EB is not None and ETB is not None
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.random(sf.nvars) + 0.5, jnp.float32)
    g = jnp.asarray(rng.normal(size=sf.ncons), jnp.float32)
    y0, ok0 = eng.solve_normal_ell(E, ET, d, g, refine_steps=2)
    y1, ok1 = eng.solve_normal_ell(E, ET, d, g, refine_steps=2,
                                   EB=EB, ETB=ETB)
    assert bool(ok0) and bool(ok1)
    scale = float(jnp.max(jnp.abs(y0)))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=0, atol=1e-5 * scale)
    # True residual of the BELL-refined solve.
    AD = A.multiply(np.asarray(d)[None, :])
    N = (AD @ AD.T).toarray()
    r = np.asarray(g, np.float64) - N @ np.asarray(y1, np.float64)
    assert np.linalg.norm(r) < 1e-5 * np.linalg.norm(np.asarray(g))
