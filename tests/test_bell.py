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
