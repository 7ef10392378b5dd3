"""ELL SpMV tests (the sparse-m*/cholmod_sdmult parity surface) + the
sparse KKT operator backend."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from cholesky_is_magic_tpu.kkt import solve_kkt_newton, kkt_residuals
from cholesky_is_magic_tpu.kkt.newton import sparse_kkt_operator
from cholesky_is_magic_tpu.ops import sparse_ops
from cholesky_is_magic_tpu.sparse import BlockSparseCholesky, analyze


def random_sparse(rng, m, n, density=0.15):
    A = (rng.random((m, n)) < density) * rng.normal(size=(m, n))
    A[np.arange(min(m, n)), np.arange(min(m, n))] += 2.0
    return A


class TestELL:
    def test_matvec_matches_dense(self):
        rng = np.random.default_rng(0)
        A = random_sparse(rng, 13, 29)
        E = sparse_ops.from_dense(A, dtype=jnp.float64)
        x = jnp.asarray(rng.normal(size=29), jnp.float64)
        np.testing.assert_allclose(
            np.asarray(sparse_ops.matvec(E, x)), A @ np.asarray(x), rtol=1e-12
        )

    def test_rmatvec_matches_dense(self):
        rng = np.random.default_rng(1)
        A = random_sparse(rng, 13, 29)
        E = sparse_ops.from_dense(A, dtype=jnp.float64)
        y = jnp.asarray(rng.normal(size=13), jnp.float64)
        np.testing.assert_allclose(
            np.asarray(sparse_ops.rmatvec(E, y)), A.T @ np.asarray(y), rtol=1e-12
        )

    def test_sdmult_full_signature(self):
        # y <- alpha A x + beta y (sparse-m*, sparse-cholesky.lisp:567-614).
        rng = np.random.default_rng(2)
        A = random_sparse(rng, 9, 17)
        E = sparse_ops.from_dense(A, dtype=jnp.float64)
        x = rng.normal(size=17)
        y = rng.normal(size=9)
        out = sparse_ops.sdmult(
            E, jnp.asarray(x), jnp.asarray(y), alpha=-1.0, beta=2.0
        )
        np.testing.assert_allclose(np.asarray(out), -A @ x + 2.0 * y, rtol=1e-12)

    def test_scale_columns(self):
        rng = np.random.default_rng(3)
        A = random_sparse(rng, 9, 17)
        d = rng.random(17) + 0.5
        E = sparse_ops.scale_columns(sparse_ops.from_dense(A, dtype=jnp.float64), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(sparse_ops.to_dense(E)), A * d, rtol=1e-12)

    def test_coo_duplicates_summed(self):
        rows = np.array([0, 0, 1])
        cols = np.array([1, 1, 0])
        vals = np.array([2.0, 3.0, 1.0])
        E = sparse_ops.from_coo(rows, cols, vals, (2, 2), dtype=jnp.float64)
        D = np.asarray(sparse_ops.to_dense(E))
        np.testing.assert_array_equal(D, [[0.0, 5.0], [1.0, 0.0]])


class TestSparseKKTOperator:
    def test_kkt_with_sparse_backend(self):
        rng = np.random.default_rng(4)
        m, n = 24, 40
        A_np = random_sparse(rng, m, n, density=0.1)
        plan = analyze(sp.csc_matrix(A_np), block=8, use_native=False)
        eng = BlockSparseCholesky(plan)
        A = jnp.asarray(A_np, jnp.float64)
        op = sparse_kkt_operator(A, eng)
        pos = lambda k: jnp.asarray(0.1 + 10 * rng.random(k), jnp.float64)
        args = (pos(n), pos(n), pos(n), pos(n))
        rhs = (
            jnp.asarray(rng.random(n), jnp.float64),
            jnp.asarray(rng.random(n), jnp.float64),
            jnp.asarray(rng.random(m), jnp.float64),
            jnp.asarray(rng.random(n), jnp.float64),
        )
        deltas = solve_kkt_newton(*args, op, *rhs)
        assert bool(deltas.ok)
        res = kkt_residuals(*args, op, *rhs, deltas)
        assert float(np.asarray(res).max()) < 1e-8
