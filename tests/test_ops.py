"""Tests for the device linear-algebra layer (ops.dd, ops.dense, pallas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_is_magic_tpu.ops import dd as ddm
from cholesky_is_magic_tpu.ops import dense
from cholesky_is_magic_tpu.ops.pallas_chol import cholesky as pallas_cholesky


def spd_matrix(rng, n, cond=1e4, dtype=np.float32):
    """Random SPD matrix with controlled condition number."""
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return (Q * eigs) @ Q.T


class TestDoubleWord:
    def test_two_sum_exact(self):
        a = jnp.float32(1.0)
        b = jnp.float32(1e-8)
        s = ddm.two_sum(a, b)
        # 1 + 1e-8 is not representable in f32; hi+lo recovers it in f64.
        assert float(s.hi) == 1.0
        assert float(np.float64(s.hi) + np.float64(s.lo)) == pytest.approx(
            1.0 + 1e-8, rel=1e-15
        )

    def test_two_prod_exact(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=128), dtype=jnp.float32)
        b = jnp.asarray(rng.normal(size=128), dtype=jnp.float32)
        p = ddm.two_prod(a, b)
        exact = np.float64(np.asarray(a, np.float64) * np.asarray(b, np.float64))
        got = np.asarray(p.hi, np.float64) + np.asarray(p.lo, np.float64)
        np.testing.assert_allclose(got, exact, rtol=1e-14)

    def test_dd_dot_beats_f32(self):
        rng = np.random.default_rng(1)
        n = 4096
        a64 = rng.normal(size=n)
        b64 = rng.normal(size=n)
        a = jnp.asarray(a64, dtype=jnp.float32)
        b = jnp.asarray(b64, dtype=jnp.float32)
        exact = float(np.asarray(a, np.float64) @ np.asarray(b, np.float64))
        naive = float(jnp.dot(a, b))
        comp = ddm.dd_dot(a, b)
        comp_val = float(np.float64(comp.hi) + np.float64(comp.lo))
        err_naive = abs(naive - exact)
        err_comp = abs(comp_val - exact)
        assert err_comp <= max(1e-3 * err_naive, 1e-12)

    def test_dd_matvec_jit(self):
        rng = np.random.default_rng(2)
        A = jnp.asarray(rng.normal(size=(16, 33)), dtype=jnp.float32)
        x = jnp.asarray(rng.normal(size=33), dtype=jnp.float32)
        r = jax.jit(lambda A, x: ddm.dd_matvec(A, x))(A, x)
        exact = np.asarray(A, np.float64) @ np.asarray(x, np.float64)
        got = np.asarray(r.hi, np.float64) + np.asarray(r.lo, np.float64)
        np.testing.assert_allclose(got, exact, rtol=1e-12, atol=1e-12)

    def test_dd_works_in_f64(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.normal(size=64), dtype=jnp.float64)
        b = jnp.asarray(rng.normal(size=64), dtype=jnp.float64)
        p = ddm.dd_dot(a, b)
        assert np.isfinite(float(p.hi))

    def test_dd_clip_lexicographic(self):
        # A value an eps BELOW the bound (hi == l, lo < 0) must clamp to
        # exactly (l, 0); interior values pass through untouched.
        l = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
        u = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
        eps = np.float32(1e-12)
        x = ddm.DD(jnp.asarray([0.0, 0.5, 1.0], jnp.float32),
                   jnp.asarray([-eps, eps, eps], jnp.float32))
        out = ddm.dd_clip(x, l, u)
        np.testing.assert_array_equal(
            np.asarray(out.hi), np.asarray([0.0, 0.5, 1.0], np.float32))
        np.testing.assert_array_equal(
            np.asarray(out.lo), np.asarray([0.0, eps, 0.0], np.float32))


class TestDense:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
    def test_solve_spd_accuracy(self, dtype):
        rng = np.random.default_rng(4)
        n = 64
        N = jnp.asarray(spd_matrix(rng, n, cond=1e5), dtype=dtype)
        b = jnp.asarray(rng.normal(size=n), dtype=dtype)
        # The exact solution of the system *as stored* (data rounding to f32
        # costs cond*eps and is not the solver's to fix).
        x_ref = np.linalg.solve(np.asarray(N, np.float64), np.asarray(b, np.float64))
        x, ok = dense.solve_spd(N, b, refine_steps=2)
        assert bool(ok)
        err = np.linalg.norm(np.asarray(x, np.float64) - x_ref) / np.linalg.norm(x_ref)
        # With dd refinement, an f32 factorization solves the stored system
        # to ~working accuracy even at cond 1e5 (naive loses ~5 digits).
        # The f64 bound is limited by the oracle itself (numpy LU also has
        # ~cond*eps forward error).
        assert err < (1e-6 if dtype == jnp.float32 else 1e-10)

    def test_refinement_beats_naive_f32(self):
        rng = np.random.default_rng(5)
        n = 96
        N64 = spd_matrix(rng, n, cond=1e6)
        x_true = rng.normal(size=n)
        b64 = N64 @ x_true
        N = jnp.asarray(N64, dtype=jnp.float32)
        b = jnp.asarray(b64, dtype=jnp.float32)
        x0, _ = dense.solve_spd(N, b, refine_steps=0)
        x2, _ = dense.solve_spd(N, b, refine_steps=2)
        e0 = np.linalg.norm(np.asarray(x0, np.float64) - x_true)
        e2 = np.linalg.norm(np.asarray(x2, np.float64) - x_true)
        assert e2 < e0

    def test_singular_detected(self):
        N = jnp.zeros((8, 8), dtype=jnp.float32)
        x, ok = dense.solve_spd(N, jnp.ones(8, dtype=jnp.float32))
        assert not bool(ok)
        assert np.all(np.asarray(x) == 0)

    def test_normal_matrix_row_boost(self):
        rng = np.random.default_rng(6)
        A = jnp.asarray(rng.normal(size=(6, 10)), dtype=jnp.float32)
        A = A.at[4:].set(0.0)  # two padded rows
        d = jnp.asarray(rng.random(10) + 0.5, dtype=jnp.float32)
        boost = jnp.asarray([0, 0, 0, 0, 1, 1], dtype=jnp.float32)
        N = dense.normal_matrix(A, d, row_boost=boost)
        f = dense.factorize(N)
        assert bool(f.ok)
        y, ok = dense.solve_spd(N, jnp.ones(6, dtype=jnp.float32))
        assert bool(ok)

    def test_solve_normal_matches_numpy(self):
        rng = np.random.default_rng(7)
        m, n = 24, 40
        A64 = rng.normal(size=(m, n))
        d64 = rng.random(n) + 0.1
        g64 = rng.normal(size=m)
        AD = A64 * d64
        y_ref = np.linalg.solve(AD @ AD.T, g64)
        y, ok = dense.solve_normal(
            jnp.asarray(A64, jnp.float32),
            jnp.asarray(d64, jnp.float32),
            jnp.asarray(g64, jnp.float32),
            refine_steps=2,
        )
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(y, np.float64), y_ref, rtol=2e-4, atol=2e-5)

    def test_inverse_method_matches_direct(self):
        """method="inverse" (blocked Cholesky + explicit triangular
        inverse, the vmapped-batch kernel) reaches the same refined
        accuracy as the per-rhs trisolve path."""
        rng = np.random.default_rng(8)
        m, n = 24, 40
        A64 = rng.normal(size=(m, n))
        d64 = rng.random(n) + 0.1
        g64 = rng.normal(size=m)
        AD = A64 * d64
        y_ref = np.linalg.solve(AD @ AD.T, g64)
        args = (jnp.asarray(A64, jnp.float32), jnp.asarray(d64, jnp.float32),
                jnp.asarray(g64, jnp.float32))
        y_inv, ok = dense.solve_normal(*args, refine_steps=2, method="inverse")
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(y_inv, np.float64), y_ref,
                                   rtol=2e-4, atol=2e-5)
        # Singular detection survives the blocked factorization.
        z = jnp.zeros((8, 12), jnp.float32)
        _, ok = dense.solve_normal(z, jnp.ones(12, jnp.float32),
                                   jnp.ones(8, jnp.float32), method="inverse")
        assert not bool(ok)
        # And the dbound retry path composes (singular N, retry succeeds
        # only if the boost makes it PD — zero diag stays singular, so
        # drop one column to rank-deficiency instead).
        A_bad = jnp.asarray(np.vstack([A64[:4], A64[:4]]), jnp.float32)
        y_b, ok_b = dense.solve_normal(
            A_bad, jnp.asarray(d64, jnp.float32),
            jnp.ones(8, jnp.float32), refine_steps=1, dbound=1e-5,
            method="inverse",
        )
        assert bool(ok_b)
        assert np.all(np.isfinite(np.asarray(y_b)))

    def test_inverse_method_vmaps(self):
        """The batched use case: vmapped inverse-method solves match
        per-problem direct solves."""
        rng = np.random.default_rng(9)
        B, m, n = 4, 16, 24
        A = jnp.asarray(rng.normal(size=(B, m, n)), jnp.float32)
        d = jnp.asarray(rng.random((B, n)) + 0.1, jnp.float32)
        g = jnp.asarray(rng.normal(size=(B, m)), jnp.float32)

        def one(method):
            def f(Ai, di, gi):
                y, ok = dense.solve_normal(Ai, di, gi, refine_steps=2,
                                           method=method)
                return y

            return jax.vmap(f)(A, d, g)

        y_inv = np.asarray(one("inverse"), np.float64)
        y_dir = np.asarray(one("direct"), np.float64)
        np.testing.assert_allclose(y_inv, y_dir, rtol=5e-4, atol=5e-5)


class TestPallasCholesky:
    @pytest.mark.parametrize("n", [128, 256, 384])
    def test_matches_xla_cholesky(self, n):
        rng = np.random.default_rng(8)
        N = jnp.asarray(spd_matrix(rng, n, cond=1e3), dtype=jnp.float32)
        L = pallas_cholesky(N)
        L_ref = np.linalg.cholesky(np.asarray(N, np.float64))
        np.testing.assert_allclose(np.asarray(L, np.float64), L_ref, atol=2e-4)
        # Strict upper triangle is exactly zero.
        assert np.all(np.triu(np.asarray(L), 1) == 0)

    def test_non_multiple_of_block_padding(self):
        rng = np.random.default_rng(9)
        n = 200
        N = jnp.asarray(spd_matrix(rng, n, cond=10), dtype=jnp.float32)
        L = pallas_cholesky(N)
        rec = np.asarray(L, np.float64) @ np.asarray(L, np.float64).T
        np.testing.assert_allclose(rec, np.asarray(N, np.float64), atol=1e-4)

    def test_small_matrix(self):
        rng = np.random.default_rng(10)
        N = jnp.asarray(spd_matrix(rng, 8, cond=10), dtype=jnp.float32)
        L = pallas_cholesky(N)
        rec = np.asarray(L) @ np.asarray(L).T
        np.testing.assert_allclose(rec, np.asarray(N), atol=1e-5)


def test_rcond_estimate():
    rng = np.random.default_rng(11)
    N = jnp.asarray(spd_matrix(rng, 32, cond=1e6), jnp.float64)
    L = jnp.linalg.cholesky(N)
    from cholesky_is_magic_tpu.ops.dense import rcond_estimate

    r = float(rcond_estimate(L))
    # The diag-ratio estimate is within a couple orders of 1/cond.
    assert 1e-9 < r < 1e-3
