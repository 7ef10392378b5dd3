"""Randomized KKT residual sweep, mirroring the reference's self-tests
(sparse-newton-solve.lisp:239-269 test/test-m-n; newton-solve.lisp:202-211)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_is_magic_tpu.kkt import (
    dense_kkt_operator,
    kkt_residuals,
    solve_kkt_newton,
)
from cholesky_is_magic_tpu.kkt.newton import solve_kkt_newton_checked


def random_positive(rng, n):
    # random-positive-vector (newton-solve.lisp:184): 0.1 + 10*U[0,1).
    return 0.1 + 10.0 * rng.random(n)


def random_sparse_matrix(rng, m, n, density=0.05):
    # random-sparse-vector (sparse-newton-solve.lisp:228-237): ~5% density
    # with a guaranteed diagonal in [1, 2).
    A = np.where(rng.random((m, n)) < density, 1.0 + rng.random((m, n)), 0.0)
    d = min(m, n)
    A[np.arange(d), np.arange(d)] = 1.0 + rng.random(d)
    return A


def run_case(rng, m, n, dtype, refine_steps=2):
    A = jnp.asarray(random_sparse_matrix(rng, m, n), dtype=dtype)
    args = dict(
        sl=jnp.asarray(random_positive(rng, n), dtype=dtype),
        su=jnp.asarray(random_positive(rng, n), dtype=dtype),
        w=jnp.asarray(random_positive(rng, n), dtype=dtype),
        z=jnp.asarray(random_positive(rng, n), dtype=dtype),
        e=jnp.asarray(rng.random(n), dtype=dtype),
        f=jnp.asarray(rng.random(n), dtype=dtype),
        g=jnp.asarray(rng.random(m), dtype=dtype),
        h=jnp.asarray(rng.random(n), dtype=dtype),
    )
    op = dense_kkt_operator(A, refine_steps=refine_steps)
    deltas = solve_kkt_newton(args["sl"], args["su"], args["w"], args["z"], op,
                              args["e"], args["f"], args["g"], args["h"])
    res = kkt_residuals(args["sl"], args["su"], args["w"], args["z"], op,
                        args["e"], args["f"], args["g"], args["h"], deltas)
    return deltas, np.asarray(res)


class TestKKTSweep:
    def test_sweep_f64(self):
        # The reference sweeps 1 <= m <= n <= max with 10 reps, flagging
        # residuals > 1e-6 (sparse-newton-solve.lisp:260-269).
        rng = np.random.default_rng(0)
        worst = 0.0
        for m in (1, 3, 7, 16):
            for n in (m, m + 5, 2 * m + 3):
                for _ in range(3):
                    deltas, res = run_case(rng, m, n, jnp.float64)
                    assert bool(deltas.ok)
                    worst = max(worst, res.max())
        assert worst < 1e-6

    def test_sweep_f32_with_refinement(self):
        rng = np.random.default_rng(1)
        worst = 0.0
        for m, n in ((4, 9), (16, 33), (32, 64)):
            deltas, res = run_case(rng, m, n, jnp.float32)
            assert bool(deltas.ok)
            worst = max(worst, res.max())
        # f32 working precision with dd-refined normal solves: the checked
        # production bound is 1e-4 (solve-kkt-newton-check).
        assert worst < 1e-4

    def test_filter_threshold_huge_slack(self):
        # A variable with slack > 1e7 has that bound treated as absent
        # (filter-U/filter-Z): deltas still solve the *filtered* system and
        # remain finite.
        rng = np.random.default_rng(2)
        n, m = 6, 4
        dtype = jnp.float64
        A = jnp.asarray(random_sparse_matrix(rng, m, n, density=0.5), dtype=dtype)
        sl = jnp.asarray(random_positive(rng, n), dtype=dtype)
        su = jnp.asarray(random_positive(rng, n), dtype=dtype).at[0].set(1e9)
        w = jnp.asarray(random_positive(rng, n), dtype=dtype)
        z = jnp.asarray(random_positive(rng, n), dtype=dtype)
        e, f, h = (jnp.asarray(rng.random(n), dtype=dtype) for _ in range(3))
        g = jnp.asarray(rng.random(m), dtype=dtype)
        op = dense_kkt_operator(A)
        deltas = solve_kkt_newton(sl, su, w, z, op, e, f, g, h)
        assert bool(deltas.ok)
        assert np.all(np.isfinite(np.asarray(deltas.dw)))
        # The filtered row reads dw = e' where e' = w (dw equals the old w
        # times scaling 1 plus w*dx contribution): residuals of the other
        # three blocks still hold.
        res = kkt_residuals(sl, su, w, z, op, e, f, g, h, deltas)
        assert np.asarray(res)[1:].max() < 1e-8

    def test_padded_entries_stay_zero(self):
        # Sanitized padding (sl=su=w=z=1, e=f=h=0 on padded vars, g=0 on
        # padded rows) must produce exactly zero deltas there.
        rng = np.random.default_rng(3)
        m, n, mp, np_ = 4, 6, 2, 3  # real sizes m,n; padding mp rows, np_ cols
        dtype = jnp.float64
        A_real = random_sparse_matrix(rng, m, n, density=0.5)
        A = np.zeros((m + mp, n + np_))
        A[:m, :n] = A_real
        A = jnp.asarray(A, dtype=dtype)
        ones = np.ones(n + np_)
        pad = lambda v: np.concatenate([v, np.zeros(np_)])
        sl = jnp.asarray(np.concatenate([random_positive(rng, n), np.ones(np_)]), dtype)
        su = jnp.asarray(np.concatenate([random_positive(rng, n), np.ones(np_)]), dtype)
        w = jnp.asarray(np.concatenate([random_positive(rng, n), np.ones(np_)]), dtype)
        z = jnp.asarray(np.concatenate([random_positive(rng, n), np.ones(np_)]), dtype)
        e = jnp.asarray(pad(rng.random(n)), dtype)
        f = jnp.asarray(pad(rng.random(n)), dtype)
        h = jnp.asarray(pad(rng.random(n)), dtype)
        g = jnp.asarray(np.concatenate([rng.random(m), np.zeros(mp)]), dtype)
        boost = jnp.asarray(np.concatenate([np.zeros(m), np.ones(mp)]), dtype)
        op = dense_kkt_operator(A, row_boost=boost)
        deltas = solve_kkt_newton(sl, su, w, z, op, e, f, g, h)
        assert bool(deltas.ok)
        np.testing.assert_array_equal(np.asarray(deltas.dx)[n:], 0.0)
        np.testing.assert_array_equal(np.asarray(deltas.dw)[n:], 0.0)
        np.testing.assert_array_equal(np.asarray(deltas.dz)[n:], 0.0)
        np.testing.assert_array_equal(np.asarray(deltas.dy)[m:], 0.0)
        # And the real sub-block still satisfies the KKT equations.
        res = kkt_residuals(sl, su, w, z, op, e, f, g, h, deltas)
        assert np.asarray(res).max() < 1e-8

    def test_checked_variant_flags_failure(self):
        # A singular A (zero matrix) must be reported via ok=False, the
        # jit-rendering of solve-sparse returning nil (" singular ").
        n, m = 5, 3
        dtype = jnp.float64
        A = jnp.zeros((m, n), dtype=dtype)
        one = jnp.ones(n, dtype=dtype)
        deltas, res = solve_kkt_newton_checked(
            one, one, one, one, dense_kkt_operator(A),
            one, one, jnp.ones(m, dtype=dtype), one,
        )
        assert not bool(deltas.ok)
