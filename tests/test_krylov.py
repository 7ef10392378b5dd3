"""Krylov-accelerated refinement (ops.krylov): the ill-conditioning lever.

Plain double-word refinement is Richardson iteration: it diverges once
kappa(N) * eps_f32 >~ 1 (kappa ~ 1.7e7).  The reference never sees this
wall below kappa ~ 1e16 because CHOLMOD is fp64
(sparse-cholesky.lisp:524-560); the TPU build crosses it with flexible PCG
on the f32 factor + explicit double-word residuals (Carson-Higham-style
mixed-precision iterative refinement).  These tests pin the claimed regime:

- kappa 1e6:  both methods reach ~eps_f32 relative error (parity);
- kappa 1e8:  Richardson has lost ~all accuracy, PCG still ~eps_f32;
- kappa 1e9:  the raw f32 factor FAILS; with the dbound jitter retry the
  factor succeeds and PCG converges where Richardson cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cholesky_is_magic_tpu.ops import dense as dense_ops


def _conditioned_A(kappa_n: float, m: int = 96, n: int = 192, seed: int = 0):
    """f32 A whose normal matrix A·Aᵀ has condition number ~kappa_n."""
    rng = np.random.default_rng(seed)
    U, _ = np.linalg.qr(rng.normal(size=(m, m)))
    V, _ = np.linalg.qr(rng.normal(size=(n, m)))
    sv = np.logspace(0.0, np.log10(kappa_n) / 2.0, m)
    A = jnp.asarray(U @ np.diag(sv) @ V.T, jnp.float32)
    g = jnp.asarray(rng.normal(size=m), jnp.float32)
    # Ground truth in f64 on the f32-rounded operands.
    Af = np.asarray(A, np.float64)
    x64 = np.linalg.solve(Af @ Af.T, np.asarray(g, np.float64))
    return A, g, x64


def _relerr(y, x64):
    return float(np.linalg.norm(np.asarray(y, np.float64) - x64)
                 / np.linalg.norm(x64))


class TestDensePCG:
    def test_parity_at_moderate_kappa(self):
        A, g, x64 = _conditioned_A(1e6)
        d = jnp.ones(A.shape[1], jnp.float32)
        with jax.default_matmul_precision("highest"):
            y_plain, ok1 = dense_ops.solve_normal(
                A, d, g, refine_steps=3, true_residual=True)
            y_pcg, ok2 = dense_ops.solve_normal(
                A, d, g, refine_steps=0, krylov_steps=20)
        assert bool(ok1) and bool(ok2)
        assert _relerr(y_plain, x64) < 1e-6
        assert _relerr(y_pcg, x64) < 1e-6

    def test_pcg_wins_past_the_richardson_wall(self):
        # kappa = 1e8 > 1/eps_f32: Richardson refinement has diverged,
        # PCG on the same factor still reaches ~eps_f32 forward error.
        A, g, x64 = _conditioned_A(1e8)
        d = jnp.ones(A.shape[1], jnp.float32)
        with jax.default_matmul_precision("highest"):
            y_plain, ok1 = dense_ops.solve_normal(
                A, d, g, refine_steps=3, true_residual=True)
            y_pcg, ok2 = dense_ops.solve_normal(
                A, d, g, refine_steps=0, krylov_steps=20)
        assert bool(ok1) and bool(ok2)
        assert _relerr(y_plain, x64) > 1e-3  # the wall is real
        assert _relerr(y_pcg, x64) < 1e-6

    def test_pcg_with_dbound_jitter_at_extreme_kappa(self):
        # kappa = 1e9: the raw f32 Cholesky fails (not PD in f32).  The
        # dbound retry (CHOLMOD's dbound knob) produces a jittered
        # preconditioner; PCG converges against the exact operator while
        # Richardson stays useless.
        A, g, x64 = _conditioned_A(1e9)
        d = jnp.ones(A.shape[1], jnp.float32)
        with jax.default_matmul_precision("highest"):
            _, ok_raw = dense_ops.solve_normal(A, d, g, refine_steps=0)
            y_plain, ok1 = dense_ops.solve_normal(
                A, d, g, refine_steps=3, true_residual=True, dbound=1e-6)
            y_pcg, ok2 = dense_ops.solve_normal(
                A, d, g, refine_steps=0, krylov_steps=80, dbound=1e-6)
        assert not bool(ok_raw)  # without the jitter the factor fails
        assert bool(ok1) and bool(ok2)
        assert _relerr(y_plain, x64) > 1e-1
        assert _relerr(y_pcg, x64) < 1e-5


class TestGatedEscalation:
    """ops.krylov.gated: per-call traced PCG/Richardson choice on one
    shared factor — the gap-gate seam PDASConfig.krylov_gate_gap uses."""

    def test_gate_selects_the_claimed_branch(self):
        # At kappa 1e8 the two branches are far apart in forward error, so
        # each gate value is identifiable by accuracy alone: True must
        # give the PCG answer (~eps_f32), False the diverged Richardson
        # one.  Traced gate, jitted once for both values.
        A, g, x64 = _conditioned_A(1e8)
        d = jnp.ones(A.shape[1], jnp.float32)

        # dbound arms the jitter retry: at kappa 1e8 the f32 factor's
        # success is rounding-luck (kappa*eps_f32 ~ 12) and flips under
        # jit's fused rounding; the retry makes it deterministic while
        # both refinement paths still target the exact operator.
        @jax.jit
        def run(gate):
            with jax.default_matmul_precision("highest"):
                return dense_ops.solve_normal(
                    A, d, g, refine_steps=3, true_residual=True,
                    krylov_steps=40, krylov_gate=gate, dbound=1e-6)

        y_pcg, ok1 = run(jnp.asarray(True))
        y_rich, ok2 = run(jnp.asarray(False))
        assert bool(ok1) and bool(ok2)
        # PCG through the (possibly jittered) preconditioner: ~1e-5-class
        # forward error; the diverged Richardson branch: > 1e-3.
        assert _relerr(y_pcg, x64) < 1e-5
        assert _relerr(y_rich, x64) > 1e-3

    def test_gated_pdas_dd_reaches_the_ungated_gap(self):
        """pdas_dd(krylov_steps, krylov_gate_gap>0) must reach the same
        tight gap as the ungated PCG run — the gate only re-routes
        iterations whose kappa(N) is below the Richardson wall."""
        import cholesky_is_magic_tpu as cim
        from cholesky_is_magic_tpu.ingest import to_device_lp
        from cholesky_is_magic_tpu.ingest.mps import read_mps_string
        from cholesky_is_magic_tpu.solvers import PDASConfig
        from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd
        from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

        ineq = random_lp(3, n_ub=12, n_eq=4, n=16, bounded=True)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=8, dtype=jnp.float32)
        cfg = PDASConfig(gap_tol=1e-8, max_iters=120, krylov_steps=6,
                         krylov_gate_gap=1e-4)
        res = pdas_dd(make_pdas_dd(lp), cfg)
        assert float(res.extra["gap"]) < 1e-7


class TestEnginePCG:
    def _banded_problem(self, m=256, band=6, kappa_scale=1e4, seed=1):
        import scipy.sparse as sp

        rng = np.random.default_rng(seed)
        rows, cols, vals = [], [], []
        n = 2 * m
        for i in range(m):
            for k in range(band):
                j = (2 * i + k) % n
                rows.append(i)
                cols.append(j)
                vals.append(rng.normal())
        A_host = sp.csc_matrix((vals, (rows, cols)), shape=(m, n))
        # A badly scaled d: the slack spread that drives kappa in an IPM.
        d = np.exp(rng.uniform(0, np.log(kappa_scale), size=n))
        g = rng.normal(size=m)
        return A_host, d, g

    def test_tiled_dense_krylov_matches_f64(self):
        from cholesky_is_magic_tpu.sparse.tiled import engine_for

        A_host, d, g = self._banded_problem()
        A = jnp.asarray(A_host.toarray(), jnp.float32)
        dj = jnp.asarray(d, jnp.float32)
        gj = jnp.asarray(g, jnp.float32)
        eng = engine_for(A, block=64)
        with jax.default_matmul_precision("highest"):
            y, ok = eng.solve_normal(A, dj, gj, refine_steps=0,
                                     krylov_steps=12)
        assert bool(ok)
        Af = np.asarray(A, np.float64) * np.asarray(dj, np.float64)[None, :]
        x64 = np.linalg.solve(Af @ Af.T, np.asarray(gj, np.float64))
        assert _relerr(y, x64) < 1e-5

    def test_ell_krylov_matches_f64(self):
        from cholesky_is_magic_tpu.ops import sparse_ops
        from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

        A_host, d, g = self._banded_problem()
        m, n = A_host.shape
        eng = engine_for_sparse(A_host, block=64)
        coo = A_host.tocoo()
        E = sparse_ops.from_coo(coo.row, coo.col, coo.data.astype(np.float32),
                                (m, n))
        ET = sparse_ops.from_coo(coo.col, coo.row,
                                 coo.data.astype(np.float32), (n, m))
        dj = jnp.asarray(d, jnp.float32)
        gj = jnp.asarray(g, jnp.float32)
        with jax.default_matmul_precision("highest"):
            solve_fn, ok = eng.prepare_normal_ell(
                E, ET, dj, m, refine_steps=0, krylov_steps=12)
            y = solve_fn(gj)
        assert bool(ok)
        Af = A_host.toarray().astype(np.float32).astype(np.float64)
        Af = Af * np.asarray(dj, np.float64)[None, :]
        x64 = np.linalg.solve(Af @ Af.T, np.asarray(gj, np.float64))
        assert _relerr(y, x64) < 1e-5


class TestSolverIntegration:
    def test_pdas_dd_with_krylov_reaches_tight_gap(self):
        """End-to-end: pdas_dd(krylov_steps>0) solves the fixture LP to the
        same tight gap as the default path (sanity that the PCG solve
        composes with the dd KKT elimination)."""
        import cholesky_is_magic_tpu as cim
        from cholesky_is_magic_tpu.ingest import to_device_lp
        from cholesky_is_magic_tpu.ingest.mps import read_mps_string
        from cholesky_is_magic_tpu.solvers import PDASConfig
        from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd
        from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

        ineq = random_lp(3, n_ub=12, n_eq=4, n=16, bounded=True)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=8, dtype=jnp.float32)
        cfg = PDASConfig(gap_tol=1e-8, max_iters=120, krylov_steps=6)
        res = pdas_dd(make_pdas_dd(lp), cfg)
        assert float(res.extra["gap"]) < 1e-7
