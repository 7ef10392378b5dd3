"""The fully sparse at-scale pipeline: SparseKKTLP + ELL products +
pair-schedule tile engine, end-to-end through pdas_dd.

No dense (m, n) operand exists anywhere on this path — the memory story
for production scales (dense A alone is 2 GB at m = 16k)."""

import jax.numpy as jnp
import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.solvers import PDASConfig
from cholesky_is_magic_tpu.solvers.pdas_dd import (
    make_pdas_dd,
    make_pdas_dd_sparse,
    pdas_dd,
)
from cholesky_is_magic_tpu.utils.testing import (
    random_lp,
    scipy_reference_solution,
    write_mps,
)


def problem(seed=2):
    ineq = random_lp(seed, n_ub=24, n_eq=6, n=32, bounded=True)
    _, fun, _ = scipy_reference_solution(ineq)
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    return sf, fun


@pytest.mark.parametrize("seed", [2, 4])
def test_sparse_pdas_dd_tight_gap(seed):
    """Fully sparse pdas_dd reaches the same tight gaps as the dense path."""
    sf, fun = problem(seed)
    st, eng = make_pdas_dd_sparse(sf, block=16, dtype=jnp.float32)
    cfg = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2)
    res = pdas_dd(st, cfg, engine=eng)
    assert float(res.extra["gap"]) < 1e-7
    assert float(res.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)


@pytest.mark.slow
def test_sparse_matches_dense_path():
    """Same LP through SparseKKTLP and the padded-dense DeviceLP: both
    reach the optimum; iterates agree to f32-trajectory tolerance."""
    sf, fun = problem(6)
    st_s, eng = make_pdas_dd_sparse(sf, block=16, dtype=jnp.float32)
    cfg = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2)
    r_sparse = pdas_dd(st_s, cfg, engine=eng)
    lp32 = to_device_lp(sf, pad_multiple=16, dtype=jnp.float32)
    r_dense = pdas_dd(make_pdas_dd(lp32), cfg)
    assert float(r_sparse.objective) == pytest.approx(
        float(r_dense.objective), rel=1e-5, abs=1e-5
    )
    n = sf.nvars
    np.testing.assert_allclose(
        np.asarray(r_sparse.x), np.asarray(r_dense.x)[:n], rtol=1e-3, atol=1e-4
    )


def test_sparse_robust_pdas_cold_start():
    """The ROBUST phase (pdas with repair/recenter) through the fully
    sparse operand set: cold start on afiro (primal-infeasible init,
    repair iterations fire), then the sparse dd finisher — a completely
    dense-free two-phase solve of a real Netlib instance."""
    import os

    from cholesky_is_magic_tpu.ops import dd as ddm
    from cholesky_is_magic_tpu.solvers import pdas
    from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse
    from cholesky_is_magic_tpu.solvers.pdas_dd import (
        PDASDDState,
        mu_recentered_duals,
    )

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    sf = cim.to_standard_form(cim.read_mps_file(os.path.join(fixtures, "afiro.mps")))
    st, eng = make_pdas_sparse(sf, block=16, dtype=jnp.float32)
    cfg = PDASConfig(max_iters=300, refine_steps=2)
    phase1 = pdas(st, cfg, engine=eng)
    assert float(phase1.residual_norm) < 1e-2  # repair reached feasibility
    w, z = mu_recentered_duals(
        phase1.x, st.lp.l, st.lp.u, phase1.extra["w"], phase1.extra["z"],
        st.lp.col_mask,
    )
    to_dd = lambda v: ddm.dd_from(jnp.asarray(v, jnp.float32))
    st2 = PDASDDState(
        x=to_dd(phase1.x), y=to_dd(phase1.extra["y"]), w=to_dd(w), z=to_dd(z),
        lp=st.lp,
    )
    res = pdas_dd(st2, PDASConfig(max_iters=300, gap_tol=1e-9, refine_steps=2),
                  engine=eng)
    assert float(res.extra["gap"]) < 1e-8
    assert float(res.objective) == pytest.approx(-464.75314285714285, rel=1e-6)


def test_cli_sparse_flag(capsys):
    import os

    from cholesky_is_magic_tpu.__main__ import main

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    rc = main([os.path.join(fixtures, "afiro.mps"), "--solver", "pdas_dd",
               "--sparse", "--block", "16", "--max-iters", "300", "--json"])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "optimal"
    assert abs(out["objective"] + 464.75314285714285) < 1e-3


def test_sparse_pipeline_on_afiro():
    """The real Netlib instance through the fully sparse path (two-phase:
    a few dense-pdas warm iterations for feasibility, then sparse dd)."""
    import os

    from cholesky_is_magic_tpu.ops import dd as ddm
    from cholesky_is_magic_tpu.solvers import make_pdas, pdas
    from cholesky_is_magic_tpu.solvers.pdas_dd import PDASDDState

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    sf = cim.to_standard_form(cim.read_mps_file(os.path.join(fixtures, "afiro.mps")))
    st_s, eng = make_pdas_dd_sparse(sf, block=16, dtype=jnp.float32)
    # Warm from the dense robust phase (repair/recenter), then finish
    # sparse.  NOTE the warm iterates come from the equilibrated dense lp;
    # both paths use the same scale-constraints equilibration.  Duals are
    # mu-recentered (the Newton-only solver's warm-start recipe).
    lp32 = to_device_lp(sf, pad_multiple=16, dtype=jnp.float32)
    phase1 = pdas(make_pdas(lp32), PDASConfig(max_iters=300, refine_steps=2))
    n, m = sf.nvars, sf.ncons
    from cholesky_is_magic_tpu.solvers.pdas_dd import mu_recentered_duals

    x = jnp.asarray(np.asarray(phase1.x)[:n], jnp.float32)
    w0 = jnp.asarray(np.asarray(phase1.extra["w"])[:n], jnp.float32)
    z0 = jnp.asarray(np.asarray(phase1.extra["z"])[:n], jnp.float32)
    w, z = mu_recentered_duals(
        x, st_s.lp.l, st_s.lp.u, w0, z0, st_s.lp.col_mask
    )
    to_dd = lambda v: ddm.dd_from(jnp.asarray(np.asarray(v), jnp.float32))
    st_warm = PDASDDState(
        x=to_dd(x),
        y=to_dd(np.asarray(phase1.extra["y"])[:m]),
        w=to_dd(w),
        z=to_dd(z),
        lp=st_s.lp,
    )
    res = pdas_dd(st_warm, PDASConfig(max_iters=300, gap_tol=1e-9, refine_steps=2),
                  engine=eng)
    assert float(res.extra["gap"]) < 1e-8
    assert float(res.objective) == pytest.approx(-464.75314285714285, rel=1e-6)


class TestSparseAffine:
    """The reference's FIRST solver family over the fully sparse operand
    set: affine_scaling(engine=...) with ELL matvecs and the pair-schedule
    tile engine (affine-scaling.lisp drives sparse CHOLMOD end-to-end; the
    dense-only affine here was the last solver family without an at-scale
    path)."""

    def test_sparse_affine_matches_oracle_and_dense(self):
        from cholesky_is_magic_tpu.solvers.affine import (
            affine_scaling,
            make_affine_state,
            make_affine_state_sparse,
        )

        sf, fun = problem(1)
        st, eng = make_affine_state_sparse(sf, block=16, dtype=jnp.float64)
        res_s = affine_scaling(st, engine=eng)
        lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float64)
        res_d = affine_scaling(make_affine_state(lp))
        assert float(res_s.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)
        # Same algebra, same trajectory: iteration counts agree.
        assert int(res_s.iterations) == int(res_d.iterations)

    def test_sparse_affine_afiro(self):
        import os

        from cholesky_is_magic_tpu.solvers.affine import (
            AffineConfig,
            affine_scaling,
            make_affine_state_sparse,
        )

        fix = os.path.join(os.path.dirname(__file__), "fixtures", "afiro.mps")
        sf = cim.to_standard_form(cim.read_mps_file(fix))
        st, eng = make_affine_state_sparse(sf, block=16, dtype=jnp.float64)
        res = affine_scaling(st, engine=eng, config=AffineConfig(max_iters=200))
        assert float(res.objective) == pytest.approx(
            -464.75314285714285, rel=1e-4
        )


class TestBatchedSparseSolves:
    def test_vmapped_ell_solves_match_singles(self):
        """Same-pattern batched normal solves (the serving primitive):
        one engine/schedule, vmapped over scale vectors; sharded over
        'dp' on the virtual mesh."""
        import scipy.sparse as sp

        from cholesky_is_magic_tpu.ops import sparse_ops
        from cholesky_is_magic_tpu.parallel import lp_mesh
        from cholesky_is_magic_tpu.parallel.batched import batched_normal_solves
        from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

        rng = np.random.default_rng(3)
        m, band = 192, 6
        n = 2 * m
        rows, cols, vals = [], [], []
        for i in range(m):
            for k in range(band):
                rows.append(i)
                cols.append((2 * i + k) % n)
                vals.append(rng.normal())
        A = sp.csc_matrix((vals, (rows, cols)), shape=(m, n))
        eng = engine_for_sparse(A, block=64)
        coo = A.tocoo()
        E = sparse_ops.from_coo(coo.row, coo.col,
                                coo.data.astype(np.float32), (m, n))
        ET = sparse_ops.from_coo(coo.col, coo.row,
                                 coo.data.astype(np.float32), (n, m))
        B = 8
        D = jnp.asarray(rng.random((B, n)) + 0.5, jnp.float32)
        G = jnp.asarray(rng.normal(size=(B, m)), jnp.float32)
        mesh = lp_mesh(dp=8, tp=1)
        Y, ok = batched_normal_solves(eng, E, ET, D, G, mesh=mesh,
                                      refine_steps=1)
        assert bool(jnp.all(ok))
        for i in range(B):
            y1, ok1 = eng.solve_normal_ell(E, ET, D[i], G[i], refine_steps=1)
            np.testing.assert_allclose(np.asarray(Y[i]), np.asarray(y1),
                                       rtol=1e-5, atol=1e-6)


class TestMeshSparsePipeline:
    """Multi-chip × at-scale composition (the r2 gap): the fully sparse
    engine's assembly pair slabs and panel-wave SYRK batches shard over
    the 'tp' mesh axis with psums on the assembled tiles and the per-panel
    Schur updates (sparse.tiled._assemble_factor_tp), wired through
    pdas/pdas_dd(engine=..., mesh=...)."""

    def _banded_engine(self, m=256, band=6, seed=0):
        import scipy.sparse as sp

        from cholesky_is_magic_tpu.ops import sparse_ops
        from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

        rng = np.random.default_rng(seed)
        n = 2 * m
        rows, cols, vals = [], [], []
        for i in range(m):
            for k in range(band):
                rows.append(i)
                cols.append((2 * i + k) % n)
                vals.append(rng.normal())
        A = sp.csc_matrix((vals, (rows, cols)), shape=(m, n))
        eng = engine_for_sparse(A, block=64)
        coo = A.tocoo()
        E = sparse_ops.from_coo(coo.row, coo.col,
                                coo.data.astype(np.float32), (m, n))
        ET = sparse_ops.from_coo(coo.col, coo.row,
                                 coo.data.astype(np.float32), (n, m))
        return eng, E, ET, m, n, rng

    def test_mesh_solve_normal_ell_matches_single_chip(self):
        from cholesky_is_magic_tpu.parallel import lp_mesh

        eng, E, ET, m, n, rng = self._banded_engine()
        d = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
        g = jnp.asarray(rng.normal(size=m), jnp.float32)
        mesh = lp_mesh(dp=1, tp=8)
        y1, ok1 = eng.solve_normal_ell(E, ET, d, g, refine_steps=1)
        y2, ok2 = eng.solve_normal_ell(E, ET, d, g, refine_steps=1, mesh=mesh)
        assert bool(ok1) and bool(ok2)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.slow
    def test_mesh_sparse_pdas_dd_end_to_end(self):
        """Fully sparse pdas_dd, every factorization tile/pair-sharded
        over 'tp': matches the single-chip solve and the HiGHS oracle at
        a tight gap."""
        from cholesky_is_magic_tpu.parallel import lp_mesh

        sf, fun = problem(2)
        cfg = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2)
        st1, eng1 = make_pdas_dd_sparse(sf, block=16, dtype=jnp.float32)
        r1 = pdas_dd(st1, cfg, engine=eng1)
        mesh = lp_mesh(dp=1, tp=8)
        st2, eng2 = make_pdas_dd_sparse(sf, block=16, dtype=jnp.float32)
        r2 = pdas_dd(st2, cfg, engine=eng2, mesh=mesh)
        assert float(r2.extra["gap"]) < 1e-7
        assert float(r2.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)
        # Same trajectory as single-chip (psum reduction order only).
        assert int(r2.iterations) == int(r1.iterations)
        assert float(r2.objective) == pytest.approx(
            float(r1.objective), rel=1e-6
        )

    def test_mesh_sparse_robust_pdas(self):
        """The ROBUST phase (repair/recenter pdas) over the sparse operand
        set with mesh=: solve_normal_backend routes the ELL branch through
        the sharded engine."""
        from cholesky_is_magic_tpu.parallel import lp_mesh
        from cholesky_is_magic_tpu.solvers import pdas
        from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse

        sf, fun = problem(4)
        cfg = PDASConfig(max_iters=300, refine_steps=2)
        st1, eng1 = make_pdas_sparse(sf, block=16, dtype=jnp.float32)
        r1 = pdas(st1, cfg, engine=eng1)
        mesh = lp_mesh(dp=1, tp=8)
        st2, eng2 = make_pdas_sparse(sf, block=16, dtype=jnp.float32)
        r2 = pdas(st2, cfg, engine=eng2, mesh=mesh)
        assert float(r2.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)
        assert int(r2.iterations) == int(r1.iterations)
