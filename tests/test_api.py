"""The library front door: api.solve end-to-end across solver families,
problem input types, and the sparse pipeline (the programmatic twin of the
CLI, which test_trace/test_sparse_pipeline cover)."""

import os

import numpy as np
import pytest

import cholesky_is_magic_tpu as cim

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
SIMPLE = os.path.join(FIXTURES, "simple.mps")
AFIRO = os.path.join(FIXTURES, "afiro.mps")


class TestSolve:
    def test_pdas_from_path(self):
        rep = cim.solve(SIMPLE, "pdas", pad_multiple=16, max_iters=80)
        assert rep.status == "optimal"
        assert rep.objective == pytest.approx(-7.0, abs=1e-3)
        assert rep.summary["gap"] < 1e-4
        # solution splits back to the original MPS variables
        assert rep.solution["x"].shape[0] == rep.sf.initial_vars

    def test_affine_from_standard_form(self):
        sf = cim.to_standard_form(cim.read_mps_file(SIMPLE))
        rep = cim.solve(sf, "affine", pad_multiple=16, max_iters=200)
        assert rep.objective == pytest.approx(-7.0, abs=1e-2)

    def test_pdas_dd_two_phase_from_mps_data(self):
        rep = cim.solve(cim.read_mps_file(SIMPLE), "pdas_dd",
                        pad_multiple=16, max_iters=120)
        assert rep.summary["gap"] < 1e-8
        assert rep.objective == pytest.approx(-7.0, abs=1e-6)

    def test_pdas_dd_entry_repair_passthrough(self):
        """entry_repair_tol reaches PDASConfig (the pre-step reports its
        pviol pair) without disturbing the solve."""
        rep = cim.solve(cim.read_mps_file(SIMPLE), "pdas_dd",
                        pad_multiple=16, max_iters=120,
                        entry_repair_tol=1e-6)
        info = rep.result.extra.get("entry_repair")
        assert info is not None
        assert float(info["pviol_after"]) <= float(info["pviol_before"])
        assert rep.summary["gap"] < 1e-8
        assert rep.objective == pytest.approx(-7.0, abs=1e-6)

    def test_gap_bound_covers_true_error_afiro(self):
        """The feasibility-adjusted certificate (summary["gap_bound"],
        api._feasibility_gap_bound): pdas can stop "optimal" at gap<1e-4
        while primal infeasibility leaves the objective ~1e-3 off the
        published optimum — the bound must cover that true error, and
        must NOT cry wolf on the tight pdas_dd flow."""
        opt = -464.75314285714285  # afiro published optimum
        rep = cim.solve(AFIRO, "pdas", max_iters=200)
        bound = rep.summary["gap_bound"]
        true_rel = abs(rep.objective - opt) / (1.0 + abs(opt))
        assert bound >= rep.summary["gap"]
        assert bound >= true_rel * 0.99  # the hole the bound closes
        # Tight flow: bound stays consistent with an actually-tight solve.
        rep2 = cim.solve(AFIRO, "pdas_dd", max_iters=200)
        true_rel2 = abs(rep2.objective - opt) / (1.0 + abs(opt))
        assert rep2.summary["gap_bound"] >= true_rel2 * 0.99
        assert rep2.summary["gap_bound"] < 1e-5

    @pytest.mark.slow
    def test_sparse_pipeline_afiro(self):
        rep = cim.solve(AFIRO, "pdas_dd", sparse=True, block=16,
                        max_iters=300)
        assert rep.status == "optimal"
        assert rep.objective == pytest.approx(-464.75314285714285, rel=1e-5)

    def test_alm_and_selfdual(self):
        rep = cim.solve(SIMPLE, "alm", pad_multiple=16, max_iters=300)
        assert rep.summary["value"] == pytest.approx(-7.0, abs=1e-2)
        rep2 = cim.solve(SIMPLE, "selfdual", pad_multiple=16)
        assert rep2.summary["objective"] == pytest.approx(-7.0, abs=1e-2)
        rep3 = cim.solve(SIMPLE, "aalm", pad_multiple=16, max_iters=60)
        assert rep3.summary["value"] == pytest.approx(-7.0, abs=5e-2)

    @pytest.mark.slow
    def test_duals_match_highs_marginals(self):
        """Row duals (unscaled back through the equilibration) and reduced
        costs match scipy/HiGHS's eqlin.marginals convention, and satisfy
        the dual-feasibility identity c - A'y = rc."""
        import numpy as np
        from scipy.optimize import linprog

        from cholesky_is_magic_tpu.ingest.mps import read_mps_string
        from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

        ineq = random_lp(2, n_ub=10, n_eq=4, n=20, density=0.5)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        ref = linprog(sf.dense_c(), A_eq=sf.dense_A(), b_eq=sf.b,
                      bounds=list(zip(sf.l, sf.u)), method="highs")
        rep = cim.solve(sf, "pdas_dd", pad_multiple=16, max_iters=200)
        assert rep.summary["gap"] < 1e-8
        y, rc = rep.solution["y"], rep.solution["reduced_costs"]
        np.testing.assert_allclose(y, ref.eqlin.marginals, atol=1e-5)
        err = np.abs(sf.dense_c() - sf.dense_A().T @ y - rc).max()
        assert err < 1e-5

    def test_duals_with_presolve_mark_eliminated_rows(self):
        import numpy as np

        from cholesky_is_magic_tpu.ingest.mps import read_mps_string
        from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

        ineq = random_lp(4, n_ub=10, n_eq=4, n=20, density=0.5)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        sf.u[3:6] = sf.l[3:6]  # fixed columns -> eliminated
        rep = cim.solve(sf, "pdas", pad_multiple=16, max_iters=200,
                        presolve=True)
        y, rc = rep.solution["y"], rep.solution["reduced_costs"]
        assert y.shape[0] == sf.ncons and rc.shape[0] == sf.nvars
        # r3 (restore_duals): eliminated entries are now COMPUTED, not
        # NaN — full finite dual vectors, with the eliminated columns'
        # reduced costs equal to c - A'y from the original data.
        assert np.isfinite(y).all() and np.isfinite(rc).all()
        A = sf.dense_A()
        np.testing.assert_allclose(
            rc[3:6], (sf.dense_c() - A.T @ y)[3:6], atol=1e-5
        )

    @pytest.mark.slow
    def test_solve_batch_heterogeneous(self):
        """Different-sized LPs embedded into one common box, solved as one
        vmapped computation, each matching its own single solve; sharded
        over 'dp' on the virtual mesh."""
        import numpy as np

        from cholesky_is_magic_tpu.ingest.mps import read_mps_string
        from cholesky_is_magic_tpu.parallel import lp_mesh
        from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

        sfs = []
        for seed, (n_ub, n_eq, n) in enumerate(
            [(10, 4, 20), (14, 2, 26), (8, 6, 18), (12, 4, 24)] * 2
        ):
            ineq = random_lp(40 + seed, n_ub=n_ub, n_eq=n_eq, n=n,
                             density=0.5)
            sfs.append(cim.to_standard_form(read_mps_string(write_mps(ineq))))
        reports = cim.solve_batch(sfs, pad_multiple=16, max_iters=120,
                                  mesh=lp_mesh(dp=8, tp=1))
        assert len(reports) == 8
        for sf, rep in zip(sfs, reports):
            assert rep.status == "optimal", rep.summary
            single = cim.solve(sf, "pdas", pad_multiple=16, max_iters=120)
            # Both stop at relative gap 1e-4: objectives agree to that
            # tolerance, not to machine precision (the batched and single
            # constructions round differently and stop at different
            # near-optimal iterates).
            tol = 2e-4 * max(1.0, abs(single.objective)) + 1e-4
            assert abs(rep.objective - single.objective) < tol
            np.testing.assert_allclose(rep.solution["y"],
                                       single.solution["y"], atol=1e-2)

    def test_solve_batch_warm_restart(self):
        """Batch warm re-solve: the same problem list restarted from its
        prior reports converges in far fewer iterations; a box-mismatched
        warm list is rejected."""
        import numpy as np

        from cholesky_is_magic_tpu.ingest.mps import read_mps_string
        from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

        sfs = []
        for seed in range(4):
            ineq = random_lp(60 + seed, n_ub=8, n_eq=2, n=12)
            sfs.append(cim.to_standard_form(read_mps_string(write_mps(ineq))))
        cold = cim.solve_batch(sfs, pad_multiple=16, max_iters=200)
        assert all(r.status == "optimal" for r in cold)
        warm = cim.solve_batch(sfs, pad_multiple=16, max_iters=200,
                               warm=cold, warm_push=1e-3)
        assert all(r.status == "optimal" for r in warm)
        it_cold = sum(r.summary["iterations"] for r in cold)
        it_warm = sum(r.summary["iterations"] for r in warm)
        assert it_warm < 0.7 * it_cold, (it_warm, it_cold)
        for c, w in zip(cold, warm):
            tol = 2e-4 * max(1.0, abs(c.objective)) + 1e-4
            assert abs(w.objective - c.objective) < tol
        with pytest.raises(ValueError, match="padded box|reports"):
            cim.solve_batch(sfs, pad_multiple=32, max_iters=50, warm=cold)

    def test_solve_batch_embed_cache(self):
        """A pre-embedded batch (api.embed_batch) solves identically to
        the direct problem-list path — the embed handle only skips the
        host build + stacked transfer, never changes operands."""
        from cholesky_is_magic_tpu.api import embed_batch
        from cholesky_is_magic_tpu.ingest.mps import read_mps_string
        from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

        sfs = []
        for seed in range(4):
            ineq = random_lp(80 + seed, n_ub=8, n_eq=2, n=12)
            sfs.append(cim.to_standard_form(read_mps_string(write_mps(ineq))))
        direct = cim.solve_batch(sfs, pad_multiple=16, max_iters=200)
        emb = embed_batch(sfs, pad_multiple=16)
        cached = cim.solve_batch(emb, max_iters=200)
        recached = cim.solve_batch(emb, max_iters=200)  # handle reusable
        assert all(r.status == "optimal" for r in cached)
        for a, b, c in zip(direct, cached, recached):
            # Bit-identical path: same embedded operands, same program.
            assert a.objective == b.objective == c.objective, (
                a.summary, b.summary)
            assert a.summary["iterations"] == b.summary["iterations"]
        # embed_batch composes with warm restarts (the serving loop).
        warm = cim.solve_batch(emb, max_iters=200, warm=cached,
                               warm_push=1e-3)
        assert all(r.status == "optimal" for r in warm)
        assert (sum(r.summary["iterations"] for r in warm)
                < sum(r.summary["iterations"] for r in cached))

    @pytest.mark.slow
    def test_warm_resolve_through_api(self):
        """The serving flow at the front door: warm=prev report skips
        phase 1 and converges in fewer finisher iterations than cold on a
        perturbed instance."""
        import dataclasses

        import numpy as np

        from cholesky_is_magic_tpu.ingest.mps import read_mps_string
        from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

        rng = np.random.default_rng(9)
        ineq = random_lp(6, n_ub=24, n_eq=8, n=48, density=0.3)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        cold = cim.solve(sf, "pdas_dd", pad_multiple=16, max_iters=200)
        assert cold.summary["gap"] < 1e-8

        sf2 = dataclasses.replace(
            sf, c=sf.c * (1.0 + 0.02 * rng.standard_normal(sf.c.shape))
        )
        warm = cim.solve(sf2, "pdas_dd", pad_multiple=16, max_iters=200,
                         warm=cold, warm_push=1e-2)
        cold2 = cim.solve(sf2, "pdas_dd", pad_multiple=16, max_iters=200)
        assert warm.summary["gap"] < 1e-8
        assert warm.summary["phase1_iterations"] == 0
        total_warm = warm.summary["iterations"]
        total_cold = (cold2.summary["iterations"]
                      + cold2.summary["phase1_iterations"])
        assert total_warm < total_cold

    @pytest.mark.slow
    def test_krylov_escalation_path_runs(self):
        """An unreachable gap target drives the finisher to its precision
        floor and through the PCG auto-escalation branch; the solve still
        returns a tight gap."""
        rep = cim.solve(SIMPLE, "pdas_dd", pad_multiple=16, max_iters=120,
                        gap_tol=0.0)
        assert rep.status == "precision_floor"
        assert rep.summary["gap"] < 1e-8

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            cim.solve(SIMPLE, "no_such_solver")
        with pytest.raises(ValueError):
            cim.solve(SIMPLE, "alm", sparse=True)
        with pytest.raises(TypeError):
            cim.solve(12345)  # not a path/MPSData/StandardForm
        with pytest.raises(ValueError):
            cim.solve(SIMPLE, "alm", warm=object())
        rep = cim.solve(SIMPLE, "pdas", pad_multiple=16)
        with pytest.raises(ValueError):
            cim.solve(SIMPLE, "pdas", warm=rep, presolve=True)
