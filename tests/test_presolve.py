"""Presolve: safe reductions + exact postsolve (a capability extension
over the reference — see ingest/presolve.py)."""

import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import presolve
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.ingest.standard_form import StandardForm
from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps


def _highs_on_sf(sf):
    from scipy.optimize import linprog

    res = linprog(sf.dense_c(), A_eq=sf.dense_A(), b_eq=sf.b,
                  bounds=list(zip(sf.l, sf.u)), method="highs")
    assert res.status == 0, res.message
    return res.x, res.fun


def _sf(**kw):
    """StandardForm from explicit dense data."""
    A = np.asarray(kw["A"], dtype=np.float64)
    m, n = A.shape
    r, c = np.nonzero(A)
    return StandardForm(
        nvars=n, ncons=m, c=np.asarray(kw["c"], np.float64),
        a_rows=r.astype(np.int32), a_cols=c.astype(np.int32),
        a_vals=A[r, c], b=np.asarray(kw["b"], np.float64),
        row_type=np.zeros(m, np.int8), l=np.asarray(kw["l"], np.float64),
        u=np.asarray(kw["u"], np.float64), initial_vars=n,
    )


class TestRules:
    def test_fixed_and_singleton_chain(self):
        """A singleton row fixes x0; substituting it empties another row
        consistently; x2 survives."""
        sf = _sf(
            A=[[2.0, 0.0, 0.0],  # 2 x0 = 4 -> x0 = 2
               [1.0, 0.0, 0.0],  # becomes empty after x0 fixed: 2 = b1
               [1.0, 1.0, 1.0]],
            b=[4.0, 2.0, 6.0],
            c=[1.0, 1.0, 1.0],
            l=[0.0, 0.0, 0.0], u=[10.0, 10.0, 10.0],
        )
        red, info = presolve(sf)
        # r3: the doubleton-substitution rule (x2 = 4 - x1) plus the
        # c-fold (c1 -> 0, empty column) now solve the whole LP in
        # presolve — the optimum is degenerate (any x1 + x2 = 4 split
        # ties); check feasibility + optimality instead of one split.
        assert info.status == "solved"
        x_full = info.restore(None)
        _, f_ref = _highs_on_sf(sf)
        np.testing.assert_allclose(sf.dense_A() @ x_full, sf.b, atol=1e-9)
        assert sf.dense_c() @ x_full == pytest.approx(f_ref, abs=1e-9)
        assert x_full[0] == pytest.approx(2.0)

    def test_singleton_infeasible(self):
        sf = _sf(A=[[1.0, 0.0]], b=[50.0], c=[0.0, 0.0],
                 l=[0.0, 0.0], u=[1.0, 1.0])
        _, info = presolve(sf)
        assert info.status == "infeasible"
        assert "singleton" in info.detail

    def test_empty_row_infeasible(self):
        sf = _sf(A=[[0.0, 0.0]], b=[1.0], c=[0.0, 0.0],
                 l=[0.0, 0.0], u=[1.0, 1.0])
        _, info = presolve(sf)
        assert info.status == "infeasible"

    def test_empty_column_goes_to_bound_or_unbounded(self):
        sf = _sf(A=[[1.0, 0.0]], b=[1.0], c=[0.0, -3.0],
                 l=[0.0, -1.0], u=[2.0, 5.0])
        red, info = presolve(sf)
        # x1 only in the objective with c < 0 -> u = 5; x0 fixed by the
        # singleton row -> fully solved.
        assert info.status == "solved"
        np.testing.assert_allclose(info.restore(), [1.0, 5.0])

        sf2 = _sf(A=[[1.0, 0.0]], b=[1.0], c=[0.0, -3.0],
                  l=[0.0, -1.0], u=[2.0, np.inf])
        _, info2 = presolve(sf2)
        assert info2.status == "unbounded"

    def test_crossed_bounds_infeasible(self):
        sf = _sf(A=[[1.0]], b=[1.0], c=[1.0], l=[2.0], u=[1.0])
        _, info = presolve(sf)
        assert info.status == "infeasible"


class TestForcingRows:
    """Rule 8: row activity bounds (Andersen & Andersen forcing
    constraints) — infeasibility detection and full-support pinning with
    exact dual postsolve."""

    def test_lmax_forcing_pins_support(self):
        """x0 + x1 + x2 = 3 with all three in [0, 1] forces all to 1
        (columns appear in other rows too, so rules 6/7 cannot fire
        first)."""
        sf = _sf(
            A=[[1.0, 1.0, 1.0, 0.0],
               [1.0, 1.0, 0.0, 1.0],
               [0.0, 0.0, 1.0, 1.0]],
            b=[3.0, 2.5, 1.5],
            c=[1.0, -1.0, 2.0, 0.5],
            l=[0.0, 0.0, 0.0, 0.0], u=[1.0, 1.0, 1.0, 10.0],
        )
        red, info = presolve(sf)
        assert any(s[0] == "forcing" for s in info.steps)
        x_full = info.restore(None if info.status == "solved"
                              else _highs_on_sf(red)[0])
        np.testing.assert_allclose(x_full[:3], 1.0, atol=1e-9)
        _, f_ref = _highs_on_sf(sf)
        assert sf.dense_c() @ x_full == pytest.approx(f_ref, abs=1e-9)

    def test_lmin_forcing_with_mixed_signs(self):
        """x0 - x1 + x2 = -2 with x0, x2 in [0, 1], x1 in [0, 2]:
        Lmin = -2 = b -> pins x0 = 0, x1 = 2 (negative coefficient at
        its MAX), x2 = 0."""
        sf = _sf(
            A=[[1.0, -1.0, 1.0, 0.0],
               [1.0, 1.0, 0.0, 1.0],
               [0.0, 0.0, 1.0, 1.0]],
            b=[-2.0, 2.5, 0.5],
            c=[1.0, 1.0, 1.0, 0.2],
            l=[0.0, 0.0, 0.0, 0.0], u=[1.0, 2.0, 1.0, 10.0],
        )
        red, info = presolve(sf)
        assert any(s[0] == "forcing" for s in info.steps)
        x_full = info.restore(None if info.status == "solved"
                              else _highs_on_sf(red)[0])
        assert x_full[0] == pytest.approx(0.0, abs=1e-9)
        assert x_full[1] == pytest.approx(2.0)
        assert x_full[2] == pytest.approx(0.0, abs=1e-9)

    def test_activity_bound_infeasible(self):
        sf = _sf(
            A=[[1.0, 1.0, 1.0]],
            b=[5.0],  # max activity is 3
            c=[1.0, 1.0, 1.0],
            l=[0.0, 0.0, 0.0], u=[1.0, 1.0, 1.0],
        )
        red, info = presolve(sf)
        assert info.status == "infeasible"
        assert "activity" in info.detail

    def test_forcing_dual_postsolve_matches_highs(self):
        """The forcing row carries a NONZERO optimal dual here (pinned
        columns' reduced costs demand it); restore_duals' extreme-ratio
        rule must reproduce the HiGHS marginal, not default to 0."""
        from scipy.optimize import linprog

        import cholesky_is_magic_tpu as cim

        sf = _sf(
            A=[[1.0, 1.0, 0.0, 0.0],
               [1.0, 0.0, 1.0, 1.0],
               [0.0, 1.0, -1.0, 2.0]],
            b=[2.0, 2.5, 0.2],
            c=[-3.0, -1.0, 2.0, 0.5],
            l=[0.0, 0.0, 0.0, 0.0], u=[1.0, 1.0, 10.0, 10.0],
        )
        _red, info = presolve(sf)
        assert any(s[0] == "forcing" for s in info.steps)
        ref = linprog(sf.dense_c(), A_eq=sf.dense_A(), b_eq=sf.b,
                      bounds=list(zip(sf.l, sf.u)), method="highs")
        assert ref.status == 0
        rep = cim.solve(sf, "pdas_dd", presolve=True, pad_multiple=8,
                        max_iters=300, refine_steps=2, dtype=None)
        assert rep.objective == pytest.approx(ref.fun, rel=1e-5, abs=1e-5)
        y = rep.solution["y"]
        assert not np.any(np.isnan(y))
        np.testing.assert_allclose(y, ref.eqlin.marginals, atol=1e-3)
        # Complementarity of the restored reduced costs on the pinned
        # columns: sign-correct at the bound each sits on.
        rc = rep.solution["reduced_costs"]
        x = rep.solution["x"] if "x" in rep.solution else None
        assert rc[0] <= 1e-6 and rc[1] <= 1e-6  # pinned at upper bounds


class TestEndToEnd:
    def test_presolved_solve_matches_oracle(self):
        """Random LP augmented with fixed variables and singleton rows:
        presolve shrinks it, the solve + restore matches HiGHS on the
        ORIGINAL problem."""
        rng = np.random.default_rng(11)
        ineq = random_lp(3, n_ub=20, n_eq=6, n=40, density=0.3)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        # Fix five variables outright.
        sf.u[5:10] = sf.l[5:10] = np.round(rng.random(5), 3)
        x_ref, obj_ref = _highs_on_sf(sf)

        red, info = presolve(sf)
        assert info.status == "reduced"
        assert red.nvars < sf.nvars

        rep = cim.solve(sf, "pdas_dd", pad_multiple=16, max_iters=200,
                        presolve=True)
        assert rep.status in ("optimal", "precision_floor")
        assert "presolve" in rep.summary
        assert rep.summary["gap"] < 1e-7
        assert rep.solution["objective"] == pytest.approx(obj_ref, abs=1e-5)
        # Summary metrics are shifted back to the FULL space (the fixed
        # columns' c'x): summary must agree with the restored solution.
        assert rep.summary["objective"] == pytest.approx(
            rep.solution["standard_form_objective"], abs=1e-5
        )
        # The restored solution satisfies the ORIGINAL constraints.
        x = np.concatenate([rep.solution["x"], rep.solution["slacks"]])
        resid = np.abs(sf.dense_A() @ x - sf.b).max()
        assert resid < 1e-4

    def test_cli_presolve_flag(self, capsys, tmp_path):
        import json

        from cholesky_is_magic_tpu.__main__ import main

        mps = (
            "NAME T\nROWS\n N COST\n E R1\n L R2\n"
            "COLUMNS\n X1 COST 1.0 R1 2.0\n X2 COST 2.0 R2 1.0\n"
            " X3 COST -1.0 R2 1.0\n"
            "RHS\n RHS R1 4.0 R2 5.0\n"
            "BOUNDS\n UP BND X2 10.0\n UP BND X3 3.0\nENDATA\n"
        )
        path = str(tmp_path / "t.mps")
        with open(path, "w") as f:
            f.write(mps)
        rc = main([path, "--solver", "pdas", "--pad", "16", "--presolve",
                   "--json"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["status"] == "optimal"
        assert "presolve" in out
        # objective reported in the FULL space (X1=2 fixed by the
        # singleton row contributes +2): 2 + 0 - 3 = -1.
        assert abs(out["objective"] + 1.0) < 1e-3

    def test_presolve_detects_infeasible_through_api(self):
        sf = _sf(A=[[1.0, 0.0], [0.0, 1.0]], b=[5.0, 0.5],
                 c=[1.0, 1.0], l=[0.0, 0.0], u=[1.0, 1.0])
        rep = cim.solve(sf, "pdas", presolve=True)
        assert rep.status == "infeasible"
        assert rep.result is None


class TestSubstitutionRules:
    """Rules 6 (free column singleton) and 7 (doubleton substitution) with
    exact primal AND dual postsolve."""

    def test_free_column_singleton(self):
        # x0 free, appears only in row 0 (with x1, x2): row 0 and x0 leave.
        sf = _sf(
            A=[[2.0, 1.0, 1.0, 0.0],
               [0.0, 1.0, 1.0, 1.0],
               [0.0, 1.0, -1.0, 0.0]],
            b=[4.0, 6.0, 0.5],
            c=[0.5, 1.0, 1.0, 1.0],
            l=[-np.inf, 0.0, 0.0, 0.0], u=[np.inf, 10.0, 10.0, 10.0],
        )
        x_ref, f_ref = _highs_on_sf(sf)
        red, info = presolve(sf)
        assert info.status == "reduced"
        assert 0 not in info.kept_cols
        assert 0 not in info.kept_rows
        x_red, f_red = _highs_on_sf(red)
        x_full = info.restore(x_red)
        # Reduced objective + offset = full objective; Ax = b exactly.
        assert f_red + info.obj_offset == pytest.approx(f_ref, abs=1e-9)
        A = sf.dense_A()
        np.testing.assert_allclose(A @ x_full, sf.b, atol=1e-9)
        assert sf.dense_c() @ x_full == pytest.approx(f_ref, abs=1e-9)

    def test_doubleton_substitution_with_bound_transfer(self):
        # Row 0: 2 x0 + x1 = 8 with x0 only there (col singleton) and
        # bounded: x0 in [1, 3] -> x1 in [2, 6] intersect [0, 10].  The
        # other rows keep 3 live columns so only the one rule fires.
        sf = _sf(
            A=[[2.0, 1.0, 0.0, 0.0],
               [0.0, 1.0, 1.0, 1.0],
               [0.0, 0.0, 1.0, -1.0]],
            b=[8.0, 7.0, 1.0],
            c=[1.0, 1.0, 1.0, 0.3],
            l=[1.0, 0.0, 0.0, 0.0], u=[3.0, 10.0, 10.0, 10.0],
        )
        x_ref, f_ref = _highs_on_sf(sf)
        red, info = presolve(sf)
        assert info.status == "reduced"
        assert 0 not in info.kept_cols
        # Bounds transferred onto x1.
        j1 = list(info.kept_cols).index(1)
        assert red.l[j1] == pytest.approx(2.0)
        assert red.u[j1] == pytest.approx(6.0)
        x_red, f_red = _highs_on_sf(red)
        x_full = info.restore(x_red)
        assert f_red + info.obj_offset == pytest.approx(f_ref, abs=1e-9)
        np.testing.assert_allclose(sf.dense_A() @ x_full, sf.b, atol=1e-9)
        assert sf.dense_c() @ x_full == pytest.approx(f_ref, abs=1e-9)

    def test_doubleton_infeasible_transfer(self):
        # Transfer forces x1 into an empty interval.
        sf = _sf(
            A=[[1.0, 1.0, 0.0],
               [0.0, 1.0, 1.0]],
            b=[10.0, 1.0],
            c=[0.0, 0.0, 0.0],
            l=[0.0, 0.0, 0.0], u=[1.0, 2.0, 1.0],  # x1 >= 9 required
        )
        _, info = presolve(sf)
        assert info.status == "infeasible"

    def test_dual_postsolve_matches_highs(self):
        """End-to-end through api.solve(presolve=True): full-space duals
        (restore_duals) match HiGHS marginals, including on the
        ELIMINATED rows (previously NaN)."""
        from scipy.optimize import linprog

        import cholesky_is_magic_tpu as cim

        sf = _sf(
            A=[[2.0, 1.0, 1.0, 0.0, 0.0],
               [0.0, 1.0, 1.0, 1.0, 0.0],
               [0.0, 1.0, -1.0, 0.0, 2.0],
               [0.0, 0.0, 1.0, 0.0, 1.0]],
            b=[4.0, 6.0, 0.5, 3.0],
            c=[0.5, 1.0, 1.0, 1.0, 0.2],
            l=[-np.inf, 0.0, 0.0, 0.0, 0.0],
            u=[np.inf, 10.0, 10.0, 10.0, 10.0],
        )
        ref = linprog(sf.dense_c(), A_eq=sf.dense_A(), b_eq=sf.b,
                      bounds=list(zip(sf.l, sf.u)), method="highs")
        rep = cim.solve(sf, "pdas_dd", presolve=True, pad_multiple=8,
                        max_iters=300, refine_steps=2, dtype=None)
        assert rep.objective == pytest.approx(ref.fun, rel=1e-5, abs=1e-5)
        y = rep.solution["y"]
        assert not np.any(np.isnan(y))
        np.testing.assert_allclose(y, ref.eqlin.marginals, atol=1e-3)

    def test_dual_postsolve_binding_transferred_bound(self):
        """The r3 code-review case: the reduced solve pins x_k at a
        TRANSFERRED doubleton bound strictly inside x_k's original box.
        The defaults-only postsolve (y_i = c_j/a_ij) then leaves the
        surplus rc on the interior x_k — non-complementary duals whose
        b'y misses c'x.  The x_full-driven correction shifts it onto the
        eliminated row: here R0 (x1 + x0 = 3, x1 in [0,1] only in R0)
        transfers x0 <= 3; the optimum sits AT that bound (x1 = 0), so
        y_R0 must carry the full -1.05 (HiGHS marginal), not c_j/a = 0."""
        from scipy.optimize import linprog

        sf = _sf(
            A=[[1.0, 1.0, 0.0, 0.0],
               [1.0, 0.0, 1.0, 1.0],
               [0.0, 0.0, 1.0, -1.0]],
            b=[3.0, 6.0, 1.0],
            c=[-1.0, 0.0, 0.0, 0.1],
            l=[0.0, 0.0, 0.0, 0.0],
            u=[10.0, 1.0, 10.0, 10.0],
        )
        ref = linprog(sf.dense_c(), A_eq=sf.dense_A(), b_eq=sf.b,
                      bounds=list(zip(sf.l, sf.u)), method="highs")
        assert ref.status == 0

        # Unit level: reduced HiGHS duals through restore_duals.
        red, info = presolve(sf)
        assert info.status == "reduced"
        assert any(s[0] == "doubleton" for s in info.steps)
        res_red = linprog(red.dense_c(), A_eq=red.dense_A(), b_eq=red.b,
                          bounds=list(zip(red.l, red.u)), method="highs")
        assert res_red.status == 0
        x_full = info.restore(res_red.x)
        rc_red = red.dense_c() - red.dense_A().T @ res_red.eqlin.marginals
        y, rc = info.restore_duals(sf, res_red.eqlin.marginals, rc_red,
                                   x_full=x_full)
        np.testing.assert_allclose(y, ref.eqlin.marginals, atol=1e-8)
        # Complementarity + strong duality in the ORIGINAL space.
        z = np.maximum(rc, 0.0)
        w = np.maximum(-rc, 0.0)
        dual_obj = sf.b @ y + sf.l @ z - sf.u @ w
        assert dual_obj == pytest.approx(sf.dense_c() @ x_full, abs=1e-8)

        # End-to-end through the front door.
        rep = cim.solve(sf, "pdas_dd", presolve=True, pad_multiple=8,
                        max_iters=300, refine_steps=2, dtype=None)
        assert rep.objective == pytest.approx(ref.fun, rel=1e-6, abs=1e-6)
        np.testing.assert_allclose(rep.solution["y"], ref.eqlin.marginals,
                                   atol=1e-3)

    def test_fixpoint_chain_free_then_doubleton(self):
        """Free-col elimination exposes a doubleton, which then fires —
        the rules compose to fixpoint."""
        sf = _sf(
            A=[[1.0, 1.0, 1.0, 0.0],   # x0 free singleton -> row 0 out
               [0.0, 2.0, 0.0, 1.0],   # then doubleton: x3 singleton
               [0.0, 1.0, 1.0, 0.0]],
            b=[5.0, 8.0, 3.0],
            c=[0.0, 1.0, 2.0, 0.5],
            l=[-np.inf, 0.0, 0.0, 0.0], u=[np.inf, 4.0, 4.0, 8.0],
        )
        x_ref, f_ref = _highs_on_sf(sf)
        red, info = presolve(sf)
        # The chain runs to COMPLETION here (free-col -> doubleton ->
        # empty-col): presolve solves the LP outright.
        assert info.status == "solved"
        x_full = info.restore(None)
        np.testing.assert_allclose(sf.dense_A() @ x_full, sf.b, atol=1e-9)
        assert sf.dense_c() @ x_full == pytest.approx(f_ref, abs=1e-9)
