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
        assert info.status == "reduced"
        assert list(info.kept_rows) == [2]
        assert list(info.kept_cols) == [1, 2]
        x_full = info.restore([1.5, 2.5])
        np.testing.assert_allclose(x_full, [2.0, 1.5, 2.5])

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
