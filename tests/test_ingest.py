"""MPS reader + standard-form converter tests.

Strategy mirrors SURVEY.md §4: handcrafted fixtures with known semantics,
plus randomized round-trips checked against scipy's HiGHS oracle.
"""

import math
import os

import numpy as np
import pytest
from scipy.optimize import linprog

from cholesky_is_magic_tpu.ingest.mps import (
    post_process_mps,
    read_mps_file,
    read_mps_string,
)
from cholesky_is_magic_tpu.ingest.standard_form import (
    StandardForm,
    rescale_sf,
    to_standard_form,
)
from cholesky_is_magic_tpu.utils.testing import (
    random_lp,
    scipy_reference_solution,
    write_mps,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def solve_standard_form(sf: StandardForm):
    """Solve a standard form LP with the scipy oracle."""
    res = linprog(
        sf.dense_c(),
        A_eq=sf.dense_A(),
        b_eq=sf.b,
        bounds=list(zip(sf.l, sf.u)),
        method="highs",
    )
    return res


class TestReader:
    def test_simple_parse(self):
        mps = read_mps_file(os.path.join(FIXTURES, "simple.mps"))
        assert mps.name == "SIMPLE"
        assert mps.sense is None
        assert len(mps.row_data) == 3  # objective row is not a constraint
        assert [r.type for r in mps.row_data] == ["<=", ">=", "="]
        assert len(mps.col_data) == 3
        assert sorted(mps.obj_row) == [(0, 1.0), (1, 2.0), (2, -1.0)]
        assert len(mps.triplets) == 5
        post_process_mps(mps)
        assert mps.sense == "min"
        # LIM1 (<= 4): (-inf, 4]; LIM2 (>= 1): [1, inf); MYEQN (= 7).
        assert mps.row_data[0].lb == -math.inf and mps.row_data[0].ub == 4.0
        assert mps.row_data[1].lb == 1.0 and mps.row_data[1].ub == math.inf
        assert mps.row_data[2].lb == 7.0 and mps.row_data[2].ub == 7.0
        # X1 in [0, 4], X2 in [-1, inf), X3 in [0, inf).
        assert mps.col_data[0].lb == 0.0 and mps.col_data[0].ub == 4.0
        assert mps.col_data[1].lb == -1.0 and mps.col_data[1].ub == math.inf
        assert mps.col_data[2].lb == 0.0 and mps.col_data[2].ub == math.inf

    def test_simple_known_optimum(self):
        sf = to_standard_form(read_mps_file(os.path.join(FIXTURES, "simple.mps")))
        res = solve_standard_form(sf)
        assert res.status == 0
        # min x1 + 2 x2 - x3: x1=1 (>=1 via LIM2), x2=-1, x3=6 (=7+x2) -> -7.
        assert res.fun == pytest.approx(-7.0, abs=1e-9)

    def test_maxrange_semantics(self):
        mps = read_mps_file(os.path.join(FIXTURES, "maxrange.mps"))
        assert mps.sense == "max"
        post_process_mps(mps)
        rows = {r.name: r for r in mps.row_data}
        # CAP1: L row, rhs 10, range 4 -> [6, 10]   (read-mps.lisp:311)
        assert (rows["CAP1"].lb, rows["CAP1"].ub) == (6.0, 10.0)
        # MIN1: G row, rhs 1, no range -> [1, inf)
        assert (rows["MIN1"].lb, rows["MIN1"].ub) == (1.0, math.inf)
        # BAL: E row, rhs 2, range 1.5 > 0 -> [2, 3.5]   (read-mps.lisp:312-314)
        assert (rows["BAL"].lb, rows["BAL"].ub) == (2.0, 3.5)
        cols = {c.name: c for c in mps.col_data}
        assert (cols["A"].lb, cols["A"].ub) == (0.0, 6.0)
        assert (cols["C"].lb, cols["C"].ub) == (1.0, 1.0)
        # Fortran D exponent parsed.
        assert any(
            v == 2.0 for (j, v) in mps.obj_row if j == mps.columns["B"]
        )

    def test_negative_range_on_equality(self):
        mps = read_mps_string(
            """NAME T
ROWS
 N  O
 E  R1
COLUMNS
    X  O  1.0  R1  1.0
RHS
    S  R1  5.0
RANGES
    G  R1  -2.0
ENDATA
"""
        )
        post_process_mps(mps)
        # E row with negative range -> [rhs + range, rhs]  (read-mps.lisp:312-313)
        assert (mps.row_data[0].lb, mps.row_data[0].ub) == (3.0, 5.0)

    def test_mi_bound_reference_quirk(self):
        mps = read_mps_string(
            """NAME T
ROWS
 N  O
 G  R1
COLUMNS
    X  O  1.0  R1  1.0
RHS
    S  R1  -5.0
BOUNDS
 MI B  X
ENDATA
"""
        )
        post_process_mps(mps)
        # MI sets ub to 0 in the reference dialect (read-mps.lisp:249-253).
        assert mps.col_data[0].lb == -math.inf
        assert mps.col_data[0].ub == 0.0

    def test_duplicate_rhs_rejected(self):
        with pytest.raises(ValueError, match="duplicate RHS"):
            read_mps_string(
                """NAME T
ROWS
 N  O
 L  R1
COLUMNS
    X  O  1.0  R1  1.0
RHS
    S  R1  1.0  R1  2.0
ENDATA
"""
            )


class TestStandardForm:
    def test_slack_shapes(self):
        sf = to_standard_form(read_mps_file(os.path.join(FIXTURES, "simple.mps")))
        # 3 original vars + 1 slack for LIM1 (<=) + 1 for LIM2 (>=).
        assert sf.initial_vars == 3
        assert sf.nvars == 5
        assert sf.ncons == 3
        A = sf.dense_A()
        # <= slack has +1, >= slack has -1 (standard-form.lisp:67-78).
        assert A[0, 3] == 1.0
        assert A[1, 4] == -1.0
        assert list(sf.row_type) == [StandardForm.ROW_LE, StandardForm.ROW_GE, StandardForm.ROW_EQ]

    def test_range_row_bounded_slack(self):
        sf = to_standard_form(read_mps_file(os.path.join(FIXTURES, "maxrange.mps")))
        # CAP1 in [6, 10]: slack in [0, 4]; BAL in [2, 3.5]: slack in [0, 1.5].
        slack_bounds = list(zip(sf.l[sf.initial_vars :], sf.u[sf.initial_vars :]))
        assert (0.0, 4.0) in slack_bounds
        assert (0.0, 1.5) in slack_bounds

    def test_max_negates_objective(self):
        sf = to_standard_form(read_mps_file(os.path.join(FIXTURES, "maxrange.mps")))
        # PROFIT coefficients 3, 2, 1 negated (standard-form.lisp:95-99).
        assert sf.c[0] == -3.0 and sf.c[1] == -2.0 and sf.c[2] == -1.0

    def test_rescale_preserves_solution(self):
        sf = to_standard_form(read_mps_file(os.path.join(FIXTURES, "simple.mps")))
        base = solve_standard_form(sf)
        rescale_sf(sf)
        scaled = solve_standard_form(sf)
        assert scaled.fun == pytest.approx(base.fun, rel=1e-9)
        # Every row now has max |a_ij| == 1 (standard-form.lisp:115-126).
        A = sf.dense_A()
        assert np.max(np.abs(A), axis=1) == pytest.approx(np.ones(sf.ncons))

    @pytest.mark.parametrize("seed", range(8))
    def test_random_roundtrip_against_oracle(self, seed):
        lp = random_lp(seed, bounded=(seed % 2 == 0))
        status, fun, _ = scipy_reference_solution(lp)
        assert status == 0
        mps = read_mps_string(write_mps(lp))
        sf = to_standard_form(mps)
        res = solve_standard_form(sf)
        assert res.status == 0
        assert res.fun == pytest.approx(fun, rel=1e-8, abs=1e-8)
        # And rescaling must not change the optimum.
        res2 = solve_standard_form(rescale_sf(sf))
        assert res2.fun == pytest.approx(fun, rel=1e-8, abs=1e-8)


def test_extract_solution_roundtrip():
    from cholesky_is_magic_tpu.ingest.standard_form import extract_solution

    sf = to_standard_form(read_mps_file(os.path.join(FIXTURES, "simple.mps")))
    res = solve_standard_form(sf)
    out = extract_solution(sf, res.x)
    assert len(out["x"]) == sf.initial_vars
    assert len(out["slacks"]) == sf.nvars - sf.initial_vars
    assert out["objective"] == pytest.approx(-7.0, abs=1e-8)
    # Padded input also accepted.
    out2 = extract_solution(sf, np.concatenate([res.x, np.zeros(5)]))
    assert out2["objective"] == pytest.approx(out["objective"])


def test_extract_solution_max_sense():
    """For OBJSENSE MAX, extract_solution must report the TRUE (maximized)
    objective, not the negated standard-form one."""
    from cholesky_is_magic_tpu.ingest.standard_form import extract_solution

    sf = to_standard_form(read_mps_file(os.path.join(FIXTURES, "maxrange.mps")))
    assert sf.obj_sign == -1.0
    res = solve_standard_form(sf)
    assert res.status == 0
    out = extract_solution(sf, res.x)
    assert out["standard_form_objective"] == pytest.approx(res.fun)
    assert out["objective"] == pytest.approx(-res.fun)
    assert out["objective"] > 0  # maximizing a positive-profit LP
