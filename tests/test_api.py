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

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            cim.solve(SIMPLE, "no_such_solver")
        with pytest.raises(ValueError):
            cim.solve(SIMPLE, "alm", sparse=True)
        with pytest.raises(TypeError):
            cim.solve(12345)  # not a path/MPSData/StandardForm
