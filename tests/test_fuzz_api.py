"""Integration fuzz: random LPs end-to-end through the front door
(presolve + solve + postsolve + duals) against the HiGHS oracle.

All instances share one shape so XLA compiles the solver once and the
sweep stays fast; features exercised per instance: fixed variables
(presolve rule 2), singleton rows (rule 4 via the MPS writer's slack
rows), equality+inequality mix, finite and one-sided bounds.
"""

import dataclasses

import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps


def _highs(sf):
    from scipy.optimize import linprog

    res = linprog(sf.dense_c(), A_eq=sf.dense_A(), b_eq=sf.b,
                  bounds=list(zip(sf.l, sf.u)), method="highs")
    return res


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_random_lp_through_front_door(seed):
    rng = np.random.default_rng(100 + seed)
    ineq = random_lp(100 + seed, n_ub=20, n_eq=6, n=40, density=0.35)
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    # Fix a couple of variables so presolve always has work to do.
    k = rng.integers(0, 3)
    if k:
        idx = rng.choice(sf.nvars, size=k, replace=False)
        mid = np.clip(0.3, sf.l[idx], sf.u[idx])
        sf.l[idx] = sf.u[idx] = mid
    ref = _highs(sf)
    assert ref.status == 0, ref.message

    rep = cim.solve(sf, "pdas_dd", pad_multiple=16, max_iters=200,
                    presolve=True)
    assert rep.status in ("optimal", "precision_floor")
    assert rep.summary["gap"] < 1e-7
    assert rep.solution["objective"] == pytest.approx(ref.fun, abs=2e-5)
    # Primal feasibility of the restored full-space solution.
    x = np.concatenate([rep.solution["x"], rep.solution["slacks"]])
    assert np.abs(sf.dense_A() @ x - sf.b).max() < 2e-4
    # Dual feasibility where duals exist (NaN marks presolve-eliminated).
    y, rc = rep.solution["y"], rep.solution["reduced_costs"]
    live_r = np.isfinite(y)
    live_c = np.isfinite(rc)
    resid = sf.dense_c() - sf.dense_A().T @ np.where(live_r, y, 0.0) - np.where(live_c, rc, 0.0)
    assert np.abs(resid[live_c]).max() < 2e-4
