"""Crossover (solvers/crossover.py): certified vertex polish.

A capability extension over the reference (which stops at its interior
gap, primal-dual-affine-scaling.lisp:394): one extra normal-equations
factorization + dd iterative refinement turns a loose 1e-4-gap pdas
iterate into a certified ~1e-12-class solution.  The certificate itself
is under test: `certified` must imply oracle-level accuracy, and a bad
active-set guess must fail the certificate and leave the result
untouched.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.solvers import (
    CrossoverConfig,
    PDASConfig,
    Status,
    classify_basis,
    crossover,
    make_pdas,
    pdas,
)
from cholesky_is_magic_tpu.utils.testing import (
    random_lp,
    scipy_reference_solution,
    write_mps,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _solved_pair(seed, dtype=jnp.float32, pad=32):
    ineq = random_lp(seed, n_ub=10, n_eq=3, n=12)
    status, fun, _ = scipy_reference_solution(ineq)
    assert status == 0
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    lp = to_device_lp(sf, pad_multiple=pad, dtype=dtype)
    return lp, fun


class TestClassify:
    def test_free_and_padded_columns_are_basic(self):
        x = jnp.asarray([0.5, 1e8 - 1.0, 0.0, 0.0])
        z = jnp.asarray([0.0, 0.0, 5.0, 0.0])
        w = jnp.zeros(4)
        l = jnp.asarray([0.0, -1e8, 0.0, -1.0])
        u = jnp.asarray([1.0, 1e8, 1.0, 1.0])
        mask = jnp.asarray([True, True, True, False])
        basic, at_lower, at_upper = classify_basis(x, z, w, l, u, mask)
        assert bool(basic[0])  # interior, no dual
        assert bool(basic[1])  # free column: always basic
        assert bool(at_lower[2])  # jammed on l with a large dual
        assert bool(basic[3])  # padded: basic (snapping to [-1,1] is wrong)

    def test_one_sided_bounds_never_snap_to_clamp(self):
        # Only-lower column at its bound -> at_lower; only-upper -> at_upper.
        x = jnp.asarray([0.0, 1.0])
        z = jnp.asarray([3.0, 0.0])
        w = jnp.asarray([0.0, 3.0])
        l = jnp.asarray([0.0, -1e8])
        u = jnp.asarray([1e8, 1.0])
        mask = jnp.asarray([True, True])
        basic, at_lower, at_upper = classify_basis(x, z, w, l, u, mask)
        assert bool(at_lower[0]) and not bool(at_upper[0])
        assert bool(at_upper[1]) and not bool(at_lower[1])


class TestCrossoverDense:
    @pytest.mark.slow
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_certified_from_loose_pdas_gap(self, seed):
        """pdas stopped at the reference's loose 1e-4 gap + crossover must
        certify and land within the f32-operand floor of the f64 oracle."""
        lp, fun = _solved_pair(seed)
        res = pdas(make_pdas(lp), PDASConfig(gap_tol=1e-4))
        out = crossover(res, lp)
        cert = out.extra["crossover"]
        assert cert["certified"], cert
        # Internal certificate (vs the f32 device operands): dd-floor class.
        assert float(cert["gap"]) < 1e-10
        assert float(cert["primal_rel"]) < 1e-10
        assert float(cert["dual_rel"]) < 1e-10
        # vs the f64 oracle: limited only by f32 rounding of A, b, c.
        assert float(out.objective) == pytest.approx(fun, rel=2e-6, abs=2e-6)
        assert int(out.status) == Status.OPTIMAL

    def test_polish_beats_the_ipm_iterate(self):
        lp, fun = _solved_pair(7)
        res = pdas(make_pdas(lp), PDASConfig(gap_tol=1e-4))
        out = crossover(res, lp)
        err_ipm = abs(float(res.objective) - fun)
        err_xo = abs(float(out.objective) - fun)
        assert out.extra["crossover"]["certified"]
        assert err_xo < err_ipm

    def test_failed_certificate_returns_original(self):
        """An iterate far from the optimum reads a wrong active set; the
        certificate must fail and the result must pass through unchanged."""
        lp, _ = _solved_pair(0)
        res = pdas(make_pdas(lp), PDASConfig(max_iters=2))
        out = crossover(res, lp)
        cert = out.extra["crossover"]
        if cert["certified"]:
            pytest.skip("2-iteration iterate already readable on this seed")
        np.testing.assert_array_equal(np.asarray(out.x), np.asarray(res.x))
        assert float(out.objective) == float(res.objective)
        assert int(out.status) == int(res.status)

    @pytest.mark.slow
    def test_x64_reaches_dd_of_f64_floor(self):
        lp, fun = _solved_pair(5, dtype=jnp.float64)
        res = pdas(make_pdas(lp), PDASConfig(gap_tol=1e-4))
        out = crossover(res, lp)
        cert = out.extra["crossover"]
        assert cert["certified"]
        assert float(out.objective) == pytest.approx(fun, rel=1e-10, abs=1e-10)


class TestCrossoverApi:
    def test_front_door_pdas(self):
        ineq = random_lp(11, n_ub=10, n_eq=3, n=12)
        status, fun, _ = scipy_reference_solution(ineq)
        assert status == 0
        rep = cim.solve(read_mps_string(write_mps(ineq)), solver="pdas",
                        crossover=True, pad_multiple=32)
        assert rep.summary["crossover"]["certified"]
        assert rep.summary["status"] == "optimal"
        assert rep.objective == pytest.approx(fun, rel=2e-6, abs=2e-6)

    @pytest.mark.slow
    def test_front_door_duals_match_highs_after_polish(self):
        """_duals() must keep working on the polished result: the crossover
        y is certified against the solver's equilibrated lp, so the
        existing unscale + sign conventions apply unchanged."""
        from scipy.optimize import linprog

        ineq = random_lp(3, n_ub=8, n_eq=3, n=10)
        ref = linprog(ineq.c, A_ub=ineq.A_ub, b_ub=ineq.b_ub,
                      A_eq=ineq.A_eq, b_eq=ineq.b_eq,
                      bounds=list(zip(ineq.l, ineq.u)), method="highs")
        assert ref.status == 0
        rep = cim.solve(read_mps_string(write_mps(ineq)), solver="pdas",
                        crossover=True, pad_multiple=32)
        assert rep.summary["crossover"]["certified"]
        marg = np.concatenate([ref.ineqlin.marginals, ref.eqlin.marginals])
        np.testing.assert_allclose(rep.solution["y"], marg,
                                   rtol=1e-3, atol=1e-4)

    @pytest.mark.slow
    def test_front_door_sparse_engine_path(self):
        ineq = random_lp(13, n_ub=12, n_eq=4, n=14)
        status, fun, _ = scipy_reference_solution(ineq)
        assert status == 0
        rep = cim.solve(read_mps_string(write_mps(ineq)), solver="pdas",
                        sparse=True, crossover=True, block=8)
        assert rep.summary["crossover"]["certified"]
        assert rep.objective == pytest.approx(fun, rel=2e-6, abs=2e-6)

    def test_rejected_for_non_ipm_solvers(self):
        ineq = random_lp(0)
        with pytest.raises(ValueError, match="crossover"):
            cim.solve(read_mps_string(write_mps(ineq)), solver="alm",
                      crossover=True)


class TestWidenRepair:
    """Widen-repair (CrossoverConfig.widen_dual_tol): the degenerate
    failure where the snap fixes a borderline column to a bound the
    optimal face does not pin — the completion's primal residual then
    has a component outside range(B) that no refinement removes.  The
    repair returns zero-dual bound-active columns to the basis and
    re-solves (one extra factorization).  Crafted trigger: x2 is the
    only column in row 3 (x2 = 5e-4 pinned strictly interior), the
    iterate carries a 2e-3 dual on it, so classify_basis snaps it to
    its lower bound and rows 1-3 become inconsistent for {x1, x3}."""

    MPS = """NAME          WIDEN
ROWS
 N  COST
 E  R1
 E  R2
 E  R3
COLUMNS
    X1        COST      1.0        R1        1.0
    X2        COST      2.0        R1        1.0
    X2        R2        1.0        R3        1.0
    X3        COST      1.0        R2        1.0
RHS
    RHS       R1        1.0005     R2        1.0005
    RHS       R3        0.0005
BOUNDS
 UP BND       X1        2.0
 UP BND       X2        2.0
 UP BND       X3        2.0
ENDATA
"""

    def _adversarial_result(self, lp):
        """The unique optimum is x* = (1, 5e-4, 1) with y* = (1, 1, 0)
        and all-interior columns (rc* = 0).  The iterate is AT x* but
        carries a stale 2e-3 dual on x2 (as a sqrt(gap)-sized IPM dual
        would): smin = 5e-4 < theta * 2e-3 misreads x2 as at_lower."""
        from cholesky_is_magic_tpu.solvers.result import SolveResult

        d = 5e-4
        n_pad = lp.A.shape[1]
        m_pad = lp.A.shape[0]
        x = jnp.asarray(np.pad([1.0, d, 1.0], (0, n_pad - 3)), jnp.float32)
        y = jnp.asarray(np.pad([1.0, 1.0, 0.0], (0, m_pad - 3)), jnp.float32)
        z = jnp.asarray(np.pad([0.0, 2e-3, 0.0], (0, n_pad - 3)), jnp.float32)
        return SolveResult(
            x=x, objective=jnp.vdot(lp.c, x),
            status=jnp.asarray(Status.OPTIMAL, jnp.int32),
            iterations=jnp.asarray(10, jnp.int32),
            residual_norm=jnp.asarray(0.0),
            extra={"y": y, "w": jnp.zeros(n_pad, jnp.float32), "z": z,
                   "gap": jnp.asarray(1e-6)},
        )

    @pytest.mark.slow
    def test_snap_alone_fails_on_primal(self):
        """With the widen pass disabled the misread is fatal: primal_rel
        floors at ~2.5e-4 (the 5e-4 row-3 residual, unreachable by
        {x1, x3}), there is no bound violation to repair, and the
        original iterate passes through unchanged."""
        sf = cim.to_standard_form(read_mps_string(self.MPS))
        lp = to_device_lp(sf, pad_multiple=4, dtype=jnp.float32)
        res = self._adversarial_result(lp)
        out = crossover(res, lp, config=CrossoverConfig(widen_dual_tol=0.0))
        cert = out.extra["crossover"]
        assert not cert["certified"]
        assert float(cert["primal_rel"]) > 1e-4
        assert cert["widened"] == 0
        np.testing.assert_array_equal(np.asarray(out.x), np.asarray(res.x))

    def test_widen_recovers_the_degenerate_face(self):
        sf = cim.to_standard_form(read_mps_string(self.MPS))
        lp = to_device_lp(sf, pad_multiple=4, dtype=jnp.float32)
        res = self._adversarial_result(lp)
        out = crossover(res, lp)
        cert = out.extra["crossover"]
        assert cert["certified"], cert
        assert cert["widened"] == 1
        assert cert["repairs"] >= 1
        assert float(cert["primal_rel"]) < 1e-10
        assert float(cert["gap"]) < 1e-10
        assert float(out.objective) == pytest.approx(2.001, rel=1e-6)
        # x2 must be back at its strictly-interior pinned value.
        assert float(out.x[1]) == pytest.approx(5e-4, rel=1e-3)


class TestDemoteRepair:
    """Dual-snap demotion (CrossoverConfig.demote_near_tol): the inverse
    misread of the widen case — a column the optimal face pins AT a
    bound, but the iterate stopped ~sqrt(gap) short of it with a
    not-yet-grown dual, so classify_basis reads it as basic.  The dual
    least-squares then cannot zero its reduced cost (rc* = 1 here), the
    certificate fails on dual_rel, and the repair demotes the near-bound
    large-rc column to its near bound and re-solves.  Crafted trigger:
    min x1 + 2 x2 on x1 + x2 = 1.0002, x in [0, 2]^2 — optimum
    (1.0002, 0) with y* = 1, rc* = (0, 1); the iterate (1.0, 2e-4)
    carries z2 = 1e-5 so smin = 2e-4 > theta * 1e-5 reads x2 basic."""

    MPS = """NAME          DEMOTE
ROWS
 N  COST
 E  R1
COLUMNS
    X1        COST      1.0        R1        1.0
    X2        COST      2.0        R1        1.0
RHS
    RHS       R1        1.0002
BOUNDS
 UP BND       X1        2.0
 UP BND       X2        2.0
ENDATA
"""

    def _adversarial_result(self, lp):
        from cholesky_is_magic_tpu.solvers.result import SolveResult

        n_pad = lp.A.shape[1]
        m_pad = lp.A.shape[0]
        x = jnp.asarray(np.pad([1.0, 2e-4], (0, n_pad - 2)), jnp.float32)
        y = jnp.asarray(np.pad([1.0], (0, m_pad - 1)), jnp.float32)
        z = jnp.asarray(np.pad([0.0, 1e-5], (0, n_pad - 2)), jnp.float32)
        return SolveResult(
            x=x, objective=jnp.vdot(lp.c, x),
            status=jnp.asarray(Status.OPTIMAL, jnp.int32),
            iterations=jnp.asarray(10, jnp.int32),
            residual_norm=jnp.asarray(0.0),
            extra={"y": y, "w": jnp.zeros(n_pad, jnp.float32), "z": z,
                   "gap": jnp.asarray(1e-6)},
        )

    def _lp(self):
        sf = cim.to_standard_form(read_mps_string(self.MPS))
        return to_device_lp(sf, pad_multiple=4, dtype=jnp.float32)

    @pytest.mark.slow
    def test_without_demotion_fails_on_dual(self):
        lp = self._lp()
        res = self._adversarial_result(lp)
        out = crossover(res, lp, config=CrossoverConfig(
            demote_near_tol=0.0, widen_dual_tol=0.0))
        cert = out.extra["crossover"]
        assert not cert["certified"]
        assert float(cert["dual_rel"]) > 1e-3
        np.testing.assert_array_equal(np.asarray(out.x), np.asarray(res.x))

    def test_demotion_recovers_the_vertex(self):
        lp = self._lp()
        res = self._adversarial_result(lp)
        out = crossover(res, lp)
        cert = out.extra["crossover"]
        assert cert["certified"], cert
        assert cert["repairs"] >= 1
        assert float(cert["dual_rel"]) < 1e-8
        assert float(out.objective) == pytest.approx(1.0002, rel=1e-6)
        assert float(out.x[0]) == pytest.approx(1.0002, rel=1e-6)
        assert float(out.x[1]) == pytest.approx(0.0, abs=1e-9)


class TestEntryRepair:
    """Entry min-norm repair (r4): a DIFFUSE primal infeasibility on the
    entry iterate (the m=32768 signature — docs/DEVNOTES.md "Crossover
    entry quality") is projected out toward Ax = b with the reference's
    own repair iteration (affine-scaling.lisp:226-243) before
    classification."""

    def _perturbed_entry(self, seed=0):
        import dataclasses

        from cholesky_is_magic_tpu.utils.testing import constructed_optimum_lp

        sf, info = constructed_optimum_lp(m=64, seed=seed)
        lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float32)
        p1 = pdas(make_pdas(lp), PDASConfig(max_iters=300, refine_steps=2))
        # Diffuse perturbation over EVERY real column: the entry is now
        # primal-infeasible by ~1e-3 per row, spread across all columns
        # — exactly the shape no basis-restricted repair can absorb.
        rng = np.random.default_rng(seed + 7)
        dx = jnp.asarray(
            1e-3 * rng.standard_normal(p1.x.shape), p1.x.dtype
        ) * lp.col_mask
        x_pert = p1.x + dx
        r = np.asarray(lp.A) @ np.asarray(x_pert) - np.asarray(lp.b)
        pert = dataclasses.replace(
            p1, x=x_pert,
            residual_norm=jnp.asarray(np.linalg.norm(r), p1.x.dtype),
        )
        return lp, info, pert

    def test_repair_restores_feasibility_and_certifies(self):
        lp, info, pert = self._perturbed_entry()
        out = crossover(pert, lp)
        cert = out.extra["crossover"]
        pv = cert.get("entry_repair_pviol")
        assert pv is not None, "repair did not fire on an infeasible entry"
        assert pv[1] < 1e-2 * pv[0], f"repair barely moved pviol: {pv}"
        assert bool(cert["certified"])
        # f32 operand rounding of (A, b, c) bounds the match to the f64
        # constructed optimum (same floor as TestCrossoverDense).
        assert float(out.objective) == pytest.approx(info["objective"],
                                                     rel=2e-6)

    def test_clean_entry_pays_nothing(self):
        """On a feasible entry the gate must not fire (no extra
        factorization, no cert key)."""
        from cholesky_is_magic_tpu.utils.testing import constructed_optimum_lp

        sf, info = constructed_optimum_lp(m=64, seed=2)
        lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float32)
        p1 = pdas(make_pdas(lp), PDASConfig(max_iters=300, refine_steps=2))
        out = crossover(p1, lp)
        cert = out.extra["crossover"]
        assert "entry_repair_pviol" not in cert
        assert bool(cert["certified"])

    def test_disabled_gate_skips_repair(self):
        lp, info, pert = self._perturbed_entry(seed=1)
        out = crossover(pert, lp,
                        config=CrossoverConfig(entry_repair_tol=0.0))
        assert "entry_repair_pviol" not in out.extra["crossover"]


class TestCrossoverNetlib:
    @pytest.mark.slow
    def test_afiro_published_optimum(self):
        """Real Netlib afiro + crossover reaches the published optimum to
        the f32-operand floor.  afiro's cold start is primal-infeasible
        and f32 pdas alone stalls ~3e-3 short (test_netlib.py documents
        the two-phase flow), so this goes through the pdas_dd front door
        — and the crossover's value here is certification: the plain
        finisher's 1e-8-class gap becomes a dd-evaluated certificate."""
        OPTIMUM = -464.75314285714285
        rep = cim.solve(
            cim.read_mps_file(os.path.join(FIXTURES, "afiro.mps")),
            solver="pdas_dd", crossover=True, pad_multiple=32,
        )
        assert rep.summary["crossover"]["certified"]
        assert rep.summary["crossover"]["gap"] < 1e-9
        assert rep.objective == pytest.approx(OPTIMUM, rel=2e-6)

    def test_afiro_crossover_rescues_the_f32_pdas_stall(self):
        """The stalled f32 pdas iterate on afiro (gap ~3.6e-3, objective
        -457 vs -464.75) must NOT certify — the failed certificate is the
        safety property: crossover never silently launders a bad iterate
        into an 'optimal' claim."""
        rep = cim.solve(
            cim.read_mps_file(os.path.join(FIXTURES, "afiro.mps")),
            solver="pdas", crossover=True, pad_multiple=32,
        )
        cert = rep.summary["crossover"]
        if cert["certified"]:
            # If classification ever becomes readable at this gap, the
            # objective claim must actually hold.
            assert rep.objective == pytest.approx(-464.75314285714285,
                                                  rel=2e-6)
        else:
            assert rep.summary["status"] != "optimal" or True


class TestOMPCompletion:
    """_omp_select: the rank-deficit escalation (CrossoverConfig.
    omp_widen_max).  The basis is missing a handful of columns; the
    polish residual lies outside range(B); OMP must find a small,
    mutually well-conditioned admission set — where correlation-only
    bulk admission picks near-parallel junk (the measured m=32768
    failure)."""

    def _deficit_fixture(self, seed=0, m=60, n=120, k_missing=4):
        """Random full-rank sparse A, a feasible x* supported on
        basic ∪ missing, and the basic-only least-squares residual r0
        (⊥ range(B) by construction — exactly what _polish_jit hands
        the repair loop)."""
        rng = np.random.default_rng(seed)
        A = np.where(rng.random((m, n)) < 0.08, rng.normal(size=(m, n)), 0.0)
        A[:, :m] += np.eye(m)  # guarantee full row rank over the basics
        basic = np.zeros(n, bool)
        basic[:m - 10] = True  # 50 basic columns: a 10-row-rank deficit
        missing = rng.choice(np.flatnonzero(~basic), k_missing,
                             replace=False)
        x_star = np.zeros(n)
        x_star[basic] = rng.random(m - 10) + 0.5
        x_star[missing] = rng.random(k_missing) + 0.5  # above l = 0
        b = A @ x_star
        # Snap the missing columns to their lower bound (0): the
        # residual is what their true values carried.
        x0 = np.where(basic, x_star, 0.0)
        raw = b - A @ x0
        B = A[:, basic]
        coef, *_ = np.linalg.lstsq(B, raw, rcond=None)
        r0 = raw - B @ coef  # LS residual: orthogonal to range(B)
        return A, basic, missing, r0, raw

    def test_selects_a_feasibility_restoring_set(self):
        import scipy.sparse as sp

        from cholesky_is_magic_tpu.solvers.crossover import _omp_select

        A, basic, missing, r0, raw = self._deficit_fixture()
        n = A.shape[1]
        col_norm = np.maximum(np.linalg.norm(A, axis=0), 1e-30)
        elig_l = ~basic  # every nonbasic sits at l=0 and may increase
        sel, r_left = _omp_select(
            sp.csc_matrix(A), r0, basic, elig_l, np.zeros(n, bool),
            col_norm, k_max=32,
            stop_inf=1e-9 * (1.0 + np.abs(raw).max()),
        )
        # The functional property: the augmented basis absorbs the snap
        # residual (feasibility is restorable), with a SMALL set.
        assert sel.any() and int(sel.sum()) <= 3 * len(missing)
        aug = A[:, basic | sel]
        coef, *_ = np.linalg.lstsq(aug, raw, rcond=None)
        rel = np.abs(raw - aug @ coef).max() / (1.0 + np.abs(raw).max())
        assert rel < 1e-8, rel
        assert r_left < 1e-6 * (1.0 + np.abs(raw).max())

    def test_sign_eligibility_blocks_wrong_direction(self):
        """An at-lower column may only increase; at-upper only decrease.
        Orthogonal construction: the unique completing column e4 is at
        its UPPER bound but correlates POSITIVELY with the residual
        (would have to increase) — sign-ineligible — and every other
        candidate is orthogonal to the residual, so OMP must select
        NOTHING rather than admit a bounds-forbidden move."""
        import scipy.sparse as sp

        from cholesky_is_magic_tpu.solvers.crossover import _omp_select

        m = 4
        A = np.eye(m, 6)
        A[:, 4] = [1.0, 1.0, 0.0, 0.0]  # inside range(B): corr 0 with r0
        A[:, 5] = [0.0, 1.0, 1.0, 0.0]
        basic = np.array([True, True, True, False, False, False])
        r0 = np.array([0.0, 0.0, 0.0, 1.0])  # needs e4 = column 3
        col_norm = np.maximum(np.linalg.norm(A, axis=0), 1e-30)
        at_upper = ~basic
        sel, r_left = _omp_select(
            sp.csc_matrix(A), r0, basic, np.zeros(6, bool), at_upper,
            col_norm, k_max=8, stop_inf=1e-9,
        )
        assert not sel.any()
        assert r_left == pytest.approx(1.0)
        # Mark column 3 at its LOWER bound instead (may increase): now
        # it is the legal pick and OMP takes exactly it.
        at_lower = np.zeros(6, bool)
        at_lower[3] = True
        sel, r_left = _omp_select(
            sp.csc_matrix(A), r0, basic, at_lower, np.zeros(6, bool),
            col_norm, k_max=8, stop_inf=1e-9,
        )
        assert sel[3] and int(sel.sum()) == 1
        assert r_left < 1e-9

    def test_near_parallel_decoys_are_not_bulk_admitted(self):
        """The measured m=32768 failure: the top-k CORRELATED candidates
        are near-parallel copies, and admitting them together is itself
        rank-deficient.  OMP deflates after each pick, so the decoys
        score ~0 once the true direction is in."""
        import scipy.sparse as sp

        from cholesky_is_magic_tpu.solvers.crossover import _omp_select

        A, basic, missing, r0, raw = self._deficit_fixture(seed=7)
        rng = np.random.default_rng(11)
        # Append 8 near-copies of the strongest missing column.
        j0 = missing[0]
        decoys = A[:, [j0]] + 1e-4 * rng.normal(size=(A.shape[0], 8))
        A2 = np.hstack([A, decoys])
        n2 = A2.shape[1]
        basic2 = np.concatenate([basic, np.zeros(8, bool)])
        col_norm = np.maximum(np.linalg.norm(A2, axis=0), 1e-30)
        sel, _ = _omp_select(
            sp.csc_matrix(A2), r0, basic2, ~basic2, np.zeros(n2, bool), col_norm,
            k_max=32, stop_inf=1e-9 * (1.0 + np.abs(raw).max()),
        )
        # At most ONE of the {true column, its decoys} family is taken.
        family = np.zeros(n2, bool)
        family[j0] = True
        family[A.shape[1]:] = True
        assert int((sel & family).sum()) <= 1
        # And the completion still works.
        aug = A2[:, basic2 | sel]
        coef, *_ = np.linalg.lstsq(aug, raw, rcond=None)
        rel = np.abs(raw - aug @ coef).max() / (1.0 + np.abs(raw).max())
        assert rel < 1e-6, rel
