"""End-to-end solver tests: all three families against the scipy oracle
(SURVEY.md §4 — the TPU rendering of the reference's REPL test style)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.solvers import (
    AffineConfig,
    PDASConfig,
    affine_scaling,
    alm,
    make_affine_state,
    make_alm,
    make_pdas,
    pdas,
)
from cholesky_is_magic_tpu.solvers.alm import ALMConfig, aalm, adcd_iteration, alm_iteration
from cholesky_is_magic_tpu.solvers.approx import (
    approx,
    make_alm_subproblem,
    make_approx_selfdual,
    value_and_gradient,
)
from cholesky_is_magic_tpu.solvers.result import Status
from cholesky_is_magic_tpu.utils.testing import (
    random_lp,
    scipy_reference_solution,
    write_mps,
)

import os

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def fixture_lp(name="simple.mps", pad=8, dtype=jnp.float64):
    sf = cim.to_standard_form(cim.read_mps_file(os.path.join(FIXTURES, name)))
    return to_device_lp(sf, pad_multiple=pad, dtype=dtype)


def random_device_lp(seed, pad=8, dtype=jnp.float64, bounded=True):
    lp_ineq = random_lp(seed, bounded=bounded)
    status, fun, _ = scipy_reference_solution(lp_ineq)
    assert status == 0
    sf = cim.to_standard_form(read_mps_string(write_mps(lp_ineq)))
    return to_device_lp(sf, pad_multiple=pad, dtype=dtype), fun


class TestAffineScaling:
    def test_simple_known_optimum(self):
        lp = fixture_lp()
        res = affine_scaling(make_affine_state(lp), AffineConfig(max_iters=200))
        assert int(res.status) == Status.OPTIMAL
        assert float(res.objective) == pytest.approx(-7.0, abs=1e-5)
        assert float(res.residual_norm) < 1e-6 * lp.m

    def test_maxrange(self):
        lp = fixture_lp("maxrange.mps")
        res = affine_scaling(make_affine_state(lp), AffineConfig(max_iters=300))
        # Oracle optimum via scipy on the same standard form.
        from scipy.optimize import linprog

        sf = cim.to_standard_form(
            cim.read_mps_file(os.path.join(FIXTURES, "maxrange.mps"))
        )
        ref = linprog(
            sf.dense_c(), A_eq=sf.dense_A(), b_eq=sf.b,
            bounds=list(zip(sf.l, sf.u)), method="highs",
        )
        assert ref.status == 0
        assert float(res.objective) == pytest.approx(ref.fun, abs=2e-4)

    @pytest.mark.parametrize("seed", [0, 3])
    def test_random_vs_oracle(self, seed):
        lp, fun = random_device_lp(seed)
        res = affine_scaling(make_affine_state(lp), AffineConfig(max_iters=400))
        assert float(res.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)

    def test_f32_with_refinement(self):
        lp = fixture_lp(dtype=jnp.float32)
        res = affine_scaling(
            make_affine_state(lp), AffineConfig(max_iters=200, refine_steps=2)
        )
        assert float(res.objective) == pytest.approx(-7.0, abs=1e-3)

    def test_unbounded_detected(self):
        # min -x, x >= 0 free above, one vacuous equality row on another var.
        mps = read_mps_string(
            """NAME UNB
ROWS
 N  O
 E  R
COLUMNS
    X  O  -1.0
    S  R  1.0
RHS
    H  R  1.0
ENDATA
"""
        )
        lp = to_device_lp(cim.to_standard_form(mps), pad_multiple=8, dtype=jnp.float64)
        res = affine_scaling(make_affine_state(lp), AffineConfig(max_iters=50))
        assert int(res.status) == Status.UNBOUNDED


class TestPDAS:
    def test_simple_known_optimum(self):
        lp = fixture_lp()
        res = pdas(make_pdas(lp), PDASConfig(max_iters=200))
        assert int(res.status) == Status.OPTIMAL
        assert float(res.objective) == pytest.approx(-7.0, abs=1e-3)
        assert float(res.extra["gap"]) < 1e-4

    @pytest.mark.parametrize("seed,bounded", [(1, True), (4, True), (5, False), (9, False)])
    def test_random_vs_oracle(self, seed, bounded):
        # Unbounded-box seeds exercise the filter/free-variable path of the
        # stable KKT elimination (the reference's filter-Z divides by zero).
        lp, fun = random_device_lp(seed, bounded=bounded)
        res = pdas(make_pdas(lp), PDASConfig(max_iters=300))
        assert int(res.status) == Status.OPTIMAL
        assert float(res.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)

    def test_dual_feasibility_at_optimum(self):
        lp = fixture_lp()
        res = pdas(make_pdas(lp), PDASConfig(max_iters=200))
        # Weak duality sandwich: dual <= primal, close at optimum.
        assert float(res.extra["dual_objective"]) <= float(res.objective) + 1e-3

    def test_bounce_exit_cuts_floor_confirmation_iterations(self):
        """PDASConfig.bounce_exit_ratio: in the floor regime (unreachable
        gap_tol) the endgame gap oscillates above the best; the bounce
        exit must return the SAME best iterate in fewer (or equal)
        iterations, and the default 0.0 must not change behavior at all."""
        from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd

        # f32: the dd finisher's working precision (its carry is typed
        # for the f32+dd design; f64 states take the plain pdas path).
        lp = fixture_lp(dtype=jnp.float32)
        base = PDASConfig(gap_tol=1e-14, max_iters=200, krylov_steps=6)
        r_off = pdas_dd(make_pdas_dd(lp), base)
        r_on = pdas_dd(
            make_pdas_dd(lp),
            dataclasses.replace(base, bounce_exit_ratio=25.0,
                                bounce_exit_floor=1e-7),
        )
        assert int(r_on.status) == Status.PRECISION_FLOOR
        assert float(r_on.extra["gap"]) == pytest.approx(
            float(r_off.extra["gap"]), rel=1e-6
        )
        assert int(r_on.iterations) <= int(r_off.iterations)
        # default-off path unchanged: same gap AND same iteration count
        r_off2 = pdas_dd(make_pdas_dd(lp), base)
        assert int(r_off2.iterations) == int(r_off.iterations)


class TestALM:
    def test_simple_known_optimum(self):
        lp = fixture_lp()
        res = alm(make_alm(lp), config=ALMConfig(inner_iters=50_000, max_outer=100))
        assert float(res.value) == pytest.approx(-7.0, abs=1e-3)
        assert float(res.violation) < 1e-5
        assert float(res.pg) < 1e-5

    def test_random_vs_oracle(self):
        lp, fun = random_device_lp(2)
        res = alm(make_alm(lp), config=ALMConfig(inner_iters=50_000, max_outer=200))
        assert float(res.value) == pytest.approx(fun, rel=5e-3, abs=5e-3)

    def test_warm_start_multipliers(self):
        # make-alm accepts prior multipliers (alm-approx.lisp:427-446):
        # restarting from the solved multipliers should converge quickly.
        lp = fixture_lp()
        cfg = ALMConfig(inner_iters=50_000, max_outer=100)
        res1 = alm(make_alm(lp), config=cfg)
        st2 = make_alm(lp, mu=100.0, multipliers=res1.multipliers)
        res2 = alm(st2, x0=res1.x, config=cfg)
        assert int(res2.outer_iterations) <= int(res1.outer_iterations)
        assert float(res2.value) == pytest.approx(-7.0, abs=1e-3)

    def test_v1_lancelot_iteration(self):
        lp = fixture_lp()
        st = make_alm(lp)
        x = jnp.zeros_like(lp.c)
        for _ in range(12):
            st, x, viol, value = alm_iteration(st, x)
        assert float(jnp.max(jnp.abs(viol))) < 1e-3
        assert float(value) == pytest.approx(-7.0, abs=1e-2)

    def test_aalm(self):
        lp = fixture_lp()
        res = aalm(make_alm(lp), config=ALMConfig(inner_iters=50_000, max_outer=100))
        assert float(res.value) == pytest.approx(-7.0, abs=1e-2)

    def test_adcd(self):
        lp = fixture_lp()
        st = make_alm(lp)
        x = jnp.zeros_like(lp.c)
        done = jnp.asarray(False)
        has_x = jnp.asarray(False)
        for _ in range(100):
            st, x, done, _pg = adcd_iteration(st, x, has_x)
            has_x = jnp.asarray(True)
            if bool(done):
                break
        assert bool(done)

    def test_adcd_driver(self):
        from cholesky_is_magic_tpu.solvers.alm import adcd

        lp = fixture_lp()
        res = adcd(make_alm(lp), config=ALMConfig(max_outer=100))
        # adcd's own done-thresholds: pg < 1e-2 and ||viol|| < 1e-2.
        assert float(res.pg) < 1e-2
        assert float(res.value) == pytest.approx(-7.0, abs=5e-2)
        assert int(res.outer_iterations) <= 100


class TestALMDD:
    """ALMConfig.dd_gradient — the double-word inner APPROX driver
    (approx._approx_dd).  The f32 ALM wall is a PRECISION wall: host f64
    of the same algorithm reaches the reference's viol/pg < 1e-5 outer
    stop (alm-approx.lisp:556-558) where f32 floors at pg ~1e-2
    (examples/alm_e2e_verdict.py); the dd driver must restore that
    capability on f32 operands."""

    def _sparse_f32(self, seed=7, frac=8.0):
        from cholesky_is_magic_tpu.ingest.device import to_sparse_lp

        ineq = random_lp(seed, n_ub=24, n_eq=8, n=48, density=0.3)
        status, fun, _ = scipy_reference_solution(ineq)
        assert status == 0
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        return to_sparse_lp(sf, dtype=jnp.float32,
                            bell_max_dense_frac=frac), fun

    def test_dd_reaches_reference_tolerances_sparse(self):
        # Two-phase protocol: f32 to its floor, dd finisher warm-started
        # from the f32 multipliers/iterate — the production escalation.
        # mu is RESET (not inherited): the f32 phase inflates mu toward
        # mu_max because its precision floor fakes "no improvement" to
        # the growth rule, and at mu~1e7 the accelerated inner method
        # needs ~L/k^2 ~ 1e8/1e8 iterations per digit (measured: pg
        # floors at 1.3e-2 with inherited mu; converges in 5 outer /
        # 9e3 inner with mu=100).  The multipliers carry the progress.
        lp, fun = self._sparse_f32()
        assert lp.EB is not None and lp.ETB is not None
        cfgA = ALMConfig(max_outer=30, inner_iters=10_000,
                         violation_tol=1e-5, pg_tol=1e-5, omega_floor=1e-6)
        resA = alm(make_alm(lp), config=cfgA)
        cfgB = dataclasses.replace(cfgA, dd_gradient=True,
                                   omega_floor=1e-7, max_outer=30)
        stB = make_alm(lp, mu=100.0, multipliers=resA.multipliers)
        resB = alm(stB, x0=resA.x, config=cfgB)
        assert float(resB.violation) < 1e-5
        assert float(resB.pg) < 1e-5
        assert float(resB.value) == pytest.approx(fun, rel=1e-3, abs=1e-3)
        # The dd finisher must not be a no-op: it lands at or below the
        # f32 phase's floor on both outer-stop quantities.
        assert float(resB.pg) <= float(resA.pg) + 1e-12

    def test_dd_gradient_dense_path(self):
        # Cold-start dd over a padded dense DeviceLP (exercises the
        # ops.dd dense dd_matvec_dd / dd_rmatvec_dd route).
        lp, fun = random_device_lp(2, dtype=jnp.float32)
        cfg = ALMConfig(max_outer=40, inner_iters=10_000,
                        violation_tol=1e-5, pg_tol=1e-5, omega_floor=1e-7,
                        dd_gradient=True)
        res = alm(make_alm(lp), config=cfg)
        assert float(res.violation) < 1e-5
        assert float(res.pg) < 1e-5
        assert float(res.value) == pytest.approx(fun, rel=1e-3, abs=1e-3)

    def test_dd_gradient_requires_bell_operands(self):
        from cholesky_is_magic_tpu.ingest.device import to_sparse_lp

        ineq = random_lp(3, n_ub=24, n_eq=8, n=48, density=0.3)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_sparse_lp(sf, dtype=jnp.float32, bell_max_dense_frac=0.0)
        assert lp.EB is None
        with pytest.raises(ValueError, match="block-ELL"):
            alm(make_alm(lp), config=ALMConfig(dd_gradient=True))


class TestApproxSelfdual:
    def test_selfdual_solves_lp(self):
        lp = fixture_lp()
        prob = make_approx_selfdual(lp, complementarity=True, pad_multiple=8)
        res = approx(prob, 200_000, accuracy=1e-9)
        x = np.asarray(res.x)[: lp.n]
        obj = float(x @ np.asarray(lp.c)[: lp.n])
        assert obj == pytest.approx(-7.0, abs=1e-4)

    def test_selfdual_without_complementarity_is_feasible(self):
        lp = fixture_lp()
        prob = make_approx_selfdual(lp, complementarity=False, pad_multiple=8)
        res = approx(prob, 100_000, accuracy=1e-8)
        # Without the complementarity terms the solution is primal-dual
        # feasible with zero gap row, but may not be at a vertex.
        _, _, maxviol = value_and_gradient(prob, res.x)
        assert float(maxviol) < 1e-4

    def test_l1_penalty_builds(self):
        lp = fixture_lp()
        prob = make_approx_selfdual(lp, l1_penalty=0.1, pad_multiple=8)
        assert float(jnp.sum(jnp.abs(prob.c_lin))) > 0

    def test_restart_monotonicity(self):
        # The adaptive restart must not prevent convergence on a quadratic
        # with a known minimizer.
        lp = fixture_lp()
        prob = make_alm_subproblem(lp, jnp.zeros_like(lp.b), 10.0)
        res = approx(prob, 20_000, accuracy=1e-7)
        assert float(res.pg) < 1e-6
