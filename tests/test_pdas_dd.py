"""Double-word-state PDAS: tight gaps on f32-only arithmetic."""

import jax.numpy as jnp
import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.ops import dd as ddm
from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas, pdas
from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd
from cholesky_is_magic_tpu.utils.testing import (
    random_lp,
    scipy_reference_solution,
    write_mps,
)


def f32_lp(seed):
    ineq = random_lp(seed, n_ub=24, n_eq=6, n=32, bounded=True)
    _, fun, _ = scipy_reference_solution(ineq)
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    return to_device_lp(sf, pad_multiple=64, dtype=jnp.float32), fun


def test_dd_mul_div_accuracy():
    rng = np.random.default_rng(0)
    a64 = rng.normal(size=256)
    b64 = rng.normal(size=256) + 3.0
    a = ddm.dd_from(jnp.asarray(a64, jnp.float32))
    a = ddm.dd_add_w(a, jnp.asarray(a64 - np.float32(a64), jnp.float32))
    b = ddm.dd_from(jnp.asarray(b64, jnp.float32))
    b = ddm.dd_add_w(b, jnp.asarray(b64 - np.float32(b64), jnp.float32))
    prod = ddm.dd_mul(a, b)
    got = np.asarray(prod.hi, np.float64) + np.asarray(prod.lo, np.float64)
    np.testing.assert_allclose(got, a64 * b64, rtol=2e-13)
    quot = ddm.dd_div(a, b)
    got = np.asarray(quot.hi, np.float64) + np.asarray(quot.lo, np.float64)
    np.testing.assert_allclose(got, a64 / b64, rtol=2e-12)


@pytest.mark.parametrize("seed", [2, 4, 6])
def test_dd_state_beats_f32_floor(seed):
    """dd-state PDAS must push the gap at least 10x below the plain-f32
    precision floor (~1e-6) on the same f32 LP, with a correct objective."""
    lp32, fun = f32_lp(seed)
    cfg = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=3)
    rdd = pdas_dd(make_pdas_dd(lp32), cfg)
    gap = float(rdd.extra["gap"])
    assert gap < 1e-7, gap  # typically 1e-8..5e-8; plain f32 floors ~1e-6
    assert float(rdd.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)


def test_dd_gap_readout_is_honest():
    """The f32 gap readout underflows to 0 near optimality; the dd readout
    must stay finite and positive (it is the one the driver trusts)."""
    lp32, _ = f32_lp(4)
    cfg = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2)
    rdd = pdas_dd(make_pdas_dd(lp32), cfg)
    assert float(rdd.extra["gap"]) > 0.0
    # And the hidden low words are genuinely in use (nonzero).
    assert float(jnp.max(jnp.abs(rdd.extra["x_lo"]))) > 0.0


@pytest.mark.parametrize("seed", [2, 4])
def test_dd_with_tiled_engine_tight_gap(seed):
    """pdas_dd backed by the tiled sparse engine must reach the same tight
    gaps as the dense path (VERDICT r1 #2: the at-scale path and the
    accuracy story must not be mutually exclusive)."""
    from cholesky_is_magic_tpu.sparse.tiled import engine_for

    lp32, fun = f32_lp(seed)
    st = make_pdas_dd(lp32)
    eng = engine_for(st.lp.A, block=16)
    cfg = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=3)
    rdd = pdas_dd(st, cfg, engine=eng)
    gap = float(rdd.extra["gap"])
    assert gap < 1e-7, gap
    assert float(rdd.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)


def test_padded_entries_inert():
    """One Newton step must leave padded w, z, x exactly unchanged.

    Regression: kkt_dd used the e/su = w, f/sl = z identities everywhere,
    but the sanitized rhs has e = f = 0 at padded entries, so dw = w and
    dz = z there — and _pos_step then saw ratio w/dw = 1 at every padded
    entry, permanently capping the Newton step at 1."""
    lp32, _ = f32_lp(2)
    n_pad = int(jnp.sum(~lp32.col_mask))
    assert n_pad > 0  # the fixture must actually exercise padding
    st0 = make_pdas_dd(lp32)
    cfg = PDASConfig(max_iters=40, gap_tol=1e-8, refine_steps=2)
    res = pdas_dd(st0, cfg)
    pad = ~lp32.col_mask
    for name in ("w", "z"):
        got = jnp.where(pad, res.extra[name], 0.0)
        want = jnp.where(pad, getattr(st0, name).to_working(), 0.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(jnp.where(pad, res.x, 0.0)), 0.0)


def test_batched_pdas_dd_composes():
    """pdas_dd is a pure jitted function: vmap composes for batched
    tight-gap sweeps."""
    import jax

    lps, funs = zip(*[f32_lp(s) for s in (2, 4)])
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[make_pdas_dd(lp) for lp in lps])
    from cholesky_is_magic_tpu.solvers.pdas_dd import _pdas_dd_jit

    cfg = PDASConfig(max_iters=150, gap_tol=1e-8, refine_steps=2)
    res = jax.jit(jax.vmap(lambda s: _pdas_dd_jit.__wrapped__(s, cfg)))(states)
    for i, fun in enumerate(funs):
        assert float(res.extra["gap"][i]) < 1e-6
        assert float(res.objective[i]) == pytest.approx(fun, rel=1e-4, abs=1e-4)


class TestMehrotra:
    """Predictor-corrector mode (PDASConfig.mehrotra): same optimum,
    roughly HALF the iterations — the corrector re-solves on the shared
    factorization with the sigma*mu-centered second-order rhs."""

    @pytest.mark.slow
    @pytest.mark.parametrize("seed", [2, 3, 5])
    def test_dd_corrector_halves_iterations(self, seed):
        import dataclasses

        ineq = random_lp(seed, n_ub=24, n_eq=6, n=32, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float32)
        base = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2)
        r_plain = pdas_dd(make_pdas_dd(lp), base)
        r_meh = pdas_dd(
            make_pdas_dd(lp), dataclasses.replace(base, mehrotra=True)
        )
        assert float(r_meh.extra["gap"]) < 1e-7
        assert float(r_meh.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)
        # The headline: at most ~60% of the plain iteration count
        # (measured: 11 vs 22, 12 vs 26, 12 vs 29).
        assert int(r_meh.iterations) <= 0.65 * int(r_plain.iterations)

    def test_f32_pdas_corrector(self):
        import dataclasses

        from cholesky_is_magic_tpu.solvers import make_pdas, pdas

        ineq = random_lp(0, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float64)
        base = PDASConfig(max_iters=300)
        r_plain = pdas(make_pdas(lp), base)
        r_meh = pdas(make_pdas(lp), dataclasses.replace(base, mehrotra=True))
        assert float(r_meh.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)
        assert int(r_meh.iterations) <= 0.65 * int(r_plain.iterations)

    def test_corrector_through_repair_path(self):
        """afiro cold start: the repair branch fires first (primal
        infeasible init); the corrector must not disturb the
        repair/recenter selection (measured: 12 vs 77 plain iterations)."""
        import dataclasses
        import os

        from cholesky_is_magic_tpu.solvers import make_pdas, pdas

        fix = os.path.join(os.path.dirname(__file__), "fixtures", "afiro.mps")
        sf = cim.to_standard_form(cim.read_mps_file(fix))
        lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float32)
        cfg = PDASConfig(max_iters=300, refine_steps=2, mehrotra=True)
        res = pdas(make_pdas(lp), cfg)
        assert float(res.objective) == pytest.approx(-464.753, rel=1e-3)
        assert int(res.iterations) <= 30

    @pytest.mark.slow
    def test_corrector_sparse_engine(self):
        """Mehrotra through the fully sparse pipeline (the corrector's
        second solve rides prepare_normal_ell's recycled factor)."""
        import dataclasses

        from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd_sparse

        ineq = random_lp(2, n_ub=24, n_eq=6, n=32, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        base = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2)
        st1, eng1 = make_pdas_dd_sparse(sf, block=16, dtype=jnp.float32)
        r_plain = pdas_dd(st1, base, engine=eng1)
        st2, eng2 = make_pdas_dd_sparse(sf, block=16, dtype=jnp.float32)
        r_meh = pdas_dd(
            st2, dataclasses.replace(base, mehrotra=True), engine=eng2
        )
        assert float(r_meh.extra["gap"]) < 1e-7
        assert float(r_meh.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)
        assert int(r_meh.iterations) <= 0.65 * int(r_plain.iterations)


class TestGondzio:
    """Multiple centrality correctors (PDASConfig.gondzio_correctors):
    same optimum, never more iterations than plain Mehrotra on the dd
    path (measured: 9 vs 11, 11 vs 12, 11 vs 12 on these seeds).  The
    knob is off by default — at-scale tiled-sparse runs LOSE wall-clock
    with it (see the config docstring's measured numbers)."""

    @pytest.mark.slow
    @pytest.mark.parametrize("seed", [2, 3, 5])
    def test_dd_correctors_never_hurt_iterations(self, seed):
        import dataclasses

        ineq = random_lp(seed, n_ub=24, n_eq=6, n=32, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float32)
        base = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2,
                          mehrotra=True)
        r_meh = pdas_dd(make_pdas_dd(lp), base)
        r_g = pdas_dd(make_pdas_dd(lp), dataclasses.replace(
            base, gondzio_correctors=2))
        assert float(r_g.extra["gap"]) < 1e-7
        assert float(r_g.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)
        assert int(r_g.iterations) <= int(r_meh.iterations)

    def test_f32_endgame_gate_keeps_production_exit(self):
        """At the f32 floor the correctors are gated off
        (gondzio_gate_gap) and the production bounce-exit config must
        stay in the same iteration class as plain Mehrotra (measured:
        13 vs 14; ungated f32 floor exits are a lottery — see the
        config docstring)."""
        import dataclasses

        from cholesky_is_magic_tpu.solvers import make_pdas, pdas

        ineq = random_lp(3, n_ub=24, n_eq=6, n=32, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=16, dtype=jnp.float32)
        base = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2,
                          mehrotra=True, stall_exit_iters=12,
                          bounce_exit_ratio=25.0)
        r_meh = pdas(make_pdas(lp), base)
        r_g = pdas(make_pdas(lp), dataclasses.replace(
            base, gondzio_correctors=2))
        assert float(r_g.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)
        assert int(r_g.iterations) <= int(r_meh.iterations) + 3


class TestWarmBlend:
    """Blended warm starts (make_pdas warm_blend): a 2%-drift re-solve
    chain must run BELOW the cold iteration count — the r2 recipe
    (push-only) measured ~1.25x cold; blend+mehrotra measured 0.63x at
    25fv47 scale (examples/warm_resolve.py)."""

    @pytest.mark.slow
    def test_drift_chain_saves_iterations(self):
        import dataclasses

        from cholesky_is_magic_tpu.api import solve

        ineq = random_lp(0, n_ub=48, n_eq=12, n=96, bounded=True)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        rep = solve(sf, "pdas_dd", max_iters=200, refine_steps=2,
                    mehrotra=True, pad_multiple=16)
        cold = rep.summary["phase1_iterations"] + rep.summary["iterations"]
        rng = np.random.default_rng(1)
        warm_iters = []
        for _ in range(3):
            drift = 1.0 + 0.02 * rng.standard_normal(sf.c.shape)
            sf = dataclasses.replace(sf, c=sf.c * drift)
            rep = solve(sf, "pdas_dd", max_iters=200, refine_steps=2,
                        warm=rep, warm_blend=0.2, mehrotra=True,
                        pad_multiple=16)
            assert rep.summary["gap"] < 1e-7
            warm_iters.append(rep.summary["iterations"])
        assert np.mean(warm_iters) < 0.8 * cold, (warm_iters, cold)

    def test_blend_same_instance_continuation(self):
        """Blend 0 (default) keeps the exact same-LP continuation
        semantics: warm re-solve of the SAME instance converges in a
        handful of iterations."""
        from cholesky_is_magic_tpu.api import solve

        ineq = random_lp(3, n_ub=24, n_eq=6, n=32, bounded=True)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        rep = solve(sf, "pdas_dd", max_iters=200, refine_steps=2,
                    mehrotra=True, pad_multiple=16)
        rep2 = solve(sf, "pdas_dd", max_iters=200, refine_steps=2,
                     warm=rep, mehrotra=True, pad_multiple=16)
        assert rep2.summary["gap"] < 1e-7
        assert rep2.summary["iterations"] <= 8


class TestEntryRepair:
    """Entry min-norm repair (PDASConfig.entry_repair_tol): pdas_dd is
    Newton-only, so its precision floor tracks the ENTRY iterate's
    primal infeasibility (docs/DEVNOTES.md "knife edge" — at m=32768 a
    generic phase-1 exit floors the finisher two decades above a lucky
    one).  One damped min-norm LS correction toward Ax = b (the
    reference's repair iteration, affine-scaling.lisp:226-243) makes
    the floor start-independent."""

    def _entry(self, seed=0, pert=1e-3):
        import dataclasses

        lp32, fun = f32_lp(seed)
        p1 = pdas(make_pdas(lp32), PDASConfig(max_iters=300, refine_steps=2))
        st = make_pdas_dd(lp32, warm=p1)
        if pert:
            # Diffuse, interior-preserving corruption: spread over every
            # real column, clipped to keep half of each slack (the
            # m=32768 knife-edge signature is diffuse row infeasibility
            # on a still-interior iterate).
            rng = np.random.default_rng(seed + 11)
            dx = pert * rng.standard_normal(st.x.hi.shape)
            x = np.asarray(st.x.hi, np.float64)
            l, u = np.asarray(lp32.l, np.float64), np.asarray(lp32.u, np.float64)
            x1 = np.clip(x + dx, x - 0.5 * (x - l), x + 0.5 * (u - x))
            x1 = np.where(np.asarray(lp32.col_mask), x1, x)
            st = dataclasses.replace(
                st, x=ddm.dd_from(jnp.asarray(x1, jnp.float32))
            )
        return lp32, fun, st

    def test_repair_collapses_entry_infeasibility(self):
        lp32, fun, st = self._entry()
        cfg = PDASConfig(max_iters=200, gap_tol=1e-8, refine_steps=2,
                         mehrotra=True, entry_repair_tol=1e-6)
        r = pdas_dd(st, cfg)
        info = r.extra["entry_repair"]
        pv0, pv1 = float(info["pviol_before"]), float(info["pviol_after"])
        assert pv0 > 1e-5, pv0  # the corruption registered
        assert pv1 < 0.1 * pv0, (pv0, pv1)  # the repair moved it
        assert float(r.extra["gap"]) < 1e-6
        assert float(r.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)

    def test_repair_at_least_as_tight_as_without(self):
        lp32, fun, st = self._entry(seed=2)
        base = PDASConfig(max_iters=60, gap_tol=1e-10, refine_steps=2,
                          mehrotra=True)
        import dataclasses

        with_rep = dataclasses.replace(base, entry_repair_tol=1e-6)
        g_plain = float(pdas_dd(st, base).extra["gap"])
        g_rep = float(pdas_dd(st, with_rep).extra["gap"])
        assert g_rep <= 10 * g_plain, (g_rep, g_plain)

    def test_clean_entry_not_perturbed(self):
        """On an entry below the gate the lax.cond must not fire: the
        reported pviols match and the solve converges as usual.  (A
        clean m=32-scale phase-1 exit sits at rel pviol ~1e-4, so the
        gate goes above that; the production 1e-6 default-off gate is
        for at-scale flows whose failure signature is 1e-3-class.)"""
        lp32, fun, st = self._entry(seed=4, pert=0.0)
        cfg = PDASConfig(max_iters=200, gap_tol=1e-8, refine_steps=2,
                         mehrotra=True, entry_repair_tol=1e-2)
        r = pdas_dd(st, cfg)
        info = r.extra["entry_repair"]
        assert float(info["pviol_before"]) == float(info["pviol_after"])
        assert float(r.extra["gap"]) < 1e-7

    def test_sparse_engine_route(self):
        """The repair rides the fully sparse ELL/BELL operand set +
        engine factorization (the operand set the m=32768 flow uses)."""
        import dataclasses

        from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse
        from cholesky_is_magic_tpu.solvers.pdas_dd import PDASDDState
        from cholesky_is_magic_tpu.utils.testing import constructed_optimum_lp

        sf, info = constructed_optimum_lp(m=64, seed=3)
        st0, eng = make_pdas_sparse(sf, block=16)
        p1 = pdas(st0, PDASConfig(max_iters=300, refine_steps=2), engine=eng)
        rng = np.random.default_rng(5)
        x = np.asarray(p1.x, np.float64)
        l = np.asarray(st0.lp.l, np.float64)
        u = np.asarray(st0.lp.u, np.float64)
        dx = 1e-3 * rng.standard_normal(x.shape)
        x1 = np.clip(x + dx, x - 0.5 * (x - l), x + 0.5 * (u - x))
        x1 = np.where(np.asarray(st0.lp.col_mask), x1, x)
        st = PDASDDState(
            x=ddm.dd_from(jnp.asarray(x1, jnp.float32)),
            y=ddm.dd_from(p1.extra["y"]),
            w=ddm.dd_from(p1.extra["w"]),
            z=ddm.dd_from(p1.extra["z"]),
            lp=st0.lp,
        )
        cfg = PDASConfig(max_iters=200, gap_tol=1e-8, refine_steps=2,
                         mehrotra=True, entry_repair_tol=1e-6)
        r = pdas_dd(st, cfg, engine=eng)
        pv = r.extra["entry_repair"]
        assert float(pv["pviol_after"]) < 0.1 * float(pv["pviol_before"]), (
            float(pv["pviol_before"]), float(pv["pviol_after"]))
        assert float(r.extra["gap"]) < 1e-6
