"""Mixed-precision fidelity: the f32+double-word path must track the f64
trajectory (BASELINE.md: "iterate-trajectory match vs reference run").

The f64 CPU run stands in for the reference's fp64 CHOLMOD trajectory (no
CHOLMOD in this environment; same arithmetic class)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.kkt import dense_kkt_operator, solve_kkt_newton
from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas
from cholesky_is_magic_tpu.solvers.pdas import _pdas_jit
from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps


def both_dtypes_lp(seed=0):
    ineq = random_lp(seed, n_ub=12, n_eq=4, n=16, bounded=True)
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    lp64 = to_device_lp(sf, pad_multiple=8, dtype=jnp.float64)
    lp32 = to_device_lp(sf, pad_multiple=8, dtype=jnp.float32)
    return lp64, lp32


def test_newton_direction_f32_refined_matches_f64():
    rng = np.random.default_rng(0)
    m, n = 20, 36
    A64 = rng.normal(size=(m, n)) * (rng.random((m, n)) < 0.3)
    A64[np.arange(m), np.arange(m)] += 2.0
    pos = lambda k: 0.1 + rng.random(k)
    args64 = [jnp.asarray(v, jnp.float64) for v in
              (pos(n), pos(n), pos(n), pos(n))]
    rhs64 = [jnp.asarray(v, jnp.float64) for v in
             (rng.random(n), rng.random(n), rng.random(m), rng.random(n))]
    d64 = solve_kkt_newton(*args64, dense_kkt_operator(jnp.asarray(A64)), *rhs64)

    to32 = lambda v: jnp.asarray(np.asarray(v), jnp.float32)
    op32 = dense_kkt_operator(
        to32(A64), refine_steps=2
    )
    d32 = solve_kkt_newton(*[to32(v) for v in args64], op32, *[to32(v) for v in rhs64])
    for a, b in ((d64.dx, d32.dx), (d64.dy, d32.dy), (d64.dz, d32.dz), (d64.dw, d32.dw)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        err = float(jnp.max(jnp.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))) / scale
        assert err < 1e-4, err


def test_pdas_trajectory_f32_tracks_f64():
    lp64, lp32 = both_dtypes_lp()
    K = 8
    cfg = lambda: PDASConfig(max_iters=K, gap_tol=0.0, refine_steps=2)
    r64 = _pdas_jit(make_pdas(lp64), cfg())
    r32 = _pdas_jit(make_pdas(lp32), cfg())
    x64 = np.asarray(r64.x, np.float64)
    x32 = np.asarray(r32.x, np.float64)
    scale = max(1.0, np.abs(x64).max())
    assert np.abs(x64 - x32).max() / scale < 2e-3
    # Objectives after K identical iterations agree tightly.
    assert float(r32.objective) == pytest.approx(float(r64.objective), rel=2e-3, abs=2e-3)


def test_dd_trajectory_matches_f64_to_1e6():
    """BASELINE.md metric: iterate-trajectory match <= 1e-6 vs the fp64
    reference run.  The dd-state solver (f32-only arithmetic) must track
    every per-iteration primal iterate of the f64 PDAS run to 1e-6
    relative — not just the endpoint.

    Both runs start from the same on-trajectory point (10 warmup f64
    iterations, past the init's repair step — pdas_dd is Newton-only by
    design), with the f64 state split into dd hi+lo exactly (error
    ~2^-48).  Problem data is pre-rounded to f32-representable values so
    the comparison measures ARITHMETIC error, not data rounding."""
    from cholesky_is_magic_tpu.ops.dd import DD
    from cholesky_is_magic_tpu.solvers.pdas import PDASState
    from cholesky_is_magic_tpu.solvers.pdas_dd import PDASDDState, _pdas_dd_jit

    ineq = random_lp(4, n_ub=12, n_eq=4, n=16, bounded=True)
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    lp64 = to_device_lp(sf, pad_multiple=8, dtype=jnp.float64)

    st64_0 = make_pdas(lp64)
    # Bit-identical problem data for both runs: the f64-equilibrated LP
    # rounded to f32 (exactly representable in both dtypes).  Equilibrating
    # separately per dtype would inject ~1e-7-relative DATA differences
    # that swamp the arithmetic comparison.
    lp32p = dataclasses.replace(
        st64_0.lp,
        **{f: jnp.asarray(np.asarray(getattr(st64_0.lp, f)), jnp.float32)
           for f in ("A", "c", "b", "l", "u")},
    )
    lp64p = dataclasses.replace(
        st64_0.lp,
        **{f: jnp.asarray(np.asarray(getattr(lp32p, f)), jnp.float64)
           for f in ("A", "c", "b", "l", "u")},
    )

    warm = _pdas_jit(
        PDASState(x=st64_0.x, y=st64_0.y, w=st64_0.w, z=st64_0.z, lp=lp64p),
        PDASConfig(max_iters=10, gap_tol=0.0, refine_steps=2),
    )
    st64 = PDASState(
        x=warm.x, y=warm.extra["y"], w=warm.extra["w"], z=warm.extra["z"],
        lp=lp64p,
    )

    def dd_split(v):
        v = np.asarray(v, np.float64)
        hi = v.astype(np.float32)
        lo = (v - hi.astype(np.float64)).astype(np.float32)
        return DD(jnp.asarray(hi), jnp.asarray(lo))

    stdd = PDASDDState(
        x=dd_split(warm.x), y=dd_split(warm.extra["y"]),
        w=dd_split(warm.extra["w"]), z=dd_split(warm.extra["z"]),
        lp=lp32p,
    )

    K = 12
    r64 = _pdas_jit(
        st64, PDASConfig(max_iters=K, gap_tol=0.0, refine_steps=2,
                         record_iterates=True)
    )
    rdd = _pdas_dd_jit(
        stdd, PDASConfig(max_iters=K, gap_tol=0.0, refine_steps=2,
                         record_iterates=True)
    )

    steps64 = np.asarray(r64.extra["trace"]["step"])
    assert np.isfinite(steps64[:K]).all(), (
        "fixture must take pure Newton steps (repair/recenter record inf)"
    )
    x64 = np.asarray(r64.extra["trace"]["x"], np.float64)  # (K, N)
    xdd = np.asarray(rdd.extra["trace"]["x"], np.float64) + np.asarray(
        rdd.extra["trace"]["x_lo"], np.float64
    )
    for k in range(K):
        scale = max(1.0, np.abs(x64[k]).max())
        err = np.abs(x64[k] - xdd[k]).max() / scale
        assert err < 1e-6, (k, err)


def test_precision_floor_returns_best_iterate():
    """Pushed past its precision floor, f32 PDAS must return the best-seen
    iterate (not the drifted last one) and say so in the status."""
    from cholesky_is_magic_tpu.solvers.result import Status

    lp64, lp32 = both_dtypes_lp(seed=2)
    cfg = PDASConfig(max_iters=200, gap_tol=1e-9, refine_steps=2)
    r64 = _pdas_jit(make_pdas(lp64), cfg)
    r32 = _pdas_jit(make_pdas(lp32), cfg)
    # f64 reaches the 1e-9 gap; f32 exits at its floor with a good iterate.
    assert int(r64.status) == Status.OPTIMAL
    assert float(r64.extra["gap"]) < 1e-8
    assert int(r32.status) in (Status.PRECISION_FLOOR, Status.OPTIMAL)
    assert float(r32.extra["gap"]) < 1e-4
    assert float(r32.objective) == pytest.approx(float(r64.objective), rel=1e-3, abs=1e-3)


def test_dd_reduction_neg_operand():
    """XLA:CPU fusion trap (docs/DEVNOTES.md "neg upstream of a dd
    reduction"): jitting dd_sum(two_prod(c, -hi)) must still carry the
    compensation.  The SAFE form negates the reduction RESULT; this test
    pins that form exact and documents the hazard by measuring the unsafe
    form (xfail-style: if XLA ever fixes the rewrite, the assertion on
    the safe form still holds and nothing breaks)."""
    import jax

    from cholesky_is_magic_tpu.ops import dd as ddm

    rng = np.random.default_rng(0)
    n = 64
    c = jnp.asarray(rng.normal(size=n), jnp.float32)
    hi = jnp.asarray(rng.normal(size=n), jnp.float32)
    ref = float(np.sum(np.asarray(c, np.float64) * np.asarray(hi, np.float64)))

    def safe(c, hi):  # negate the result, never the operands
        s = ddm.dd_sum(ddm.two_prod(c, hi), axis=-1)
        return ddm.dd_neg(s)

    out = jax.jit(safe)(c, hi)
    got = float(np.asarray(out.hi, np.float64) + np.asarray(out.lo, np.float64))
    assert abs(got + ref) < 1e-12 * max(1.0, abs(ref))
