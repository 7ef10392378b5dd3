"""Augmented Lagrangian Method outer loops over the APPROX inner solver.

Reference: alm-approx.lisp §2.10 — all four outer-loop variants:

- :func:`alm`             — the production driver (alm, :539-561) over
  :func:`alm_iteration2`  (adaptive mu from the violation-improvement
  ratio, clamped multipliers, :493-537);
- :func:`alm_iteration`   — the v1 LANCELOT-style minor/major schedule
  (:451-491);
- :func:`aalm`            — Nesterov-extrapolated multipliers (:563-610;
  the reference notes it is "not very good" — kept for parity);
- :func:`adcd`            — the experimental alternating direction variant
  (:612-656) with its staged mu escalation.

The whole ALM loop (outer multiplier updates + inner APPROX while_loop) is
one jitted computation: the subproblem "rebuild" (fold lambdaᵀA into the
linear term, sqrt(mu) into the quad scales — make-alm-subproblem
:355-401) is plain array arithmetic, so no host round-trips are needed
anywhere.  Multiplier sign bounds come from the row types
(make-alm, :427-449).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_is_magic_tpu.ingest.device import DeviceLP
from cholesky_is_magic_tpu.ingest.standard_form import StandardForm
from cholesky_is_magic_tpu.solvers.approx import (
    approx,
    _approx_dd,
    _approx_jit,
    _dd_ops,
    dual_value,
    make_alm_subproblem,
    project_box,
    quad_violations,
)
from cholesky_is_magic_tpu.utils.precision import highest_precision

BIG = 1e30


@dataclasses.dataclass(frozen=True)
class ALMConfig:
    """Defaults follow the reference's f64 tolerances (1e-5/1e-6).  For
    f32 problems use ~1e-4 for violation_tol/pg_tol/omega_floor: tighter
    targets are below f32 resolution and the inner APPROX loop will burn
    its full budget every outer step without converging."""

    mu0: float = 10.0  # initial penalty (make-alm :427)
    mu_max: float = 1e7  # cap (:529; v1 uses 1e6 at :485)
    violation_tol: float = 1e-5  # outer stop (:556)
    pg_tol: float = 1e-5  # outer stop (:557)
    omega_floor: float = 1e-6  # inner-accuracy floor (:505,531)
    inner_iters: int = 1_000_000  # approx budget per outer step (:503)
    max_outer: int = 10_000  # (:546)
    # Record per-outer-step (violation, mu, pg, value) into result.trace —
    # the reference prints these every alm iteration (alm-approx.lisp
    # :533-536, :465).  Allocates max_outer floats per series; size
    # max_outer accordingly when tracing.
    record_trace: bool = False
    # Run the inner APPROX loop in double-word precision (dd iterates +
    # dd gradients over the block-ELL operands — approx._approx_dd).  The
    # escape from the f32 wall: on f32 operands the projected gradient
    # floors at ~1e-2-1e-3 (cancellation in r = Ax-b and g, updates below
    # ulp(z)), so the reference's 1e-5/1e-5 outer stop
    # (alm-approx.lisp:556-558) is unreachable; in dd it is.  ~3-5x the
    # f32 inner-iteration cost — warm-start it from a stalled f32 run,
    # keeping the MULTIPLIERS but RESETTING mu to a moderate value
    # (~100): the f32 phase inflates mu toward mu_max because its
    # precision floor fakes "no improvement" to the growth rule, and an
    # accelerated first-order inner method at mu~1e7 needs ~L/k^2
    # iterations per digit (measured: pg floors at 1.3e-2 inheriting mu,
    # converges at mu=100 — tests/test_solvers.py::TestALMDD).
    # examples/alm_e2e_verdict.py shows the two-phase protocol.
    dd_gradient: bool = False


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lp", "mu", "omega", "nu", "multipliers", "mult_l", "mult_u"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ALMState:
    """alm-state (:411-419) + the multiplier clamp bounds."""

    lp: DeviceLP
    mu: jax.Array
    omega: jax.Array
    nu: jax.Array
    multipliers: jax.Array  # (M,)
    mult_l: jax.Array  # (M,) lower clamp (0 for '<=' rows)
    mult_u: jax.Array  # (M,) upper clamp (0 for '>=' rows)


def make_alm(
    lp,
    mu: float = 10.0,
    multipliers: Optional[jax.Array] = None,
) -> ALMState:
    """make-alm (:427-449): multiplier sign bounds from row types — lambda
    >= 0 on '<=' rows, <= 0 on '>=' rows, free on equalities; padded rows
    pinned at 0.  Accepts a dense DeviceLP or an ELL SparseLP."""
    from cholesky_is_magic_tpu.ingest.device import SparseLP

    dtype = lp.E.values.dtype if isinstance(lp, SparseLP) else lp.A.dtype
    low = jnp.where(lp.row_type == StandardForm.ROW_LE, 0.0, -BIG)
    high = jnp.where(lp.row_type == StandardForm.ROW_GE, 0.0, BIG)
    if not isinstance(lp, SparseLP):
        low = jnp.where(lp.row_mask, low, 0.0)
        high = jnp.where(lp.row_mask, high, 0.0)
    low = low.astype(dtype)
    high = high.astype(dtype)
    mu = jnp.asarray(mu, dtype)
    return ALMState(
        lp=lp,
        mu=mu,
        omega=1.0 / mu,
        nu=(1.0 / mu) ** 0.1,
        multipliers=(
            multipliers
            if multipliers is not None
            else jnp.zeros(lp.b.shape, dtype)
        ),
        mult_l=low,
        mult_u=high,
    )


class ALMResult(NamedTuple):
    x: jax.Array
    multipliers: jax.Array
    violation: jax.Array  # inf-norm of constraint violation
    pg: jax.Array  # final inner projected-gradient norm
    value: jax.Array  # dual value at the solution
    outer_iterations: jax.Array
    inner_iterations: jax.Array  # *approx-iterations* total (:540)
    # Per-outer-step series (violation, mu, pg, value) when
    # ALMConfig.record_trace; empty arrays otherwise.
    trace: Optional[dict] = None
    # Final penalty parameter — lets a caller warm-restart the outer loop
    # (make_alm(lp, mu=float(res.mu), multipliers=res.multipliers)) for
    # wall-clock-budgeted runs (examples/alm_e2e_verdict.py).
    mu: Optional[jax.Array] = None


def _iteration2(state: ALMState, x, precision, has_x, cfg: ALMConfig):
    """alm-iteration2 (:493-537): solve the subproblem, update clamped
    multipliers, adapt mu from the violation-improvement ratio."""
    prob = make_alm_subproblem(state.lp, state.multipliers, state.mu)
    viol0 = jnp.linalg.norm(quad_violations(prob, x))
    res = _approx_jit(prob, project_box(prob, x), precision, cfg.inner_iters)
    viol = quad_violations(prob, res.x)
    viol2 = jnp.linalg.norm(viol)
    value = dual_value(prob, res.x)
    # Floor must be representable in the WORKING dtype: 1e-300 underflows
    # to 0.0 in f32, making an exactly-converged subproblem (viol0 = 0,
    # reachable in f32) produce improvement = 0/0 = NaN and poison mu.
    tiny = jnp.asarray(jnp.finfo(viol0.dtype).tiny, viol0.dtype)
    improvement = viol2 / jnp.maximum(viol0, tiny)
    lam = jnp.clip(
        state.multipliers + state.mu * viol, state.mult_l, state.mult_u
    )
    growth = jnp.where(
        has_x, jnp.maximum(1.0, jnp.minimum(2.0 * improvement, 2.0)), 1.0
    )
    mu = jnp.minimum(state.mu * growth, cfg.mu_max)
    new_state = dataclasses.replace(
        state,
        multipliers=lam,
        mu=mu,
        nu=mu ** -0.1,
        omega=jnp.maximum(1.0 / mu, cfg.omega_floor),
    )
    return new_state, res, viol, value


def _iteration2_dd(state: ALMState, x_dd, precision, has_x, cfg: ALMConfig):
    """alm-iteration2 with the double-word inner driver (approx._approx_dd):
    identical multiplier/mu/omega updates, but the violation is measured
    from the dd residual (in f32 it would floor at the cancellation the dd
    gradient exists to remove) and the iterate stays dd across outer steps."""
    from cholesky_is_magic_tpu.ops import dd as ddm

    prob = make_alm_subproblem(state.lp, state.multipliers, state.mu)
    # ||A x - b|| at the incoming iterate, dd-measured.
    mv, _ = _dd_ops(state.lp)
    r0 = ddm.dd_add_w(mv(x_dd), -prob.q)
    viol0 = jnp.linalg.norm(r0.hi + r0.lo)
    z, pg, iters, r_z = _approx_dd(
        state.lp, prob, state.multipliers, state.mu, x_dd, precision,
        cfg.inner_iters,
    )
    viol = jnp.where(prob.s != 0, r_z.hi + r_z.lo, 0.0)
    viol2 = jnp.linalg.norm(viol)
    value = dual_value(prob, z.hi + z.lo)
    tiny = jnp.asarray(jnp.finfo(viol0.dtype).tiny, viol0.dtype)
    improvement = viol2 / jnp.maximum(viol0, tiny)
    lam = jnp.clip(
        state.multipliers + state.mu * viol, state.mult_l, state.mult_u
    )
    growth = jnp.where(
        has_x, jnp.maximum(1.0, jnp.minimum(2.0 * improvement, 2.0)), 1.0
    )
    mu = jnp.minimum(state.mu * growth, cfg.mu_max)
    new_state = dataclasses.replace(
        state,
        multipliers=lam,
        mu=mu,
        nu=mu ** -0.1,
        omega=jnp.maximum(1.0 / mu, cfg.omega_floor),
    )
    return new_state, z, pg, iters, viol, value


def alm(
    state: ALMState,
    x0: Optional[jax.Array] = None,
    config: Optional[ALMConfig] = None,
) -> ALMResult:
    """The driver (alm, :539-561): outer stop at inf-norm violation and
    projected gradient both below 1e-5, with the monotone accuracy
    tightening schedule."""
    cfg = config or ALMConfig()
    n_cols = state.lp.c.shape[0]
    dtype = state.multipliers.dtype
    x_init = x0 if x0 is not None else jnp.zeros(n_cols, dtype)
    if cfg.dd_gradient:
        _dd_ops(state.lp)  # raise early (host-side) if operands unsuitable
    return _alm_jit(state, x_init, cfg)


@highest_precision
@partial(jax.jit, static_argnames=("cfg",))
def _alm_jit(state: ALMState, x_init, cfg: ALMConfig) -> ALMResult:
    from cholesky_is_magic_tpu.ops import dd as ddm

    dtype = x_init.dtype
    inf = jnp.asarray(np.inf, dtype)
    dd = cfg.dd_gradient  # static: picks the carry pytree shape at trace time

    def body(carry):
        st, x, accuracy, i, _v, _pg, _val, inner, trace = carry
        precision = jnp.minimum(accuracy, st.omega)
        if dd:
            st2, x2, pg, iters, viol, value = _iteration2_dd(
                st, x, precision, i > 0, cfg)
        else:
            st2, res, viol, value = _iteration2(st, x, precision, i > 0, cfg)
            x2, pg, iters = res.x, res.pg, res.iterations
        v = jnp.max(jnp.abs(viol))
        accuracy = jnp.minimum(accuracy, jnp.maximum(cfg.violation_tol, v))
        accuracy = jnp.where(v < cfg.violation_tol, cfg.violation_tol, accuracy)
        if cfg.record_trace:
            vals = (v, st.mu, pg, value)
            trace = jax.tree.map(lambda a, t: a.at[i].set(t), trace, vals)
        return (st2, x2, accuracy, i + 1, v, pg, value,
                inner + iters, trace)

    def cond(carry):
        _st, _x, _acc, i, v, pg, _val, _inner, _trace = carry
        return ((v > cfg.violation_tol) | (pg > cfg.pg_tol)) & (i < cfg.max_outer)

    trace0 = (
        (jnp.full(cfg.max_outer, np.nan, dtype),) * 4
        if cfg.record_trace
        else (jnp.zeros(0, dtype),) * 4
    )
    x0 = ddm.dd_from(x_init) if dd else x_init
    st, x, _acc, iters, v, pg, value, inner, trace = jax.lax.while_loop(
        cond,
        body,
        (state, x0, inf, jnp.asarray(0, jnp.int32), inf, inf, inf,
         jnp.asarray(0, jnp.int32), trace0),
    )
    return ALMResult(
        x=(x.hi + x.lo) if dd else x,
        multipliers=st.multipliers,
        violation=v,
        pg=pg,
        value=value,
        outer_iterations=iters,
        inner_iterations=inner,
        trace={
            "violation": trace[0], "mu": trace[1], "pg": trace[2],
            "value": trace[3],
        },
        mu=st.mu,
    )


def alm_iteration(state: ALMState, x, precision=None, cfg: Optional[ALMConfig] = None):
    """The v1 LANCELOT-style minor/major update (alm-iteration, :451-491):
    minor step (multipliers only, tighter nu/omega) when ||viol|| < nu,
    major step (mu *= 1.5) otherwise.  Host-callable single outer step."""
    cfg = cfg or ALMConfig()
    prob = make_alm_subproblem(state.lp, state.multipliers, state.mu)
    prec = precision if precision is not None else jnp.maximum(state.omega, 1e-5)
    res = approx(prob, cfg.inner_iters, x, prec)
    viol = quad_violations(prob, res.x)
    viol2 = jnp.linalg.norm(viol)
    value = dual_value(prob, res.x)
    lam = state.multipliers + state.mu * viol
    minor = viol2 < state.nu

    def minor_update():
        return dataclasses.replace(
            state,
            multipliers=lam,
            nu=state.nu / state.mu**0.9,
            omega=jnp.maximum(state.omega / state.mu, 1e-5),
        )

    def major_update():
        mu = jnp.minimum(1.5 * state.mu, 1e6)
        return dataclasses.replace(
            state,
            multipliers=lam,
            mu=mu,
            nu=mu ** -0.1,
            omega=jnp.maximum(1.0 / mu, 1e-5),
        )

    new_state = jax.lax.cond(minor, minor_update, major_update)
    return new_state, res.x, viol, value


def _next_extrapolation(weight):
    # next-extrapolation (:563-564).
    return 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * weight * weight))


def aalm(
    state: ALMState,
    x0: Optional[jax.Array] = None,
    config: Optional[ALMConfig] = None,
) -> ALMResult:
    """Accelerated ALM (aalm, :579-610): Nesterov extrapolation on the
    multiplier sequence.  Kept for parity; the reference notes it under-
    performs plain alm (:578).

    Deviation (documented in PARITY.md): the extrapolated multipliers are
    clamped to the row-type sign bounds, exactly as alm-iteration2 clamps
    its raw update (:516-521) — the reference extrapolates unclamped,
    which in f32 lets wrong-signed multipliers blow the subproblem up to
    NaN (measured on the simple.mps fixture at outer step 38)."""
    cfg = config or ALMConfig()
    dtype = state.multipliers.dtype
    x_init = x0 if x0 is not None else jnp.zeros(state.lp.c.shape, dtype)
    return _aalm_jit(state, x_init, cfg)


@highest_precision
@partial(jax.jit, static_argnames=("cfg",))
def _aalm_jit(state: ALMState, x_init, cfg: ALMConfig) -> ALMResult:
    dtype = x_init.dtype
    inf = jnp.asarray(np.inf, dtype)

    def extrapolate(weight, prev, accelerated, current):
        nxt = _next_extrapolation(weight)
        vanilla = (weight - 1.0) / nxt
        accel = weight / nxt
        return current + vanilla * (current - prev) + accel * (current - accelerated)

    def body(carry):
        st, x, accuracy, i, _v, _pg, _val, inner, prev_mult, weight = carry
        prev_accel = st.multipliers
        precision = jnp.minimum(accuracy, st.omega)
        st2, res, viol, value = _iteration2(st, x, precision, i > 0, cfg)
        v = jnp.max(jnp.abs(viol))
        accuracy = jnp.minimum(accuracy, jnp.maximum(1e-6, v))
        accuracy = jnp.where(v < cfg.violation_tol, 1e-6, accuracy)
        new_mult = extrapolate(weight, prev_mult, prev_accel, st2.multipliers)
        new_mult = jnp.clip(new_mult, st2.mult_l, st2.mult_u)
        st3 = dataclasses.replace(st2, multipliers=new_mult)
        return (
            st3, res.x, accuracy, i + 1, v, res.pg, value,
            inner + res.iterations, st2.multipliers, _next_extrapolation(weight),
        )

    def cond(carry):
        _st, _x, _acc, i, v, pg, val, _inner, _pm, _w = carry
        return (
            (v > cfg.violation_tol)
            | ((pg > cfg.pg_tol) & (pg > 2e-6 * (1.0 + jnp.abs(val))))
        ) & (i < cfg.max_outer)

    one = jnp.asarray(1.0, dtype)
    st, x, _acc, iters, v, pg, value, inner, _pm, _w = jax.lax.while_loop(
        cond,
        body,
        (state, x_init, inf, jnp.asarray(0, jnp.int32), inf, inf, inf,
         jnp.asarray(0, jnp.int32), state.multipliers, one),
    )
    return ALMResult(
        x=x, multipliers=st.multipliers, violation=v, pg=pg, value=value,
        outer_iterations=iters, inner_iterations=inner, mu=st.mu,
    )


def adcd_iteration(state: ALMState, x, has_x, cfg: Optional[ALMConfig] = None):
    """The experimental alternating-direction variant (adcd-iteration,
    :612-656): short inner solves far from feasibility, staged mu
    escalation, done when pg < 1e-2 and ||viol|| < 1e-2.

    Returns (new_state, x, done, pg).  The 10000-vs-100 inner budget
    switch is data-dependent; both branches run under lax.cond."""
    cfg = cfg or ALMConfig()
    prob = make_alm_subproblem(state.lp, state.multipliers, state.mu)
    viol_x = jnp.linalg.norm(quad_violations(prob, x))
    close = has_x & (viol_x < 5e-2)
    x0 = project_box(prob, x)
    acc = jnp.asarray(1e-2, x0.dtype)
    res = jax.lax.cond(
        close,
        lambda: _approx_jit(prob, x0, acc, 10_000),
        lambda: _approx_jit(prob, x0, acc, 100),
    )
    viol = quad_violations(prob, res.x)
    viol2 = jnp.linalg.norm(viol)
    out_close = res.pg < 5e-2
    almost = viol2 < 5e-2
    done = (res.pg < 1e-2) & (viol2 < 1e-2)
    weight = jnp.where(out_close, 1.0, 0.5) * state.mu
    lam = state.multipliers + weight * viol
    mu = jnp.minimum(
        1e6,
        state.mu * jnp.where(out_close & almost, 1.0, jnp.where(out_close, 10.0, 1.0)),
    )
    new_state = dataclasses.replace(
        state,
        multipliers=lam,
        mu=mu,
        nu=mu ** -0.1,
        omega=1.0 / mu,
    )
    return new_state, res.x, done, res.pg


def adcd(
    state: ALMState,
    x0: Optional[jax.Array] = None,
    config: Optional[ALMConfig] = None,
) -> ALMResult:
    """Driver for the experimental alternating-direction variant: iterate
    adcd_iteration until its `done` signal (the reference's
    ``throw 'done`` out of a ``catch`` block, alm-approx.lisp:637-639) or
    cfg.max_outer.  A host loop over the jitted iteration — matching the
    reference, which also drives this one step at a time."""
    cfg = config or ALMConfig()
    dtype = state.multipliers.dtype
    x = x0 if x0 is not None else jnp.zeros(state.lp.c.shape, dtype)
    has_x = jnp.asarray(False)
    done = jnp.asarray(False)
    pg = jnp.asarray(np.inf, dtype)
    outer = 0
    for outer in range(1, cfg.max_outer + 1):
        state, x, done, pg = adcd_iteration(state, x, has_x, cfg)
        has_x = jnp.asarray(True)
        if bool(done):
            break
    prob = make_alm_subproblem(state.lp, state.multipliers, state.mu)
    viol = quad_violations(prob, x)
    return ALMResult(
        x=x, multipliers=state.multipliers,
        violation=jnp.max(jnp.abs(viol)),
        pg=pg,
        value=dual_value(prob, x),
        outer_iterations=jnp.asarray(outer, jnp.int32),
        inner_iterations=jnp.asarray(0, jnp.int32),
        mu=state.mu,
    )
