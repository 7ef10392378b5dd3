"""Primal affine scaling (Dikin interior point) as one jitted while_loop.

Reference: affine-scaling.lisp.  Every safeguard is preserved:

- interior-point initialization heuristics, incl. widening degenerate
  intervals by (-5e-7, +5e7) (make-affine-state, :52-90);
- the Dikin projection min ||x + D c|| s.t. A D x = 0 via one normal-
  equations Cholesky per iteration (project, :98-116);
- gamma = 0.9 step damping and the masked ratio test (max-step, :120-133);
- slack clamped at *max-slack* = 1e8 (:118,137-148);
- centering fallback when the step stalls, and scheduled recentering every
  16 iterations (one-affine-scaling-iteration :192-204, driver :283);
- feasibility-repair least-squares iterations when ||Ax-b|| > 1e-6*m
  (one-repair-iteration :226-243, dispatcher :245-263);
- "singular" and "Unbounded problem" exits (:178-181, :187-188) as status
  codes in the carry.

TPU-first differences from the reference (not a translation):
- the CHOLMOD analyze/factorize/solve pipeline is ops.dense.solve_normal —
  an MXU matmul + Cholesky with double-word iterative refinement;
- sequential ratio tests become masked min-reductions on the VPU;
- the repair-vs-optimize-vs-recenter dispatch is lax.cond inside
  lax.while_loop, so the whole solve is a single XLA computation with no
  host round-trips (the reference crosses the FFI every call,
  SURVEY.md §3.1);
- a singular normal matrix triggers one retry at the repair-sized slack
  cap before aborting (the 1e8 cap on free variables can make N
  numerically rank-deficient; the reference just stops " singular ").

Known algorithmic limitation, faithfully inherited: the ||dg|| < 1e-6
convergence test (:193) measures the direction in the SCALED space, and
free variables carry a 1e8 slack scale, so dg is ~1e-8 * g by
construction — on LPs with active free variables the stop can fire
before optimality (fuzz: 2/38 random free-variable LPs; the reference's
identical test behaves the same).  Use pdas (exact free-variable
handling) for such problems.

Evidence on afiro (tests/test_netlib.py): in f64 this inherited stop
certifies the published optimum -464.753143 to 1e-6 relative (26
iters); the suite's earlier -464.67-class exits are the F32 ITERATE
floor (the scaled direction norm bottoms out at f32 rounding noise, so
the 1e-6 test fires early) — a precision artifact, not a stop-semantics
deviation.  The reference's arithmetic is all f64 and would behave like
the f64 run.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_is_magic_tpu.ingest.device import DeviceLP
from cholesky_is_magic_tpu.solvers.backend import (
    mv_rmv as _mv_rmv,
    row_boost as _row_boost,
    solve_normal_backend as _solve_normal_backend,
)
from cholesky_is_magic_tpu.solvers.result import SolveResult, Status
from cholesky_is_magic_tpu.utils.precision import highest_precision

BIG_BOUND = 1e10  # "effectively infinite" bound threshold (affine-scaling.lisp:67-75)


@dataclasses.dataclass(frozen=True)
class AffineConfig:
    gamma: float = 0.9  # *gamma* (affine-scaling.lisp:135)
    max_slack: float = 1e8  # *max-slack* (:118)
    residual_tol: float = 1e-6  # repair/convergence threshold per row (:249,287)
    direction_tol: float = 1e-6  # stop when ||dg|| below this (:193)
    step_tol: float = 1e-6  # recenter when step*||g|| below this (:200)
    unbounded_step: float = 1e10  # error threshold (:187)
    recenter_every: int = 16  # driver recentering cadence (:283)
    max_iters: int = 500
    refine_steps: int = 1  # dd iterative-refinement steps per solve
    # Record per-iteration (objective, residual norm, ||x_next - x||) into
    # result.extra["trace"] — the TPU rendering of the reference's
    # per-iteration stdout lines (affine-scaling.lisp:189-191, 254-263).
    record_trace: bool = False


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "lp"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class AffineState:
    x: jax.Array
    lp: DeviceLP


def make_affine_state(lp: DeviceLP, x0: Optional[jax.Array] = None) -> AffineState:
    """Interior initialization (make-affine-state, affine-scaling.lisp:52-90).

    ``x0`` warm-starts from a prior iterate (nudged strictly interior).

    Degenerate intervals (u - l < 1e-6) are widened to (l - 5e-7, u + 5e7)
    — the reference's asymmetric widening at :61-62 — then x starts at the
    center of finite boxes, or pulled inside one-sided boxes.  Operates on
    the padded arrays; masked columns keep their inert (-1, 1, x=0) setup.
    """
    l, u, mask = lp.l, lp.u, lp.col_mask
    degenerate = mask & ((u - l) < 1e-6)
    l = jnp.where(degenerate, l - 5e-7, l)
    u = jnp.where(degenerate, u + 5e7, u)
    delta = u - l
    both_free = (l < -BIG_BOUND) & (u > BIG_BOUND)
    low_free = l < -BIG_BOUND
    high_free = u > BIG_BOUND
    x = jnp.where(
        both_free,
        0.0,
        jnp.where(
            low_free,
            u - jnp.minimum(delta / 2, 1.0 + 0.1 * jnp.abs(u)),
            jnp.where(
                high_free,
                l + jnp.minimum(delta / 2, 1.0 + 1.0 * jnp.abs(l)),  # :75 uses 1.0*|l|
                (l + u) / 2,
            ),
        ),
    )
    x = jnp.where(mask, x, 0.0)
    lp = dataclasses.replace(lp, l=jnp.where(mask, l, lp.l), u=jnp.where(mask, u, lp.u))
    if x0 is not None:
        x = _into_interior(jnp.where(mask, x0, 0.0), lp.l, lp.u, mask)
    return AffineState(x=x, lp=lp)


def make_affine_state_sparse(
    sf,
    block: int = 128,
    dtype=None,
    snode_align: bool = True,
    x0: Optional[jax.Array] = None,
):
    """StandardForm -> (AffineState over a fully sparse SparseKKTLP, engine).

    The at-scale construction for the reference's FIRST solver family
    (affine-scaling.lisp drives CHOLMOD on sparse operands end-to-end):
    ELL operands for A and Aᵀ, a pair-schedule tile engine
    (sparse.tiled.engine_for_sparse), and the make-affine-state interior
    init (:52-90) — no dense (m, n) operand is ever materialized.  Pass
    the returned engine to affine_scaling(..., engine=...).  Unlike
    make_pdas_sparse there is NO row equilibration: the reference's
    affine driver runs on the raw standard form (scale-constraints is
    pdas-only, primal-dual-affine-scaling.lisp:50-73).
    """
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.ingest.device import SparseKKTLP
    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    if dtype is None:
        dtype = jnp.float32
    m, n = sf.ncons, sf.nvars
    A = sp.csc_matrix((sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(m, n))
    engine = engine_for_sparse(A, block=block, snode_align=snode_align,
                               dtype=dtype)
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals, (m, n),
                            dtype=dtype)
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals, (n, m),
                             dtype=dtype)
    from cholesky_is_magic_tpu.ops import bell

    EB = bell.from_coo(sf.a_rows, sf.a_cols, sf.a_vals, (m, n), dtype=dtype)
    ETB = bell.from_coo(sf.a_cols, sf.a_rows, sf.a_vals, (n, m), dtype=dtype)
    big = 1e30
    lp = SparseKKTLP(
        E=E,
        ET=ET,
        EB=EB,
        ETB=ETB,
        c=jnp.asarray(sf.c, dtype),
        b=jnp.asarray(sf.b, dtype),
        l=jnp.asarray(np.clip(sf.l, -big, big), dtype),
        u=jnp.asarray(np.clip(sf.u, -big, big), dtype),
        row_mask=jnp.ones(m, bool),
        col_mask=jnp.ones(n, bool),
        m=m,
        n=n,
    )
    return make_affine_state(lp, x0), engine


def _into_interior(x, l, u, mask):
    """Pull x strictly inside [l, u] by a relative epsilon.

    The reference maintains strict interiority by *assertion*
    (affine-scaling.lisp:144; primal-dual-affine-scaling.lisp:323-324) —
    in exact arithmetic the gamma-damped ratio tests guarantee it, but in
    floating point an iterate can land exactly on (or epsilon past) a
    bound, after which every ratio test returns 0 and the solver deadlocks.
    Nudging back inside keeps the invariant the reference assumes.
    """
    eps = 1e-12 if x.dtype == jnp.float64 else 1e-6
    margin = eps * jnp.minimum(1.0, u - l)
    xi = jnp.clip(x, l + margin, u - margin)
    xi = jnp.where(u - l < 2 * margin, 0.5 * (l + u), xi)
    return jnp.where(mask, xi, x)


def _slack(l, x, u, cap, mask):
    """min(cap, x - l, u - x), 1 on masked entries (slack, :137-148)."""
    cap = jnp.asarray(cap, dtype=x.dtype)  # keep f32 states f32 under x64
    s = jnp.minimum(cap, jnp.minimum(x - l, u - x))
    return jnp.where(mask, jnp.maximum(s, 1e-30), 1.0)


def _centering_direction(l, x, u, mask):
    """Pull toward the nearer bound's opposite (:150-163)."""
    both_inf = (l <= -BIG_BOUND) & (u >= BIG_BOUND)
    toward_upper = (x - l) < (u - x)
    d = jnp.where(
        both_inf,
        0.0,
        jnp.where(
            toward_upper,
            jnp.minimum(1.0, u - x),
            jnp.maximum(-1.0, l - x),
        ),
    )
    return jnp.where(mask, d, 0.0)


def _max_step(l, x, u, g, mask):
    """Masked ratio test (max-step, :120-133): largest t with l <= x+tg <= u.

    Each ratio is clamped at >= 0: a negative ratio means x already sits
    (microscopically) outside the box in that coordinate, and any positive
    step would worsen it — the reference's sequential min never sees this
    because it asserts slacks positive and dies instead.
    """
    inf = jnp.asarray(np.inf, dtype=x.dtype)
    step = jnp.where(
        g == 0,
        inf,
        jnp.maximum(jnp.where(g < 0, (l - x) / g, (u - x) / g), 0.0),
    )
    step = jnp.where(mask, step, inf)
    return jnp.min(step)


def _project(lp, scale, c_dir, refine_steps, engine=None, mesh=None):
    """min ||x + [scale]c||  s.t. A[scale]x = 0  (project, :98-116).

    Returns (dg, ok): dg = sc - (AD)ᵀ N⁻¹ (AD) sc with sc = -scale*c and
    N = (AD)(AD)ᵀ (the cholmod-factorize/solve2 hot spot of §3.1),
    solved on whichever backend the operand set selects
    (solvers.backend.solve_normal_backend): dense MXU, tile engine,
    fully sparse ELL, or the tensor-parallel shard_map pipeline.  The
    algebra is operand-agnostic: AD·v = A(scale∘v), (AD)ᵀy = scale∘(Aᵀy).
    """
    mv, rmv = _mv_rmv(lp)
    sc = -(scale * c_dir)
    v = mv(scale * sc)
    boost = _row_boost(lp)
    y, ok = _solve_normal_backend(lp, engine, scale, v, boost, refine_steps,
                                  mesh)
    dg = sc - scale * rmv(y)
    return jnp.where(lp.col_mask, dg, 0.0), ok


def _residual(lp, x):
    mv, _ = _mv_rmv(lp)
    return lp.b - mv(x)


def _scaling_step(state: AffineState, centering, cfg: AffineConfig,
                  engine=None, mesh=None):
    """one-affine-scaling-iteration (:165-207) minus the recursion; returns
    (new_x, continue, status, step_norm_g, norm_dg, descent, ok)."""
    lp = state.lp
    x = state.x
    c_dir = jax.lax.cond(
        centering,
        lambda: _centering_direction(lp.l, x, lp.u, lp.col_mask),
        lambda: lp.c,
    )
    slack = _slack(lp.l, x, lp.u, cfg.max_slack, lp.col_mask)
    dg, ok = _project(lp, slack, c_dir, cfg.refine_steps, engine, mesh)

    # Adaptive slack-cap fallback (TPU-build safeguard): with free
    # variables the *max-slack* = 1e8 cap scales their normal-matrix
    # contribution by 1e16, which can make the Cholesky numerically
    # rank-deficient; the reference prints " singular " and stops at a
    # non-optimal point.  Retry with the repair-sized cap sqrt(1e8)
    # before giving up.
    def retry():
        slack2 = _slack(lp.l, x, lp.u, np.sqrt(cfg.max_slack), lp.col_mask)
        dg2, ok2 = _project(lp, slack2, c_dir, cfg.refine_steps, engine, mesh)
        return slack2, dg2, ok2

    slack, dg, ok = jax.lax.cond(ok, lambda: (slack, dg, ok), retry)
    g = dg * slack
    step = cfg.gamma * _max_step(lp.l, x, lp.u, g, lp.col_mask)
    norm_g = jnp.linalg.norm(g)
    norm_dg = jnp.linalg.norm(dg)
    descent = jnp.dot(g, lp.c)
    unbounded = step > cfg.unbounded_step
    new_x = x + jnp.minimum(step, cfg.unbounded_step) * g
    new_x = _into_interior(new_x, lp.l, lp.u, lp.col_mask)
    return new_x, ok, unbounded, step, norm_g, norm_dg, descent


def _optimize_iteration(state: AffineState, centering, cfg: AffineConfig,
                        engine=None, mesh=None):
    """The optimize/recenter path with the stall-retry: when a non-centering
    step stalls (step*||g|| < tol), retry once as a centering step (:200-204)."""
    lp = state.lp
    x0 = state.x
    new_x, ok, unbounded, step, norm_g, norm_dg, descent = _scaling_step(
        state, centering, cfg, engine, mesh
    )

    # True variable count, not the padded length (affine-scaling.lisp:193-194
    # uses (length x)): padding would loosen the stop for small LPs and make
    # results vary with pad_multiple.
    n_rows = jnp.asarray(lp.n, dtype=x0.dtype)
    converged_dir = norm_dg < jnp.minimum(cfg.direction_tol, 1e-8 * n_rows)
    not_descent = descent > 0
    stalled = (step * norm_g) < cfg.step_tol

    def handle_non_centering():
        # Early exits only apply to optimize steps (:192-199).
        stop = converged_dir | not_descent

        def retry_centering():
            # " ... " retry (:200-204): redo the iteration as centering.
            rx, rok, runb, *_ = _scaling_step(
                state, jnp.asarray(True), cfg, engine, mesh)
            return rx, rok, runb, jnp.asarray(True)

        def accept():
            return new_x, ok, unbounded, jnp.asarray(True)

        def stopped():
            return x0, ok, unbounded, jnp.asarray(False)

        return jax.lax.cond(
            stop,
            stopped,
            lambda: jax.lax.cond(stalled, retry_centering, accept),
        )

    def handle_centering():
        return new_x, ok, unbounded, jnp.asarray(True)

    rx, rok, runb, cont = jax.lax.cond(
        centering, handle_centering, handle_non_centering
    )
    # A singular projection aborts (:178-181).
    cont = cont & rok
    status = jnp.where(
        ~rok,
        Status.SINGULAR,
        jnp.where(runb, Status.UNBOUNDED, Status.RUNNING),
    ).astype(jnp.int32)
    rx = jnp.where(rok & ~runb, rx, x0)
    return rx, cont, status


def _repair_iteration(state: AffineState, residual, cfg: AffineConfig,
                      engine=None, mesh=None):
    """Least-squares step back toward Ax = b (one-repair-iteration, :226-243):
    dg = (AD)ᵀ N⁻¹ r, step = gamma * min(max-step, 1/gamma)."""
    lp = state.lp
    x = state.x
    slack = _slack(lp.l, x, lp.u, np.sqrt(cfg.max_slack), lp.col_mask)
    _, rmv = _mv_rmv(lp)
    boost = _row_boost(lp)
    y, ok = _solve_normal_backend(
        lp, engine, slack, residual, boost, cfg.refine_steps, mesh
    )
    dg = jnp.where(lp.col_mask, slack * rmv(y), 0.0)
    g = dg * slack
    step = cfg.gamma * jnp.minimum(
        _max_step(lp.l, x, lp.u, g, lp.col_mask), 1.0 / cfg.gamma
    )
    new_x = jnp.where(ok, _into_interior(x + step * g, lp.l, lp.u, lp.col_mask), x)
    status = jnp.where(ok, Status.RUNNING, Status.SINGULAR).astype(jnp.int32)
    return new_x, jnp.asarray(True) & ok, status


def affine_scaling(
    state: AffineState,
    config: Optional[AffineConfig] = None,
    engine=None,
    mesh=None,
) -> SolveResult:
    """The driver loop (affine-scaling, :265-297) as lax.while_loop.

    The symbolic-analysis-once / numeric-factor-per-iteration split
    (cholmod-analyze at :271) is XLA's jit cache here: the factorization
    graph is compiled once and re-executed with recycled buffers.

    ``engine`` swaps every normal-equations solve in the loop onto a
    planned tile factorization (sparse.tiled / sparse.factor); with a
    fully sparse state (make_affine_state_sparse) it is required and all
    matvecs run over ELL operands — no dense (m, n) operand exists.
    ``mesh`` runs the solves column-sharded over the mesh's 'tp' axis
    (parallel.sharded) — same modes as pdas.
    """
    cfg = config or AffineConfig()
    return _affine_scaling_jit(state, cfg, engine, mesh)


@highest_precision
@partial(jax.jit, static_argnames=("cfg", "engine", "mesh"))
def _affine_scaling_jit(state: AffineState, cfg: AffineConfig, engine=None,
                        mesh=None) -> SolveResult:
    lp = state.lp
    m_real = jnp.asarray(lp.m, dtype=lp.c.dtype)

    def body(carry):
        x, i, _cont, _status, trace = carry
        st = AffineState(x=x, lp=lp)
        residual = _residual(lp, x)
        norm = jnp.linalg.norm(residual)
        needs_repair = norm > cfg.residual_tol * m_real
        centering = (i + 1) % cfg.recenter_every == 0  # driver :283

        new_x, cont, status = jax.lax.cond(
            needs_repair,
            lambda: _repair_iteration(st, residual, cfg, engine, mesh),
            lambda: _optimize_iteration(st, centering, cfg, engine, mesh),
        )
        if cfg.record_trace:
            vals = (jnp.dot(x, lp.c), norm, jnp.linalg.norm(new_x - x))
            trace = jax.tree.map(lambda a, v: a.at[i].set(v), trace, vals)
        return new_x, i + 1, cont, status, trace

    def cond(carry):
        x, i, cont, status, _trace = carry
        norm = jnp.linalg.norm(_residual(lp, x))
        # Driver stop (:284-291): stop when the last iteration said stop AND
        # the iterate is feasible; also stop on fatal status or max iters.
        keep_going = cont | (norm > cfg.residual_tol * m_real)
        fatal = (status != Status.RUNNING)
        return keep_going & ~fatal & (i < cfg.max_iters)

    x0 = state.x
    dt = x0.dtype
    trace0 = (
        (jnp.full(cfg.max_iters, np.nan, dt),) * 3
        if cfg.record_trace
        else (jnp.zeros(0, dt),) * 3
    )
    x, iters, cont, status, trace = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(0, jnp.int32), jnp.asarray(True),
                     jnp.asarray(Status.RUNNING, jnp.int32), trace0)
    )
    resid = jnp.linalg.norm(_residual(lp, x))
    feasible = resid <= cfg.residual_tol * m_real
    final_status = jnp.where(
        status != Status.RUNNING,
        status,
        jnp.where(
            feasible & ~cont,
            Status.OPTIMAL,
            jnp.where(iters >= cfg.max_iters, Status.MAX_ITERS, Status.OPTIMAL),
        ),
    ).astype(jnp.int32)
    return SolveResult(
        x=x,
        objective=jnp.dot(x, lp.c),
        status=final_status,
        iterations=iters,
        residual_norm=resid,
        extra={
            "trace": {
                "objective": trace[0], "residual": trace[1], "step": trace[2],
            },
        },
    )
