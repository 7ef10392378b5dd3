"""Double-word-state PDAS: 1e-8 duality gaps on f32 hardware.

The standard f32 PDAS bottoms out near gap ~1e-6: the *iterates* only
carry 24 mantissa bits, so violations smaller than eps * |x| are invisible
and further steps are noise (solvers/pdas.py exits at PRECISION_FLOOR).
The f64 path reaches 1e-9 — but f64 on TPU is software-emulated and
~1000x too slow (docs/DEVNOTES.md).

This solver is the TPU-native answer (BASELINE.md north star: "solve ...
to 1e-8 relative duality gap ... iterative refinement and fp32/fp64-
emulation mixed precision"):

- the iterates x, y, w, z live in **double-word** form (hi + lo f32 pairs,
  ~48 mantissa bits — ops/dd.py);
- the Newton RIGHT-HAND SIDES (slacks, complementarities w∘su / z∘sl,
  primal and dual residuals) are evaluated in double-word arithmetic, so a
  1e-8-sized violation against O(1) data is computed to full relative
  precision;
- the KKT *solve* runs in plain f32 on the MXU: near convergence the rhs
  magnitudes are ~gap, so an f32-relative-accurate direction has ~gap*1e-7
  absolute error — far below what the gamma-damped step needs;
- updates accumulate error-free: state <- dd(state) - t * dx.

This is iterative-refinement-flavored IPM: f32 speed where the flops are,
double-word precision exactly where small-residual cancellation happens.
Numbers (CPU validation, same code path): plain f32 floors at ~1e-6;
dd-state reaches <= 1e-8 gaps, matching the f64 trajectory.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_is_magic_tpu.ingest.device import DeviceLP
from cholesky_is_magic_tpu.kkt.newton import dense_kkt_operator
from cholesky_is_magic_tpu.ops import dd as ddm
from cholesky_is_magic_tpu.ops.dd import DD
from cholesky_is_magic_tpu.solvers.pdas import PDASConfig, PDASState, make_pdas
from cholesky_is_magic_tpu.solvers.result import SolveResult, Status
from cholesky_is_magic_tpu.utils.precision import highest_precision


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "w", "z", "lp"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PDASDDState:
    """PDAS state with double-word iterates."""

    x: DD
    y: DD
    w: DD
    z: DD
    lp: DeviceLP


def make_pdas_dd(
    lp: DeviceLP,
    config: Optional[PDASConfig] = None,
    warm=None,
    recenter_duals: bool = True,
    warm_push: float = 0.0,
    warm_blend: float = 0.0,
) -> PDASDDState:
    """Promote the standard f32 initialization to double-word.

    ``warm`` restarts from prior iterates — a PDASState, or a pdas()
    SolveResult (its x plus the y/w/z in extra).  pdas_dd is Newton-only
    (no repair/recenter), so on LPs whose cold start is primal-infeasible
    the intended flow is: pdas() to feasibility/centering at its 1e-4
    gap, then this solver to the tight gap (the reference reaches both
    with one fp64 path; the TPU build splits robustness and precision).

    ``recenter_duals`` (warm starts only): reset the bound duals to the
    complementarity-balanced point w = mu/su, z = mu/sl with mu the warm
    iterates' average complementarity over PRESENT bounds (slack below
    the KKT filter threshold).  Newton-only affine steps can diverge from
    unbalanced warm duals (w_i su_i spread over decades); the mu-reset
    puts the start on the central path — the standard IPM warm-start
    recipe.  Measured on afiro/f32: diverging warm start -> gap 1.7e-10
    in 17 iterations.

    ``warm_push`` (warm starts only): re-open the warm iterate's bound
    slacks to at least this margin before recentering
    (solvers.pdas.push_interior).  Required (~1e-2) when the warm point
    comes from a *perturbed* instance of the LP — this solver is
    Newton-only, and a point jammed on a now-wrong active set stalls the
    ratio tests (measured: 2%-drifted c, push 0 stalls at gap 3e-2; push
    1e-2 converges in 2/3 of the cold iteration count).  Leave 0 for
    same-LP continuations (the pdas -> pdas_dd finisher flow), where the
    push only costs iterations.

    ``warm_blend`` (warm starts only): mix the cold init into the warm
    iterates (make_pdas's Skajaa-Andersen-style blend) — the BETTER
    perturbed-re-solve recipe when combined with ``mehrotra=True``:
    blend 0.2, no push, ``recenter_duals=False`` runs the 2%-drift chain
    at 25fv47 scale in 0.63x the cold iteration count with no phase-1
    solve (examples/warm_resolve.py).  When > 0 the mu dual reset is
    skipped automatically (the blended duals already carry interior
    margin; resetting them re-destroys the warm dual information).
    """
    from cholesky_is_magic_tpu.solvers.result import SolveResult

    if isinstance(warm, SolveResult):
        warm = PDASState(
            x=warm.x, y=warm.extra["y"], w=warm.extra["w"], z=warm.extra["z"],
            lp=None,
        )
    st = make_pdas(lp, config, warm=warm, warm_push=warm_push,
                   warm_blend=warm_blend)
    w, z = st.w, st.z
    if warm is not None and recenter_duals and warm_blend == 0.0:
        w, z = mu_recentered_duals(st.x, st.lp.l, st.lp.u, w, z, st.lp.col_mask)
    return PDASDDState(
        x=ddm.dd_from(st.x),
        y=ddm.dd_from(st.y),
        w=ddm.dd_from(w),
        z=ddm.dd_from(z),
        lp=st.lp,
    )


def mu_recentered_duals(x, l, u, w, z, mask):
    """Complementarity-balanced dual reset (see make_pdas_dd): w = mu/su,
    z = mu/sl with mu the average complementarity over present bounds."""
    from cholesky_is_magic_tpu.kkt.newton import FILTER_THRESHOLD

    floor = 1e-7 if x.dtype == jnp.float32 else 1e-14
    sl = jnp.where(mask, jnp.maximum(x - l, floor), 1.0)
    su = jnp.where(mask, jnp.maximum(u - x, floor), 1.0)
    pu = mask & (su <= FILTER_THRESHOLD)
    pl = mask & (sl <= FILTER_THRESHOLD)
    terms = jnp.sum(jnp.where(pu, w * su, 0.0)) + jnp.sum(
        jnp.where(pl, z * sl, 0.0)
    )
    count = jnp.maximum(jnp.sum(pu) + jnp.sum(pl), 1)
    mu = jnp.maximum(terms / count, 1e-12)
    w = jnp.where(mask, jnp.clip(mu / su, 1e-8, 1e8), 1.0)
    z = jnp.where(mask, jnp.clip(mu / sl, 1e-8, 1e8), 1.0)
    return w, z


def make_pdas_dd_sparse(
    sf,
    block: int = 128,
    config: Optional[PDASConfig] = None,
    dtype=None,
    snode_align: bool = True,
):
    """StandardForm -> (dd state over a fully sparse SparseKKTLP, engine).

    The double-word promotion of solvers.pdas.make_pdas_sparse: no dense
    (m, n) operand is ever materialized — memory follows nnz(A) + nnz(L)
    tiles.  Pass the engine to pdas_dd(..., engine=...).
    """
    from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse

    st, engine = make_pdas_sparse(
        sf, block=block, config=config, dtype=dtype, snode_align=snode_align
    )
    return (
        PDASDDState(
            x=ddm.dd_from(st.x),
            y=ddm.dd_from(st.y),
            w=ddm.dd_from(st.w),
            z=ddm.dd_from(st.z),
            lp=st.lp,
        ),
        engine,
    )


def _linops(lp):
    """The three double-word A-products the loop needs, dispatched on the
    operand set: dense (DeviceLP.A, ops.dd incl. the Pallas kernels) or
    fully sparse (SparseKKTLP's ELL pair, ops.sparse_ops)."""
    from cholesky_is_magic_tpu.ingest.device import SparseKKTLP

    if isinstance(lp, SparseKKTLP):
        from cholesky_is_magic_tpu.ops import bell
        from cholesky_is_magic_tpu.ops import sparse_ops as so

        # Block-ELL dd products when carried (whole-tile gathers; the
        # per-nonzero ELL forms serialize on TPU — ops.bell docstring).
        mv_dd = ((lambda x_dd: bell.dd_matvec_dd(lp.EB, x_dd))
                 if lp.EB is not None
                 else (lambda x_dd: so.dd_matvec_dd(lp.E, x_dd)))
        rmv_dd = ((lambda y_dd: bell.dd_matvec_dd(lp.ETB, y_dd))
                  if lp.ETB is not None
                  else (lambda y_dd: so.dd_matvec_dd(lp.ET, y_dd)))
        rmv_w = ((lambda v: bell.dd_matvec(lp.ETB, v))
                 if lp.ETB is not None
                 else (lambda v: so.dd_matvec(lp.ET, v)))
        return (mv_dd, rmv_dd, rmv_w)
    return (
        lambda x_dd: ddm.dd_matvec_dd(lp.A, x_dd),
        lambda y_dd: ddm.dd_rmatvec_dd(lp.A, y_dd),
        lambda v: ddm.dd_rmatvec(lp.A, v),
    )


def _make_op(lp, cfg: PDASConfig, engine, mesh, gate):
    """KKT-operator dispatch on the operand set (shared by the Newton
    loop and the entry repair): fully sparse ELL engine, mesh-sharded
    dense, plain dense with true-residual refinement, or engine-refined
    dense.  ``gate`` is the optional gap-gated Krylov switch (a tracer
    inside the loop; None = ungated)."""
    from cholesky_is_magic_tpu.ingest.device import SparseKKTLP

    boost = (~lp.row_mask).astype(jnp.float32)
    if isinstance(lp, SparseKKTLP):
        from cholesky_is_magic_tpu.kkt.newton import ell_kkt_operator

        # mesh composes with the fully sparse engine: every
        # factorization's assembly + Schur waves shard over 'tp'.
        return ell_kkt_operator(
            lp, engine, row_boost=boost, refine_steps=cfg.refine_steps,
            dbound=cfg.dbound, krylov_steps=cfg.krylov_steps, mesh=mesh,
            krylov_gate=gate,
        )
    if mesh is not None:
        from cholesky_is_magic_tpu.parallel.sharded import sharded_kkt_operator

        return sharded_kkt_operator(
            mesh, lp.A, row_boost=boost, refine_steps=cfg.refine_steps,
            dbound=cfg.dbound, krylov_steps=cfg.krylov_steps,
            krylov_gate=gate,
        )
    if engine is None:
        # true_residual: refine against the UNASSEMBLED operator in
        # double-word — corrects the f32 rounding of assembling N,
        # which otherwise floors the direction accuracy near 1e-7.
        return dense_kkt_operator(
            lp.A, row_boost=boost, refine_steps=cfg.refine_steps,
            true_residual=True, dbound=cfg.dbound,
            krylov_steps=cfg.krylov_steps, krylov_gate=gate,
        )
    from cholesky_is_magic_tpu.kkt.newton import sparse_kkt_operator

    # Engine refinement against the unassembled operator — the
    # sparse-path rendering of true_residual above, required for
    # the direction accuracy the dd iterates need near gap 1e-8.
    return sparse_kkt_operator(
        lp.A, engine, row_boost=boost, refine_steps=cfg.refine_steps,
        dbound=cfg.dbound, krylov_steps=cfg.krylov_steps,
        krylov_gate=gate,
    )


def _entry_repair(state: PDASDDState, cfg: PDASConfig, engine, mesh):
    """Min-norm LS correction of the entry iterate toward Ax = b in the
    DIKIN metric (see PDASConfig.entry_repair_tol; the reference's
    repair iteration, affine-scaling.lisp:226-243 /
    primal-dual-affine-scaling.lisp:268-288, whose correction is
    D²Aᵀ(AD²Aᵀ)⁻¹r with D the capped slack scaling — pdas.py:713 is the
    f32 in-loop twin).  The slack weighting makes corrections shrink
    automatically near bounds, so the full step rarely threatens the
    strict interior the ratio tests rely on; a per-coordinate clip
    (every slack keeps >= 10% of its pre-repair value) guards the
    residue.  (An identity-weighted min-norm repair — crossover's
    entry variant, where interiority is irrelevant — measured 3-5x
    here vs the Dikin form's collapse: its diffuse correction lands on
    near-bound coordinates and gets clipped away.)  All in double-word
    with cfg.entry_repair_refines refinement passes against the exact
    weighted operator on the f32 factor.  Keeps the repair only where
    it reduced the relative ∞-norm infeasibility on a non-singular
    factor.

    Returns (state, pviol_before, pviol_after)."""
    from cholesky_is_magic_tpu.solvers.affine import _slack

    lp = state.lp
    mask = lp.col_mask
    mv_dd, rmv_dd, _ = _linops(lp)
    sl_dd, su_dd, *_rest, primal_dd, _dual = _dd_violation(state)
    r0 = ddm.dd_neg(primal_dd)  # b - Ax
    bscale = 1.0 + jnp.max(jnp.abs(lp.b))
    pv0 = jnp.max(jnp.abs(r0.to_working())) / bscale

    def repair(x: DD):
        op = _make_op(lp, cfg, engine, mesh, None)
        boost = (~lp.row_mask).astype(jnp.float32)
        s = _slack(lp.l, x.hi, lp.u, cfg.repair_slack_cap, mask)
        s = jnp.where(mask, s, 0.0)  # padding inert in N and in dx
        solve_fn, ok = op.prepare_scaled_normal(s)
        w2 = ddm.DD(s * s, jnp.zeros_like(s))

        def apply_dd(v: DD) -> DD:
            t = ddm.dd_mul(w2, rmv_dd(v))
            return ddm.dd_add_w(mv_dd(t), boost * v.to_working())

        dy = ddm.dd_from(solve_fn(r0.to_working()))
        for _ in range(cfg.entry_repair_refines):
            rr = ddm.dd_sub(r0, apply_dd(dy))
            dy = ddm.dd_add(dy, ddm.dd_from(solve_fn(rr.to_working())))
        dx = ddm.dd_mul(w2, rmv_dd(dy))
        x1 = ddm.dd_add(x, dx)
        # Per-coordinate interior clip: keep >= 10% of each pre-repair
        # slack.  f32 clip values are fine — a clamped coordinate only
        # needs interiority, not dd accuracy.
        lo = x.hi - 0.9 * sl_dd.to_working()
        hi = x.hi + 0.9 * su_dd.to_working()
        below = mask & (x1.hi < lo)
        above = mask & (x1.hi > hi)
        x1 = DD(
            jnp.where(below, lo, jnp.where(above, hi, x1.hi)),
            jnp.where(below | above, 0.0, x1.lo),
        )
        r1 = ddm.dd_sub(ddm.dd_from(lp.b), mv_dd(x1))
        pv1 = jnp.max(jnp.abs(r1.to_working())) / bscale
        use = ok & (pv1 < pv0)
        x_out = DD(jnp.where(use, x1.hi, x.hi), jnp.where(use, x1.lo, x.lo))
        return x_out, jnp.where(use, pv1, pv0)

    x_new, pv1 = jax.lax.cond(
        pv0 > cfg.entry_repair_tol, repair, lambda x: (x, pv0), state.x
    )
    return dataclasses.replace(state, x=x_new), pv0, pv1


def _dd_violation(st: PDASDDState):
    """The PDAS violation vector (:135-150) evaluated in double-word.

    Returns f32 arrays (the values are small near convergence, so f32
    holds them to full *relative* precision) plus the dd slacks.
    """
    lp = st.lp
    mask = lp.col_mask
    # Double-word slacks are good to ~eps^2; the f32 path's 1e-7 floor
    # would clamp exactly the 1e-8-sized slacks a tight gap produces.
    floor = 1e-12
    # Slacks in dd: x - l (l is exact f32), floored like the f32 path —
    # a dd slack can be <= 0 at the boundary and later divisions need it
    # strictly positive.
    def dd_floor(v: DD, lo: float, m) -> DD:
        bad = (v.hi <= lo) | ~m
        return DD(
            jnp.where(bad, jnp.where(m, lo, 1.0), v.hi),
            jnp.where(bad, 0.0, v.lo),
        )

    sl_dd = dd_floor(ddm.dd_add_w(st.x, -lp.l), floor, mask)
    su_dd = dd_floor(ddm.dd_add_w(ddm.dd_neg(st.x), lp.u), floor, mask)
    sl = jnp.where(mask, sl_dd.to_working(), 1.0)
    su = jnp.where(mask, su_dd.to_working(), 1.0)
    # Complementarities in dd: w*su, z*sl.
    wu = jnp.where(mask, ddm.dd_mul(st.w, su_dd).to_working(), 0.0)
    zl = jnp.where(mask, ddm.dd_mul(st.z, sl_dd).to_working(), 0.0)
    # Primal residual A x - b in dd (the cancellation-critical one).
    mv_dd, rmv_dd, _ = _linops(lp)
    ax = mv_dd(st.x)
    primal_dd = ddm.dd_add_w(ax, -lp.b)
    # Dual residual Aᵀ y + z - w - c in dd.
    aty = rmv_dd(st.y)
    dual_dd = ddm.dd_add_w(
        ddm.dd_add(ddm.dd_add(aty, st.z), ddm.dd_neg(st.w)), -lp.c
    )
    dual_dd = DD(
        jnp.where(mask, dual_dd.hi, 0.0), jnp.where(mask, dual_dd.lo, 0.0)
    )
    return sl_dd, su_dd, sl, su, wu, zl, primal_dd, dual_dd


def _dd_objectives(st: PDASDDState, clamp: float = 1e8):
    lp = st.lp
    mask = lp.col_mask
    pobj = ddm.dd_add(
        ddm.dd_dot(lp.c, st.x.hi), ddm.DD(jnp.dot(lp.c, st.x.lo), 0.0)
    )
    z_active = mask & (lp.l > -0.999 * clamp)
    w_active = mask & (lp.u < 0.999 * clamp)
    lz = ddm.dd_dot(jnp.where(z_active, lp.l, 0.0), st.z.hi)
    uw = ddm.dd_dot(jnp.where(w_active, lp.u, 0.0), st.w.hi)
    by = ddm.dd_dot(lp.b, st.y.hi)
    dobj = ddm.dd_add(by, ddm.dd_sub(lz, uw))
    extra = jnp.dot(jnp.where(z_active, lp.l, 0.0), st.z.lo) + jnp.dot(
        lp.b, st.y.lo
    ) - jnp.dot(jnp.where(w_active, lp.u, 0.0), st.w.lo)
    dobj = ddm.dd_add_w(dobj, extra)
    return pobj, dobj


def _dd_box_step(sl_dd: DD, su_dd: DD, dx_dd: DD) -> DD:
    """Largest t with slacks positive under x -= t*dx, in double-word
    (the dd twin of pdas._box_step; ratios clamp at >= 0)."""
    inf = ddm.DD(jnp.full_like(sl_dd.hi, np.inf), jnp.zeros_like(sl_dd.hi))
    zero = ddm.DD(jnp.zeros_like(sl_dd.hi), jnp.zeros_like(sl_dd.hi))
    lim = ddm.dd_where(
        dx_dd.hi > 0,
        ddm.dd_div(sl_dd, dx_dd),
        ddm.dd_where(dx_dd.hi < 0, ddm.dd_div(su_dd, ddm.dd_neg(dx_dd)), inf),
    )
    lim = ddm.dd_where(lim.hi < 0, zero, lim)
    return ddm.dd_min(lim)


def _dd_pos_step(v_dd: DD, dv_dd: DD) -> DD:
    """Largest t with v - t*dv >= 0, in double-word (dd _pos_step)."""
    inf = ddm.DD(jnp.full_like(v_dd.hi, np.inf), jnp.zeros_like(v_dd.hi))
    zero = ddm.DD(jnp.zeros_like(v_dd.hi), jnp.zeros_like(v_dd.hi))
    lim = ddm.dd_where(dv_dd.hi > 0, ddm.dd_div(v_dd, dv_dd), inf)
    lim = ddm.dd_where(lim.hi < 0, zero, lim)
    return ddm.dd_min(lim)


def pdas_dd(
    state: PDASDDState,
    config: Optional[PDASConfig] = None,
    engine=None,
    mesh=None,
) -> SolveResult:
    """Tight-gap driver: plain Newton steps (no in-loop repair/recenter
    paths — use solvers.pdas to get feasible/centered first if needed,
    or rely on the standard init), best-iterate tracking,
    precision-floor exit.  ``config.entry_repair_tol`` optionally
    min-norm-repairs the ENTRY iterate toward Ax = b before the loop
    (the floor tracks the entry residual — PDASConfig docstring).

    ``mesh`` runs every factorization sharded over the mesh's 'tp' axis:
    dense operands column-shard through parallel.sharded_kkt_operator;
    with ``engine`` + a SparseKKTLP the fully sparse pipeline shards its
    pair-schedule assembly and panel-wave Schur updates
    (sparse.tiled._assemble_factor_tp) — tight gaps at tp scale on BOTH
    operand sets."""
    cfg = config or PDASConfig(gap_tol=1e-8, max_iters=300)
    return _pdas_dd_jit(state, cfg, engine, mesh)


@highest_precision
@partial(jax.jit, static_argnames=("cfg", "engine", "mesh"))
def _pdas_dd_jit(
    state: PDASDDState, cfg: PDASConfig, engine=None, mesh=None
) -> SolveResult:
    lp = state.lp

    # Entry min-norm repair (PDASConfig.entry_repair_tol): Newton-only
    # loops inherit their precision floor from the entry's primal
    # infeasibility (docs/DEVNOTES.md "knife edge") — repair it first.
    repair_info = {}
    if cfg.entry_repair_tol > 0.0:
        state, pv0, pv1 = _entry_repair(state, cfg, engine, mesh)
        repair_info = {"entry_repair": {"pviol_before": pv0,
                                        "pviol_after": pv1}}

    from cholesky_is_magic_tpu.kkt.newton import FILTER_THRESHOLD

    def kkt_dd(st, sl_dd, su_dd, sl, su, wu, zl, g_dd, h_dd, op, gap):
        """IPM-specialized FULL double-word elimination.  With the exact
        complementarity rhs e = w∘su, f = z∘sl, the eliminated terms
        simplify: e/su = w, f/sl = z, so alpha = beta·(-h - w + z) — an
        O(1) quantity whose cancellation against g (O(gap)) MUST happen in
        double-word, or the f32 matvec noise swamps the Newton rhs.

        Every intermediate (beta, alpha, rhs, dy, dx, dw, dz) is carried
        in dd; only the Cholesky factorization runs in f32, and dy gets
        one outer refinement against the exact dd operator
        A·diag(beta_dd)·Aᵀ + diag(boost) on the recycled factor
        (op.prepare_scaled_normal).  Without this the f32 beta/rhs/delta
        roundings are a systematic ~1e-6 per-iterate divergence from the
        f64 trajectory (tests/test_precision.py pins <= 1e-6).

        With cfg.mehrotra the affine direction becomes the PREDICTOR: a
        second solve on the SAME recycled factor re-targets the
        complementarities at sigma*mu minus the predictor's second-order
        products (e -> e - sigma·mu - dw_aff∘dx_aff,
        f -> f - sigma·mu + dz_aff∘dx_aff; sigma = (mu_aff/mu)³,
        Mehrotra 1992).  The deviations (de, df) ride the general
        elimination: alpha gains beta·(df/sl - de/su), dw gains de/su,
        dz gains df/sl — all in double-word, since sigma·mu is gap-sized
        exactly like the quantities the dd machinery exists to protect."""
        zero = jnp.zeros_like(sl)
        dd0 = ddm.DD(zero, zero)
        pu = su <= FILTER_THRESHOLD
        pl = sl <= FILTER_THRESHOLD
        both_absent = ~pu & ~pl
        use_u = pu | both_absent
        use_l = pl | both_absent
        a_dd = ddm.dd_where(use_u, ddm.dd_div(st.w, su_dd), dd0)
        b_dd = ddm.dd_where(use_l, ddm.dd_div(st.z, sl_dd), dd0)
        denom = ddm.dd_add(a_dd, b_dd)
        denom = ddm.dd_where(
            denom.hi < 1e-30, ddm.DD(jnp.full_like(sl, 1e-30), zero), denom
        )
        one = ddm.DD(jnp.ones_like(sl), zero)
        beta_dd = ddm.dd_div(one, denom)

        mv_dd, rmv_dd, rmv32 = _linops(lp)
        boost = (~lp.row_mask).astype(jnp.float32)
        s32 = jnp.sqrt(beta_dd.to_working())
        solve_fn, ok = op.prepare_scaled_normal(s32)

        def newton_dir(de_dd, df_dd):
            """Direction for complementarity rhs e = w∘su + de,
            f = z∘sl + df (de = df = 0: the plain affine direction)."""
            corr = ddm.dd_sub(
                ddm.dd_where(use_l, ddm.dd_div(df_dd, sl_dd), dd0),
                ddm.dd_where(use_u, ddm.dd_div(de_dd, su_dd), dd0),
            )
            base = ddm.dd_add(ddm.dd_neg(h_dd), ddm.dd_sub(st.z, st.w))
            alpha_dd = ddm.dd_mul(ddm.dd_add(base, corr), beta_dd)
            Aalpha = mv_dd(alpha_dd)
            rhs_dd = ddm.dd_sub(g_dd, Aalpha)
            dy1 = solve_fn(rhs_dd.to_working())
            # Outer dd refinement: residual of the EXACT dd-beta system on
            # the recycled factor.  Corrects the f32 rounding of beta
            # inside the assembled N (inner refinement cannot see it).
            ty = rmv32(dy1)
            u = ddm.dd_mul(beta_dd, ty)
            Mu = mv_dd(u)
            Mu = ddm.dd_add_w(Mu, boost * dy1)
            r = ddm.dd_sub(rhs_dd, Mu).to_working()
            dy2 = solve_fn(r)
            dy_dd = ddm.dd_add_w(ddm.DD(dy1, jnp.zeros_like(dy1)), dy2)

            t_dd = rmv_dd(dy_dd)
            dx_dd = ddm.dd_add(alpha_dd, ddm.dd_mul(beta_dd, t_dd))
            # dw = w + (w·dx + de)/su,  dz = z - (z·dx - df)/sl
            # (filtered: dw = w, dz = z).
            dw_dd = ddm.dd_where(
                use_u,
                ddm.dd_add(
                    st.w,
                    ddm.dd_div(
                        ddm.dd_add(ddm.dd_mul(st.w, dx_dd), de_dd), su_dd
                    ),
                ),
                st.w,
            )
            dz_dd = ddm.dd_where(
                use_l,
                ddm.dd_sub(
                    st.z,
                    ddm.dd_div(
                        ddm.dd_sub(ddm.dd_mul(st.z, dx_dd), df_dd), sl_dd
                    ),
                ),
                st.z,
            )
            # Padding inertness: the sanitized rhs (e = f = 0 at padded
            # entries, not w*su / z*sl) makes the e/su = w, f/sl = z
            # identities above wrong exactly there, yielding dw = w,
            # dz = z — which the ratio test turns into a permanent step
            # cap of 1.  Zero the deltas on masked entries (matching
            # solve_kkt_newton with a sanitized rhs).
            dx_dd = ddm.dd_where(lp.col_mask, dx_dd, dd0)
            dw_dd = ddm.dd_where(lp.col_mask, dw_dd, dd0)
            dz_dd = ddm.dd_where(lp.col_mask, dz_dd, dd0)
            return dw_dd, dx_dd, dy_dd, dz_dd

        dw_dd, dx_dd, dy_dd, dz_dd = newton_dir(dd0, dd0)
        if not cfg.mehrotra:
            return dw_dd, dx_dd, dy_dd, dz_dd, ok

        # --- Mehrotra corrector on the shared factor. ---
        # Affine step length (capped at 1) and the predicted duality
        # measure after it; sigma from the standard cubic heuristic.
        # The mu sums run over PRESENT bounds of REAL columns only:
        # padded entries carry sanitized (su = sl = 1, w = z = 1), whose
        # predicted products wn*sun = 1 would pin mu_aff (hence sigma) at
        # O(1) forever — measured: 5x the plain iteration count from
        # exactly this.
        pu = pu & lp.col_mask
        pl = pl & lp.col_mask
        step_aff = _dd_box_step(sl_dd, su_dd, dx_dd)
        for cand in (_dd_pos_step(st.w, dw_dd), _dd_pos_step(st.z, dz_dd)):
            step_aff = ddm.dd_where(
                ddm.dd_less(cand, step_aff), cand, step_aff
            )
        t_aff = jnp.minimum(step_aff.to_working(), 1.0)
        cnt = jnp.maximum(jnp.sum(pu) + jnp.sum(pl), 1).astype(sl.dtype)
        mu = (
            jnp.sum(jnp.where(pu, wu, 0.0)) + jnp.sum(jnp.where(pl, zl, 0.0))
        ) / cnt
        wn = st.w.hi - t_aff * dw_dd.hi
        sun = su + t_aff * dx_dd.hi
        zn = st.z.hi - t_aff * dz_dd.hi
        sln = sl - t_aff * dx_dd.hi
        mu_aff = (
            jnp.sum(jnp.where(pu, wn * sun, 0.0))
            + jnp.sum(jnp.where(pl, zn * sln, 0.0))
        ) / cnt
        mu_aff = jnp.maximum(mu_aff, 0.0)
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)
        target = sigma * mu
        # Deviations from exact complementarity, in dd (gap-sized values).
        de_dd = ddm.dd_where(
            pu,
            ddm.dd_add_w(ddm.dd_neg(ddm.dd_mul(dw_dd, dx_dd)), -target),
            dd0,
        )
        df_dd = ddm.dd_where(
            pl,
            ddm.dd_add_w(ddm.dd_mul(dz_dd, dx_dd), -target),
            dd0,
        )
        dw_dd, dx_dd, dy_dd, dz_dd = newton_dir(de_dd, df_dd)

        if cfg.gondzio_correctors > 0:
            # Gondzio centrality correctors, dd rendering (see
            # PDASConfig.gondzio_correctors and the f32 twin in
            # pdas.py).  The trial complementarity products and the
            # centrality-box clip run in f32 — they only STEER the next
            # rhs deviation (a heuristic target, not a residual); the
            # deviation itself stays dd so the corrected direction keeps
            # the solver's precision story intact.
            def g_step(dw_, dx_, dz_):
                s = _dd_box_step(sl_dd, su_dd, dx_)
                for cand in (_dd_pos_step(st.w, dw_),
                             _dd_pos_step(st.z, dz_)):
                    s = ddm.dd_where(ddm.dd_less(cand, s), cand, s)
                return jnp.minimum(s.to_working(), 1.0)

            def mu_pred(dw_, dx_, dz_, t_):
                # Progress guard for acceptance (see the f32 twin): the
                # duality measure at the damped step, f32 on hi parts.
                ts = cfg.mehrotra_gamma * t_
                return (
                    jnp.sum(jnp.where(
                        pu, (st.w.hi - ts * dw_.hi) * (su + ts * dx_.hi),
                        0.0))
                    + jnp.sum(jnp.where(
                        pl, (st.z.hi - ts * dz_.hi) * (sl - ts * dx_.hi),
                        0.0))
                ) / cnt

            t_cur = g_step(dw_dd, dx_dd, dz_dd)
            mu_cur = mu_pred(dw_dd, dx_dd, dz_dd, t_cur)
            de_acc, df_acc = de_dd, df_dd
            # Midgame gate (PDASConfig.gondzio_gate_gap): below it the
            # f32 complementarity trials are noise — see the f32 twin.
            active = ok & (gap > cfg.gondzio_gate_gap)
            lo_t = cfg.gondzio_beta_min * target
            hi_t = cfg.gondzio_beta_max * target
            for _ in range(cfg.gondzio_correctors):
                t_t = jnp.minimum(t_cur + cfg.gondzio_delta, 1.0)
                vu = (st.w.hi - t_t * dw_dd.hi) * (su + t_t * dx_dd.hi)
                vl = (st.z.hi - t_t * dz_dd.hi) * (sl - t_t * dx_dd.hi)
                dtu = jnp.where(pu, jnp.clip(vu, lo_t, hi_t) - vu, 0.0)
                dtl = jnp.where(pl, jnp.clip(vl, lo_t, hi_t) - vl, 0.0)
                de_t = ddm.dd_add_w(de_acc, -dtu)
                df_t = ddm.dd_add_w(df_acc, -dtl)
                cw, cx, cy, cz = newton_dir(de_t, df_t)
                t_new = g_step(cw, cx, cz)
                mu_new = mu_pred(cw, cx, cz, t_new)
                acc = active & (
                    t_new >= t_cur + cfg.gondzio_gamma * cfg.gondzio_delta
                ) & (mu_new <= mu_cur)
                sel = lambda a, b: ddm.dd_where(acc, b, a)
                dw_dd, dx_dd, dy_dd, dz_dd = (
                    sel(dw_dd, cw), sel(dx_dd, cx),
                    sel(dy_dd, cy), sel(dz_dd, cz),
                )
                de_acc = sel(de_acc, de_t)
                df_acc = sel(df_acc, df_t)
                t_cur = jnp.where(acc, t_new, t_cur)
                mu_cur = jnp.where(acc, mu_new, mu_cur)
                active = acc
        return dw_dd, dx_dd, dy_dd, dz_dd, ok

    def one_iteration(st: PDASDDState):
        sl_dd, su_dd, sl, su, wu, zl, primal_dd, dual_dd = _dd_violation(st)
        pviol = jnp.max(jnp.abs(primal_dd.to_working()))
        pobj_dd, dobj_dd = _dd_objectives(st, cfg.clamp)
        gap_dd = ddm.dd_sub(pobj_dd, dobj_dd)
        denom = jnp.maximum(
            jnp.maximum(jnp.abs(pobj_dd.to_working()), jnp.abs(dobj_dd.to_working())),
            1.0,
        )
        gap = jnp.abs(gap_dd.to_working()) / denom

        # Gap-gated Krylov escalation (PDASConfig.krylov_gate_gap): below
        # the gate this iteration's solves run PCG, above it the cheap
        # Richardson path — one lax.cond per solve on the shared factor.
        gate = None
        if cfg.krylov_steps > 0 and cfg.krylov_gate_gap > 0.0:
            gate = gap < cfg.krylov_gate_gap
        op = _make_op(lp, cfg, engine, mesh, gate)
        dw_dd, dx_dd, dy_dd, dz_dd, ok = kkt_dd(
            st, sl_dd, su_dd, sl, su, wu, zl, primal_dd, dual_dd, op, gap
        )
        # Ratio tests in dd: the f32-rounded step scalar times an O(10)
        # delta is itself a ~1e-6 absolute perturbation of the iterate.
        step_dd = _dd_box_step(sl_dd, su_dd, dx_dd)
        for cand in (_dd_pos_step(st.w, dw_dd), _dd_pos_step(st.z, dz_dd)):
            step_dd = ddm.dd_where(ddm.dd_less(cand, step_dd), cand, step_dd)
        gamma = cfg.mehrotra_gamma if cfg.mehrotra else cfg.gamma
        ghi = np.float32(gamma)
        gamma_dd = ddm.DD(
            jnp.asarray(ghi), jnp.asarray(np.float32(gamma - float(ghi)))
        )
        ts = ddm.dd_mul(gamma_dd, step_dd)
        one = ddm.DD(jnp.asarray(np.float32(1.0)), jnp.asarray(np.float32(0.0)))
        t_dd = ddm.dd_where(ddm.dd_less(one, ts), one, ts)
        new = PDASDDState(
            x=ddm.dd_sub(st.x, ddm.dd_mul(t_dd, dx_dd)),
            y=ddm.dd_sub(st.y, ddm.dd_mul(t_dd, dy_dd)),
            w=ddm.dd_sub(st.w, ddm.dd_mul(t_dd, dw_dd)),
            z=ddm.dd_sub(st.z, ddm.dd_mul(t_dd, dz_dd)),
            lp=lp,
        )
        return new, gap, pviol, step_dd.to_working(), ok

    def body(carry):
        (st, i, _gap, _pviol, best_gap, best_st, since_best, _status,
         trace) = carry
        new_st, gap, pviol, step, ok = one_iteration(st)
        if cfg.record_trace or cfg.record_iterates:
            # Per-iteration trace, as the reference prints every solver
            # iteration (one-pdas-iteration :336-338, :376).
            pobj_i = jnp.dot(st.x.hi, lp.c) + jnp.dot(st.x.lo, lp.c)
            vals = (gap, pobj_i, step)
            if cfg.record_iterates:
                vals = vals + (st.x.hi, st.x.lo)
            trace = jax.tree.map(lambda a, v: a.at[i].set(v), trace, vals)
        # Feasibility-gated best tracking (see pdas.py: an infeasible
        # iterate's duality gap is meaningless).  Only (x, y, w, z) are
        # carried — selecting over the whole state re-materializes the
        # never-changing lp operands (A among them) every iteration.
        improved = (gap < best_gap) & (pviol < 1e-2)
        best_st = jax.tree.map(
            lambda b, c: jnp.where(improved, c, b),
            best_st,
            (st.x, st.y, st.w, st.z),
        )
        best_gap = jnp.where(improved, gap, best_gap)
        since_best = jnp.where(improved, 0, since_best + 1)
        status = jnp.where(ok, Status.RUNNING, Status.SINGULAR).astype(jnp.int32)
        return (new_st, i + 1, gap, pviol, best_gap, best_st, since_best,
                status, trace)

    def bounced(gap, best_gap):
        # Bounce exit (PDASConfig.bounce_exit_ratio): the endgame gap
        # trajectory dips to its floor and then oscillates decades above
        # it; the first large bounce off a deep best already proves the
        # floor, so waiting out the stall window just re-confirms it at
        # full per-iteration cost.
        if cfg.bounce_exit_ratio <= 0.0:
            return jnp.asarray(False)
        return (best_gap < cfg.bounce_exit_floor) & (
            gap > cfg.bounce_exit_ratio * best_gap
        )

    def cond(carry):
        _st, i, gap, pviol, _bg, _bst, since_best, status, _trace = carry
        # Gap stop only at a primal-feasible iterate (see pdas.py).
        converged = (gap < cfg.gap_tol) & (pviol < cfg.primal_feasible_tol)
        return (
            ~converged
            & (status == Status.RUNNING)
            & (i < cfg.max_iters)
            & (since_best < cfg.stall_exit_iters)
            & ~bounced(gap, _bg)
        )

    # Working dtype follows the operands (f32 + dd on TPU; f64 pairs on
    # CPU oracles) — a hardcoded f32 here breaks the while_loop carry for
    # f64 operand sets.
    inf = jnp.asarray(np.inf, state.x.hi.dtype)
    n = state.x.hi.shape[0]
    trace0 = (
        (jnp.full(cfg.max_iters, np.nan, jnp.float32),) * 3
        if (cfg.record_trace or cfg.record_iterates)
        else (jnp.zeros(0, jnp.float32),) * 3
    )
    if cfg.record_iterates:
        trace0 = trace0 + (jnp.full((cfg.max_iters, n), np.nan, jnp.float32),) * 2
    (st, iters, gap, _pviol_f, best_gap, best_st, since_best, status,
     trace) = jax.lax.while_loop(
        cond,
        body,
        (state, jnp.asarray(0, jnp.int32), inf, inf, inf,
         (state.x, state.y, state.w, state.z),
         jnp.asarray(0, jnp.int32), jnp.asarray(Status.RUNNING, jnp.int32),
         trace0),
    )
    # <= (not <): on convergence the loop exits with `gap` belonging to
    # the PRE-step iterate (recorded as best) while the carry holds the
    # post-step state — a strict < returned the state one step PAST the
    # converged one (observed: "optimal" with primal residual 25 on the
    # sparse afiro cold start).
    use_best = best_gap <= gap
    bx, by, bw, bz = jax.tree.map(
        lambda b, c: jnp.where(use_best, b, c),
        best_st,
        (st.x, st.y, st.w, st.z),
    )
    st = dataclasses.replace(st, x=bx, y=by, w=bw, z=bz)
    exit_bounced = bounced(gap, best_gap)  # on the PRE-min exit gap
    gap = jnp.minimum(best_gap, gap)
    pobj_dd, dobj_dd = _dd_objectives(st, cfg.clamp)
    primal = _dd_violation(st)[6].to_working()
    final_status = jnp.where(
        status != Status.RUNNING,
        status,
        jnp.where(
            gap < cfg.gap_tol,
            Status.OPTIMAL,
            jnp.where(
                (since_best >= cfg.stall_exit_iters) | exit_bounced,
                Status.PRECISION_FLOOR,
                Status.MAX_ITERS,
            ),
        ),
    ).astype(jnp.int32)
    return SolveResult(
        x=st.x.to_working(),
        objective=pobj_dd.to_working(),
        status=final_status,
        iterations=iters,
        residual_norm=jnp.linalg.norm(primal),
        extra={
            "gap": gap,
            **repair_info,
            "dual_objective": dobj_dd.to_working(),
            "x_lo": st.x.lo,
            "y": st.y.to_working(),
            "w": st.w.to_working(),
            "z": st.z.to_working(),
            "trace": {
                "gap": trace[0], "objective": trace[1], "step": trace[2],
                **(
                    {"x": trace[3], "x_lo": trace[4]}
                    if cfg.record_iterates
                    else {}
                ),
            },
        },
    )
