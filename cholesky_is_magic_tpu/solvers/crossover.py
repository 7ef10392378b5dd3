"""Crossover: polish an interior-point iterate to a vertex-exact solution.

A TPU-build capability EXTENSION — the reference (pkhuong/cholesky-is-magic)
stops at the interior-point gap its fp64 arithmetic reaches
(primal-dual-affine-scaling.lisp:394 stops at relative gap < 1e-4); it has
no basis identification or polish step.  Production LP stacks bolt a
simplex crossover onto the IPM for exactly the regime this framework lives
in: the iterate's *support* converges decades before its *values* do, so
once the active set is readable the remaining error is one linear solve
away — no more IPM iterations, no simplex either.

The TPU rendering reuses the normal-equations machinery end to end:

1. **Classify** each column of the final iterate as basic or
   bound-active: basic iff the bound slacks dominate the bound duals
   (``min(x-l, u-x) > theta * (z + w)`` — the standard primal-dual
   indicator).  Free and padded columns are always basic.
2. **Snap** nonbasic columns to their nearer bound (x_N), leaving the
   residual system B x_B = b - A_N x_N over the basic columns B.
3. **Solve via the SAME normal-equations path as the IPM**: with
   d = 1_basic, N_B = (A·diag(d))(A·diag(d))ᵀ = B·Bᵀ, factored once by
   ops.dense.prepare_normal or the at-scale tile engine
   (sparse.tiled.TiledCholesky.prepare_normal_ell) — padding, dbound
   singular-retry and PCG refinement all carry over unchanged.  Then
   x_B = Bᵀ·(B·Bᵀ)⁻¹ r: if the classification found a nondegenerate
   vertex this IS the vertex (Bᵀ(BBᵀ)⁻¹ = B⁻¹ at |B| = m); on a
   higher-dimensional optimal face it is the min-norm feasible
   completion, which has the same objective (c is constant on a face).
4. **Double-word iterative refinement** around the f32 factor: the
   crossover right-hand sides are O(1) (unlike the IPM's O(gap) Newton
   residuals), so a single f32-relative solve would floor at ~1e-7.
   The outer loop re-residualizes in double-word against the exact
   operator and re-solves the correction — each round contracts the
   error by ~kappa*eps_f32, reaching the dd floor (~1e-10 class) in 2-3
   rounds (Wilkinson iterative refinement with a dd residual, the same
   recipe as ops/krylov.py).
5. **Duals + certificate**: y from N_B y = B c_B through the same
   factorization; reduced costs rc = c - Aᵀy in dd; z/w are rc clipped
   to the active sign.  The returned certificate carries the dd-computed
   primal/dual residuals, bound violation, dual sign violation and the
   |c'x - dual| gap — ``certified`` is a *checked* claim, not a hope,
   and when the active-set guess was wrong (degenerate LPs at loose
   gaps) the caller falls back to the un-polished iterate.

Measured effect (see tests/test_crossover.py and examples): a pdas run
stopped at its 1e-4 gap plus one crossover reaches the same 1e-9-class
certified gap as a full pdas_dd finisher — the at-scale wall-clock
shortcut (the finisher's per-iteration cost is a Krylov-refined
factorization; crossover is ONE of those).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_is_magic_tpu.ingest.device import DeviceLP, SparseKKTLP
from cholesky_is_magic_tpu.ops import dd as ddm
from cholesky_is_magic_tpu.ops.dd import DD
from cholesky_is_magic_tpu.solvers.result import SolveResult, Status
from cholesky_is_magic_tpu.utils.precision import highest_precision

# Per-pass repair-loop tracing (developer aid): CIM_XO_DEBUG=1.
_DEBUG = os.environ.get("CIM_XO_DEBUG", "") not in ("", "0")


@dataclasses.dataclass(frozen=True)
class CrossoverConfig:
    # Basic iff min(sl, su) > theta * (z + w): at an interior iterate near
    # the optimum, basic columns have slack >> dual and bound-active
    # columns dual >> slack, so any theta within a few orders of 1 reads
    # the same partition; 1.0 is the standard indicator.
    theta: float = 1.0
    # Outer double-word iterative-refinement rounds around the f32
    # factorization (each round: dd residual vs the exact operator, f32
    # re-solve).  2 reaches the dd floor on kappa <= 1e6 bases; the third
    # is insurance for ill-conditioned ones.
    ir_steps: int = 3
    # Inner refinement of each f32 solve: flexible PCG steps on the f32
    # factor (ops.krylov); 0 falls back to plain Richardson.  The basis
    # normal matrix BBᵀ is usually *better* conditioned than the IPM's
    # scaled N (no 1/mu slack blowup), so modest depth suffices.
    krylov_steps: int = 6
    refine_steps: int = 2  # Richardson depth when krylov_steps == 0
    dbound: float = 1e-6  # singular-retry jitter (ops.dense.prepare_normal)
    # Certificate tolerances (relative, dd-evaluated).
    primal_tol: float = 1e-6
    dual_tol: float = 1e-6
    gap_tol: float = 1e-7
    # Bound-repair passes: on a DEGENERATE optimal face the primal-dual
    # indicator can admit linearly dependent basic columns, and the
    # completion then drifts along the dependency (measured on Netlib
    # afiro at a 2.9e-10 gap: a clean-looking 22-column basis sends one
    # variable to -57 while staying row-feasible to 7e-15).  Each repair
    # pass moves the bound-violating basic columns to the violated bound
    # and re-solves — the classic crossover push-to-bound step, one
    # factorization per pass.  0 disables (single-shot classification).
    # 12 covers the full loose-gap sequence (demote passes -> widen ->
    # push-evict-and-ban -> next widen candidate; see crossover()); the
    # loop also stops on certificate success or a repeated
    # (partition, ban-list) state, so the budget is an upper bound on
    # factorizations, not a typical cost (measured: 1-5 passes).
    max_repairs: int = 12
    # Widen-repair (the OTHER degenerate failure): when the certificate
    # fails on the PRIMAL residual with no bound violation, the snap
    # fixed a borderline column to a bound the optimal face does not pin
    # — r = b - A_N x_N has a component outside range(B) that no amount
    # of refinement removes (measured at m=16384/gap 7e-7: primal floor
    # 1.3e-4).  The repair returns every nonbasic column whose POLISHED
    # reduced cost is below max(widen_dual_tol, sqrt(gap))·(1+|c_j|) to
    # the basic set (zero-rc bound-active columns are exactly the face's
    # flat directions; the post-solve rc separates them decades more
    # sharply than the iterate's z+w, and the sqrt(gap) term tracks how
    # far complementarity can be trusted at the incoming gap) and
    # re-solves; the proximal completion keeps the extra freedom tame.
    # 0.0 disables the whole widen family (incl. pricing-widen) —
    # ablation switch, used by the repair-rule tests.
    widen_dual_tol: float = 1e-3
    # Dual-snap repair reach: when the certificate fails on the DUAL
    # residual, a basic column whose post-solve |rc| exceeds dual_tol
    # cannot be basic at the optimum — if it sits within
    # max(demote_near_tol, 3·sqrt(gap))·(1+|bound|) of a bound, the
    # optimal face pins it THERE and the iterate just stopped ~sqrt(gap)
    # short (measured at m=32768/gap 2.6e-7: dual floor 2.2e-4 from
    # exactly such columns ~2e-4 off their bounds; at a phase-1 stop of
    # gap 5.5e-5 the same columns sit 4-8e-3 away — hence the
    # gap-scaled reach).  Demoting it to the near bound and re-solving
    # removes the rc error at a reach-sized primal cost, which the next
    # completion absorbs.  Widened columns demote with no distance
    # requirement (they were bound-active at classification).  0.0
    # disables the whole demote family (incl. the sign-directed forced
    # demote) — ablation switch, used by the repair-rule tests.
    demote_near_tol: float = 1e-3
    # Demote bulk cap when the primal side of the certificate is clean
    # (rc trustworthy — see the primal-gated cap in crossover()); a
    # dirty primal forces single-column pivot discipline regardless.
    demote_max: int = 16
    # OMP basis completion (escalation): when a MULTI-column widen has
    # regressed and been reverted — the signature of a rank-deficient
    # basis whose missing columns correlation-only bulk admission cannot
    # find (near-parallel candidates admitted together are themselves
    # rank-deficient) — the widen rule switches to host-side orthogonal
    # matching pursuit on the polish residual (_omp_select): each pick
    # deflates the residual by the selected direction before re-scoring,
    # so the admitted set is mutually well-conditioned by construction.
    # Value = max columns per OMP pass; 0 disables the escalation.
    omp_widen_max: int = 64
    # Free-bound threshold: |bound| above this is "no bound" for snapping
    # (matches the PDAS clamp, primal-dual-affine-scaling.lisp:37-45).
    clamp: float = 1e8
    # Entry min-norm repair (r4): past the Richardson wall the capped
    # finisher drifts off Ax=b DIFFUSELY (m=32768 measured: ~5,500
    # columns x ~1e-3 — docs/DEVNOTES.md "Crossover entry quality"), and
    # no basis the repair loop can reach contains that residual.  The
    # reference's own repair iteration is the tool: one min-norm LS
    # correction toward Ax=b over ALL columns (affine-scaling.lisp:
    # 226-243; one-repair-iteration, primal-dual-affine-scaling.lisp:
    # 268-288), executed here in dd with PCG refinement on a d=1
    # factorization of AAᵀ, applied to the ENTRY ITERATE before
    # classification.  Triggered only when the entry's relative primal
    # infeasibility exceeds this (so clean entries pay nothing); costs
    # one extra factorization when it fires.  0.0 disables.  Default
    # 1e-6: a converged phase-1 pdas entry sits at ~3e-7 relative
    # (measured, m=96) and must NOT fire; the diffuse at-scale failure
    # signature is 1e-3-class.
    entry_repair_tol: float = 1e-6
    # Refinement rounds for the repair solve (the correction is diffuse
    # and O(pviol)-sized; modest depth suffices on top of PCG).
    entry_repair_ir: int = 2


def classify_basis(x, z, w, l, u, col_mask, theta: float = 1.0,
                   clamp: float = 1e8):
    """Partition columns into (basic, at_lower, at_upper) boolean masks.

    The primal-dual indicator: basic iff min-slack > theta * dual.  Free
    columns (both bounds at the clamp) and padded columns are basic; a
    column whose NEARER bound is unclamped never snaps to the clamp
    value.
    """
    sl = x - l
    su = u - x
    dual = jnp.abs(z) + jnp.abs(w)
    has_l = l > -0.999 * clamp
    has_u = u < 0.999 * clamp
    smin = jnp.where(has_l & has_u, jnp.minimum(sl, su),
                     jnp.where(has_l, sl, jnp.where(has_u, su, jnp.inf)))
    basic = (smin > theta * dual) | ~col_mask | ~(has_l | has_u)
    lower_nearer = jnp.where(has_l & has_u, sl <= su, has_l)
    at_lower = ~basic & lower_nearer
    at_upper = ~basic & ~lower_nearer
    return basic, at_lower, at_upper


def _mask_dd(m, v: DD) -> DD:
    # m is 0/1 (or bool): the product is exact.
    mf = m.astype(v.hi.dtype) if m.dtype == jnp.bool_ else m
    return DD(mf * v.hi, mf * v.lo)


def _ops_for(lp, engine):
    """(prepare, mv_dd, rmv_dd, boost) for the operand set."""
    if isinstance(lp, SparseKKTLP):
        from cholesky_is_magic_tpu.ops import sparse_ops as so

        if engine is None:
            raise ValueError("crossover on SparseKKTLP needs engine=")

        def prepare(d, cfg):
            return engine.prepare_normal_ell(
                lp.E, lp.ET, d, lp.m,
                refine_steps=cfg.refine_steps, dbound=cfg.dbound,
                krylov_steps=cfg.krylov_steps,
                EB=getattr(lp, "EB", None), ETB=getattr(lp, "ETB", None),
            )

        from cholesky_is_magic_tpu.ops import bell

        # Block-ELL dd products when carried (ops.bell; the per-nonzero
        # ELL gather/scatter serializes on TPU).
        mv_dd = ((lambda v: bell.dd_matvec_dd(lp.EB, v))
                 if getattr(lp, "EB", None) is not None
                 else (lambda v: so.dd_matvec_dd(lp.E, v)))
        rmv_dd = ((lambda v: bell.dd_matvec_dd(lp.ETB, v))
                  if getattr(lp, "ETB", None) is not None
                  else (lambda v: so.dd_matvec_dd(lp.ET, v)))
        return (
            prepare,
            mv_dd,
            rmv_dd,
            jnp.zeros(lp.b.shape, lp.b.dtype),
        )

    from cholesky_is_magic_tpu.ops import dense as dense_ops

    boost = (~lp.row_mask).astype(lp.A.dtype)

    if engine is not None:

        def prepare(d, cfg):
            return engine.prepare_normal(
                lp.A, d, row_boost=boost,
                refine_steps=cfg.refine_steps, dbound=cfg.dbound,
                krylov_steps=cfg.krylov_steps,
            )

    else:

        def prepare(d, cfg):
            return dense_ops.prepare_normal(
                lp.A, d, row_boost=boost,
                refine_steps=cfg.refine_steps, dbound=cfg.dbound,
                krylov_steps=cfg.krylov_steps,
            )

    return (
        prepare,
        lambda v: ddm.dd_matvec_dd(lp.A, v),
        lambda v: ddm.dd_rmatvec_dd(lp.A, v),
        boost,
    )


def _ir_solve(solve_fn, apply_dd, rhs: DD, steps: int) -> DD:
    """Double-word iterative refinement: y_{k+1} = y_k + M⁻¹(rhs - N y_k)
    with the residual in dd against the exact operator (Wilkinson IR; the
    f32 factorization M only needs to contract, dd carries the accuracy)."""
    y = ddm.dd_from(solve_fn(rhs.to_working()))
    for _ in range(steps):
        r = ddm.dd_sub(rhs, apply_dd(y))
        y = ddm.dd_add(y, ddm.dd_from(solve_fn(r.to_working())))
    return y


def _dd_dot_full(a, x: DD) -> DD:
    # a (exact f32) · x (dd), compensated: dd_dot on hi + plain dot on lo.
    return ddm.dd_add_w(ddm.dd_dot(a, x.hi), jnp.dot(a, x.lo))


@partial(jax.jit, static_argnames=("cfg", "engine"))
@highest_precision
def _polish_jit(lp, x_hi, x_lo, y0, basic, at_lower, at_upper,
                cfg: CrossoverConfig, engine=None):
    """One polish pass for a FIXED partition (see crossover() for the
    classification + bound-repair driver around it).

    PROXIMAL form: both solves are for gap-sized CORRECTIONS from the
    IPM iterate, not for the solution from scratch.  On a full-rank
    basis the correction lands on the identical vertex (B x_B = r has
    one solution), but on a DEGENERATE face — rank-deficient basic
    columns, the Netlib norm — a from-scratch min-norm completion lets
    f32 null-direction noise scale with O(‖b‖) (measured on afiro: a
    22-column basis at rank ~21 sent one variable to -57 while staying
    row-feasible to 7e-15), whereas here the noise scales with the
    O(gap)-sized correction rhs and the completion stays proximal to
    the (in-box, near-feasible) iterate."""
    d = basic.astype(lp.c.dtype)
    prepare, mv_dd, rmv_dd, boost = _ops_for(lp, engine)
    solve_fn, ok = prepare(d, cfg)

    def apply_dd(v: DD) -> DD:
        # N_B v = A (1_B ∘ (Aᵀ v)) + boost ∘ v, all in double-word.
        t = _mask_dd(d, rmv_dd(v))
        out = mv_dd(t)
        return ddm.dd_add_w(out, boost * v.to_working())

    # --- Primal: snap nonbasic to bounds, correct the basic block. ---
    x_n = jnp.where(at_lower, lp.l, jnp.where(at_upper, lp.u, 0.0))
    x0 = DD(jnp.where(basic, x_hi, x_n), jnp.where(basic, x_lo, 0.0))
    ax0 = mv_dd(x0)
    rhs_p = ddm.dd_sub(ddm.dd_from(lp.b), ax0)  # b - A x0 (dd, ~gap-sized)
    y_p = _ir_solve(solve_fn, apply_dd, rhs_p, cfg.ir_steps)
    t = _mask_dd(d, rmv_dd(y_p))  # basic correction Aᵀ y (dd)
    x_dd = ddm.dd_add(x0, t)  # nonbasic entries: t is 0 there by the mask

    # --- Dual: correct y from the iterate, same factorization. ---
    y0_dd = ddm.dd_from(y0)
    rc0 = ddm.dd_sub(ddm.dd_from(lp.c), rmv_dd(y0_dd))
    rhs_d = mv_dd(_mask_dd(d, rc0))  # B rc_B (dd, ~gap-sized)
    dy = _ir_solve(solve_fn, apply_dd, rhs_d, cfg.ir_steps)
    y_d = ddm.dd_add(y0_dd, dy)
    rc = ddm.dd_sub(rc0, rmv_dd(dy))  # c - Aᵀ y (dd)

    # The duals — and the whole certificate below — are read off the
    # POLISHED POINT, not the solve partition: a (widened) basic column
    # that lands ON its bound may legitimately carry a dual (degenerate
    # faces fail strict complementarity, so "basic" and "dual-free" are
    # different sets there; measured at m=16384: partition-based dual
    # scoring floors at sqrt(gap) ~1e-4 on exactly those columns).  Weak
    # duality only needs (y, z, w) dual-feasible and complementary with
    # x — both are point properties.
    mask_f = lp.col_mask
    on_tol = cfg.primal_tol
    on_l = mask_f & (lp.l > -0.999 * cfg.clamp) & (
        jnp.abs(x_dd.hi - lp.l) <= on_tol * (1.0 + jnp.abs(lp.l))
    )
    on_u = mask_f & (lp.u < 0.999 * cfg.clamp) & (
        jnp.abs(x_dd.hi - lp.u) <= on_tol * (1.0 + jnp.abs(lp.u))
    ) & ~on_l
    z_out = jnp.where(on_l, jnp.maximum(rc.hi, 0.0), 0.0)
    w_out = jnp.where(on_u, jnp.maximum(-rc.hi, 0.0), 0.0)

    # --- Certificate, every term double-word, all point-based. ---
    ax = mv_dd(x_dd)
    primal_res = ddm.dd_add_w(ax, -lp.b).to_working()
    primal_norm = jnp.linalg.norm(primal_res)
    # SIGNED residual pricing Aᵀ(Ax - b) for the pricing-widen repair
    # (the pricing-widen repair); one rmatvec on the already-computed
    # residual.  Sign matters: a column at its LOWER bound can only
    # increase, so it absorbs infeasibility only when a_jᵀ(b - Ax) > 0,
    # i.e. this signed score is NEGATIVE (and the mirror for upper) —
    # the host applies the sign rule where the at_lower/at_upper masks
    # live.
    price = rmv_dd(ddm.dd_from(primal_res)).to_working()
    primal_rel = jnp.max(jnp.abs(primal_res)) / (1.0 + jnp.max(jnp.abs(lp.b)))
    bound_viol = jnp.max(
        jnp.where(
            mask_f,
            jnp.maximum(lp.l - x_dd.hi, x_dd.hi - lp.u),
            0.0,
        )
    )
    # Dual residual: strictly-interior columns need rc = 0; on-bound
    # columns only the sign-violating part is an error (the clipped
    # remainder IS z / w).
    dual_err = jnp.where(
        on_l, jnp.maximum(-rc.hi, 0.0),
        jnp.where(
            on_u, jnp.maximum(rc.hi, 0.0),
            jnp.where(mask_f, jnp.abs(rc.to_working()), 0.0),
        ),
    )
    dual_rel = jnp.max(dual_err) / (1.0 + jnp.max(jnp.abs(lp.c)))

    pobj = _dd_dot_full(lp.c, x_dd)
    # b'y + l'z - u'w over the on-bound columns (duals are supported
    # there).  Written WITHOUT negating any reduction operand: with
    # w = -rc on the on_u & rc<0 columns, -u'w = +Sigma u*rc there, so
    # both bound payments are plain masked dots of rc.  XLA:CPU's
    # simplifier defeats the two_prod/two_sum compensation when a `neg`
    # sits upstream of the fused product->tree-sum (measured: 1.5e-7 on
    # an O(8) dual objective, exactly eps_f32-sized; docs/DEVNOTES.md
    # "neg upstream of dd reductions") — negate results, never inputs.
    dobj = ddm.dd_add(
        _dd_dot_full(lp.b, y_d),
        ddm.dd_add(
            _mask_dot(on_l & (rc.hi > 0.0), lp.l, rc),
            _mask_dot(on_u & (rc.hi < 0.0), lp.u, rc),
        ),
    )
    gap = jnp.abs(ddm.dd_sub(pobj, dobj).to_working()) / (
        1.0 + jnp.abs(pobj.to_working())
    )

    # Bound-magnitude scale over ALL finite bounds (boxes whose magnitude
    # lives in the lower bounds must scale the tolerance too).
    bscale = jnp.maximum(
        jnp.max(jnp.where((jnp.abs(lp.u) < cfg.clamp) & mask_f,
                          jnp.abs(lp.u), 0.0)),
        jnp.max(jnp.where((jnp.abs(lp.l) < cfg.clamp) & mask_f,
                          jnp.abs(lp.l), 0.0)),
    )
    certified = (
        ok
        & (primal_rel < cfg.primal_tol)
        & (bound_viol < cfg.primal_tol * (1.0 + bscale))
        & (dual_rel < cfg.dual_tol)
        & (gap < cfg.gap_tol)
    )
    cert = {
        "certified": certified,
        "factor_ok": ok,
        "primal_rel": primal_rel,
        "bound_violation": bound_viol,
        "dual_rel": dual_rel,
        "gap": gap,
        "n_basic": jnp.sum(basic & mask_f),
        "n_lower": jnp.sum(on_l),
        "n_upper": jnp.sum(on_u),
    }
    return (x_dd, y_d, z_out, w_out, pobj, dobj, primal_norm, rc.hi,
            price, cert)


@partial(jax.jit, static_argnames=("cfg", "engine"))
@highest_precision
def _entry_repair_jit(lp, x_hi, x_lo, cfg: CrossoverConfig, engine=None):
    """Min-norm LS correction of the ENTRY iterate toward Ax = b.

    The reference's repair iteration (affine-scaling.lisp:226-243 /
    primal-dual-affine-scaling.lisp:268-288) over ALL columns: with
    r = b - Ax, solve (AAᵀ) dy = r (d = col_mask: identity weight on
    real columns, padding inert) and take x += Aᵀ dy — the smallest
    correction reaching Ax = b, which a DIFFUSE infeasibility (the
    m=32768 entry signature) is the best case for.  All in double-word
    with PCG refinement on the f32 factor.  Returns (x_hi, x_lo,
    pviol_before, pviol_after) with pviol the relative ∞-norm primal
    infeasibility the certificate uses."""
    prepare, mv_dd, rmv_dd, boost = _ops_for(lp, engine)
    d = lp.col_mask.astype(lp.c.dtype)
    solve_fn, ok = prepare(d, cfg)

    def apply_dd(v: DD) -> DD:
        t = _mask_dd(d, rmv_dd(v))
        out = mv_dd(t)
        return ddm.dd_add_w(out, boost * v.to_working())

    x = DD(x_hi, x_lo)
    bscale = 1.0 + jnp.max(jnp.abs(lp.b))
    r0 = ddm.dd_sub(ddm.dd_from(lp.b), mv_dd(x))
    pv0 = jnp.max(jnp.abs(r0.to_working())) / bscale
    dy = _ir_solve(solve_fn, apply_dd, r0, cfg.entry_repair_ir)
    x1 = ddm.dd_add(x, _mask_dd(d, rmv_dd(dy)))
    r1 = ddm.dd_sub(ddm.dd_from(lp.b), mv_dd(x1))
    pv1 = jnp.max(jnp.abs(r1.to_working())) / bscale
    # Keep the repair only where it helped (ok guards a singular factor).
    use = ok & (pv1 < pv0)
    x_out = DD(jnp.where(use, x1.hi, x.hi), jnp.where(use, x1.lo, x.lo))
    return x_out.hi, x_out.lo, pv0, jnp.where(use, pv1, pv0)


def _column_norms(lp) -> np.ndarray:
    """Host-side ‖a_j‖ per column, for pricing-score normalization (the
    cosine form makes the score scale-invariant).  One-time O(nnz)."""
    if isinstance(lp, SparseKKTLP):
        vals = np.asarray(lp.ET.values, np.float64)  # row i of ET = col i of A
        nrm = np.sqrt((vals * vals).sum(axis=1))
    else:
        nrm = np.linalg.norm(np.asarray(lp.A, np.float64), axis=0)
    return np.maximum(nrm, 1e-30)


def _host_csc(lp):
    """Host-side fp64 CSC of A (one-time, lazy — built only when the OMP
    completion triggers).  For the ELL operand set the padded slots carry
    value 0.0 and are eliminated."""
    import scipy.sparse as sp

    if isinstance(lp, SparseKKTLP):
        idx = np.asarray(lp.E.indices, np.int64)
        vals = np.asarray(lp.E.values, np.float64)
        m, k = idx.shape
        rows = np.repeat(np.arange(m, dtype=np.int64), k)
        A = sp.csc_matrix(
            (vals.ravel(), (rows, idx.ravel())), shape=(m, lp.E.n_cols)
        )
        A.eliminate_zeros()
        return A
    return sp.csc_matrix(np.asarray(lp.A, np.float64))


def _omp_select(A_csc, r0, basic, elig_l, elig_u, col_norm, k_max: int,
                stop_inf: float):
    """Orthogonal-matching-pursuit basis completion (host fp64).

    The rank-deficit failure mode: the classified basis B is missing a
    HANDFUL of columns (|B| < rank needed), so the snap residual
    r0 = b - A x_polish has a component outside range(B) that no
    refinement removes — and correlation-only bulk admission (the
    rc-widen) keeps picking near-PARALLEL candidates whose joint
    admission is rank-deficient, wrecking the dual least-squares
    (measured at m=32768: dual 9e+1 every pass).  OMP fixes the
    selection, not the scoring: after each pick the candidate pool is
    re-scored against the RESIDUAL DEFLATED by the selected direction's
    range(B)-COMPLEMENT component (LSMR projection + Gram-Schmidt), so
    near-parallel junk scores ~0 once its direction is covered.  The
    complement projection is essential, not a nicety: deflating by the
    raw column direction leaks range(B) components into the residual,
    and with |B| spanning all but ~1e-3 of the row space a candidate is
    ~99.9% inside range(B) — the leak swamps the signal within a few
    picks (measured in the unit fixture: 32 picks where 4 suffice).
    r0 itself needs no projection (the polish residual IS the basic
    least-squares residual, already orthogonal to range(B)).

    Sign eligibility per step: an at-lower column may only increase
    (a_jᵀ r > 0), an at-upper column only decrease (mirror) — the same
    rule as the pricing-widen (see the `price` comment in _polish_jit).

    Returns (selection mask, deflated residual inf-norm).
    """
    from scipy.sparse.linalg import lsmr

    r = np.asarray(r0, np.float64).copy()
    n = A_csc.shape[1]
    B = A_csc[:, np.flatnonzero(basic)]
    Q: list[np.ndarray] = []
    sel: list[int] = []
    for _ in range(max(k_max, 0)):
        if np.linalg.norm(r, np.inf) <= stop_inf:
            break
        s = (A_csc.T @ r) / col_norm
        score = np.where((elig_l & (s > 0.0)) | (elig_u & (s < 0.0)),
                         np.abs(s), 0.0)
        if sel:
            score[np.asarray(sel)] = 0.0
        j = int(np.argmax(score))
        if score[j] <= stop_inf * 1e-3:
            break  # no sign-eligible candidate sees the leftover residual
        a_j = np.asarray(A_csc[:, [j]].todense(), np.float64).ravel()
        # range(B)-complement component of a_j (LSMR: min ‖B t − a_j‖).
        t = lsmr(B, a_j, atol=1e-12, btol=1e-12, maxiter=2000)[0]
        q = a_j - B @ t
        for qk in Q:
            q -= (qk @ q) * qk
        nq = np.linalg.norm(q)
        if nq <= 1e-10 * col_norm[j]:
            # Numerically inside span(B ∪ selected): the correlation was
            # projection noise — stop rather than admit junk.
            break
        q /= nq
        Q.append(q)
        sel.append(j)
        r -= (q @ r) * q
    mask = np.zeros(n, bool)
    if sel:
        mask[np.asarray(sel)] = True
    return mask, float(np.linalg.norm(r, np.inf))


def _mask_dot(mask, coef, v: DD) -> DD:
    """Σ_mask coef_j * v_j in dd.  The caller folds the dual sign/support
    condition into ``mask`` so no operand is ever negated (see the dobj
    comment in _crossover_jit: neg upstream of a dd reduction is unsafe
    under XLA:CPU fusion)."""
    c = jnp.where(mask, coef, 0.0)
    return ddm.dd_add_w(ddm.dd_dot(c, v.hi), jnp.dot(c, v.lo))


def crossover(
    result: SolveResult,
    lp,
    engine=None,
    config: Optional[CrossoverConfig] = None,
) -> SolveResult:
    """Polish an IPM result to a vertex-exact, certified solution.

    ``result`` must carry duals (extra y/w/z — pdas, pdas_dd and the api
    front door all do).  ``lp`` is the DeviceLP / SparseKKTLP the solver
    ran on; pass the same ``engine`` for the at-scale sparse path.  The
    returned SolveResult has the polished x / objective / duals and
    ``extra["crossover"]`` with the dd-evaluated certificate; when
    ``certified`` is False the ORIGINAL iterate is returned unchanged
    (plus the failed certificate for diagnosis) — crossover never makes
    the answer worse.

    Degenerate faces: up to ``config.max_repairs`` repair passes, each
    one factorization, host-driven (mask inputs, no re-jit).  A bound
    violation is repaired exclusively (push-to-bound: a basic column
    whose completion leaves its box goes to the violated bound — the
    rank-deficiency signature); otherwise the dual-side and primal-side
    repairs are selected independently and applied in the SAME pass
    (they act on disjoint column sets; sequential priority starves one
    side of the repair budget):

    - dual residual -> demote: a near-bound basic column whose
      post-solve |rc| stays large cannot be basic; it goes to its near
      bound (CrossoverConfig.demote_near_tol, sqrt(gap)-scaled reach;
      bulk when the rc ranking is trustworthy, else one per pass).
      With no near-bound candidate: sign-violation widen (a nonbasic
      column whose rc has the infeasible sign must LEAVE its bound —
      the simplex entering-column signal), then sign-directed forced
      demote (rc > 0 at the optimum pins x_j at its lower bound).
    - primal residual -> widen: zero-rc bound-active columns with
      pricing relevance return to the basis — the snap fixed a column
      the face does not pin (CrossoverConfig.widen_dual_tol,
      sqrt(gap)-scaled); with no zero-rc candidate, pricing-widen
      admits the nonbasic column most parallel to the residual, one
      per pass (simplex phase-1 pricing discipline).

    The thresholds scale with the CURRENT certificate gap, so the same
    loop certifies from a tight finisher iterate (gap ~1e-7, the
    original design point) and straight from a phase-1 stop (gap ~1e-4
    — where misclassified columns sit ~sqrt(gap) off their bounds and
    carry ~sqrt(gap) duals).  A repeated (partition, ban-list) state
    ends the loop (the widen/demote pair can 2-cycle on a face the
    thresholds straddle); evicted widen candidates are banned from
    re-admission, so each retry reaches the next pricing candidate.
    """
    cfg = config or CrossoverConfig()
    x = result.x
    z = result.extra["z"]
    w = result.extra["w"]
    y0 = result.extra["y"]
    x_lo = result.extra.get("x_lo")
    if x_lo is None:
        x_lo = jnp.zeros_like(x)
    entry_pviol = (None, None)
    if cfg.entry_repair_tol > 0.0:
        # Gate host-side on the solver's own primal residual so clean
        # entries pay nothing (the 2-norm bounds the relative ∞-norm the
        # repair targets).
        rel = float(result.residual_norm) / (
            1.0 + float(np.max(np.abs(np.asarray(lp.b))))
        )
        if rel > cfg.entry_repair_tol:
            x, x_lo, pv0, pv1 = _entry_repair_jit(lp, x, x_lo, cfg,
                                                  engine=engine)
            entry_pviol = (float(pv0), float(pv1))
            if _DEBUG:
                print(f"[crossover] entry repair: pviol {entry_pviol[0]:.3e}"
                      f" -> {entry_pviol[1]:.3e}")
    basic, at_lower, at_upper = classify_basis(
        x, z, w, lp.l, lp.u, lp.col_mask, theta=cfg.theta, clamp=cfg.clamp
    )
    l_np = np.asarray(lp.l, np.float64)
    u_np = np.asarray(lp.u, np.float64)
    has_l = l_np > -0.999 * cfg.clamp
    has_u = u_np < 0.999 * cfg.clamp
    # Violation tolerance scales with the magnitude of ALL finite bounds
    # (mirroring the certificate's bscale): scaling by |u| alone
    # under-sizes it on boxes whose magnitude lives in the lower bounds
    # (large negative l, small u), making push repair fire on
    # refinement-noise-sized "violations".
    bmag = max(
        np.max(np.abs(np.where(has_u, u_np, 0.0))),
        np.max(np.abs(np.where(has_l, l_np, 0.0))),
    )
    tol = cfg.primal_tol * (1.0 + bmag)
    c_np = np.abs(np.asarray(lp.c, np.float64))
    cm_np = np.asarray(lp.col_mask)
    col_norm = _column_norms(lp)
    widened = np.zeros(c_np.shape, bool)
    # Persistent ban set: a widened column that a later pass evicted
    # (demote or revert) may not be re-admitted by ANY widen rule.  The
    # transient `widened` flag cannot carry the ban — demote clears it,
    # and at m=32768 the same column sign-widened and demoted in a
    # 2-pass ping-pong that grew `basic` by a side-admission each round,
    # so the exact-state cycle key never repeated and the loop burned
    # its whole budget (measured: dual stuck at 5.9e-2 for 20 passes).
    banned = np.zeros(c_np.shape, bool)
    gap_in = float(result.extra.get("gap", np.inf))  # IPM gap: trustworthy
    repairs = 0
    seen_partitions = set()
    prev = None  # (basic, at_lower, at_upper, widened, score, act_wid)
    use_omp = False  # escalate widen selection to OMP (see omp_widen_max)
    n_reverts = 0
    A_host = None  # lazy host CSC, built only if OMP fires
    while True:
        (x_dd, y_d, z_out, w_out, pobj, dobj, primal_norm, rc_hi,
         price, cert) = _polish_jit(
            lp, x, x_lo, y0, basic, at_lower, at_upper, cfg, engine=engine
        )
        if _DEBUG:
            print(f"[crossover] pass {repairs}: "
                  f"certified={bool(cert['certified'])} "
                  f"primal {float(cert['primal_rel']):.2e} "
                  f"dual {float(cert['dual_rel']):.2e} "
                  f"gap {float(cert['gap']):.2e} "
                  f"bv {float(cert['bound_violation']):.2e} "
                  f"basic {int(cert['n_basic'])}")
        if bool(cert["certified"]) or repairs >= cfg.max_repairs:
            break
        # How badly the certificate fails, in tolerance units.
        fail_score = max(float(cert["primal_rel"]) / cfg.primal_tol,
                         float(cert["dual_rel"]) / cfg.dual_tol)
        if prev is not None and prev[5].any() and fail_score > 10.0 * prev[4]:
            # Revert-on-regression: the last action admitted columns and
            # made the certificate DECISIVELY worse (a widen into a
            # rank-deficiency sends the dual least-squares wild —
            # measured at m=32768: dual 8.1e-6 -> 5.9e-2 after one
            # widen, never recovered).  Restore the pre-action
            # partition, permanently ban the admitted columns, and let
            # the next pass pick the next candidate.  Each revert bans
            # at least one column, so this cannot loop forever.
            basic, at_lower, at_upper, widened = prev[:4]
            banned = banned | prev[5]
            n_reverts += 1
            # A reverted MULTI-column widen is the rank-deficient-
            # admission signature; repeated single-column reverts mean
            # correlation pricing keeps missing too.  Either way the
            # next widen goes through OMP (mutually-orthogonalized
            # selection) instead of raw correlation.
            if int(prev[5].sum()) > 1 or n_reverts >= 3:
                use_omp = True
            if _DEBUG:
                print(f"[crossover]   revert+ban {int(prev[5].sum())} "
                      f"(score {prev[4]:.1e} -> {fail_score:.1e})"
                      + (" -> OMP" if use_omp else ""))
            prev = None
            repairs += 1
            continue
        # The loop state is (partition, ban list): a push-to-bound that
        # evicts a just-widened column returns to the previous PARTITION
        # but with that column banned from re-widening — the next pass
        # must get to try the next pricing candidate, so `widened` and
        # `banned` are part of the cycle key (measured at m=256/block=64:
        # a bad widen blew the dual to 1.6, push evicted it, and a
        # partition-only key declared a cycle one pass before the good
        # candidate).
        key = (np.asarray(basic).tobytes()
               + np.asarray(at_lower).tobytes()
               + widened.tobytes() + banned.tobytes())
        if key in seen_partitions:
            break  # true 2-cycle: the face straddles the tols
        seen_partitions.add(key)
        gap_now = max(float(cert["gap"]), 0.0)
        sqrt_gap = float(np.sqrt(gap_now))
        # Widen scaling gap: the smaller of the current certificate
        # gap and the INCOMING iterate's IPM gap — a broken
        # intermediate partition inflates the certificate gap, and
        # letting that widen the rc-widen net admits junk.
        sqrt_gap_safe = float(np.sqrt(min(gap_now, max(gap_in, 0.0))))
        # Demote reach scales with the INCOMING gap alone: a
        # misclassified basic column sits ~sqrt(gap_in) off the bound
        # that pins it (measured at m=256/gap_in 6.4e-5: 1.24e-2 away,
        # where the current-pass gap had already shrunk to 2.7e-6 and
        # a min()-based reach of 4.9e-3 missed it).
        sqrt_gap_in = float(np.sqrt(max(gap_in, 0.0))) \
            if np.isfinite(gap_in) else sqrt_gap
        xp = np.asarray(x_dd.hi, np.float64) + np.asarray(x_dd.lo, np.float64)
        b_np = np.asarray(basic)
        viol_l = b_np & has_l & (xp < l_np - tol)
        viol_u = b_np & has_u & (xp > u_np + tol)
        if viol_l.any() or viol_u.any():
            basic = jnp.asarray(b_np & ~(viol_l | viol_u))
            at_lower = jnp.asarray(np.asarray(at_lower) | viol_l)
            at_upper = jnp.asarray(np.asarray(at_upper) | viol_u)
            repairs += 1
            if _DEBUG:
                print(f"[crossover]   push {int((viol_l | viol_u).sum())}")
            continue
        # --- Select repairs.  Demote (evict basic) and widen (admit
        # nonbasic) act on DISJOINT column sets, so when both sides of
        # the certificate fail, both repairs apply in the SAME pass —
        # sequential priority starves one side of the budget (measured
        # at m=4096/phase-1: primal stuck at 1.75e-4 for 12 straight
        # single-demote passes that never reached the widen rule).  The
        # early junk-admission hazard of widening on a dirty dual is
        # contained by the pricing-relevance gate below, not by
        # ordering.
        sel_dem_l = np.zeros_like(b_np)
        sel_dem_u = np.zeros_like(b_np)
        sel_wid = np.zeros_like(b_np)
        if float(cert["dual_rel"]) > cfg.dual_tol and cfg.demote_near_tol > 0:
            # Dual-driven demotion: a DEGENERATE face mixes two kinds
            # of near-bound columns — truly-basic (rc* = 0) and
            # at-bound-with-dual (rc* != 0) — that the sqrt(gap)-sized
            # iterate duals cannot separate at classification time.
            # The dual least-squares just computed separates them
            # exactly: a basic column whose |rc| stayed large cannot be
            # basic.  Two eligibility classes
            # (CrossoverConfig.demote_near_tol): widened columns demote
            # unconditionally to their NEAR bound (they were
            # bound-active at classification); other basic columns
            # demote only if they sit within the gap-scaled reach of a
            # bound (the iterate stopped ~sqrt(gap) short of the face).
            rc_np = np.asarray(rc_hi, np.float64)
            large_rc = b_np & cm_np & (
                np.abs(rc_np) > cfg.dual_tol * (1.0 + c_np)
            )
            reach = max(cfg.demote_near_tol, 3.0 * sqrt_gap_in)
            near_bound = (
                (has_l & (np.abs(xp - l_np)
                          <= reach * (1.0 + np.abs(l_np))))
                | (has_u & (np.abs(u_np - xp)
                            <= reach * (1.0 + np.abs(u_np))))
            )
            demote = large_rc & (widened | near_bound)
            # Bulk cap: when the primal side is CLEAN and no candidate
            # is a widened (experimentally admitted) column, the rc
            # ranking is trustworthy and each near-bound eviction costs
            # only its ~reach-sized snap — demote every offender in one
            # pass (the measured at-scale case: m=32768, dual floor
            # 2.2e-4 spread over many columns each ~2e-4 off bound).
            # Otherwise single-column pivot discipline: a bulk demote
            # on a dirty primal evicts truly-basic columns wholesale
            # (measured at m=512: demote-3 sent the primal 4.6e-5 ->
            # 3.8e-3 and the loop 2-cycled), and when two widened
            # columns carry large rc (an inconsistent dual) bulk
            # eviction throws out the right one with the wrong one
            # (measured at m=256) — one at a time lets each re-solve
            # re-rank the rest.
            primal_clean = float(cert["primal_rel"]) < cfg.primal_tol
            bulk = (cfg.demote_max
                    if primal_clean and not (demote & widened).any() else 1)
            if int(demote.sum()) > bulk:
                keep = np.argsort(-np.abs(np.where(demote, rc_np, 0.0))
                                  )[:bulk]
                demote = np.zeros_like(demote)
                demote[keep] = True
            if not demote.any():
                # Sign-violation widen (one column): a NONBASIC on-bound
                # column with an infeasible-sign rc — rc < 0 at a lower
                # bound says the objective IMPROVES by raising x_j, so
                # the optimum cannot hold it there — is the simplex
                # entering-column signal; neither demote (scans basic
                # columns) nor the primal widen (gated on a dirty
                # primal) can see it (measured at m=256/block=64: the
                # exact optimum point, gap 2e-15, with rc=-0.64 on one
                # at-lower column — the dual least-squares zeroed rc on
                # a dependent basic column instead; widening lets the
                # next dual solve zero both or demote evict the wrong
                # one).  Banned (previously evicted) columns excluded.
                sviol = cm_np & ~b_np & ~widened & ~banned & (
                    (np.asarray(at_lower)
                     & (rc_np < -cfg.dual_tol * (1.0 + c_np)))
                    | (np.asarray(at_upper)
                       & (rc_np > cfg.dual_tol * (1.0 + c_np)))
                )
                if sviol.any():
                    j_s = int(np.argmax(np.where(sviol, np.abs(rc_np), 0.0)))
                    sel_wid[j_s] = True
                    if _DEBUG:
                        print(f"[crossover]   sign-widen j={j_s} "
                              f"rc={rc_np[j_s]:.2e}")
                elif large_rc.any():
                    # Forced demote (one column, SIGN-directed): no
                    # basic large-rc column sits near a bound, yet
                    # rc != 0 on a basic column means the optimum pins
                    # it SOMEWHERE (if it could move freely, rc would
                    # have to vanish) — typical when the indicator
                    # admits > m basic columns and the overdetermined
                    # dual solve cannot zero every basic rc.  rc_j > 0:
                    # the objective grows with x_j, so the optimum holds
                    # it at its LOWER bound; rc_j < 0 the mirror.  The
                    # nearer-bound rule is useless here (the min-norm
                    # completion parked the column far from both
                    # bounds); the sign rule is exact.  One column per
                    # pass — the primal re-solve must absorb a possibly
                    # large shift, and the push/widen rules clean up any
                    # overshoot next pass.
                    # Only columns whose SIGN-PREFERRED bound exists are
                    # candidates: rc_j > 0 pins at lower, rc_j < 0 at
                    # upper, and pinning the OPPOSITE bound is a
                    # dual-infeasible placement the next certificate is
                    # guaranteed to reject (a burnt pass).  A large-rc
                    # column with no preferred bound is not repairable by
                    # this rule — leave it basic and let the loop end
                    # honestly if nothing else fires.
                    pref_ok = np.where(rc_np > 0.0, has_l, has_u)
                    cand = large_rc & pref_ok
                    if cand.any():
                        j_f = int(np.argmax(
                            np.where(cand, np.abs(rc_np), 0.0)))
                        if rc_np[j_f] > 0.0:
                            sel_dem_l[j_f] = True
                        else:
                            sel_dem_u[j_f] = True
            else:
                near_l = (demote & has_l
                          & (((xp - l_np) <= (u_np - xp)) | ~has_u))
                near_u = demote & has_u & ~near_l
                sel_dem_l, sel_dem_u = near_l, near_u  # free cols excluded
        omp_fired = False
        if (use_omp and cfg.omp_widen_max > 0
                and float(cert["primal_rel"]) > cfg.primal_tol
                and cfg.widen_dual_tol > 0):
            # OMP escalation (CrossoverConfig.omp_widen_max): the
            # correlation widen regressed — select a mutually
            # orthogonalized completion set on the host instead.
            try:
                if A_host is None:
                    A_host = _host_csc(lp)
            except ImportError:
                A_host = False  # no scipy: escalation unavailable
            if A_host is not False:
                b_host = np.asarray(lp.b, np.float64)
                r_host = b_host - A_host @ xp
                elig = cm_np & ~b_np & ~widened & ~banned
                omp_sel, r_left = _omp_select(
                    A_host, r_host, b_np,
                    elig & np.asarray(at_lower),
                    elig & np.asarray(at_upper),
                    col_norm, cfg.omp_widen_max,
                    0.5 * cfg.primal_tol * (1.0 + np.max(np.abs(b_host))),
                )
                if omp_sel.any():
                    sel_wid |= omp_sel
                    omp_fired = True
                    if _DEBUG:
                        print(f"[crossover]   omp-widen "
                              f"{int(omp_sel.sum())} "
                              f"(residual left {r_left:.2e})")
        if (not omp_fired
                and float(cert["primal_rel"]) > cfg.primal_tol
                and cfg.widen_dual_tol > 0):
            # Widen-repair (CrossoverConfig.widen_dual_tol): degenerate
            # bound-active columns back into the basis, identified by
            # the POLISHED rc (decades sharper than the iterate duals;
            # the sqrt(gap) term covers how far complementarity can be
            # trusted at the incoming gap).
            rc_ab = np.abs(np.asarray(rc_hi, np.float64))
            wtol = max(cfg.widen_dual_tol, sqrt_gap_safe)
            # Signed eligibility (see the price comment in _polish_jit):
            # at-lower columns may only increase (signed score < 0),
            # at-upper columns only decrease (signed score > 0).
            signed = np.asarray(price, np.float64) / col_norm
            can_move = ((np.asarray(at_lower) & (signed < 0.0))
                        | (np.asarray(at_upper) & (signed > 0.0)))
            score = np.where(can_move & cm_np, np.abs(signed), 0.0)
            smax = float(score.max())
            # rc-widen requires pricing RELEVANCE too: a zero-rc column
            # with no component along the residual cannot reduce the
            # primal error — adding it only risks a rank-deficient
            # basis whose dual least-squares goes wild (measured: six
            # rc<1e-3 irrelevant columns sent dual_rel to 3.7e-1).
            # smax == 0 (no movable column at all) would make the
            # relevance gate `score >= 0.02 * smax` vacuously true and
            # bulk-admit every small-rc column — the exact hazard the
            # gate exists to prevent; require a live pricing signal.
            degen = (~b_np) & cm_np & (
                rc_ab < wtol * (1.0 + c_np)
            ) & (smax > 0.0) & (score >= 0.02 * smax) & ~widened & ~banned
            if not degen.any():
                # Pricing-widen: no zero-rc candidate — the dual solve
                # is exact for the wrong point, so rc cannot see the
                # missing column; the residual direction can.  ONE
                # column per pass (the simplex entering-column
                # discipline): bulk pricing admits near-parallel junk
                # whose cleanup demotes the true column along with it.
                score = np.where(widened | banned, 0.0, score)
                if float(score.max()) > 0.0:
                    degen = np.zeros_like(b_np)
                    degen[int(np.argmax(score))] = True
            if degen.any() and _DEBUG:
                print(f"[crossover]   widen {int(degen.sum())}")
            sel_wid |= degen
            # NO raw rank-fill rule: bulk-admitting the top pricing
            # candidates by CORRELATION alone was measured (m=32768
            # phase-1.5 entry) to wreck the dual least-squares (9e+1)
            # every pass — the top-k correlated columns are near-parallel
            # and jointly rank-deficient.  The principled completion is
            # the OMP escalation above (omp_widen_max), which
            # re-orthogonalizes the candidate pool after every pick and
            # only takes over after a bulk widen has regressed.
        sel_dem = sel_dem_l | sel_dem_u
        if not (sel_dem.any() or sel_wid.any()):
            break  # failure is not a repairable one
        if _DEBUG and sel_dem.any():
            print(f"[crossover]   demote {int(sel_dem.sum())}")
        # Record the pre-action state for revert-on-regression; a
        # demoted WIDENED column was tried-and-rejected — ban it.
        prev = (basic, at_lower, at_upper, widened, fail_score,
                sel_wid.copy())
        banned = banned | (widened & sel_dem)
        widened = (widened & ~sel_dem) | sel_wid
        basic = jnp.asarray((b_np & ~sel_dem) | sel_wid)
        at_lower = jnp.asarray(
            (np.asarray(at_lower) | sel_dem_l) & ~sel_wid)
        at_upper = jnp.asarray(
            (np.asarray(at_upper) | sel_dem_u) & ~sel_wid)
        repairs += 1
    certified = bool(cert["certified"])
    cert = {k: (bool(v) if k in ("certified", "factor_ok") else v)
            for k, v in cert.items()}
    cert["repairs"] = repairs
    cert["widened"] = int(widened.sum())
    if entry_pviol[0] is not None:
        cert["entry_repair_pviol"] = entry_pviol
    if not certified:
        extra = dict(result.extra)
        extra["crossover"] = cert
        return dataclasses.replace(result, extra=extra)
    extra = dict(result.extra)
    extra.update(
        gap=cert["gap"], dual_objective=dobj.to_working(),
        x_lo=x_dd.lo, y=y_d.to_working(), w=w_out, z=z_out,
        crossover=cert,
    )
    return SolveResult(
        x=x_dd.to_working(),
        objective=pobj.to_working(),
        status=jnp.asarray(Status.OPTIMAL, jnp.int32),
        iterations=result.iterations,
        residual_norm=primal_norm,
        extra=extra,
    )
