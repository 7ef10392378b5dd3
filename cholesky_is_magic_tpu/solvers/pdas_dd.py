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
from cholesky_is_magic_tpu.solvers.pdas import (
    PDASConfig,
    _box_step,
    _pos_step,
    make_pdas,
)
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


def make_pdas_dd(lp: DeviceLP, config: Optional[PDASConfig] = None) -> PDASDDState:
    """Promote the standard f32 initialization to double-word."""
    st = make_pdas(lp, config)
    return PDASDDState(
        x=ddm.dd_from(st.x),
        y=ddm.dd_from(st.y),
        w=ddm.dd_from(st.w),
        z=ddm.dd_from(st.z),
        lp=st.lp,
    )


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
    ax = ddm.dd_matvec_dd(lp.A, st.x)
    primal_dd = ddm.dd_add_w(ax, -lp.b)
    # Dual residual Aᵀ y + z - w - c in dd.
    aty = ddm.dd_matvec_dd(lp.A.T, st.y)
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


def _dd_axpy(v: DD, t, dv) -> DD:
    """v - t*dv with error-free accumulation into the double word."""
    return ddm.dd_add_w(v, -(t * dv))


def pdas_dd(
    state: PDASDDState,
    config: Optional[PDASConfig] = None,
    engine=None,
) -> SolveResult:
    """Tight-gap driver: plain Newton steps (no repair/recenter paths —
    use solvers.pdas to get feasible/centered first if needed, or rely on
    the standard init), best-iterate tracking, precision-floor exit."""
    cfg = config or PDASConfig(gap_tol=1e-8, max_iters=300)
    return _pdas_dd_jit(state, cfg, engine)


@highest_precision
@partial(jax.jit, static_argnames=("cfg", "engine"))
def _pdas_dd_jit(state: PDASDDState, cfg: PDASConfig, engine=None) -> SolveResult:
    lp = state.lp

    from cholesky_is_magic_tpu.kkt.newton import FILTER_THRESHOLD

    def kkt_dd(st, sl_dd, su_dd, sl, su, g_dd, h_dd, op):
        """IPM-specialized dd elimination.  With the exact complementarity
        rhs e = w∘su, f = z∘sl, the eliminated terms simplify: e/su = w,
        f/sl = z, so alpha = beta·(-h - w + z) — an O(1) quantity whose
        cancellation against g (O(gap)) MUST happen in double-word, or the
        f32 matvec noise (~1e-7·|alpha|) swamps the Newton rhs."""
        w32 = st.w.to_working()
        z32 = st.z.to_working()
        pu = su <= FILTER_THRESHOLD
        pl = sl <= FILTER_THRESHOLD
        both_absent = ~pu & ~pl
        use_u = pu | both_absent
        use_l = pl | both_absent
        a = jnp.where(use_u, w32 / su, 0.0)
        bb = jnp.where(use_l, z32 / sl, 0.0)
        beta = 1.0 / jnp.maximum(a + bb, 1e-30)

        alpha_dd = ddm.dd_scale(
            ddm.dd_add(ddm.dd_neg(h_dd), ddm.dd_sub(st.z, st.w)), beta
        )
        Aalpha = ddm.dd_add(
            ddm.dd_matvec(lp.A, alpha_dd.hi),
            ddm.DD(lp.A @ alpha_dd.lo, jnp.zeros_like(g_dd.hi)),
        )
        rhs = ddm.dd_sub(g_dd, Aalpha).to_working()
        dy, ok = op.solve_scaled_normal(jnp.sqrt(beta), rhs)
        t_dd = ddm.dd_matvec(lp.A.T, dy)
        dx_dd = ddm.dd_add(alpha_dd, ddm.dd_scale(t_dd, beta))
        dx = dx_dd.to_working()
        # dw = w + w·dx/su,  dz = z - z·dx/sl  (filtered: dw = w, dz = z).
        dw = jnp.where(
            use_u,
            ddm.dd_add(st.w, ddm.dd_div(ddm.dd_mul(st.w, dx_dd), su_dd)).to_working(),
            w32,
        )
        dz = jnp.where(
            use_l,
            ddm.dd_sub(st.z, ddm.dd_div(ddm.dd_mul(st.z, dx_dd), sl_dd)).to_working(),
            z32,
        )
        # Padding inertness: the sanitized rhs (e = f = 0 at padded entries,
        # not w*su / z*sl) makes the e/su = w, f/sl = z identities above
        # wrong exactly there, yielding dw = w, dz = z — which _pos_step
        # turns into a permanent ratio of 1, capping every Newton step.
        # Zero the deltas on masked entries (matching solve_kkt_newton's
        # behavior with a sanitized rhs).
        dx = jnp.where(lp.col_mask, dx, 0.0)
        dw = jnp.where(lp.col_mask, dw, 0.0)
        dz = jnp.where(lp.col_mask, dz, 0.0)
        return dw, dx, dy, dz, ok

    def one_iteration(st: PDASDDState):
        sl_dd, su_dd, sl, su, wu, zl, primal_dd, dual_dd = _dd_violation(st)
        pobj_dd, dobj_dd = _dd_objectives(st, cfg.clamp)
        gap_dd = ddm.dd_sub(pobj_dd, dobj_dd)
        denom = jnp.maximum(
            jnp.maximum(jnp.abs(pobj_dd.to_working()), jnp.abs(dobj_dd.to_working())),
            1.0,
        )
        gap = jnp.abs(gap_dd.to_working()) / denom

        boost = (~lp.row_mask).astype(jnp.float32)
        if engine is None:
            # true_residual: refine against the UNASSEMBLED operator in
            # double-word — corrects the f32 rounding of assembling N,
            # which otherwise floors the direction accuracy near 1e-7.
            op = dense_kkt_operator(
                lp.A, row_boost=boost, refine_steps=cfg.refine_steps,
                true_residual=True,
            )
        else:
            from cholesky_is_magic_tpu.kkt.newton import sparse_kkt_operator

            # Engine refinement against the unassembled operator — the
            # sparse-path rendering of true_residual above, required for
            # the direction accuracy the dd iterates need near gap 1e-8.
            op = sparse_kkt_operator(
                lp.A, engine, row_boost=boost, refine_steps=cfg.refine_steps
            )
        w32 = st.w.to_working()
        z32 = st.z.to_working()
        dw, dx, dy, dz, ok = kkt_dd(st, sl_dd, su_dd, sl, su, primal_dd, dual_dd, op)
        step = jnp.minimum(
            _box_step(sl, su, dx),
            jnp.minimum(_pos_step(w32, dw), _pos_step(z32, dz)),
        )
        t = jnp.minimum(1.0, cfg.gamma * step)
        new = PDASDDState(
            x=_dd_axpy(st.x, t, dx),
            y=_dd_axpy(st.y, t, dy),
            w=_dd_axpy(st.w, t, dw),
            z=_dd_axpy(st.z, t, dz),
            lp=lp,
        )
        return new, gap, ok

    def body(carry):
        st, i, _gap, best_gap, best_st, since_best, _status = carry
        new_st, gap, ok = one_iteration(st)
        improved = gap < best_gap
        best_st = jax.tree.map(lambda b, c: jnp.where(improved, c, b), best_st, st)
        best_gap = jnp.where(improved, gap, best_gap)
        since_best = jnp.where(improved, 0, since_best + 1)
        status = jnp.where(ok, Status.RUNNING, Status.SINGULAR).astype(jnp.int32)
        return new_st, i + 1, gap, best_gap, best_st, since_best, status

    def cond(carry):
        _st, i, gap, _bg, _bst, since_best, status = carry
        return (
            (gap >= cfg.gap_tol)
            & (status == Status.RUNNING)
            & (i < cfg.max_iters)
            & (since_best < cfg.stall_exit_iters)
        )

    inf = jnp.asarray(np.inf, jnp.float32)
    st, iters, gap, best_gap, best_st, since_best, status = jax.lax.while_loop(
        cond,
        body,
        (state, jnp.asarray(0, jnp.int32), inf, inf, state,
         jnp.asarray(0, jnp.int32), jnp.asarray(Status.RUNNING, jnp.int32)),
    )
    use_best = best_gap < gap
    st = jax.tree.map(lambda b, c: jnp.where(use_best, b, c), best_st, st)
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
                since_best >= cfg.stall_exit_iters,
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
            "dual_objective": dobj_dd.to_working(),
            "x_lo": st.x.lo,
            "y": st.y.to_working(),
            "w": st.w.to_working(),
            "z": st.z.to_working(),
        },
    )
