"""Primal-dual affine scaling with the block-eliminated KKT Newton step.

Reference: primal-dual-affine-scaling.lisp.  Preserved feature-for-feature:

- bound clamping to +/-*clamp* = 1e8 (:37-45) and degenerate-interval
  widening (make-pdas :89-94);
- primal init from the *unclamped* bounds with the 1e6/1e10 thresholds
  (:98-107), dual init z, w from sign(c) (:109-118);
- row equilibration of (A, b) at construction (scale-constraints :50-73);
- the violation vector (slacks, complementarities w∘su / z∘sl, primal and
  dual residuals, :135-150);
- repair iterations when primal infeasibility exceeds 1e-2, including the
  x >= 1e-4 floor after the step (:268-288);
- the stalled-step recenter + dual perturbation path (repair flag,
  :348-366, driver :393);
- separate primal/dual ratio tests box-step/pos-step (:166-198) and the
  0.9-damped, capped-at-1 step (:375-379);
- termination at relative duality gap < 1e-4 (:394).

The KKT Newton direction uses kkt.newton.kkt_reduce / kkt_backsub — one
MXU normal-equations Cholesky per iteration shared across the
repair/recenter/newton branches (the reference re-analyzes CHOLMOD from
scratch each call, sparse-cholesky.lisp:506-522; under jit the compiled
factorization graph is reused, strictly better, and under vmap the shared
solve keeps a batch at one factorization per iteration).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_is_magic_tpu.ingest.device import DeviceLP
from cholesky_is_magic_tpu.kkt.newton import kkt_backsub, kkt_reduce
from cholesky_is_magic_tpu.ops import dense as dense_ops
from cholesky_is_magic_tpu.solvers.affine import (
    _centering_direction,
    _into_interior,
    _max_step,
    _slack,
)
from cholesky_is_magic_tpu.solvers.result import SolveResult, Status
from cholesky_is_magic_tpu.utils.precision import highest_precision


@dataclasses.dataclass(frozen=True)
class PDASConfig:
    clamp: float = 1e8  # *clamp* (:37)
    gamma: float = 0.9  # step damping (:377)
    gap_tol: float = 1e-4  # driver stop (:394)
    primal_feasible_tol: float = 1e-2  # repair trigger (:333)
    stall_step: float = 1e-6  # repair-flag trigger (:393)
    repair_floor: float = 1e-4  # x floor after repair (:285-287)
    repair_slack_cap: float = 1e4  # slack cap in repair/recenter (:273,354)
    max_iters: int = 300
    refine_steps: int = 1
    # Singular-retry diagonal floor, relative to max(diag N): when an f32
    # Cholesky of the normal matrix fails near convergence, refactor once
    # with N + dbound*max(diag)*I (refinement still targets the exact
    # operator).  The dense rendering of CHOLMOD's dbound knob, which the
    # reference binds (wrapper.c dbound accessor; the reference's own
    # behavior on a singular factor is to stop, affine-scaling.lisp:178).
    # 0 disables (exact reference semantics).
    dbound: float = 1e-6
    # Krylov-accelerated refinement (ops.krylov): > 0 replaces the
    # Richardson refinement inside every normal solve with that many
    # flexible-PCG iterations (f32 factor as preconditioner, explicit
    # double-word residuals).  Converges where plain refinement diverges —
    # kappa(N) beyond ~1/eps_f32, i.e. gaps tight enough that slack ratios
    # overwhelm the f32 factor.  Costs one extra N-apply per step; 0 keeps
    # the default Richardson refinement.
    krylov_steps: int = 0
    # Gap-gated Krylov escalation: with krylov_steps > 0 AND this > 0,
    # each iteration's normal solves run the cheap Richardson refinement
    # while the relative duality gap is >= this threshold and switch to
    # the PCG path only below it — both branches share the iteration's one
    # factorization (ops.krylov.gated, a lax.cond inside the jitted loop).
    # Rationale: kappa(N) grows like 1/mu, so the Richardson wall is only
    # reached near the floor; paying krylov_steps N-applies per solve in
    # the early iterations costs ~12x the plain iteration.  Measured
    # (m=16384 staircase, dd finisher, gate 1e-5): 2.4 s vs 7.6 s ungated
    # — but the floor reached is 7.3e-7 vs 4.2e-8, because the Richardson
    # steps near the switch produce a less-centered endgame trajectory
    # (docs/DEVNOTES.md "gap-gated Krylov").  A speed/accuracy KNOB, not a
    # free win.  0 disables the gate (PCG unconditionally whenever
    # krylov_steps > 0 — the r2 behavior).
    krylov_gate_gap: float = 0.0
    # Mehrotra predictor-corrector (TPU-build extension; the reference is
    # pure affine scaling, one-pdas-iteration :319-383): after the affine
    # predictor, re-solve on the SAME factorization with the
    # sigma*mu-centered, second-order-corrected complementarity rhs
    # (sigma = (mu_aff/mu)^3, Mehrotra 1992).  Cost: one extra pair of
    # triangular solves per iteration (the factorization is shared via
    # prepare_scaled_normal); gain: roughly half the iterations to a
    # tight gap.  Off by default — the plain step is the
    # reference-faithful semantics.  Branch-cost note (the same vmap trap
    # documented on the repair/recenter branches): the corrector solves
    # run BRANCHLESSLY and are selected out on repair/recenter
    # iterations — wasted backsolves exactly on off-fast-path iterations.
    # Accepted: they ride the shared factorization (cheap), a lax.cond
    # would recompute it per branch under vmap, and repair/recenter
    # iterations are rare (<10% on the measured suites).
    mehrotra: bool = False
    # Gondzio multiple centrality correctors (requires mehrotra=True; a
    # TPU-build extension like the Mehrotra step itself — the reference
    # is pure affine scaling).  After the predictor-corrector direction,
    # up to this many additional correctors run ON THE SAME factorization:
    # each evaluates the complementarity products at an ENLARGED trial
    # step (current + gondzio_delta), clips them into the centrality box
    # [beta_min, beta_max]·(sigma mu), and re-solves with the outside
    # part folded into the rhs deviations; a corrector is kept only if it
    # grows the step by at least gondzio_gamma·gondzio_delta (Gondzio
    # 1996, "Multiple centrality corrections...").  Cost: one extra
    # solve-pair per corrector on the shared factor.  Measured, honest:
    # on small dense dd solves it trims 1-2 iterations (11->9, 12->10 on
    # the 30x48 suite LPs); on the at-scale tiled-sparse family
    # (m=16384) it cut phase-1 iterations 15->13 but LOST wall-clock
    # (455->613 ms — the recycled-factor solves there are ~40% of an
    # iteration, so 2 corrector solve-pairs cost more than the saved
    # iterations) and degraded the finisher's bounce-captured dip
    # (8.6e-8 -> 1.2e-6).  Use only where factorization truly dominates
    # the solve (dense operands, krylov_steps == 0).  0 disables.
    gondzio_correctors: int = 0
    gondzio_delta: float = 0.1
    gondzio_beta_min: float = 0.1
    gondzio_beta_max: float = 10.0
    gondzio_gamma: float = 0.1
    # Correctors run only while the relative gap is ABOVE this gate —
    # they are a midgame tool.  At the f32 precision floor the trial
    # complementarity products are rounding noise, so corrector solves
    # there are wasted factor-backsolves (the accept test compares
    # noise).  NB: raw iteration counts at the f32 floor are a lottery
    # either way — on a 30x48 f32 run with gap_tol=1e-8 (unreachable)
    # and no bounce exit, plain mehrotra exited at 31 only because its
    # floor oscillation hit gap == 0.0 exactly, while gondzio ran to the
    # stall window with a BETTER gap (1.2e-7); with the production
    # bounce-exit config the counts are 13 (gondzio) vs 14 (plain).
    gondzio_gate_gap: float = 1e-4
    # Step damping used for the corrector step when mehrotra=True: the
    # centered step tolerates far less conservative damping than the pure
    # affine step (0.9), and the tail convergence rate is set directly by
    # it (complementarity shrinks by ~(1 - gamma(1 - sigma)) per
    # iteration).
    mehrotra_gamma: float = 0.99
    # Dense factor/solve kernel selection (ops.dense.prepare_normal):
    # "direct" = lax Cholesky + per-rhs triangular solves; "inverse" =
    # static-recursive blocked Cholesky + ONE explicit triangular inverse,
    # after which every solve is two matvecs.  "inverse" is the vmapped/
    # batched-mode kernel: under vmap the serial per-rhs trisolves are the
    # dominant batched-iteration cost (measured 3.2x on the (256, 64, 128)
    # component — benchmarks/profile_batched_prims.py); solve_batch
    # selects it automatically.  Single-LP solves keep "direct" (one wide
    # trisolve sweep per solve loses to two narrow ones there).  Only the
    # plain dense backend reads this; engine/mesh paths ignore it.
    factor_method: str = "direct"
    # Record per-iteration (gap, pobj, step) into result.extra["trace"] —
    # the TPU rendering of the reference's per-iteration stdout lines
    # (one-pdas-iteration :336-338, :376).
    record_trace: bool = False
    # Additionally record the pre-step primal iterate x each iteration
    # (trace["x"], (max_iters, N)) — the trajectory the BASELINE.md
    # "iterate-trajectory match 1e-6" metric compares.  Implies the memory
    # cost max_iters * N; off by default.
    record_iterates: bool = False
    # Stop when the best-seen gap has not improved for this many iterations
    # (the working-precision floor: f32+dd bottoms out near gap ~1e-6 and
    # iterating further *damages* the iterate). The best-seen state is what
    # the solver returns.
    stall_exit_iters: int = 40
    # Bounce exit (precision-floor detector, at-scale wall-clock lever):
    # once a feasible iterate has reached best_gap < bounce_exit_floor,
    # exit the moment the CURRENT gap exceeds bounce_exit_ratio*best_gap.
    # Measured rationale (m=16384 staircase dd finisher, traced): the gap
    # dips to its floor by iteration ~9-10 and then oscillates chaotically
    # 1-2 decades above it — e.g. 4.2e-8 at iter 8, then 1.8e-7, 3.0e-6,
    # ... — so the stall window burns stall_exit_iters * ~360 ms PCG
    # iterations (~60% of the finisher wall-clock) confirming a floor the
    # bounce already proved.  The returned state is the best iterate
    # either way; status PRECISION_FLOOR.  0 disables (default: the
    # stall-window-only semantics; the bounce is an exit accelerator, so
    # enabling it never changes the answer, only how long the solver
    # spends re-confirming it).
    bounce_exit_ratio: float = 0.0
    bounce_exit_floor: float = 1e-5
    # Entry min-norm repair (pdas_dd only): when > 0 and the ENTRY
    # iterate's relative primal infeasibility max|Ax-b|/(1+max|b|)
    # exceeds this, run ONE damped min-norm LS correction toward Ax = b
    # (the reference's repair iteration, affine-scaling.lisp:226-243 /
    # primal-dual-affine-scaling.lisp:268-288, identity column weights)
    # before the Newton loop.  Rationale (docs/DEVNOTES.md "knife
    # edge"): pdas_dd is Newton-only and its precision floor tracks the
    # entry residual — at m=32768 a generic phase-1 exit lands at
    # resid ~2.5e-2 and floors the finisher at 1.16e-5, where a lucky
    # 1.0e-3 exit reaches 1.9e-7; the repair removes the luck.  Costs
    # one identity-weighted factorization + entry_repair_refines
    # refinement solves.  0 disables (default).
    entry_repair_tol: float = 0.0
    entry_repair_refines: int = 2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "w", "z", "lp"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class PDASState:
    x: jax.Array  # primal
    y: jax.Array  # equality duals
    w: jax.Array  # upper-bound duals (> 0)
    z: jax.Array  # lower-bound duals (> 0)
    lp: DeviceLP  # with clamped/widened bounds and equilibrated (A, b)


def push_interior(x, l, u, mask, delta):
    """Pull x at least ``delta`` inside [l, u] (absolute, capped at the
    interval width; intervals narrower than 2*delta center).

    The IPM warm-start push: a warm point from a NEARBY LP sits jammed
    against the old active set (slacks ~gap), where Newton-only steps
    stall — the ratio tests cap every step by slack/|dx|.  Re-opening the
    slacks to ~delta restores a centered-enough start; the cost on a
    same-LP continuation is a few extra iterations (measured: +4 at
    delta=1e-2), the gain on a perturbed re-solve is convergence at all
    (measured: 2%-drifted objective, delta=0 stalls at gap 3e-2;
    delta=1e-2 reaches 7e-9 in 2/3 of the cold iteration count; over a
    chain of five 2%-drift re-solves delta=3e-2 converges every step
    where 1e-2 stalls once — size the push to the perturbation).
    """
    margin = delta * jnp.minimum(1.0, u - l)
    xi = jnp.clip(x, l + margin, u - margin)
    xi = jnp.where(u - l < 2 * margin, 0.5 * (l + u), xi)
    return jnp.where(mask, xi, x)


def make_pdas(
    lp: DeviceLP,
    config: Optional[PDASConfig] = None,
    warm: Optional["PDASState"] = None,
    warm_push: float = 0.0,
    warm_blend: float = 0.0,
) -> PDASState:
    """Construct the primal-dual state (make-pdas, :75-133).

    ``warm`` restarts from a prior state's iterates (x, y, w, z) — e.g. a
    checkpoint (utils.checkpoint) or the solution of a nearby LP — while
    rebuilding the equilibrated problem data from ``lp``.

    ``warm_push`` > 0 re-opens the warm iterate's bound slacks to at
    least that margin (push_interior) — use ~1e-2 when the warm point
    solves a *different* (perturbed) instance; leave 0 when continuing
    the same LP (e.g. the pdas -> pdas_dd finisher flow).

    ``warm_blend`` in (0, 1] mixes the cold initialization INTO the warm
    iterates: state = (1-b)*warm + b*cold (all four blocks).  This is the
    Skajaa-Andersen-style warm start for perturbed re-solves: a converged
    iterate sits jammed on the (now slightly wrong) active set, where a
    single blocking coordinate truncates every Newton step — measured on
    the 2%-drift chain at 25fv47 scale, the pure warm start costs MORE
    iterations than cold (ratio 1.3), a push breaks Ax=b and triggers
    repair, while blend 0.2 + mehrotra runs the chain at 0.63x the cold
    iteration count with no phase-1 solve at all.  The blend restores
    interior margin everywhere (cold x is widely interior, cold duals are
    O(1)) while keeping the warm point's information; unlike
    ``warm_push`` it moves x along a direction that also re-centers the
    duals, and the primal infeasibility it introduces is absorbed in the
    first full Newton step rather than a repair loop."""
    cfg = config or PDASConfig()
    mask = lp.col_mask

    # Row equilibration (scale-constraints, :50-73) on the padded arrays:
    # padded rows have max|a| = 0 < 1e-6 -> scale 1.
    row_max = jnp.max(jnp.abs(lp.A), axis=1)
    scale = jnp.where(row_max < 1e-6, 1.0, 1.0 / jnp.where(row_max == 0, 1.0, row_max))
    A = lp.A * scale[:, None]
    b = lp.b * scale

    raw_l, raw_u = lp.l, lp.u  # +/-1e30-encoded "infinities"
    l = jnp.clip(raw_l, -cfg.clamp, cfg.clamp)
    u = jnp.clip(raw_u, -cfg.clamp, cfg.clamp)
    degenerate = mask & ((u - l) < 1e-6)
    l = jnp.where(degenerate, l - 5e-7, l)
    u = jnp.where(degenerate, u + 5e7, u)
    l = jnp.where(mask, l, lp.l)
    u = jnp.where(mask, u, lp.u)

    # Primal init from the raw bounds (:98-107; thresholds 1e10 then 1e6).
    delta = raw_u - raw_l
    x = jnp.where(
        (raw_l < -1e10) & (raw_u > 1e10),
        0.0,
        jnp.where(
            raw_l < -1e6,
            raw_u - jnp.minimum(delta / 2, 1.0 + 0.1 * jnp.abs(raw_u)),
            jnp.where(
                raw_u > 1e6,
                raw_l + jnp.minimum(delta / 2, 1.0 + 0.1 * jnp.abs(raw_l)),
                (raw_l + raw_u) / 2,
            ),
        ),
    )
    x = jnp.where(mask, x, 0.0)

    # Dual init from sign(c) (:109-118); padded cols have c = 0 -> (1, 1).
    c = lp.c
    z = jnp.where(c > 0, 1.0 + c, 1.0)
    w = jnp.where(c < 0, 1.0 - c, 1.0)

    new_lp = dataclasses.replace(lp, A=A, b=b, l=l, u=u)
    if warm is not None:
        wx = warm.x
        wy, ww, wz = warm.y, warm.w, warm.z
        if warm_blend > 0.0:
            bl = warm_blend
            wx = (1 - bl) * wx + bl * x
            wy = (1 - bl) * wy + bl * jnp.zeros_like(b)
            ww = (1 - bl) * ww + bl * w
            wz = (1 - bl) * wz + bl * z
        if warm_push > 0.0:
            wx = push_interior(wx, l, u, mask, warm_push)
        x = _into_interior(wx, l, u, mask)
        return PDASState(
            x=x,
            y=wy,
            w=jnp.maximum(ww, 1e-8),
            z=jnp.maximum(wz, 1e-8),
            lp=new_lp,
        )
    return PDASState(x=x, y=jnp.zeros_like(b), w=w, z=z, lp=new_lp)


def make_pdas_sparse(
    sf,
    block: int = 128,
    config: Optional[PDASConfig] = None,
    dtype=None,
    snode_align: bool = True,
    engine=None,
):
    """StandardForm -> (PDASState over a fully sparse SparseKKTLP, engine).

    The at-scale construction: host-side row equilibration
    (scale-constraints, primal-dual-affine-scaling.lisp:50-73) and the
    make-pdas initialization (:75-133) on the raw arrays, ELL operands for
    A and Aᵀ, and a pair-schedule tile engine (sparse.tiled
    engine_for_sparse) — no dense (m, n) operand is ever materialized.
    Pass the returned engine to pdas(..., engine=...) /
    pdas_dd(..., engine=...).

    ``engine``: reuse an engine built by a previous make_pdas_sparse call
    on an LP with the SAME constraint matrix A (the analyze-once contract,
    affine-scaling.lisp:271 cholmod_analyze recycling) — skips the
    symbolic analysis and pair-schedule build entirely.  Same A, not just
    same pattern: the engine's ELL assembly schedule bakes the pair
    weights A[p,k]·A[q,k] (tiled.build_ell_assembly ``asm_w``), so only
    b, c, l, u may vary across reuses — the scenario-sweep / batch flow
    (parallel.stack_sparse_states + batched_pdas(engine=...)) builds one
    engine and N states through it.  A mismatch is NOT detected here
    (same contract as pdas(..., engine=...)).
    """
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.ingest.device import SparseKKTLP
    from cholesky_is_magic_tpu.ingest.standard_form import scale_constraints
    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    if dtype is None:
        dtype = jnp.float32
    cfg = config or PDASConfig()
    m, n = sf.ncons, sf.nvars
    vals, b = scale_constraints(sf.a_rows, sf.a_vals, sf.b)
    if engine is None:
        A = sp.csc_matrix((vals, (sf.a_rows, sf.a_cols)), shape=(m, n))
        engine = engine_for_sparse(
            A, block=block, snode_align=snode_align, dtype=dtype
        )
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, vals, (m, n), dtype=dtype)
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, vals, (n, m), dtype=dtype)
    # Block-ELL renderings for the loop's A-products (ops.bell; byte-gated
    # with the ELL pair as fallback — the plain gather/scatter serializes
    # on TPU, docs/DEVNOTES.md r4).
    from cholesky_is_magic_tpu.ops import bell

    EB = bell.from_coo(sf.a_rows, sf.a_cols, vals, (m, n), dtype=dtype)
    ETB = bell.from_coo(sf.a_cols, sf.a_rows, vals, (n, m), dtype=dtype)

    # Clamp/widen + primal/dual init, identical to make_pdas (:75-133),
    # computed host-side in f64 before the dtype cast.
    big = 1e30
    raw_l = np.clip(np.asarray(sf.l, np.float64), -big, big)
    raw_u = np.clip(np.asarray(sf.u, np.float64), -big, big)
    l = np.clip(raw_l, -cfg.clamp, cfg.clamp)
    u = np.clip(raw_u, -cfg.clamp, cfg.clamp)
    degenerate = (u - l) < 1e-6
    l = np.where(degenerate, l - 5e-7, l)
    u = np.where(degenerate, u + 5e7, u)
    delta = raw_u - raw_l
    x = np.where(
        (raw_l < -1e10) & (raw_u > 1e10),
        0.0,
        np.where(
            raw_l < -1e6,
            raw_u - np.minimum(delta / 2, 1.0 + 0.1 * np.abs(raw_u)),
            np.where(
                raw_u > 1e6,
                raw_l + np.minimum(delta / 2, 1.0 + 0.1 * np.abs(raw_l)),
                (raw_l + raw_u) / 2,
            ),
        ),
    )
    c = np.asarray(sf.c, np.float64)
    z = np.where(c > 0, 1.0 + c, 1.0)
    w = np.where(c < 0, 1.0 - c, 1.0)

    lp = SparseKKTLP(
        E=E,
        ET=ET,
        EB=EB,
        ETB=ETB,
        c=jnp.asarray(c, dtype),
        b=jnp.asarray(b, dtype),
        l=jnp.asarray(l, dtype),
        u=jnp.asarray(u, dtype),
        row_mask=jnp.ones(m, bool),
        col_mask=jnp.ones(n, bool),
        m=m,
        n=n,
    )
    st = PDASState(
        x=jnp.asarray(x, dtype),
        y=jnp.zeros(m, dtype),
        w=jnp.asarray(w, dtype),
        z=jnp.asarray(z, dtype),
        lp=lp,
    )
    return st, engine


def _slack_floor(dtype) -> float:
    """Smallest slack the KKT scaling may see.  The reference *asserts*
    slacks positive (:323-324) and dies when rounding drives one to zero;
    flooring at ~eps^1.75 keeps the Newton system finite instead."""
    return 1e-14 if dtype == jnp.float64 else 1e-7


# Operand/backend dispatch shared with the other solver loops.
from cholesky_is_magic_tpu.solvers.backend import (  # noqa: E402
    mv_rmv as _mv_rmv,
    prepare_normal_backend as _prepare_normal_backend,
    row_boost as _row_boost,
)


def _violation(state: PDASState):
    """Slacks, complementarities, primal and dual residuals (:135-150),
    masked so padded entries are inert (sl = su = 1, rest 0)."""
    lp = state.lp
    mv, rmv = _mv_rmv(lp)
    mask = lp.col_mask
    floor = _slack_floor(state.x.dtype)
    sl = jnp.where(mask, jnp.maximum(state.x - lp.l, floor), 1.0)
    su = jnp.where(mask, jnp.maximum(lp.u - state.x, floor), 1.0)
    wu = jnp.where(mask, state.w * su, 0.0)
    zl = jnp.where(mask, state.z * sl, 0.0)
    primal = mv(state.x) - lp.b
    dual = jnp.where(mask, (rmv(state.y) + state.z) - (state.w + lp.c), 0.0)
    return sl, su, wu, zl, primal, dual


def _objectives(state: PDASState, clamp: float = 1e8):
    """pobj = c·x; dobj = b·y + l·z - u·w (:325-328).

    Bounds at the +/-clamp encoding of infinity contribute nothing: the
    true dual of an infinite bound has no such term (its multiplier must
    be 0; the KKT filter already treats those bounds as absent).  The
    reference includes them (with w, z held near 0 by filtering), which
    pins the duality gap whenever a recenter perturbation re-inflates a
    clamped bound's multiplier — this is the clear-step repair the
    reference wrote but left disabled (:209-221, :374), done properly.
    """
    lp = state.lp
    mask = lp.col_mask
    pobj = jnp.dot(state.x, lp.c)
    z_active = mask & (lp.l > -0.999 * clamp)
    w_active = mask & (lp.u < 0.999 * clamp)
    dobj = (
        jnp.dot(lp.b, state.y)
        + jnp.sum(jnp.where(z_active, lp.l * state.z, 0.0))
        - jnp.sum(jnp.where(w_active, lp.u * state.w, 0.0))
    )
    return pobj, dobj


def _box_step(sl, su, dx):
    """Largest t with slacks staying positive under x -= t*dx (:166-180).
    Ratios clamp at >= 0 (see affine._max_step for why)."""
    inf = jnp.asarray(np.inf, dtype=dx.dtype)
    lim = jnp.where(
        dx > 0, sl / dx, jnp.where(dx < 0, su / (-dx), inf)
    )
    return jnp.min(jnp.maximum(lim, 0.0))


def _pos_step(v, dv):
    """Largest t with v - t*dv >= 0 (:182-192)."""
    inf = jnp.asarray(np.inf, dtype=dv.dtype)
    lim = jnp.where(dv > 0, v / dv, inf)
    return jnp.min(jnp.maximum(lim, 0.0))


def pdas(
    state: PDASState,
    config: Optional[PDASConfig] = None,
    engine=None,
    mesh=None,
) -> SolveResult:
    """The driver (pdas, :385-396): iterate until relative duality gap
    < 1e-4, arming the recenter path whenever the step stalls below 1e-6.

    ``engine`` optionally supplies a sparse normal-equations backend (a
    sparse.tiled.TiledCholesky or sparse.factor.BlockSparseCholesky built
    from this LP's pattern) — the analyze-once object whose solve_normal
    replaces the dense MXU pipeline for every factorization in the loop.

    ``mesh`` optionally runs every normal-equations solve in the loop
    column-sharded over the mesh's 'tp' axis (parallel.sharded: partial
    Gram matrices per chip + one psum over ICI per factorization) — the
    tensor-parallel mode for wide LPs.  Shard the state's LP with
    parallel.shard_lp_columns first for multi-chip placement.
    """
    cfg = config or PDASConfig()
    return _pdas_jit(state, cfg, engine, mesh)


@highest_precision
@partial(jax.jit, static_argnames=("cfg", "engine", "mesh"))
def _pdas_jit(state: PDASState, cfg: PDASConfig, engine=None, mesh=None) -> SolveResult:
    lp = state.lp

    def one_iteration(st: PDASState, repair_flag):
        """one-pdas-iteration (:319-383). Returns (new_st, gap, pviol, step, ok).

        The reference dispatches repair / recenter / newton as separate
        code paths; here all three reduce to ONE scaled normal solve
        (A·diag(s))(A·diag(s))ᵀ y = rhs with a branch-selected (s, rhs) —
        repair: s = capped slack, rhs = b - Ax (one-repair-iteration :268);
        recenter: s = capped slack, rhs = A(s·sc) (primal-project :305);
        newton: s = sqrt(beta) from the KKT elimination, rhs = g - A·alpha
        (sparse-newton-solve.lisp:150).  The selected branch's numbers are
        identical to the dispatched version; the point is ONE factorization
        per iteration — under vmap every lax.cond branch executes, so
        per-branch solves tripled the batched cost (measured ~3x on
        batch-256)."""
        sl, su, wu, zl, primal, dual = _violation(st)
        pobj, dobj = _objectives(st, cfg.clamp)
        gap = jnp.abs(pobj - dobj) / jnp.maximum(
            jnp.maximum(jnp.abs(pobj), jnp.abs(dobj)), 1.0
        )
        pviol = jnp.max(jnp.abs(primal))
        repair_b = pviol >= cfg.primal_feasible_tol
        recenter_b = (~repair_b) & repair_flag
        newton_b = ~(repair_b | recenter_b)

        mask = lp.col_mask
        mv, rmv = _mv_rmv(lp)
        boost = _row_boost(lp)
        slack = _slack(lp.l, st.x, lp.u, cfg.repair_slack_cap, mask)
        red = kkt_reduce(sl, su, st.w, st.z, wu, zl, dual)
        c_dir = _centering_direction(lp.l, st.x, lp.u, mask)
        sc = -(slack * c_dir)

        s_sel = jnp.where(newton_b, red.s, slack)
        rhs_sel = jnp.where(
            repair_b,
            -primal,  # b - Ax (one-repair-iteration residual)
            jnp.where(recenter_b, mv(slack * sc), primal - mv(red.alpha)),
        )
        # Gap-gated Krylov escalation (see PDASConfig.krylov_gate_gap).
        gate = None
        if cfg.krylov_steps > 0 and cfg.krylov_gate_gap > 0.0:
            gate = gap < cfg.krylov_gate_gap
        solve_fn, ok = _prepare_normal_backend(
            lp, engine, s_sel, boost, cfg.refine_steps, mesh,
            cfg.dbound, cfg.krylov_steps, krylov_gate=gate,
            method=cfg.factor_method,
        )
        y = solve_fn(rhs_sel)
        ty = rmv(y)

        # --- newton branch updates (:367-379) ---
        d = kkt_backsub(red, sl, su, st.w, st.z, wu, zl, y, ty, ok)
        # Ratio tests on the TRUE slacks (not the KKT-scaling floored
        # ones): a floored slack would let x cross its bound.
        sl_t = jnp.where(mask, st.x - lp.l, 1.0)
        su_t = jnp.where(mask, lp.u - st.x, 1.0)
        gamma_n = cfg.gamma
        if cfg.mehrotra:
            # Mehrotra corrector on the SAME factorization (see
            # PDASConfig.mehrotra; the dd twin lives in pdas_dd.kkt_dd).
            # Valid only for the newton branch — the repair/recenter
            # branches' y is a different system, but their results select
            # this block out.  Present-bound sets mask padded columns:
            # their sanitized (slack = dual = 1) entries would pin
            # mu_aff — hence sigma — at O(1).
            from cholesky_is_magic_tpu.kkt.newton import FILTER_THRESHOLD

            pu = (su <= FILTER_THRESHOLD) & mask
            pl = (sl <= FILTER_THRESHOLD) & mask
            t_aff = jnp.minimum(
                jnp.minimum(
                    _box_step(sl_t, su_t, d.dx),
                    jnp.minimum(_pos_step(st.w, d.dw), _pos_step(st.z, d.dz)),
                ),
                1.0,
            )
            cnt = jnp.maximum(jnp.sum(pu) + jnp.sum(pl), 1).astype(sl.dtype)
            mu = (
                jnp.sum(jnp.where(pu, wu, 0.0))
                + jnp.sum(jnp.where(pl, zl, 0.0))
            ) / cnt
            wn = st.w - t_aff * d.dw
            sun = su + t_aff * d.dx
            zn = st.z - t_aff * d.dz
            sln = sl - t_aff * d.dx
            mu_aff = jnp.maximum(
                (
                    jnp.sum(jnp.where(pu, wn * sun, 0.0))
                    + jnp.sum(jnp.where(pl, zn * sln, 0.0))
                ) / cnt,
                0.0,
            )
            tiny = jnp.asarray(np.finfo(np.dtype(sl.dtype)).tiny, sl.dtype)
            sigma = jnp.clip((mu_aff / jnp.maximum(mu, tiny)) ** 3, 0.0, 1.0)
            target = sigma * mu
            de = jnp.where(pu, -d.dw * d.dx - target, 0.0)
            df = jnp.where(pl, d.dz * d.dx - target, 0.0)
            red2 = kkt_reduce(sl, su, st.w, st.z, wu + de, zl + df, dual)
            y2 = solve_fn(primal - mv(red2.alpha))
            d2 = kkt_backsub(
                red2, sl, su, st.w, st.z, wu + de, zl + df, y2, rmv(y2), ok
            )
            if cfg.gondzio_correctors > 0:
                # Gondzio centrality correctors on the same factor (see
                # PDASConfig.gondzio_correctors).  Vectorized accept: the
                # rejected candidate's work still executes (branchless
                # under jit), which is the right trade exactly where this
                # knob is meant to run — factorization-dominated
                # iterations.
                def g_step(dd_):
                    return jnp.minimum(
                        jnp.minimum(
                            _box_step(sl_t, su_t, dd_.dx),
                            jnp.minimum(_pos_step(st.w, dd_.dw),
                                        _pos_step(st.z, dd_.dz)),
                        ),
                        1.0,
                    )

                def mu_pred(dd_, t_):
                    # Duality measure at the DAMPED step this direction
                    # would actually take — the acceptance must check
                    # progress, not just step length: a degenerate
                    # corrector with a near-zero direction earns step 1
                    # while going nowhere (measured: accepting on step
                    # alone turns a 12-iteration solve into 51).
                    ts = cfg.mehrotra_gamma * t_
                    return (
                        jnp.sum(jnp.where(
                            pu, (st.w - ts * dd_.dw) * (su + ts * dd_.dx),
                            0.0))
                        + jnp.sum(jnp.where(
                            pl, (st.z - ts * dd_.dz) * (sl - ts * dd_.dx),
                            0.0))
                    ) / cnt

                t_cur = g_step(d2)
                mu_cur = mu_pred(d2, t_cur)
                de_acc, df_acc = de, df
                active = ok & (gap > cfg.gondzio_gate_gap)
                lo_t = cfg.gondzio_beta_min * target
                hi_t = cfg.gondzio_beta_max * target
                for _ in range(cfg.gondzio_correctors):
                    t_t = jnp.minimum(t_cur + cfg.gondzio_delta, 1.0)
                    vu = (st.w - t_t * d2.dw) * (su + t_t * d2.dx)
                    vl = (st.z - t_t * d2.dz) * (sl - t_t * d2.dx)
                    dtu = jnp.where(pu, jnp.clip(vu, lo_t, hi_t) - vu, 0.0)
                    dtl = jnp.where(pl, jnp.clip(vl, lo_t, hi_t) - vl, 0.0)
                    de_t = de_acc - dtu
                    df_t = df_acc - dtl
                    red3 = kkt_reduce(sl, su, st.w, st.z, wu + de_t,
                                      zl + df_t, dual)
                    y3 = solve_fn(primal - mv(red3.alpha))
                    d3 = kkt_backsub(red3, sl, su, st.w, st.z, wu + de_t,
                                     zl + df_t, y3, rmv(y3), ok)
                    t_new = g_step(d3)
                    mu_new = mu_pred(d3, t_new)
                    acc = active & (
                        t_new >= t_cur
                        + cfg.gondzio_gamma * cfg.gondzio_delta
                    ) & (mu_new <= mu_cur)
                    d2 = jax.tree.map(
                        lambda a, b: jnp.where(acc, b, a), d2, d3
                    )
                    de_acc = jnp.where(acc, de_t, de_acc)
                    df_acc = jnp.where(acc, df_t, df_acc)
                    t_cur = jnp.where(acc, t_new, t_cur)
                    mu_cur = jnp.where(acc, mu_new, mu_cur)
                    active = acc
            d = jax.tree.map(
                lambda a, c: jnp.where(newton_b, c, a), d, d2
            )
            gamma_n = cfg.mehrotra_gamma
        step_n = jnp.minimum(
            _box_step(sl_t, su_t, d.dx),
            jnp.minimum(_pos_step(st.w, d.dw), _pos_step(st.z, d.dz)),
        )
        t = jnp.minimum(1.0, gamma_n * step_n)
        x_n = _into_interior(st.x - t * d.dx, lp.l, lp.u, mask)
        w_n, y_n, z_n = st.w - t * d.dw, st.y - t * d.dy, st.z - t * d.dz

        # --- repair branch updates (one-repair-iteration :268-288) ---
        g_r = jnp.where(mask, slack * ty, 0.0) * slack
        step_r = cfg.gamma * jnp.minimum(
            _max_step(lp.l, st.x, lp.u, g_r, mask), 1.0 / cfg.gamma
        )
        floor = jnp.minimum(lp.l + cfg.repair_floor, lp.u)
        x_r = jnp.where(mask, jnp.maximum(st.x + step_r * g_r, floor), st.x)
        x_r = jnp.where(ok, _into_interior(x_r, lp.l, lp.u, mask), st.x)

        # --- recenter branch updates (:348-366) ---
        dx_rc = jnp.where(mask, sc - slack * ty, 0.0) * slack
        step_c = 0.5 * _max_step(lp.l, st.x, lp.u, dx_rc, mask)
        x_c = jnp.where(
            ok, _into_interior(st.x + step_c * dx_rc, lp.l, lp.u, mask), st.x
        )
        maskf = mask.astype(st.w.dtype)
        w_c, z_c = st.w + 1e-4 * maskf, st.z + 1e-4 * maskf

        inf = jnp.asarray(np.inf, dtype=st.x.dtype)
        new = dataclasses.replace(
            st,
            x=jnp.where(newton_b, x_n, jnp.where(repair_b, x_r, x_c)),
            w=jnp.where(newton_b, w_n, jnp.where(recenter_b, w_c, st.w)),
            y=jnp.where(newton_b, y_n, st.y),
            z=jnp.where(newton_b, z_n, jnp.where(recenter_b, z_c, st.z)),
        )
        return new, gap, pviol, jnp.where(newton_b, step_n, inf), ok

    def body(carry):
        (st, i, repair_flag, prev_gap, _prev_pviol, bad_count, _status, trace,
         best_gap, best_st, since_best) = carry
        new_st, gap, pviol, step, ok = one_iteration(st, repair_flag)
        if cfg.record_trace or cfg.record_iterates:
            pobj_i = jnp.dot(st.x, lp.c)
            vals = (gap, pobj_i, step)
            if cfg.record_iterates:
                vals = vals + (st.x,)
            trace = jax.tree.map(lambda a, v: a.at[i].set(v), trace, vals)
        # Best-iterate tracking: the gap of state `st` (pre-step) is `gap`.
        # Gated on primal feasibility — the duality gap of an infeasible
        # iterate is meaningless (pobj is not attained), so an early
        # infeasible iterate must never beat a feasible one.  Only the
        # iterate fields (x, y, w, z) are carried: selecting over the whole
        # PDASState re-materializes lp.A (m*n) every iteration, which at
        # batched (256, 64, 128) sizes is pure HBM traffic for operands
        # that never change.
        improved = (gap < best_gap) & (pviol < cfg.primal_feasible_tol)
        best_st = jax.tree.map(
            lambda b, c: jnp.where(improved, c, b),
            best_st,
            (st.x, st.y, st.w, st.z),
        )
        best_gap = jnp.where(improved, gap, best_gap)
        since_best = jnp.where(improved, 0, since_best + 1)
        stalled = jnp.isfinite(step) & (step < cfg.stall_step)  # :393
        # Divergence detector (TPU-build safeguard beyond the reference):
        # pure affine primal-dual steps can oscillate with growing gap at
        # degenerate vertices without ever stalling; after 4 consecutive
        # gap increases, arm the same recenter + dual-perturbation path the
        # reference uses for stalls.
        grew = jnp.isfinite(step) & (gap > prev_gap)
        bad_count = jnp.where(grew, bad_count + 1, 0)
        new_repair = stalled | (bad_count >= 4)
        bad_count = jnp.where(new_repair, 0, bad_count)
        status = jnp.where(ok, Status.RUNNING, Status.SINGULAR).astype(jnp.int32)
        return (new_st, i + 1, new_repair, gap, pviol, bad_count, status, trace,
                best_gap, best_st, since_best)

    def bounced(gap, best_gap):
        # Bounce exit (PDASConfig.bounce_exit_ratio; see pdas_dd.py for
        # the measured endgame-oscillation rationale).
        if cfg.bounce_exit_ratio <= 0.0:
            return jnp.asarray(False)
        return (best_gap < cfg.bounce_exit_floor) & (
            gap > cfg.bounce_exit_ratio * best_gap
        )

    def cond(carry):
        (_st, i, _rflag, gap, pviol, _badc, status, _trace, _bg, _bst,
         since_best) = carry
        # The duality-gap stop only counts at a primal-feasible iterate:
        # an infeasible point's gap is meaningless (its pobj is not
        # attained), and exiting on it returned "optimal" with residual 25
        # on the sparse afiro cold start.
        converged = (gap < cfg.gap_tol) & (pviol < cfg.primal_feasible_tol)
        return (
            ~converged
            & (status == Status.RUNNING)
            & (i < cfg.max_iters)
            & (since_best < cfg.stall_exit_iters)
            & ~bounced(gap, _bg)
        )

    init_gap = jnp.asarray(np.inf, dtype=state.x.dtype)
    dt = state.x.dtype
    trace0 = (
        (jnp.full(cfg.max_iters, np.nan, dt),) * 3
        if (cfg.record_trace or cfg.record_iterates)
        else (jnp.zeros(0, dt),) * 3
    )
    if cfg.record_iterates:
        trace0 = trace0 + (jnp.full((cfg.max_iters, state.x.shape[0]), np.nan, dt),)
    (st, iters, _rflag2, gap, _pviol2, _badc2, status, trace, best_gap,
     best_st, since_best) = jax.lax.while_loop(
        cond,
        body,
        (state, jnp.asarray(0, jnp.int32), jnp.asarray(False), init_gap,
         init_gap, jnp.asarray(0, jnp.int32),
         jnp.asarray(Status.RUNNING, jnp.int32),
         trace0, init_gap, (state.x, state.y, state.w, state.z),
         jnp.asarray(0, jnp.int32)),
    )
    # Return the best-seen iterate: continuing past the working-precision
    # floor makes the LAST iterate worse than the best one.
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
    pobj, dobj = _objectives(st, cfg.clamp)
    mv_f, _ = _mv_rmv(lp)
    primal_final = mv_f(st.x) - lp.b
    resid = jnp.linalg.norm(primal_final)
    feasible = jnp.max(jnp.abs(primal_final)) < cfg.primal_feasible_tol
    final_status = jnp.where(
        status != Status.RUNNING,
        status,
        jnp.where(
            (gap < cfg.gap_tol) & feasible,
            Status.OPTIMAL,
            jnp.where(
                (since_best >= cfg.stall_exit_iters) | exit_bounced,
                Status.PRECISION_FLOOR,
                Status.MAX_ITERS,
            ),
        ),
    ).astype(jnp.int32)
    return SolveResult(
        x=st.x,
        objective=pobj,
        status=final_status,
        iterations=iters,
        residual_norm=resid,
        extra={
            "gap": gap, "dual_objective": dobj, "y": st.y, "w": st.w, "z": st.z,
            "trace": {
                "gap": trace[0], "objective": trace[1], "step": trace[2],
                **({"x": trace[3]} if cfg.record_iterates else {}),
            },
        },
    )
