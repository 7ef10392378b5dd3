r"""Primal-dual KKT Newton direction by block Gaussian elimination.

The system (derivation in the reference's literate comments,
newton-solve.lisp:1-26 / sparse-newton-solve.lisp:1-26):

    KKT:            Newton block matrix (rows scaled so diagonals are U, Z):
    Z S e = 0        Δw      Δx      Δy      Δz
    W T e = 0         U      -W                     = e      (e = w∘su)
    A x   = b                 Z               L     = f      (f = z∘sl)
    yA + z - w = c            A                     = g      (g = Ax - b)
                     -I              Aᵗ       I     = h      (h = Aᵗy+z-w-c)

where U = diag(su) (slack to upper bound, su = u - x), L = diag(sl)
(sl = x - l), W = diag(w), Z = diag(z).  Eliminating Δw, Δx, Δz reduces to

    (A·diag(s))·(A·diag(s))ᵀ Δy = g'        s = sqrt(sl/z · d),

one SPD normal-equations solve — "cholesky is magic".  Back-substitution
recovers Δz, Δx, Δw.  This mirrors sparse-newton-solve.lisp:150-168 exactly,
including the robustness filters for near-unbounded variables
(filter-U/filter-Z, :30-45: a slack above 1e7 means that bound is
effectively absent; the row degenerates to Δw = e or Δz = f).

Everything is elementwise except two SpMVs and the normal solve, all
provided by a :class:`KKTOperator` — the dense backend uses MXU matmuls;
a block-sparse backend plugs in the same interface.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cholesky_is_magic_tpu.ops import dense as dense_ops

# Slack threshold above which a bound is treated as absent
# (sparse-newton-solve.lisp:34,43).
FILTER_THRESHOLD = 1e7


class KKTOperator(NamedTuple):
    """The products the elimination needs.

    mv:  v -> A v          (cholmod_sdmult analogue)
    rmv: v -> Aᵀ v
    solve_scaled_normal: (s, g) -> (y, ok) solving (A diag s)(A diag s)ᵀ y = g
        (the analogue of copy A; scale-sparse! by s; solve-sparse —
        sparse-newton-solve.lisp:121-126)
    prepare_scaled_normal: s -> (solve_fn, ok) — factor once, solve many
        (the solve-sparse-recycle split, sparse-cholesky.lisp:524-560);
        used by the dd KKT path, which refines against the exact
        double-word operator and needs a second solve on the same factor.
    """

    mv: Callable[[jax.Array], jax.Array]
    rmv: Callable[[jax.Array], jax.Array]
    solve_scaled_normal: Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]]
    prepare_scaled_normal: Optional[Callable] = None


def dense_kkt_operator(
    A: jax.Array,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 1,
    true_residual: bool = False,
    dbound: float = 0.0,
    krylov_steps: int = 0,
    krylov_gate=None,
) -> KKTOperator:
    """Dense MXU-backed operator (newton-solve.lisp's backend, minus the
    explicit diag matrix it builds at :112-116 — XLA fuses the column scale
    into the matmul).  ``dbound`` arms the singular-retry diagonal floor
    (ops.dense.prepare_normal; CHOLMOD's dbound knob, wrapper.c).
    ``krylov_gate``: traced per-iteration PCG/Richardson choice on the
    shared factor (ops.krylov.gated; requires krylov_steps > 0)."""

    def solve_scaled_normal(s, g):
        return dense_ops.solve_normal(
            A, s, g, row_boost=row_boost, refine_steps=refine_steps,
            true_residual=true_residual, dbound=dbound,
            krylov_steps=krylov_steps, krylov_gate=krylov_gate,
        )

    def prepare_scaled_normal(s):
        return dense_ops.prepare_normal(
            A, s, row_boost=row_boost, refine_steps=refine_steps,
            true_residual=true_residual, dbound=dbound,
            krylov_steps=krylov_steps, krylov_gate=krylov_gate,
        )

    return KKTOperator(
        mv=lambda v: A @ v,
        rmv=lambda v: A.T @ v,
        solve_scaled_normal=solve_scaled_normal,
        prepare_scaled_normal=prepare_scaled_normal,
    )


def sparse_kkt_operator(
    A: jax.Array,
    engine,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 0,
    dbound: float = 0.0,
    krylov_steps: int = 0,
    krylov_gate=None,
) -> KKTOperator:
    """Operator backed by a sparse.BlockSparseCholesky / TiledCholesky
    engine — the sparse-newton-solve.lisp backend: same elimination, the
    normal solve runs the planned block-sparse factorization instead of
    the dense one.

    ``engine`` is built from this A's pattern (the analyze-once step);
    matvecs stay dense-MXU (A is padded-dense here — an ELL variant plugs
    in the same way for very sparse A).  ``refine_steps`` > 0 turns on the
    engines' double-word refinement against the unassembled operator, so
    the sparse path matches the dense path's accuracy (the reference's
    sparse path is fp64 CHOLMOD, sparse-cholesky.lisp:524-560).
    """

    def solve_scaled_normal(s, g):
        solve_fn, ok = prepare_scaled_normal(s)
        return solve_fn(g), ok

    def prepare_scaled_normal(s):
        kw = {"krylov_steps": krylov_steps} if krylov_steps else {}
        if krylov_steps and krylov_gate is not None:
            kw["krylov_gate"] = krylov_gate
        return engine.prepare_normal(
            A, s, row_boost=row_boost, refine_steps=refine_steps,
            dbound=dbound, **kw,
        )

    return KKTOperator(
        mv=lambda v: A @ v,
        rmv=lambda v: A.T @ v,
        solve_scaled_normal=solve_scaled_normal,
        prepare_scaled_normal=prepare_scaled_normal,
    )


def ell_kkt_operator(
    lp,
    engine,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 0,
    dbound: float = 0.0,
    krylov_steps: int = 0,
    mesh=None,
    krylov_gate=None,
) -> KKTOperator:
    """Fully sparse operator: ELL SpMVs (ops.sparse_ops — the
    cholmod_sdmult analogue) + the tile engine's pair-schedule assembly
    and factorization (engine_for_sparse).  No dense A operand anywhere —
    the at-scale backend (``lp`` is an ingest.device.SparseKKTLP).

    ``mesh`` shards every factorization's assembly slabs + SYRK waves over
    the 'tp' axis (sparse.tiled._assemble_factor_tp) — the multi-chip
    composition of the at-scale path."""
    from cholesky_is_magic_tpu.ops import sparse_ops

    def prepare_scaled_normal(s):
        return engine.prepare_normal_ell(
            lp.E, lp.ET, s, lp.m, row_boost=row_boost,
            refine_steps=refine_steps, dbound=dbound,
            krylov_steps=krylov_steps, mesh=mesh,
            krylov_gate=krylov_gate,
            EB=getattr(lp, "EB", None), ETB=getattr(lp, "ETB", None),
        )

    def solve_scaled_normal(s, g):
        solve_fn, ok = prepare_scaled_normal(s)
        return solve_fn(g), ok

    from cholesky_is_magic_tpu.ops import bell

    # Block-ELL products when the operand set carries them (ops.bell —
    # the per-nonzero ELL forms serialize on TPU; docs/DEVNOTES.md r4).
    mv = ((lambda v: bell.matvec(lp.EB, v))
          if getattr(lp, "EB", None) is not None
          else (lambda v: sparse_ops.matvec(lp.E, v)))
    rmv = ((lambda v: bell.matvec(lp.ETB, v))
           if getattr(lp, "ETB", None) is not None
           else (lambda v: sparse_ops.matvec(lp.ET, v)))
    return KKTOperator(
        mv=mv,
        rmv=rmv,
        solve_scaled_normal=solve_scaled_normal,
        prepare_scaled_normal=prepare_scaled_normal,
    )


class KKTDeltas(NamedTuple):
    dw: jax.Array
    dx: jax.Array
    dy: jax.Array
    dz: jax.Array
    ok: jax.Array  # False if the normal-equations factorization failed


class KKTReduction(NamedTuple):
    """Intermediates of the block elimination: everything needed to turn
    the normal-equations solution dy back into (dw, dx, dz).  Split out so
    callers can run the factorization themselves (e.g. solvers.pdas shares
    ONE factorization across its repair/recenter/newton branches — under
    vmap every lax.cond branch executes, so per-branch solves would triple
    the batched cost)."""

    s: jax.Array  # sqrt(beta): the normal-equations column scaling
    alpha: jax.Array
    beta: jax.Array
    use_u: jax.Array
    use_l: jax.Array


def kkt_reduce(
    sl: jax.Array,
    su: jax.Array,
    w: jax.Array,
    z: jax.Array,
    e: jax.Array,
    f: jax.Array,
    h: jax.Array,
) -> KKTReduction:
    """Elimination of (dw, dx, dz): reduces the KKT system to
    (A·diag(s))(A·diag(s))ᵀ dy = g - A·alpha with s = sqrt(beta).

    The reference scales rows by 1/U then 1/Z (scale-U/scale-Z, :47-53),
    which divides by the *duals* — its filter-Z path (:40-45) zeroes z and
    then divides by it, a latent division-by-zero that never fired in the
    reference's runs.  The TPU build eliminates per-variable in closed
    form instead, with every division by a slack (> 0 by construction):

      row (1): su·dw - w·dx = e       row (2): z·dx + sl·dz = f
      row (4): -dw + (Aᵀdy)_i + dz = h
      => dx = (t - h - e/su + f/sl) · beta,  beta = su·sl/(w·sl + z·su)
      => (A·diag(beta)·Aᵀ) dy = g - A·alpha,  alpha = (-h - e/su + f/sl)·beta
      => dw = (e + w·dx)/su,  dz = (f - z·dx)/sl.

    The filters (:30-45, huge slack => bound absent) are the exact
    su -> inf / sl -> inf limits of these formulas with e = w·su, f = z·sl;
    for general rhs they are applied as where-branches: the filtered row
    degenerates to dw = w (resp. dz = z) and drops out of the coupling.
    """
    pu = su <= FILTER_THRESHOLD  # upper bound present
    pl = sl <= FILTER_THRESHOLD  # lower bound present
    both_absent = ~pu & ~pl  # fall back to the unfiltered (finite) formulas
    use_u = pu | both_absent
    use_l = pl | both_absent

    a = jnp.where(use_u, w / su, 0.0)
    term_w = jnp.where(use_u, e / su, w)
    b = jnp.where(use_l, z / sl, 0.0)
    term_z = jnp.where(use_l, f / sl, z)

    beta = 1.0 / jnp.maximum(a + b, 1e-30)  # a+b > 0 whenever w, z > 0
    alpha = (-h - term_w + term_z) * beta
    return KKTReduction(
        s=jnp.sqrt(beta), alpha=alpha, beta=beta, use_u=use_u, use_l=use_l
    )


def kkt_backsub(
    red: KKTReduction,
    sl: jax.Array,
    su: jax.Array,
    w: jax.Array,
    z: jax.Array,
    e: jax.Array,
    f: jax.Array,
    dy: jax.Array,
    t: jax.Array,
    ok,
) -> KKTDeltas:
    """Back-substitution (:137-148): recover (dw, dx, dz) from dy and
    t = Aᵀ dy."""
    dx = red.alpha + red.beta * t
    dw = jnp.where(red.use_u, (e + w * dx) / su, w)
    dz = jnp.where(red.use_l, (f - z * dx) / sl, z)
    return KKTDeltas(dw=dw, dx=dx, dy=dy, dz=dz, ok=ok)


def solve_kkt_newton(
    sl: jax.Array,
    su: jax.Array,
    w: jax.Array,
    z: jax.Array,
    op: KKTOperator,
    e: jax.Array,
    f: jax.Array,
    g: jax.Array,
    h: jax.Array,
) -> KKTDeltas:
    """The elimination chain of sparse-newton-solve.lisp:150-168
    (kkt_reduce -> one scaled normal solve -> kkt_backsub).

    Args are the *slacks* sl = x - l, su = u - x (both > 0), the bound duals
    w, z (> 0), and the four RHS blocks.  Padded-variable entries must be
    sanitized by the caller to sl = su = w = z = 1 and e = f = h = 0 (then
    every delta is exactly 0 there); padded rows need g = 0.
    """
    red = kkt_reduce(sl, su, w, z, e, f, h)
    rhs = g - op.mv(red.alpha)
    dy, ok = op.solve_scaled_normal(red.s, rhs)
    t = op.rmv(dy)
    return kkt_backsub(red, sl, su, w, z, e, f, dy, t, ok)


def kkt_residuals(
    sl: jax.Array,
    su: jax.Array,
    w: jax.Array,
    z: jax.Array,
    op: KKTOperator,
    e: jax.Array,
    f: jax.Array,
    g: jax.Array,
    h: jax.Array,
    deltas: KKTDeltas,
) -> jax.Array:
    """Inf-norms of the four KKT block residuals (test-kkt-solve,
    sparse-newton-solve.lisp:180-198).  The runtime-checked production mode
    (solve-kkt-newton-check, :200-223) asserts these below 1e-4."""
    dw, dx, dy, dz = deltas.dw, deltas.dx, deltas.dy, deltas.dz
    r1 = su * dw - w * dx - e
    r2 = z * dx + sl * dz - f
    r3 = op.mv(dx) - g
    r4 = (op.rmv(dy) + dz) - dw - h
    inf = lambda v: jnp.max(jnp.abs(v))
    return jnp.stack([inf(r1), inf(r2), inf(r3), inf(r4)])


def solve_kkt_newton_checked(sl, su, w, z, op, e, f, g, h, tol: float = 1e-4):
    """Checked drop-in (solve-kkt-newton-check): returns (deltas, residuals)
    and flips ``deltas.ok`` to False if any block residual exceeds ``tol``
    — the jit-compatible rendering of the reference's asserts."""
    deltas = solve_kkt_newton(sl, su, w, z, op, e, f, g, h)
    res = kkt_residuals(sl, su, w, z, op, e, f, g, h, deltas)
    ok = deltas.ok & jnp.all(res < tol)
    return deltas._replace(ok=ok), res
