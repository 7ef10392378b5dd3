"""Krylov-accelerated iterative refinement for ill-conditioned normal solves.

The plain double-word refinement in ops.dense / sparse.tiled is Richardson
iteration with the f32 Cholesky factor as the solver: its error contracts by
~ kappa(N) * eps_f32 per step, so it STOPS CONVERGING once
kappa(N) >~ 1/eps_f32 ~ 1.7e7.  Interior-point normal matrices cross that
line routinely: kappa grows like 1/gap^2 near optimality (SURVEY.md §7
"Precision"; the reference sails through because CHOLMOD is fp64, where the
same wall sits at kappa ~ 1e16).

This module is the TPU answer for the regime beyond the wall: flexible
preconditioned conjugate gradients on N x = b with

- the f32 factor as the preconditioner M = L·Lᵀ (one prepared factorization,
  recycled across iterations — the solve-sparse-recycle discipline,
  sparse-cholesky.lisp:524-560);
- the residual b - N·x recomputed EXPLICITLY in double-word arithmetic every
  iteration against the UNASSEMBLED operator (ops.dd) — no f32 residual
  recurrence to drift;
- the iterate x accumulated in double-word, so eps_f32-sized corrections are
  not rounded away.

Convergence now follows kappa(M⁻¹N) ~ 1 + kappa(N)·eps_f32 instead of
kappa(N): at kappa = 1e9 the preconditioned system has kappa ~ 60 and PCG
converges in tens of iterations where Richardson refinement diverges.  This
is the same mechanism as GMRES-based iterative refinement (Carson & Higham,
"Accelerating the solution of linear systems by iterative refinement in
three precisions", SIAM J. Sci. Comput. 2018), specialized to SPD systems
with CG and an explicit extra-precise residual.

Guards: a non-positive curvature p·Np <= 0 (the f32 preconditioner can make
M⁻¹N slightly indefinite at extreme kappa) zeroes that step instead of
poisoning the iterate; best-residual tracking returns the best iterate seen,
so a late CG breakdown cannot hand back something worse than plain
refinement.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from cholesky_is_magic_tpu.ops import dd as ddm
from cholesky_is_magic_tpu.ops.dd import DD


def gated(pcg_fn, cheap_fn, gate):
    """Per-call choice between the PCG path and the cheap Richardson path
    on a TRACED boolean ``gate`` (True -> PCG), sharing one factorization.

    The escalation seam for solver loops: early IPM iterations have
    kappa(N) far below the Richardson wall, so paying ``krylov_steps``
    N-applies per solve there is pure waste (measured: the PCG-8 dd
    finisher at m=16384 spends ~95% of its wall-clock on refinement its
    first ~10 iterations do not need).  ``gate`` is typically
    gap < PDASConfig.krylov_gate_gap, re-evaluated every iteration inside
    the jitted while_loop; both branches compile once.  ``gate=None``
    returns the PCG path unconditionally (the ungated r2 behavior)."""
    if gate is None:
        return pcg_fn

    def solve_fn(g):
        return jax.lax.cond(gate, pcg_fn, cheap_fn, g)

    return solve_fn


def pcg_refine(
    precond: Callable[[jax.Array], jax.Array],
    apply_n: Callable[[jax.Array], jax.Array],
    residual_dd: Callable[[DD], jax.Array],
    b: jax.Array,
    iters: int,
    x0: jax.Array | None = None,
) -> DD:
    """Flexible PCG with explicit double-word residuals; returns x as DD.

    precond      f32 r -> f32 z: apply M⁻¹ (the recycled f32 Cholesky).
    apply_n      f32 p -> f32 q: apply N in working precision (MXU / SpMV).
    residual_dd  DD x -> f32 r: b - N·x evaluated in double-word, rounded
                 to working precision (the values are small, so f32 holds
                 them to full relative precision).
    b            right-hand side; also the initial-guess source when ``x0``
                 is None (x0 = M⁻¹ b, i.e. the plain direct solve).
    iters        fixed CG iteration count (jit-static; the loop is a
                 lax.fori_loop so compile cost is O(1) in ``iters``).
    """
    x_hi = precond(b) if x0 is None else x0
    x = ddm.dd_from(x_hi)
    r = residual_dd(x)
    z = precond(r)
    p = z
    rz = jnp.dot(r, z)
    rnorm = jnp.dot(r, r)

    def body(_, carry):
        x, p, rz, best_x, best_rnorm = carry
        q = apply_n(p)
        pq = jnp.dot(p, q)
        # Non-positive curvature: the f32 preconditioner has pushed M⁻¹N
        # indefinite along p — freeze this step (alpha = 0) rather than
        # stepping uphill; the next explicit residual re-syncs the search.
        alpha = jnp.where(pq > 0.0, rz / jnp.where(pq > 0.0, pq, 1.0), 0.0)
        x = ddm.dd_add(x, ddm.two_prod(p, alpha))
        r = residual_dd(x)
        z = precond(r)
        rz_new = jnp.dot(r, z)
        beta = jnp.where(rz > 0.0, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        p = z + beta * p
        rnorm = jnp.dot(r, r)
        better = rnorm < best_rnorm
        best_x = ddm.dd_where(better, x, best_x)
        best_rnorm = jnp.where(better, rnorm, best_rnorm)
        return x, p, rz_new, best_x, best_rnorm

    x, _p, _rz, best_x, _bn = jax.lax.fori_loop(
        0, iters, body, (x, p, rz, x, rnorm)
    )
    return best_x


def dense_normal_apply(AD: jax.Array, row_boost=None):
    """p -> (AD)(AD)ᵀ p + row_boost∘p in working precision (two MXU
    matvecs — applying the UNASSEMBLED operator keeps the Krylov matvec
    consistent with the double-word residual's operator)."""

    def apply_n(p):
        q = AD @ (AD.T @ p)
        if row_boost is not None:
            q = q + row_boost * p
        return q

    return apply_n


def dense_residual_dd(AD: jax.Array, g: jax.Array, row_boost=None):
    """DD x -> g - (AD)(AD)ᵀx (- row_boost∘x) with the matvecs in
    double-word: the dd-iterate extension of ops.dense.operator_residual."""

    def residual(x: DD) -> jax.Array:
        t = ddm.dd_rmatvec_dd(AD, x)  # ADᵀ x, dd
        u = ddm.dd_add(ddm.dd_matvec(AD, t.hi), ddm.dd_matvec(AD, t.lo))
        if row_boost is not None:
            u = ddm.dd_add(u, ddm.two_prod(row_boost, x.hi))
            u = ddm.dd_add_w(u, row_boost * x.lo)
        return ddm.dd_add_w(ddm.dd_neg(u), g).to_working()

    return residual


def ell_normal_apply(E, ET, d, row_boost=None):
    """The fully sparse N-apply: p -> E(d²∘(ETp)) + boost∘p via two ELL
    SpMVs (ops.sparse_ops — the cholmod_sdmult analogue)."""
    from cholesky_is_magic_tpu.ops import sparse_ops

    d2 = d * d

    def apply_n(p):
        t = sparse_ops.matvec(ET, p)
        q = sparse_ops.matvec(E, d2 * t)
        if row_boost is not None:
            q = q + row_boost * p
        return q

    return apply_n


def ell_residual_dd(E, ET, d, g, row_boost=None):
    """DD x -> g - A·diag(d²)·Aᵀx (- boost∘x) from sparse operands with
    the products in double-word (the prepare_normal_ell refinement
    residual, extended to a dd iterate)."""
    from cholesky_is_magic_tpu.ops import sparse_ops

    d2 = ddm.two_prod(d, d)

    def residual(x: DD) -> jax.Array:
        t = sparse_ops.dd_matvec_dd(ET, x)  # Aᵀ x, dd
        u = ddm.dd_mul(d2, t)
        v = sparse_ops.dd_matvec_dd(E, u)
        if row_boost is not None:
            v = ddm.dd_add(v, ddm.two_prod(row_boost, x.hi))
            v = ddm.dd_add_w(v, row_boost * x.lo)
        return ddm.dd_add_w(ddm.dd_neg(v), g).to_working()

    return residual
