"""Dense normal-equations Cholesky: factor, solve, refine, detect failure.

This is the TPU analogue of the reference's CHOLMOD pipeline specialized to
the dense path (solve-dense, sparse-cholesky.lisp:409-431; the recycled
factor+solve of solve-sparse-recycle, :524-560):

- :func:`normal_matrix` assembles N = (A·diag(d))·(A·diag(d))ᵀ on the MXU —
  the analogue of cholmod_scale + cholmod_aat (sparse-cholesky.lisp:329,121).
- :func:`factorize` computes L·Lᵀ = N and reports failure the way
  cholmod_factorize's status does (sparse-cholesky.lisp:543-545): a
  non-PD/singular N yields ``ok=False`` instead of NaNs silently flowing on.
- :func:`solve_spd` adds double-word iterative refinement so an f32 MXU
  factorization reaches fp64-CHOLMOD-class solve accuracy (SURVEY.md §7).

Everything is jit-safe, shape-static, and mask-aware: padded (inert) rows
are given a unit diagonal via ``row_boost`` so padding never makes N
singular (see ingest.device).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cholesky_is_magic_tpu.ops import dd as ddm
from cholesky_is_magic_tpu.utils.precision import highest_precision


class CholFactors(NamedTuple):
    L: jax.Array  # lower-triangular factor (garbage if ok=False)
    ok: jax.Array  # scalar bool: factorization succeeded


def normal_matrix(
    A: jax.Array,
    d: jax.Array,
    row_boost: Optional[jax.Array] = None,
) -> jax.Array:
    """N = A·diag(d)²·Aᵀ (+ diag(row_boost)), the IPM normal matrix.

    ``d`` is the *scale* (slack) vector, applied to columns of A exactly as
    scale-sparse! right-multiplies by diag (sparse-cholesky.lisp:461-477);
    the product is then N = (AD)(AD)ᵀ as in project (affine-scaling.lisp:98).
    ``row_boost`` adds to the diagonal — used to keep padded rows
    nonsingular (1.0 on padded rows, 0 elsewhere).
    """
    AD = A * d[None, :]
    N = jnp.matmul(AD, AD.T, preferred_element_type=AD.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    # Symmetrize: the MXU product is not exactly symmetric in f32.
    N = 0.5 * (N + N.T)
    if row_boost is not None:
        N = N + jnp.diag(row_boost.astype(N.dtype))
    return N


def factorize(
    N: jax.Array, use_pallas: bool = False, blocked: bool = False
) -> CholFactors:
    """L·Lᵀ = N with failure detection.

    jnp.linalg.cholesky yields NaNs on a non-PD input; we map that to
    ``ok=False``, mirroring the solve-sparse nil return the drivers branch
    on (sparse-cholesky.lisp:512-514; affine-scaling.lisp:178-181).

    ``blocked`` uses the static-recursive matmul-rich factorization
    (ops.pallas_chol.blocked_cholesky) instead of lax.linalg.cholesky's
    serial column While loop — the vmap-friendly variant the batched
    solver path selects (see prepare_normal method="inverse"); a non-PD
    input still surfaces as NaN (sqrt of a negative leaf) and trips the
    same ok check.
    """
    if use_pallas:
        from cholesky_is_magic_tpu.ops.pallas_chol import cholesky as pallas_cholesky

        L = pallas_cholesky(N)
    elif blocked:
        from cholesky_is_magic_tpu.ops.pallas_chol import blocked_cholesky

        L = blocked_cholesky(N)
    else:
        L = jnp.linalg.cholesky(N)
    diag = jnp.diagonal(L)
    ok = jnp.all(jnp.isfinite(L)) & jnp.all(diag > 0)
    return CholFactors(L=jnp.where(ok, L, jnp.eye(N.shape[0], dtype=N.dtype)), ok=ok)


def rcond_estimate(L: jax.Array) -> jax.Array:
    """Cheap reciprocal-condition estimate from the Cholesky factor:
    (min diag L / max diag L)² — exactly what cholmod_rcond returns
    (sparse-cholesky.lisp:296 binds it; CHOLMOD documents the same
    diagonal-ratio estimate)."""
    d = jnp.abs(jnp.diagonal(L))
    return (jnp.min(d) / jnp.max(d)) ** 2


def chol_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L·Lᵀ) x = b by two triangular solves (cholmod_solve2 analogue,
    sparse-cholesky.lisp:276-288 — workspace recycling is XLA's job here:
    under jit the buffers are reused across iterations automatically)."""
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


@highest_precision
@partial(jax.jit, static_argnames=("refine_steps",))
def solve_spd(
    N: jax.Array,
    b: jax.Array,
    refine_steps: int = 1,
    factors: Optional[CholFactors] = None,
) -> tuple[jax.Array, jax.Array]:
    """Solve N x = b, N SPD, with double-word iterative refinement.

    Returns (x, ok).  refine_steps > 0 computes r = b - N·x in double-word
    precision (ops.dd) and re-solves the correction — the fp64-emulation
    that lets an f32 factorization match the reference's fp64 accuracy.
    """
    f = factorize(N) if factors is None else factors
    x = chol_solve(f.L, b)
    for _ in range(refine_steps):
        r = ddm.dd_residual(b, N, x)
        x = x + chol_solve(f.L, r)
    return jnp.where(f.ok, x, jnp.zeros_like(x)), f.ok


def operator_residual(
    AD: jax.Array,
    y: jax.Array,
    g: jax.Array,
    row_boost: Optional[jax.Array] = None,
) -> jax.Array:
    """g - AD·(ADᵀ·y) (- row_boost∘y) with the matvecs in double-word.

    The refinement residual against the UNASSEMBLED normal operator: it
    sees both the solve error and the f32 rounding of assembling N, which
    a residual against the assembled matrix cannot.  Shared by the dense
    backend and the sparse engines (sparse.tiled / sparse.factor), so
    every normal-equations path reaches the same dd accuracy story the
    reference gets for free from fp64 CHOLMOD (sparse-cholesky.lisp:524-560).
    """
    t = ddm.dd_rmatvec(AD, y)
    u = ddm.dd_add(ddm.dd_matvec(AD, t.hi), ddm.dd_matvec(AD, t.lo))
    if row_boost is not None:
        u = ddm.dd_add_w(u, row_boost.astype(y.dtype) * y)
    return ddm.dd_add_w(ddm.dd_neg(u), g).to_working()


def prepare_normal(
    A: jax.Array,
    d: jax.Array,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 1,
    true_residual: bool = False,
    dbound: float = 0.0,
    krylov_steps: int = 0,
    krylov_gate=None,
    method: str = "direct",
):
    """Assemble and factor N = (A·diag(d))(A·diag(d))ᵀ ONCE; return
    (solve_fn, ok) where solve_fn(g) runs the refined triangular solves.

    The factor-once/solve-many split of solve-sparse-recycle
    (sparse-cholesky.lisp:524-560): callers needing several solves against
    the same scaled operator (e.g. the dd KKT's outer refinement) pay one
    factorization.

    ``dbound`` > 0 arms a singular-retry: when the plain Cholesky fails
    (ill-conditioned N in f32 near convergence), refactor
    N + dbound·max(diag N)·I once — the dense rendering of CHOLMOD's
    dbound diagonal floor, which the reference exposes as a knob
    (wrapper.c dbound accessor; sparse-cholesky.lisp:20-27).  The
    refinement steps run against the UNregularized operator, so the
    jitter perturbs only the preconditioner, not the solved system.

    ``krylov_steps`` > 0 replaces Richardson refinement with flexible
    preconditioned CG (ops.krylov.pcg_refine): the f32 factor stays the
    preconditioner, residuals are explicit double-word, and the iterate
    accumulates in double-word — converges where plain refinement diverges
    (kappa(N) beyond ~1/eps_f32; the reference's fp64 CHOLMOD hits the
    same wall only at kappa ~ 1e16).  NOTE: it OVERRIDES ``refine_steps``
    and ``true_residual`` entirely — PCG's explicit dd residual against
    the unassembled operator subsumes both (the flags are ignored, not
    combined) — UNLESS ``krylov_gate`` is given.

    ``krylov_gate`` (a traced boolean; requires krylov_steps > 0) makes
    each solve_fn(g) call choose: gate True -> the PCG path, gate False ->
    the ``refine_steps``/``true_residual`` Richardson path, both on the
    same factor (ops.krylov.gated).  Solver loops pass gap < threshold so
    only near-floor iterations pay the PCG price.

    ``method`` selects the factor/solve kernels:

    - ``"direct"`` (default): lax.linalg.cholesky + per-rhs triangular
      solves — the right choice for a SINGLE system (XLA's While-loop
      trisolve amortizes over the 8-wide rhs panels).
    - ``"inverse"``: static-recursive blocked Cholesky
      (ops.pallas_chol.blocked_cholesky) + ONE explicit triangular
      inverse W = L⁻¹ via a 128-wide solve_triangular(L, I) sweep; every
      subsequent solve is two dense matvecs x = Wᵀ(W·b).  Under vmap the
      per-rhs serial trisolves collapse to batched matmuls — measured
      3.2x on the (256, 64, 128) batched IPM solve component
      (0.710 vs 2.293 ms, benchmarks/profile_batched_prims.py).  The
      explicit inverse loses ~one digit of raw solve accuracy at high
      kappa(N), which the same dd refinement steps recover (validated in
      tests/test_ops.py); the dbound retry and PCG escalation compose
      unchanged (the preconditioner becomes the Winv matvec pair)."""
    AD = A * d[None, :]
    N = jnp.matmul(AD, AD.T, preferred_element_type=AD.dtype,
                   precision=jax.lax.Precision.HIGHEST)
    N = 0.5 * (N + N.T)
    if row_boost is not None:
        N = N + jnp.diag(row_boost.astype(N.dtype))
    blocked = method == "inverse"
    f = factorize(N, blocked=blocked)
    if dbound > 0.0:
        eye = jnp.eye(N.shape[0], dtype=N.dtype)

        def retry():
            jitter = dbound * jnp.max(jnp.diagonal(N))
            return factorize(N + jitter * eye, blocked=blocked)

        f = jax.lax.cond(f.ok, lambda: f, retry)

    if method == "inverse":
        eyeN = jnp.eye(N.shape[0], dtype=N.dtype)
        W = jax.scipy.linalg.solve_triangular(f.L, eyeN, lower=True)

        def solve1(g):
            return W.T @ (W @ g)
    else:
        def solve1(g):
            return chol_solve(f.L, g)

    def richardson_fn(g):
        y = solve1(g)
        for _ in range(refine_steps):
            if true_residual:
                r = operator_residual(AD, y, g, row_boost)
            else:
                r = ddm.dd_residual(g, N, y)
            y = y + solve1(r)
        return jnp.where(f.ok, y, jnp.zeros_like(y))

    if krylov_steps > 0:
        from cholesky_is_magic_tpu.ops import krylov

        def pcg_fn(g):
            x = krylov.pcg_refine(
                precond=solve1,
                apply_n=krylov.dense_normal_apply(AD, row_boost),
                residual_dd=krylov.dense_residual_dd(AD, g, row_boost),
                b=g,
                iters=krylov_steps,
            )
            y = x.to_working()
            return jnp.where(f.ok, y, jnp.zeros_like(y))

        return krylov.gated(pcg_fn, richardson_fn, krylov_gate), f.ok

    return richardson_fn, f.ok


def solve_normal(
    A: jax.Array,
    d: jax.Array,
    g: jax.Array,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 1,
    true_residual: bool = False,
    dbound: float = 0.0,
    krylov_steps: int = 0,
    krylov_gate=None,
    method: str = "direct",
) -> tuple[jax.Array, jax.Array]:
    """Solve (A·diag(d))·(A·diag(d))ᵀ y = g with double-word refinement.

    With ``true_residual`` the refinement residual is computed as
    g - AD·(ADᵀ·y) in double-word precision — this corrects both the solve
    error *and* the f32 rounding of assembling N, which a residual against
    the assembled N cannot see.  It costs two dd matvecs over the full
    (m, n) operand (+0.58 ms/iter at pilot scale on v5e, vs +0.10 ms for
    the assembled-N residual); the assembly rounding is an eps-level
    perturbation of D that the IPM safeguards absorb, so the cheap variant
    is the default for solver loops and the true-operator variant is the
    high-accuracy opt-in.  Returns (y, ok); ok=False on singular N (the
    caller prints " singular " and stops, affine-scaling.lisp:178-181).
    """
    solve_fn, ok = prepare_normal(
        A, d, row_boost=row_boost, refine_steps=refine_steps,
        true_residual=true_residual, dbound=dbound,
        krylov_steps=krylov_steps, krylov_gate=krylov_gate, method=method,
    )
    return solve_fn(g), ok
