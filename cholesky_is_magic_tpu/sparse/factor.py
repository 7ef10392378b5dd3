"""Device blocked-sparse Cholesky driven by the symbolic FactorPlan.

The `cholmod_factorize` replacement (SURVEY.md §3.1 INNER HOT SPOT): the
host symbolic analysis fixed a permutation and the set of structurally
nonzero 128x128 tiles of L; this module executes exactly that static tile
schedule on device:

    for each column panel k:             (python loop — static offsets)
        L[k,k]   = chol(S[k,k])              VPU/MXU   (blocked_cholesky)
        L[i,k]   = S[i,k] · L[k,k]^-T        MXU TRSM  (only nonzero tiles)
        S[i,j]  -= L[i,k] · L[j,k]ᵀ          MXU       (only affected tiles)

Tiles the symbolic phase proved zero are never touched — the flop count
follows nnz(L), not n³, while every executed op is a full 128-wide MXU
matmul.  Workspace recycling (solve-sparse-recycle,
sparse-cholesky.lisp:524-560) falls out of jit: one compiled program per
plan, buffers reused every iteration.

Storage is the padded dense (n_pad, n_pad) square — simple and fast at the
scales a single chip handles; compressed supernodal storage is the planned
follow-up for very large factors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cholesky_is_magic_tpu.ops.pallas_chol import blocked_cholesky, _rsolve_lower_T
from cholesky_is_magic_tpu.sparse.symbolic import FactorPlan


class BlockSparseCholesky:
    """Reusable factor+solve engine for one sparsity pattern.

    The analyze-once / factorize-per-iteration split of the reference
    (cholmod-analyze at affine-scaling.lisp:271, cholmod-factorize each
    iteration) maps to: build this object once per LP, call
    :meth:`solve_normal` every IPM iteration.
    """

    def __init__(self, plan: FactorPlan):
        self.plan = plan
        B = plan.block_mask.shape[0]
        self.n_tiles = B
        mask = plan.block_mask | np.eye(B, dtype=bool)
        # Panel schedule: for each column panel k, the nonzero sub-diagonal
        # row tiles, and the (i, j) Schur-update pairs.
        self.panel_rows = [
            [i for i in range(k + 1, B) if mask[i, k]] for k in range(B)
        ]
        self.updates = []
        for k in range(B):
            rows = [k] + self.panel_rows[k]
            # Pairs whose destination tile is structurally zero contribute
            # exact zeros (fill-path theorem: a nonzero product would force
            # elementwise fill at (i, j), i.e. a resident tile) — skip them.
            pairs = [
                (i, j)
                for i in rows
                for j in rows
                if i >= j and i > k and j > k and mask[i, j]
            ]
            self.updates.append(pairs)
        # Permutation gather indices (padded; padding maps to itself).
        n_pad = plan.n_padded
        pperm = np.arange(n_pad)
        pperm[: plan.n] = plan.perm
        self.pperm = jnp.asarray(pperm)

    # ---- factorization -------------------------------------------------

    def factorize(self, N_perm: jax.Array) -> jax.Array:
        """LLᵀ of the (padded, permuted) normal matrix via the tile schedule."""
        b = self.plan.block
        B = self.n_tiles
        S = N_perm
        L = jnp.zeros_like(N_perm)
        sl = lambda t: slice(t * b, (t + 1) * b)
        for k in range(B):
            Lkk = blocked_cholesky(S[sl(k), sl(k)])
            L = L.at[sl(k), sl(k)].set(Lkk)
            cols = {}
            for i in self.panel_rows[k]:
                Lik = _rsolve_lower_T(Lkk, S[sl(i), sl(k)])
                L = L.at[sl(i), sl(k)].set(Lik)
                cols[i] = Lik
            cols[k] = None
            for (i, j) in self.updates[k]:
                S = S.at[sl(i), sl(j)].add(
                    -jnp.matmul(
                        cols[i], cols[j].T, preferred_element_type=S.dtype,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                )
        return L

    def assemble_normal(
        self,
        A: jax.Array,
        d: jax.Array,
        row_boost: Optional[jax.Array] = None,
        tile_sparse: Optional[bool] = None,
    ) -> jax.Array:
        """Permuted N = P (A·D)(A·D)ᵀ Pᵀ (+ boost), padded to the plan size.

        Permuting A's *rows* by plan.perm yields the permuted Gram matrix
        directly from MXU matmuls (no post-hoc gather of N).  With
        ``tile_sparse`` (default: on when under 60% of tiles are nonzero),
        only the structurally-nonzero tiles of N are computed — one
        (block, n) x (n, block) matmul per tile — so assembly cost follows
        the tile count, not m².  This is where sparsity actually pays at
        scale: the dense m²n assembly dwarfs the factorization flops.
        """
        n_pad = self.plan.n_padded
        m = A.shape[0]
        if m < n_pad:
            A = jnp.pad(A, ((0, n_pad - m), (0, 0)))
            if row_boost is None:
                row_boost = jnp.zeros(m, A.dtype)
            row_boost = jnp.pad(
                row_boost, (0, n_pad - m), constant_values=1.0
            )
        Ap = A[self.pperm, :]
        AD = Ap * d[None, :]
        B = self.n_tiles
        b = self.plan.block
        mask = self.plan.block_mask | np.eye(B, dtype=bool)
        density = mask.sum() / (B * (B + 1) / 2)
        if tile_sparse is None:
            tile_sparse = density < 0.6
        if tile_sparse:
            N = jnp.zeros((n_pad, n_pad), AD.dtype)
            sl = lambda t: slice(t * b, (t + 1) * b)
            for i in range(B):
                for j in range(i + 1):
                    if not mask[i, j]:
                        continue
                    T = jnp.matmul(
                        AD[sl(i)], AD[sl(j)].T,
                        preferred_element_type=AD.dtype,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    N = N.at[sl(i), sl(j)].set(T)
                    if i != j:
                        N = N.at[sl(j), sl(i)].set(T.T)
        else:
            N = jnp.matmul(AD, AD.T, preferred_element_type=A.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            N = 0.5 * (N + N.T)
        if row_boost is not None:
            N = N + jnp.diag(row_boost[self.pperm].astype(N.dtype))
        return N

    def _check(self, L: jax.Array) -> jax.Array:
        diag = jnp.diagonal(L)
        return jnp.all(jnp.isfinite(L)) & jnp.all(diag > 0)

    def prepare_normal(
        self,
        A: jax.Array,
        d: jax.Array,
        row_boost: Optional[jax.Array] = None,
        refine_steps: int = 0,
        dbound: float = 0.0,
        krylov_steps: int = 0,
        krylov_gate=None,
    ):
        """Assemble + factor once; return (solve_fn, ok) — the engine's
        factor-once/solve-many split (solve-sparse-recycle analogue).

        ``dbound`` > 0 arms the CHOLMOD-dbound singular retry: on a failed
        factorization, refactor once with dbound*max(diag N) added to the
        diagonal (see ops.dense.prepare_normal; wrapper.c binds the knob).
        Refinement still runs against the unregularized operator.
        ``krylov_gate``: per-call traced PCG/Richardson choice on the
        shared factor (ops.krylov.gated)."""
        from cholesky_is_magic_tpu.ops.dense import operator_residual

        n_pad = self.plan.n_padded
        m = A.shape[0]
        N = self.assemble_normal(A, d, row_boost)
        L = self.factorize(N)
        ok = self._check(L)
        if dbound > 0.0:
            eye = jnp.eye(n_pad, dtype=N.dtype)

            def retry():
                jitter = dbound * jnp.max(jnp.diagonal(N))
                L2 = self.factorize(N + jitter * eye)
                return L2, self._check(L2)

            L, ok = jax.lax.cond(ok, lambda: (L, ok), retry)
        AD = A * d[None, :] if (refine_steps or krylov_steps) else None

        def raw_solve(r):
            rp = jnp.pad(r, (0, n_pad - m))[self.pperm]
            t = jax.scipy.linalg.solve_triangular(L, rp, lower=True)
            yp = jax.scipy.linalg.solve_triangular(L.T, t, lower=False)
            return jnp.zeros_like(yp).at[self.pperm].set(yp)[:m]

        def richardson_fn(g):
            y = raw_solve(g)
            for _ in range(refine_steps):
                r = operator_residual(AD, y, g, row_boost)
                y = y + raw_solve(r)
            return jnp.where(ok, y, jnp.zeros_like(y))

        if krylov_steps > 0:
            from cholesky_is_magic_tpu.ops import krylov

            def pcg_fn(g):
                x = krylov.pcg_refine(
                    precond=raw_solve,
                    apply_n=krylov.dense_normal_apply(AD, row_boost),
                    residual_dd=krylov.dense_residual_dd(AD, g, row_boost),
                    b=g,
                    iters=krylov_steps,
                )
                y = x.to_working()
                return jnp.where(ok, y, jnp.zeros_like(y))

            return krylov.gated(pcg_fn, richardson_fn, krylov_gate), ok

        return richardson_fn, ok

    def solve_normal(
        self,
        A: jax.Array,
        d: jax.Array,
        g: jax.Array,
        row_boost: Optional[jax.Array] = None,
        refine_steps: int = 0,
        dbound: float = 0.0,
        krylov_steps: int = 0,
    ):
        """Solve (A·D)(A·D)ᵀ y = g using the planned sparse factorization.

        Returns (y, ok) in the ORIGINAL row order — a drop-in for
        ops.dense.solve_normal (so it can back a KKTOperator).
        ``refine_steps`` adds double-word refinement against the unassembled
        operator (see ops.dense.operator_residual), matching the dense
        path's accuracy — the reference's sparse path is fp64 CHOLMOD
        (sparse-cholesky.lisp:524-560).  ``dbound`` arms the singular retry
        (see prepare_normal).
        """
        solve_fn, ok = self.prepare_normal(
            A, d, row_boost=row_boost, refine_steps=refine_steps,
            dbound=dbound, krylov_steps=krylov_steps,
        )
        return solve_fn(g), ok
