"""Operand/backend dispatch shared by the solver loops.

Every solver family in the reference bottoms out in the same CHOLMOD
pipeline regardless of caller (sparse-cholesky.lisp:562-565 dispatches
solve-sparse; sparse-m* serves all matvecs).  Here the equivalent seam is
this module: a solver asks for (A@v, Aᵀ@v) products and a scaled
normal-equations solve, and the operand set decides the implementation —

- dense ``DeviceLP``: MXU matmuls + ops.dense (optionally a tile engine
  via ``engine=``, or the tensor-parallel shard_map pipeline via
  ``mesh=``);
- fully sparse ``SparseKKTLP``: ELL SpMVs (ops.sparse_ops) + the tile
  engine's pair-schedule assembly (requires ``engine=`` from
  sparse.tiled.engine_for_sparse); with ``mesh=`` too, the engine shards
  assembly pair slabs and panel-wave Schur updates over 'tp' — the
  multi-chip × at-scale composition.
"""

from __future__ import annotations

from cholesky_is_magic_tpu.ops import dense as dense_ops


def mv_rmv(lp):
    """(A@v, Aᵀ@v) for the operand set: dense DeviceLP or the fully
    sparse SparseKKTLP (the cholmod_sdmult analogue).  Sparse products
    ride the block-ELL renderings when the operand set carries them
    (ops.bell — the plain ELL gather/scatter serializes on TPU), falling
    back to the ELL pair otherwise."""
    from cholesky_is_magic_tpu.ingest.device import SparseKKTLP

    if isinstance(lp, SparseKKTLP):
        from cholesky_is_magic_tpu.ops import bell
        from cholesky_is_magic_tpu.ops import sparse_ops as so

        mv = ((lambda v: bell.matvec(lp.EB, v)) if lp.EB is not None
              else (lambda v: so.matvec(lp.E, v)))
        rmv = ((lambda v: bell.matvec(lp.ETB, v)) if lp.ETB is not None
               else (lambda v: so.matvec(lp.ET, v)))
        return mv, rmv
    return (lambda v: lp.A @ v, lambda v: lp.A.T @ v)


def row_boost(lp):
    """Unit diagonal boost on padded rows (keeps padding inert in N)."""
    from cholesky_is_magic_tpu.ingest.device import SparseKKTLP

    dt = lp.c.dtype if isinstance(lp, SparseKKTLP) else lp.A.dtype
    return (~lp.row_mask).astype(dt)


def prepare_normal_backend(lp, engine, d, row_boost, refine_steps,
                           mesh=None, dbound=0.0, krylov_steps=0,
                           krylov_gate=None, method="direct"):
    """Factor (A·diag(d))(A·diag(d))ᵀ ONCE on whichever backend the
    operand set and options select; returns (solve_fn, ok) — the
    solve-sparse-recycle split (sparse-cholesky.lisp:524-560) at the
    dispatch seam, so solver loops can run several rhs (e.g. the Mehrotra
    corrector) against one factorization.  ``krylov_gate``: traced
    per-call PCG/Richardson choice on the shared factor
    (ops.krylov.gated; requires krylov_steps > 0).  ``method``: dense
    factor/solve kernel selection (ops.dense.prepare_normal — "inverse"
    is the vmap-friendly batched variant); only the plain dense backend
    honors it (the sparse/tiled/mesh engines have their own kernels)."""
    from cholesky_is_magic_tpu.ingest.device import SparseKKTLP

    if isinstance(lp, SparseKKTLP):
        return engine.prepare_normal_ell(
            lp.E, lp.ET, d, lp.m, row_boost=row_boost,
            refine_steps=refine_steps, dbound=dbound,
            krylov_steps=krylov_steps, mesh=mesh,
            krylov_gate=krylov_gate,
            EB=getattr(lp, "EB", None), ETB=getattr(lp, "ETB", None),
        )
    if mesh is not None:
        from cholesky_is_magic_tpu.parallel.sharded import sharded_prepare_normal

        return sharded_prepare_normal(
            mesh, lp.A, d, row_boost=row_boost, refine_steps=refine_steps,
            dbound=dbound, krylov_steps=krylov_steps,
            krylov_gate=krylov_gate,
        )
    if engine is None:
        return dense_ops.prepare_normal(
            lp.A, d, row_boost=row_boost, refine_steps=refine_steps,
            dbound=dbound, krylov_steps=krylov_steps,
            krylov_gate=krylov_gate, method=method,
        )
    return engine.prepare_normal(
        lp.A, d, row_boost=row_boost, refine_steps=refine_steps,
        dbound=dbound, krylov_steps=krylov_steps, krylov_gate=krylov_gate,
    )


def solve_normal_backend(lp, engine, d, g, row_boost, refine_steps,
                         mesh=None, dbound=0.0, krylov_steps=0,
                         krylov_gate=None):
    """(A·diag(d))(A·diag(d))ᵀ y = g on whichever backend the operand set
    and options select (see module docstring).  Returns (y, ok)."""
    solve_fn, ok = prepare_normal_backend(
        lp, engine, d, row_boost, refine_steps, mesh=mesh, dbound=dbound,
        krylov_steps=krylov_steps, krylov_gate=krylov_gate,
    )
    return solve_fn(g), ok
