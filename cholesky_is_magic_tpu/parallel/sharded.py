"""Column-sharded normal equations: the tensor-parallel mode for wide LPs.

For an LP with n >> m (many variables, few constraints — the common shape
after standard-form slack insertion), the per-iteration cost is dominated
by assembling N = (A·D)(A·D)ᵀ: O(m²n) flops over an (m, n) operand.  Shard
A column-wise over the 'tp' mesh axis:

    N = sum_k (A_k · D_k)(A_k · D_k)ᵀ        (one psum over ICI)

Each chip holds an (m, n/tp) shard of A, computes its partial Gram matrix
on the MXU, and a single m x m psum rides the ICI ring.  The Cholesky of N
(m x m, small by assumption) is replicated.  Communication per iteration:
exactly one all-reduce of m² floats — independent of n.

This replaces the reference's process-internal FFI boundary (SURVEY.md §2
checklist: "replacing NCCL/MPI with XLA collectives over ICI").
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from cholesky_is_magic_tpu.ingest.device import DeviceLP
from cholesky_is_magic_tpu.ops import dense as dense_ops


def shard_lp_columns(lp: DeviceLP, mesh: Mesh) -> DeviceLP:
    """Place a DeviceLP with A and the column vectors sharded over 'tp'.

    Row-indexed arrays (b, row_mask, row_type) are replicated; the padded
    column count must divide by the tp axis size.
    """
    n_tp = mesh.shape["tp"]
    assert lp.A.shape[1] % n_tp == 0, (lp.A.shape, n_tp)

    def put(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    import dataclasses

    return dataclasses.replace(
        lp,
        A=put(lp.A, P(None, "tp")),
        c=put(lp.c, P("tp")),
        l=put(lp.l, P("tp")),
        u=put(lp.u, P("tp")),
        col_mask=put(lp.col_mask, P("tp")),
        b=put(lp.b, P()),
        row_mask=put(lp.row_mask, P()),
        row_type=put(lp.row_type, P()),
    )


def sharded_prepare_normal(
    mesh: Mesh,
    A: jax.Array,
    d: jax.Array,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 0,
):
    """Factor-once / solve-many split of the tp normal-equations pipeline.

    The factor pass shard_maps the partial Gram matrices + one psum('tp')
    and returns the replicated Cholesky factor; each solve_fn(g) call runs
    the replicated triangular solves plus ``refine_steps`` residual
    corrections whose matvecs are column-sharded (one m-vector psum each).
    Mirrors ops.dense.prepare_normal (the solve-sparse-recycle analogue)
    so the tp backend can serve KKTOperator.prepare_scaled_normal.
    """
    if row_boost is None:
        row_boost = jnp.zeros(A.shape[0], A.dtype)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P()),
        out_specs=(P(), P()),
    )
    def _factor(A_k, d_k, boost_rep):
        AD_k = A_k * d_k[None, :]
        N_part = jnp.matmul(AD_k, AD_k.T, preferred_element_type=A_k.dtype)
        N = jax.lax.psum(N_part, "tp")
        N = 0.5 * (N + N.T) + jnp.diag(boost_rep)
        f = dense_ops.factorize(N)
        return f.L, f.ok

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, "tp"), P("tp"), P()),
        out_specs=P(),
    )
    def _solve(L_rep, ok_rep, g_rep, A_k, d_k, boost_rep):
        from cholesky_is_magic_tpu.ops import dd as ddm

        AD_k = A_k * d_k[None, :]
        y = dense_ops.chol_solve(L_rep, g_rep)
        for _ in range(refine_steps):
            # Refinement residual in DOUBLE-WORD, sharded the same way as
            # the factor: each chip computes its dd partial of N·y
            # (ops.dd compensated matvecs), the hi and lo words psum
            # separately (the cross-chip reduction rounds at eps·tp, far
            # below the eps·n the plain-f32 residual loses), and the
            # correction solve runs replicated — the same accuracy story
            # as the single-chip dd refinement (ops.dense.prepare_normal).
            t_k = ddm.dd_rmatvec(AD_k, y)  # ADᵀy on this shard, dd
            u_k = ddm.dd_add(
                ddm.dd_matvec(AD_k, t_k.hi), ddm.dd_matvec(AD_k, t_k.lo)
            )
            u_hi = jax.lax.psum(u_k.hi, "tp")
            u_lo = jax.lax.psum(u_k.lo, "tp")
            u = ddm.dd_add_w(ddm.DD(u_hi, u_lo), boost_rep * y)
            r = ddm.dd_add_w(ddm.dd_neg(u), g_rep).to_working()
            y = y + dense_ops.chol_solve(L_rep, r)
        return jnp.where(ok_rep, y, jnp.zeros_like(y))

    with jax.default_matmul_precision("highest"):
        L, ok = _factor(A, d, row_boost)

    def solve_fn(g):
        with jax.default_matmul_precision("highest"):
            return _solve(L, ok, g, A, d, row_boost)

    return solve_fn, ok


def sharded_solve_normal(
    mesh: Mesh,
    A: jax.Array,
    d: jax.Array,
    g: jax.Array,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 0,
):
    """Explicit shard_map rendering of ops.dense.solve_normal over 'tp'.

    Each shard computes its partial (A_k D_k)(A_k D_k)ᵀ; one psum('tp')
    assembles N; the factor + triangular solves run replicated.  Returns
    (y, ok) identical (up to reduction order) to the single-chip solve.
    """
    solve_fn, ok = sharded_prepare_normal(
        mesh, A, d, row_boost=row_boost, refine_steps=refine_steps
    )
    return solve_fn(g), ok


def sharded_kkt_operator(
    mesh: Mesh,
    A: jax.Array,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 0,
):
    """KKTOperator backed by the tp pipeline — plugs the column-sharded
    normal solve into the SAME solve_kkt_newton elimination the dense and
    sparse backends use, making tp a solver mode, not a demo.  The
    elementwise elimination and the SpMVs stay plain jnp ops: under jit
    with column-sharded operands GSPMD partitions them and inserts the
    collectives (the explicit shard_map + psum lives in the normal solve,
    where the structure matters)."""
    from cholesky_is_magic_tpu.kkt.newton import KKTOperator

    return KKTOperator(
        mv=lambda v: A @ v,
        rmv=lambda v: A.T @ v,
        solve_scaled_normal=lambda s, g: sharded_solve_normal(
            mesh, A, s, g, row_boost=row_boost, refine_steps=refine_steps
        ),
        prepare_scaled_normal=lambda s: sharded_prepare_normal(
            mesh, A, s, row_boost=row_boost, refine_steps=refine_steps
        ),
    )
