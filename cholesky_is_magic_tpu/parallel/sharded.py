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
    dbound: float = 0.0,
    krylov_steps: int = 0,
    krylov_gate=None,
):
    """Factor-once / solve-many split of the tp normal-equations pipeline.

    The factor pass shard_maps the partial Gram matrices + one psum('tp')
    and returns the replicated Cholesky factor; each solve_fn(g) call runs
    the replicated triangular solves plus ``refine_steps`` residual
    corrections whose matvecs are column-sharded (one m-vector psum each).
    Mirrors ops.dense.prepare_normal (the solve-sparse-recycle analogue)
    so the tp backend can serve KKTOperator.prepare_scaled_normal.

    ``dbound`` > 0 arms the singular-retry diagonal floor exactly as in
    ops.dense.prepare_normal (CHOLMOD's dbound knob): on a failed f32
    Cholesky, refactor once with dbound*max(diag N) added to the diagonal.
    The retry runs inside the replicated factor pass, so the mesh path
    keeps the same failure-recovery story as single-chip.

    ``krylov_steps`` > 0 replaces Richardson refinement with flexible PCG
    (ops.krylov.pcg_refine): the replicated f32 factor is the
    preconditioner, and the N-applies / double-word residuals are
    column-sharded shard_maps (one m-vector psum each, hi and lo words
    reduced separately) — the ill-conditioning escape hatch at tp scale.
    Overrides ``refine_steps`` (as in the single-chip backend) unless
    ``krylov_gate`` (a traced boolean) is given, in which case each
    solve_fn call picks PCG (gate True) or the ``refine_steps``
    Richardson path (gate False) on the same replicated factor
    (ops.krylov.gated).
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
        if dbound > 0.0:
            eye = jnp.eye(N.shape[0], dtype=N.dtype)

            def retry():
                jitter = dbound * jnp.max(jnp.diagonal(N))
                return dense_ops.factorize(N + jitter * eye)

            f = jax.lax.cond(f.ok, lambda: f, retry)
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

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P(), P()),
        out_specs=P(),
    )
    def _apply_n(A_k, d_k, boost_rep, p_rep):
        # p -> (AD)(AD)ᵀp + boost∘p, column-sharded, one psum('tp').
        AD_k = A_k * d_k[None, :]
        t_k = AD_k.T @ p_rep
        q = jax.lax.psum(AD_k @ t_k, "tp")
        return q + boost_rep * p_rep

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P(), P(), P(), P()),
        out_specs=P(),
    )
    def _residual_dd(A_k, d_k, boost_rep, g_rep, xhi_rep, xlo_rep):
        from cholesky_is_magic_tpu.ops import dd as ddm

        # g - N·x in double-word on a dd iterate: the sharded rendering of
        # krylov.dense_residual_dd — hi and lo words psum separately.
        AD_k = A_k * d_k[None, :]
        t_k = ddm.dd_rmatvec_dd(AD_k, ddm.DD(xhi_rep, xlo_rep))
        u_k = ddm.dd_add(
            ddm.dd_matvec(AD_k, t_k.hi), ddm.dd_matvec(AD_k, t_k.lo)
        )
        u = ddm.DD(jax.lax.psum(u_k.hi, "tp"), jax.lax.psum(u_k.lo, "tp"))
        u = ddm.dd_add(u, ddm.two_prod(boost_rep, xhi_rep))
        u = ddm.dd_add_w(u, boost_rep * xlo_rep)
        return ddm.dd_add_w(ddm.dd_neg(u), g_rep).to_working()

    with jax.default_matmul_precision("highest"):
        L, ok = _factor(A, d, row_boost)

    def richardson_fn(g):
        with jax.default_matmul_precision("highest"):
            return _solve(L, ok, g, A, d, row_boost)

    if krylov_steps > 0:
        from cholesky_is_magic_tpu.ops import krylov

        def pcg_fn(g):
            with jax.default_matmul_precision("highest"):
                x = krylov.pcg_refine(
                    precond=lambda r: dense_ops.chol_solve(L, r),
                    apply_n=lambda p: _apply_n(A, d, row_boost, p),
                    residual_dd=lambda x_dd: _residual_dd(
                        A, d, row_boost, g, x_dd.hi, x_dd.lo
                    ),
                    b=g,
                    iters=krylov_steps,
                )
                y = x.to_working()
                return jnp.where(ok, y, jnp.zeros_like(y))

        return krylov.gated(pcg_fn, richardson_fn, krylov_gate), ok

    return richardson_fn, ok


def sharded_solve_normal(
    mesh: Mesh,
    A: jax.Array,
    d: jax.Array,
    g: jax.Array,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 0,
    dbound: float = 0.0,
    krylov_steps: int = 0,
):
    """Explicit shard_map rendering of ops.dense.solve_normal over 'tp'.

    Each shard computes its partial (A_k D_k)(A_k D_k)ᵀ; one psum('tp')
    assembles N; the factor + triangular solves run replicated.  Returns
    (y, ok) identical (up to reduction order) to the single-chip solve.
    """
    solve_fn, ok = sharded_prepare_normal(
        mesh, A, d, row_boost=row_boost, refine_steps=refine_steps,
        dbound=dbound, krylov_steps=krylov_steps,
    )
    return solve_fn(g), ok


def sharded_kkt_operator(
    mesh: Mesh,
    A: jax.Array,
    row_boost: Optional[jax.Array] = None,
    refine_steps: int = 0,
    dbound: float = 0.0,
    krylov_steps: int = 0,
    krylov_gate=None,
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
            mesh, A, s, g, row_boost=row_boost, refine_steps=refine_steps,
            dbound=dbound, krylov_steps=krylov_steps,
        ),
        prepare_scaled_normal=lambda s: sharded_prepare_normal(
            mesh, A, s, row_boost=row_boost, refine_steps=refine_steps,
            dbound=dbound, krylov_steps=krylov_steps,
            krylov_gate=krylov_gate,
        ),
    )
