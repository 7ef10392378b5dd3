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
    if row_boost is None:
        row_boost = jnp.zeros(A.shape[0], A.dtype)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, "tp"), P("tp"), P(), P()),
        out_specs=(P(), P()),
    )
    def _solve(A_k, d_k, g_rep, boost_rep):
        AD_k = A_k * d_k[None, :]
        N_part = jnp.matmul(AD_k, AD_k.T, preferred_element_type=A_k.dtype)
        N = jax.lax.psum(N_part, "tp")
        N = 0.5 * (N + N.T) + jnp.diag(boost_rep)
        f = dense_ops.factorize(N)
        y = dense_ops.chol_solve(f.L, g_rep)
        for _ in range(refine_steps):
            # Refinement residual with the matvec sharded the same way:
            # N y is reassembled via psum each step.
            t_k = AD_k.T @ y
            u_part = AD_k @ t_k
            u = jax.lax.psum(u_part, "tp") + boost_rep * y
            y = y + dense_ops.chol_solve(f.L, g_rep - u)
        return jnp.where(f.ok, y, jnp.zeros_like(y)), f.ok

    with jax.default_matmul_precision("highest"):
        return _solve(A, d, g, row_boost)
