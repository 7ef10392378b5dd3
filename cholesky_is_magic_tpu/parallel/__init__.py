"""Multi-chip scaling: vmapped LP batches + mesh-sharded normal equations.

The reference is single-process (SURVEY.md §2 parallelism checklist: DP/TP/
PP/EP/SP all absent — there are no sequences, pipelines, or experts in an LP
solver).  The TPU build adds the two parallel modes that make sense for this
workload:

- **dp (batch)**: many independent LPs solved simultaneously — vmap over the
  padded DeviceLP pytree, batch dimension sharded across the mesh
  (BASELINE.json config 5: 1k random LPs over an ICI mesh).
- **tp (columns)**: one huge LP with n >> m — A sharded column-wise, each
  chip computes its partial Gram matrix (A_k D_k)(A_k D_k)ᵀ, and one psum
  over ICI assembles the m x m normal matrix; the Cholesky is replicated
  (m is small by assumption).  This shards the AAᵀ flops AND the memory of
  A, the dominant operand.

Both are expressed as shardings + jit (GSPMD inserts the collectives); the
explicit shard_map variant of the normal-equations build is provided for
control and as documentation of the communication pattern.
"""

from cholesky_is_magic_tpu.parallel.mesh import lp_mesh
from cholesky_is_magic_tpu.parallel.batched import (
    stack_device_lps,
    shard_batched_pdas,
    batched_pdas,
    batched_pdas_slabbed,
    batched_affine,
    batched_normal_solves,
    batched_pdas_dd,
    stack_sparse_states,
)
from cholesky_is_magic_tpu.parallel.sharded import (
    shard_lp_columns,
    sharded_solve_normal,
    sharded_prepare_normal,
    sharded_kkt_operator,
)

__all__ = [
    "lp_mesh",
    "stack_device_lps",
    "shard_batched_pdas",
    "batched_pdas",
    "batched_pdas_slabbed",
    "batched_affine",
    "batched_normal_solves",
    "batched_pdas_dd",
    "stack_sparse_states",
    "shard_lp_columns",
    "sharded_solve_normal",
    "sharded_prepare_normal",
    "sharded_kkt_operator",
]
