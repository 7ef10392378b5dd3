"""Solver status codes and results.

The reference signals failure by printing (" singular ", affine-scaling.lisp:179)
or erroring ("Unbounded problem", :188).  Inside lax.while_loop those become
status codes in the carry (SURVEY.md §7 "Control flow").
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax


class Status:
    RUNNING = 0
    OPTIMAL = 1
    SINGULAR = 2  # normal-equations factorization failed
    UNBOUNDED = 3  # ratio test exceeded the unbounded threshold
    MAX_ITERS = 4
    PRECISION_FLOOR = 5  # gap stopped improving at working precision

    NAMES = {0: "running", 1: "optimal", 2: "singular", 3: "unbounded",
             4: "max_iters", 5: "precision_floor"}


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "objective", "status", "iterations", "residual_norm", "extra"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class SolveResult:
    x: jax.Array  # primal solution (padded length N)
    objective: jax.Array  # c'x
    status: jax.Array  # Status code (int32)
    iterations: jax.Array  # int32
    residual_norm: jax.Array  # ||Ax - b||
    extra: dict  # solver-specific diagnostics (duality gap, duals, ...)

    @property
    def status_name(self) -> str:
        return Status.NAMES.get(int(self.status), "?")
