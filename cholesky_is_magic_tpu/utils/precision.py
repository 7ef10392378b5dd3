"""Matmul-precision control for TPU correctness.

On TPU, f32 matmuls default to ONE bf16 pass through the MXU (~8-bit
mantissa) — fine for neural nets, fatal for interior-point linear algebra:
with a bf16-assembled normal matrix, PDAS converges to visibly wrong
objectives (observed: -30.98 vs the true -52.02) while the identical f32
program on CPU is correct.  Every solver entry point therefore traces
under `jax.default_matmul_precision("highest")` (full f32, 6 MXU passes).

The precision is a trace-time property: wrapping the *call* of a jitted
function is enough, and the setting is baked into the compiled executable.
"""

from __future__ import annotations

import functools

import jax


def highest_precision(fn):
    """Decorator: trace/execute ``fn`` under full-f32 matmul precision."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
