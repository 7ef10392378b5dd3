"""KKT Newton step: block elimination down to one normal-equations solve.

Reference: newton-solve.lisp (dense) and sparse-newton-solve.lisp (sparse)
— unified here behind one operator interface (SURVEY.md §2.9 notes the
reference's file-level duplication; the TPU build deduplicates it).
"""

from cholesky_is_magic_tpu.kkt.newton import (
    KKTOperator,
    dense_kkt_operator,
    solve_kkt_newton,
    kkt_residuals,
)

__all__ = [
    "KKTOperator",
    "dense_kkt_operator",
    "solve_kkt_newton",
    "kkt_residuals",
]
