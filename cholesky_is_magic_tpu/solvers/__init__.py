"""Solver drivers: jitted lax.while_loop renderings of the reference's
REPL-driven iteration loops (SURVEY.md §2.5, §2.8, §2.9-2.10)."""

from cholesky_is_magic_tpu.solvers.result import SolveResult, Status
from cholesky_is_magic_tpu.solvers.affine import (
    AffineConfig,
    AffineState,
    make_affine_state,
    affine_scaling,
)
from cholesky_is_magic_tpu.solvers.pdas import (
    PDASConfig,
    PDASState,
    make_pdas,
    pdas,
)
from cholesky_is_magic_tpu.solvers.approx import (
    ApproxProblem,
    make_alm_subproblem,
    make_approx_selfdual,
    approx,
)
from cholesky_is_magic_tpu.solvers.alm import ALMConfig, ALMState, make_alm, alm, aalm, adcd
from cholesky_is_magic_tpu.solvers.pdas_dd import (
    PDASDDState,
    make_pdas_dd,
    make_pdas_dd_sparse,
    pdas_dd,
)
from cholesky_is_magic_tpu.solvers.crossover import (
    CrossoverConfig,
    classify_basis,
    crossover,
)

__all__ = [
    "CrossoverConfig",
    "classify_basis",
    "crossover",
    "PDASDDState",
    "make_pdas_dd",
    "make_pdas_dd_sparse",
    "pdas_dd",
    "SolveResult",
    "Status",
    "AffineConfig",
    "AffineState",
    "make_affine_state",
    "affine_scaling",
    "PDASConfig",
    "PDASState",
    "make_pdas",
    "pdas",
    "ApproxProblem",
    "make_alm_subproblem",
    "make_approx_selfdual",
    "approx",
    "ALMConfig",
    "ALMState",
    "make_alm",
    "alm",
    "aalm",
    "adcd",
]
