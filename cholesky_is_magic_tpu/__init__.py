"""cholesky-is-magic, TPU-native.

A brand-new TPU-first (JAX / XLA / Pallas / pjit) linear-programming solver
framework with the capabilities of pkhuong/cholesky-is-magic (a Common Lisp +
CHOLMOD interior-point LP solver suite).  See SURVEY.md at the repo root for
the layer map this package implements:

- :mod:`cholesky_is_magic_tpu.ingest`   — MPS reader + standard-form converter
  (reference: read-mps.lisp, standard-form.lisp)
- :mod:`cholesky_is_magic_tpu.ops`      — dense/sparse linear algebra, Pallas
  Cholesky kernels, double-word fp64 emulation
  (reference: sparse-cholesky.lisp + CHOLMOD + wrapper.c)
- :mod:`cholesky_is_magic_tpu.sparse`   — host symbolic analysis (AMD,
  elimination tree, supernodes) + device numeric factorization
  (reference: cholmod_analyze / cholmod_factorize)
- :mod:`cholesky_is_magic_tpu.kkt`      — block-eliminated KKT Newton solve
  (reference: newton-solve.lisp, sparse-newton-solve.lisp)
- :mod:`cholesky_is_magic_tpu.solvers`  — affine scaling, primal-dual affine
  scaling, APPROX coordinate descent + ALM outer loop
  (reference: affine-scaling.lisp, primal-dual-affine-scaling.lisp,
  approx.lisp, alm-approx.lisp)
- :mod:`cholesky_is_magic_tpu.parallel` — vmapped LP batches and
  mesh-sharded normal equations (ICI collectives; no analog in the
  single-process reference)
- :mod:`cholesky_is_magic_tpu.utils`    — configs, diagnostics, checked mode
"""

from cholesky_is_magic_tpu.ingest.mps import MPSData, read_mps, read_mps_file
from cholesky_is_magic_tpu.ingest.standard_form import (
    StandardForm,
    to_standard_form,
    rescale_sf,
)


def solve(problem, solver="pdas", **kwargs):
    """Solve an LP end-to-end (lazy re-export of :func:`api.solve`; the
    laziness defers the solver-module imports and their jit tracing — the
    package import itself already pulls in jax via ingest.device)."""
    from cholesky_is_magic_tpu.api import solve as _solve

    return _solve(problem, solver, **kwargs)


def solve_batch(problems, **kwargs):
    """Solve many LPs as one vmapped computation (lazy re-export of
    :func:`api.solve_batch`)."""
    from cholesky_is_magic_tpu.api import solve_batch as _solve_batch

    return _solve_batch(problems, **kwargs)


def embed_batch(problems, **kwargs):
    """Embed LPs into one device-resident padded batch for repeated
    :func:`solve_batch` calls (lazy re-export of :func:`api.embed_batch`)."""
    from cholesky_is_magic_tpu.api import embed_batch as _embed_batch

    return _embed_batch(problems, **kwargs)


__version__ = "0.1.0"

__all__ = [
    "MPSData",
    "read_mps",
    "read_mps_file",
    "StandardForm",
    "to_standard_form",
    "rescale_sf",
    "solve",
    "solve_batch",
    "embed_batch",
]
