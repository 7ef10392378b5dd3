"""Diagnostics: factorization reports, checked mode, resource accounting.

The reference's observability is format-to-stdout traces plus CHOLMOD's
counters (SURVEY.md §5): per-iteration objective/step lines, a one-time
"AA' nnz/flops, Factor nnz/flops" report (affine-scaling.lisp:273-279),
the solve-kkt-newton-check runtime verifier (sparse-newton-solve.lisp:
200-223), and malloc-count/memory-inuse leak checks (:256-258).  The TPU
equivalents:

- :func:`factor_report` — the same cost report from a FactorPlan;
- :func:`checked_solve_kkt_newton` — checkify-based runtime verifier that
  *raises* when a KKT residual exceeds tolerance (the assert analogue);
- :func:`device_memory_report` / :func:`live_buffer_report` — device-side
  resource accounting (the CHOLMOD leak-counter analogue: XLA's allocator
  can't leak per-op, but buffers held alive by Python references can);
- :func:`nan_debug` — jax_debug_nans toggle, the "sanitizer mode"
  (SURVEY.md §5 race-detection analog for a numerical code);
- :func:`profile_trace` / :func:`annotate` — jax.profiler hooks (SURVEY.md
  §5 names "jax.profiler traces" as the TPU rendering of the reference's
  stdout instrumentation): capture a device trace around any solve and
  label regions so factorizations/refinements are identifiable in the
  trace viewer (tensorboard / xprof).
"""

from __future__ import annotations

import contextlib
import gc

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from cholesky_is_magic_tpu.kkt import newton as kkt_newton


def factor_report(plan) -> str:
    """The reference's startup cost report (affine-scaling.lisp:273-279):

        AA':    nnz: ...  flops: ...
        Factor: nnz: ...  flops: ...
    """
    aat_flops = 2.0 * plan.nnz_N  # one multiply-add per stored entry per rhs
    stats = plan.stats()
    lines = [
        f"AA':    nnz: {plan.nnz_N:12.5g} flops: {aat_flops:12.5g}",
        f"Factor: nnz: {plan.nnz_L:12.5g} flops: {plan.flops:12.5g}",
        f"Tiles:  {stats['nonzero_tiles']}/{stats['total_tiles']} "
        f"({plan.block}x{plan.block}), supernodes: {len(plan.snodes)}",
    ]
    if "aligned_tiles" in stats:
        # Supernode-aligned (slot-grid) residency: tile residency is
        # etree-exact (no closure), so this IS the engine's working set.
        dense_elems = plan.nnz_L if plan.nnz_L else 1
        lines.append(
            f"Aligned: {stats['aligned_tiles']} tiles over "
            f"{stats['aligned_panels']} panels "
            f"({stats['aligned_tiles'] * plan.block * plan.block / dense_elems:.2f}x "
            f"the elementwise nnz_L)"
        )
    return "\n".join(lines)


def checked_solve_kkt_newton(sl, su, w, z, op, e, f, g, h, tol: float = 1e-4):
    """Runtime-verified KKT solve: raises on residual > tol.

    The jit-compatible rendering of solve-kkt-newton-check's asserts
    (sparse-newton-solve.lisp:200-223) via checkify: the check travels
    through jit and is raised host-side on materialization.
    """

    def _solve(sl, su, w, z, e, f, g, h):
        deltas = kkt_newton.solve_kkt_newton(sl, su, w, z, op, e, f, g, h)
        res = kkt_newton.kkt_residuals(sl, su, w, z, op, e, f, g, h, deltas)
        checkify.check(
            jnp.all(res < tol), "KKT residuals {res} exceed tolerance", res=res
        )
        return deltas

    checked = checkify.checkify(_solve)
    err, deltas = checked(sl, su, w, z, e, f, g, h)
    err.throw()
    return deltas


def condition_number(N: jax.Array) -> jax.Array:
    """sigma_max / sigma_min of a (normal) matrix via SVD — the dense KKT
    solver's conditioning probe (cond-number, newton-solve.lisp:100-110).
    Expensive (full SVD); for monitoring, not the hot loop."""
    s = jnp.linalg.svd(N, compute_uv=False)
    return s[0] / s[-1]


class WorstConditionTracker:
    """Host-side running maximum — *worst-condition-number*
    (newton-solve.lisp:100, reported by the test sweep at :202)."""

    def __init__(self):
        self.worst = 1.0

    def update(self, N: jax.Array) -> float:
        c = float(condition_number(N))
        self.worst = max(self.worst, c)
        return c


def device_memory_report(device=None) -> dict:
    """Allocator statistics for one device (bytes in use / limits) — the
    cholmod-get-memory-inuse analogue.  Empty dict when the backend does
    not expose stats (CPU)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    return dict(stats) if stats else {}


def live_buffer_report() -> dict:
    """Count/bytes of live jax arrays held from Python — the malloc-count
    analogue (a solver that keeps growing this across solves is leaking
    references)."""
    arrays = jax.live_arrays()
    return {
        "count": len(arrays),
        "bytes": int(sum(a.nbytes for a in arrays)),
    }


def memory_map_count() -> int:
    """Number of memory mappings held by this process (Linux; -1
    elsewhere).  Every XLA:CPU executable keeps tens of mmap'd code/data
    regions alive while cached; a long-lived process that compiles
    hundreds of distinct programs (parameter sweeps, serving drivers)
    creeps toward the kernel's vm.max_map_count limit (65,530 default),
    past which the NEXT compile segfaults inside LLVM (measured: the
    full test suite crossed it ~165 tests in; docs/DEVNOTES.md r3)."""
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return -1


def release_jit_maps(threshold: int = 45_000) -> bool:
    """Drop the jit caches when the process map count exceeds
    ``threshold``, unmapping dead executables (returns True when it
    fired).  Call between solves in long-lived compile-heavy processes;
    re-compiles of anything still in use cost seconds.  The 45k default
    leaves one compile-heavy phase (~12k maps measured) of headroom
    under the 65,530 kernel default."""
    n = memory_map_count()
    if n < 0 or n <= threshold:
        # n < 0: no /proc (non-Linux) — no map-count limit to guard, and
        # clearing every call would force a full recompile per solve.
        return False
    jax.clear_caches()
    gc.collect()
    return True


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    """Context manager turning on jax_debug_nans (checkify-grade NaN
    detection on every op — the numerical 'sanitizer' mode)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler device trace around a block.

    Usage::

        with diag.profile_trace("/tmp/lp-trace"):
            res = pdas(state, cfg)
            float(res.objective)   # fetch inside the trace so device
                                   # execution is captured, not just dispatch

    The trace directory is tensorboard/xprof-compatible.  This is the
    profiling story SURVEY.md §5 calls for next to the structured
    per-iteration metrics (record_trace buffers).
    """
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named region for the profiler timeline (TraceAnnotation): wrap a
    host-side region that dispatches device work so it shows up labeled
    in the captured trace."""
    return jax.profiler.TraceAnnotation(name)
