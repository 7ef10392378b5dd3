"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip).  The env
vars must be set before jax is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# below is what actually forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")

# Quick-tier compile-cost levers (r5, VERDICT item 8):
#
# (a) Raise vm.max_map_count so the _release_jit_maps cache wipes (and the
#     recompile cascades they trigger) never fire mid-suite.  Best-effort:
#     containers usually allow the write; fall back to the 45k wipe
#     threshold when they don't.
_MAP_LIMIT = -1
try:
    with open("/proc/sys/vm/max_map_count") as f:
        _MAP_LIMIT = int(f.read())
    if _MAP_LIMIT < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("262144")
        _MAP_LIMIT = 262144
except OSError:
    pass
#
# (b) Persistent XLA compilation cache: the suite's cost is dominated by
#     x64 CPU compiles of the big solver loops (crossover ~30 s, pdas_dd
#     ~20 s), repeated every run.  The on-disk cache cuts a warm second
#     run of the heaviest tests 2-3x.  jax 0.9.0's CPU AOT reload prints
#     a scary machine-feature mismatch error per load ("+prefer-no-scatter
#     ... could lead to SIGILL") — the mismatch is XLA's internal tuning
#     pseudo-features failing name normalization, not a real ISA
#     difference (same host compiled the entry); measured correct results
#     across the suite.  Escape hatch: CIM_TEST_NO_COMPILE_CACHE=1, and
#     `rm -rf .pytest_jax_cache` invalidates.
if not os.environ.get("CIM_TEST_NO_COMPILE_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(__file__), "..",
                              ".pytest_jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The reference is fp64 end-to-end (SURVEY.md §7 "Hard parts"); on CPU we test
# the x64 path directly.  The TPU path uses f32 + double-word refinement and
# is exercised by the dtype-parametrized tests.
jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture(autouse=True)
def _release_jit_maps():
    """Keep the process under vm.max_map_count (docs/DEVNOTES.md).

    Every XLA:CPU executable this jax (0.9.0) compiles holds tens of
    mmap'd code/data regions that are never unmapped while the executable
    sits in the jit cache.  At this suite's size the process crosses the
    default 65,530-map limit ~165 tests in, and the NEXT compile
    segfaults inside LLVM (deterministic at
    test_presolve.py::test_presolved_solve_matches_oracle; the test is
    innocent — it is merely where the budget runs out; confirmed by a
    maps monitor reading 65,395 at the sample before the crash).
    Dropping the jit caches when the map count nears the limit unmaps
    the dead executables; the occasional re-compiles cost seconds.
    """
    yield
    from cholesky_is_magic_tpu.utils.diag import release_jit_maps

    # With the raised kernel limit (see top of file) the wipe threshold
    # scales up and in practice never fires — compiled executables stay
    # cached across the whole run.
    threshold = 200_000 if _MAP_LIMIT >= 262144 else 45_000
    release_jit_maps(threshold=threshold)
