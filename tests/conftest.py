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

    release_jit_maps()
