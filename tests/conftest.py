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
