"""Solve an MPS file with every solver family and compare.

Usage:  python examples/solve_mps.py [path/to/problem.mps]
Defaults to the bundled afiro-scale fixture.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.solvers import (
    AffineConfig,
    PDASConfig,
    affine_scaling,
    alm,
    make_affine_state,
    make_alm,
    make_pdas,
    pdas,
)
from cholesky_is_magic_tpu.solvers.alm import ALMConfig
from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd

path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "afiro_like.mps"
)

sf = cim.to_standard_form(cim.read_mps_file(path))
lp = to_device_lp(sf, pad_multiple=128, dtype=jnp.float32)
print(f"{path}: {sf.ncons} rows x {sf.nvars} cols ({sf.initial_vars} original)")

t = time.time()
r = affine_scaling(make_affine_state(lp), AffineConfig())
print(f"affine   : {r.status_name:16s} obj={float(r.objective):+.6f} "
      f"iters={int(r.iterations):3d}  [{time.time()-t:.1f}s]")

t = time.time()
r = pdas(make_pdas(lp), PDASConfig())
print(f"pdas     : {r.status_name:16s} obj={float(r.objective):+.6f} "
      f"iters={int(r.iterations):3d} gap={float(r.extra['gap']):.1e}  [{time.time()-t:.1f}s]")

t = time.time()
r = pdas_dd(make_pdas_dd(lp), PDASConfig(gap_tol=1e-8, max_iters=300, refine_steps=3))
print(f"pdas_dd  : {r.status_name:16s} obj={float(r.objective):+.6f} "
      f"iters={int(r.iterations):3d} gap={float(r.extra['gap']):.1e}  [{time.time()-t:.1f}s]")

t = time.time()
# f32 note: the reference's 1e-5/1e-6 ALM tolerances assume f64; in f32 the
# inner APPROX loop cannot reach them and burns its full budget each outer
# step.  Match the tolerances to the dtype.
r = alm(make_alm(lp), config=ALMConfig(inner_iters=50_000, max_outer=60,
                                       violation_tol=1e-4, pg_tol=1e-4,
                                       omega_floor=1e-4))
print(f"alm      : viol={float(r.violation):.1e}      value={float(r.value):+.6f} "
      f"outer={int(r.outer_iterations):3d} inner={int(r.inner_iterations)}  [{time.time()-t:.1f}s]")
