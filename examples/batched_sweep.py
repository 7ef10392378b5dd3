"""Batched LP sweep: solve a batch of random LPs in one vmapped computation
(BASELINE.json config 5), optionally sharded over a device mesh.

Usage:  python examples/batched_sweep.py [batch_size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.parallel import batched_pdas, lp_mesh, shard_batched_pdas
from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas
from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64

states = []
for s in range(B):
    ineq = random_lp(s % 16, n_ub=24, n_eq=6, n=32, bounded=True)
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    states.append(make_pdas(to_device_lp(sf, pad_multiple=64, dtype=jnp.float32)))
batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)

if len(jax.devices()) > 1:
    mesh = lp_mesh(dp=len(jax.devices()), tp=1)
    batched = shard_batched_pdas(batched, mesh)
    print(f"batch sharded over {len(jax.devices())} devices (dp)")

cfg = PDASConfig(max_iters=60)
t0 = time.time()
res = batched_pdas(batched, cfg)
n_opt = int(jnp.sum(res.status == 1))
wall = time.time() - t0
print(f"batch {B}: {n_opt}/{B} optimal, {wall:.1f}s incl. compile")
t0 = time.time()
res = batched_pdas(batched, cfg)
int(jnp.sum(res.status == 1))
wall = time.time() - t0
print(f"warm: {wall*1e3:.0f} ms total -> {B/wall:.0f} LP solves/sec")
