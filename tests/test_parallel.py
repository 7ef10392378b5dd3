"""Batched + sharded modes on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cholesky_is_magic_tpu as cim
from cholesky_is_magic_tpu.ingest import to_device_lp
from cholesky_is_magic_tpu.ingest.mps import read_mps_string
from cholesky_is_magic_tpu.ops import dense as dense_ops
from cholesky_is_magic_tpu.parallel import (
    batched_pdas,
    lp_mesh,
    shard_batched_pdas,
    shard_lp_columns,
    sharded_solve_normal,
    stack_device_lps,
)
from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas
from cholesky_is_magic_tpu.solvers.result import Status
from cholesky_is_magic_tpu.utils.testing import (
    random_lp,
    scipy_reference_solution,
    write_mps,
)


def batch_of_lps(seeds, pad=16):
    lps, funs = [], []
    for seed in seeds:
        ineq = random_lp(seed, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lps.append(to_device_lp(sf, pad_multiple=pad, dtype=jnp.float64))
        funs.append(fun)
    return lps, funs


class TestBatched:
    def test_vmapped_pdas_matches_oracle(self):
        lps, funs = batch_of_lps([0, 2, 4, 6])
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *[make_pdas(lp) for lp in lps])
        res = batched_pdas(states, PDASConfig(max_iters=200))
        for i, fun in enumerate(funs):
            assert int(res.status[i]) == Status.OPTIMAL
            assert float(res.objective[i]) == pytest.approx(fun, rel=1e-3, abs=1e-3)

    def test_dp_sharded_batch(self):
        assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
        mesh = lp_mesh(dp=8, tp=1)
        lps, funs = batch_of_lps(range(8))
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *[make_pdas(lp) for lp in lps])
        states = shard_batched_pdas(states, mesh)
        res = batched_pdas(states, PDASConfig(max_iters=200))
        for i, fun in enumerate(funs):
            assert float(res.objective[i]) == pytest.approx(fun, rel=1e-3, abs=1e-3)


class TestShardedNormal:
    def test_matches_single_chip(self):
        mesh = lp_mesh(dp=2, tp=4)
        rng = np.random.default_rng(0)
        m, n = 24, 64  # n divisible by tp=4
        A = jnp.asarray(rng.normal(size=(m, n)), jnp.float64)
        d = jnp.asarray(rng.random(n) + 0.5, jnp.float64)
        g = jnp.asarray(rng.normal(size=m), jnp.float64)
        y_ref, ok_ref = dense_ops.solve_normal(A, d, g, refine_steps=0)
        y, ok = sharded_solve_normal(mesh, A, d, g)
        assert bool(ok) and bool(ok_ref)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-9, atol=1e-9)

    def test_with_refinement_and_boost(self):
        mesh = lp_mesh(dp=1, tp=8)
        rng = np.random.default_rng(1)
        m, n = 16, 80
        A = jnp.asarray(rng.normal(size=(m, n)), jnp.float64)
        A = A.at[12:].set(0.0)  # padded rows
        d = jnp.asarray(rng.random(n) + 0.5, jnp.float64)
        g = jnp.asarray(rng.normal(size=m), jnp.float64).at[12:].set(0.0)
        boost = jnp.zeros(m, jnp.float64).at[12:].set(1.0)
        y_ref, _ = dense_ops.solve_normal(A, d, g, row_boost=boost, refine_steps=1)
        y, ok = sharded_solve_normal(mesh, A, d, g, row_boost=boost, refine_steps=1)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-8, atol=1e-10)
        np.testing.assert_array_equal(np.asarray(y)[12:], 0.0)

    def test_column_sharded_lp_placement(self):
        mesh = lp_mesh(dp=1, tp=8)
        sf = cim.to_standard_form(
            cim.read_mps_file("tests/fixtures/simple.mps")
        )
        lp = to_device_lp(sf, pad_multiple=8, dtype=jnp.float64)
        slp = shard_lp_columns(lp, mesh)
        # The sharded A still equals the original.
        np.testing.assert_array_equal(np.asarray(slp.A), np.asarray(lp.A))
        assert "tp" in str(slp.A.sharding.spec)
