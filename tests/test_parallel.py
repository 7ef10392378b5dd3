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

    def test_vmapped_pdas_inverse_kernel_matches_oracle(self):
        """factor_method="inverse" (the batched-mode dense kernel:
        blocked Cholesky + explicit triangular inverse) converges to the
        same optima as the per-rhs trisolve kernel under vmap."""
        lps, funs = batch_of_lps([0, 2, 4, 6])
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *[make_pdas(lp) for lp in lps])
        res = batched_pdas(states, PDASConfig(max_iters=200,
                                              factor_method="inverse"))
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

    @pytest.mark.slow
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

    def test_tp_pdas_end_to_end(self):
        """TP as a solver MODE: the full PDAS loop with every
        normal-equations solve column-sharded (shard_map + psum over
        'tp') must match the single-chip solve."""
        import dataclasses

        from cholesky_is_magic_tpu.solvers import pdas

        mesh = lp_mesh(dp=1, tp=8)
        ineq = random_lp(3, n_ub=12, n_eq=4, n=24, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=8, dtype=jnp.float64)
        st = make_pdas(lp)
        cfg = PDASConfig(max_iters=200)
        r_single = pdas(st, cfg)
        st_sharded = dataclasses.replace(st, lp=shard_lp_columns(st.lp, mesh))
        r_tp = pdas(st_sharded, cfg, mesh=mesh)
        assert int(r_tp.status) == Status.OPTIMAL
        assert float(r_tp.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)
        # Same trajectory up to reduction order: tight agreement.
        np.testing.assert_allclose(
            np.asarray(r_tp.x), np.asarray(r_single.x), rtol=1e-6, atol=1e-8
        )

    def test_tp_pdas_dd_tight_gap(self):
        """The tight-gap dd solver through the tp backend (exercises
        prepare_scaled_normal's factor-once/solve-many under shard_map)."""
        from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd

        mesh = lp_mesh(dp=1, tp=8)
        ineq = random_lp(2, n_ub=24, n_eq=6, n=32, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp32 = to_device_lp(sf, pad_multiple=64, dtype=jnp.float32)
        cfg = PDASConfig(max_iters=300, gap_tol=1e-8, refine_steps=2)
        res = pdas_dd(make_pdas_dd(lp32), cfg, mesh=mesh)
        assert float(res.extra["gap"]) < 1e-7
        assert float(res.objective) == pytest.approx(fun, rel=1e-4, abs=1e-4)

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


class TestShardedAffine:
    def test_tp_affine_end_to_end(self):
        """TP as a mode of the FIRST solver family too: the full
        affine-scaling loop with every projection/repair solve
        column-sharded matches the single-chip solve."""
        import dataclasses

        from cholesky_is_magic_tpu.solvers.affine import (
            affine_scaling,
            make_affine_state,
        )

        mesh = lp_mesh(dp=1, tp=8)
        ineq = random_lp(5, n_ub=12, n_eq=4, n=24, bounded=True)
        _, fun, _ = scipy_reference_solution(ineq)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        lp = to_device_lp(sf, pad_multiple=8, dtype=jnp.float64)
        st = make_affine_state(lp)
        r_single = affine_scaling(st)
        st_tp = dataclasses.replace(st, lp=shard_lp_columns(st.lp, mesh))
        r_tp = affine_scaling(st_tp, mesh=mesh)
        assert float(r_tp.objective) == pytest.approx(fun, rel=1e-3, abs=1e-3)
        assert int(r_tp.iterations) == int(r_single.iterations)
        np.testing.assert_allclose(
            np.asarray(r_tp.x), np.asarray(r_single.x), rtol=1e-6, atol=1e-8
        )


class TestShardedConditioning:
    """The tp backend keeps the single-chip escape hatches (r2 option gap):
    dbound singular-retry + Krylov refinement (advisor finding: both were
    silently dropped when mesh= was set)."""

    def _conditioned(self, kappa_n, m=96, n=192, seed=0):
        # f32 A whose normal matrix has condition ~kappa_n (as in
        # test_krylov): kappa 1e9 makes the raw f32 Cholesky fail.
        rng = np.random.default_rng(seed)
        U, _ = np.linalg.qr(rng.normal(size=(m, m)))
        V, _ = np.linalg.qr(rng.normal(size=(n, m)))
        sv = np.logspace(0.0, np.log10(kappa_n) / 2.0, m)
        A = jnp.asarray(U @ np.diag(sv) @ V.T, jnp.float32)
        g = jnp.asarray(rng.normal(size=m), jnp.float32)
        Af = np.asarray(A, np.float64)
        x64 = np.linalg.solve(Af @ Af.T, np.asarray(g, np.float64))
        return A, g, x64

    @pytest.mark.slow
    def test_mesh_dbound_singular_retry_plus_krylov(self):
        mesh = lp_mesh(dp=1, tp=8)
        A, g, x64 = self._conditioned(1e9)
        d = jnp.ones(A.shape[1], jnp.float32)
        with jax.default_matmul_precision("highest"):
            _, ok_raw = sharded_solve_normal(mesh, A, d, g)
            y, ok = sharded_solve_normal(
                mesh, A, d, g, dbound=1e-6, krylov_steps=80
            )
        assert not bool(ok_raw)  # without the retry the tp factor fails
        assert bool(ok)
        rel = np.linalg.norm(np.asarray(y, np.float64) - x64) / np.linalg.norm(x64)
        # Single-chip reaches <1e-5 here; the tp psum's different reduction
        # order costs a small factor at this extreme kappa (measured 4.9e-5).
        assert rel < 2e-4, rel

    @pytest.mark.slow
    def test_mesh_krylov_matches_single_chip_accuracy(self):
        mesh = lp_mesh(dp=1, tp=8)
        A, g, x64 = self._conditioned(1e8, seed=3)
        d = jnp.ones(A.shape[1], jnp.float32)
        with jax.default_matmul_precision("highest"):
            y_tp, ok = sharded_solve_normal(
                mesh, A, d, g, krylov_steps=20
            )
            y_1c, ok1 = dense_ops.solve_normal(
                A, d, g, refine_steps=0, krylov_steps=20
            )
        assert bool(ok) and bool(ok1)
        for y in (y_tp, y_1c):
            rel = np.linalg.norm(np.asarray(y, np.float64) - x64) / np.linalg.norm(x64)
            # ~1e-5 at this seed's kappa=1e8 (both paths); the point is
            # parity of the escape hatch, not ulp equality.
            assert rel < 5e-5, rel


class TestShardedDDRefinement:
    @pytest.mark.slow
    def test_sharded_refine_is_double_word_accurate(self):
        """The tp refinement residual runs in double-word (per-shard dd
        partials, separate hi/lo psums): an f32 sharded solve with
        refinement reaches ~eps_f32 forward error on a badly scaled d —
        the plain-f32 residual floors an order of magnitude higher."""
        rng = np.random.default_rng(7)
        mesh = lp_mesh(dp=1, tp=8)
        m, n = 48, 128
        A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
        # Slack-style spread: three decades of column scaling.
        d = jnp.asarray(10.0 ** rng.uniform(-1.5, 1.5, size=n), jnp.float32)
        g = jnp.asarray(rng.normal(size=m), jnp.float32)
        y, ok = sharded_solve_normal(mesh, A, d, g, refine_steps=2)
        assert bool(ok)
        AD = np.asarray(A, np.float64) * np.asarray(d, np.float64)[None, :]
        x64 = np.linalg.solve(AD @ AD.T, np.asarray(g, np.float64))
        rel = np.linalg.norm(np.asarray(y, np.float64) - x64) / np.linalg.norm(x64)
        assert rel < 5e-6, rel


class TestSlabbedBatching:
    """Straggler-free heterogeneous batching (batched_pdas_slabbed):
    converged LPs are compacted out between K-iteration slabs, so a hard
    member no longer drags the whole batch to max_iters."""

    def test_matches_monolithic_results(self):
        from cholesky_is_magic_tpu.parallel import batched_pdas_slabbed

        lps, funs = batch_of_lps([0, 2, 4, 6])
        states = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[make_pdas(lp) for lp in lps])
        cfg = PDASConfig(max_iters=200)
        res = batched_pdas_slabbed(states, cfg, slab_iters=16)
        for i, fun in enumerate(funs):
            assert int(res.status[i]) == Status.OPTIMAL
            assert float(res.objective[i]) == pytest.approx(fun, rel=1e-3, abs=1e-3)

    def test_straggler_does_not_gate_the_batch(self):
        """One LP is given an unreachable gap tolerance: the slab driver
        must still finish the others at their true iteration counts (the
        monolithic loop would run every lane to max_iters)."""
        from cholesky_is_magic_tpu.parallel import batched_pdas_slabbed

        lps, funs = batch_of_lps([0, 2, 4, 6])
        states = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[make_pdas(lp) for lp in lps])
        # f64 + gap_tol below f64 resolution => the whole batch runs to
        # max_iters monolithically; slabbed, only genuine work remains.
        cfg = PDASConfig(max_iters=120, gap_tol=1e-18, stall_exit_iters=10 ** 6)
        res = batched_pdas_slabbed(states, cfg, slab_iters=16)
        # Every lane individually exhausted its budget or stalled — but
        # the per-lane iterations are still correct bookkeeping.
        assert res.iterations.shape == (4,)
        assert int(np.max(res.iterations)) <= 120
        # Now the real assertion: mixed batch where 3 converge quickly at
        # 1e-4 and one is held to the unreachable tolerance.
        states2 = jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[make_pdas(lp) for lp in lps])
        cfg2 = PDASConfig(max_iters=120)
        r2 = batched_pdas_slabbed(states2, cfg2, slab_iters=16)
        assert all(int(s) == Status.OPTIMAL for s in r2.status)
        # Converged lanes stopped within a slab granule of their own
        # iteration count, far below max_iters.
        assert int(np.max(r2.iterations)) <= 48, r2.iterations


class TestBatchedSparseEngine:
    """The batched at-scale composition: ONE tile engine (one symbolic
    analysis, one pair schedule), a stacked batch of same-A LPs differing
    in (b, c), the fully sparse pdas/pdas_dd loops vmapped over lanes —
    parallel.batched_pdas(engine=...) / batched_pdas_dd(engine=...).

    The contract under test: the engine's assembly schedule bakes A's
    pair weights, so lanes share A; everything else batches."""

    @staticmethod
    def family(k=3, seed=11):
        """k same-A LPs with per-lane (b, c): the re-solve fleet shape."""
        import dataclasses as dc

        base = random_lp(seed, n_ub=24, n_eq=6, n=32, bounded=True)
        lanes, funs = [], []
        for i in range(k):
            rng = np.random.default_rng(1000 + i)
            x0 = base.l + (base.u - base.l) * (0.2 + 0.6 * rng.random(32))
            lane = dc.replace(
                base,
                b_ub=base.A_ub @ x0 + 0.05 + rng.random(base.A_ub.shape[0]),
                b_eq=base.A_eq @ x0,
                c=rng.normal(size=32),
            )
            _, fun, _ = scipy_reference_solution(lane)
            lanes.append(cim.to_standard_form(read_mps_string(write_mps(lane))))
            funs.append(fun)
        return lanes, funs

    def test_batched_sparse_pdas_matches_per_lane(self):
        from cholesky_is_magic_tpu.parallel import stack_sparse_states
        from cholesky_is_magic_tpu.solvers import pdas
        from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse

        sfs, funs = self.family()
        cfg = PDASConfig(max_iters=200, refine_steps=2)
        st0, eng = make_pdas_sparse(sfs[0], block=16)
        states = [st0] + [
            make_pdas_sparse(sf, block=16, engine=eng)[0] for sf in sfs[1:]
        ]
        res = batched_pdas(stack_sparse_states(states), cfg, engine=eng)
        for i, fun in enumerate(funs):
            assert int(res.status[i]) == Status.OPTIMAL
            assert float(res.objective[i]) == pytest.approx(
                fun, rel=1e-3, abs=1e-3
            )
            single = pdas(states[i], cfg, engine=eng)
            assert float(res.objective[i]) == pytest.approx(
                float(single.objective), rel=1e-5, abs=1e-5
            )

    def test_batched_sparse_two_phase_tight_gap(self):
        """Full batched two-phase: vmapped sparse pdas to feasibility,
        mu-recentered warm duals per lane, vmapped dd finisher to 1e-7+."""
        from cholesky_is_magic_tpu.ops import dd as ddm
        from cholesky_is_magic_tpu.parallel import (
            batched_pdas_dd,
            stack_sparse_states,
        )
        from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse
        from cholesky_is_magic_tpu.solvers.pdas_dd import (
            PDASDDState,
            mu_recentered_duals,
        )

        sfs, funs = self.family()
        st0, eng = make_pdas_sparse(sfs[0], block=16)
        states = [st0] + [
            make_pdas_sparse(sf, block=16, engine=eng)[0] for sf in sfs[1:]
        ]
        stacked = stack_sparse_states(states)
        p1 = batched_pdas(stacked, PDASConfig(max_iters=200, refine_steps=2),
                          engine=eng)
        to_dd = lambda v: ddm.dd_from(jnp.asarray(v, jnp.float32))
        dd_states = []
        for i, st in enumerate(states):
            w, z = mu_recentered_duals(
                p1.x[i], st.lp.l, st.lp.u, p1.extra["w"][i], p1.extra["z"][i],
                st.lp.col_mask,
            )
            dd_states.append(PDASDDState(
                x=to_dd(p1.x[i]), y=to_dd(p1.extra["y"][i]), w=to_dd(w),
                z=to_dd(z), lp=st.lp,
            ))
        res = batched_pdas_dd(
            stack_sparse_states(dd_states),
            PDASConfig(max_iters=200, gap_tol=1e-9, refine_steps=2),
            engine=eng,
        )
        for i, fun in enumerate(funs):
            assert float(res.extra["gap"][i]) < 1e-7
            assert float(res.objective[i]) == pytest.approx(
                fun, rel=1e-4, abs=1e-4
            )
