"""Where does the 4 ms/iteration of the heterogeneous batched loop go?

README "Benchmarks": `solve_batch` on 256 mixed LPs in one (64, 128)-class
box runs ~4.0 ms per batched iteration, while the raw batched
chol+solve is ~2 ms for the whole batch — VERDICT r3 task 6 asks which
component owns the difference (dispatch? branch-select? gathers?).

Method: two-K-difference timing (docs/DEVNOTES.md) of nested subsets of
the batched iteration, all vmapped over the same stacked B=(256) state:

  A. full _pdas_jit iteration      (forced non-convergent: gap_tol=0,
                                    timed via max_iters=K vs 2K)
  B. prepare + solve only          (the shared scaled-normal solve)
  C. B + kkt_reduce + kkt_backsub  (the Newton elimination around it)
  D. elementwise remainder         (= A - C: violation, ratio tests,
                                    branch selects, step, state update)

Run on the TPU: python benchmarks/profile_batched.py [B] [pad]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 32
REPS = 4


def build_states(B=256, pad=64):
    import jax
    import jax.numpy as jnp

    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest import to_device_lp
    from cholesky_is_magic_tpu.ingest.mps import read_mps_string
    from cholesky_is_magic_tpu.solvers import make_pdas
    from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

    states = []
    for s in range(B):
        ineq = random_lp(s, n_ub=24, n_eq=8, n=48, density=0.3)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        states.append(make_pdas(to_device_lp(sf, pad_multiple=pad,
                                             dtype=jnp.float32)))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def time_full_iteration(batched, k_base=K) -> float:
    """(A): per-iteration ms of the full vmapped PDAS loop, forced to run
    exactly max_iters iterations (gap_tol=0 never converges)."""
    import jax

    from cholesky_is_magic_tpu.parallel import batched_pdas
    from cholesky_is_magic_tpu.solvers import PDASConfig

    totals = {}
    for k in (k_base, 2 * k_base):
        cfg = PDASConfig(max_iters=k, gap_tol=0.0, stall_exit_iters=10**6)
        res = batched_pdas(batched, cfg)  # compile
        float(res.objective[0])
        ts = []
        for _ in range(REPS):
            t = time.time()
            res = batched_pdas(batched, cfg)
            float(res.objective[0])
            ts.append(time.time() - t)
        totals[k] = min(ts)
    return (totals[2 * k_base] - totals[k_base]) * 1e3 / k_base


def time_solve_only(batched, k_base=K) -> float:
    """(B): batched scaled-normal prepare+solve, chained two-K."""
    import jax
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ops import dense as dense_ops

    A = batched.lp.A  # (B, M, N)
    boost = (~batched.lp.row_mask).astype(A.dtype)
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.random((A.shape[0], A.shape[2])) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=(A.shape[0], A.shape[1])), jnp.float32)

    @jax.jit
    def loop(d0, g0, k):
        def body(i, carry):
            acc, g = carry
            d = d0 * (1.0 + 1e-6 * acc)

            def one(A_i, d_i, g_i, b_i):
                y, ok = dense_ops.solve_normal(A_i, d_i, g_i, row_boost=b_i,
                                               refine_steps=1)
                return y

            y = jax.vmap(one)(A, d, g, boost)
            return acc + y[0, 0], g + 1e-6 * y

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), g0))
        return acc

    totals = {}
    with jax.default_matmul_precision("highest"):
        float(loop(d0, g0, jnp.int32(k_base)))
        for k in (k_base, 2 * k_base):
            ts = []
            for _ in range(REPS):
                t = time.time()
                float(loop(d0, g0, jnp.int32(k)))
                ts.append(time.time() - t)
            totals[k] = min(ts)
    return (totals[2 * k_base] - totals[k_base]) * 1e3 / k_base


def time_kkt_step(batched, k_base=K) -> float:
    """(C): the full KKT Newton step (reduce + solve + backsub) batched."""
    import jax
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.kkt import newton as kkt

    lp = batched.lp
    Bn = lp.A.shape[0]
    boost = (~lp.row_mask).astype(lp.A.dtype)
    rng = np.random.default_rng(1)
    sl0 = jnp.asarray(rng.random((Bn, lp.A.shape[2])) + 0.5, jnp.float32)
    su0 = jnp.asarray(rng.random((Bn, lp.A.shape[2])) + 0.5, jnp.float32)
    w0 = jnp.asarray(rng.random((Bn, lp.A.shape[2])) + 0.1, jnp.float32)
    z0 = jnp.asarray(rng.random((Bn, lp.A.shape[2])) + 0.1, jnp.float32)
    e0 = jnp.asarray(rng.normal(size=(Bn, lp.A.shape[2])), jnp.float32)
    g0 = jnp.asarray(rng.normal(size=(Bn, lp.A.shape[1])), jnp.float32)

    @jax.jit
    def loop(sl0, k):
        def body(i, carry):
            acc, sl = carry

            def one(A_i, boost_i, sl_i, su_i, w_i, z_i, e_i, g_i):
                op = kkt.dense_kkt_operator(A_i, row_boost=boost_i)
                deltas = kkt.solve_kkt_newton(
                    sl_i, su_i, w_i, z_i, op, e_i, e_i, g_i, e_i,
                )
                return deltas.dx

            dx = jax.vmap(one)(lp.A, boost, sl, su0, w0, z0, e0, g0)
            return acc + dx[0, 0], sl * (1.0 + 1e-6 * dx)

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), sl0))
        return acc

    totals = {}
    with jax.default_matmul_precision("highest"):
        float(loop(sl0, jnp.int32(k_base)))
        for k in (k_base, 2 * k_base):
            ts = []
            for _ in range(REPS):
                t = time.time()
                float(loop(sl0, jnp.int32(k)))
                ts.append(time.time() - t)
            totals[k] = min(ts)
    return (totals[2 * k_base] - totals[k_base]) * 1e3 / k_base


def main(B=256, pad=64):
    batched = build_states(B, pad)
    M, N = batched.lp.A.shape[1:]
    print(f"batch {B} x padded ({M}, {N})")
    b_ms = time_solve_only(batched)
    print(f"B. batched prepare+solve:        {b_ms:8.3f} ms/iter")
    c_ms = time_kkt_step(batched)
    print(f"C. batched full KKT Newton step: {c_ms:8.3f} ms/iter")
    a_ms = time_full_iteration(batched)
    print(f"A. full batched PDAS iteration:  {a_ms:8.3f} ms/iter")
    print(f"D. elementwise/branch remainder (A - C): {a_ms - c_ms:8.3f} ms")
    print(f"   KKT-minus-solve (C - B):              {c_ms - b_ms:8.3f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
