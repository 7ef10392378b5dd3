"""Micro-time the batched (B=256, m=64, n=128) solve primitives on the TPU.

Follow-up to profile_batched.py: that script pins the heterogeneous
solve_batch iteration at ~4 ms, of which ~2.3 ms is the batched
prepare+solve.  Here we split the prepare+solve into its XLA primitives
(assembly matmul, batched Cholesky, batched triangular-solve pair, dd
residual) and time two matmul-rich replacements for the serial
per-column triangular solves:

  - explicit triangular inverse (solve_triangular against I is ONE
    64-wide serial sweep instead of one per rhs; afterwards every solve
    is two batched matvecs), and
  - a fully unrolled block forward-substitution.

Each row: chained two-K difference timing (docs/DEVNOTES.md) so the ~25 ms
tunnel RTT cancels.  Run: python benchmarks/profile_batched_prims.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 64
REPS = 4
B, M, N = 256, 64, 128


def timed(name, loop_fn):
    import jax.numpy as jnp

    float(loop_fn(jnp.int32(K)))  # compile
    totals = {}
    for k in (K, 2 * K):
        ts = []
        for _ in range(REPS):
            t = time.time()
            float(loop_fn(jnp.int32(k)))
            ts.append(time.time() - t)
        totals[k] = min(ts)
    ms = (totals[2 * K] - totals[K]) * 1e3 / K
    print(f"{name:42s} {ms:8.3f} ms/iter")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ops import dd as ddm
    from cholesky_is_magic_tpu.ops import dense as dense_ops

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(B, M, N)), jnp.float32)
    d0 = jnp.asarray(rng.random((B, N)) + 0.5, jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, M)), jnp.float32)
    eyeM = jnp.eye(M, dtype=jnp.float32)

    def chain(body):
        """fori_loop wrapper feeding a tiny data dependence through d."""

        @jax.jit
        def loop(k):
            def step(i, carry):
                acc, d = carry
                out = body(d)
                return acc + out.ravel()[0], d * (1.0 + 1e-7 * out.ravel()[0])

            acc, _ = jax.lax.fori_loop(0, k, step, (jnp.float32(0.0), d0))
            return acc

        return loop

    with jax.default_matmul_precision("highest"):
        # 1. assembly: AD = A*d ; N = AD AD^T + I
        def assemble(d):
            AD = A * d[:, None, :]
            Nm = jnp.einsum("bij,bkj->bik", AD, AD)
            return Nm + eyeM[None]

        t_asm = timed("assembly matmul (B,64,128)", chain(lambda d: assemble(d)))

        N0 = assemble(d0)
        L0 = jnp.linalg.cholesky(N0)

        # 2. batched cholesky
        t_chol = timed("jnp.linalg.cholesky (B,64,64)",
                       chain(lambda d: jnp.linalg.cholesky(N0 + d[:, :M, None] * 0 +
                                                           1e-6 * d[:, 0, None, None] * eyeM[None])))

        # 3. batched trisolve pair, single rhs
        def trisolve_pair(d):
            b = g * d[:, :M]
            y = jax.scipy.linalg.solve_triangular(L0, b[..., None], lower=True)
            x = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(L0, -1, -2), y, lower=False)
            return x[..., 0]

        t_tri = timed("trisolve pair, 1 rhs", chain(trisolve_pair))

        # 4. dd residual against assembled N
        def ddres(d):
            return jax.vmap(ddm.dd_residual)(g * d[:, :M], N0, g)

        t_dd = timed("dd_residual vs assembled N", chain(ddres))

        # 5. full vmapped solve_normal (refine_steps=1)
        def full(d):
            def one(A_i, d_i, g_i):
                y, ok = dense_ops.solve_normal(A_i, d_i, g_i, refine_steps=1)
                return y

            return jax.vmap(one)(A, d, g)

        t_full = timed("vmapped solve_normal refine=1", chain(full))

        # 6. explicit triangular inverse (one wide serial sweep)
        def tri_inverse(d):
            Lj = L0 * (1.0 + 1e-7 * d[:, 0, None, None])
            eyeB = jnp.broadcast_to(eyeM, Lj.shape)
            Winv = jax.scipy.linalg.solve_triangular(Lj, eyeB, lower=True)
            return Winv

        t_inv = timed("tri inverse via solve_triangular(L, I)", chain(tri_inverse))

        Winv0 = jax.scipy.linalg.solve_triangular(L0, jnp.broadcast_to(eyeM, L0.shape), lower=True)

        # 7. solve via precomputed inverse: x = W^T (W b) — two matvecs
        def inv_solve(d):
            b = g * d[:, :M]
            y = jnp.einsum("bij,bj->bi", Winv0, b)
            return jnp.einsum("bji,bj->bi", Winv0, y)

        t_invsolve = timed("solve via Winv matvec pair", chain(inv_solve))

        # 8. vmapped static-recursive blocked Cholesky (unrolled, no
        # serial XLA While like lax.linalg.cholesky's column loop)
        from cholesky_is_magic_tpu.ops.pallas_chol import blocked_cholesky

        def blk_chol(d):
            Nj = N0 + 1e-6 * d[:, 0, None, None] * eyeM[None]
            return jax.vmap(blocked_cholesky)(Nj)

        t_blk = timed("vmapped blocked_cholesky", chain(blk_chol))

        # 9. full alternative: assemble + blocked chol + Winv + refined solve
        def alt_full(d):
            Nm = assemble(d)
            L = jax.vmap(blocked_cholesky)(Nm)
            W = jax.scipy.linalg.solve_triangular(L, jnp.broadcast_to(eyeM, L.shape), lower=True)

            def solve(b):
                y = jnp.einsum("bij,bj->bi", W, b)
                return jnp.einsum("bji,bj->bi", W, y)

            x = solve(g)
            r = jax.vmap(ddm.dd_residual)(g, Nm, x)
            return x + solve(r)

        t_alt = timed("ALT: asm+blk_chol+Winv+refined solve", chain(alt_full))

        print()
        print(f"assembly {t_asm:.3f} + chol {t_chol:.3f} + 2x trisolve pair "
              f"{2 * t_tri:.3f} + dd {t_dd:.3f} ~= full {t_full:.3f}")
        print(f"blocked chol {t_blk:.3f}")
        print(f"ALT path total {t_alt:.3f} (inv sweep {t_inv:.3f}, "
              f"matvec solve pair {t_invsolve:.3f})")


if __name__ == "__main__":
    main()
