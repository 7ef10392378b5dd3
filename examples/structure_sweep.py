"""Structure dependence of TPU-vs-host factor+solve time (README claim).

A narrow-banded normal matrix is the host sparse direct solver's best case
(O(m·band²) factor); the TPU tile engine's cost tracks RESIDENT TILES, not
scalar fill, so its time is nearly structure-flat.  This sweep widens the
stage coupling of an m=8192 staircase LP and times both sides:

Measured on v5e (2026-08, two-K-difference timing):

    width   64: host splu  69.8 ms/iter   TPU 12.8 ms   (5.5x)
    width  256: host splu 388.2 ms/iter   TPU 12.1 ms   (32x)

(The narrow ~6-wide band of examples/at_scale_sparse.py is the host's
best case: 12 ms at m=8192, only ~1.8x.)

Run: python examples/structure_sweep.py [m] [width ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 16
REPS = 4


def wide_lp(m, width, seed=0):
    """Staircase A with `width`-spread stage coupling + slack identity."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    n = 2 * m
    ri, ci, vi = [], [], []
    for i in range(m):
        start = int(i * max(n - width, 1) / m)
        k = rng.integers(6, 12)
        cols = np.clip(start + rng.choice(width, size=k, replace=False), 0, n - 1)
        ri += [i] * len(cols)
        ci += list(cols)
        vi += list(rng.normal(size=len(cols)))
    ri += list(range(m))
    ci += list(n + np.arange(m))
    vi += [1.0] * m
    return sp.csc_matrix((vi, (ri, ci)), shape=(m, n + m))


def host_ms(A):
    import scipy.sparse.linalg as spl

    rng = np.random.default_rng(0)
    d = rng.random(A.shape[1]) + 0.5
    g = rng.normal(size=A.shape[0])
    Ar = A.tocsr()
    best = np.inf
    for _ in range(2):
        t = time.time()
        acc = 0.0
        for _k in range(3):
            dk = d * (1.0 + 1e-6 * acc)
            ADs = Ar.multiply(dk[None, :]).tocsr()
            Nmat = (ADs @ ADs.T).tocsc()
            lu = spl.splu(Nmat, permc_spec="MMD_AT_PLUS_A")
            y = lu.solve(g)
            y = y + lu.solve(g - Nmat @ y)
            acc += y[0]
        best = min(best, (time.time() - t) / 3)
    return best * 1e3


def tpu_ms(A):
    import jax
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    coo = A.tocoo()
    E = sparse_ops.from_coo(coo.row, coo.col, coo.data, A.shape)
    ET = sparse_ops.from_coo(coo.col, coo.row, coo.data,
                             (A.shape[1], A.shape[0]))
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.random(A.shape[1]) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=A.shape[0]), jnp.float32)
    eng = engine_for_sparse(A, block=128)

    @jax.jit
    def loop(d0, g0, k):
        def body(i, carry):
            acc, g = carry
            d = d0 * (1.0 + 1e-6 * acc)
            y, ok = eng.solve_normal_ell(E, ET, d, g, refine_steps=1)
            return acc + y[0], g + 1e-6 * y

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), g0))
        return acc

    with jax.default_matmul_precision("highest"):
        float(loop(d0, g0, jnp.int32(K)))
        totals = {}
        for k in (K, 2 * K):
            ts = []
            for _ in range(REPS):
                t = time.time()
                float(loop(d0, g0, jnp.int32(k)))
                ts.append(time.time() - t)
            totals[k] = min(ts)
    return (totals[2 * K] - totals[K]) * 1e3 / K, eng


def main(m=8192, widths=(64, 256)):
    for width in widths:
        A = wide_lp(m, width)
        h = host_ms(A)
        t, eng = tpu_ms(A)
        print(f"m={m} width={width}: host splu {h:.1f} ms/iter, "
              f"TPU {t:.2f} ms/iter ({h / t:.1f}x; NT={eng.NT} tiles)")


if __name__ == "__main__":
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    widths = tuple(int(x) for x in sys.argv[2:]) or (64, 256)
    main(m, widths)
