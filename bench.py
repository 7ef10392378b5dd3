"""Benchmark: factor+solve time per IPM iteration (BASELINE.md metric).

Times the per-iteration hot path of the interior-point solvers — assemble
N = (A·D)(A·D)ᵀ, Cholesky-factor it, two triangular solves, one double-word
refined correction (SURVEY.md §3.1's INNER HOT SPOT) — on a staircase LP at
Netlib 25fv47 scale (821 x 1571 + slacks), run through the REAL ingest
pipeline (MPS text -> standard form -> padded DeviceLP), so the timed
operands have realistic LP sparsity (~6 nnz/row), not a synthetic density.

Four contenders; the reported ratio is strongest-host / strongest-TPU:

  TPU dense     ops.dense.solve_normal           (MXU, f32 + dd refine)
  TPU tiled     sparse.tiled.TiledCholesky       (planned tile factorization)
  host dense    scipy cho_factor/cho_solve       (LAPACK fp64)
  host sparse   sksparse CHOLMOD if importable, else scipy splu on sparse N
                (the CHOLMOD-class sparse oracle BASELINE.md names)

Timing notes: on the axon TPU tunnel, block_until_ready() returns before
device execution completes, so we chain K data-dependent iterations inside
one jit and fetch a scalar (which does wait).  The per-iteration time is
the TWO-K DIFFERENCE (t(2K) - t(K)) / K, which cancels every fixed
per-call overhead (tunnel RTT, dispatch, transfer) exactly — a separate
RTT probe under-corrects by whatever the loop's own launch costs, which
at sub-ms per-iteration scales was a 30-60% error.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import time

import numpy as np

K = 64  # base chained-iteration count; timed at K and 2K, difference used
REPS = 5


def make_problem():
    """25fv47-scale LP through the real ingest path."""
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ingest import to_device_lp, to_standard_form
    from cholesky_is_magic_tpu.ingest.mps import read_mps_string
    from cholesky_is_magic_tpu.utils.testing import netlib_like_lp, write_mps

    ineq = netlib_like_lp("25fv47")
    sf = to_standard_form(read_mps_string(write_mps(ineq)))
    lp = to_device_lp(sf, pad_multiple=128, dtype=jnp.float32)
    return sf, lp


def _host_operands(sf, rng):
    A = sf.dense_A()
    m, n = A.shape
    d = rng.random(n) + 0.5
    g = rng.normal(size=m)
    return A, d, g


def tpu_times_ms(sf, lp) -> dict:
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.ops import dense as dense_ops
    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for, engine_for_sparse

    rng = np.random.default_rng(0)
    A = lp.A
    M, N = A.shape
    boost = (~lp.row_mask).astype(A.dtype)
    d0 = jnp.asarray(rng.random(N) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=M), jnp.float32)
    eng = engine_for(A, block=128)
    # Fully sparse path on the TRUE (unpadded) operands.
    A_true = sp.csc_matrix(
        (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
    )
    eng_s = engine_for_sparse(A_true, block=128)
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                            (sf.ncons, sf.nvars))
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                             (sf.nvars, sf.ncons))
    ds0 = jnp.asarray(rng.random(sf.nvars) + 0.5, jnp.float32)
    gs0 = jnp.asarray(rng.normal(size=sf.ncons), jnp.float32)

    def timed(solve, d0=d0, g0=g0):
        @jax.jit
        def loop(d0, g0, k):
            # Data-dependent d so no two iterations can be CSE'd; mimics
            # the slack vector changing between IPM iterations.  The trip
            # count k is a TRACED argument (lowers to while_loop), so one
            # compile serves both K and 2K runs.
            def body(i, carry):
                acc, g = carry
                d = d0 * (1.0 + 1e-6 * acc)
                y, ok = solve(d, g)
                return acc + y[0], g + 1e-6 * y

            acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), g0))
            return acc

        # Full-f32 MXU passes: default bf16 matmuls are numerically
        # unusable for the normal equations (see utils/precision.py).
        totals = {}
        with jax.default_matmul_precision("highest"):
            float(loop(d0, g0, jnp.int32(K)))  # compile
            for k in (K, 2 * K):
                ts = []
                for _ in range(REPS):
                    t = time.time()
                    float(loop(d0, g0, jnp.int32(k)))
                    ts.append(time.time() - t)
                totals[k] = min(ts)
        return (totals[2 * K] - totals[K]) * 1e3 / K

    dense_ms = timed(
        lambda d, g: dense_ops.solve_normal(A, d, g, row_boost=boost, refine_steps=1)
    )
    tiled_ms = timed(
        lambda d, g: eng.solve_normal(A, d, g, row_boost=boost, refine_steps=1)
    )
    sparse_ms = timed(
        lambda d, g: eng_s.solve_normal_ell(E, ET, d, g, refine_steps=1),
        d0=ds0, g0=gs0,
    )
    return {
        "tpu_dense": max(dense_ms, 1e-6),
        "tpu_tiled": max(tiled_ms, 1e-6),
        "tpu_fully_sparse": max(sparse_ms, 1e-6),
    }


def host_times_ms(sf) -> dict:
    """Host oracles on the SAME problem: dense LAPACK and sparse direct."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    from scipy.linalg import cho_factor, cho_solve

    rng = np.random.default_rng(0)
    A, d, g0 = _host_operands(sf, rng)
    out = {}

    # Dense LAPACK (the reference's Matlisp-class dense path).
    reps, kk = 3, min(K, 16)
    best = np.inf
    for _ in range(reps):
        g = g0.copy()
        t = time.time()
        acc = 0.0
        for _k in range(kk):
            dk = d * (1.0 + 1e-6 * acc)
            AD = A * dk[None, :]
            Nmat = AD @ AD.T
            c, low = cho_factor(Nmat, lower=True)
            y = cho_solve((c, low), g)
            y = y + cho_solve((c, low), g - Nmat @ y)  # one refinement
            acc += y[0]
            g = g + 1e-6 * y
        best = min(best, time.time() - t)
    out["host_dense"] = best * 1e3 / kk

    # Sparse direct (CHOLMOD if importable, else SuperLU).  The sparse
    # matmul + factorization pipeline the reference actually runs
    # (cholmod_scale + cholmod_aat + cholmod_factorize + solve2).
    As = sp.csr_matrix(A)
    try:
        from sksparse.cholmod import analyze as chol_analyze  # type: ignore

        factor_sym = chol_analyze(sp.csc_matrix(As @ As.T))

        def sparse_factor_solve(Nmat, g):
            f = factor_sym.cholesky(sp.csc_matrix(Nmat))
            return f(g)

        label = "host_cholmod"
    except ImportError:

        def sparse_factor_solve(Nmat, g):
            lu = spl.splu(sp.csc_matrix(Nmat), permc_spec="MMD_AT_PLUS_A")
            return lu.solve(g)

        label = "host_splu"
    best = np.inf
    for _ in range(reps):
        g = g0.copy()
        t = time.time()
        acc = 0.0
        for _k in range(kk):
            dk = d * (1.0 + 1e-6 * acc)
            ADs = As.multiply(dk[None, :]).tocsr()
            Nmat = (ADs @ ADs.T).tocsc()
            y = sparse_factor_solve(Nmat, g)
            y = y + sparse_factor_solve(Nmat, g - Nmat @ y)
            acc += y[0]
            g = g + 1e-6 * y
        best = min(best, time.time() - t)
    out[label] = best * 1e3 / kk
    return out


def main():
    sf, lp = make_problem()
    host = host_times_ms(sf)
    tpu = tpu_times_ms(sf, lp)
    best_host = min(host.values())
    best_tpu = min(tpu.values())
    detail = {k: round(v, 4) for k, v in {**host, **tpu}.items()}
    print(
        json.dumps(
            {
                "metric": (
                    "factor+solve ms per IPM iteration "
                    f"(25fv47-scale staircase LP, m={sf.ncons}, n={sf.nvars}, "
                    "f32+dd refine; vs strongest host oracle incl. sparse direct)"
                ),
                "value": round(best_tpu, 4),
                "unit": "ms",
                "vs_baseline": round(best_host / best_tpu, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
