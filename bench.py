"""Benchmark: factor+solve time per IPM iteration (BASELINE.md metric).

Times the per-iteration hot path of the interior-point solvers — assemble
N = (A·D)(A·D)ᵀ on the MXU, Cholesky-factor it, two triangular solves, one
double-word-refined correction (SURVEY.md §3.1's INNER HOT SPOT) — on a
synthetic LP at Netlib 25fv47 scale (m=832, n=1664), and compares against
the same pipeline on the host CPU via scipy's LAPACK Cholesky (the stand-in
for the reference's CHOLMOD backend; BASELINE.md: "reference baseline
numbers must be generated, not cited").

Timing notes: on the axon TPU tunnel, block_until_ready() returns before
device execution completes, so we chain K data-dependent iterations inside
one jit, fetch a scalar (which does wait), and subtract the measured RTT.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


M, N = 832, 1664  # 25fv47 is 822 x 1571 (+slacks); padded to 128 multiples
K = 128  # chained iterations per timed run (amortizes ~25ms tunnel RTT noise)
REPS = 5


def tpu_iteration_ms() -> float:
    import jax
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ops import dense as dense_ops

    rng = np.random.default_rng(0)
    # Sparse-ish random LP matrix with a well-conditioned Gram matrix.
    A_np = (rng.random((M, N)) < 0.05) * rng.normal(size=(M, N))
    A_np[np.arange(M), np.arange(M)] += 2.0
    A = jnp.asarray(A_np, jnp.float32)
    d0 = jnp.asarray(rng.random(N) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=M), jnp.float32)

    @jax.jit
    def loop(A, d0, g0):
        # Full-f32 MXU passes: default bf16 matmuls are numerically unusable
        # for the normal equations (see utils/precision.py).
        def body(i, carry):
            acc, g = carry
            # Data-dependent d so no two iterations can be CSE'd; mimics the
            # slack vector changing between IPM iterations.
            d = d0 * (1.0 + 1e-6 * acc)
            y, ok = dense_ops.solve_normal(A, d, g, refine_steps=1)
            return acc + y[0], g + 1e-6 * y
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), g0))
        return acc

    @jax.jit
    def rtt_probe(A):
        return jnp.sum(A[:2, :2])

    float(rtt_probe(A))
    rtts = []
    for _ in range(REPS):
        t = time.time()
        float(rtt_probe(A))
        rtts.append(time.time() - t)
    rtt = min(rtts)

    with jax.default_matmul_precision("highest"):
        float(loop(A, d0, g0))  # compile
    ts = []
    for _ in range(REPS):
        t = time.time()
        float(loop(A, d0, g0))
        ts.append(time.time() - t)
    return max(1e-3 * (min(ts) - rtt), 1e-9) * 1e3 / K * 1e3  # -> ms/iter


def host_iteration_ms() -> float:
    from scipy.linalg import cho_factor, cho_solve

    rng = np.random.default_rng(0)
    A_np = (rng.random((M, N)) < 0.05) * rng.normal(size=(M, N))
    A_np[np.arange(M), np.arange(M)] += 2.0
    d = rng.random(N) + 0.5
    g = rng.normal(size=M)

    reps = 3
    best = np.inf
    for _ in range(reps):
        t = time.time()
        acc = 0.0
        for k in range(K):
            dk = d * (1.0 + 1e-6 * acc)
            AD = A_np * dk[None, :]
            Nmat = AD @ AD.T
            c, low = cho_factor(Nmat, lower=True)
            y = cho_solve((c, low), g)
            # One refinement step, as on device.
            r = g - Nmat @ y
            y = y + cho_solve((c, low), r)
            acc += y[0]
            g = g + 1e-6 * y
        best = min(best, time.time() - t)
    return best * 1e3 / K


def main():
    host_ms = host_iteration_ms()
    tpu_ms = tpu_iteration_ms()
    print(
        json.dumps(
            {
                "metric": f"factor+solve ms per IPM iteration (m={M}, n={N}, f32+dd refine)",
                "value": round(tpu_ms, 4),
                "unit": "ms",
                "vs_baseline": round(host_ms / tpu_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
