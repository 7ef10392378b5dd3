"""At-scale matrix-free path: ALM/APPROX on an m=16384 staircase LP.

SURVEY §3.3 calls APPROX the most directly TPU-friendly algorithm in the
reference — pure gather/scatter + elementwise, no factorization (the
reference's hottest pure-Lisp loop, alm-approx.lisp:240-262).  This demo
gives it the at-scale story the IPM path already has:

  1. end-to-end `alm` over sparse operands (SparseLP; memory ~ nnz, with
     block-ELL renderings for the hot products — ops.bell) at
     m = 16384, with the HiGHS value for context;
  2. the inner-iteration kernel (one accelerated APPROX step: two
     value-&-gradient passes = 4 SpMVs + elementwise prox) timed per
     iteration on the TPU via the two-K method, against a FAITHFUL host
     baseline — the same arithmetic with scipy CSR matvecs (what the
     reference's Lisp loop compiles to, modulo SBCL vs C).

The honest framing mirrors README "Benchmarks": first-order methods on
LPs trade iteration count for iteration cost, so solves-to-tolerance is
reported, not implied.

Run: python examples/alm_at_scale.py [m]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from at_scale_sparse import build_lp, to_standard_form  # noqa: E402


def host_inner_iter_ms(sf, mu: float = 10.0, iters: int = 50) -> float:
    """Per-iteration ms of the SAME accelerated APPROX step on the host:
    y-blend, grad at y (2 SpMVs), prox, grad at z' (2 SpMVs), restart
    test — numpy/scipy CSR double precision."""
    import scipy.sparse as sp

    A = sp.csr_matrix(
        (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
    )
    AT = A.T.tocsr()
    s = np.sqrt(mu)
    lam = np.zeros(sf.ncons)
    c_lin = sf.c + AT @ lam
    beta = np.diff(A.indptr)
    nu = AT @ (beta * mu)
    l = np.clip(sf.l, -1e30, 1e30)
    u = np.clip(sf.u, -1e30, 1e30)

    def grad(v):
        r = s * (A @ v - sf.b)
        return AT @ (s * r) + c_lin

    x = np.clip(np.zeros(sf.nvars), l, u)
    z = x.copy()
    theta = 1.0
    best = np.inf
    for _rep in range(3):
        t0 = time.time()
        for _ in range(iters):
            y = (1.0 - theta) * x + theta * z
            gy = grad(y)
            step = theta * nu
            zp = np.clip(z - 0.95 * gy / np.where(step == 0, 1.0, step), l, u)
            x = y + theta * (zp - z)
            theta = 0.5 * (np.sqrt((theta**2 + 4.0) * theta**2) - theta**2)
            g = grad(zp)
            if g @ (zp - z) > 0:
                theta = 1.0
            else:
                z = zp
        best = min(best, (time.time() - t0) / iters)
    return best * 1e3


def tpu_inner_iter_ms(lp, mu: float = 10.0) -> float:
    """Two-K per-iteration ms of the accelerated APPROX step on device."""
    import jax
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.solvers.approx import (
        _solve_coordinate,
        make_alm_subproblem,
        value_and_gradient,
    )

    lam = jnp.zeros((lp.m,), lp.c.dtype)
    prob = make_alm_subproblem(lp, lam, mu)
    x0 = jnp.clip(jnp.zeros_like(prob.c_lin), prob.l, prob.u)

    @jax.jit
    def loop(x0, k):
        def body(i, carry):
            x, z, theta = carry
            y = (1.0 - theta) * x + theta * z
            _, gy, _ = value_and_gradient(prob, y)
            zp = _solve_coordinate(z, prob.nu, theta, gy, prob.l, prob.u)
            x_new = y + theta * (zp - z)
            theta_new = 0.5 * (
                jnp.sqrt((theta * theta + 4.0) * theta * theta) - theta * theta
            )
            _, g, _ = value_and_gradient(prob, zp)
            restart = jnp.dot(g, zp - z) > 0
            return (
                jnp.where(restart, z, x_new),
                jnp.where(restart, z, zp),
                jnp.where(restart, 1.0, theta_new),
            )

        x, z, _ = jax.lax.fori_loop(
            0, k, body, (x0, x0, jnp.asarray(1.0, x0.dtype))
        )
        return z[0] + x[0]

    K = 64
    with jax.default_matmul_precision("highest"):
        float(loop(x0, jnp.int32(K)))
        totals = {}
        for k in (K, 2 * K):
            ts = []
            for _ in range(4):
                t = time.time()
                float(loop(x0, jnp.int32(k)))
                ts.append(time.time() - t)
            totals[k] = min(ts)
    return (totals[2 * K] - totals[K]) * 1e3 / K


def main(m: int = 16384):
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ingest.device import to_sparse_lp
    from cholesky_is_magic_tpu.solvers import alm, make_alm
    from cholesky_is_magic_tpu.solvers.alm import ALMConfig

    sf = to_standard_form(*build_lp(m))
    print(f"LP: m={sf.ncons} n={sf.nvars} nnz={len(sf.a_vals)}")

    from scipy.optimize import linprog
    import scipy.sparse as sp

    t0 = time.time()
    A = sp.csr_matrix(
        (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
    )
    ref = linprog(sf.c, A_eq=A, b_eq=sf.b,
                  bounds=np.stack([np.clip(sf.l, -1e30, 1e30),
                                   np.clip(sf.u, -1e30, 1e30)], 1),
                  method="highs")
    print(f"HiGHS (host): {ref.fun:.4f} in {time.time() - t0:.1f}s")

    # --- Inner-iteration kernel: TPU vs faithful host baseline. ---
    lp = to_sparse_lp(sf, dtype=jnp.float32)
    tpu_ms = tpu_inner_iter_ms(lp)
    host_ms = host_inner_iter_ms(sf)
    print(f"APPROX inner iteration: TPU {tpu_ms:.3f} ms vs host (scipy CSR, "
          f"same arithmetic) {host_ms:.3f} ms -> {host_ms / tpu_ms:.1f}x")

    # --- End-to-end ALM over ELL operands.  f32 tolerances (ALMConfig
    # docstring / api.solve): the reference's f64 targets sit below f32
    # resolution and would burn the full inner budget every outer step. ---
    cfg = ALMConfig(max_outer=60, violation_tol=1e-4, pg_tol=1e-4,
                    omega_floor=1e-4, inner_iters=20_000)
    res = alm(make_alm(lp), config=cfg)
    float(res.value)  # compile + run
    t0 = time.time()
    res = alm(make_alm(lp), config=cfg)
    v = float(res.value)
    wall = time.time() - t0
    x = np.asarray(res.x)
    obj = float(sf.c @ x)
    print(f"alm (f32, ELL): value {v:.4f} objective {obj:.4f} "
          f"violation {float(res.violation):.2e} pg {float(res.pg):.2e} "
          f"outer {int(res.outer_iterations)} "
          f"inner {int(res.inner_iterations)} warm {wall:.1f}s")
    print(f"rel err vs HiGHS: {abs(obj - ref.fun) / abs(ref.fun):.2e} "
          "(first-order method at its documented 1e-4/1e-5-class "
          "tolerances — iteration count, not iteration cost, is the "
          "limiting factor at this conditioning)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
