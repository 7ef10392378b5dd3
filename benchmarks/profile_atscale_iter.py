"""Wall ownership of the at-scale sparse IPM iteration (VERDICT r4 item 4).

bench.py's at-scale rows tag the m=8192/16384 fully-sparse iteration
"latency/serialization-bound" (GFLOP/s ~0.1, achieved GB/s ~2 = 0.25% of
HBM peak — NEITHER roofline is near).  This script says which stage owns
the wall, by two-K timing nested subsets of exactly what the bench row
runs (TiledCholesky.solve_normal_ell, refine_steps=1):

  A. assemble_pairs            one sorted segment-sum over the pair
                               schedule (O(nnz*colcount) entries)
  B. A + factorize             + B sequential panel steps (chol + tri-inv
                               + batched TRSM + batched SYRK each)
  C. B + triangular solves     + 2B sequential fwd/bwd panel steps
  D. C + dd refinement (x1)    + 4 ELL SpMVs in double-word + 1 re-solve
                               (= the bench row)

Per-stage share = difference of adjacent rows.  The factor/solve stages
are DEPENDENCY CHAINS of ~B and ~2B small steps (b=128 tiles): at
m=16384, B=128, so C-A spans ~384 sequential dispatch+gather rounds —
divide to get the effective per-panel-step latency and compare with the
~7 us/dispatch the plain-ELL serialization measured (DEVNOTES r4).

Run (real TPU): python -u benchmarks/profile_atscale_iter.py [m ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _atscale_sf, two_k_ms  # noqa: E402


def stages(m: int) -> dict:
    import jax.numpy as jnp
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    sf = _atscale_sf(m)
    A_true = sp.csc_matrix(
        (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
    )
    t0 = time.time()
    eng = engine_for_sparse(A_true, block=128)
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                            (sf.ncons, sf.nvars))
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                             (sf.nvars, sf.ncons))
    from cholesky_is_magic_tpu.ops import bell

    EB = bell.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                       (sf.ncons, sf.nvars))
    ETB = bell.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                        (sf.nvars, sf.ncons))
    build_s = time.time() - t0
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.random(sf.nvars) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=sf.ncons), jnp.float32)
    mloc = sf.ncons

    def s_assemble(d, g):
        tiles = eng.assemble_pairs(d)
        y = jnp.diagonal(tiles[eng.diag_ids], axis1=1, axis2=2).reshape(-1)
        return y[:mloc], jnp.asarray(True)

    def s_factor(d, g):
        tiles = eng.assemble_pairs(d)
        L, invd, ok = eng.factorize(tiles)
        y = jnp.diagonal(invd, axis1=1, axis2=2).reshape(-1)
        return y[:mloc], ok

    def s_solve(d, g):
        y, ok = eng.solve_normal_ell(E, ET, d, g, refine_steps=0)
        return y, ok

    def s_full(d, g):
        y, ok = eng.solve_normal_ell(E, ET, d, g, refine_steps=1)
        return y, ok

    def s_full_bell(d, g):
        y, ok = eng.solve_normal_ell(E, ET, d, g, refine_steps=1,
                                     EB=EB, ETB=ETB)
        return y, ok

    kb = 16 if m >= 8192 else 32
    out = {"m": mloc, "B_panels": eng.B, "build_s": round(build_s, 1)}
    for name, step in (("A_assemble", s_assemble), ("B_factor", s_factor),
                       ("C_solve", s_solve), ("D_full_refine1", s_full),
                       ("D2_full_refine1_bell", s_full_bell)):
        ms = two_k_ms(step, d0, g0, k_base=kb, reps=3)
        out[name] = round(ms, 3)
        print(f"  {name:16s} {ms:8.3f} ms/iter", flush=True)
    out["share_assemble_ms"] = round(out["A_assemble"], 3)
    out["share_factor_ms"] = round(out["B_factor"] - out["A_assemble"], 3)
    out["share_trisolve_ms"] = round(out["C_solve"] - out["B_factor"], 3)
    out["share_refine_ms"] = round(out["D_full_refine1"] - out["C_solve"], 3)
    # Effective per-sequential-step latency of the panel chains.
    chain_ms = out["share_factor_ms"] + out["share_trisolve_ms"]
    out["per_panel_step_us"] = round(1e3 * chain_ms / (3 * eng.B), 2)
    return out


def main(ms):
    import json

    for m in ms:
        print(f"=== m={m} ===", flush=True)
        print(json.dumps(stages(m)), flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [8192, 16384])
