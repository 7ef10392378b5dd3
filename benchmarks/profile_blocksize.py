"""Panel-size A/B for the at-scale factor chain (the dispatch-latency wall).

DEVNOTES r5 "wall ownership": at m=16384 / block=128 the factor+solve
chains are ~420 SEQUENTIAL panel steps at ~13 us each — ~5.5 ms of the
13.5 ms iteration is pure dependency-chain dispatch latency, unreachable
by bandwidth/FLOP optimizations *at this panel size*.  The obvious lever
nobody has measured: a BIGGER panel (block=256) halves the chain length at
the cost of ~2x padded tile FLOPs — and the chip is >99.99% FLOP-idle on
this path, so the FLOPs are free if the gathers don't blow up.

This script A/Bs block=128 vs block=256 (vs 512 optionally) on the
staircase family: per-iteration solve_normal_ell time (two-K method),
plus a correctness cross-check (same d, g -> same solution to f32+refine
tolerance) and the plan's step/tile counts so the latency model is
checkable against the measurement.

Run on the TPU: python -u benchmarks/profile_blocksize.py [m] [blocks...]
CPU correctness only: CIM_FORCE_CPU=1 python benchmarks/profile_blocksize.py 1024
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("CIM_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(m=8192, blocks=(128, 256)):
    import jax.numpy as jnp
    import scipy.sparse as sp

    from bench import _atscale_sf, two_k_ms
    from cholesky_is_magic_tpu.ops import bell, sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    sf = _atscale_sf(m)
    A_true = sp.csc_matrix((sf.a_vals, (sf.a_rows, sf.a_cols)),
                           shape=(sf.ncons, sf.nvars))
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                            (sf.ncons, sf.nvars))
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                             (sf.nvars, sf.ncons))
    EB = bell.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                       (sf.ncons, sf.nvars))
    ETB = bell.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                        (sf.nvars, sf.ncons))
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.random(sf.nvars) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=sf.ncons), jnp.float32)

    ref = None
    for block in blocks:
        eng = engine_for_sparse(A_true, block=block)
        plan = eng.plan
        yy, ok = eng.solve_normal_ell(E, ET, d0, g0, refine_steps=1,
                                      EB=EB, ETB=ETB)
        y = np.asarray(yy)
        row = {
            "m": m, "block": block,
            "panels": int(-(-plan.perm.size // block)),
            "resident_tiles": int(plan.block_mask.sum())
            if hasattr(plan, "block_mask") and plan.block_mask is not None
            else None,
        }
        if ref is None:
            ref = y
        else:
            row["rel_diff_vs_first"] = float(
                np.linalg.norm(y - ref) / max(np.linalg.norm(ref), 1e-30))
        if not os.environ.get("CIM_FORCE_CPU"):
            row["iter_ms"] = round(two_k_ms(
                lambda d, g: eng.solve_normal_ell(
                    E, ET, d, g, refine_steps=1, EB=EB, ETB=ETB),
                d0, g0, k_base=16, reps=3), 4)
        print(json.dumps(row))


if __name__ == "__main__":
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    blocks = tuple(int(b) for b in sys.argv[2:]) or (128, 256)
    main(m, blocks)
