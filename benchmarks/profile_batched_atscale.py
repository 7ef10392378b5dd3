"""Why don't lanes stack on the at-scale engine? (VERDICT r4 item 3)

bench.py's batched-at-scale row measured 0.94x for 8 vmapped lanes at
m=8192 — the composition of the two headline stories (at-scale engine x
batching) delivers NO aggregate win.  Two candidate walls:

  (a) per-iteration lane scaling: the panel-wave chains are built from
      gathers/scatters (tile gathers, segment-sum assembly, whole-row
      gathers in the tri-solves); if XLA:TPU serializes those over the
      vmapped batch dim, each of the ~3B sequential panel steps costs
      lanes x its single-lane latency and vmap buys nothing;
  (b) the while_loop barrier: jax.vmap of the pdas while_loop runs every
      lane until the LAST lane converges (max iters, not per-lane), so
      heterogeneous iteration counts burn (max/mean) of the ideal win.

This script separates them: two-K per-iteration timing of the VMAPPED
solve_normal_ell at lanes = 1/2/4/8 (pure (a), no while_loop), plus the
per-lane iteration counts of the bench row's 8 LPs (pure (b)).

Run (real TPU): python -u benchmarks/profile_batched_atscale.py [m]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _atscale_sf, two_k_ms  # noqa: E402


def lane_scaling(m: int) -> dict:
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    sf = _atscale_sf(m)
    A_true = sp.csc_matrix(
        (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
    )
    eng = engine_for_sparse(A_true, block=128)
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                            (sf.ncons, sf.nvars))
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                             (sf.nvars, sf.ncons))
    rng = np.random.default_rng(0)
    out = {"m": sf.ncons, "B_panels": eng.B}
    kb = 16 if m >= 8192 else 32
    for lanes in (1, 2, 4, 8):
        # Flat (lanes*dim) carries: bench.two_k_ms chains scalars off
        # y[0] and adds 1e-6*y to g, so step must return y with g's
        # (flat) shape.
        d0 = jnp.asarray(rng.random(lanes * sf.nvars) + 0.5, jnp.float32)
        g0 = jnp.asarray(rng.normal(size=lanes * sf.ncons), jnp.float32)

        def step(d, g, lanes=lanes):
            y, ok = jax.vmap(
                lambda dd, gg: eng.solve_normal_ell(E, ET, dd, gg,
                                                    refine_steps=1)
            )(d.reshape(lanes, sf.nvars), g.reshape(lanes, sf.ncons))
            return y.reshape(-1), jnp.all(ok)

        ms = two_k_ms(step, d0, g0, k_base=kb, reps=3)
        out[f"lanes{lanes}_ms"] = round(ms, 3)
        out[f"lanes{lanes}_ms_per_lane"] = round(ms / lanes, 3)
        print(f"  lanes={lanes}: {ms:8.3f} ms/iter "
              f"({ms / lanes:.3f} ms/lane)", flush=True)
    out["lane_scaling_8v1"] = round(out["lanes8_ms"] / out["lanes1_ms"], 2)
    return out


def iter_spread(m: int, lanes: int = 8) -> dict:
    """Per-lane iteration counts of the bench row's LPs (wall (b))."""
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.parallel import (
        batched_pdas,
        stack_sparse_states,
    )
    from cholesky_is_magic_tpu.solvers import PDASConfig, pdas
    from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "examples"))
    import at_scale_sparse as demo

    A_ub, b_ub, A_eq, b_eq, c, l, u = demo.build_lp(m)
    rng = np.random.default_rng(7)
    sfs = []
    for i in range(lanes):
        lo = np.where(np.isfinite(l), l, -1.0)
        hi = np.where(np.isfinite(u), u, lo + 2.0)
        x0 = lo + (hi - lo) * (0.2 + 0.6 * rng.random(len(c)))
        sfs.append(demo.to_standard_form(
            A_ub, A_ub @ x0 + 0.1 + rng.random(A_ub.shape[0]),
            A_eq, A_eq @ x0, rng.normal(size=len(c)), l, u,
        ))
    st0, eng = make_pdas_sparse(sfs[0], block=128)
    states = [st0] + [
        make_pdas_sparse(sf, block=128, engine=eng)[0] for sf in sfs[1:]
    ]
    cfg = PDASConfig(max_iters=60, refine_steps=1, mehrotra=True)
    iters = []
    r = pdas(states[0], cfg, engine=eng)
    int(r.iterations)  # compile
    for s in states:
        r = pdas(s, cfg, engine=eng)
        iters.append(int(r.iterations))
    stacked = stack_sparse_states(states)
    res = batched_pdas(stacked, cfg, engine=eng)
    batched_iters = [int(i) for i in np.asarray(res.iterations)]
    return {
        "serial_iters": iters,
        "batched_iters": batched_iters,
        "iter_max_over_mean": round(max(iters) / (sum(iters) / len(iters)), 2),
    }


def main(ms):
    for m in ms:
        print(f"=== m={m}: per-iteration lane scaling ===", flush=True)
        out = lane_scaling(m)
        print(json.dumps(out), flush=True)
        print(f"=== m={m}: while_loop iteration spread ===", flush=True)
        out2 = iter_spread(m)
        print(json.dumps(out2), flush=True)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [8192])
