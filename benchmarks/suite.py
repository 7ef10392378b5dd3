"""BASELINE.json config table, generated (BASELINE.md: "reference baseline
numbers must be generated, not cited").

Runs the five named configurations and prints one JSON object per config
plus a summary table; with --save, writes benchmarks/results_<platform>.json.

  1. afiro (REAL Netlib fixture) via affine scaling, dense normal equations
  2. adlittle + sc205 scale via pdas, dense factor + dd refinement
  3. 25fv47 + pilot scale via the two-phase pdas -> pdas_dd flow
     (iterations to 1e-8 gap) with per-iteration factor+solve time vs the
     sparse host oracle
  4. ill-conditioned LP via the ALM/APPROX matrix-free path
  5. batched sweep: vmapped full pdas solves over random LPs

Timing: two-K difference (docs/DEVNOTES.md) — (t(2K)-t(K))/K of one jitted
chained loop with a traced trip count; cancels the tunnel RTT exactly.
Instances other than afiro are structural stand-ins at the real (m, n)
scales (zero-egress environment; drop real MPS files in and the same
harness runs them — utils.testing.netlib_like_lp documents the structure).

Run: python benchmarks/suite.py [--save]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# K must make K*per-iteration-time >> the few-ms tunnel jitter: at the
# sub-0.1 ms/iter of the small dense configs, K=32 produced a NEGATIVE
# two-K difference (noise).  128 puts the smallest signal near 10 ms.
K = 128
REPS = 4


def two_k_ms(step, d0, g0):
    """Per-iteration ms of step(d, g) -> scalar, two-K method."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(d0, g0, k):
        def body(i, carry):
            acc, g = carry
            d = d0 * (1.0 + 1e-6 * acc)
            out = step(d, g)
            return acc + out, g + 1e-6 * out

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
    return (totals[2 * K] - totals[K]) * 1e3 / K


def host_splu_ms(sf):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    A = sp.csr_matrix(
        (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
    )
    rng = np.random.default_rng(0)
    d = rng.random(sf.nvars) + 0.5
    g = rng.normal(size=sf.ncons)
    best = np.inf
    for _ in range(3):
        t = time.time()
        acc = 0.0
        for _k in range(4):
            dk = d * (1.0 + 1e-6 * acc)
            ADs = A.multiply(dk[None, :]).tocsr()
            Nmat = (ADs @ ADs.T).tocsc()
            lu = spl.splu(Nmat, permc_spec="MMD_AT_PLUS_A")
            y = lu.solve(g)
            y = y + lu.solve(g - Nmat @ y)
            acc += y[0]
        best = min(best, (time.time() - t) / 4)
    return best * 1e3


def _sf_for(name):
    """(sf, real_mps, known_optimum): a REAL fixture when one exists,
    else a constructed-exact-optimum instance at the named scale
    (utils.testing.constructed_optimum_lp) — every stand-in row now
    carries a published-optimum-class check instead of only an oracle."""
    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.utils.testing import constructed_optimum_lp

    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "tests", "fixtures")
    real = os.path.join(fixtures, f"{name}.mps")
    if os.path.exists(real):
        return cim.to_standard_form(cim.read_mps_file(real)), True, None
    sf, info = constructed_optimum_lp(name)
    return sf, False, info["objective"]


def config_afiro():
    import cholesky_is_magic_tpu as cim

    sf, real, _known = _sf_for("afiro")
    t0 = time.time()
    # Row equilibration is required in f32: unscaled afiro stalls at
    # obj -379 (measured); rescaled it converges in ~24 iterations.  The
    # reference applies rescale-sf to real instances the same way.
    rep = cim.solve(sf, "affine", pad_multiple=16, max_iters=600,
                    refine_steps=2, rescale=True)
    wall = time.time() - t0
    return {
        "config": "afiro / affine scaling / dense normal equations",
        "real_mps": real,
        "m": sf.ncons, "n": sf.nvars,
        "status": rep.status,
        "objective": rep.objective,
        "objective_known": -464.75314285714285,
        "iterations": rep.summary["iterations"],
        "wall_s": round(wall, 2),
    }


def config_dense_pdas(name):
    import jax.numpy as jnp

    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest import to_device_lp
    from cholesky_is_magic_tpu.ops import dense as dense_ops

    sf, real, known = _sf_for(name)
    lp = to_device_lp(sf, pad_multiple=128, dtype=jnp.float32)
    # r3: predictor-corrector on (the perf mode — roughly half the
    # iterations for one extra pair of triangular solves per iteration).
    rep = cim.solve(sf, "pdas", pad_multiple=128, max_iters=400,
                    mehrotra=True)
    rng = np.random.default_rng(0)
    boost = (~lp.row_mask).astype(lp.A.dtype)
    d0 = jnp.asarray(rng.random(lp.A.shape[1]) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=lp.A.shape[0]), jnp.float32)
    ms = two_k_ms(
        lambda d, g: dense_ops.solve_normal(lp.A, d, g, row_boost=boost,
                                            refine_steps=1)[0][0],
        d0, g0,
    )
    host = host_splu_ms(sf)
    row = {
        "config": f"{name} / pdas / dense factor + dd refinement",
        "real_mps": real,
        "m": sf.ncons, "n": sf.nvars,
        "status": rep.status,
        "gap": rep.summary["gap"],
        "iterations": rep.summary["iterations"],
        "iter_ms_tpu": round(ms, 4),
        "iter_ms_host_sparse": round(host, 4),
        "vs_host": round(host / ms, 2),
    }
    if known is not None:
        row["objective_known"] = known
        row["objective_rel_err"] = abs(rep.objective - known) / max(
            1.0, abs(known)
        )
    return row


def config_sparse_dd(name):
    import jax.numpy as jnp

    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    sf, real, known = _sf_for(name)
    # iterations-to-1e-8-gap through the two-phase flow (r3: mehrotra).
    t0 = time.time()
    rep = cim.solve(sf, "pdas_dd", pad_multiple=128, max_iters=400,
                    gap_tol=1e-8, mehrotra=True)
    wall = time.time() - t0
    # per-iteration factor+solve on the fully sparse at-scale path.
    import scipy.sparse as sp

    A_true = sp.csc_matrix(
        (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
    )
    eng = engine_for_sparse(A_true, block=128)
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                            (sf.ncons, sf.nvars))
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                             (sf.nvars, sf.ncons))
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.random(sf.nvars) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=sf.ncons), jnp.float32)
    ms = two_k_ms(
        lambda d, g: eng.solve_normal_ell(E, ET, d, g, refine_steps=1)[0][0],
        d0, g0,
    )
    host = host_splu_ms(sf)
    row = {
        "config": f"{name} / pdas->pdas_dd to 1e-8 gap / planned sparse factor",
        "real_mps": real,
        "m": sf.ncons, "n": sf.nvars,
        "status": rep.status,
        "gap": rep.summary["gap"],
        "iterations_to_gap": (rep.summary["phase1_iterations"]
                              + rep.summary["iterations"]),
        "finisher_iterations": rep.summary["iterations"],
        "solve_wall_s": round(wall, 2),
        "iter_ms_tpu_sparse": round(ms, 4),
        "iter_ms_host_sparse": round(host, 4),
        "vs_host": round(host / ms, 2),
    }
    if known is not None:
        row["objective_known"] = known
        row["objective_rel_err"] = abs(rep.objective - known) / max(
            1.0, abs(known)
        )
    return row


def config_alm():
    import jax.numpy as jnp

    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest.mps import read_mps_string
    from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

    # Ill-conditioned: rows spanning 2 orders of magnitude (feasible set
    # unchanged — row scaling maps b along), no equilibration applied.
    # (4 orders stalls first-order ALM in f32 entirely — measured pg 989
    # after 80 outers; the reference's f64 ALM would need rescale-sf just
    # the same.  2 orders is stressed-but-solvable.)
    ineq = random_lp(17, n_ub=48, n_eq=12, n=96, density=0.2)
    scale = 10.0 ** np.linspace(-1, 1, ineq.A_ub.shape[0])
    ineq.A_ub *= scale[:, None]
    ineq.b_ub *= scale
    sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
    from scipy.optimize import linprog

    ref = linprog(ineq.c, A_ub=ineq.A_ub, b_ub=ineq.b_ub, A_eq=ineq.A_eq,
                  b_eq=ineq.b_eq, bounds=list(zip(ineq.l, ineq.u)),
                  method="highs")
    # api.solve applies the f32 ALM tolerances (1e-4, bounded inner budget).
    rep = cim.solve(sf, "alm", pad_multiple=64, max_iters=80)
    return {
        "config": "ill-conditioned LP / ALM + APPROX matrix-free path",
        "m": sf.ncons, "n": sf.nvars,
        "value": rep.summary["value"],
        "value_highs": ref.fun,
        "rel_err": abs(rep.summary["value"] - ref.fun) / abs(ref.fun),
        "violation": rep.summary["violation"],
        "pg": rep.summary["pg"],
        "outer_iterations": rep.summary["outer_iterations"],
        "inner_iterations": rep.summary["inner_iterations"],
    }


def config_batched(n_lps=256):
    import jax
    import jax.numpy as jnp

    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest import to_device_lp
    from cholesky_is_magic_tpu.ingest.mps import read_mps_string
    from cholesky_is_magic_tpu.parallel import batched_pdas
    from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas
    from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

    states = []
    for s in range(n_lps):
        ineq = random_lp(s, n_ub=24, n_eq=8, n=48, density=0.3)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        states.append(make_pdas(to_device_lp(sf, pad_multiple=64,
                                             dtype=jnp.float32)))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    # r3: mehrotra halves the iteration tail that gates the vmapped
    # while_loop (the batch runs to its slowest member); the corrector's
    # extra solves ride the shared factorization.  r4: the inverse
    # factor/solve kernel collapses the vmapped serial trisolves into
    # batched matmuls (PDASConfig.factor_method).
    cfg = PDASConfig(max_iters=60, mehrotra=True, factor_method="inverse")
    res = batched_pdas(batched, cfg)  # compile + run
    float(res.objective[0])
    t0 = time.time()
    res = batched_pdas(batched, cfg)
    n_opt = int(np.sum(np.asarray(res.status) == 1))
    wall = time.time() - t0
    return {
        "config": f"batched sweep: {n_lps} random LPs, vmapped full pdas",
        "solves_per_sec": round(n_lps / wall, 1),
        "optimal": f"{n_opt}/{n_lps}",
        "wall_s": round(wall, 2),
    }


def main(save=False):
    import jax

    platform = jax.devices()[0].platform
    rows = []
    for fn in (
        config_afiro,
        lambda: config_dense_pdas("adlittle"),
        lambda: config_dense_pdas("sc205"),
        lambda: config_sparse_dd("25fv47"),
        lambda: config_sparse_dd("pilot"),
        config_alm,
        config_batched,
    ):
        row = fn()
        rows.append(row)
        print(json.dumps(row), flush=True)
    if save:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"results_{platform}.json")
        with open(out, "w") as f:
            json.dump({"platform": platform, "rows": rows}, f, indent=1)
        print(f"saved {out}")


if __name__ == "__main__":
    main(save="--save" in sys.argv)
