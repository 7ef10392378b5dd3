"""Where does the heterogeneous-batch ~1.1 ms/solve go? (VERDICT r4 item 6)

bench.py's hetero row times `cim.solve_batch(problems, ...)` end-to-end:
256 mixed LPs -> 927 solves/s warm (r4 driver) = ~276 ms per call.  The
inverse-factor kernel (r4) already took the device solve 3.2x; this
profiler decomposes the REMAINING wall into the pipeline phases so the
floor is attributable:

  A. host build      to_device_lp x256 (numpy embed into the padded box)
  B. stack+ship      np.stack per leaf + one transfer + vmapped make_pdas
  C. device solve    batched_pdas (the vmapped while_loop; scalar-fetch
                     timed, two-K on the iteration for the pure-compute
                     share)
  D. fetch           jax.device_get of the full batched result
  E. postsolve       per-report slicing, extract_solution, gap_bound

Phases A/B/E are host+tunnel work that no kernel can remove — if they own
the floor, the honest fix is amortization (reuse the embedded batch across
re-solves: `solve_batch(warm=...)` skips nothing today because the API
re-embeds every call), not faster kernels.

Run on the TPU: python -u benchmarks/profile_hetero.py [n_lps]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

REPS = 3


def build_problems(n_lps=256):
    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest.mps import read_mps_string
    from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

    problems = []
    for s in range(n_lps):
        if s % 8 == 7:  # bench.py's straggler mix, verbatim
            ineq = random_lp(1000 + s, n_ub=48, n_eq=16, n=96, density=0.3)
        else:
            ineq = random_lp(s, n_ub=16 + (s % 3) * 8, n_eq=4 + s % 5,
                             n=32 + (s % 4) * 16, density=0.3)
        problems.append(cim.to_standard_form(read_mps_string(write_mps(ineq))))
    return problems


def main(n_lps=256):
    import jax
    import jax.numpy as jnp

    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest import to_device_lp
    from cholesky_is_magic_tpu.ingest.device import round_up
    from cholesky_is_magic_tpu.parallel import batched_pdas
    from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas

    sfs = build_problems(n_lps)
    M = round_up(max(sf.ncons for sf in sfs), 64)
    N = round_up(max(sf.nvars for sf in sfs), 64)
    cfg = PDASConfig(max_iters=60, mehrotra=True, factor_method="inverse")

    # End-to-end reference number (the bench row's timed region).
    cim.solve_batch(sfs, max_iters=60, mehrotra=True)  # compile
    t0 = time.time()
    reps_out = cim.solve_batch(sfs, max_iters=60, mehrotra=True)
    t_e2e = time.time() - t0
    n_opt = sum(1 for r in reps_out if r.status == "optimal")
    print(json.dumps({"e2e_s": round(t_e2e, 3),
                      "solves_per_s": round(n_lps / t_e2e, 1),
                      "optimal": f"{n_opt}/{n_lps}", "box": [M, N]}))

    out = {}
    for rep in range(REPS):
        # A. host build.
        t0 = time.time()
        lps = [dataclasses.replace(
            to_device_lp(sf, dtype=jnp.float32, shape=(M, N), as_numpy=True),
            m=M, n=N) for sf in sfs]
        tA = time.time() - t0
        # B. stack + ship + vmapped make_pdas (sync via a scalar fetch).
        t0 = time.time()
        stacked_lp = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *lps)
        batched = jax.vmap(lambda lp: make_pdas(lp, cfg))(stacked_lp)
        float(batched.x[0, 0])
        tB = time.time() - t0
        # C. device solve (scalar fetch waits for completion).
        t0 = time.time()
        res = batched_pdas(batched, cfg)
        float(res.objective[0])
        tC = time.time() - t0
        # D. one device_get of the full result.
        t0 = time.time()
        res_h = jax.device_get(res)
        tD = time.time() - t0
        # E. postsolve: per-report slicing + solution extraction, as
        # api.solve_batch does it.
        from cholesky_is_magic_tpu.api import _postsolve_batch_reports
        t0 = time.time()
        reports = _postsolve_batch_reports(sfs, res_h, "inverse")
        tE = time.time() - t0
        assert len(reports) == n_lps
        row = {"A_host_build_s": round(tA, 3), "B_stack_ship_s": round(tB, 3),
               "C_device_solve_s": round(tC, 3), "D_fetch_s": round(tD, 3),
               "E_postsolve_s": round(tE, 3),
               "sum_s": round(tA + tB + tC + tD + tE, 3)}
        print(json.dumps(row))
        out = row

    # Per-iteration device cost of C: time the call at max_iters=K and
    # 2K (gap_tol=0 keeps every lane running) — the difference isolates
    # the per-iteration cost from the call's fixed dispatch+fetch.
    def timed_C(iters):
        cfgk = PDASConfig(max_iters=iters, mehrotra=True,
                          factor_method="inverse", gap_tol=0.0)
        r = batched_pdas(batched, cfgk)
        float(r.objective[0])  # compile
        best = np.inf
        for _ in range(REPS):
            t0 = time.time()
            r = batched_pdas(batched, cfgk)
            float(r.objective[0])
            best = min(best, time.time() - t0)
        return best

    tK, t2K = timed_C(16), timed_C(32)
    out["iter_ms_batched"] = round((t2K - tK) / 16 * 1000, 3)
    out["fixed_call_s"] = round(tK - (t2K - tK), 3)
    print(json.dumps(out))

    # The amortized path: solve_batch over a pre-embedded batch
    # (api.embed_batch) skips phases A+B per call.
    from cholesky_is_magic_tpu.api import embed_batch

    emb = embed_batch(sfs)
    cim.solve_batch(emb, max_iters=60, mehrotra=True)  # compile (cached)
    best = np.inf
    for _ in range(REPS):
        t0 = time.time()
        reps2 = cim.solve_batch(emb, max_iters=60, mehrotra=True)
        best = min(best, time.time() - t0)
    n_opt2 = sum(1 for r in reps2 if r.status == "optimal")
    print(json.dumps({"embed_cached_e2e_s": round(best, 3),
                      "embed_cached_solves_per_s": round(n_lps / best, 1),
                      "optimal": f"{n_opt2}/{n_lps}"}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
