"""ALM end-to-end at-scale verdict: equal-wall-budget TPU f32 vs host f64.

VERDICT r4 item 5: the block-ELL inner-kernel win (0.27 ms vs host 1.8 ms
per accelerated APPROX iteration at m=16384) is real, but nobody had shown
the OUTER loop's convergence story at scale.  This script runs the full
ALM (alm-iteration2 outer + accelerated APPROX inner — the reference's
production driver, alm-approx.lisp:493-561) under a fixed wall-clock
budget, twice with matched constants:

  (a) TPU, f32, block-ELL operands  (solvers.alm.alm, chunked outer loop
      so the budget can be enforced between jitted chunks);
  (b) host, f64, scipy CSR          (the same iteration math in numpy —
      what the reference's Lisp compiles to, at full double precision).

Reported per run: the violation/pg trajectory against wall time, the
first crossing of each violation threshold (1e-3/1e-4/1e-5 — the
reference's outer stop is inf-norm violation < 1e-5 AND pg < 1e-5,
alm-approx.lisp:556-558), and the best violation within budget.  The
comparison answers the question the inner-kernel number can't: is the
at-scale ALM wall a PRECISION wall (f64 converges where f32 floors — then
dd-gradient escalation is the fix) or an ITERATION wall (f64 tracks the
same trajectory, just ~6x slower per iteration — then the TPU wins
time-to-any-reachable-tolerance and the 1e-5 target is a first-order-
method limit at this scale, not a TPU limit)?

Patterns: the staircase LP (examples/at_scale_sparse.build_lp) and a
wider-coupling variant (same nnz/row, 8x column window).

Run:  python -u examples/alm_e2e_verdict.py [m] [budget_s]
      (host-only: ALM_E2E_SKIP_TPU=1; skip host: ALM_E2E_SKIP_HOST=1;
       one pattern: ALM_E2E_PATTERNS=staircase; the fully-jitted chunked
       driver instead of the host-outer one: ALM_E2E_FULLY_JITTED=1)

Measured r5 verdict (m=16384, both patterns, raw runs in
benchmarks/ALM_E2E_r05.json; analysis in docs/DEVNOTES.md "ALM at-scale
e2e verdict"): TPU reaches every violation threshold ~1.5-2x sooner
than host f64 and floors 6-16x deeper (1.2e-8); neither backend
satisfies the pg<1e-5 dual stop in 300 s — pinned via tpu_alm2 as the
accelerated tau=n method's dual-side rate at scale, not precision.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from at_scale_sparse import build_lp, to_standard_form  # noqa: E402

THRESHOLDS = (1e-3, 1e-4, 1e-5)


def _crossings(times, viols):
    """First wall-time at which each violation threshold is crossed."""
    out = {}
    for th in THRESHOLDS:
        hit = [t for t, v in zip(times, viols) if v < th]
        out[f"t_viol<{th:g}"] = round(min(hit), 1) if hit else None
    return out


# ---------------------------------------------------------------------------
# Host twin: the same alm-iteration2 + accelerated APPROX math in f64.
# ---------------------------------------------------------------------------

def host_alm(sf, budget_s: float, inner_iters: int = 20_000,
             violation_tol: float = 1e-5, pg_tol: float = 1e-5,
             omega_floor: float = 1e-6, mu_max: float = 1e7,
             max_outer: int = 10_000) -> dict:
    """f64 scipy-CSR rendering of solvers.alm._alm_jit: identical mu
    growth (2x improvement-ratio clip), multiplier sign clamps, accuracy
    tightening schedule, 0.95-damped prox, adaptive restart."""
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.ingest.standard_form import StandardForm

    A = sp.csr_matrix((sf.a_vals, (sf.a_rows, sf.a_cols)),
                      shape=(sf.ncons, sf.nvars))
    AT = A.T.tocsr()
    A2T = A.copy()
    A2T.data = A2T.data ** 2
    A2T = A2T.T.tocsr()
    beta = np.diff(A.indptr).astype(np.float64)
    a2t_beta = A2T @ beta  # nu = mu * a2t_beta
    b, c = sf.b.astype(np.float64), sf.c.astype(np.float64)
    l = np.clip(sf.l, -1e30, 1e30)
    u = np.clip(sf.u, -1e30, 1e30)
    mult_l = np.where(sf.row_type == StandardForm.ROW_LE, 0.0, -1e30)
    mult_u = np.where(sf.row_type == StandardForm.ROW_GE, 0.0, 1e30)

    lam = np.zeros(sf.ncons)
    mu, accuracy = 10.0, np.inf
    x = np.clip(np.zeros(sf.nvars), l, u)
    times, viols, pgs, inner_total = [], [], [], 0
    t0 = time.time()
    pg = np.inf
    for outer in range(max_outer):
        omega = max(1.0 / mu, omega_floor) if outer else 1.0 / mu
        precision = min(accuracy, omega)
        c_lin = c + AT @ lam
        nu = mu * a2t_beta
        viol0 = np.linalg.norm(A @ x - b)

        def grad(v):
            return mu * (AT @ (A @ v - b)) + c_lin

        z = np.clip(x, l, u)
        xx, theta = z.copy(), 1.0
        pg = np.inf
        it = 0
        for it in range(1, inner_iters + 1):
            y = (1.0 - theta) * xx + theta * z
            gy = grad(y)
            step = theta * nu
            zp = np.clip(z - 0.95 * gy / np.where(step == 0, 1.0, step), l, u)
            x_new = y + theta * (zp - z)
            theta_new = 0.5 * (np.sqrt((theta**2 + 4.0) * theta**2) - theta**2)
            g = grad(zp)
            if g @ (zp - z) > 0:
                xx, theta = z.copy(), 1.0  # adaptive restart (:321-324)
            else:
                xx, z, theta = x_new, zp, theta_new
            pg = np.linalg.norm(z - np.clip(z - g, l, u))
            if it > 10 and pg < precision:
                break
            if it % 200 == 0 and time.time() - t0 > budget_s:
                break
        inner_total += it
        x = z
        viol = A @ x - b
        v = float(np.max(np.abs(viol)))
        v2 = np.linalg.norm(viol)
        improvement = v2 / max(viol0, np.finfo(np.float64).tiny)
        lam = np.clip(lam + mu * viol, mult_l, mult_u)
        if outer > 0:
            mu = min(mu * max(1.0, min(2.0 * improvement, 2.0)), mu_max)
        accuracy = min(accuracy, max(violation_tol, v))
        if v < violation_tol:
            accuracy = violation_tol
        times.append(time.time() - t0)
        viols.append(v)
        pgs.append(float(pg))
        if outer % 20 == 0:
            print(f"host: outer={outer} viol={v:.2e} pg={pg:.2e} "
                  f"t={times[-1]:.0f}s", flush=True)
        if (v < violation_tol and pg < pg_tol) or times[-1] > budget_s:
            break
    return {
        "backend": "host f64 (scipy CSR)",
        "outer": len(times), "inner": inner_total,
        "best_violation": float(f"{min(viols):.3g}"),
        "final_pg": float(f"{pgs[-1]:.3g}"),
        "wall_s": round(times[-1], 1),
        "converged": bool(viols[-1] < violation_tol and pgs[-1] < pg_tol),
        **_crossings(times, viols),
        "times": [round(t, 1) for t in times],
        "viols": [float(f"{v:.3g}") for v in viols],
    }


# ---------------------------------------------------------------------------
# TPU run: chunked jitted outer loop so the wall budget binds between chunks.
# ---------------------------------------------------------------------------

def tpu_alm(sf, budget_s: float, inner_iters: int = 20_000,
            violation_tol: float = 1e-5, pg_tol: float = 1e-5,
            omega_floor: float = 1e-6, chunk: int = 4,
            max_outer: int = 10_000, dd_escalate: bool = True,
            f32_frac: float = 0.5) -> dict:
    """Two-phase budgeted run: f32 chunks until convergence / stall /
    ``f32_frac`` of the budget, then double-word chunks
    (ALMConfig.dd_gradient — the f32 pg wall is mu·||A||²·ulp(z)-shaped,
    so only dd iterates can satisfy the reference's 1e-5 outer stop) for
    the remainder.  Both phases share one wall clock."""
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ingest.device import to_sparse_lp
    from cholesky_is_magic_tpu.solvers import alm, make_alm
    from cholesky_is_magic_tpu.solvers.alm import ALMConfig

    lp = to_sparse_lp(sf, dtype=jnp.float32)
    cfg_f32 = ALMConfig(max_outer=chunk,
                        inner_iters=min(inner_iters, 12_000),
                        violation_tol=violation_tol, pg_tol=pg_tol,
                        omega_floor=omega_floor, record_trace=True)
    # dd chunks: TWO outer steps with a bounded inner budget per dispatch.
    # (a) A 4-outer x 20k-inner dd chunk is a single ~80 s device program,
    # and this pool KILLS long dispatches (observed twice on-chip: the
    # first timed dd chunk dies with "TPU worker process crashed", while
    # 10 s-class f32 chunks and the short dd warm-up run fine) — 2 x 4k
    # keeps each dispatch ~10 s.  (b) max_outer must be >= 2: _alm_jit's
    # mu growth is gated on has_x = (i > 0), so a 1-outer chunk NEVER
    # grows mu and the run pins omega = 1/mu — measured on-chip: 1018
    # one-outer dd chunks all exiting at pg ~ 1/mu = 1e-2, viol frozen at
    # 2.2e-5.  The host-side growth fallback below covers the remaining
    # chunk-boundary loss (each chunk's FIRST outer is still growth-free).
    cfg_dd = dataclasses.replace(cfg_f32, dd_gradient=True, max_outer=2,
                                 inner_iters=min(inner_iters, 4_000),
                                 omega_floor=min(omega_floor, 1e-7))

    def run_chunk(cfg, mu, lam, x0):
        st = make_alm(lp, mu=mu, multipliers=lam)
        # Restore the omega floor a fresh make_alm would lose at large mu
        # (alm._iteration2 maintains it across outer steps).
        st = dataclasses.replace(
            st, omega=jnp.maximum(st.omega, jnp.asarray(cfg.omega_floor,
                                                        st.omega.dtype)))
        return alm(st, x0=x0, config=cfg)

    print("tpu: operands on device; compiling + warm-up chunks ...",
          flush=True)
    lam0 = jnp.zeros((lp.m,), jnp.float32)
    x00 = jnp.zeros((lp.n,), jnp.float32)
    for cfg in (cfg_f32, cfg_dd) if dd_escalate else (cfg_f32,):
        t0 = time.time()
        float(run_chunk(cfg, 10.0, lam0, x00).violation)  # compile (cached)
        print(f"tpu: warm-up ({'dd' if cfg.dd_gradient else 'f32'}) "
              f"{time.time() - t0:.0f}s", flush=True)

    times, viols, pgs, phases = [], [], [], []
    mu, lam, x = 10.0, lam0, x00
    inner_total, outer_total, value = 0, 0, np.nan
    phase = "f32"
    crashed = False
    t0 = time.time()
    while outer_total < max_outer:
        cfg = cfg_dd if phase == "dd" else cfg_f32
        try:
            res = run_chunk(cfg, mu, lam, x)
            k = int(res.outer_iterations)  # first fetch: forces execution
        except Exception as e:  # TPU worker crash mid-run: keep partials
            print(f"tpu: chunk failed ({type(e).__name__}); "
                  "returning best-so-far", flush=True)
            crashed = True
            break
        now = time.time() - t0
        # Per-step walls inside a chunk aren't observable from the host;
        # stamp each step with the chunk-end time (conservative).
        times += [now] * k
        viols += [float(v) for v in np.asarray(res.trace["violation"][:k])]
        pgs += [float(p) for p in np.asarray(res.trace["pg"][:k])]
        phases += [phase] * k
        inner_total += int(res.inner_iterations)
        outer_total += k
        mu_in = mu
        mu, lam, x = float(res.mu), res.multipliers, res.x
        value = float(res.value)
        v, pg = float(res.violation), float(res.pg)
        if (phase == "dd" and mu == mu_in and len(viols) > k
                and v > 0.8 * viols[-1 - k]):
            # Host-side LANCELOT growth across chunk boundaries: the
            # in-jit rule skips each chunk's first outer (has_x gate),
            # so a chunk that neither grew mu nor improved the violation
            # >=20% gets the reference's poor-improvement doubling here
            # (alm-approx.lisp:522-529 semantics).
            mu = min(mu * 2.0, 1e6)
        print(f"tpu: {phase} outer={outer_total} viol={v:.2e} "
              f"pg={pg:.2e} mu={mu:.3g} t={now:.0f}s", flush=True)
        if (v < violation_tol and pg < pg_tol) or now > budget_s or k == 0:
            break
        if phase == "f32" and dd_escalate:
            # Escalate on stall (pg improved <20% over the chunk) or at
            # the f32 share of the budget.  On escalation, RESET mu: the
            # f32 phase inflates mu toward mu_max because its precision
            # floor fakes "no improvement" to the growth rule, and at
            # mu~1e7 the accelerated inner method needs ~L/k^2 iterations
            # per digit — measured pg floor 1.3e-2 with inherited mu vs
            # full convergence with mu=100 (tests/test_solvers.py::
            # TestALMDD).  The multipliers carry the progress; mu only
            # needs to be large enough for the dd phase's own schedule.
            stalled = (len(pgs) > 2 * chunk
                       and pgs[-1] > 0.8 * pgs[-1 - chunk])
            if stalled or now > f32_frac * budget_s:
                phase = "dd"
                mu = min(mu, 100.0)
    if not times:
        return {"backend": "tpu (crashed before first chunk)",
                "worker_crash": True}
    return {
        "backend": "tpu f32+dd (block-ELL)" if "dd" in phases
        else "tpu f32 (block-ELL)",
        "worker_crash": crashed,
        "outer": outer_total, "inner": inner_total,
        "dd_outer": int(sum(p == "dd" for p in phases)),
        "best_violation": float(f"{min(viols):.3g}"),
        "final_pg": float(f"{pgs[-1]:.3g}"),
        "value": float(f"{value:.6g}"),
        "wall_s": round(times[-1], 1),
        "converged": bool(viols[-1] < violation_tol and pgs[-1] < pg_tol),
        **_crossings(times, viols),
        "times": [round(t, 1) for t in times],
        "viols": [float(f"{v:.3g}") for v in viols],
        "pgs": [float(f"{v:.3g}") for v in pgs],
    }


def tpu_alm2(sf, budget_s: float, inner_iters: int = 20_000,
             violation_tol: float = 1e-5, pg_tol: float = 1e-5,
             omega_floor: float = 1e-6, chunk: int = 4,
             max_outer: int = 10_000, f32_frac: float = 0.2,
             inner_chunk: int = 4_000) -> dict:
    """Host-outer / device-inner rendering: EXACTLY host_alm's outer loop
    (same mu schedule, accuracy tightening, multiplier clamps) with the
    dd inner solver run on-device in dispatch-bounded chunks.

    Why this exists: tpu_alm's fully-jitted chunks hit two walls at once
    — the pool kills ~80 s dispatches, and capping the inner budget per
    outer step to stay under that truncates the accelerated subproblem
    solves (measured: viol converges to 1.2e-8 but pg floors at 9.3e-3,
    /tmp r5 runs).  Chaining _approx_dd from its own z is
    iteration-exact continuation apart from the theta/restart reset at
    chunk seams (the same reset the adaptive-restart rule performs), so
    the host outer loop can give each subproblem the reference's full
    inner budget (up to 1e6 in alm-approx.lisp:503; 20k here, matching
    host_alm) in ~5 s dispatches.  An f32 chunked head start (cheap
    inner iterations) runs the violation down to ~1e-3-class first."""
    import functools

    import jax
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ingest.device import to_sparse_lp
    from cholesky_is_magic_tpu.ops import dd as ddm
    from cholesky_is_magic_tpu.solvers import alm, make_alm
    from cholesky_is_magic_tpu.solvers.alm import (
        ALMConfig,
        make_alm_subproblem,
    )
    from cholesky_is_magic_tpu.solvers.approx import _approx_dd
    from cholesky_is_magic_tpu.utils.precision import highest_precision

    lp = to_sparse_lp(sf, dtype=jnp.float32)

    @highest_precision
    @jax.jit
    def polish(lp_, prob, lam_, mu_, x_dd, acc, iters):
        z, pg, it, r_z = _approx_dd(lp_, prob, lam_, mu_, x_dd, acc, iters)
        viol = jnp.where(prob.s != 0, r_z.hi + r_z.lo, 0.0)
        return (z, pg, it, viol, jnp.max(jnp.abs(viol)),
                jnp.linalg.norm(viol))

    # --- f32 head start (chunked, as in tpu_alm). ---
    cfg_f32 = ALMConfig(max_outer=chunk,
                        inner_iters=min(inner_iters, 12_000),
                        violation_tol=violation_tol, pg_tol=pg_tol,
                        omega_floor=omega_floor, record_trace=True)

    def run_chunk(mu, lam, x0):
        st = make_alm(lp, mu=mu, multipliers=lam)
        st = dataclasses.replace(
            st, omega=jnp.maximum(st.omega, jnp.asarray(cfg_f32.omega_floor,
                                                        st.omega.dtype)))
        return alm(st, x0=x0, config=cfg_f32)

    print("tpu2: operands on device; compiling + warm-up ...", flush=True)
    lam0 = jnp.zeros((lp.m,), jnp.float32)
    x00 = jnp.zeros((lp.n,), jnp.float32)
    t0c = time.time()
    float(run_chunk(10.0, lam0, x00).violation)
    st0 = make_alm(lp, mu=10.0)
    prob0 = make_alm_subproblem(lp, lam0, jnp.asarray(100.0, jnp.float32))
    _ = polish(lp, prob0, lam0, 100.0, ddm.dd_from(x00), 1e-5, inner_chunk)
    float(_[1])
    print(f"tpu2: warm-up {time.time() - t0c:.0f}s", flush=True)

    times, viols, pgs, phases = [], [], [], []
    mu, lam, x = 10.0, lam0, x00
    inner_total, outer_total = 0, 0
    t0 = time.time()
    while True:
        res = run_chunk(mu, lam, x)
        k = int(res.outer_iterations)
        now = time.time() - t0
        times += [now] * k
        viols += [float(v) for v in np.asarray(res.trace["violation"][:k])]
        pgs += [float(p) for p in np.asarray(res.trace["pg"][:k])]
        phases += ["f32"] * k
        inner_total += int(res.inner_iterations)
        outer_total += k
        mu, lam, x = float(res.mu), res.multipliers, res.x
        v, pg = float(res.violation), float(res.pg)
        print(f"tpu2: f32 outer={outer_total} viol={v:.2e} pg={pg:.2e} "
              f"t={now:.0f}s", flush=True)
        stalled = (len(pgs) > 2 * chunk and pgs[-1] > 0.8 * pgs[-1 - chunk])
        if k == 0 or stalled or now > f32_frac * budget_s:
            break

    # --- host outer loop, dd inner chunks (host_alm semantics). ---
    ml, mub = st0.mult_l, st0.mult_u
    mu = min(mu, 100.0)  # same reset rationale as tpu_alm (f32-inflated mu)
    x_dd = ddm.dd_from(jnp.asarray(x))
    accuracy, v2_prev = np.inf, None
    tiny = float(np.finfo(np.float64).tiny)
    v, pg = np.inf, np.inf
    for outer in range(max_outer):
        omega = max(1.0 / mu, omega_floor) if outer else 1.0 / mu
        precision = min(accuracy, omega)
        prob = make_alm_subproblem(lp, lam, jnp.asarray(mu, jnp.float32))
        it_outer = 0
        while it_outer < inner_iters:
            z, pg_a, it, viol, v_a, v2_a = polish(
                lp, prob, lam, mu, x_dd, precision, inner_chunk)
            x_dd = z
            it_chunk = int(it)  # fetch: forces execution
            it_outer += it_chunk
            pg = float(pg_a)
            if pg < precision or it_chunk < inner_chunk:
                break
            if time.time() - t0 > budget_s:
                break
        inner_total += it_outer
        outer_total += 1
        v, v2 = float(v_a), float(v2_a)
        improvement = v2 / max(v2_prev, tiny) if v2_prev is not None else 1.0
        lam = jnp.clip(lam + mu * viol, ml, mub)
        if outer > 0:
            mu = min(mu * max(1.0, min(2.0 * improvement, 2.0)), 1e7)
        v2_prev = v2
        accuracy = min(accuracy, max(violation_tol, v))
        if v < violation_tol:
            accuracy = violation_tol
        now = time.time() - t0
        times.append(now)
        viols.append(v)
        pgs.append(pg)
        phases.append("dd")
        print(f"tpu2: dd outer={outer_total} viol={v:.2e} pg={pg:.2e} "
              f"mu={mu:.3g} inner={it_outer} t={now:.0f}s", flush=True)
        if (v < violation_tol and pg < pg_tol) or now > budget_s:
            break
    return {
        "backend": "tpu f32+dd host-outer (block-ELL)",
        "outer": outer_total, "inner": inner_total,
        "dd_outer": int(sum(p == "dd" for p in phases)),
        "best_violation": float(f"{min(viols):.3g}"),
        "final_pg": float(f"{pgs[-1]:.3g}"),
        "wall_s": round(times[-1], 1),
        "converged": bool(viols[-1] < violation_tol and pgs[-1] < pg_tol),
        **_crossings(times, viols),
        "times": [round(t, 1) for t in times],
        "viols": [float(f"{v:.3g}") for v in viols],
        "pgs": [float(f"{v:.3g}") for v in pgs],
    }


def main(m: int = 16384, budget_s: float = 300.0):
    only = os.environ.get("ALM_E2E_PATTERNS", "")
    for label, kwargs in (("staircase", {}),
                          ("wide-coupling x8", {"width_mult": 8})):
        if only and only not in label:
            continue
        sf = to_standard_form(*build_lp(m, **kwargs))
        print(f"\n=== {label}: m={sf.ncons} n={sf.nvars} "
              f"nnz={len(sf.a_vals)} budget={budget_s:.0f}s ===")
        if not os.environ.get("ALM_E2E_SKIP_TPU"):
            fn = tpu_alm if os.environ.get("ALM_E2E_FULLY_JITTED") else tpu_alm2
            r = fn(sf, budget_s)
            print(json.dumps(r))
        if not os.environ.get("ALM_E2E_SKIP_HOST"):
            r = host_alm(sf, budget_s)
            print(json.dumps(r))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384,
         float(sys.argv[2]) if len(sys.argv) > 2 else 300.0)
