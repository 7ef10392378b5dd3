"""At-scale demo: a 16384-row LP solved FULLY SPARSE on one TPU chip.

Two-phase flow over the ELL pipeline (no dense (m, n) operand anywhere —
dense A alone would be 2.1 GB):

  phase 1: robust sparse pdas (repair/recenter, ELL KKT backend) to its
           1e-4 duality gap;
  phase 2: the double-word finisher from mu-recentered warm duals.

Measured on v5e (2026-08, r3 — Mehrotra corrector + bounce exit): at
m=16384, phase 1 reaches `optimal` in 15 iterations / 457 ms warm
(39/802 ms with plain steps); the Mehrotra + Krylov finisher with
bounce_exit_ratio=25 lands at gap 4.2e-8 in 11 iters / 3.97 s — 4.4 s
total (the same 4.2e-8 took 21 iters / 8.1 s before the bounce exit:
the endgame gap dips to its floor by iteration ~9 and then oscillates
decades above it, so the stall window was burning ~360 ms PCG
iterations re-confirming a floor the first bounce already proved).
Cheaper still: with Mehrotra steps the plain Richardson-2 finisher's
best-iterate DIPS to 8.6e-8 before bouncing (its *stable* floor is
still ~2e-6 — the f32 Richardson wall, docs/DEVNOTES.md), and the
bounce exit captures the dip: gap 8.6e-8 in 13 iters / 1.23 s, i.e.
**1.7 s total with no Krylov at all**.  At m=32768 the phase-2 floor
is ENTRY-dependent: phase 1's exit residual is a knife edge (jittered
starts land at ~2.5e-2; the r3-published 1.9e-7 floor rode a lucky
1.0e-3 exit — docs/DEVNOTES.md "knife edge"), so cfg2/cfg15 enable
`entry_repair_tol`: one min-norm LS repair of the entry toward Ax=b
(the reference's repair iteration, affine-scaling.lisp:226-243) makes
the finisher floor start-independent.  (The r2 plain+Krylov grind
reached 4.8e-9 in 67 iters / 23.9 s — set mehrotra=False,
bounce_exit_ratio=0 in cfg2 to trade iterations for the last decades.)  Context (two-K-difference timings, README
"Benchmarks"): the per-iteration factor+solve at m=16384 is 14.0 ms.
A NARROW-banded staircase is the host's best case — splu does it in
25 ms (only 1.8x) — but the TPU time is nearly structure-flat while
host factorization cost explodes with coupling width: at m=8192, width
256, it's 12.1 ms vs 388 ms (32x).  HiGHS (host dual simplex) solves
the m=16384 instance in ~0.7-1 s with no iterations-to-gap tradeoff;
the TPU pipeline's advantage compounds in batched/warm-started
settings (re-solves amortize the one-time symbolic analysis and the
compile — see examples/warm_resolve.py).

Run: python examples/at_scale_sparse.py [m]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_lp(m: int, seed: int = 0, width_mult: int = 1):
    """Feasible staircase LP at (m, 2m) with ~6 nnz/row + slack identity.

    ``width_mult > 1`` widens each row's column WINDOW by that factor while
    keeping the nnz/row draw unchanged — same density, longer-range
    coupling (slower information propagation for first-order methods,
    denser AAᵀ for the IPM path).  Used by examples/alm_e2e_verdict.py as
    the "wider-coupling pattern" (VERDICT r4 item 5)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    n = 2 * m
    n_eq = m // 3
    n_ub = m - n_eq

    def staircase(rows):
        width = max(6, n // max(rows, 1) + 4)
        window = min(n, width * max(int(width_mult), 1))
        ri, ci, vi = [], [], []
        for i in range(rows):
            start = int(i * max(n - window, 1) / max(rows, 1))
            k = rng.integers(3, width)
            cols = np.clip(
                start + rng.choice(window, size=min(k, window), replace=False),
                0, n - 1,
            )
            ri += [i] * len(cols)
            ci += list(cols)
            vi += list(rng.normal(size=len(cols)))
        return sp.csr_matrix((vi, (ri, ci)), shape=(rows, n))

    l = np.where(rng.random(n) < 0.7, 0.0, -1.0 - rng.random(n))
    u = l + 1.0 + 4.0 * rng.random(n)
    x0 = l + (u - l) * (0.2 + 0.6 * rng.random(n))
    A_ub = staircase(n_ub)
    b_ub = A_ub @ x0 + 0.05 + rng.random(n_ub)
    A_eq = staircase(n_eq)
    b_eq = A_eq @ x0
    c = rng.normal(size=n)
    return A_ub, b_ub, A_eq, b_eq, c, l, u


def to_standard_form(A_ub, b_ub, A_eq, b_eq, c, l, u):
    """Direct slack insertion (standard-form.lisp:48-86) on sparse data —
    the triplet-level twin of ingest.to_standard_form for LPs too large
    to round-trip through MPS text."""
    from cholesky_is_magic_tpu.ingest.standard_form import StandardForm

    n_ub, n = A_ub.shape
    n_eq = A_eq.shape[0]
    ub, eq = A_ub.tocoo(), A_eq.tocoo()
    rows = np.concatenate([ub.row, eq.row + n_ub, np.arange(n_ub)])
    cols = np.concatenate([ub.col, eq.col, n + np.arange(n_ub)])
    vals = np.concatenate([ub.data, eq.data, np.ones(n_ub)])
    return StandardForm(
        nvars=n + n_ub,
        ncons=n_ub + n_eq,
        c=np.concatenate([c, np.zeros(n_ub)]),
        a_rows=rows.astype(np.int32),
        a_cols=cols.astype(np.int32),
        a_vals=vals.astype(np.float64),
        b=np.concatenate([b_ub, b_eq]),
        row_type=np.concatenate(
            [np.full(n_ub, StandardForm.ROW_LE, np.int8),
             np.full(n_eq, StandardForm.ROW_EQ, np.int8)]
        ),
        l=np.concatenate([l, np.zeros(n_ub)]),
        u=np.concatenate([u, np.full(n_ub, np.inf)]),
        initial_vars=n,
    )


def main(m: int = 16384):
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ops import dd as ddm
    from cholesky_is_magic_tpu.solvers import PDASConfig, pdas
    from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse
    from cholesky_is_magic_tpu.solvers.pdas_dd import (
        PDASDDState,
        mu_recentered_duals,
        pdas_dd,
    )

    A_ub, b_ub, A_eq, b_eq, c, l, u = build_lp(m)
    sf = to_standard_form(A_ub, b_ub, A_eq, b_eq, c, l, u)
    print(f"LP: m={sf.ncons} n={sf.nvars} nnz={len(sf.a_vals)}")

    t0 = time.time()
    from scipy.optimize import linprog

    ref = linprog(c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
                  bounds=np.stack([l, u], axis=1), method="highs")
    print(f"HiGHS (host): {ref.fun:.4f} in {time.time() - t0:.1f}s")

    t0 = time.time()
    st, eng = make_pdas_sparse(sf, block=128)
    print(f"analyze + pair schedule: {time.time() - t0:.1f}s "
          f"(B={eng.B} NT={eng.NT} pairs={eng.n_pairs})")

    cfg1 = PDASConfig(max_iters=100, refine_steps=1, mehrotra=True)
    p1 = pdas(st, cfg1, engine=eng)
    float(p1.extra["gap"])  # compile + run
    t0 = time.time()
    p1 = pdas(st, cfg1, engine=eng)
    g1 = float(p1.extra["gap"])
    t1 = time.time() - t0
    print(f"phase 1 (sparse pdas): {p1.status_name} gap {g1:.2e} "
          f"resid {float(p1.residual_norm):.2e} "
          f"iters {int(p1.iterations)} warm {t1 * 1e3:.0f} ms")

    w, z = mu_recentered_duals(
        p1.x, st.lp.l, st.lp.u, p1.extra["w"], p1.extra["z"], st.lp.col_mask
    )
    to_dd = lambda v: ddm.dd_from(jnp.asarray(v, jnp.float32))
    st2 = PDASDDState(x=to_dd(p1.x), y=to_dd(p1.extra["y"]), w=to_dd(w),
                      z=to_dd(z), lp=st.lp)
    # krylov_steps: flexible-PCG refinement (ops.krylov) — past the
    # Richardson wall the f32-factor-preconditioned CG keeps converging;
    # measured here it moves the phase-2 floor from gap ~2e-6 to ~1e-7.
    # stall_exit_iters=12 + bounce_exit_ratio=25: the mehrotra finisher
    # reaches its floor in ~10 iterations and then oscillates decades
    # above it; the bounce exit returns the best iterate the moment the
    # oscillation proves the floor, instead of burning the stall window
    # re-confirming it (docs/DEVNOTES.md r3 "endgame oscillation").
    # Drop krylov_steps to 0 at m<=16384 for the 1.23 s / gap ~9e-8
    # operating point (module docstring).
    # entry_repair_tol: the phase-2 floor tracks the ENTRY residual and
    # phase 1's exit residual is a knife edge at m=32768 (module
    # docstring) — one min-norm repair makes the floor start-independent.
    cfg2 = PDASConfig(max_iters=100, gap_tol=1e-9, refine_steps=2,
                      krylov_steps=8, mehrotra=True, stall_exit_iters=12,
                      bounce_exit_ratio=25.0, entry_repair_tol=1e-6)
    r = pdas_dd(st2, cfg2, engine=eng)
    float(r.extra["gap"])
    t0 = time.time()
    r = pdas_dd(st2, cfg2, engine=eng)
    g2 = float(r.extra["gap"])
    t2 = time.time() - t0
    obj = float(r.objective)
    er = r.extra.get("entry_repair")
    er_s = ("" if er is None else
            f" entry_repair {float(er['pviol_before']):.1e}->"
            f"{float(er['pviol_after']):.1e}")
    print(f"phase 2 (sparse dd): {r.status_name} gap {g2:.2e} "
          f"iters {int(r.iterations)} warm {t2 * 1e3:.0f} ms{er_s}")
    print(f"objective {obj:.4f} vs HiGHS {ref.fun:.4f} "
          f"(rel err {abs(obj - ref.fun) / abs(ref.fun):.2e})")
    print(f"total warm solve: {(t1 + t2) * 1e3:.0f} ms")

    # --- Phase 3 (optional endgame shortcut): crossover.  The iterate's
    # ACTIVE SET converges decades before its values, so a handful of
    # basis factorizations certify a vertex-exact solution.  Three entry
    # points measured: from the phase-2 iterate (tightest), straight
    # from phase 1 (fails on the dual at these sizes — the documented
    # at-scale limitation), and the SWEET SPOT "phase 1.5": a finisher
    # capped at ~6 iterations (gap only ~1e-6) sharpens the active set
    # enough that crossover certifies at machine precision in a few
    # repair passes — the cheapest CERTIFIED at-scale solve
    # (benchmarks/explore_xo_entry.py for the K sweep).  Holds for
    # m <= 16384; at m=32768 NO entry depth certifies — the iterate's
    # diffuse primal infeasibility past the Richardson wall floors the
    # certificate at ~1e-4 (docs/DEVNOTES.md "Crossover entry quality").
    from cholesky_is_magic_tpu.solvers.crossover import (
        CrossoverConfig,
        crossover,
    )

    cfg15 = PDASConfig(max_iters=6, gap_tol=1e-12, refine_steps=2,
                       mehrotra=True, entry_repair_tol=1e-6)
    r15 = pdas_dd(st2, cfg15, engine=eng)
    float(r15.extra["gap"])
    t0 = time.time()
    r15 = pdas_dd(st2, cfg15, engine=eng)
    float(r15.extra["gap"])  # block: async dispatch returns in ~1 ms
    t15 = time.time() - t0
    print(f"phase 1.5 (6-iter finisher): gap {float(r15.extra['gap']):.2e} "
          f"warm {t15 * 1e3:.0f} ms")

    xo_cfg = CrossoverConfig(max_repairs=24)
    for tag, src, tin in (("phase 2", r, t1 + t2),
                          ("phase 1.5", r15, t1 + t15),
                          ("phase 1", p1, t1)):
        crossover(src, st.lp, engine=eng, config=xo_cfg)  # compile
        t0 = time.time()
        out = crossover(src, st.lp, engine=eng, config=xo_cfg)
        t3 = time.time() - t0
        cert = out.extra["crossover"]
        ob = float(out.objective)
        print(f"crossover from {tag}: certified={cert['certified']} "
              f"gap {float(cert['gap']):.2e} "
              f"primal {float(cert['primal_rel']):.2e} "
              f"dual {float(cert['dual_rel']):.2e} "
              f"repairs {cert['repairs']} warm {t3 * 1e3:.0f} ms "
              f"| total {(tin + t3) * 1e3:.0f} ms "
              f"(rel err vs HiGHS {abs(ob - ref.fun) / abs(ref.fun):.2e})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
