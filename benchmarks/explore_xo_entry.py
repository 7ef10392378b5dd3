"""Explore: cheapest certified at-scale solve — crossover entry sweep.

Question: phase-1 entry to crossover cycles on the dual at m >= 8192
(many misclassified columns at gap ~1e-4, single-column pivot discipline
can't finish), while phase-2 entry works but pays 10+ finisher
iterations.  Is there a cheap middle — cap the dd finisher at K
iterations (K small) so the active set sharpens to where crossover's
repair loop converges, then certify?

For each K in {0, 2, 3, 4, 6, 8}: phase 1 (mehrotra sparse pdas) ->
mu-recentered warm -> dd finisher capped at K iters -> crossover.
Report certified?, gap, repairs, and the warm wall-clock of each stage.

Run (real TPU): python -u benchmarks/explore_xo_entry.py [m]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "examples"))

from at_scale_sparse import build_lp, to_standard_form  # noqa: E402


def main(m: int = 8192):
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ops import dd as ddm
    from cholesky_is_magic_tpu.solvers import PDASConfig, pdas
    from cholesky_is_magic_tpu.solvers.crossover import (
        CrossoverConfig,
        crossover,
    )
    from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse
    from cholesky_is_magic_tpu.solvers.pdas_dd import (
        PDASDDState,
        mu_recentered_duals,
        pdas_dd,
    )

    A_ub, b_ub, A_eq, b_eq, c, l, u = build_lp(m)
    sf = to_standard_form(A_ub, b_ub, A_eq, b_eq, c, l, u)
    print(f"LP: m={sf.ncons} n={sf.nvars} nnz={len(sf.a_vals)}")

    from scipy.optimize import linprog

    t0 = time.time()
    ref = linprog(c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
                  bounds=np.stack([l, u], axis=1), method="highs")
    print(f"HiGHS (host): {ref.fun:.4f} in {time.time() - t0:.1f}s")

    st, eng = make_pdas_sparse(sf, block=128)
    cfg1 = PDASConfig(max_iters=100, refine_steps=1, mehrotra=True)
    p1 = pdas(st, cfg1, engine=eng)
    float(p1.extra["gap"])
    t0 = time.time()
    p1 = pdas(st, cfg1, engine=eng)
    float(p1.extra["gap"])  # block: async dispatch returns in ~1 ms
    t1 = time.time() - t0
    print(f"phase 1: gap {float(p1.extra['gap']):.2e} "
          f"iters {int(p1.iterations)} warm {t1 * 1e3:.0f} ms")

    w, z = mu_recentered_duals(
        p1.x, st.lp.l, st.lp.u, p1.extra["w"], p1.extra["z"], st.lp.col_mask
    )
    to_dd = lambda v: ddm.dd_from(jnp.asarray(v, jnp.float32))
    st2 = PDASDDState(x=to_dd(p1.x), y=to_dd(p1.extra["y"]), w=to_dd(w),
                      z=to_dd(z), lp=st.lp)

    # Each distinct K recompiles the finisher (~60-150 s, DEVNOTES) —
    # keep the sweep small.  CIM_XO_KS="6,9" overrides for focused runs.
    ks = tuple(int(t) for t in os.environ.get("CIM_XO_KS", "0,3,6,9").split(","))
    for K in ks:
        if K == 0:
            src, t2 = p1, 0.0
        else:
            # CIM_XO_FIN_KRYLOV: PCG refinement inside the capped
            # finisher — required past the Richardson wall (m >= 32768),
            # where plain refinement leaves the iterate diffusely
            # primal-infeasible (~2e-4/row) and the snap residual lands
            # outside range(B) no matter what crossover admits.
            cfg2 = PDASConfig(max_iters=K, gap_tol=1e-12, refine_steps=2,
                              mehrotra=True,
                              krylov_steps=int(
                                  os.environ.get("CIM_XO_FIN_KRYLOV", "0")))
            r = pdas_dd(st2, cfg2, engine=eng)
            float(r.extra["gap"])
            t0 = time.time()
            r = pdas_dd(st2, cfg2, engine=eng)
            float(r.extra["gap"])  # block: async dispatch returns in ~1 ms
            t2 = time.time() - t0
            src = r
        # Larger repair budget than the default 12: the loose-gap entry
        # widens mostly one column per pass, and the misclassified-column
        # count grows with m.  CIM_XO_KRYLOV / CIM_XO_IR probe whether a
        # stuck certificate is solve accuracy rather than classification.
        xo_cfg = CrossoverConfig(
            max_repairs=24,
            krylov_steps=int(os.environ.get("CIM_XO_KRYLOV", "6")),
            ir_steps=int(os.environ.get("CIM_XO_IR", "3")),
        )
        crossover(src, st.lp, engine=eng, config=xo_cfg)  # compile
        t0 = time.time()
        out = crossover(src, st.lp, engine=eng, config=xo_cfg)
        t3 = time.time() - t0
        cert = out.extra["crossover"]
        ob = float(out.objective)
        print(f"K={K}: entry gap {float(src.extra['gap']):.2e} "
              f"finisher {t2 * 1e3:.0f} ms | crossover "
              f"certified={cert['certified']} gap {float(cert['gap']):.2e} "
              f"primal {float(cert['primal_rel']):.2e} "
              f"dual {float(cert['dual_rel']):.2e} "
              f"repairs {cert['repairs']} {t3 * 1e3:.0f} ms | "
              f"total {(t1 + t2 + t3) * 1e3:.0f} ms "
              f"relerr {abs(ob - ref.fun) / abs(ref.fun):.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
