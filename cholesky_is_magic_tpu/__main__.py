"""Command-line driver: solve an MPS file with any of the solver families.

The reference is driven from the Lisp REPL (load the files, call
`affine-scaling` / `pdas` / `alm` by hand — SURVEY.md §1 "user REPL");
this is the batch equivalent:

    python -m cholesky_is_magic_tpu problem.mps --solver pdas
    python -m cholesky_is_magic_tpu problem.mps --solver alm --f64 --rescale
    python -m cholesky_is_magic_tpu problem.mps --report   # symbolic stats
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="cholesky_is_magic_tpu")
    ap.add_argument("mps", help="path to an MPS file")
    ap.add_argument(
        "--solver",
        choices=["affine", "pdas", "pdas_dd", "alm", "selfdual"],
        default="pdas",
        help="pdas_dd = two-phase tight-gap flow: pdas to feasibility at "
             "its 1e-4 gap, then the double-word finisher to 1e-8+",
    )
    ap.add_argument("--f64", action="store_true", help="solve in float64")
    ap.add_argument("--sparse", action="store_true",
                    help="fully sparse pipeline (ELL operands + pair-schedule "
                         "tile engine; affine/pdas/pdas_dd) — no dense A on device")
    ap.add_argument("--block", type=int, default=128,
                    help="tile width for the sparse engine")
    ap.add_argument("--rescale", action="store_true", help="row-equilibrate (rescale-sf)")
    ap.add_argument("--max-iters", type=int, default=500)
    ap.add_argument("--refine-steps", type=int, default=1)
    ap.add_argument("--pad", type=int, default=128, help="padding multiple")
    ap.add_argument("--report", action="store_true", help="print the symbolic factorization report")
    ap.add_argument("--trace", action="store_true",
                    help="print per-iteration trace lines (the reference's stdout trace)")
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest import to_device_lp

    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.f64:
        import jax

        jax.config.update("jax_enable_x64", True)

    sf = cim.to_standard_form(cim.read_mps_file(args.mps))
    if args.rescale:
        cim.rescale_sf(sf)
    lp = None if args.sparse else to_device_lp(sf, pad_multiple=args.pad, dtype=dtype)
    if args.sparse and args.solver not in ("affine", "pdas", "pdas_dd"):
        ap.error("--sparse supports --solver affine, pdas, or pdas_dd")

    if args.report:
        import scipy.sparse as sp

        from cholesky_is_magic_tpu.sparse import analyze
        from cholesky_is_magic_tpu.utils import diag

        A = sp.csc_matrix(
            (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
        )
        print(diag.factor_report(analyze(A, block=args.pad)))

    def print_trace(series: dict, iters: int) -> None:
        """The reference's per-iteration stdout lines (e.g.
        one-pdas-iteration :336-338), replayed from the recorded buffers."""
        import numpy as np

        keys = [k for k, v in series.items() if np.asarray(v).ndim == 1]
        for i in range(iters):
            cells = "  ".join(
                f"{k}={float(np.asarray(series[k])[i]):.6g}" for k in keys
            )
            print(f"iter {i:4d}  {cells}")

    t0 = time.time()
    out: dict
    if args.solver == "affine":
        from cholesky_is_magic_tpu.solvers import AffineConfig, affine_scaling, make_affine_state

        cfg = AffineConfig(max_iters=args.max_iters,
                           refine_steps=args.refine_steps,
                           record_trace=args.trace)
        if args.sparse:
            from cholesky_is_magic_tpu.solvers.affine import make_affine_state_sparse

            st, engine = make_affine_state_sparse(sf, block=args.block,
                                                  dtype=dtype)
            res = affine_scaling(st, cfg, engine=engine)
        else:
            res = affine_scaling(make_affine_state(lp), cfg)
        if args.trace:
            print_trace(res.extra["trace"], int(res.iterations))
        out = dict(status=res.status_name, objective=float(res.objective),
                   iterations=int(res.iterations), residual=float(res.residual_norm))
    elif args.solver == "pdas":
        from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas, pdas

        cfg = PDASConfig(max_iters=args.max_iters, refine_steps=args.refine_steps,
                         record_trace=args.trace)
        if args.sparse:
            from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse

            st, engine = make_pdas_sparse(sf, block=args.block, dtype=dtype)
            res = pdas(st, cfg, engine=engine)
        else:
            res = pdas(make_pdas(lp), cfg)
        if args.trace:
            print_trace(res.extra["trace"], int(res.iterations))
        out = dict(status=res.status_name, objective=float(res.objective),
                   dual_objective=float(res.extra["dual_objective"]),
                   gap=float(res.extra["gap"]), iterations=int(res.iterations),
                   residual=float(res.residual_norm))
    elif args.solver == "pdas_dd":
        from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas, pdas

        cfg1 = PDASConfig(max_iters=args.max_iters,
                          refine_steps=max(args.refine_steps, 2))
        cfg2 = PDASConfig(max_iters=args.max_iters, gap_tol=1e-9,
                          refine_steps=max(args.refine_steps, 2),
                          record_trace=args.trace)
        if args.sparse:
            import jax.numpy as _jnp

            from cholesky_is_magic_tpu.ops import dd as _ddm
            from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse
            from cholesky_is_magic_tpu.solvers.pdas_dd import (
                PDASDDState,
                mu_recentered_duals,
                pdas_dd,
            )

            st, engine = make_pdas_sparse(sf, block=args.block, dtype=dtype)
            phase1 = pdas(st, cfg1, engine=engine)
            w, z = mu_recentered_duals(
                phase1.x, st.lp.l, st.lp.u, phase1.extra["w"],
                phase1.extra["z"], st.lp.col_mask,
            )
            to_dd = lambda v: _ddm.dd_from(_jnp.asarray(v, dtype))
            st2 = PDASDDState(x=to_dd(phase1.x), y=to_dd(phase1.extra["y"]),
                              w=to_dd(w), z=to_dd(z), lp=st.lp)
            res = pdas_dd(st2, cfg2, engine=engine)
        else:
            from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd

            phase1 = pdas(make_pdas(lp), cfg1)
            res = pdas_dd(make_pdas_dd(lp, warm=phase1), cfg2)
        if args.trace:
            print_trace(res.extra["trace"], int(res.iterations))
        out = dict(status=res.status_name, objective=float(res.objective),
                   dual_objective=float(res.extra["dual_objective"]),
                   gap=float(res.extra["gap"]), iterations=int(res.iterations),
                   residual=float(res.residual_norm))
    elif args.solver == "alm":
        from cholesky_is_magic_tpu.solvers import alm, make_alm
        from cholesky_is_magic_tpu.solvers.alm import ALMConfig

        res = alm(make_alm(lp), config=ALMConfig(max_outer=args.max_iters,
                                                 record_trace=args.trace))
        if args.trace:
            print_trace(res.trace, int(res.outer_iterations))
        out = dict(value=float(res.value), violation=float(res.violation),
                   pg=float(res.pg), outer_iterations=int(res.outer_iterations),
                   inner_iterations=int(res.inner_iterations))
    else:  # selfdual
        import numpy as np

        from cholesky_is_magic_tpu.solvers.approx import approx, make_approx_selfdual

        prob = make_approx_selfdual(lp, complementarity=True, pad_multiple=args.pad)
        res = approx(prob, 1_000_000, accuracy=1e-9)
        x = np.asarray(res.x)[: lp.n]
        out = dict(objective=float(x @ np.asarray(lp.c)[: lp.n]),
                   pg=float(res.pg), iterations=int(res.iterations))
    if "objective" in out and sf.obj_sign != 1.0:
        # OBJSENSE MAX: "objective" above is the minimized standard-form
        # value (c negated); report the true maximized objective too.
        out["original_objective"] = sf.obj_sign * out["objective"]
    out["wall_seconds"] = round(time.time() - t0, 3)
    out["solver"] = args.solver

    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k:>16}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
