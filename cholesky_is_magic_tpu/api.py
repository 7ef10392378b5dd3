"""One-call library front door: ``solve(problem) -> SolveReport``.

The reference is driven interactively — load the files, call
``affine-scaling`` / ``pdas`` / ``alm`` by hand on a ``standard-form``
(SURVEY.md §1 "user REPL").  This module is the programmatic equivalent for
library users; ``__main__`` is the same dispatch behind a command line.

``solve`` accepts an MPS path, an :class:`~cholesky_is_magic_tpu.MPSData`,
or a :class:`~cholesky_is_magic_tpu.StandardForm`, runs the chosen solver
family, and returns a :class:`SolveReport` carrying

- ``summary`` — the solver-family-specific scalar metrics (objective, gap,
  iterations, ...);
- ``result`` — the raw solver result (``SolveResult`` / ``ALMResult`` /
  ``ApproxResult``) with every diagnostic the solver recorded;
- ``solution`` — the standard-form solution split back into the original
  MPS variables and slacks (``ingest.extract_solution``), with the
  original-sense objective.

Solver names match the reference's drivers: ``affine``
(affine-scaling.lisp:265), ``pdas`` (primal-dual-affine-scaling.lisp:385),
``pdas_dd`` (the two-phase tight-gap flow: pdas to its native 1e-4 gap,
then the double-word finisher), ``alm`` (alm-approx.lisp:539), ``aalm``
(Nesterov-extrapolated ALM, :579), and ``selfdual`` (approx.lisp:195's
self-dual APPROX form).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Union


@dataclasses.dataclass
class SolveReport:
    """What :func:`solve` returns."""

    solver: str
    status: str
    objective: float  # original-sense objective (obj_sign applied)
    summary: dict  # solver-family scalar metrics (the CLI's output dict)
    result: Any  # raw solver result object
    sf: Any  # the StandardForm that was solved
    solution: dict  # extract_solution(sf, result.x): x, slacks, objective


@dataclasses.dataclass
class BatchEmbed:
    """A device-resident embedded LP batch: build once, solve many.

    ``embed_batch(problems)`` pays the host embed (to_device_lp x B) and
    the one stacked host->device transfer ONCE; every subsequent
    ``solve_batch(embed, ...)`` call skips both phases and goes straight
    to the vmapped solve.  This is the serving-loop shape (re-solve the
    same fleet against new iterates/configs — examples/warm_resolve.py):
    benchmarks/profile_hetero.py measures what fraction of the
    end-to-end hetero wall the embed+ship phases own.
    """

    sfs: list  # the StandardForms, for postsolve
    stacked_lp: Any  # stacked DeviceLP pytree (one device array per leaf)
    pad_multiple: int
    dtype: Any


def embed_batch(problems, *, pad_multiple: int = 64, dtype=None,
                rescale: bool = False) -> BatchEmbed:
    """Embed heterogeneous LPs into one padded device-resident batch
    (the build+ship phases of :func:`solve_batch`, factored out so the
    cost amortizes across repeated solves)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cholesky_is_magic_tpu.ingest import to_device_lp
    from cholesky_is_magic_tpu.ingest.device import round_up

    if dtype is None:
        dtype = jnp.float32
    sfs = [_to_standard_form(p, rescale) for p in problems]
    if not sfs:
        return BatchEmbed([], None, pad_multiple, dtype)
    M = round_up(max(sf.ncons for sf in sfs), pad_multiple)
    N = round_up(max(sf.nvars for sf in sfs), pad_multiple)
    lps = [
        dataclasses.replace(
            to_device_lp(sf, dtype=dtype, shape=(M, N), as_numpy=True),
            m=M, n=N,
        )
        for sf in sfs
    ]
    stacked_lp = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *lps)
    return BatchEmbed(sfs, stacked_lp, pad_multiple, dtype)


def solve_batch(
    problems,
    *,
    pad_multiple: int = 64,
    dtype=None,
    rescale: bool = False,
    max_iters: int = 500,
    refine_steps: int = 1,
    gap_tol=None,
    mesh=None,
    mehrotra: bool = False,
    slab_iters: int = 0,
    warm: Optional[list] = None,
    warm_push: float = 0.0,
    warm_blend: float = 0.0,
    factor_method: str = "inverse",
) -> list:
    """Solve a batch of (possibly heterogeneous) LPs as ONE vmapped pdas
    computation — the dp serving mode at the front door.

    Every problem is embedded into a common padded (M, N) box (the batch
    maxima rounded up to ``pad_multiple``); per-problem masks keep the
    padding inert, so one compiled program serves the whole batch, and
    with ``mesh`` the batch dimension shards over the 'dp' axis with zero
    cross-chip communication (parallel.batched_pdas).  Returns one
    :class:`SolveReport` per problem (``result`` holds the per-problem
    slice of the batched SolveResult).

    ``slab_iters`` > 0 switches to the straggler-free slab driver
    (parallel.batched_pdas_slabbed): the vmapped loop runs that many
    iterations per slab and converged LPs are compacted out between
    slabs, so a few hard (or non-converging) members no longer drag the
    whole batch to max_iters.  ~16 is a good slab for mixed batches.

    ``warm``: the report list from a PREVIOUS solve_batch over the same
    problem list (same padded box) — each lane restarts from its prior
    (x, y, w, z), the batch analog of ``solve(warm=...)``.  For
    perturbed re-solves combine with ``warm_blend`` (blend toward the
    cold init) and/or ``warm_push`` (re-open slacks by an absolute
    margin) exactly as in solve(); the recommended drift recipe is
    ``warm_blend=0.2, mehrotra=True`` (examples/warm_resolve.py).

    ``factor_method`` defaults to "inverse" here (and ONLY here): the
    vmapped dense kernel — blocked Cholesky + one explicit triangular
    inverse per iteration, solves as matvec pairs — because under vmap
    the per-rhs serial triangular solves are the dominant batched
    iteration cost (PDASConfig.factor_method has the measurements).
    Pass "direct" to get the single-LP kernel for comparison.

    ``problems`` may also be a :class:`BatchEmbed` from
    :func:`embed_batch`: the host embed and the stacked host->device
    transfer are then skipped entirely (paid once at embed time) — the
    serving-loop shape for repeated solves over the same fleet.

    pdas only: the other families either need per-problem symbolic
    analysis (sparse engines) or consume true-count metadata that cannot
    vary across a stacked batch (affine/approx) — solve() covers those
    one at a time.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cholesky_is_magic_tpu.parallel import batched_pdas, shard_batched_pdas
    from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas

    if dtype is None:
        dtype = jnp.float32
    if isinstance(problems, BatchEmbed):
        # Pre-embedded batch: the host build + stacked transfer were paid
        # once in embed_batch; pad_multiple/dtype/rescale args are
        # ignored in favor of the handle's.
        sfs, stacked_lp = problems.sfs, problems.stacked_lp
        dtype = problems.dtype
    else:
        # Build everything host-side (as_numpy), stack once, ship ONE
        # array per leaf: per-problem eager jnp construction paid a
        # tunnel transfer + dispatch per LP (measured ~3 s of a 7.5 s
        # warm 256-LP batch).  Metadata must be identical across the
        # batch to stack the pytrees; the pdas loop never reads it
        # (masks carry the true structure).
        emb = embed_batch(problems, pad_multiple=pad_multiple, dtype=dtype,
                          rescale=rescale)
        sfs, stacked_lp = emb.sfs, emb.stacked_lp
    if not sfs:
        return []
    kw = {} if gap_tol is None else {"gap_tol": gap_tol}
    # factor_method="inverse" is the vmapped-mode dense kernel (blocked
    # Cholesky + explicit triangular inverse): under vmap the per-rhs
    # serial triangular solves dominate the batched iteration — see
    # PDASConfig.factor_method.  Callers can force "direct" to compare.
    cfg = PDASConfig(max_iters=max_iters, refine_steps=refine_steps,
                     mehrotra=mehrotra, factor_method=factor_method, **kw)
    batched = jax.vmap(lambda lp: make_pdas(lp, cfg))(stacked_lp)
    if warm is not None:
        from cholesky_is_magic_tpu.solvers.affine import _into_interior
        from cholesky_is_magic_tpu.solvers.pdas import push_interior

        if len(warm) != len(sfs):
            raise ValueError(
                f"warm has {len(warm)} reports for {len(sfs)} problems"
            )
        # Stack host-side (one transfer, like the LP build above).
        wx = jnp.asarray(np.stack([np.asarray(r.result.x) for r in warm]),
                         dtype)
        stack_e = lambda k: jnp.asarray(
            np.stack([np.asarray(r.result.extra[k]) for r in warm]), dtype
        )
        wy = stack_e("y")
        if wx.shape != batched.x.shape or wy.shape != batched.y.shape:
            raise ValueError(
                "warm reports come from a different padded box "
                f"(x {wx.shape} vs {batched.x.shape}, y {wy.shape} vs "
                f"{batched.y.shape}); re-solve cold or use the same "
                "problem list and pad_multiple"
            )
        ww = jnp.maximum(stack_e("w"), 1e-8)
        wz = jnp.maximum(stack_e("z"), 1e-8)
        lpb = batched.lp
        if warm_blend > 0.0:
            bl = warm_blend
            wx = (1 - bl) * wx + bl * batched.x
            wy = (1 - bl) * wy + bl * batched.y
            ww = jnp.maximum((1 - bl) * ww + bl * batched.w, 1e-8)
            wz = jnp.maximum((1 - bl) * wz + bl * batched.z, 1e-8)
        if warm_push > 0.0:
            wx = push_interior(wx, lpb.l, lpb.u, lpb.col_mask, warm_push)
        wx = _into_interior(wx, lpb.l, lpb.u, lpb.col_mask)
        batched = dataclasses.replace(batched, x=wx, y=wy, w=ww, z=wz)
    if slab_iters > 0:
        from cholesky_is_magic_tpu.parallel import batched_pdas_slabbed

        res = batched_pdas_slabbed(batched, cfg, slab_iters=slab_iters,
                                   mesh=mesh)
    else:
        if mesh is not None:
            batched = shard_batched_pdas(batched, mesh)
        res = batched_pdas(batched, cfg)
    # ONE transfer for the whole batch: per-report scalar fetches pay the
    # ~25 ms tunnel round trip each — measured 50 s of fetches for a
    # 256-LP batch vs 0.07 s for this device_get.
    res = jax.device_get(res)
    return _postsolve_batch_reports(sfs, res, factor_method)


def _postsolve_batch_reports(sfs, res, factor_method: str) -> list:
    """Slice a host-fetched batched SolveResult into per-problem
    SolveReports (summary, solution split, duals) — the postsolve phase
    of solve_batch, separated so benchmarks/profile_hetero.py can time
    it as a pipeline stage."""
    import jax
    import numpy as np

    from cholesky_is_magic_tpu.ingest.standard_form import extract_solution
    from cholesky_is_magic_tpu.solvers.result import Status

    reports = []
    for i, sf in enumerate(sfs):
        one = jax.tree.map(lambda a: a[i], res)
        status = Status.NAMES.get(int(one.status), "?")
        summary = dict(
            status=status, objective=float(one.objective),
            dual_objective=float(one.extra["dual_objective"]),
            gap=float(one.extra["gap"]), iterations=int(one.iterations),
            residual=float(one.residual_norm),
            # Surface the dense-kernel choice: "inverse" trades ~one digit
            # of raw solve accuracy at high kappa(N) for vmapped speed
            # (recovered by refine_steps) — make regressions on
            # ill-conditioned batches attributable (ADVICE r4).
            factor_method=factor_method,
            gap_bound=_feasibility_gap_bound(
                sf, one.x, one.extra["y"], float(one.extra["gap"]),
                float(one.objective),
            ),
        )
        solution = extract_solution(sf, one.x)
        # Row duals in the original row space (see solve()'s _duals).
        norm = np.zeros(sf.ncons)
        np.maximum.at(norm, sf.a_rows, np.abs(sf.a_vals))
        s = np.where(norm < 1e-6, 1.0, 1.0 / np.where(norm == 0, 1.0, norm))
        solution["y"] = np.asarray(one.extra["y"])[: sf.ncons] * s
        solution["reduced_costs"] = np.asarray(
            one.extra["z"] - one.extra["w"]
        )[: sf.nvars]
        reports.append(SolveReport(
            solver="pdas", status=status, objective=solution["objective"],
            summary=summary, result=one, sf=sf, solution=solution,
        ))
    return reports


def _feasibility_gap_bound(sf, x, y, gap, pobj) -> float:
    """Feasibility-adjusted optimality bound for a pdas-family iterate.

    The pdas stop criterion is the relative duality gap (gap < 1e-4,
    primal-dual-affine-scaling.lisp:394) — but the REPORTED gap
    pobj - dobj prices neither residual: an iterate with Ax != b and a
    dual-infeasible (y, w, z) can report a tiny gap while c'x sits far
    from the optimum (afiro pdas: "optimal, gap 4.3e-5" with true
    objective error 4.4e-3; the reported dobj -462.687 is ABOVE the true
    optimum -464.753, so the dual iterate certifies nothing).  The
    reference prints the raw violation norms every iteration
    (primal-dual-affine-scaling.lisp:336-338); this is the same honesty
    in one comparable number, via the Lagrangian dual bound at the
    returned y.  For any ŷ (the user-space dual s·y, see solve()._duals)
    and rd = c - A'ŷ,

        p*  >=  L(ŷ) = b'ŷ + Σ_j min(rd_j·l_j, rd_j·u_j)

    (weak duality over the box: the best dual completion (w, z) of ŷ is
    priced exactly), so c'x - p* <= pobj - L — an upper bound that needs
    NO near-feasibility assumption on either iterate.  Two honest
    caveats, both documented in the returned number:

    - a coordinate whose rd_j points at an INFINITE bound has
      inf_x rd_j·x_j = -inf (no finite certificate exists from this
      dual); those coordinates are priced at the iterate's own x_j —
      the first-order term — instead of collapsing the bound to inf
      (afiro pdas: 16 such coords at |rd| ~7e-3; the bound still covers
      the true error 6x over);
    - pobj - L is one-sided (c'x can UNDERSHOOT p* through primal
      infeasibility), so the ||ŷ||_inf·||Ax-b||_1 feasibility term is
      added to cover that direction to first order.

    Evaluated host-side in FULL f64 on the ingest's exact triplets —
    strictly tighter than a device dd evaluation of the same bound.
    Returned RELATIVE (denominator 1 + |pobj|), comparable to and never
    below ``summary["gap"]``; tests pin bound >= true relative objective
    error on afiro for both the loose pdas stop and the tight pdas_dd
    flow (tests/test_api.py).
    """
    import numpy as np

    x = np.asarray(x, np.float64)[: sf.nvars]
    y = np.asarray(y, np.float64)[: sf.ncons]
    norm = np.zeros(sf.ncons)
    np.maximum.at(norm, sf.a_rows, np.abs(sf.a_vals))
    s = np.where(norm < 1e-6, 1.0, 1.0 / np.where(norm == 0, 1.0, norm))
    yhat = y * s
    c = np.asarray(sf.c, np.float64)
    b = np.asarray(sf.b, np.float64)
    vals = np.asarray(sf.a_vals, np.float64)
    l = np.asarray(sf.l, np.float64)
    u = np.asarray(sf.u, np.float64)
    rd = c.copy()
    np.add.at(rd, sf.a_cols, -vals * yhat[sf.a_rows])
    r = -b.copy()
    np.add.at(r, sf.a_rows, vals * x[sf.a_cols])

    def _side(bnd):
        # rd_j * bnd_j with 0 * inf := 0 and the sign of rd deciding
        # +/-inf on the infinite sides.
        fin = np.isfinite(bnd)
        out = np.where(fin, rd * np.where(fin, bnd, 0.0), 0.0)
        inf_side = np.where((rd > 0) == (bnd > 0), np.inf, -np.inf)
        return np.where(fin, out, np.where(rd == 0.0, 0.0, inf_side))

    contrib = np.minimum(_side(l), _side(u))
    # rd pointing at an infinite bound: price at the iterate (see above).
    contrib = np.where(np.isfinite(contrib), contrib, rd * x)
    lagrangian = float(b @ yhat + contrib.sum())
    pobj64 = float(c @ x)
    feas = float(np.max(np.abs(yhat), initial=0.0) * np.sum(np.abs(r)))
    denom = 1.0 + abs(pobj64)
    return max(
        (max(pobj64 - lagrangian, 0.0) + feas) / denom, float(gap)
    )


def _to_standard_form(problem, rescale: bool):
    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest.mps import MPSData
    from cholesky_is_magic_tpu.ingest.standard_form import StandardForm

    if isinstance(problem, StandardForm):
        sf = problem
    elif isinstance(problem, MPSData):
        sf = cim.to_standard_form(problem)
    elif isinstance(problem, str):
        sf = cim.to_standard_form(cim.read_mps_file(problem))
    else:
        raise TypeError(
            f"problem must be a path, MPSData, or StandardForm; got {type(problem)}"
        )
    if rescale:
        cim.rescale_sf(sf)
    return sf


def solve(
    problem: Union[str, "MPSData", "StandardForm"],  # noqa: F821
    solver: str = "pdas",
    *,
    sparse: bool = False,
    dtype=None,
    rescale: bool = False,
    pad_multiple: int = 128,
    block: int = 128,
    max_iters: int = 500,
    refine_steps: int = 1,
    gap_tol: Optional[float] = None,
    krylov_steps: int = 0,
    krylov_gate_gap: float = 0.0,
    record_trace: bool = False,
    presolve: bool = False,
    warm: Optional[SolveReport] = None,
    warm_push: float = 0.0,
    warm_blend: float = 0.0,
    mehrotra: bool = False,
    crossover: bool = False,
    entry_repair_tol: float = 0.0,
) -> SolveReport:
    """Solve an LP end-to-end with any solver family.

    ``sparse=True`` runs the fully sparse pipeline (ELL operands +
    pair-schedule tile engine; affine/pdas/pdas_dd only) — no dense A is
    ever materialized on device.  ``gap_tol`` applies to the gap-driven
    solvers (pdas: default 1e-4 as the reference's stop,
    primal-dual-affine-scaling.lisp:394; pdas_dd finisher: default 1e-9).
    ``krylov_steps`` > 0 switches refinement to flexible PCG
    (ops.krylov) for ill-conditioned end-games; with the default 0, the
    pdas_dd finisher AUTO-ESCALATES to PCG when Richardson refinement hits
    the f32 precision floor short of the target gap.
    ``krylov_gate_gap`` > 0 (with krylov_steps > 0) gates the PCG cost
    per iteration: solves run cheap Richardson refinement until the
    relative duality gap drops below the threshold, then switch to PCG on
    the same factorization (PDASConfig.krylov_gate_gap) — a
    speed/accuracy knob for latency-sensitive at-scale solves.  ``presolve=True``
    applies the safe host-side reductions (ingest.presolve — a capability
    extension over the reference) before padding; the reported solution is
    restored to the original variable space.

    ``mehrotra=True`` (pdas/pdas_dd) turns on the predictor-corrector
    step (PDASConfig.mehrotra): one extra pair of triangular solves on
    the shared factorization per iteration, roughly HALF the iterations
    to the same gap — the perf mode; the default keeps the
    reference-faithful plain affine step.

    ``entry_repair_tol`` > 0 (pdas_dd): min-norm-repair the finisher's
    ENTRY iterate toward Ax = b when its relative primal infeasibility
    exceeds the threshold (PDASConfig.entry_repair_tol) — the
    Newton-only finisher's precision floor tracks the entry residual,
    which at-scale phase-1 exits leave start-chaotic
    (docs/DEVNOTES.md "knife edge").  Recommended 1e-6 for at-scale
    sparse flows; default off.

    ``crossover=True`` (pdas/pdas_dd) polishes the final iterate to a
    vertex-exact solution (solvers.crossover — a capability extension
    over the reference): read the active set off the iterate, snap
    bound-active columns, and solve the basic block through ONE more
    normal-equations factorization with double-word iterative
    refinement.  When the dd-evaluated certificate passes, the report
    carries the polished solution at a ~1e-14-class internal gap (so
    even ``pdas`` at its loose 1e-4 stop yields a tight answer for one
    extra solve); when it fails (wrong active-set guess on degenerate
    LPs), the unpolished result is kept and
    ``summary["crossover"]["certified"]`` is False.

    ``warm`` (pdas/pdas_dd): restart from a previous :class:`SolveReport`
    on the same LP pattern, solved with the same ``sparse`` mode and
    ``pad_multiple`` (the iterate shapes must match) — for pdas_dd the
    phase-1 solve is skipped entirely (the serving re-solve flow,
    examples/warm_resolve.py).  For a *perturbed* re-solve the
    recommended recipe is ``warm_blend=0.2`` + ``mehrotra=True`` (the
    Skajaa-Andersen-style cold-init blend, solvers.pdas.make_pdas —
    measured 0.63x the cold iteration count on the 2%-drift chain where
    the older ``warm_push`` recipe costs ~1.25x cold); ``warm_push``
    ~1e-2 remains for push-only restarts.  Not combinable with
    ``presolve`` (the reduced spaces may differ between solves).
    """
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ingest import to_device_lp
    from cholesky_is_magic_tpu.ingest.standard_form import extract_solution

    if dtype is None:
        dtype = jnp.float32
    sf = _to_standard_form(problem, rescale)
    if sparse and solver not in ("affine", "pdas", "pdas_dd"):
        raise ValueError("sparse=True supports solver affine, pdas, or pdas_dd")
    if warm is not None:
        if solver not in ("pdas", "pdas_dd"):
            raise ValueError("warm starts support solver pdas or pdas_dd")
        if presolve:
            raise ValueError(
                "warm + presolve is unsupported: the reduced variable "
                "spaces of the two solves may differ"
            )
    if crossover and solver not in ("pdas", "pdas_dd"):
        raise ValueError("crossover supports solver pdas or pdas_dd")

    def _apply_crossover(res, state_lp, engine):
        # Certify against the SOLVER state's lp (post row-equilibration):
        # x/z/w are invariant under row scaling, and the returned y stays
        # in the scaled row space _duals() expects.
        from cholesky_is_magic_tpu.solvers.crossover import crossover as _xo

        return _xo(res, state_lp, engine=engine)

    psv = None
    sf_solve = sf
    if presolve:
        from cholesky_is_magic_tpu.ingest.presolve import presolve as _presolve

        sf_red, psv = _presolve(sf)
        if psv.status in ("infeasible", "unbounded"):
            return SolveReport(
                solver=solver, status=psv.status, objective=float("nan"),
                summary=dict(status=psv.status, detail=psv.detail,
                             presolve=psv.report()),
                result=None, sf=sf, solution={},
            )
        if psv.status == "solved":
            solution = extract_solution(sf, psv.restore(None))
            return SolveReport(
                solver=solver, status="optimal",
                objective=solution["objective"],
                summary=dict(status="optimal", iterations=0,
                             objective=solution["standard_form_objective"],
                             presolve=psv.report()),
                result=None, sf=sf, solution=solution,
            )
        sf_solve = sf_red
    lp = (
        None if sparse
        else to_device_lp(sf_solve, pad_multiple=pad_multiple, dtype=dtype)
    )

    if solver == "affine":
        from cholesky_is_magic_tpu.solvers import (
            AffineConfig,
            affine_scaling,
            make_affine_state,
        )

        cfg = AffineConfig(
            max_iters=max_iters, refine_steps=refine_steps,
            record_trace=record_trace,
        )
        if sparse:
            from cholesky_is_magic_tpu.solvers.affine import make_affine_state_sparse

            st, engine = make_affine_state_sparse(sf_solve, block=block, dtype=dtype)
            res = affine_scaling(st, cfg, engine=engine)
        else:
            res = affine_scaling(make_affine_state(lp), cfg)
        summary = dict(
            status=res.status_name, objective=float(res.objective),
            iterations=int(res.iterations), residual=float(res.residual_norm),
        )
    elif solver == "pdas":
        from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas, pdas

        kw = {} if gap_tol is None else {"gap_tol": gap_tol}
        cfg = PDASConfig(
            max_iters=max_iters, refine_steps=refine_steps,
            krylov_steps=krylov_steps, krylov_gate_gap=krylov_gate_gap,
            record_trace=record_trace, mehrotra=mehrotra, **kw,
        )
        from cholesky_is_magic_tpu.solvers.pdas import PDASState, push_interior

        def warm_state():
            r = warm.result
            return PDASState(
                x=jnp.asarray(r.x, dtype), y=jnp.asarray(r.extra["y"], dtype),
                w=jnp.asarray(r.extra["w"], dtype),
                z=jnp.asarray(r.extra["z"], dtype), lp=None,
            )

        if sparse:
            from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse

            st, engine = make_pdas_sparse(sf_solve, block=block, dtype=dtype)
            if warm is not None:
                from cholesky_is_magic_tpu.solvers.affine import _into_interior

                ws = warm_state()
                wx, wy = ws.x, ws.y
                ww = jnp.maximum(ws.w, 1e-8)
                wz = jnp.maximum(ws.z, 1e-8)
                if warm_blend > 0.0:
                    # st is the cold init (make_pdas_sparse): blend it in.
                    bl = warm_blend
                    wx = (1 - bl) * wx + bl * st.x
                    wy = (1 - bl) * wy + bl * st.y
                    ww = jnp.maximum((1 - bl) * ww + bl * st.w, 1e-8)
                    wz = jnp.maximum((1 - bl) * wz + bl * st.z, 1e-8)
                if warm_push > 0.0:
                    wx = push_interior(wx, st.lp.l, st.lp.u, st.lp.col_mask,
                                       warm_push)
                wx = _into_interior(wx, st.lp.l, st.lp.u, st.lp.col_mask)
                st = dataclasses.replace(st, x=wx, y=wy, w=ww, z=wz)
            res = pdas(st, cfg, engine=engine)
            if crossover:
                res = _apply_crossover(res, st.lp, engine)
        else:
            st = make_pdas(
                lp, cfg, warm=warm_state() if warm is not None else None,
                warm_push=warm_push, warm_blend=warm_blend,
            )
            res = pdas(st, cfg)
            if crossover:
                res = _apply_crossover(res, st.lp, None)
        summary = dict(
            status=res.status_name, objective=float(res.objective),
            dual_objective=float(res.extra["dual_objective"]),
            gap=float(res.extra["gap"]), iterations=int(res.iterations),
            residual=float(res.residual_norm),
        )
    elif solver == "pdas_dd":
        from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas, pdas

        cfg1 = PDASConfig(
            max_iters=max_iters, refine_steps=max(refine_steps, 2),
            mehrotra=mehrotra,
        )
        cfg2 = PDASConfig(
            max_iters=max_iters, gap_tol=1e-9 if gap_tol is None else gap_tol,
            refine_steps=max(refine_steps, 2), krylov_steps=krylov_steps,
            krylov_gate_gap=krylov_gate_gap, record_trace=record_trace,
            mehrotra=mehrotra, entry_repair_tol=entry_repair_tol,
        )
        if sparse:
            from cholesky_is_magic_tpu.ops import dd as ddm
            from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse, push_interior
            from cholesky_is_magic_tpu.solvers.pdas_dd import (
                PDASDDState,
                mu_recentered_duals,
                pdas_dd,
            )

            st, engine = make_pdas_sparse(sf_solve, block=block, dtype=dtype)

            def sparse_dd_state(prior):
                """dd finisher state from a prior result's iterates
                (phase 1's, or a warm re-solve's): mu-recentered duals, x
                pulled (optionally pushed) strictly interior; with
                warm_blend > 0, the cold-init blend replaces the mu
                reset (see make_pdas_dd)."""
                from cholesky_is_magic_tpu.solvers.affine import _into_interior

                wx = jnp.asarray(prior.x, dtype)
                wy = jnp.asarray(prior.extra["y"], dtype)
                w_ = jnp.maximum(jnp.asarray(prior.extra["w"], dtype), 1e-8)
                z_ = jnp.maximum(jnp.asarray(prior.extra["z"], dtype), 1e-8)
                if warm_blend > 0.0:
                    bl = warm_blend
                    wx = (1 - bl) * wx + bl * st.x
                    wy = (1 - bl) * wy + bl * st.y
                    w_ = jnp.maximum((1 - bl) * w_ + bl * st.w, 1e-8)
                    z_ = jnp.maximum((1 - bl) * z_ + bl * st.z, 1e-8)
                if warm_push > 0.0:
                    wx = push_interior(wx, st.lp.l, st.lp.u, st.lp.col_mask,
                                       warm_push)
                wx = _into_interior(wx, st.lp.l, st.lp.u, st.lp.col_mask)
                if warm_blend == 0.0:
                    w_, z_ = mu_recentered_duals(
                        wx, st.lp.l, st.lp.u, w_, z_, st.lp.col_mask
                    )
                to_dd = lambda v: ddm.dd_from(jnp.asarray(v, dtype))
                return PDASDDState(x=to_dd(wx), y=to_dd(wy),
                                   w=to_dd(w_), z=to_dd(z_), lp=st.lp)

            phase1 = warm.result if warm is not None else pdas(
                st, cfg1, engine=engine
            )
            res = pdas_dd(sparse_dd_state(phase1), cfg2, engine=engine)
            if (res.status_name == "precision_floor" and krylov_steps == 0
                    and float(res.extra["gap"]) > cfg2.gap_tol):
                # Auto-escalation: the Richardson-refined finisher hit the
                # f32 wall short of the target; retry warm with PCG
                # refinement (ops.krylov, docs/DEVNOTES.md "Richardson
                # wall").
                cfg2k = dataclasses.replace(cfg2, krylov_steps=8)
                res2 = pdas_dd(sparse_dd_state(res), cfg2k, engine=engine)
                if float(res2.extra["gap"]) < float(res.extra["gap"]):
                    res = res2
                    res.extra["krylov_escalated"] = True
            if crossover:
                res = _apply_crossover(res, st.lp, engine)
        else:
            from cholesky_is_magic_tpu.solvers.pdas_dd import make_pdas_dd, pdas_dd

            phase1 = (warm.result if warm is not None
                      else pdas(make_pdas(lp), cfg1))
            st_dd = make_pdas_dd(lp, warm=phase1, warm_push=warm_push,
                                 warm_blend=(warm_blend if warm is not None
                                             else 0.0))
            res = pdas_dd(st_dd, cfg2)
            if (res.status_name == "precision_floor" and krylov_steps == 0
                    and float(res.extra["gap"]) > cfg2.gap_tol):
                cfg2k = dataclasses.replace(cfg2, krylov_steps=8)
                res2 = pdas_dd(make_pdas_dd(lp, warm=res), cfg2k)
                if float(res2.extra["gap"]) < float(res.extra["gap"]):
                    res = res2
                    res.extra["krylov_escalated"] = True
            if crossover:
                res = _apply_crossover(res, st_dd.lp, None)
        summary = dict(
            status=res.status_name, objective=float(res.objective),
            dual_objective=float(res.extra["dual_objective"]),
            gap=float(res.extra["gap"]), iterations=int(res.iterations),
            phase1_iterations=(0 if warm is not None
                               else int(phase1.iterations)),
            residual=float(res.residual_norm),
        )
        if res.extra.get("krylov_escalated"):
            summary["krylov_escalated"] = True
    elif solver in ("alm", "aalm"):
        from cholesky_is_magic_tpu.solvers import alm, make_alm
        from cholesky_is_magic_tpu.solvers.alm import ALMConfig, aalm

        # Dtype-aware tolerances (ALMConfig docstring): the reference's f64
        # targets sit below f32 resolution — in f32 the inner APPROX loop
        # would burn its full 1e6-iteration budget every outer step without
        # converging (long enough to trip device execution watchdogs).
        f32 = jnp.dtype(dtype) == jnp.dtype(jnp.float32)
        tol_kw = (
            dict(violation_tol=1e-4, pg_tol=1e-4, omega_floor=1e-4,
                 inner_iters=50_000)
            if f32 else {}
        )
        driver = aalm if solver == "aalm" else alm
        res = driver(
            make_alm(lp),
            config=ALMConfig(max_outer=max_iters, record_trace=record_trace,
                             **tol_kw),
        )
        summary = dict(
            status="optimal" if float(res.violation) < 1e-4 else "max_iters",
            value=float(res.value), violation=float(res.violation),
            pg=float(res.pg), outer_iterations=int(res.outer_iterations),
            inner_iterations=int(res.inner_iterations),
        )
    elif solver == "selfdual":
        import numpy as np

        from cholesky_is_magic_tpu.solvers.approx import approx, make_approx_selfdual

        prob = make_approx_selfdual(
            lp, complementarity=True, pad_multiple=pad_multiple
        )
        res = approx(prob, 1_000_000, accuracy=1e-9)
        x = np.asarray(res.x)[: lp.n]
        summary = dict(
            status="optimal" if float(res.pg) < 1e-6 else "max_iters",
            objective=float(x @ np.asarray(lp.c)[: lp.n]),
            pg=float(res.pg), iterations=int(res.iterations),
        )
    else:
        raise ValueError(f"unknown solver {solver!r}")

    if crossover and res.extra.get("crossover") is not None:
        cert = res.extra["crossover"]
        summary["crossover"] = {
            k: (v if isinstance(v, bool)
                else int(v) if (k.startswith("n_") or k == "repairs")
                else [float(t) for t in v] if isinstance(v, (tuple, list))
                else float(v))
            for k, v in cert.items()
        }

    def _duals():
        """Row duals and reduced costs in the ORIGINAL row space.

        make_pdas / make_pdas_sparse equilibrate rows by
        s_i = 1 / max_j |a_ij| (scale-constraints,
        primal-dual-affine-scaling.lisp:50-73); the dual of the scaled row
        is y'_i = y_i / s_i, so the user-space dual is s_i * y'_i (b'y is
        invariant).  Reduced costs are z - w = c - Aᵀy (the KKT row 4
        identity, kkt/newton.py).  The sign convention equals scipy
        linprog/HiGHS ``eqlin.marginals`` (verified element-for-element
        in tests/test_api.py).
        """
        import numpy as _np

        norm = _np.zeros(sf_solve.ncons)
        _np.maximum.at(norm, sf_solve.a_rows, _np.abs(sf_solve.a_vals))
        s = _np.where(norm < 1e-6, 1.0, 1.0 / _np.where(norm == 0, 1.0, norm))
        y = _np.asarray(res.extra["y"])[: sf_solve.ncons] * s
        rc = _np.asarray(res.extra["z"] - res.extra["w"])[: sf_solve.nvars]
        if psv is not None:
            # Exact dual postsolve (ingest.presolve.restore_duals):
            # substitution rows get the complementarity-consistent
            # y_i = c_j/a_ij, eliminated columns' reduced costs are
            # recomputed from the original data, and x_full drives the
            # bound-transfer corrections (a doubleton bound binding in
            # the reduced space shifts its dual onto the eliminated row).
            return psv.restore_duals(sf, y, rc, x_full=x_full)
        return y, rc

    if psv is not None:
        import numpy as _np

        x_full = psv.restore(_np.asarray(res.x))
        solution = extract_solution(sf, x_full)
        summary["presolve"] = psv.report()
        # Solver metrics are in the REDUCED space; the eliminated columns
        # contribute the constant c'x_fixed to both primal and dual
        # objectives — shift so the summary matches `solution`.
        for key in ("objective", "value", "dual_objective"):
            if key in summary:
                summary[key] += psv.obj_offset
    else:
        solution = extract_solution(sf, res.x)
    if solver in ("pdas", "pdas_dd") and "y" in res.extra:
        solution["y"], solution["reduced_costs"] = _duals()
        # Rigorous feasibility-adjusted certificate next to the raw gap
        # (reduced space when presolve ran — same space as gap itself).
        summary["gap_bound"] = _feasibility_gap_bound(
            sf_solve, res.x, res.extra["y"], summary["gap"],
            summary["objective"],
        )
    return SolveReport(
        solver=solver,
        status=summary.get("status", "?"),
        objective=solution["objective"],
        summary=summary,
        result=res,
        sf=sf,
        solution=solution,
    )
