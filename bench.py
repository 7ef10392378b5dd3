"""Benchmark: factor+solve time per IPM iteration (BASELINE.md metric).

Times the per-iteration hot path of the interior-point solvers — assemble
N = (A·D)(A·D)ᵀ, Cholesky-factor it, two triangular solves, one double-word
refined correction (SURVEY.md §3.1's INNER HOT SPOT) — on a staircase LP at
Netlib 25fv47 scale (821 x 1571 + slacks), run through the REAL ingest
pipeline (MPS text -> standard form -> padded DeviceLP), so the timed
operands have realistic LP sparsity (~6 nnz/row), not a synthetic density.
Beyond the headline, the detail carries the at-scale story (m=8192/16384
fully sparse per-iteration + the m=16384 two-phase total), the batched
throughput rows, and an MFU/roofline figure per TPU row (achieved GFLOP/s
and % of the f32-highest MXU peak) so "actually fast vs just
faster-than-splu" has a number — the TPU rendering of the reference's
always-on nnz/flop cost report (affine-scaling.lisp:273-279, wrapper.c:43-51).

Four headline contenders; the reported ratio is strongest-host/strongest-TPU:

  TPU dense     ops.dense.solve_normal           (MXU, f32 + dd refine)
  TPU tiled     sparse.tiled.TiledCholesky       (planned tile factorization)
  host dense    scipy cho_factor/cho_solve       (LAPACK fp64)
  host sparse   sksparse CHOLMOD if importable, else scipy splu on sparse N
                (the CHOLMOD-class sparse oracle BASELINE.md names)

Timing notes: on the axon TPU tunnel, block_until_ready() returns before
device execution completes, so we chain K data-dependent iterations inside
one jit and fetch a scalar (which does wait).  The per-iteration time is
the TWO-K DIFFERENCE (t(2K) - t(K)) / K, which cancels every fixed
per-call overhead (tunnel RTT, dispatch, transfer) exactly.

OUTAGE HARDENING (the BENCH_r03 lesson — rc=1, parsed=null): tunnel
outages make the first in-process device use hang or die, so this file is
three programs in one:

  (no args)    parent: probes the TPU in a bounded SUBPROCESS (never
               in-process — docs/DEVNOTES.md "Tunnel outages block
               EVERYTHING jax"), then runs --child under a deadline,
               echoing each cumulative JSON line as it lands; on probe
               failure or a mid-run death it still prints a parseable
               structured line with host-oracle detail and an "error"
               field instead of a traceback.
  --child      the real benchmark (assumes a live backend).  Prints a
               CUMULATIVE result line after every section, so a kill at
               any point leaves the best-so-far on stdout.
  --host-only  host oracles only, axon registration disabled — runs
               during outages.

Stdout carries only JSON result lines (the last one is the answer);
progress goes to stderr.  Deadline: env BENCH_DEADLINE_S (default 2700 s).
"""

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

# BENCH_SMOKE=1 shrinks every section (tiny LPs, small K) to validate the
# full child pipeline on CPU in minutes — numbers are meaningless in smoke.
SMOKE = os.environ.get("BENCH_SMOKE", "") not in ("", "0")

K = 4 if SMOKE else 64  # chained-iteration count; timed at K and 2K
REPS = 2 if SMOKE else 5

# MXU roofline reference (v5e): 197 TFLOP/s bf16 peak; matmul precision
# "highest" (required for IPM numerics — utils/precision.py) runs 6 bf16
# passes per f32 product, so the achievable f32 ceiling is 197/6.
PEAK_BF16_TFLOPS = 197.0
F32_HIGHEST_PEAK_TFLOPS = PEAK_BF16_TFLOPS / 6.0
# HBM roofline reference (v5e): ~819 GB/s peak.  The sparse IPM iteration
# is gather/scatter-bound, not FLOP-bound (pct_f32peak ~0.0003 answers a
# question nobody asked) — the honest axis for those rows is modeled bytes
# moved / s vs this peak, with a bound tag saying WHICH wall owns the row.
HBM_PEAK_GBS = 819.0

METRIC = (
    "factor+solve ms per IPM iteration "
    "(25fv47-scale staircase LP, f32+dd refine; "
    "vs strongest host oracle incl. sparse direct)"
)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_problem():
    """25fv47-scale LP through the real ingest path."""
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ingest import to_device_lp

    sf = make_sf()
    lp = to_device_lp(sf, pad_multiple=128, dtype=jnp.float32)
    return sf, lp


def make_sf():
    """Standard form only — numpy, no device arrays (host-only safe)."""
    from cholesky_is_magic_tpu.ingest import to_standard_form
    from cholesky_is_magic_tpu.ingest.mps import read_mps_string
    from cholesky_is_magic_tpu.utils.testing import netlib_like_lp, write_mps

    ineq = netlib_like_lp("adlittle" if SMOKE else "25fv47")
    return to_standard_form(read_mps_string(write_mps(ineq)))


def _host_operands(sf, rng):
    A = sf.dense_A()
    m, n = A.shape
    d = rng.random(n) + 0.5
    g = rng.normal(size=m)
    return A, d, g


def _gflops(flops_per_iter: float, ms: float) -> float:
    return flops_per_iter / (ms * 1e-3) / 1e9


def _mfu(detail: dict, key: str, flops_per_iter: float) -> None:
    """Attach achieved GFLOP/s + %-of-f32-highest-peak for a timed row."""
    ms = detail.get(key)
    if not ms:
        return
    gf = _gflops(flops_per_iter, ms)
    detail[f"{key}_gflops"] = float(f"{gf:.4g}")
    detail[f"{key}_pct_f32peak"] = float(
        f"{100.0 * gf / (F32_HIGHEST_PEAK_TFLOPS * 1e3):.3g}"
    )


def _dense_iter_flops(M: int, N: int) -> float:
    # scale AD (MN) + full Gram (2 M^2 N; XLA computes the full matrix)
    # + Cholesky (M^3/3) + tri-solves/residual for one refinement (~8 M^2).
    return M * N + 2.0 * M * M * N + M**3 / 3.0 + 8.0 * M * M


def _tiled_iter_flops(eng, N: int) -> float:
    # resident-tile Gram: NT tile products, each (b, N) x (N, b);
    # factor: 2 * sum(colcount^2); solves + refine on nnz_L.
    b = eng.plan.block
    return (
        2.0 * eng.NT * b * b * N
        + 2.0 * eng.plan.flops
        + 12.0 * eng.plan.nnz_L
    )


def _sparse_iter_flops(eng) -> float:
    # pair-schedule assembly (1 mult + 1 add per pair), factor, solves.
    return 2.0 * eng.n_pairs + 2.0 * eng.plan.flops + 12.0 * eng.plan.nnz_L


def _sparse_iter_bytes(eng, refine_steps: int = 1) -> float:
    """Modeled LOWER-BOUND bytes/iteration for solve_normal_ell (f32).

    assembly: per pair, gather two scaled values + two int32 coordinates
    and scatter-add into an N tile (16 B); N tile writes; factor: >= one
    read + one write of every L tile element per panel wave (2 passes is
    the floor — waves re-read the resident panel); solves: two triangular
    passes over nnz_L per solve, (1 + refine) solves + the residual SpMV
    (4 B x 2 x nnz_A ~ n_pairs-scale, folded into the pair term).  Real
    traffic is strictly higher (wave re-reads, padding, index streams),
    so achieved-GB/s computed from this model UNDERSTATES the truth —
    safe for a "nowhere near bandwidth-bound" claim, never inflating it.
    """
    b = eng.plan.block
    itm = 4.0
    asm = 16.0 * eng.n_pairs + itm * eng.NT * b * b
    factor = 2.0 * itm * eng.plan.nnz_L
    solves = 2.0 * itm * eng.plan.nnz_L * 2.0 * (1.0 + refine_steps)
    return asm + factor + solves


def _gbs(detail: dict, key: str, bytes_per_iter: float) -> None:
    """Attach modeled GB/s + a bound tag (which wall owns the row)."""
    ms = detail.get(key)
    if not ms:
        return
    gbs = bytes_per_iter / (ms * 1e-3) / 1e9
    detail[f"{key}_gbs"] = float(f"{gbs:.4g}")
    pct_hbm = 100.0 * gbs / HBM_PEAK_GBS
    detail[f"{key}_pct_hbm"] = float(f"{pct_hbm:.3g}")
    pct_mxu = detail.get(f"{key}_pct_f32peak", 0.0)
    if pct_hbm >= 40.0:
        tag = "bandwidth-bound"
    elif pct_mxu >= 40.0:
        tag = "compute-bound"
    else:
        # Neither roofline is near: the wall is serialization — the
        # panel-wave dependency chain + gather/scatter dispatch (see
        # docs/DEVNOTES.md "Sparse-row roofline" for the wall breakdown).
        tag = "latency/serialization-bound"
    detail[f"{key}_bound"] = tag


def two_k_ms(step, d0, g0, k_base: int = K, reps: int = REPS) -> float:
    """Per-iteration ms of step(d, g) -> (vector, ok), two-K method."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(d0, g0, k):
        # Data-dependent d so no two iterations can be CSE'd; mimics the
        # slack vector changing between IPM iterations.  The trip count k
        # is a TRACED argument (lowers to while_loop), so one compile
        # serves both K and 2K runs.
        def body(i, carry):
            acc, g = carry
            d = d0 * (1.0 + 1e-6 * acc)
            y, ok = step(d, g)
            return acc + y[0], g + 1e-6 * y

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), g0))
        return acc

    # Full-f32 MXU passes: default bf16 matmuls are numerically unusable
    # for the normal equations (see utils/precision.py).
    totals = {}
    with jax.default_matmul_precision("highest"):
        float(loop(d0, g0, jnp.int32(k_base)))  # compile
        for k in (k_base, 2 * k_base):
            ts = []
            for _ in range(reps):
                t = time.time()
                float(loop(d0, g0, jnp.int32(k)))
                ts.append(time.time() - t)
            totals[k] = min(ts)
    return (totals[2 * k_base] - totals[k_base]) * 1e3 / k_base


def tpu_times_ms(sf, lp) -> dict:
    import jax.numpy as jnp
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.ops import dense as dense_ops
    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for, engine_for_sparse

    rng = np.random.default_rng(0)
    A = lp.A
    M, N = A.shape
    boost = (~lp.row_mask).astype(A.dtype)
    d0 = jnp.asarray(rng.random(N) + 0.5, jnp.float32)
    g0 = jnp.asarray(rng.normal(size=M), jnp.float32)
    eng = engine_for(A, block=128)
    # Fully sparse path on the TRUE (unpadded) operands.
    A_true = sp.csc_matrix(
        (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
    )
    eng_s = engine_for_sparse(A_true, block=128)
    E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                            (sf.ncons, sf.nvars))
    ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                             (sf.nvars, sf.ncons))
    ds0 = jnp.asarray(rng.random(sf.nvars) + 0.5, jnp.float32)
    gs0 = jnp.asarray(rng.normal(size=sf.ncons), jnp.float32)

    dense_ms = two_k_ms(
        lambda d, g: dense_ops.solve_normal(A, d, g, row_boost=boost, refine_steps=1),
        d0, g0,
    )
    tiled_ms = two_k_ms(
        lambda d, g: eng.solve_normal(A, d, g, row_boost=boost, refine_steps=1),
        d0, g0,
    )
    sparse_ms = two_k_ms(
        lambda d, g: eng_s.solve_normal_ell(E, ET, d, g, refine_steps=1),
        ds0, gs0,
    )
    out = {
        "tpu_dense": max(dense_ms, 1e-6),
        "tpu_tiled": max(tiled_ms, 1e-6),
        "tpu_fully_sparse": max(sparse_ms, 1e-6),
    }
    _mfu(out, "tpu_dense", _dense_iter_flops(M, N))
    _mfu(out, "tpu_tiled", _tiled_iter_flops(eng, N))
    _mfu(out, "tpu_fully_sparse", _sparse_iter_flops(eng_s))
    return out


def host_times_ms(sf) -> dict:
    """Host oracles on the SAME problem: dense LAPACK and sparse direct."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl
    from scipy.linalg import cho_factor, cho_solve

    rng = np.random.default_rng(0)
    A, d, g0 = _host_operands(sf, rng)
    out = {}

    # Dense LAPACK (the reference's Matlisp-class dense path).
    reps, kk = 3, min(K, 16)
    best = np.inf
    for _ in range(reps):
        g = g0.copy()
        t = time.time()
        acc = 0.0
        for _k in range(kk):
            dk = d * (1.0 + 1e-6 * acc)
            AD = A * dk[None, :]
            Nmat = AD @ AD.T
            c, low = cho_factor(Nmat, lower=True)
            y = cho_solve((c, low), g)
            y = y + cho_solve((c, low), g - Nmat @ y)  # one refinement
            acc += y[0]
            g = g + 1e-6 * y
        best = min(best, time.time() - t)
    out["host_dense"] = best * 1e3 / kk

    # Sparse direct (CHOLMOD if importable, else SuperLU).  The sparse
    # matmul + factorization pipeline the reference actually runs
    # (cholmod_scale + cholmod_aat + cholmod_factorize + solve2).
    As = sp.csr_matrix(A)
    try:
        from sksparse.cholmod import analyze as chol_analyze  # type: ignore

        factor_sym = chol_analyze(sp.csc_matrix(As @ As.T))

        def sparse_factor_solve(Nmat, g):
            f = factor_sym.cholesky(sp.csc_matrix(Nmat))
            return f(g)

        label = "host_cholmod"
    except ImportError:

        def sparse_factor_solve(Nmat, g):
            lu = spl.splu(sp.csc_matrix(Nmat), permc_spec="MMD_AT_PLUS_A")
            return lu.solve(g)

        label = "host_splu"
    best = np.inf
    for _ in range(reps):
        g = g0.copy()
        t = time.time()
        acc = 0.0
        for _k in range(kk):
            dk = d * (1.0 + 1e-6 * acc)
            ADs = As.multiply(dk[None, :]).tocsr()
            Nmat = (ADs @ ADs.T).tocsc()
            y = sparse_factor_solve(Nmat, g)
            y = y + sparse_factor_solve(Nmat, g - Nmat @ y)
            acc += y[0]
            g = g + 1e-6 * y
        best = min(best, time.time() - t)
    out[label] = best * 1e3 / kk
    return out


# ---------------------------------------------------------------------------
# Child sections beyond the headline
# ---------------------------------------------------------------------------


def _atscale_sf(m: int):
    """Staircase LP at (m, 2m + slacks) — examples/at_scale_sparse.py."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "examples"))
    import at_scale_sparse as demo

    return demo.to_standard_form(*demo.build_lp(m))


def _host_splu_iter_ms(sf, kk: int = 4) -> float:
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
        for _k in range(kk):
            dk = d * (1.0 + 1e-6 * acc)
            ADs = A.multiply(dk[None, :]).tocsr()
            Nmat = (ADs @ ADs.T).tocsc()
            lu = spl.splu(Nmat, permc_spec="MMD_AT_PLUS_A")
            y = lu.solve(g)
            y = y + lu.solve(g - Nmat @ y)
            acc += y[0]
        best = min(best, (time.time() - t) / kk)
    return best * 1e3


def atscale_rows(detail: dict) -> None:
    """m=8192/16384 fully sparse per-iteration factor+solve + MFU."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.ops import sparse_ops
    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    for m in ((256,) if SMOKE else (8192, 16384)):
        log(f"[bench] at-scale m={m}: building engine ...")
        sf = _atscale_sf(m)
        A_true = sp.csc_matrix(
            (sf.a_vals, (sf.a_rows, sf.a_cols)), shape=(sf.ncons, sf.nvars)
        )
        eng = engine_for_sparse(A_true, block=128)
        E = sparse_ops.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                                (sf.ncons, sf.nvars))
        ET = sparse_ops.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                                 (sf.nvars, sf.ncons))
        # Block-ELL forms for the refine products (r5: the plain-ELL dd
        # SpMVs owned ~28% of the iteration; solver paths route via
        # SparseKKTLP.EB/ETB so the bench row must too).
        from cholesky_is_magic_tpu.ops import bell

        EB = bell.from_coo(sf.a_rows, sf.a_cols, sf.a_vals,
                           (sf.ncons, sf.nvars))
        ETB = bell.from_coo(sf.a_cols, sf.a_rows, sf.a_vals,
                            (sf.nvars, sf.ncons))
        rng = np.random.default_rng(0)
        d0 = jnp.asarray(rng.random(sf.nvars) + 0.5, jnp.float32)
        g0 = jnp.asarray(rng.normal(size=sf.ncons), jnp.float32)
        # Smaller K at scale: 14 ms/iter x 2K=32 keeps each fetch ~0.5 s.
        key = f"tpu_sparse_m{m}"
        detail[key] = round(two_k_ms(
            lambda d, g: eng.solve_normal_ell(E, ET, d, g, refine_steps=1,
                                              EB=EB, ETB=ETB),
            d0, g0, k_base=16, reps=3,
        ), 4)
        _mfu(detail, key, _sparse_iter_flops(eng))
        _gbs(detail, key, _sparse_iter_bytes(eng, refine_steps=1))
        detail[f"host_splu_m{m}"] = round(_host_splu_iter_ms(sf), 4)
        log(f"[bench] at-scale m={m}: {detail[key]} ms/iter "
            f"(host splu {detail[f'host_splu_m{m}']})")


def alm_row(detail: dict, m: int = None) -> None:
    """Matrix-free path at scale: the accelerated APPROX inner iteration
    (two value-&-gradient passes = 4 SpMVs + prox) per-iteration on the
    ELL operands vs the faithful scipy CSR host baseline — the TPU
    rendering of the reference's hottest pure-Lisp loop
    (alm-approx.lisp:240-262)."""
    import importlib.util

    if m is None:
        m = 256 if SMOKE else 16384
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "alm_at_scale", os.path.join(here, "examples", "alm_at_scale.py")
    )
    demo = importlib.util.module_from_spec(spec)
    sys.path.insert(0, os.path.join(here, "examples"))
    spec.loader.exec_module(demo)

    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ingest.device import to_sparse_lp

    sf = _atscale_sf(m)
    lp = to_sparse_lp(sf, dtype=jnp.float32)
    detail[f"alm_inner_m{m}_tpu_ms"] = round(demo.tpu_inner_iter_ms(lp), 4)
    detail[f"alm_inner_m{m}_host_ms"] = round(demo.host_inner_iter_ms(sf), 4)
    log(f"[bench] alm inner m={m}: tpu {detail[f'alm_inner_m{m}_tpu_ms']} ms "
        f"host {detail[f'alm_inner_m{m}_host_ms']} ms")


def twophase_row(detail: dict, m: int = None) -> None:
    """Warm two-phase (sparse pdas -> dd finisher) total at m=16384."""
    if m is None:
        m = 256 if SMOKE else 16384
    import jax.numpy as jnp

    from cholesky_is_magic_tpu.ops import dd as ddm
    from cholesky_is_magic_tpu.solvers import PDASConfig, pdas
    from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse
    from cholesky_is_magic_tpu.solvers.pdas_dd import (
        PDASDDState,
        mu_recentered_duals,
        pdas_dd,
    )

    log(f"[bench] two-phase m={m}: building ...")
    sf = _atscale_sf(m)
    st, eng = make_pdas_sparse(sf, block=128)
    cfg1 = PDASConfig(max_iters=100, refine_steps=1, mehrotra=True)
    p1 = pdas(st, cfg1, engine=eng)
    float(p1.extra["gap"])  # compile + run
    t0 = time.time()
    p1 = pdas(st, cfg1, engine=eng)
    float(p1.extra["gap"])
    t1 = time.time() - t0
    w, z = mu_recentered_duals(
        p1.x, st.lp.l, st.lp.u, p1.extra["w"], p1.extra["z"], st.lp.col_mask
    )
    to_dd = lambda v: ddm.dd_from(jnp.asarray(v, jnp.float32))
    st2 = PDASDDState(x=to_dd(p1.x), y=to_dd(p1.extra["y"]), w=to_dd(w),
                      z=to_dd(z), lp=st.lp)
    # The 1.7-s operating point (README): Mehrotra + plain Richardson-2
    # with the bounce exit capturing the transient dip below 1e-7.
    # entry_repair_tol: the finisher floor tracks the entry residual and
    # phase-1 exits are start-chaotic at scale (DEVNOTES "knife edge");
    # the repair makes the benched floor reproducible, not lucky.
    cfg2 = PDASConfig(max_iters=100, gap_tol=1e-9, refine_steps=2,
                      mehrotra=True, stall_exit_iters=12,
                      bounce_exit_ratio=25.0, entry_repair_tol=1e-6)
    r = pdas_dd(st2, cfg2, engine=eng)
    float(r.extra["gap"])
    t0 = time.time()
    r = pdas_dd(st2, cfg2, engine=eng)
    g2 = float(r.extra["gap"])
    t2 = time.time() - t0
    detail[f"twophase_m{m}_total_s"] = round(t1 + t2, 3)
    detail[f"twophase_m{m}_gap"] = float(f"{g2:.3g}")
    detail[f"twophase_m{m}_iters"] = int(p1.iterations) + int(r.iterations)
    log(f"[bench] two-phase m={m}: {t1 + t2:.2f} s total, gap {g2:.2e}")


def twophase32k_row(detail: dict) -> None:
    """m=32768: the scale where the phase-2 floor is entry-chaotic.

    Measured configuration (examples/at_scale_sparse.py, on-chip r5): the
    6-iteration entry-repaired Mehrotra finisher ("phase 1.5") BEATS the
    full 16-iteration stall-exit finisher here — gap 1.19e-6 in ~1.1 s
    warm vs 1.1e-5 in ~10.8 s — because the endgame oscillates and the
    best-iterate dip lands inside the first 6 iterations.  Also records
    the crossover certification attempt: at this scale it does NOT
    certify (primal floors at ~2.9e-4; the classified basis is ~82
    columns short of rank and every OMP completion is dual-rejected —
    docs/DEVNOTES.md "m=32768 crossover", the on-chip-pinned negative
    result).  max_repairs=6 shows the stable floor (reached by pass 2)
    without burning the full repair budget in the bench deadline.
    """
    m = 512 if SMOKE else 32768
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

    log(f"[bench] two-phase m={m}: building (analysis ~10 s) ...")
    sf = _atscale_sf(m)
    st, eng = make_pdas_sparse(sf, block=128)
    cfg1 = PDASConfig(max_iters=100, refine_steps=1, mehrotra=True)
    p1 = pdas(st, cfg1, engine=eng)
    float(p1.extra["gap"])  # compile + run
    t0 = time.time()
    p1 = pdas(st, cfg1, engine=eng)
    float(p1.extra["gap"])
    t1 = time.time() - t0
    w, z = mu_recentered_duals(
        p1.x, st.lp.l, st.lp.u, p1.extra["w"], p1.extra["z"], st.lp.col_mask
    )
    to_dd = lambda v: ddm.dd_from(jnp.asarray(v, jnp.float32))
    st2 = PDASDDState(x=to_dd(p1.x), y=to_dd(p1.extra["y"]), w=to_dd(w),
                      z=to_dd(z), lp=st.lp)
    cfg15 = PDASConfig(max_iters=6, gap_tol=1e-12, refine_steps=2,
                       mehrotra=True, entry_repair_tol=1e-6)
    r = pdas_dd(st2, cfg15, engine=eng)
    float(r.extra["gap"])
    t0 = time.time()
    r = pdas_dd(st2, cfg15, engine=eng)
    g2 = float(r.extra["gap"])
    t2 = time.time() - t0
    detail[f"twophase_m{m}_total_s"] = round(t1 + t2, 3)
    detail[f"twophase_m{m}_gap"] = float(f"{g2:.3g}")
    detail[f"twophase_m{m}_iters"] = int(p1.iterations) + int(r.iterations)
    er = r.extra.get("entry_repair")
    if er is not None:
        detail[f"twophase_m{m}_entry_repair"] = (
            f"{float(er['pviol_before']):.1e}->{float(er['pviol_after']):.1e}"
        )
    log(f"[bench] two-phase m={m}: {t1 + t2:.2f} s total, gap {g2:.2e}")

    log(f"[bench] crossover m={m}: certification attempt ...")
    out = crossover(r, st.lp, engine=eng,
                    config=CrossoverConfig(max_repairs=6))
    cert = out.extra["crossover"]
    detail[f"crossover_m{m}_certified"] = bool(cert["certified"])
    detail[f"crossover_m{m}_gap"] = float(f"{float(cert['gap']):.3g}")
    detail[f"crossover_m{m}_primal_rel"] = float(
        f"{float(cert['primal_rel']):.3g}")
    detail[f"crossover_m{m}_dual_rel"] = float(
        f"{float(cert['dual_rel']):.3g}")
    log(f"[bench] crossover m={m}: certified={cert['certified']} "
        f"primal {float(cert['primal_rel']):.2e}")


def batched_atscale_row(detail: dict) -> None:
    """The composition row: the panel-wave sparse engine VMAPPED over a
    batch of same-A LPs (per-lane b, c — the re-solve-fleet shape,
    examples/warm_resolve.py) vs solving them one at a time.  One
    symbolic analysis + one static schedule serve every lane; per lane
    the chip is >99.9% FLOP-idle, so lanes should stack nearly free
    until the gather/scatter walls saturate (VERDICT r4 item 3)."""
    m = 256 if SMOKE else 8192
    lanes = 8
    import dataclasses as dc

    import jax.numpy as jnp

    from cholesky_is_magic_tpu.parallel import (
        batched_pdas,
        stack_sparse_states,
    )
    from cholesky_is_magic_tpu.solvers import PDASConfig, pdas
    from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "examples"))
    import at_scale_sparse as demo

    log(f"[bench] batched at-scale m={m} x {lanes} lanes: building ...")
    A_ub, b_ub, A_eq, b_eq, c, l, u = demo.build_lp(m)
    rng = np.random.default_rng(7)
    sfs = []
    for i in range(lanes):
        # Same A; per-lane feasible b (through an interior x0) and c.
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
    # One-at-a-time baseline: single-lane jit, run each lane (warm).
    r0 = pdas(states[0], cfg, engine=eng)
    float(r0.extra["gap"])  # compile
    t0 = time.time()
    n_opt_single = 0
    for s in states:
        r = pdas(s, cfg, engine=eng)
        n_opt_single += int(int(r.status) == 1)
    t_single = time.time() - t0
    stacked = stack_sparse_states(states)
    res = batched_pdas(stacked, cfg, engine=eng)
    float(res.objective[0])  # compile
    t0 = time.time()
    res = batched_pdas(stacked, cfg, engine=eng)
    n_opt = int(np.sum(np.asarray(res.status) == 1))
    t_batch = time.time() - t0
    detail[f"batched_atscale_m{m}_lanes"] = lanes
    detail[f"batched_atscale_m{m}_single_s"] = round(t_single, 3)
    detail[f"batched_atscale_m{m}_batch_s"] = round(t_batch, 3)
    detail[f"batched_atscale_m{m}_speedup"] = round(t_single / t_batch, 2)
    detail[f"batched_atscale_m{m}_optimal"] = f"{n_opt}/{lanes}"
    log(f"[bench] batched at-scale m={m}: {lanes} lanes "
        f"{t_batch:.2f} s batched vs {t_single:.2f} s serial "
        f"({t_single / t_batch:.1f}x, {n_opt}/{lanes} optimal, "
        f"serial {n_opt_single}/{lanes})")


def batched_rows(detail: dict, n_lps: int = None) -> None:
    if n_lps is None:
        n_lps = 16 if SMOKE else 256
    """Batched throughput: same-shape vmapped pdas + heterogeneous
    solve_batch (plain and slabbed)."""
    import jax
    import jax.numpy as jnp

    import cholesky_is_magic_tpu as cim
    from cholesky_is_magic_tpu.ingest import to_device_lp
    from cholesky_is_magic_tpu.ingest.mps import read_mps_string
    from cholesky_is_magic_tpu.parallel import batched_pdas
    from cholesky_is_magic_tpu.solvers import PDASConfig, make_pdas
    from cholesky_is_magic_tpu.utils.testing import random_lp, write_mps

    log("[bench] batched: same-shape 256 ...")
    states = []
    for s in range(n_lps):
        ineq = random_lp(s, n_ub=24, n_eq=8, n=48, density=0.3)
        sf = cim.to_standard_form(read_mps_string(write_mps(ineq)))
        states.append(make_pdas(to_device_lp(sf, pad_multiple=64,
                                             dtype=jnp.float32)))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    cfg = PDASConfig(max_iters=60, mehrotra=True)
    res = batched_pdas(batched, cfg)
    float(res.objective[0])
    t0 = time.time()
    res = batched_pdas(batched, cfg)
    n_opt = int(np.sum(np.asarray(res.status) == 1))
    wall = time.time() - t0
    detail["batched_same_shape_solves_per_s"] = round(n_lps / wall, 1)
    detail["batched_same_shape_optimal"] = f"{n_opt}/{n_lps}"
    log(f"[bench] batched same-shape: {n_lps / wall:.0f} solves/s")

    # Heterogeneous mixed-size batch with stragglers through the front
    # door (README "heterogeneous batch" row): 32 of the LPs are hard
    # (tiny feasible boxes at larger size) and burn the iteration budget.
    log("[bench] batched: heterogeneous 256 (32 stragglers) ...")
    problems = []
    for s in range(n_lps):
        if s % 8 == 7:
            ineq = random_lp(1000 + s, n_ub=48, n_eq=16, n=96, density=0.3)
        else:
            ineq = random_lp(s, n_ub=16 + (s % 3) * 8, n_eq=4 + s % 5,
                             n=32 + (s % 4) * 16, density=0.3)
        problems.append(cim.to_standard_form(read_mps_string(write_mps(ineq))))
    for tag, slab in (("plain", 0), ("slabbed", 16)):
        cim.solve_batch(problems, max_iters=60, mehrotra=True,
                        slab_iters=slab)  # compile
        t0 = time.time()
        reps = cim.solve_batch(problems, max_iters=60, mehrotra=True,
                               slab_iters=slab)
        wall = time.time() - t0
        n_opt = sum(1 for r in reps if r.status == "optimal")
        detail[f"batched_hetero_{tag}_solves_per_s"] = round(n_lps / wall, 1)
        detail[f"batched_hetero_{tag}_optimal"] = f"{n_opt}/{n_lps}"
        log(f"[bench] batched hetero {tag}: {n_lps / wall:.0f} solves/s "
            f"({n_opt}/{n_lps} optimal)")

    # Serving-loop shape: the fleet embedded ONCE (api.embed_batch), then
    # re-solved — skips the per-call host build + stacked host->device
    # ship, ~2/3 of the plain wall (r5 floor decomposition,
    # benchmarks/profile_hetero.py; the device solve itself is ~40 ms
    # for the whole batch).
    from cholesky_is_magic_tpu.api import embed_batch

    emb = embed_batch(problems)
    cim.solve_batch(emb, max_iters=60, mehrotra=True)  # warm path
    t0 = time.time()
    reps = cim.solve_batch(emb, max_iters=60, mehrotra=True)
    wall = time.time() - t0
    n_opt = sum(1 for r in reps if r.status == "optimal")
    detail["batched_hetero_embedded_solves_per_s"] = round(n_lps / wall, 1)
    detail["batched_hetero_embedded_optimal"] = f"{n_opt}/{n_lps}"
    log(f"[bench] batched hetero embedded: {n_lps / wall:.0f} solves/s "
        f"({n_opt}/{n_lps} optimal)")


# ---------------------------------------------------------------------------
# The three program modes
# ---------------------------------------------------------------------------


def emit(detail: dict, partial: bool = False) -> None:
    """Print one cumulative JSON result line from the current detail."""
    host = [v for k, v in detail.items()
            if k.startswith("host_") and "m8192" not in k and "m16384" not in k
            and isinstance(v, (int, float))]
    tpu = [v for k, v in detail.items()
           if k in ("tpu_dense", "tpu_tiled", "tpu_fully_sparse")]
    best_host = min(host) if host else None
    best_tpu = min(tpu) if tpu else None
    rec = {
        "metric": METRIC,
        "value": round(best_tpu, 4) if best_tpu else None,
        "unit": "ms",
        "vs_baseline": (round(best_host / best_tpu, 2)
                        if best_host and best_tpu else None),
        "peak_f32_tflops": round(F32_HIGHEST_PEAK_TFLOPS, 1),
        "detail": {k: (float(f"{v:.5g}") if isinstance(v, float) else v)
                   for k, v in detail.items()},
    }
    if partial:
        rec["partial"] = True
    print(json.dumps(rec), flush=True)


def child_main() -> None:
    """The real benchmark.  Prints a cumulative JSON line per section."""
    detail: dict = {}
    log("[bench] section 1/4: headline (25fv47 scale) ...")
    sf, lp = make_problem()
    detail["m"], detail["n"] = sf.ncons, sf.nvars
    detail.update({k: round(v, 4) for k, v in host_times_ms(sf).items()})
    detail.update({k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in tpu_times_ms(sf, lp).items()})
    emit(detail)
    for name, section in (("at-scale", atscale_rows),
                          ("batched", batched_rows),
                          ("alm", alm_row),
                          ("two-phase", twophase_row),
                          ("two-phase-32k", twophase32k_row),
                          ("batched-at-scale", batched_atscale_row)):
        try:
            log(f"[bench] section: {name} ...")
            section(detail)
        except Exception as e:  # keep the headline even if a section dies
            log(f"[bench] section {name} FAILED: {e!r}")
            detail[f"{name}_error"] = repr(e)[:200]
        emit(detail)


def host_only_main() -> None:
    sf = make_sf()
    detail = {"m": sf.ncons, "n": sf.nvars}
    detail.update({k: round(v, 4) for k, v in host_times_ms(sf).items()})
    print(json.dumps({"detail": detail}), flush=True)


def _probe_tpu(attempts: int = None, timeout_s: float = None) -> bool:
    """Bounded subprocess probe of the live backend (never in-process)."""
    if attempts is None:
        attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", 3))
    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", 150))
    code = ("import jax, jax.numpy as jnp; "
            "d = jax.devices(); "
            "print('PROBE_OK', d[0].platform, float(jnp.ones((8,8)).sum()), "
            "flush=True)")
    for i in range(attempts):
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if p.returncode == 0 and "PROBE_OK" in p.stdout:
                log(f"[bench] TPU probe ok: {p.stdout.strip().splitlines()[-1]}")
                return True
            log(f"[bench] TPU probe attempt {i + 1}/{attempts} failed "
                f"(rc={p.returncode}): {p.stderr.strip().splitlines()[-1:]}")
        except subprocess.TimeoutExpired:
            log(f"[bench] TPU probe attempt {i + 1}/{attempts} timed out "
                f"after {timeout_s:.0f}s")
        if i + 1 < attempts:
            time.sleep(20)
    return False


def _host_detail_subprocess(timeout_s: float = 900.0) -> dict:
    """Host oracle numbers in an axon-free forced-CPU subprocess."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon registration (DEVNOTES)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    try:
        p = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--host-only"],
            env=env, capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(p.stdout.splitlines()):
            try:
                return json.loads(line)["detail"]
            except Exception:
                continue
    except subprocess.TimeoutExpired:
        pass
    return {}


def parent_main() -> None:
    deadline = time.time() + float(os.environ.get("BENCH_DEADLINE_S", 2700))

    def fail(error: str, detail: dict) -> None:
        print(json.dumps({
            "metric": METRIC, "value": None, "unit": "ms",
            "vs_baseline": None, "error": error, "detail": detail,
        }), flush=True)

    if not _probe_tpu():
        log("[bench] TPU unavailable after bounded retries; "
            "emitting structured error with host-oracle detail")
        fail("tpu_unavailable", _host_detail_subprocess(
            timeout_s=max(60.0, deadline - time.time() - 30)))
        return

    # Run the child, echoing its cumulative JSON lines to stdout as they
    # land so a kill at ANY point leaves the best-so-far parseable.
    proc = subprocess.Popen(
        [sys.executable, "-u", os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    lines: list[str] = []

    def reader():
        for line in proc.stdout:
            line = line.rstrip("\n")
            lines.append(line)
            try:
                json.loads(line)
                print(line, flush=True)  # cumulative result line
            except Exception:
                log(f"[child] {line}")

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    timed_out = False
    try:
        proc.wait(timeout=max(60.0, deadline - time.time() - 30))
    except subprocess.TimeoutExpired:
        timed_out = True
        proc.kill()
        proc.wait()
    th.join(timeout=10)

    last = None
    for line in reversed(lines):
        try:
            rec = json.loads(line)
            if isinstance(rec, dict) and "metric" in rec:
                last = rec
                break
        except Exception:
            continue
    if last is not None:
        if timed_out or proc.returncode != 0:
            last["partial"] = True
            last["error"] = ("deadline_exceeded_midrun" if timed_out
                             else f"child_rc_{proc.returncode}")
        print(json.dumps(last), flush=True)
    else:
        log(f"[bench] child produced no result (rc={proc.returncode}, "
            f"timed_out={timed_out})")
        fail("bench_failed_midrun" if not timed_out else "deadline_exceeded",
             _host_detail_subprocess(
                 timeout_s=max(60.0, deadline - time.time() - 10)))


def main():
    if "--child" in sys.argv:
        child_main()
    elif "--host-only" in sys.argv:
        host_only_main()
    else:
        parent_main()


if __name__ == "__main__":
    main()
