"""Batched LP solves: vmap over stacked problems, batch sharded over 'dp'.

The reference solves one LP per Lisp image; the TPU-native batch mode maps
the *entire jitted solver* (while_loop, lax.cond branches, Cholesky and
all) over a stacked batch of equal-padded LPs, then shards the batch
dimension across the mesh.  Since every LP in the batch is independent,
there is zero cross-chip communication inside the solve — the ideal dp
workload (BASELINE.json config 5).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cholesky_is_magic_tpu.ingest.device import DeviceLP
from cholesky_is_magic_tpu.solvers.affine import (
    AffineConfig,
    AffineState,
    _affine_scaling_jit,
)
from cholesky_is_magic_tpu.solvers.pdas import PDASConfig, PDASState, _pdas_jit
from cholesky_is_magic_tpu.solvers.result import SolveResult
from cholesky_is_magic_tpu.utils.precision import highest_precision


def stack_device_lps(lps: Sequence[DeviceLP]) -> DeviceLP:
    """Stack equal-shaped padded LPs into one batched DeviceLP pytree."""
    shapes = {lp.A.shape for lp in lps}
    assert len(shapes) == 1, f"all LPs must share a padded shape, got {shapes}"
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *lps)
    # m, n are metadata and must agree (they are the max over the batch in
    # padded terms; keep per-LP masks for the true sizes).
    return batched


@highest_precision
@partial(jax.jit, static_argnames=("cfg", "engine"))
def _batched_pdas_jit(
    states: PDASState, cfg: PDASConfig, engine=None
) -> SolveResult:
    return jax.vmap(lambda s: _pdas_jit(s, cfg, engine))(states)


def batched_pdas(
    states: PDASState, config: Optional[PDASConfig] = None, engine=None
) -> SolveResult:
    """vmap of the full PDAS while_loop over a batched PDASState.

    ``engine`` (a sparse.tiled.TiledCholesky shared by every lane) runs
    the batch through the FULLY SPARSE at-scale pipeline: one symbolic
    analysis + one static pair/panel schedule, vmapped over per-lane
    scale vectors and iterates — the composition of the framework's two
    headline modes (at-scale sparse + dp batching).  The schedule arrays
    are closure constants, so XLA batches the panel-wave einsums over
    lanes with no per-lane dispatch; build the stacked state with
    :func:`stack_sparse_states`.

    CONTRACT: every lane must share the engine's constraint matrix A —
    not just its pattern — because the ELL assembly schedule bakes the
    pair weights A[p,k]·A[q,k] into the engine (tiled.build_ell_assembly
    ``asm_w``).  Lanes may differ in b, c, l, u, and iterates: the
    scenario-sweep / re-solve-fleet mode (examples/warm_resolve.py).  A
    mismatched A is a silent wrong answer, same contract as engine
    re-use in `pdas(..., engine=...)`.
    """
    return _batched_pdas_jit(states, config or PDASConfig(), engine)


def stack_sparse_states(states: Sequence) -> object:
    """Stack same-pattern sparse PDAS/dd states into one batched pytree.

    Counterpart of :func:`stack_device_lps` for SparseKKTLP-backed states
    (make_pdas_sparse): data leaves (ELL/BELL values, c, b, l, u,
    iterates) gain a leading batch axis; static meta (shapes, ELL widths)
    must already agree — guaranteed when every state came from the same
    sparsity pattern, asserted here via the pytree structure.
    """
    import jax.tree_util as jtu

    treedefs = {jtu.tree_structure(s) for s in states}
    assert len(treedefs) == 1, "states must share pattern/meta to stack"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@highest_precision
@partial(jax.jit, static_argnames=("cfg", "engine"))
def _batched_pdas_dd_jit(states, cfg: PDASConfig, engine=None) -> SolveResult:
    from cholesky_is_magic_tpu.solvers.pdas_dd import _pdas_dd_jit

    return jax.vmap(lambda s: _pdas_dd_jit(s, cfg, engine))(states)


def batched_pdas_dd(
    states, config: Optional[PDASConfig] = None, engine=None
) -> SolveResult:
    """vmap of the double-word finisher over a batched PDASDDState —
    the tight-gap half of the batched two-phase at-scale flow (see
    :func:`batched_pdas`).  ``config.entry_repair_tol`` composes: the
    min-norm entry repair is a lax.cond pre-step inside the jitted loop
    (solvers.pdas_dd._entry_repair), so each lane repairs independently."""
    return _batched_pdas_dd_jit(states, config or PDASConfig(), engine)


@highest_precision
@partial(jax.jit, static_argnames=("cfg",))
def _batched_affine_jit(states: AffineState, cfg: AffineConfig) -> SolveResult:
    return jax.vmap(lambda s: _affine_scaling_jit(s, cfg))(states)


def batched_affine(
    states: AffineState, config: Optional[AffineConfig] = None
) -> SolveResult:
    return _batched_affine_jit(states, config or AffineConfig())


def batched_pdas_slabbed(
    states: PDASState,
    config: Optional[PDASConfig] = None,
    slab_iters: int = 16,
    mesh: Optional[Mesh] = None,
) -> SolveResult:
    """Straggler-free heterogeneous batching: run the vmapped PDAS loop in
    ``slab_iters``-iteration slabs and COMPACT converged LPs out between
    slabs.

    The plain ``batched_pdas`` runs the whole batch until its slowest
    member converges or max_iters — a single hard LP (or one that never
    converges) drags every lane through all its iterations.  Here, after
    each slab the finished lanes leave the batch; the survivors re-stack
    (host-side, cheap vs ~50 ms/batched-iteration at small sizes) and
    continue from their exact iterates.  To bound recompiles, the active
    batch is padded up to the next power of two — each bucket size
    compiles once and is reused across slabs AND calls.

    Semantics notes (documented deviations from the monolithic loop):
    per-slab restarts reset the repair flag, divergence counter, and
    best-iterate window, so ``stall_exit_iters`` counts within a slab —
    and is therefore clamped to ``slab_iters - 2`` (a window that cannot
    fit inside a slab would make the precision-floor exit unreachable:
    every non-converging lane would burn the full max_iters budget and
    report MAX_ITERS); ``record_trace`` is unsupported (trace buffers
    would need splicing).

    Compaction is DEVICE-SIDE (r5): only the per-lane statuses cross the
    tunnel between slabs (~1 KB); lane selection, state re-stacking, and
    finished-result accumulation are jnp gathers on device, and results
    are fetched ONCE at the end.  The first version round-tripped the
    full state pytree — LP operands included — through the host every
    slab: ~16 MB per slab each way at the 256-lane (64,128) class, which
    at the ~40 MB/s tunnel cost more than the entire plain solve and is
    why slabbed MEASURED 3-4x slower than plain on the short-tail bench
    mix (and why its throughput tracked tunnel load: 195 driver vs 356
    local, VERDICT r4).

    Honest scoping (r5, measured): on dense vmapped pdas, NO realistic
    mix has a tail long enough for compaction to pay — Mehrotra
    compresses iteration counts to near-uniform (measured over the bench
    hetero mix incl. its "straggler" class: 11-14 cold, 6-12 on a
    warm-fleet re-solve with 2 heavily-drifted lanes, 18-34 with plain
    steps; max/mean <= 1.6 in every case), so the width reduction never
    overcomes even small per-slab overheads.  The knob is kept for
    adversarial batches (caller-supplied members that burn the whole
    ``max_iters`` budget, e.g. infeasible or beyond-tolerance instances
    with the stall exit disabled) where the monolithic loop would drag
    every lane to max_iters; the device-side rewrite makes it roughly
    cost-neutral rather than a multiple-x loss when the tail fails to
    materialize.
    """
    cfg = config or PDASConfig()
    assert not (cfg.record_trace or cfg.record_iterates), (
        "slabbed batching does not support trace recording"
    )
    import dataclasses

    import numpy as np

    B = states.x.shape[0]
    active = np.arange(B)
    cur = jax.tree.map(jnp.asarray, states)  # one H2D, like plain path
    done_parts: list[tuple[np.ndarray, object]] = []
    iters_spent = np.zeros(B, np.int64)
    budget = cfg.max_iters
    from cholesky_is_magic_tpu.solvers.result import Status

    while active.size and budget > 0:
        k = min(slab_iters, budget)
        # Clamp the stall window into the slab (it resets every slab, so
        # a window > slab_iters could never fire and non-converging lanes
        # would silently burn the whole budget).  A window beyond
        # max_iters means the caller disabled the exit — honor that.
        stall = cfg.stall_exit_iters
        if stall <= cfg.max_iters:
            stall = max(2, min(stall, k - 2))
        slab_cfg = dataclasses.replace(cfg, max_iters=k,
                                       stall_exit_iters=stall)
        # Bucket to the next power of two: pad by repeating lane 0 (its
        # duplicate results are discarded).
        bucket = 1 << (int(active.size - 1)).bit_length()
        if mesh is not None:
            # Keep the bucket dp-divisible so every slab stays sharded
            # (pad lanes are discarded anyway); for power-of-two dp this
            # preserves the power-of-two compile reuse.
            dp_n = int(mesh.shape["dp"])
            bucket = max(bucket, dp_n)
            bucket = ((bucket + dp_n - 1) // dp_n) * dp_n
        pad = bucket - active.size
        sel = jnp.asarray(np.concatenate(
            [np.arange(active.size), np.zeros(pad, np.int64)]))
        dev = jax.tree.map(lambda a: a[sel], cur)  # device gather
        if mesh is not None:
            dev = shard_batched_pdas(dev, mesh)
        res = batched_pdas(dev, slab_cfg)  # stays on device
        # The ONLY per-slab fetch: statuses + iteration counts (~KB).
        status, res_iters = jax.device_get((res.status, res.iterations))
        status = np.asarray(status)[: active.size]
        iters_spent[active] += np.asarray(res_iters)[: active.size]
        budget -= k
        # MAX_ITERS lanes continue; every other status is terminal.
        still = np.flatnonzero(status == Status.MAX_ITERS)
        fin = np.flatnonzero(status != Status.MAX_ITERS)
        if budget <= 0:
            fin, still = np.arange(active.size), np.zeros(0, np.int64)
        if fin.size:
            fin_d = jnp.asarray(fin)
            done_parts.append(
                (active[fin], jax.tree.map(lambda a: a[fin_d], res)))
        if still.size == 0:
            break
        still_d = jnp.asarray(still)
        cur = dataclasses.replace(
            jax.tree.map(lambda a: a[still_d], dev),
            x=res.x[still_d],
            y=res.extra["y"][still_d],
            w=res.extra["w"][still_d],
            z=res.extra["z"][still_d],
        )
        active = active[still]

    # ONE result fetch for the whole run, then host-side reorder.
    host_parts = jax.device_get(done_parts)
    done: dict[int, object] = {}
    for idx, part in host_parts:
        for j, orig in enumerate(np.asarray(idx)):
            done[int(orig)] = jax.tree.map(lambda a: a[j], part)
    ordered = [done[i] for i in range(B)]
    out = jax.tree.map(lambda *xs: np.stack(xs), *ordered)
    return dataclasses.replace(
        out, iterations=iters_spent.astype(np.int32)
    )


def shard_batched_pdas(states: PDASState, mesh: Mesh) -> PDASState:
    """Place a batched PDASState with its batch dimension sharded over the
    mesh's 'dp' axis (everything else replicated within a dp group)."""

    def shard(leaf):
        spec = P("dp", *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(shard, states)


def batched_normal_solves(
    engine,
    E,
    ET,
    D: jax.Array,
    G: jax.Array,
    mesh: Optional[Mesh] = None,
    refine_steps: int = 1,
    dbound: float = 0.0,
    krylov_steps: int = 0,
):
    """Batch of same-pattern fully sparse normal solves, vmapped over the
    scale vectors: y_i solves (A·diag(D_i))(A·diag(D_i))ᵀ y_i = G_i.

    The serving primitive for scenario sweeps / warm re-solves: one LP
    pattern (one symbolic analysis, one compile), many value sets — the
    pair-schedule assembly, tile factorization, triangular solves, and dd
    refinement all batch cleanly because the schedule is static.  With
    ``mesh`` the batch dimension is sharded over 'dp' (independent
    problems, zero cross-chip communication).  Returns (Y, ok) with
    leading batch dimension.
    """
    if mesh is not None:
        def shard(leaf):
            return jax.device_put(
                leaf, NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))
            )

        D, G = shard(D), shard(G)

    @highest_precision
    @jax.jit
    def run(D, G):
        def one(d, g):
            return engine.solve_normal_ell(
                E, ET, d, g, refine_steps=refine_steps, dbound=dbound,
                krylov_steps=krylov_steps,
            )

        return jax.vmap(one)(D, G)

    return run(D, G)
