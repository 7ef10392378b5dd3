"""Exploration: can a Pallas kernel beat the XLA sorted segment-sum in
assemble_pairs (the cholmod_aat analogue)?

VERDICT r2 flagged `pltpu.PrefetchScalarGridSpec` (scalar-prefetch-driven
block indexing) as the one untested TPU mechanism for schedule-driven
gathers.  Two facts bound what any kernel can do here:

1. the d² gather (vals = asm_w * d2[asm_k], ~0.7 ms at m=8192) CANNOT
   move into a kernel — Mosaic has no dynamic per-element indexing of
   VMEM values (docs/DEVNOTES.md), and scalar-prefetch only drives BLOCK
   index maps, not element gathers; so the kernel competes only with the
   sorted segment-sum half (~0.9 ms);
2. in-kernel scatter is illegal (no .at[].set on values), so the only
   Mosaic-legal accumulation of pair values into a (b, b) tile is the
   ONE-HOT form: tile += OneHotRᵀ @ (vals ∘ OneHotC), two MXU matmuls
   per pair block — 2·PB·b² flops replacing PB scalar scatter-adds.

This script times three assemblies of the SAME resident tiles on a banded
m=8192 pattern (two-K-difference timing):

  A. production assemble_pairs (XLA gather + sorted segment-sum);
  B. gather outside + Pallas one-hot kernel for the per-tile reduction,
     pair slabs padded per destination tile to a static (NT, SMAX, PB)
     schedule (a static index map — scalar prefetch would only trim the
     padding waste of this same design, so if B loses with ZERO dynamic
     overhead, prefetch cannot win);
  C. the one-hot form in plain XLA (same flops, no Pallas) as a control.

Run on the TPU: python benchmarks/explore_prefetch_assembly.py [m]
Findings go to docs/DEVNOTES.md either way.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

K = 32
REPS = 4
PB = 1024  # pairs per kernel block (8 sublane rows x 128 lanes)


def banded_engine(m, band=6, seed=0, block=128):
    import scipy.sparse as sp

    from cholesky_is_magic_tpu.sparse.tiled import engine_for_sparse

    rng = np.random.default_rng(seed)
    n = 2 * m
    rows, cols, vals = [], [], []
    for i in range(m):
        for k in range(band):
            rows.append(i)
            cols.append((2 * i + k) % n)
            vals.append(rng.normal())
    A = sp.csc_matrix((vals, (rows, cols)), shape=(m, n))
    return engine_for_sparse(A, block=block), n


def two_k_ms(fn, d0):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(d0, k):
        def body(i, carry):
            acc, d = carry
            tiles = fn(d)
            s = tiles[0, 0, 0] + tiles[-2, -1, -1]
            return acc + s, d * (1.0 + 1e-7 * s)

        acc, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), d0))
        return acc

    with jax.default_matmul_precision("highest"):
        float(loop(d0, jnp.int32(K)))
        totals = {}
        for k in (K, 2 * K):
            ts = []
            for _ in range(REPS):
                t = time.time()
                float(loop(d0, jnp.int32(k)))
                ts.append(time.time() - t)
            totals[k] = min(ts)
    return (totals[2 * K] - totals[K]) * 1e3 / K


def build_tile_slabs(eng):
    """Repack the sorted pair schedule into per-destination-TILE slabs,
    each padded to a multiple of PB: (NT*SMAX, PB) arrays of weight,
    column index, in-tile row offset, in-tile col offset."""
    ws, ks, dst = eng._asm_np
    b = eng.b
    t_of = (dst // (b * b)).astype(np.int64)
    r_of = ((dst % (b * b)) // b).astype(np.int32)
    c_of = (dst % b).astype(np.int32)
    NT = eng.NT
    counts = np.bincount(t_of, minlength=NT + 1)
    smax = int(-(-counts[:NT].max() // PB))
    W = np.zeros((NT * smax, PB), np.float32)
    Kk = np.zeros((NT * smax, PB), np.int32)
    R = np.zeros((NT * smax, PB), np.int32)
    C = np.zeros((NT * smax, PB), np.int32)
    start = np.zeros(NT + 2, np.int64)
    np.cumsum(counts, out=start[1:])
    for t in range(NT):
        lo, hi = start[t], start[t + 1]
        cnt = hi - lo
        flat = np.arange(cnt)
        W[t * smax + flat // PB, flat % PB] = ws[lo:hi]
        Kk[t * smax + flat // PB, flat % PB] = ks[lo:hi]
        R[t * smax + flat // PB, flat % PB] = r_of[lo:hi]
        C[t * smax + flat // PB, flat % PB] = c_of[lo:hi]
    return W, Kk, R, C, smax


def main(m=8192):
    import jax
    import jax.numpy as jnp

    eng, n = banded_engine(m)
    print(f"m={m} NT={eng.NT} pairs={eng.n_pairs} b={eng.b}")
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.random(n) + 0.5, jnp.float32)

    # --- A: production path ---
    ms_a = two_k_ms(lambda d: eng.assemble_pairs(d), d0)
    print(f"A production assemble_pairs:        {ms_a:7.3f} ms")

    W, Kk, R, C, smax = build_tile_slabs(eng)
    pad_ratio = W.size / max(eng.n_pairs, 1)
    print(f"slabs: SMAX={smax} blocks/tile, PB={PB}, padding {pad_ratio:.2f}x")
    Wd = jnp.asarray(W)
    Kd = jnp.asarray(Kk)
    b = eng.b
    NT = eng.NT
    # One-hot operands built once per assembly from R, C (static).
    Rd = jnp.asarray(R)
    Cd = jnp.asarray(C)

    # --- C: one-hot form in plain XLA (control, same flops).  The one-hot
    # tensors are (NT*smax, PB, b) ~ 166 MB each; materialize them INSIDE
    # the jit from the small int schedules, or the closed-over constants
    # blow past the remote-compile upload limit. ---
    def xla_onehot(d):
        hotR = jax.nn.one_hot(Rd, b, dtype=jnp.float32)  # (NT*smax, PB, b)
        hotC = jax.nn.one_hot(Cd, b, dtype=jnp.float32)
        vals = Wd * (d * d)[Kd]  # the unavoidable gather
        contrib = jnp.einsum(
            "spb,sp,spc->sbc", hotR, vals, hotC,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        tiles = contrib.reshape(NT, smax, b, b).sum(axis=1)
        return jnp.concatenate([tiles, jnp.zeros((1, b, b), jnp.float32)])

    ms_c = two_k_ms(xla_onehot, d0)
    print(f"C one-hot two-matmul, plain XLA:    {ms_c:7.3f} ms")

    # --- B: the same reduction as a Pallas kernel.  Mosaic layout: each
    # slab of PB pairs is ROWS=PB/128 sublane rows x 128 lanes, block
    # (ROWS, 128) — divisible by (8, 128) with ROWS=8.  The one-hot
    # operands are (b, 128) sublane-vs-lane comparisons (no reshapes, which
    # Mosaic cannot lower across the lane dim), contracted over the LANE
    # (pair) axis on the MXU, one matmul pair per sublane row. ---
    from jax.experimental import pallas as pl

    ROWS = PB // 128
    assert ROWS % 8 == 0

    def kernel(w_ref, r_ref, c_ref, out_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        iota = jax.lax.broadcasted_iota(jnp.int32, (b, 128), 0)
        tile = jnp.zeros((b, b), jnp.float32)
        for j in range(ROWS):
            hot_r = (r_ref[j : j + 1, :] == iota).astype(jnp.float32)
            hot_c = (c_ref[j : j + 1, :] == iota).astype(jnp.float32)
            weighted = hot_c * w_ref[j : j + 1, :]
            tile += jax.lax.dot_general(
                hot_r, weighted, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        out_ref[0, :, :] += tile

    grid = (NT, smax)
    pallas_onehot_k = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, 128), lambda t, s: (t * smax + s, 0)),
            pl.BlockSpec((ROWS, 128), lambda t, s: (t * smax + s, 0)),
            pl.BlockSpec((ROWS, 128), lambda t, s: (t * smax + s, 0)),
        ],
        out_specs=pl.BlockSpec((1, b, b), lambda t, s: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, b, b), jnp.float32),
    )

    R3 = jnp.asarray(R.reshape(NT * smax * ROWS, 128))
    C3 = jnp.asarray(C.reshape(NT * smax * ROWS, 128))

    def pallas_onehot(d):
        vals = (Wd * (d * d)[Kd]).reshape(NT * smax * ROWS, 128)
        tiles = pallas_onehot_k(vals, R3, C3)
        return jnp.concatenate([tiles, jnp.zeros((1, b, b), jnp.float32)])

    try:
        ms_b = two_k_ms(pallas_onehot, d0)
        print(f"B one-hot kernel, Pallas:           {ms_b:7.3f} ms")
    except Exception as e:  # record the lowering failure honestly
        print(f"B Pallas kernel failed to lower/run: {type(e).__name__}: {e}")
        ms_b = None

    # Correctness spot-check vs production.  assemble_pairs(row_boost=None)
    # pads an EMPTY boost vector to all-ones (tiled.py:516-519), so every
    # diagonal slot gets +1, not just the padded rows; replicate exactly.
    n_pad = eng.B * b
    rb = np.ones(n_pad, np.float32)
    boost_p = rb[eng._pperm_np].reshape(eng.B, b)
    boost = np.zeros((NT + 1, b, b), np.float32)
    for ti, t in enumerate(np.asarray(eng.diag_ids)):
        boost[t] += np.diag(boost_p[ti])
    ref = np.asarray(eng.assemble_pairs(d0))
    got = np.asarray(xla_onehot(d0)) + boost
    err = np.max(np.abs(ref[:NT] - got[:NT])) / max(np.max(np.abs(ref)), 1e-30)
    print(f"one-hot vs production max rel err: {err:.2e}")
    if ms_b is not None:
        gotb = np.asarray(pallas_onehot(d0)) + boost
        errb = np.max(np.abs(ref[:NT] - gotb[:NT])) / max(
            np.max(np.abs(ref)), 1e-30
        )
        print(f"pallas vs production max rel err:  {errb:.2e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
