"""Crossover straight from a PHASE-1 stop (gap ~1e-4 class).

The round-3 extension of solvers/crossover.py: the repair thresholds
scale with the incoming IPM gap, so certification no longer needs a
tight finisher iterate — phase 1 (robust sparse pdas, Mehrotra steps)
plus ONE crossover replaces the entire dd finisher.  At-scale this is
the headline wall-clock shortcut (examples/at_scale_sparse.py measures
it); here the same flow is pinned at CPU-test sizes, where each size
historically exercised a different repair rule:

  m=192/256 class: over-complete indicator partition (n_basic > m) with
    the offending column FAR from both bounds -> the sign-directed
    forced demote (rc > 0 at the optimum pins x_j at its lower bound).
  m=512 class: dirty-primal partitions where a bulk demote evicts
    truly-basic columns -> the primal-gated single-column pivot cap.

The certificate is the assertion: certified=True is a dd-checked claim
(primal/dual residual, bound violation, gap), cross-checked against
HiGHS.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cholesky_is_magic_tpu.ingest.standard_form import StandardForm
from cholesky_is_magic_tpu.solvers import PDASConfig
from cholesky_is_magic_tpu.solvers.crossover import crossover
from cholesky_is_magic_tpu.solvers.pdas import make_pdas_sparse, pdas


def staircase_lp(m: int, seed: int = 0):
    """Feasible staircase LP at (m, 2m), ~6 nnz/row — the same family as
    examples/at_scale_sparse.py, small enough for the CPU suite."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    n = 2 * m
    n_eq = m // 3
    n_ub = m - n_eq

    def staircase(rows):
        width = max(6, n // max(rows, 1) + 4)
        ri, ci, vi = [], [], []
        for i in range(rows):
            start = int(i * max(n - width, 1) / max(rows, 1))
            k = rng.integers(3, width)
            cols = np.clip(
                start + rng.choice(width, size=min(k, width), replace=False),
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


def _standard_form(A_ub, b_ub, A_eq, b_eq, c, l, u):
    """Triplet-level slack insertion (standard-form.lisp:48-86), as in
    examples/at_scale_sparse.py — bypasses MPS text for generated LPs."""
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


@pytest.mark.slow
@pytest.mark.parametrize("m", [192, 256])
def test_phase1_crossover_certifies(m):
    A_ub, b_ub, A_eq, b_eq, c, l, u = staircase_lp(m)
    sf = _standard_form(A_ub, b_ub, A_eq, b_eq, c, l, u)

    from scipy.optimize import linprog

    ref = linprog(
        c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
        bounds=np.stack([l, u], axis=1), method="highs",
    )
    assert ref.status == 0

    st, eng = make_pdas_sparse(sf, block=64)
    p1 = pdas(
        st, PDASConfig(max_iters=100, refine_steps=1, mehrotra=True),
        engine=eng,
    )
    gap1 = float(p1.extra["gap"])
    assert gap1 < 1e-3  # a genuine loose phase-1 stop, not a tight iterate

    out = crossover(p1, st.lp, engine=eng)
    cert = out.extra["crossover"]
    assert cert["certified"], cert
    # Certified means dd-floor accuracy: decades below the phase-1 gap.
    assert float(cert["gap"]) < 1e-10
    assert float(cert["primal_rel"]) < 1e-8
    assert float(cert["dual_rel"]) < 1e-8
    assert float(out.objective) == pytest.approx(ref.fun, rel=1e-7)


@pytest.mark.slow
def test_phase1_crossover_never_worse():
    """Uncertified or not, crossover must never degrade the iterate: on
    a fresh seed the result either certifies or passes through."""
    A_ub, b_ub, A_eq, b_eq, c, l, u = staircase_lp(128, seed=3)
    sf = _standard_form(A_ub, b_ub, A_eq, b_eq, c, l, u)
    st, eng = make_pdas_sparse(sf, block=64)
    p1 = pdas(
        st, PDASConfig(max_iters=100, refine_steps=1, mehrotra=True),
        engine=eng,
    )
    out = crossover(p1, st.lp, engine=eng)
    cert = out.extra["crossover"]
    if not cert["certified"]:
        np.testing.assert_array_equal(np.asarray(out.x), np.asarray(p1.x))
    else:
        assert float(cert["gap"]) <= float(p1.extra["gap"])
